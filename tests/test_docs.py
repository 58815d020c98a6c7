"""Docs build gate (VERDICT r2 item 9): the generated API reference
(docs/reference/, rendered by docs/gen_api.py) must build cleanly and stay
in sync with the live export set — every public drtk_tpu symbol appears on
a generated page, and the committed pages match a fresh render."""

import inspect
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _fresh_render(tmp_path):
    sys.path.insert(0, str(REPO / "docs"))
    try:
        import gen_api
    finally:
        sys.path.pop(0)
    return gen_api.main(str(tmp_path))


def test_generated_reference_is_current(tmp_path):
    out = _fresh_render(tmp_path / "reference")
    committed = REPO / "docs" / "reference"
    assert committed.is_dir(), "docs/reference missing — run docs/gen_api.py"
    fresh = {p.name: p.read_text() for p in out.glob("*.md")}
    old = {p.name: p.read_text() for p in committed.glob("*.md")}
    assert fresh == old, (
        "docs/reference is stale — re-run `python docs/gen_api.py` "
        f"(differs: {sorted(set(fresh) ^ set(old)) or [n for n in fresh if fresh[n] != old.get(n)]})"
    )


def test_every_public_symbol_documented(tmp_path):
    import drtk_tpu as dt

    out = _fresh_render(tmp_path / "reference")
    text = "\n".join(p.read_text() for p in out.glob("*.md"))
    undocumented = [
        n for n in dir(dt)
        if not n.startswith("_")
        and (callable(getattr(dt, n)) or inspect.isclass(getattr(dt, n)))
        and not inspect.ismodule(getattr(dt, n))
        and f"`{n}`" not in text
    ]
    assert not undocumented, f"symbols missing from docs: {undocumented}"


def test_tutorial_notebooks_valid_and_current(tmp_path):
    import nbformat

    sys.path.insert(0, str(REPO / "docs"))
    try:
        import gen_notebooks
    finally:
        sys.path.pop(0)
    out = gen_notebooks.main(str(tmp_path / "tutorials"))
    committed = REPO / "docs" / "tutorials"
    assert committed.is_dir(), "docs/tutorials missing — run docs/gen_notebooks.py"
    for name in gen_notebooks.TUTORIALS.values():
        nb_new = nbformat.read(str(out / name), as_version=4)
        nbformat.validate(nb_new)
        nb_old = nbformat.read(str(committed / name), as_version=4)
        assert [c.source for c in nb_old.cells] == [
            c.source for c in nb_new.cells
        ], f"{name} stale — re-run `python docs/gen_notebooks.py`"
        assert sum(c.cell_type == "code" for c in nb_new.cells) >= 2


def test_bench_matrix_writer_fails_loud_on_error_rows(tmp_path):
    """VERDICT r4 #6: an error row in BENCH_MATRIX.json must produce a
    nonzero exit (SystemExit(1)), not silently interleave with results."""
    import json

    import pytest

    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.pop(0)

    ok_rows = [{"config": "textured", "value": 1.0}]
    path = tmp_path / "m.json"
    assert bench.write_matrix(ok_rows, str(path)) == ok_rows
    assert json.loads(path.read_text()) == ok_rows

    bad_rows = ok_rows + [{"config": "avatar4k", "error": "boom"}]
    with pytest.raises(SystemExit) as ei:
        bench.write_matrix(bad_rows, str(path))
    assert ei.value.code == 1
    # The artifact still records everything it measured.
    assert json.loads(path.read_text()) == bad_rows


def test_site_builds(tmp_path):
    """The static docs site (docs/build_site.py — the in-image stand-in for
    the reference's Sphinx build, DRTK docs/source/conf.py:1) builds every
    guide, generated-reference page, and tutorial notebook, with no
    intra-repo markdown link left unrewritten."""
    import re

    sys.path.insert(0, str(REPO / "docs"))
    try:
        import build_site
    finally:
        sys.path.pop(0)

    out = tmp_path / "site"
    n = build_site.build(out)
    pages = sorted(out.rglob("*.html"))
    assert len(pages) == n
    names = {p.relative_to(out).as_posix() for p in pages}
    assert "index.html" in names
    assert "reference/index.html" in names
    assert any(p.startswith("tutorials/") for p in names)
    for p in pages:
        text = p.read_text()
        assert '<nav>' in text and '<main>' in text
        assert not re.search(r'href="[^":]*\.(md|ipynb)[#"]', text), p
