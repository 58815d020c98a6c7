"""Render tutorial notebooks (docs/tutorials/*.ipynb) from the example
scripts — the notebook-form tutorials matching the reference's
docs/source/tutorials/*.ipynb (DRTK_Tutorial_2_optimizing_geometry,
DRTK_Tutorial_rendering_meshes).

    python docs/gen_notebooks.py      # writes docs/tutorials/

Each example script becomes one notebook: the module docstring is the
intro markdown cell; code is split into cells at `# --- section ---`
markers (each marker becomes a small markdown header). Scripts stay the
source of truth; tests/test_docs.py checks the notebooks are current.
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

import nbformat

REPO = pathlib.Path(__file__).resolve().parent.parent

TUTORIALS = {
    "01_hello_triangle.py": "Tutorial_1_hello_triangle.ipynb",
    "02_optimizing_geometry.py": "Tutorial_2_optimizing_geometry.ipynb",
    "03_geometry_intersection.py": "Tutorial_3_geometry_intersection.ipynb",
    "04_rendering_meshes.py": "Tutorial_rendering_meshes.ipynb",
    "06_shaded_model_fitting.py": "Tutorial_shaded_model_fitting.ipynb",
}

_SECTION = re.compile(r"^# -+ ?(.*?) ?-+$")


def convert(src_path: pathlib.Path) -> nbformat.NotebookNode:
    src = src_path.read_text()
    mod = ast.parse(src)
    doc = ast.get_docstring(mod) or src_path.stem
    body_start = (
        mod.body[0].end_lineno
        if mod.body and isinstance(mod.body[0], ast.Expr)
        else 0
    )
    lines = src.splitlines()[body_start:]

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    title = doc.splitlines()[0].rstrip(".")
    rest = "\n".join(doc.splitlines()[1:]).strip()
    nb.cells.append(
        nbformat.v4.new_markdown_cell(f"# {title}\n\n{rest}".rstrip())
    )
    # Notebooks run headless from docs/tutorials/: resolve the package and
    # run on CPU by default (flip to TPU by removing the jax_platforms line).
    nb.cells.append(nbformat.v4.new_code_cell(
        "import sys, pathlib\n"
        "sys.path.insert(0, str(pathlib.Path.cwd().parent.parent))\n"
        "sys.path.insert(0, str(pathlib.Path.cwd().parent.parent / 'examples'))\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')  # remove on a TPU host"
    ))

    chunk: list[str] = []

    def flush():
        text = "\n".join(chunk).strip("\n")
        if text:
            nb.cells.append(nbformat.v4.new_code_cell(text))
        chunk.clear()

    blanks = 0
    for line in lines:
        m = _SECTION.match(line.strip())
        if m and m.group(1):
            flush()
            nb.cells.append(
                nbformat.v4.new_markdown_cell(f"## {m.group(1).strip()}")
            )
            blanks = 0
            continue
        if not line.strip():
            blanks += 1
            if blanks >= 2:  # top-level double blank = cell boundary
                flush()
                blanks = 0
                continue
        else:
            blanks = 0
        chunk.append(line)
    flush()
    return nb


def main(out_dir: str | None = None) -> pathlib.Path:
    out = pathlib.Path(out_dir or REPO / "docs" / "tutorials")
    out.mkdir(parents=True, exist_ok=True)
    for src, dst in TUTORIALS.items():
        nb = convert(REPO / "examples" / src)
        nbformat.write(nb, str(out / dst))
    return out


if __name__ == "__main__":
    path = main(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"wrote {len(list(path.glob('*.ipynb')))} notebooks to {path}")
