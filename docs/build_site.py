"""Build the drtk_tpu documentation site: one self-contained static HTML
tree from the repo's markdown + notebooks.

The reference ships a Sphinx site (facebookresearch/DRTK
docs/source/conf.py:1 + 5 tutorial notebooks under docs/source/tutorials).
This environment has no Sphinx (and installs are not allowed), so the site
is built with what is baked in — ``markdown`` + ``pygments`` for pages,
``nbconvert`` for notebooks, ``jinja2`` for the shell — producing the same
artifact a user wants from the Sphinx build: a browsable site with a nav
sidebar, the curated guides, the generated per-symbol API reference, and
the executed tutorials.

Usage::

    python docs/build_site.py [out_dir]     # default docs/_site

Inputs (all already maintained in-repo):
  * README.md                      -> site landing page
  * docs/{api,architecture,performance,tutorial}.md
  * docs/reference/*.md            (regenerate: python docs/gen_api.py)
  * docs/tutorials/*.ipynb         (regenerate: python docs/gen_notebooks.py)

The build is pure-Python, offline, deterministic, and tested by
tests/test_docs.py::test_site_builds.
"""

from __future__ import annotations

import html
import pathlib
import re
import shutil
import sys

DOCS = pathlib.Path(__file__).resolve().parent
REPO = DOCS.parent

NAV = [
    ("Start", [
        ("index.html", "Overview (README)"),
        ("tutorial.html", "Tutorial"),
        ("architecture.html", "Architecture"),
        ("performance.html", "Performance"),
    ]),
    ("API", [
        ("api.html", "Curated API guide"),
        ("reference/index.html", "Generated reference"),
    ]),
    ("Tutorial notebooks", []),  # filled from docs/tutorials/*.ipynb
]

PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{{ title }} — drtk_tpu</title>
<style>
:root { --fg:#1a1c1f; --bg:#ffffff; --mut:#5c6166; --line:#e3e5e8;
        --accent:#0b5fa5; --code-bg:#f6f7f8; }
* { box-sizing:border-box; }
body { margin:0; font:16px/1.6 system-ui,-apple-system,"Segoe UI",sans-serif;
       color:var(--fg); background:var(--bg); }
a { color:var(--accent); text-decoration:none; }
a:hover { text-decoration:underline; }
.wrap { display:flex; min-height:100vh; }
nav { width:250px; flex:none; border-right:1px solid var(--line);
      padding:1.2rem 1rem; }
nav h1 { font-size:1.05rem; margin:.2rem 0 1rem; }
nav h2 { font-size:.72rem; text-transform:uppercase; letter-spacing:.08em;
         color:var(--mut); margin:1.1rem 0 .3rem; }
nav ul { list-style:none; margin:0; padding:0; }
nav li a { display:block; padding:.14rem 0; font-size:.92rem; }
nav li a.cur { font-weight:600; }
main { flex:1; min-width:0; max-width:56rem; padding:1.6rem 2.4rem 4rem; }
main h1,main h2,main h3 { line-height:1.25; }
main h1 { font-size:1.7rem; } main h2 { margin-top:2rem; }
pre { background:var(--code-bg); border:1px solid var(--line);
      border-radius:6px; padding: .8rem 1rem; overflow-x:auto;
      font-size:.86rem; line-height:1.45; }
code { font-family:ui-monospace,SFMono-Regular,Menlo,monospace;
       font-size:.88em; background:var(--code-bg); border-radius:4px;
       padding:.08em .3em; }
pre code { background:none; border:none; padding:0; }
table { border-collapse:collapse; margin:1rem 0; font-size:.92rem; }
th,td { border:1px solid var(--line); padding:.35rem .6rem;
        text-align:left; vertical-align:top; }
th { background:var(--code-bg); }
blockquote { border-left:3px solid var(--line); margin:.8rem 0;
             padding:.1rem 1rem; color:var(--mut); }
{{ pygments_css }}
</style></head><body><div class="wrap">
<nav>
<h1><a href="{{ root }}index.html">drtk_tpu</a></h1>
{% for section, items in nav %}
<h2>{{ section }}</h2>
<ul>
{% for href, label in items %}
<li><a href="{{ root }}{{ href }}"{% if href == cur %} class="cur"{% endif %}>{{ label }}</a></li>
{% endfor %}
</ul>
{% endfor %}
</nav>
<main>
{{ body }}
</main>
</div></body></html>
"""


def _md_converter():
    import markdown

    return markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={
            "codehilite": {"guess_lang": False, "css_class": "highlight"}
        },
    )


def _fix_links(text: str, src_rel: pathlib.PurePosixPath) -> str:
    """Rewrite intra-repo .md/.ipynb links to the built .html pages."""

    def sub(m: "re.Match[str]") -> str:
        target = m.group(2)
        if "://" in target or target.startswith("#"):
            return m.group(0)
        new = re.sub(r"\.md(#[^)]*)?$", r".html\1", target)
        new = re.sub(r"\.ipynb(#[^)]*)?$", r".html\1", new)
        new = re.sub(r"^tutorials/$", "index.html#tutorial-notebooks", new)
        return f"{m.group(1)}({new})"

    return re.sub(r"(\[[^\]]*\])\(([^)]+)\)", sub, text)


def _render(env, pygments_css, out_dir, rel, title, body_html):
    rel = pathlib.PurePosixPath(rel)
    root = "../" * (len(rel.parts) - 1)
    page = env.from_string(PAGE).render(
        title=title, body=body_html, nav=NAV, cur=str(rel), root=root,
        pygments_css=pygments_css,
    )
    out = out_dir / rel
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(page)


def _title_of(md_text: str, fallback: str) -> str:
    m = re.search(r"^#\s+(.+)$", md_text, re.M)
    return m.group(1).strip() if m else fallback


def _notebook_body(path: pathlib.Path) -> str:
    """Notebook -> HTML body: markdown cells through the same renderer,
    code cells + text outputs as highlighted blocks (offline, no JS)."""
    import nbformat
    from pygments import highlight
    from pygments.formatters import HtmlFormatter
    from pygments.lexers import PythonLexer

    nb = nbformat.read(path, as_version=4)
    conv = _md_converter()
    parts = []
    for cell in nb.cells:
        if cell.cell_type == "markdown":
            conv.reset()
            parts.append(conv.convert(cell.source))
        elif cell.cell_type == "code" and cell.source.strip():
            parts.append(
                highlight(cell.source, PythonLexer(),
                          HtmlFormatter(cssclass="highlight"))
            )
            for out in cell.get("outputs", []):
                text = out.get("text") or (
                    out.get("data", {}).get("text/plain")
                )
                if text:
                    parts.append(
                        "<pre class='nb-out'>"
                        + html.escape("".join(text)) + "</pre>"
                    )
    return "\n".join(parts)


def build(out_dir: pathlib.Path) -> int:
    import jinja2
    from pygments.formatters import HtmlFormatter

    env = jinja2.Environment(autoescape=False)
    pygments_css = HtmlFormatter(cssclass="highlight").get_style_defs(
        ".highlight"
    )
    if out_dir.exists():
        shutil.rmtree(out_dir)

    pages = [(REPO / "README.md", "index.html")]
    for name in ("api", "architecture", "performance", "tutorial"):
        pages.append((DOCS / f"{name}.md", f"{name}.html"))
    for md in sorted((DOCS / "reference").glob("*.md")):
        pages.append((md, f"reference/{md.stem}.html"))

    notebooks = sorted((DOCS / "tutorials").glob("*.ipynb"))
    NAV[2] = (
        "Tutorial notebooks",
        [
            (f"tutorials/{nb.stem}.html",
             nb.stem.replace("Tutorial_", "").replace("_", " "))
            for nb in notebooks
        ],
    )

    n = 0
    conv = _md_converter()
    for src, rel in pages:
        text = _fix_links(src.read_text(), pathlib.PurePosixPath(rel))
        conv.reset()
        _render(env, pygments_css, out_dir, rel,
                _title_of(text, src.stem), conv.convert(text))
        n += 1
    for nb in notebooks:
        _render(env, pygments_css, out_dir, f"tutorials/{nb.stem}.html",
                nb.stem.replace("_", " "), _notebook_body(nb))
        n += 1
    return n


def main():
    out = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else DOCS / "_site"
    n = build(out)
    print(f"built {n} pages -> {out}")


if __name__ == "__main__":
    main()
