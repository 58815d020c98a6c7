"""Render the generated API reference (docs/reference/) from docstrings.

The buildable-docs target (the reference builds a sphinx site with an
api_reference page per op, /root/reference/docs/source/api_reference.rst;
this repo renders markdown directly — no sphinx in the environment):

    python docs/gen_api.py          # writes docs/reference/*.md

One page per public module group, one section per public symbol:
signature + full docstring. tests/test_docs.py keeps the output in sync
with the live export set.
"""

from __future__ import annotations

import inspect
import pathlib
import sys


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj) -> str:
    return inspect.getdoc(obj) or "*(no docstring)*"


def render_symbol(name: str, obj) -> str:
    lines = [f"### `{name}`", ""]
    if inspect.isclass(obj):
        lines += [_doc(obj), ""]
        for mname, m in sorted(vars(obj).items()):
            if mname.startswith("_") or not callable(m):
                continue
            lines += [f"#### `{name}.{mname}{_signature(m)}`", "",
                      _doc(m), ""]
    else:
        lines += ["```", f"{name}{_signature(obj)}", "```", "", _doc(obj), ""]
    return "\n".join(lines)


def render_module(title: str, mod, names) -> str:
    parts = [f"# {title}", "",
             f"*Generated from docstrings by `docs/gen_api.py` "
             f"(module `{mod.__name__}`). Do not edit by hand.*", ""]
    for n in names:
        parts.append(render_symbol(n, getattr(mod, n)))
    return "\n".join(parts) + "\n"


def main(out_dir: str | None = None) -> pathlib.Path:
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import jax

    jax.config.update("jax_platforms", "cpu")

    import drtk_tpu as dt
    import drtk_tpu.utils as dtu
    from drtk_tpu.ops import filter2d, grid_sample
    from drtk_tpu.parallel import sharding, spmd

    out = pathlib.Path(
        out_dir or pathlib.Path(__file__).parent / "reference"
    )
    out.mkdir(parents=True, exist_ok=True)

    pages = {
        "core_pipeline.md": (
            "Core pipeline",
            dt,
            [
                "transform", "transform_with_v_cam", "rasterize",
                "rasterize_with_depth", "render", "render_ref",
                "interpolate", "interpolate_ref", "interpolation_matrix",
                "interpolation_normal_matrix",
                "interpolation_normal_structure",
                "interpolation_normal_matrix_values",
                "InterpolationMatrix", "NormalMatrix", "NormalStructure",
                "edge_grad_estimator", "edge_grad_estimator_ref",
                "screen_space_uv_derivative",
            ],
        ),
        "texture_ops.md": (
            "Texture ops",
            dt,
            [
                "mipmap_grid_sample", "mipmap_grid_sample_ref",
                "grid_scatter", "grid_scatter_ref", "msi",
            ],
        ),
        "grid_sample.md": (
            "grid_sample (torch-parity sampler)",
            grid_sample,
            [n for n in getattr(grid_sample, "__all__", ["grid_sample"])],
        ),
        "filter2d.md": (
            "filter2d (alias-free resampling)",
            filter2d,
            list(getattr(filter2d, "__all__", [])),
        ),
        "utils.md": (
            "Geometry / camera utils",
            dtu,
            [n for n in dir(dtu)
             if not n.startswith("_") and callable(getattr(dtu, n))],
        ),
        "parallel.md": (
            "Parallel / sharding",
            sharding,
            list(getattr(sharding, "__all__", []))
            or [n for n in dir(sharding)
                if not n.startswith("_")
                and callable(getattr(sharding, n))
                and getattr(sharding, n).__module__ == sharding.__name__],
        ),
        "spmd.md": (
            "Explicit SPMD pipeline",
            spmd,
            list(getattr(spmd, "__all__", []))
            or [n for n in dir(spmd)
                if not n.startswith("_")
                and callable(getattr(spmd, n))
                and getattr(spmd, n).__module__ == spmd.__name__],
        ),
    }

    index = ["# drtk_tpu generated API reference", "",
             "*Rendered from docstrings by `python docs/gen_api.py`. "
             "The curated overview lives in [../api.md](../api.md).*", ""]
    for fname, (title, mod, names) in pages.items():
        (out / fname).write_text(render_module(title, mod, names))
        index.append(f"- [{title}]({fname}) — {len(names)} symbols")
    (out / "index.md").write_text("\n".join(index) + "\n")
    return out


if __name__ == "__main__":
    path = main(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"wrote {len(list(path.glob('*.md')))} pages to {path}")
