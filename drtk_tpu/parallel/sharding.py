"""Multi-chip sharding for the rasterization pipeline.

The reference has **no** distributed code (SURVEY.md §2.3): parallelism there
is CUDA grid-stride loops on one device. On TPU we scale the same workload
over a ``jax.sharding.Mesh``:

* **data axis** — cameras / batch dimension N (classic DP);
* **pix axis** — image rows H ("sequence parallelism" of this domain: the
  pixel grid is the long axis). Rasterize/render/interpolate/edge_grad are
  per-pixel, so sharding H makes them embarrassingly parallel; the CRD
  stencil of edge_grad touches one halo row, which GSPMD materializes as a
  collective-permute on ICI.

Vertices and topology are replicated (meshes are small next to pixel
buffers); vertex gradients therefore fan in across the mesh via the
``psum`` XLA inserts when transposing the replicated broadcast.

Two entry points:

* :func:`pipeline_sharding` + :func:`constrain` — GSPMD-style: annotate the
  pixel images, let XLA partition (the "pick a mesh, annotate shardings, let
  XLA insert collectives" recipe).
* :func:`make_mesh` — helper that factors the device count into a
  (data, pix) mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "pipeline_sharding", "constrain", "replicated"]


def make_mesh(
    n_devices: Optional[int] = None,
    batch: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Factor the devices into a (data, pix) mesh.

    The data axis gets the largest divisor of ``batch`` that divides the
    device count; the rest goes to pixel-row sharding.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    data = 1
    for d in range(min(batch, n), 0, -1):
        if n % d == 0 and batch % d == 0:
            data = d
            break
    pix = n // data
    dev_array = np.asarray(devices).reshape(data, pix)
    return Mesh(dev_array, axis_names=("data", "pix"))


def pipeline_sharding(mesh: Mesh) -> dict:
    """Shardings for the pipeline tensors on ``mesh``.

    Returns a dict with entries:
        image: [N, C, H, W] -> (data, None, pix, None)
        index: [N, H, W]    -> (data, pix, None)
        verts: [N, V, 3]    -> (data, None, None)  (replicated over pix)
    """
    return {
        "image": NamedSharding(mesh, P("data", None, "pix", None)),
        "index": NamedSharding(mesh, P("data", "pix", None)),
        "verts": NamedSharding(mesh, P("data", None, None)),
        "replicated": NamedSharding(mesh, P()),
    }


def constrain(x: jnp.ndarray, sharding: NamedSharding) -> jnp.ndarray:
    """``lax.with_sharding_constraint`` wrapper (annotate inside jit)."""
    return jax.lax.with_sharding_constraint(x, sharding)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
