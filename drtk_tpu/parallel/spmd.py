"""Explicit-SPMD (shard_map) formulation of the rendering pipeline.

The GSPMD path (drtk_tpu.parallel.sharding) annotates shardings and lets XLA
partition. This module is the explicit alternative for when you want full
control of the communication schedule: every device runs the pipeline on its
own **row block** of the pixel grid, with exactly these collectives:

* rasterize / render evaluate only the block's rows, as a bit-exact row-tile
  viewport of the full frame (edge functions are affine in pixel
  coordinates, so offsetting the pixel grid reproduces the full-frame float
  math exactly) — zero communication in the forward;
* edge_grad's backward fetches one halo row of img / grad_output / index /
  bary from the next shard with ``ppermute`` (one hop over ICI);
* vertex / attribute / texture gradients are reduced locally per shard and
  summed by the ``psum`` that shard_map's transpose inserts for the
  replicated inputs — XLA overlaps it with the remaining backward.

The reference has no distributed code at all (SURVEY.md §2.3); this layer is
the TPU-native scaling story for its workload (BASELINE.md: pixel-throughput
scaling at 1 chip -> 1 host -> N hosts).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 exports shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["make_row_sharded_forward"]


def make_row_sharded_forward(
    mesh: Mesh,
    vi: jnp.ndarray,
    height: int,
    width: int,
    data_axis: Optional[str] = "data",
    pix_axis: str = "pix",
    shade: Optional[Callable] = None,
) -> Callable:
    """Build ``forward(v, vt, tex) -> img`` running under shard_map.

    The returned function is differentiable end to end (including edge_grad's
    discontinuity gradients across shard boundaries) and returns the full
    [N, C, H, W] image as a global array sharded
    ``P(data_axis, None, pix_axis, None)`` — compose any elementwise loss on
    it outside.

    Parity contract vs the single-device pipeline: index/coverage decisions
    and the background sweep are bit-exact (viewport rasterize + viewport
    interpolate sweep); foreground shading values may differ by XLA
    fusion/FMA-contraction ulps (~1e-7 relative) because the sharded
    program fuses differently — the same class as the documented
    Pallas-vs-XLA contract (tests/test_spmd.py pins both halves).

    Args:
        mesh: a Mesh with ``pix_axis`` (and optionally ``data_axis``) —
            e.g. from :func:`drtk_tpu.parallel.sharding.make_mesh`.
        vi: [F, 3] int32 topology (replicated).
        height / width: full-frame size; ``height`` must divide evenly by
            the pix-axis size.
        data_axis: mesh axis for the batch dimension, or None to replicate.
        pix_axis: mesh axis for pixel rows.
        shade: optional ``shade(vt_img [N,2,hb,W], tex) -> img [N,C,hb,W]``
            block shader; the default samples ``tex`` bilinearly at
            ``vt_img * 2 - 1`` with border padding (the reference tutorial
            shading, drtk/edge_grad_estimator.py:139-149).
    """
    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    p_cnt = mesh.shape[pix_axis]
    if height % p_cnt != 0:
        raise ValueError(
            f"height {height} not divisible by pix-axis size {p_cnt}"
        )
    hb = height // p_cnt

    if shade is None:

        def shade(vt_img, tex):
            uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
            return grid_sample(
                tex, uv, mode="bilinear", padding_mode="border",
                align_corners=False,
            )

    d = data_axis if (data_axis and data_axis in mesh.shape) else None
    in_specs = (P(d), P(d), P(d))
    out_spec = P(d, None, pix_axis, None)

    def block(v, vt, tex):
        y0 = jax.lax.axis_index(pix_axis) * hb
        index_img = dt.rasterize(
            v, vi, hb, width, impl="auto", y_offset=y0, full_height=height
        )
        depth, bary = dt.render(v, vi, index_img, y_offset=y0)
        # y_offset/full_height: the background sweep uses global rows, so
        # vt_img matches the full-frame run bit-exactly even at background
        # pixels (custom shade callbacks need not mask before sampling).
        vt_img = dt.interpolate(
            vt, vi, index_img, bary, y_offset=y0, full_height=height
        )
        img = shade(vt_img, tex)
        img = img * (index_img != -1)[:, None]
        img = dt.edge_grad_estimator(
            v_pix=v,
            vi=vi,
            bary_img=bary,
            img=img,
            index_img=index_img,
            spmd_axis_name=pix_axis,
            y_offset=y0,
            full_height=height,
        )
        return img

    return shard_map(block, mesh=mesh, in_specs=in_specs, out_specs=out_spec)
