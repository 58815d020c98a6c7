"""Explicit-SPMD (shard_map) pipeline tests (drtk_tpu.parallel.spmd).

Each device renders a row block of the frame as a bit-exact viewport tile;
edge_grad's backward exchanges one halo row with ppermute; vertex/attribute
gradients psum across the mesh inside the custom VJPs. Contract: identical
forward images (bit-equal) and gradients (f64: ~1e-12; f32: reduction-order
noise only) vs the single-device pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import drtk_tpu as dt
from drtk_tpu.ops.grid_sample import grid_sample
from drtk_tpu.parallel.sharding import make_mesh
from drtk_tpu.parallel.spmd import make_row_sharded_forward

from tests.utils import grid_mesh, two_triangles_scene


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def _ref_forward(vi, h, w):
    def f(v, vt, tex):
        idx = dt.rasterize(v, vi, h, w)
        _, bary = dt.render(v, vi, idx)
        vt_img = dt.interpolate(vt, vi, idx, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(
            tex, uv, mode="bilinear", padding_mode="border",
            align_corners=False,
        )
        img = img * (idx != -1)[:, None]
        return dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary, img=img, index_img=idx
        )

    return f


def _scene(batch, h, w, scene="two_triangles", dtype=jnp.float32):
    if scene == "two_triangles":
        v, vi, _ = two_triangles_scene(h, w, dtype=dtype)
    else:
        v, vi = grid_mesh(h, w, gn=7, z0=5.0, z_amp=2.0, seed=5)
        v = v.astype(dtype)
    rng = np.random.RandomState(3)
    if batch > 1:
        jitter = jnp.asarray(
            rng.uniform(-3, 3, size=(batch, 1, 3)).astype(np.float32), dtype
        )
        v = v + jitter
    vt = jnp.asarray(
        rng.uniform(0.05, 0.95, size=(1, v.shape[1], 2)).astype(np.float32),
        dtype,
    )
    vt = jnp.broadcast_to(vt, (batch,) + vt.shape[1:])
    tex = jnp.asarray(rng.rand(batch, 3, 32, 32).astype(np.float32), dtype)
    weight = jnp.asarray(rng.randn(batch, 3, h, w).astype(np.float32), dtype)
    return v, vi, vt, tex, weight


@pytest.mark.parametrize(
    "scene,batch,dtype,tol",
    [
        ("two_triangles", 1, jnp.float64, 1e-12),
        ("two_triangles", 2, jnp.float32, 1e-5),
        ("grid_mesh", 1, jnp.float64, 1e-12),
    ],
)
def test_shard_map_pipeline_matches_single_device(scene, batch, dtype, tol):
    _require_devices(8)
    h = w = 96
    v, vi, vt, tex, weight = _scene(batch, h, w, scene, dtype)
    mesh = make_mesh(8, batch=batch)

    ref = _ref_forward(vi, h, w)
    fwd = make_row_sharded_forward(mesh, vi, h, w)

    img1 = jax.jit(ref)(v, vt, tex)
    img8 = jax.jit(fwd)(v, vt, tex)
    np.testing.assert_array_equal(
        np.asarray(img8), np.asarray(img1),
        err_msg="row-tiled forward is not bit-equal to full-frame",
    )

    loss1 = lambda *a: jnp.sum(ref(*a) * weight)
    loss8 = lambda *a: jnp.sum(fwd(*a) * weight)
    g1 = jax.jit(jax.grad(loss1, argnums=(0, 1, 2)))(v, vt, tex)
    g8 = jax.jit(jax.grad(loss8, argnums=(0, 1, 2)))(v, vt, tex)
    for name, a, b in zip(["grad_v", "grad_vt", "grad_tex"], g8, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=tol, atol=tol * scale, err_msg=f"{name} mismatch"
        )


def test_tile_viewport_bit_exact():
    """rasterize/render row tiles reproduce the full frame bit-exactly —
    the property the shard_map pipeline is built on."""
    h = w = 96
    v, vi, _ = two_triangles_scene(h, w)
    idx_full = dt.rasterize(v, vi, h, w)
    depth_full, bary_full = dt.render(v, vi, idx_full)
    for y0, hb in [(0, 32), (32, 32), (64, 32), (12, 84)]:
        idx_t = dt.rasterize(
            v, vi, hb, w, impl="xla", y_offset=y0, full_height=h
        )
        np.testing.assert_array_equal(
            np.asarray(idx_t), np.asarray(idx_full[:, y0 : y0 + hb])
        )
        depth_t, bary_t = dt.render(v, vi, idx_t, y_offset=y0)
        np.testing.assert_array_equal(
            np.asarray(depth_t), np.asarray(depth_full[:, y0 : y0 + hb])
        )
        np.testing.assert_array_equal(
            np.asarray(bary_t), np.asarray(bary_full[:, :, y0 : y0 + hb])
        )


def test_wireframe_tile_viewport():
    h = w = 64
    v, vi, _ = two_triangles_scene(h, w)
    vi_wf = vi.at[:, 0].set(vi[:, 0] | (0x7 << 28))
    idx_full = dt.rasterize(v, vi_wf, h, w, wireframe=True)
    idx_t = dt.rasterize(
        v, vi_wf, 32, w, wireframe=True, y_offset=16, full_height=h
    )
    np.testing.assert_array_equal(
        np.asarray(idx_t), np.asarray(idx_full[:, 16:48])
    )


def _collective_inventory(hlo_text):
    """Parse (op, result_shapes) for every collective in optimized HLO.

    Returns a list of (opname, [shape_str, ...]) where shape_str is like
    'f32[1,3,1,96]'. Tuple-shaped results are split into their elements.
    """
    import re

    ops = []
    pat = re.compile(
        r"=\s*(\([^)]*\)|\S+)\s+"
        r"(all-reduce|all-gather|collective-permute|reduce-scatter|"
        r"all-to-all)\b"
    )
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        shapes = re.findall(r"[a-z0-9]+\[[0-9,]*\]", m.group(1))
        ops.append((m.group(2), shapes))
    return ops


def _shape_bytes(shape_str):
    import re

    m = re.match(r"([a-z]+)(\d+)\[([0-9,]*)\]", shape_str)
    bits = int(m.group(2))
    dims = [int(d) for d in m.group(3).split(",") if d] or [1]
    n = 1
    for d in dims:
        n *= d
    return n * bits // 8


def test_collective_inventory_of_sharded_backward():
    """Pin the communication structure of the row-sharded training step
    (VERDICT r3 #5): the scaling claim must be falsifiable without multi-
    chip hardware. In the optimized HLO of value_and_grad over the
    shard_map pipeline on the 8-device mesh:

    * collective-permutes exist only for the edge_grad halo exchange — one
      row of img / grad_output / bary / index each, so every transferred
      block is <= one pixel row (tiny vs the frame);
    * all-reduces (shard_map's transpose psums) carry only vertex /
      uv / texture gradients — never a pixel-area buffer;
    * no all-gather or all-to-all materializes a pixel-area buffer.

    Bit-exact *values* are pinned by the parity tests above; this test pins
    the *structure* so a refactor that silently inserts an all-gather of
    the frame (killing scaling) fails loudly.
    """
    _require_devices(8)
    h = w = 96
    v, vi, vt, tex, weight = _scene(1, h, w)
    mesh = make_mesh(8, batch=1)
    fwd = make_row_sharded_forward(mesh, vi, h, w)
    loss = lambda v, vt, tex: jnp.sum(fwd(v, vt, tex) * weight)
    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    hlo = step.lower(v, vt, tex).compile().as_text()
    inv = _collective_inventory(hlo)

    halo_row_bytes = 1 * 3 * 1 * w * 4  # [N=1, C=3, 1 row, W] f32
    # Largest legitimate reduce operand: the texture cotangent travels in
    # grid_sample's quad-table layout ([N, Ht*Wt, 4C] — 4x the texture) so
    # the replicated-input psum happens before the un-quadding gather.
    grad_bytes = max(
        v.size * v.dtype.itemsize,
        vt.size * vt.dtype.itemsize,
        4 * tex.size * tex.dtype.itemsize,
    )
    pixel_area_bytes = h * w * 4 // 8  # even 1/8 of a channel plane is a bug

    permutes = [s for op, shapes in inv if op == "collective-permute"
                for s in shapes]
    reduces = [s for op, shapes in inv if op in ("all-reduce",
                                                 "reduce-scatter")
               for s in shapes]
    gathers = [s for op, shapes in inv if op in ("all-gather", "all-to-all")
               for s in shapes]

    assert permutes, "halo exchange missing from the backward HLO"
    for s in permutes:
        assert _shape_bytes(s) <= halo_row_bytes, (
            f"collective-permute moves {s} — more than one halo row"
        )
    assert reduces, "gradient psum missing from the backward HLO"
    for s in reduces:
        assert _shape_bytes(s) <= grad_bytes, (
            f"all-reduce carries {s} — larger than any gradient operand"
        )
    for s in gathers:
        assert _shape_bytes(s) < pixel_area_bytes, (
            f"all-gather/all-to-all materializes {s} — pixel-scale "
            "replication would kill scaling"
        )


def test_random_scene_sweep_and_index_parity():
    """Random overlapping-triangle scene (harder than the curated scenes
    above): the sharded pipeline must keep (a) index/bary-driven coverage
    decisions bit-exact (viewport rasterize), (b) the background sweep
    bit-exact (interpolate y_offset/full_height), while foreground shading
    may differ from the single-device program by XLA fusion/contraction
    ulps only (<=1e-5 absolute at unit scale — same class as the
    documented Pallas/XLA FMA-contraction contract, CLAUDE.md)."""
    _require_devices(4)
    h = w = 64
    rng = np.random.RandomState(0)
    v = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 64, (1, 24, 2)), rng.uniform(3, 9, (1, 24, 1))],
            -1,
        ).astype(np.float32)
    )
    vi = jnp.asarray(rng.randint(0, 24, (30, 3)).astype(np.int32))
    vt = jnp.asarray(rng.rand(1, 24, 2).astype(np.float32))
    tex = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    mesh = make_mesh(4, batch=1)

    # index parity: per-shard viewport rasterize == full-frame rows
    idx1 = dt.rasterize(v, vi, h, w)
    hb = h // 4
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def idx_block(v):
        y0 = jax.lax.axis_index("pix") * hb
        return dt.rasterize(v, vi, hb, w, y_offset=y0, full_height=h)

    idx4 = jax.jit(
        shard_map(
            idx_block, mesh=mesh, in_specs=(P(),),
            out_specs=P(None, "pix", None),
        )
    )(v)
    np.testing.assert_array_equal(np.asarray(idx4), np.asarray(idx1))

    # full pipeline: sweep-exact background, ulp-close foreground
    fwd = make_row_sharded_forward(mesh, vi, h, w)
    img4 = jax.jit(fwd)(v, vt, tex)
    img1 = jax.jit(_ref_forward(vi, h, w))(v, vt, tex)
    d = np.abs(np.asarray(img4) - np.asarray(img1)).max(axis=1)[0]
    bg = np.asarray(idx1[0] == -1)
    assert d[bg].max() == 0.0, "background must be bit-exact (sweep fix)"
    assert d.max() <= 1e-5, f"foreground beyond ulp budget: {d.max()}"
