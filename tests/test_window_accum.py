"""Tests: windowed 2-D accumulation (drtk_tpu.ops.window_accum) equals the
plain scatter-add, on the MXU fast path (interpret mode) and the fallback."""

import jax.numpy as jnp
import numpy as np

from drtk_tpu.ops.window_accum import window_accumulate


def _ref(rows, iy, ix, H, W):
    n, k, p = rows.shape
    out = np.zeros((n, k, H, W), np.float32)
    for b in range(n):
        for j in range(p):
            if iy[b, j] >= 0:
                out[b, :, iy[b, j], ix[b, j]] += rows[b, :, j]
    return out


def _coherent_case(seed=0, n=2, p=4096, k=12, H=64, W=256, block=1024,
                   spread=(40, 100)):
    rng = np.random.RandomState(seed)
    iy = np.zeros((n, p), np.int32)
    ix = np.zeros((n, p), np.int32)
    for b in range(p // block):
        yb = rng.randint(0, H - spread[0])
        xb = rng.randint(0, W - spread[1])
        iy[:, b * block : (b + 1) * block] = yb + rng.randint(
            0, spread[0], (n, block)
        )
        ix[:, b * block : (b + 1) * block] = xb + rng.randint(
            0, spread[1], (n, block)
        )
    rows = rng.randn(n, k, p).astype(np.float32)
    return rows, iy, ix, H, W, block


def test_fast_path_matches_scatter():
    rows, iy, ix, H, W, block = _coherent_case()
    iy[:, ::17] = -1  # inert taps (rows deliberately NOT zeroed)
    out = window_accumulate(
        jnp.asarray(rows), jnp.asarray(iy), jnp.asarray(ix), H, W,
        block=block, win_h=48, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), _ref(rows, iy, ix, H, W), rtol=1e-4, atol=1e-4
    )


def test_overflow_falls_back():
    rows, iy, ix, H, W, block = _coherent_case(seed=1)
    # one tap far away -> its block's bbox exceeds the window
    iy[0, 5], ix[0, 5] = H - 1, W - 1
    out = window_accumulate(
        jnp.asarray(rows), jnp.asarray(iy), jnp.asarray(ix), H, W,
        block=block, win_h=48, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), _ref(rows, iy, ix, H, W), rtol=1e-4, atol=1e-4
    )


def test_alignment_and_bounds_edges():
    # bboxes straddling the 8-row / 128-column alignment boundaries and
    # hugging the table edges
    rng = np.random.RandomState(2)
    n, k, H, W, block = 1, 5, 64, 384, 256
    ys = [0, 7, 8, 120 % (H - 40), H - 41]
    xs = [0, 127, 128, 255, W - 101]
    iy = np.zeros((n, len(ys) * block), np.int32)
    ix = np.zeros_like(iy)
    for b, (y, x) in enumerate(zip(ys, xs)):
        iy[:, b * block : (b + 1) * block] = y + rng.randint(0, 40, (n, block))
        ix[:, b * block : (b + 1) * block] = x + rng.randint(0, 100, (n, block))
    rows = rng.randn(n, k, iy.shape[1]).astype(np.float32)
    out = window_accumulate(
        jnp.asarray(rows), jnp.asarray(iy), jnp.asarray(ix), H, W,
        block=block, win_h=48, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), _ref(rows, iy, ix, H, W), rtol=1e-4, atol=1e-4
    )


def test_single_channel_row_group_exceeds_window():
    # k=1 -> 128 packed rows per dot > win_h: one group covers the window
    rows, iy, ix, H, W, block = _coherent_case(seed=4, k=1)
    out = window_accumulate(
        jnp.asarray(rows), jnp.asarray(iy), jnp.asarray(ix), H, W,
        block=block, win_h=48, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), _ref(rows, iy, ix, H, W), rtol=1e-4, atol=1e-4
    )


def test_padding_of_tap_count():
    rows, iy, ix, H, W, block = _coherent_case(seed=3, p=4096)
    rows = rows[:, :, :3000]
    iy, ix = iy[:, :3000], ix[:, :3000]
    out = window_accumulate(
        jnp.asarray(rows), jnp.asarray(iy), jnp.asarray(ix), H, W,
        block=1024, win_h=48, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), _ref(rows, iy, ix, H, W), rtol=1e-4, atol=1e-4
    )


def test_bf16_split3_reconstructs_f32_exactly():
    """Pin the accuracy claim (ADVICE r2): three bf16 terms cover the f32
    mantissa up to rounding-boundary effects — (a) their sum reconstructs
    x to <= 4 f32 ulp (~2.4e-7 relative; measured max 3.9), and (b) a
    one-hot dot through the split matches the f32 dot to f32 rounding —
    the property segment_rows/window_accum build on. (The two-term
    split's ~2^-17 relative error broke the 1e-4 parity contract; this
    pins the three-term margin at ~400x inside it.)"""
    from drtk_tpu.ops.window_accum import bf16_split3

    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.randn(4096).astype(np.float32) * 10.0**rng.randint(-30, 30, 4096),
        np.array([0.0, -0.0, 1.0, -1.0, np.float32(2**-126),
                  np.finfo(np.float32).max / 4], np.float32),
    ])
    hi, mid, lo = bf16_split3(jnp.asarray(x))
    recon = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
             + lo.astype(jnp.float32))
    err = np.abs(np.asarray(recon) - x)
    ulp = np.spacing(np.abs(x).astype(np.float32))
    assert (err <= 4 * ulp).all(), (
        f"max {np.max(err / np.maximum(ulp, 1e-45))} ulp"
    )

    # one-hot dot exactness: sum over a masked subset == f32 scatter result
    vals = rng.randn(512).astype(np.float32)
    onehot = (rng.rand(512) < 0.3).astype(np.float32)
    want = np.dot(vals.astype(np.float64), onehot).astype(np.float32)
    h, m, l = (np.asarray(t).astype(np.float32) for t in
               bf16_split3(jnp.asarray(vals)))
    got = np.float32(0.0)
    for term in (h, m, l):
        got += np.dot(term.astype(np.float64), onehot).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-7, atol=0)
