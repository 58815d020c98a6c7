"""Benchmark: full fwd+bwd differentiable-rendering step throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured pipeline (the BASELINE.json north star): rasterize -> render ->
interpolate UVs -> grid_sample texture -> edge_grad_estimator, forward +
backward (vertex gradients), on one chip.

The reference (facebookresearch/DRTK) publishes no benchmark numbers
(BASELINE.md). The de-facto contract is "fast enough for in-the-loop
optimization": the reference's tutorial loop is a 512x512 two-triangle fit.
We normalize against a 30 it/s @ 512x512 interactive-fit contract
(= 7.86 Mpix/s fwd+bwd) as `vs_baseline`.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MPIX_S = 512 * 512 * 30 / 1e6  # interactive-fit contract


def make_scene(batch, num_v, num_f, h, w, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    xy = rng.uniform(-0.1, 1.1, size=(batch, num_v, 2)).astype(np.float32)
    xy *= np.asarray([w, h], np.float32)
    z = rng.uniform(3.0, 9.0, size=(batch, num_v, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], axis=-1))
    vi = jnp.asarray(rng.randint(0, num_v, size=(num_f, 3)).astype(np.int32))
    vt = jnp.asarray(rng.uniform(0, 1, size=(batch, num_v, 2)).astype(np.float32))
    tex = jnp.asarray(rng.rand(batch, 3, 256, 256).astype(np.float32))
    return v, vi, vt, tex


def main():
    import jax
    import jax.numpy as jnp

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    batch, h, w = 1, 1024, 1024
    num_v, num_f = 4096, 8192
    v, vi, vt, tex = make_scene(batch, num_v, num_f, h, w)

    def loss_fn(v):
        index_img = dt.rasterize(v, vi, h, w)
        _, bary_img = dt.render(v, vi, index_img)
        vt_img = dt.interpolate(vt, vi, index_img, bary_img)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, mode="bilinear", padding_mode="border")
        img = img * (index_img != -1)[:, None]
        img = dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary_img, img=img, index_img=index_img
        )
        return jnp.mean(img**2)

    step = jax.jit(jax.value_and_grad(loss_fn))

    # Warmup / compile
    loss, grad = step(v)
    grad.block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        loss, grad = step(v)
    grad.block_until_ready()
    dt_s = (time.perf_counter() - t0) / n_iters

    mpix_s = batch * h * w / dt_s / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd+bwd pipeline throughput (rasterize+render+"
                f"interpolate+texture+edge_grad, {num_f} tris, {h}x{w})",
                "value": round(mpix_s, 2),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
