"""Benchmark: full fwd+bwd differentiable-rendering step throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured pipeline (BASELINE.json config 3, the "textured mesh render"
scale): rasterize (Pallas tile-binned) -> render -> interpolate UVs ->
grid_sample texture -> edge_grad_estimator, forward + backward (vertex
gradients), 1024x1024, ~51k-triangle connected mesh, on one chip.

The reference (facebookresearch/DRTK) publishes no benchmark numbers
(BASELINE.md). The de-facto contract is "fast enough for in-the-loop
optimization": the reference's tutorial loop is a 512x512 two-triangle
fit. We normalize against a 30 it/s @ 512x512 interactive-fit contract
(= 7.86 Mpix/s fwd+bwd) as `vs_baseline`.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MPIX_S = 512 * 512 * 30 / 1e6  # interactive-fit contract


def make_scene(h, w, gn, seed=0):
    """Connected grid mesh with 2*(gn-1)^2 triangles covering the canvas,
    plus per-vertex uvs and a texture — the BASELINE 'textured mesh render'
    configuration."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(
        np.linspace(0.02 * h, 0.98 * h, gn),
        np.linspace(0.02 * w, 0.98 * w, gn),
        indexing="ij",
    )
    z = 5.0 + rng.uniform(-1.0, 1.0, xs.shape)
    v = jnp.asarray(np.stack([xs, ys, z], -1).reshape(1, -1, 3).astype(np.float32))
    idx = np.arange(gn * gn).reshape(gn, gn)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([b, d, c], -1)], axis=0
    ).astype(np.int32)
    vi = jnp.asarray(faces)
    vt = jnp.asarray(
        np.stack([xs / w, ys / h], -1).reshape(1, -1, 2).astype(np.float32)
    )
    tex = jnp.asarray(rng.rand(1, 3, 512, 512).astype(np.float32))
    return v, vi, vt, tex


def main():
    import jax
    import jax.numpy as jnp

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    h = w = 1024
    gn = 161  # 51,200 triangles
    v, vi, vt, tex = make_scene(h, w, gn)

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

    mpix_s = h * w / dt_s / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd+bwd pipeline throughput (rasterize+render+"
                f"interpolate+texture+edge_grad, {vi.shape[0]} tris, {h}x{w})",
                "value": round(mpix_s, 2),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
