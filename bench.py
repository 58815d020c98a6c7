"""Benchmark: full fwd+bwd differentiable-rendering step throughput.

Default mode prints ONE JSON line: {"metric", "value", "unit",
"vs_baseline"} — the driver contract. `python bench.py --all` measures the
whole BASELINE.json config matrix (one JSON line per config) and writes
BENCH_MATRIX.json.

Configs:
  textured   (BASELINE config 3)  rasterize -> render -> interpolate UVs ->
             grid_sample texture -> edge_grad, fwd+bwd, 1024x1024, ~51k tris.
  inverse8   (BASELINE config 4)  8-view inverse rendering: transform(world
             verts, 8 cameras) -> pipeline -> photometric + silhouette loss,
             full Adam step on (geometry, texture), 8 x 512x512.
  attr_fit   (VERDICT r1 #6)      texture/uv optimization with frozen
             geometry — exercises interpolate's default attribute-gradient
             path (binned-matmul accumulator, no geometry hint).
  avatar4k   (BASELINE config 5, single-chip slice)  4096x4096, ~101k tris,
             mipmap shading + msi background composite, Adam step on
             (geometry, mip pyramid, msi texture).

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


def _init_backend(retries=12, delay_s=60.0, probe_timeout_s=120.0):
    """Bring the JAX backend up before any bench work, riding out transient
    TPU-tunnel failures (the axon plugin sometimes raises "Unable to
    initialize backend ... UNAVAILABLE" — the round-2 bench lost its
    evidence to exactly that — and sometimes HANGS in device init during
    tunnel outages). Each probe runs in a SUBPROCESS with a timeout, so a
    hung init can't wedge the bench; only a probe that succeeds is followed
    by in-process jax.devices(). Fails with a clear message after ~12 min
    of persistent unavailability."""
    import subprocess
    import sys

    last = None
    for attempt in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform, len(d))"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if out.returncode == 0:
                import jax

                devs = jax.devices()
                print(
                    json.dumps({"note": "backend up", "devices": len(devs),
                                "platform": devs[0].platform}),
                    flush=True,
                )
                return
            last = out.stderr.strip().splitlines()[-1:] or ["rc != 0"]
        except subprocess.TimeoutExpired:
            last = [f"device init hung > {probe_timeout_s}s (tunnel outage?)"]
        print(
            json.dumps({"note": "backend init retry",
                        "attempt": attempt + 1, "error": str(last)[:200]}),
            flush=True,
        )
        time.sleep(delay_s)
    raise RuntimeError(
        f"JAX backend failed to initialize after {retries} attempts: {last}"
    )


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


def _time_step(step, args, n_iters, warmup=1):
    import jax

    out = step(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = step(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def _emit(name, mpix_s, detail):
    rec = {
        "metric": f"{name}: {detail}",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }
    print(json.dumps(rec))
    return {"config": name, **rec}


def bench_textured(n_iters=20, h=1024, gn=161):
    import jax
    import jax.numpy as jnp

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    w = h  # gn=161 -> 51,200 triangles at the default scale
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
    dt_s = _time_step(step, (v,), n_iters)
    return _emit(
        "textured",
        h * w / dt_s / 1e6,
        "fwd+bwd pipeline throughput (rasterize+render+interpolate+texture+"
        f"edge_grad, {vi.shape[0]} tris, {h}x{w})",
    )


def bench_inverse8(n_iters=10, h=512, gn=81):
    """BASELINE config 4: 8-view inverse rendering training step."""
    import jax
    import jax.numpy as jnp
    import optax

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    w = h  # gn=81 -> 12,800 triangles at the default scale
    views = 8
    rng = np.random.RandomState(0)

    # World-space grid mesh in front of the cameras.
    ys, xs = np.meshgrid(
        np.linspace(-0.9, 0.9, gn), np.linspace(-0.9, 0.9, gn), indexing="ij"
    )
    z = 4.0 + 0.3 * rng.randn(gn, gn)
    v_world = jnp.asarray(
        np.stack([xs, ys, z], -1).reshape(1, -1, 3).astype(np.float32)
    )
    idx = np.arange(gn * gn).reshape(gn, gn)
    faces = np.concatenate(
        [
            np.stack([idx[:-1, :-1], idx[:-1, 1:], idx[1:, :-1]], -1).reshape(-1, 3),
            np.stack([idx[:-1, 1:], idx[1:, 1:], idx[1:, :-1]], -1).reshape(-1, 3),
        ]
    ).astype(np.int32)
    vi = jnp.asarray(faces)
    vt = jnp.asarray(
        np.stack([(xs + 1) / 2, (ys + 1) / 2], -1).reshape(1, -1, 2).astype(np.float32)
    )
    tex_gt = jnp.asarray(rng.rand(1, 3, 256, 256).astype(np.float32))

    # 8 cameras on a small ring, all looking +z.
    th = np.linspace(0, 2 * np.pi, views, endpoint=False)
    campos = jnp.asarray(
        np.stack([0.25 * np.cos(th), 0.25 * np.sin(th), np.zeros(views)], -1)
        .astype(np.float32)
    )
    camrot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (views, 1, 1)))
    # Frame the mesh to fill the canvas (f ~ 0.45*w*z/extent): a mesh
    # crammed into a couple of tiles measures bin-overflow handling, not
    # full-frame throughput.
    focal = jnp.asarray(
        np.tile(np.diag([1.9 * h, 1.9 * h]).astype(np.float32), (views, 1, 1))
    )
    princpt = jnp.asarray(
        np.tile(np.array([w / 2, h / 2], np.float32), (views, 1))
    )

    def forward(v1, tex):
        v8 = jnp.broadcast_to(v1, (views,) + v1.shape[1:])
        v_pix = dt.transform(v8, campos, camrot, focal, princpt)
        index_img = dt.rasterize(v_pix, vi, h, w)
        _, bary = dt.render(v_pix, vi, index_img)
        vt_img = dt.interpolate(
            jnp.broadcast_to(vt, (views,) + vt.shape[1:]), vi, index_img, bary
        )
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        rgb = grid_sample(
            jnp.broadcast_to(tex, (views,) + tex.shape[1:]), uv,
            mode="bilinear", padding_mode="border",
        )
        maskf = (index_img != -1)[:, None].astype(jnp.float32)
        img = jnp.concatenate([rgb * maskf, maskf], axis=1)  # rgb+silhouette
        return dt.edge_grad_estimator(
            v_pix=v_pix, vi=vi, bary_img=bary, img=img, index_img=index_img
        )

    img_gt = jax.jit(forward)(v_world, tex_gt)
    v0 = v_world + 0.02
    tex0 = jnp.full_like(tex_gt, 0.5)
    opt = optax.adam(1e-3)
    opt_state = opt.init((v0, tex0))

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((forward(*p) - img_gt) ** 2)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    dt_s = _time_step(train_step, ((v0, tex0), opt_state), n_iters)
    return _emit(
        "inverse8",
        views * h * w / dt_s / 1e6,
        f"8-view inverse-rendering Adam step (transform+pipeline+silhouette, "
        f"{vi.shape[0]} tris, 8x{h}x{w}, grads to world verts + texture)",
    )


def bench_attr_fit(n_iters=10, h=1024, gn=161):
    """Texture/uv fit with frozen geometry: interpolate's default
    attribute-gradient path (index-derived binned-matmul accumulator)."""
    import jax
    import jax.numpy as jnp

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    w = h
    v, vi, vt, tex = make_scene(h, w, gn)
    index_img = dt.rasterize(v, vi, h, w)
    _, bary = dt.render(v, vi, index_img)
    mask = (index_img != -1)[:, None]

    def loss_fn(vt, tex):
        vt_img = dt.interpolate(vt, vi, index_img, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, mode="bilinear", padding_mode="border")
        return jnp.mean((img * mask) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    dt_s = _time_step(step, (vt, tex), n_iters)
    return _emit(
        "attr_fit",
        h * w / dt_s / 1e6,
        f"attribute-fit fwd+bwd (interpolate default attr-grad path, "
        f"{vi.shape[0]} tris, {h}x{w}, grads to uvs + texture)",
    )


def bench_avatar4k(n_iters=3, h=4096, gn=226, bh=256):
    """BASELINE config 5 (single-chip slice): 4K, ~101k tris, mipmap
    shading, msi background composite, Adam step."""
    import jax
    import jax.numpy as jnp
    import optax

    import drtk_tpu as dt
    from drtk_tpu.ops.mipmap_grid_sample import mipmap_grid_sample
    from drtk_tpu.ops.msi import msi

    w = h  # gn=226 -> 101,250 tris at the default scale
    v, vi, vt, tex = make_scene(h, w, gn)
    rng = np.random.RandomState(1)
    levels = [
        jnp.asarray(rng.rand(1, 3, 512 >> i, 512 >> i).astype(np.float32))
        for i in range(4)
    ]
    msi_tex = jnp.asarray(rng.rand(8, 4, 64, 128).astype(np.float32))

    # Low-res background ray grid (msi backgrounds are low-frequency); the
    # composite upsamples to the frame.
    bw = bh
    ys, xs = np.meshgrid(
        np.linspace(-1, 1, bh), np.linspace(-1, 1, bw), indexing="ij"
    )
    ray_d = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_d = jnp.asarray(ray_d.astype(np.float32))
    ray_o = jnp.zeros_like(ray_d)

    def loss_fn(params):
        v, levels, msi_tex = params
        index_img = dt.rasterize(v, vi, h, w)
        _, bary = dt.render(v, vi, index_img)
        vt_img = dt.interpolate(vt, vi, index_img, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        # Screen-space uv Jacobian by finite differences of the uv image
        # (no grad to vt_dxdy, like the reference).
        uv_sg = jax.lax.stop_gradient(uv)
        dx = jnp.pad(uv_sg[:, :, 1:] - uv_sg[:, :, :-1], ((0, 0), (0, 0), (0, 1), (0, 0)))
        dy = jnp.pad(uv_sg[:, 1:] - uv_sg[:, :-1], ((0, 0), (0, 1), (0, 0), (0, 0)))
        vt_dxdy = jnp.stack([dx, dy], axis=-2) * 0.5  # to 0..1 uv units
        rgb = mipmap_grid_sample(
            levels, uv, vt_dxdy, max_aniso=2, mode="bilinear",
            padding_mode="border", clip_grad=True,
        )
        maskf = (index_img != -1)[:, None].astype(jnp.float32)
        fg = dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary, img=rgb * maskf,
            index_img=index_img,
        )
        bg = msi(ray_o, ray_d, msi_tex, sub_step_count=2)
        bg_img = jnp.moveaxis(bg[:, :3].reshape(1, bh, bw, 3), -1, 1)
        bg_img = jax.image.resize(bg_img, (1, 3, h, w), "bilinear")
        img = fg + bg_img * (1.0 - maskf)
        return jnp.mean(img**2)

    params = (v, levels, msi_tex)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # Remat the forward: the combined residual set (mipmap taps + render
    # geometry + edge_grad stencils at 16 Mpix) otherwise exceeds HBM and
    # XLA falls into a memory-squeezed schedule ~1.7x slower than
    # recompute-in-backward.
    loss_ckpt = jax.checkpoint(loss_fn)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_ckpt)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    dt_s = _time_step(train_step, (params, opt_state), n_iters)
    return _emit(
        "avatar4k",
        h * w / dt_s / 1e6,
        f"4K avatar-fit Adam step (mipmap shading + msi background, "
        f"{vi.shape[0]} tris, {h}x{w}, grads to verts + pyramid + msi)",
    )


def bench_scaling(n_iters=10, h=1024, gn=161):
    """Pixel-throughput scaling over the available devices (BASELINE.md:
    >=80% linear scaling target). Runs the explicit-SPMD row-sharded
    pipeline (drtk_tpu.parallel.spmd) at power-of-two device counts and
    reports throughput + efficiency per count. On a single chip this
    degenerates to the 1-device entry; on a pod slice or the virtual CPU
    mesh it measures the scaling curve."""
    import jax
    import jax.numpy as jnp

    from drtk_tpu.parallel.sharding import make_mesh
    from drtk_tpu.parallel.spmd import make_row_sharded_forward

    w = h
    v, vi, vt, tex = make_scene(h, w, gn)
    counts = [
        c for c in [1, 2, 4, 8, 16, 32] if c <= len(jax.devices()) and h % c == 0
    ]
    results = []
    for nd in counts:
        mesh = make_mesh(nd, batch=1)
        fwd = make_row_sharded_forward(mesh, vi, h, w)
        step = jax.jit(
            jax.value_and_grad(lambda v: jnp.mean(fwd(v, vt, tex) ** 2))
        )
        dt_s = _time_step(step, (v,), n_iters)
        results.append({"devices": nd, "mpix_s": round(h * w / dt_s / 1e6, 2)})
    base = results[0]["mpix_s"]
    for r in results:
        r["efficiency"] = round(r["mpix_s"] / (base * r["devices"]), 3)
    rec = {
        "metric": f"row-sharded pipeline scaling ({vi.shape[0]} tris, {h}x{w})",
        "value": results[-1]["mpix_s"],
        "unit": "Mpix/s",
        "vs_baseline": round(results[-1]["mpix_s"] / BASELINE_MPIX_S, 3),
        "scaling": results,
    }
    print(json.dumps(rec))
    return {"config": "scaling", **rec}


def main():
    import sys

    _init_backend()
    if "--profile" in sys.argv[1:]:
        # One profiled pass of a chosen config (default textured):
        # bench.py --profile [textured|attr_fit|inverse8|avatar4k] [dir]
        import jax

        args = [a for a in sys.argv[1:] if a != "--profile"]
        cfg = args[0] if args else "textured"
        out_dir = args[1] if len(args) > 1 else f"/tmp/drtk_prof_{cfg}"
        fn = {"textured": bench_textured, "attr_fit": bench_attr_fit,
              "inverse8": bench_inverse8, "avatar4k": bench_avatar4k}[cfg]
        fn(n_iters=1)  # compile + warm outside the trace
        with jax.profiler.trace(out_dir):
            fn(n_iters=2)
        print(json.dumps({"note": "profile written", "dir": out_dir}))
        return
    if "--scaling" in sys.argv[1:]:
        bench_scaling()
        return
    fns = {"textured": bench_textured, "attr_fit": bench_attr_fit,
           "inverse8": bench_inverse8, "avatar4k": bench_avatar4k}
    if "--one" in sys.argv[1:]:
        # bench.py --one <config>: run exactly one matrix config.
        pos = sys.argv.index("--one") + 1
        cfg = sys.argv[pos] if pos < len(sys.argv) else None
        if cfg not in fns:
            sys.exit(f"--one expects one of {sorted(fns)} (got {cfg!r})")
        fns[cfg]()
        return
    if "--all" in sys.argv[1:]:
        # One failed config (OOM, tunnel drop) must not erase the others'
        # evidence: record the error and keep going.
        records = []
        for name, fn in fns.items():
            try:
                records.append(fn())
            except Exception as e:  # noqa: BLE001
                records.append({"config": name, "error": repr(e)[:300]})
                print(json.dumps(records[-1]), flush=True)
        with open("BENCH_MATRIX.json", "w") as f:
            json.dump(records, f, indent=1)
    else:
        # Driver contract: exactly ONE JSON line (the primary config).
        bench_textured()


if __name__ == "__main__":
    main()
