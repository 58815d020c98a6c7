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
import os
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


def _fetch_scalar(tree):
    """Force completion of everything `tree` depends on by fetching ONE
    scalar to host. jax.block_until_ready does NOT actually block over the
    axon tunnel (r4 finding: a chain of 80 4096^2 matmuls "completed" in
    49 us by the old harness); a device->host transfer is the only reliable
    synchronization point.

    Assumption (ADVICE r4): every timed step here is a single jit
    executable, so all of its output leaves complete together and fetching
    the FIRST leaf synchronizes the whole step. If a future step returns
    leaves from separate dispatches, fetch one scalar per dispatch."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def _time_step(step, args, n_iters, warmup=1, n_base=1):
    """Time a carry-style step: ``step(*args) -> tuple(next_args)``.

    Chaining the output into the next iteration creates a real on-device
    data dependency, so queued executions can't be deduped or elided by the
    tunnel. Each measurement is synchronized by `_fetch_scalar` (NOT
    block_until_ready — see its docstring), and the constant tunnel
    round-trip + fetch cost is cancelled by differencing two runs of
    n_base and n_base + n_iters iterations."""

    def run(n, a):
        t0 = time.perf_counter()
        for _ in range(n):
            a = step(*a)
        _fetch_scalar(a)
        return time.perf_counter() - t0, a

    _, args = run(1, args)  # compile
    for _ in range(max(warmup - 1, 0)):
        _, args = run(1, args)
    # One repeat of each leg guards against a queue hiccup: min-per-leg is
    # the robust estimator (a hiccup only ever ADDS time to a leg). A
    # non-positive difference means jitter swamped the workload — that is
    # a measurement FAILURE, so retry with more repeats and finally raise
    # rather than clamping to a bogus tiny dt (ADVICE r4).
    for extra_reps in (0, 2):
        t_small = min(run(n_base, args)[0] for _ in range(2 + extra_reps))
        t_big = min(run(n_base + n_iters, args)[0] for _ in range(2 + extra_reps))
        dt = t_big - t_small
        if dt > 0:
            return dt / n_iters
        print(json.dumps({"note": "non-positive timing delta, retrying",
                          "t_small": t_small, "t_big": t_big}), flush=True)
    raise RuntimeError(
        f"timing failed: n_iters={n_iters} extra iterations took no "
        f"measurable time (t_small={t_small:.6f}s, t_big={t_big:.6f}s) — "
        "tunnel jitter exceeds the workload; raise n_iters"
    )


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

    @jax.jit
    def step(v):
        # Chain v through the gradient: a real data dependency the compiler
        # can't fold and the tunnel can't dedup (see _time_step). 1e-30*g
        # does NOT underflow in f32 (min normal ~1.2e-38); the carry stays
        # fixed because adding ~1e-30 to O(0.01..1000) coordinates is
        # absorbed below 0.5 ulp. This assumes |g| stays within ~1e6 of the
        # coordinate scale — true for this scene by construction.
        _, g = jax.value_and_grad(loss_fn)(v)
        return (v + 1e-30 * g,)

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
        return optax.apply_updates(params, updates), opt_state

    # A real training loop chains (params, opt_state) naturally.
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

    @jax.jit
    def step(vt, tex):
        _, (g_vt, g_tex) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            vt, tex
        )
        return vt + 1e-30 * g_vt, tex + 1e-30 * g_tex

    dt_s = _time_step(step, (vt, tex), n_iters)
    return _emit(
        "attr_fit",
        h * w / dt_s / 1e6,
        f"attribute-fit fwd+bwd (interpolate default attr-grad path, "
        f"{vi.shape[0]} tris, {h}x{w}, grads to uvs + texture)",
    )


def bench_avatar4k(n_iters=3, h=4096, gn=226, bh=256, n_bands=4):
    """BASELINE config 5 (single-chip slice): 4K, ~101k tris, mipmap
    shading, msi background composite, Adam step.

    The step runs ROW-BANDED (drtk_tpu.parallel.banded): a full-frame 16
    Mpix fwd+bwd's residual set (mipmap taps + render geometry + edge_grad
    stencils) exceeds one chip's HBM even under jax.checkpoint (the r4
    compile OOM: 17.59 of 15.75 GB). Each of ``n_bands`` horizontal bands
    rasterizes/renders/interpolates/mipmap-shades as a bit-exact viewport
    under lax.scan + remat, so live memory is the full-frame IMAGES plus
    one band's interiors; edge_grad's CRD backward runs per band with a
    one-row halo. This is the TPU-native equivalent of the reference
    kernels' O(1)-memory-per-pixel property (grid-stride loops,
    recompute-not-store backwards, e.g. mipmap_grid_sampler_kernel.cu:
    411-631, msi_kernel.cu:296-408)."""
    import jax
    import jax.numpy as jnp
    import optax

    import drtk_tpu as dt
    from drtk_tpu.ops.mipmap_grid_sample import mipmap_grid_sample
    from drtk_tpu.ops.msi import msi
    from drtk_tpu.parallel.banded import (
        edge_grad_estimator_banded, map_row_bands,
    )

    w = h  # gn=226 -> 101,250 tris at the default scale
    hb = h // n_bands
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

        def band(y0):
            idx = dt.rasterize(v, vi, hb, w, y_offset=y0, full_height=h)
            _, bary = dt.render(v, vi, idx, y_offset=y0)
            vt_img = dt.interpolate(vt, vi, idx, bary, y_offset=y0,
                                    full_height=h)
            uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
            # Screen-space uv Jacobian by finite differences of the uv
            # image (no grad to vt_dxdy, like the reference). dy's last
            # in-band row is edge-padded — at the 4096-row scale the
            # n_bands-1 seam rows are noise in the LOD estimate.
            uv_sg = jax.lax.stop_gradient(uv)
            dx = jnp.pad(uv_sg[:, :, 1:] - uv_sg[:, :, :-1],
                         ((0, 0), (0, 0), (0, 1), (0, 0)))
            dy = jnp.pad(uv_sg[:, 1:] - uv_sg[:, :-1],
                         ((0, 0), (0, 1), (0, 0), (0, 0)))
            vt_dxdy = jnp.stack([dx, dy], axis=-2) * 0.5  # to 0..1 uv units
            rgb = mipmap_grid_sample(
                levels, uv, vt_dxdy, max_aniso=2, mode="bilinear",
                padding_mode="border", clip_grad=True,
            )
            maskf = (idx != -1)[:, None].astype(jnp.float32)
            return rgb * maskf, maskf, bary, idx

        fg, maskf, bary, idx = map_row_bands(band, h, n_bands)
        fg = edge_grad_estimator_banded(
            v_pix=v, vi=vi, bary_img=bary, img=fg, index_img=idx,
            n_bands=n_bands,
        )
        bg = msi(ray_o, ray_d, msi_tex, sub_step_count=2)
        bg_img = jnp.moveaxis(bg[:, :3].reshape(1, bh, bw, 3), -1, 1)
        bg_img = jax.image.resize(bg_img, (1, 3, h, w), "bilinear")
        img = fg + bg_img * (1.0 - maskf)
        return jnp.mean(img**2)

    params = (v, levels, msi_tex)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    dt_s = _time_step(train_step, (params, opt_state), n_iters)
    return _emit(
        "avatar4k",
        h * w / dt_s / 1e6,
        f"4K avatar-fit Adam step (mipmap shading + msi background, "
        f"{vi.shape[0]} tris, {h}x{w}, grads to verts + pyramid + msi)",
    )


def _parity_scenes():
    """Fuzz scenes mirroring tests/test_rasterize_pallas.py's coverage
    classes — here executed with the REAL Mosaic compiler on the TPU
    (the suite runs them under interpret mode on CPU only)."""
    import jax
    import jax.numpy as jnp

    from tests.utils import random_mesh, two_triangles_scene

    rng = np.random.RandomState(3)
    scenes = []
    v, vi, _ = two_triangles_scene(h=128, w=256)
    scenes.append(("two_triangles", v, vi, 128, 256))
    for seed in range(4):
        v, vi = random_mesh(
            jax.random.PRNGKey(100 + seed), n=1, num_v=40 + 7 * seed,
            num_f=50 + 11 * seed, h=64, w=128, zmin=2.0 + 0.5 * seed,
        )
        scenes.append((f"fuzz{seed}", v, vi, 64, 128))
    v, vi = random_mesh(jax.random.PRNGKey(1), n=3, num_v=64, num_f=96,
                        h=64, w=128)
    scenes.append(("batched", v, vi, 64, 128))
    v, vi = random_mesh(jax.random.PRNGKey(2), n=1, num_v=48, num_f=64,
                        h=70, w=130)
    scenes.append(("nonaligned", v, vi, 70, 130))
    # supertile tier: triangles covering most of a 256^2 canvas
    xy = rng.uniform(-0.5, 1.5, (1, 30, 2)).astype(np.float32) * [256, 256]
    z = rng.uniform(2.0, 8.0, (1, 30, 1)).astype(np.float32)
    scenes.append((
        "supertile", jnp.asarray(np.concatenate([xy, z], -1)),
        jnp.asarray(rng.randint(0, 30, (40, 3)).astype(np.int32)), 256, 256,
    ))
    # true global list: tall canvas, full-canvas triangles
    xy = rng.uniform(-0.3, 1.3, (1, 24, 2)).astype(np.float32) * [128, 2048]
    z = rng.uniform(2.0, 8.0, (1, 24, 1)).astype(np.float32)
    scenes.append((
        "tall_global", jnp.asarray(np.concatenate([xy, z], -1)),
        jnp.asarray(rng.randint(0, 24, (16, 3)).astype(np.int32)), 2048, 128,
    ))
    # bin overflow: hundreds of tiny triangles in one tile
    centers = rng.uniform([10, 10], [60, 24], (600, 2)).astype(np.float32)
    offs = rng.uniform(-2, 2, (600, 3, 2)).astype(np.float32)
    pts = (centers[:, None] + offs).reshape(-1, 2)
    zz = rng.uniform(2, 9, (pts.shape[0], 1)).astype(np.float32)
    scenes.append((
        "overflow", jnp.asarray(np.concatenate([pts, zz], -1)[None]),
        jnp.asarray(np.arange(1800, dtype=np.int32).reshape(600, 3)), 64, 128,
    ))
    # degenerate padding + near-plane culls
    v, vi = random_mesh(jax.random.PRNGKey(5), n=1, num_v=32, num_f=48,
                        h=64, w=128)
    vi = np.array(vi)
    vi[:8] = 0
    v = np.array(v)
    v[0, 1:5, 2] = -1.0
    scenes.append(("degenerate", jnp.asarray(v), jnp.asarray(vi), 64, 128))
    return scenes


def _parity_compare(name, d_ref, i_ref, d_pal, i_pal):
    """Apply the Pallas/XLA parity contract (CLAUDE.md invariants): index
    winners may flip only at (near-)equal-depth interpenetrations, depth
    agrees to 1e-4 relative."""
    i_ref = np.asarray(i_ref)
    i_pal = np.asarray(i_pal)
    d_ref = np.asarray(d_ref)
    d_pal = np.asarray(d_pal)
    mism = i_ref != i_pal
    near_tie = np.abs(d_ref - d_pal) <= 1e-4 * np.abs(d_ref) + 1e-6
    denom = np.maximum(np.abs(d_ref), 1e-6)
    rec = {
        "scene": name,
        "pixels": int(i_ref.size),
        "covered": int((i_ref != -1).sum()),
        "index_mismatches": int(mism.sum()),
        "mismatches_all_at_depth_ties": bool(near_tie[mism].all())
        if mism.any() else True,
        "max_depth_rel_diff": float((np.abs(d_ref - d_pal) / denom).max()),
    }
    rec["ok"] = (
        rec["mismatches_all_at_depth_ties"]
        and rec["index_mismatches"] <= 1e-3 * rec["pixels"]
        and rec["max_depth_rel_diff"] <= 1e-4 + 1e-6
    )
    print(json.dumps(rec), flush=True)
    return rec


def _grad_case_textured(idx_fixed=None):
    """Full textured pipeline (render+interpolate+grid_sample+edge_grad)
    value_and_grad on a grid mesh — the cross-compiler gradient probe.
    Deterministic scene so the TPU process and the CPU subprocess rebuild
    identical inputs.

    ``idx_fixed``: precomputed index image to use instead of rasterizing.
    The TPU half rasterizes and exports its index image; the CPU half
    consumes it. Rationale: at exact depth ties (the grid mesh's shared
    quad diagonals) FMA contraction legitimately flips the winning face
    between compilers (the documented rasterizer parity contract), and a
    handful of flipped pixels re-attribute edge_grad/render gradient mass
    between adjacent faces — a discrete, contract-permitted difference,
    not a gradient bug. Fixing the index image compares the DIFFERENTIABLE
    math on identical discrete structure; rasterizer forward parity is
    covered separately by the scene matrix above (and idx itself carries
    no gradient: /root/reference/drtk/rasterize.py returns int32)."""
    import jax
    import jax.numpy as jnp

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample
    from tests.utils import grid_mesh

    h = w = 128
    v, vi = grid_mesh(h, w, gn=7, z0=5.0, z_amp=2.0, seed=5)
    rng = np.random.RandomState(7)
    # Jitter x/y: grid_mesh's regular spacing makes its quad diagonals
    # exactly 45 deg, so whole FAMILIES of pixels share one near-zero
    # edge-function value and edge_grad's discrete overlap/adjacent
    # classification (b >= 0 in _pix_in_tri) flips for the entire family
    # under cross-compiler FMA-contraction noise (measured 2e-2 on grad_v;
    # every continuous stage agrees to ~1e-6). Jitter puts classification
    # boundaries in general position — the probe then compares continuous
    # gradient math, which is what it is for.
    v = v + jnp.asarray(rng.uniform(-0.4, 0.4, v.shape).astype(np.float32))
    vt = jnp.asarray(rng.rand(1, v.shape[1], 2).astype(np.float32))
    tex = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    weight = jnp.asarray(rng.randn(1, 3, h, w).astype(np.float32))

    idx = (
        jnp.asarray(idx_fixed)
        if idx_fixed is not None
        else jax.jit(lambda v: dt.rasterize(v, vi, h, w))(v)
    )

    def loss(v, vt, tex):
        _, bary = dt.render(v, vi, idx)
        vt_img = dt.interpolate(vt, vi, idx, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, mode="bilinear", padding_mode="border")
        img = img * (idx != -1)[:, None]
        img = dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary, img=img, index_img=idx
        )
        return jnp.sum(img * weight)

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
        v, vt, tex
    )
    return {
        "loss": np.asarray(val),
        "idx": np.asarray(idx),
        "grad_v": np.asarray(grads[0]),
        "grad_vt": np.asarray(grads[1]),
        "grad_tex": np.asarray(grads[2]),
    }


def _grad_cases_aux():
    """On-chip vs-CPU value+gradient probes for the ops the rasterizer
    scene matrix and the textured pipeline probe do NOT cover (VERDICT r4
    #2): mipmap_grid_sample (exercising window_accum's Pallas kernel via
    the pyramid gradient, plus its scattered-taps runtime fallback), msi,
    grid_scatter (windowed fast path AND the linear-transpose exact path),
    and filter2d. Round 4 found two Mosaic-only compile bugs in paths
    interpret mode had accepted — these ops otherwise have zero executions
    under the real Mosaic/XLA-TPU pipeline.

    Inputs are deterministic (seeded) and in general position: smooth
    fields + jitter keep the discrete selections (mip level, scatter cell,
    msi early-out) away from their thresholds, so the cross-compiler
    comparison sees only continuous math. Returns a flat dict of
    name -> np.ndarray; the CPU subprocess rebuilds the identical dict.
    Reference analogue: the CPU kernels double as CUDA cross-checks
    (src/rasterize/rasterize_kernel_cpu.cpp:73-192)."""
    import jax
    import jax.numpy as jnp

    from drtk_tpu.ops.filter2d import (
        FilterOptions, FilterType, downsample, low_pass_filter, upsample,
    )
    from drtk_tpu.ops.grid_scatter import _scatter_adjoint, grid_scatter
    from drtk_tpu.ops.mipmap_grid_sample import mipmap_grid_sample
    from drtk_tpu.ops.msi import msi

    out = {}
    rng = np.random.RandomState(11)

    # --- mipmap_grid_sample: grads to every pyramid level (window_accum)
    # and to the grid. The dxdy field sweeps the LOD smoothly across ~0..3
    # so every level and the aniso tap loop are exercised.
    levels = [
        jnp.asarray(rng.rand(1, 3, 64 >> i, 64 >> i).astype(np.float32))
        for i in range(4)
    ]
    gh, gw = 48, 64
    yy, xx = np.meshgrid(
        np.linspace(-0.95, 0.95, gh), np.linspace(-0.95, 0.95, gw),
        indexing="ij",
    )
    grid = np.stack(
        [xx + 0.03 * np.sin(5 * yy), yy + 0.03 * np.cos(4 * xx)], -1
    )[None].astype(np.float32)
    grid = jnp.asarray(grid)
    scale = ((0.5 + 3.5 * (xx + 0.95) / 1.9) / 64.0).astype(np.float32)
    dxdy = np.stack(
        [
            np.stack([scale, 0.1 * scale], -1),
            np.stack([0.1 * scale, 1.3 * scale], -1),
        ],
        -2,
    )[None].astype(np.float32)  # [1, gh, gw, 2, 2]
    vt_dxdy = jnp.asarray(dxdy)
    w_mip = jnp.asarray(rng.randn(1, 3, gh, gw).astype(np.float32))

    for name, kw in [
        ("mipmap_bilinear",
         dict(mode="bilinear", max_aniso=4, clip_grad=True)),
        ("mipmap_bicubic_fma",
         dict(mode="bicubic", max_aniso=2, force_max_aniso=True)),
    ]:
        def loss(levels, grid, kw=kw):
            o = mipmap_grid_sample(
                levels, grid, vt_dxdy, padding_mode="border", **kw
            )
            return jnp.sum(o * w_mip), o

        (_, o), grads = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)
        )(levels, grid)
        out[f"{name}.out"] = np.asarray(o)
        for i, g in enumerate(grads[0]):
            out[f"{name}.grad_level{i}"] = np.asarray(g)
        out[f"{name}.grad_grid"] = np.asarray(grads[1])

    # --- msi: texture gradient (the only one the op defines,
    # msi_module.cpp:108-122) through the prefix-scan march.
    rh, rw = 24, 32
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, rh), np.linspace(-1, 1, rw), indexing="ij"
    )
    rd = np.stack([xx, yy, np.ones_like(xx)], -1).reshape(-1, 3)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ray_d = jnp.asarray(rd.astype(np.float32))
    ray_o = jnp.asarray(
        (0.05 * rng.randn(rh * rw, 3)).astype(np.float32)
    )
    msi_tex = jnp.asarray(rng.rand(6, 4, 32, 64).astype(np.float32))
    w_msi = jnp.asarray(rng.randn(rh * rw, 4).astype(np.float32))

    def msi_loss(tex):
        o = msi(ray_o, ray_d, tex, sub_step_count=3)
        return jnp.sum(o * w_msi), o

    (_, o), g_tex = jax.jit(
        jax.value_and_grad(msi_loss, has_aux=True)
    )(msi_tex)
    out["msi.out"] = np.asarray(o)
    out["msi.grad_texture"] = np.asarray(g_tex)

    # --- grid_scatter: coherent warp (windowed window_accum fast path),
    # uniformly random targets (per-batch scatter fallback at runtime),
    # and the linear-transpose exact path, with grads to input and grid.
    sh, sw, oh, ow = 40, 56, 48, 64
    inp = jnp.asarray(rng.rand(1, 3, sh, sw).astype(np.float32))
    yy, xx = np.meshgrid(
        np.linspace(-0.9, 0.9, sh), np.linspace(-0.9, 0.9, sw),
        indexing="ij",
    )
    grid_c = jnp.asarray(
        np.stack([xx + 0.05 * np.sin(3 * yy), yy + 0.05 * np.cos(2 * xx)],
                 -1)[None].astype(np.float32)
    )
    grid_r = jnp.asarray(
        rng.uniform(-0.98, 0.98, (1, sh, sw, 2)).astype(np.float32)
    )
    w_sc = jnp.asarray(rng.randn(1, 3, oh, ow).astype(np.float32))

    for name, g_in, kw in [
        ("gscat_win_bilinear", grid_c,
         dict(mode="bilinear", padding_mode="border")),
        ("gscat_win_bicubic", grid_c,
         dict(mode="bicubic", padding_mode="zeros")),
        ("gscat_fallback", grid_r,
         dict(mode="bilinear", padding_mode="zeros")),
    ]:
        def sc_loss(inp, g, kw=kw):
            o = grid_scatter(inp, g, oh, ow, **kw)
            return jnp.sum(o * w_sc), o

        (_, o), grads = jax.jit(
            jax.value_and_grad(sc_loss, argnums=(0, 1), has_aux=True)
        )(inp, g_in)
        out[f"{name}.out"] = np.asarray(o)
        out[f"{name}.grad_input"] = np.asarray(grads[0])
        out[f"{name}.grad_grid"] = np.asarray(grads[1])

    out["gscat_exact.out"] = np.asarray(
        jax.jit(
            lambda i, g: _scatter_adjoint(
                i, g, oh, ow, "bilinear", "border", False
            )
        )(inp, grid_c)
    )

    # --- filter2d: Kaiser down/up and Lanczos low-pass, grads to x.
    x_f = jnp.asarray(rng.rand(1, 3, 48, 64).astype(np.float32))
    fo_k = FilterOptions(n_taps=6, filter_type=FilterType.Kaiser,
                         alias_guard_band=0.5)
    fo_l = FilterOptions(n_taps=4, filter_type=FilterType.Lanczos)
    for name, fn in [
        ("filt_down_kaiser", lambda x: downsample(x, fo_k, 2)),
        ("filt_up_kaiser", lambda x: upsample(x, fo_k, 2)),
        ("filt_lowpass_lanczos",
         lambda x: low_pass_filter(x, fo_l, freq_div=2.0)),
    ]:
        w_f = jnp.asarray(
            rng.randn(*jax.eval_shape(fn, x_f).shape).astype(np.float32)
        )

        def f_loss(x, fn=fn, w_f=w_f):
            o = fn(x)
            return jnp.sum(o * w_f), o

        (_, o), g_x = jax.jit(
            jax.value_and_grad(f_loss, has_aux=True)
        )(x_f)
        out[f"{name}.out"] = np.asarray(o)
        out[f"{name}.grad_x"] = np.asarray(g_x)

    return out


def bench_parity(out_path="PARITY_TPU.json"):
    """On-TPU parity evidence (VERDICT r3 #4).

    The test suite validates every Pallas kernel under *interpret mode on
    CPU*; this mode reruns the rasterizer parity matrix with the real
    Mosaic compiler on the chip and cross-checks full-pipeline f32
    gradients TPU-vs-CPU (the CPU lowering is itself pinned to the float64
    oracles by tests/). Writes PARITY_TPU.json; exits nonzero on any
    contract violation. Reference analogue: the CPU kernels double as
    CUDA cross-checks (src/rasterize/rasterize_kernel_cpu.cpp:73-192)."""
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from drtk_tpu.ops.rasterize import _rasterize_lines_impl, _rasterize_xla
    from drtk_tpu.ops.rasterize_pallas import (
        rasterize_lines_pallas, rasterize_pallas,
    )

    platform = jax.devices()[0].platform
    records = {"platform": platform, "scenes": [], "wireframe": [],
               "grads": []}

    for name, v, vi, h, w in _parity_scenes():
        vi_b = (
            jnp.broadcast_to(vi[None], (v.shape[0],) + vi.shape)
            if vi.ndim == 2 else vi
        )
        d_ref, i_ref = jax.jit(
            lambda v, vi, h=h, w=w: _rasterize_xla(v, vi, h, w)
        )(v.astype(jnp.float32), vi_b)
        d_pal, i_pal = rasterize_pallas(v.astype(jnp.float32), vi_b, h, w)
        records["scenes"].append(
            _parity_compare(name, d_ref, i_ref, d_pal, i_pal)
        )

    # Wireframe (diamond-exit) kernel on two scene classes.
    from tests.utils import random_mesh, two_triangles_scene

    for name, (v, vi) in {
        "wf_two_triangles": two_triangles_scene(h=128, w=256)[:2],
        "wf_random": random_mesh(jax.random.PRNGKey(9), n=1, num_v=48,
                                 num_f=64, h=96, w=160),
    }.items():
        h, w = (128, 256) if name == "wf_two_triangles" else (96, 160)
        vi_wf = vi.at[:, 0].set(vi[:, 0] | (0x7 << 28))
        vi_b = jnp.broadcast_to(vi_wf[None], (v.shape[0],) + vi_wf.shape)
        d_ref, i_ref = jax.jit(
            lambda v, vi, h=h, w=w: _rasterize_lines_impl(v, vi, h, w)
        )(v.astype(jnp.float32), vi_b)
        d_pal, i_pal = rasterize_lines_pallas(
            v.astype(jnp.float32), vi_b, h, w
        )
        records["wireframe"].append(
            _parity_compare(name, d_ref, i_ref, d_pal, i_pal)
        )

    # Cross-compiler gradient probe: TPU f32 vs CPU f32 (subprocess — the
    # axon profile pins JAX_PLATFORMS=tpu-only in this process). The TPU
    # half rasterizes; its index image is shipped to the CPU half so both
    # differentiate over the same discrete structure (see
    # _grad_case_textured's docstring for why).
    tpu_g = _grad_case_textured()
    tpu_aux = _grad_cases_aux()
    np.savez("/tmp/drtk_parity_tpu_grads.npz", **tpu_g,
             **{f"aux::{k}": v for k, v in tpu_aux.items()})
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, __file__, "--parity-cpu-grads",
         "/tmp/drtk_parity_cpu_grads.npz",
         "/tmp/drtk_parity_tpu_grads.npz"],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    if out.returncode != 0:
        raise RuntimeError(f"CPU grad subprocess failed: {out.stderr[-800:]}")
    cpu_g = np.load("/tmp/drtk_parity_cpu_grads.npz")
    for k in ["grad_v", "grad_vt", "grad_tex"]:
        a, b = tpu_g[k], cpu_g[k]
        scale = max(np.abs(b).max(), 1e-6)
        rel = float(np.abs(a - b).max() / scale)
        rec = {"tensor": k, "max_rel_diff_tpu_vs_cpu": rel,
               "ok": rel <= 2e-3}
        records["grads"].append(rec)
        print(json.dumps(rec), flush=True)

    # Aux-op probes (mipmap/msi/grid_scatter/filter2d — VERDICT r4 #2).
    records["aux"] = []
    for k in sorted(tpu_aux):
        a, b = tpu_aux[k], cpu_g[f"aux::{k}"]
        scale = max(np.abs(b).max(), 1e-6)
        rel = float(np.abs(a - b).max() / scale)
        rec = {"tensor": k, "max_rel_diff_tpu_vs_cpu": rel,
               "ok": rel <= 2e-3}
        records["aux"].append(rec)
        print(json.dumps(rec), flush=True)
    # The exact (linear-transpose) path must agree with the windowed fast
    # path ON CHIP — same tap set, different accumulation order.
    a = tpu_aux["gscat_exact.out"]
    b = tpu_aux["gscat_win_bilinear.out"]
    rel = float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))
    rec = {"tensor": "gscat_exact_vs_windowed_onchip",
           "max_rel_diff": rel, "ok": rel <= 1e-5}
    records["aux"].append(rec)
    print(json.dumps(rec), flush=True)

    records["ok"] = all(
        r["ok"] for part in ["scenes", "wireframe", "grads", "aux"]
        for r in records[part]
    )
    with open(out_path, "w") as f:
        json.dump(records, f, indent=1)
    print(json.dumps({"note": "parity artifact written", "path": out_path,
                      "ok": records["ok"]}), flush=True)
    if not records["ok"]:
        raise SystemExit("on-TPU parity contract violated — see " + out_path)


def bench_fit(mode="full", steps=2000, out_path="FIT_TPU.json"):
    """The reference's canonical two-triangles fit, on chip
    (test/two_triangles.py:62-86 semantics): 512x512, 16x16 two-tone
    texture, vertices perturbed by seeded noise, 2000 Adam(1e-1) steps of
    image MSE through the full pipeline incl. edge_grad_estimator.

    ``mode``: 'full' (all axes; reference default), 'xy' (z grads masked,
    two_triangles.py:82-83), 'z' (xy grads masked, :84-85). Unlike the
    reference — which perturbs all axes regardless — noise is applied only
    to the optimized axes so "final vertex error" measures convergence of
    this mode rather than the frozen residual. Emits steps/s + final error
    and appends to FIT_TPU.json."""
    import jax
    import jax.numpy as jnp
    import optax

    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample
    from tests.utils import two_triangles_scene

    h = w = 512
    v_gt, vi, vt = two_triangles_scene(h, w)
    tex = np.ones((1, 3, 16, 16), np.float32)
    tex[:, :, :, 8:] = 0.5
    tex = jnp.asarray(tex)

    rng = np.random.RandomState(10)
    noise = rng.randn(*v_gt.shape).astype(np.float32) * 20.0
    axis_mask = {"full": [1, 1, 1], "xy": [1, 1, 0], "z": [0, 0, 1]}[mode]
    axis_mask = jnp.asarray(axis_mask, jnp.float32)
    v0 = v_gt + jnp.asarray(noise) * axis_mask

    def forward(v):
        idx = dt.rasterize(v, vi, h, w)
        _, bary = dt.render(v, vi, idx)
        vt_img = dt.interpolate(vt, vi, idx, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, mode="bilinear", padding_mode="border")
        img = img * (idx != -1)[:, None]
        return dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary, img=img, index_img=idx
        )

    img_gt = jax.jit(forward)(v_gt)
    opt = optax.adam(1e-1)

    def one_step(carry, _):
        v, opt_state = carry
        loss, g = jax.value_and_grad(
            lambda v: jnp.mean((forward(v) - img_gt) ** 2)
        )(v)
        g = g * axis_mask
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(v, updates), opt_state), loss

    chunk = 100

    @jax.jit
    def run_chunk(carry):
        return jax.lax.scan(one_step, carry, None, length=chunk)

    carry = (v0, opt.init(v0))
    carry, ls0 = run_chunk(carry)  # compile + first chunk
    _fetch_scalar(carry[0])  # sync (block_until_ready is a tunnel no-op)
    t0 = time.perf_counter()
    losses = [ls0]
    for _ in range(steps // chunk - 1):
        carry, ls = run_chunk(carry)
        losses.append(ls)
    _fetch_scalar(carry[0])
    dt_s = time.perf_counter() - t0
    v_fit = carry[0]

    err = np.abs(np.asarray(v_fit - v_gt))[0]
    err_opt = float((err * np.asarray(axis_mask)).max())
    loss_step0 = float(np.asarray(losses[0][0]))
    final_loss = float(np.asarray(losses[-1][-1]))
    # Per-chunk loss trace (last loss of each 100-step chunk, prefixed
    # with step 0): the reference's own success criterion is this trace
    # decreasing (test/two_triangles.py:62-86).
    trace = [loss_step0] + [float(np.asarray(l[-1])) for l in losses]

    # Final-image residual: xy converges in vertex space; z / full retain
    # residual vertex error in image-UNOBSERVABLE directions (z slides
    # freely off the penetration line — gauge freedom), so those modes
    # must converge in IMAGE space instead — measured as PSNR of the final
    # render vs the target (peak = 1, the texture scale).
    img_fit = np.asarray(jax.jit(forward)(v_fit))
    img_gt_np = np.asarray(img_gt)
    mse = float(np.mean((img_fit - img_gt_np) ** 2))
    bit_equal = bool((img_fit == img_gt_np).all())
    psnr_db = float("inf") if mse == 0.0 else -10.0 * np.log10(mse)

    # Gate (VERDICT r4 #5): the loss must actually DECREASE >=100x from
    # step 0 (a frozen optimizer on a low-loss scene fails), the initial
    # loss must be nonvacuous, and the mode's observable must converge
    # (xy: vertex error < 1 px; z/full: final-image PSNR >= 30 dB). An
    # exactly-zero final f32 MSE is only accepted when the images are
    # verifiably bit-equal (not a reduction bug).
    decreased = loss_step0 > 1e-6 and final_loss <= loss_step0 / 100.0
    observable_ok = (
        err_opt < 1.0 if mode == "xy" else psnr_db >= 30.0
    )
    zero_ok = mse > 0.0 or bit_equal
    converged = bool(decreased and observable_ok and zero_ok)
    rec = {
        "metric": f"fit_{mode}: two-triangles 2000-step Adam fit "
        f"(512x512, reference recipe, {mode} axes)",
        "value": round((steps - chunk) / dt_s, 2),
        "unit": "steps/s",
        "final_max_vertex_error_px": round(err_opt, 3),
        "loss_step0": loss_step0,
        "final_loss": final_loss,
        "loss_trace_per_chunk": [round(x, 8) for x in trace],
        "final_psnr_db": round(psnr_db, 2) if mse > 0.0 else "inf",
        "final_images_bit_equal": bit_equal,
        "converged": converged,
        "vs_baseline": round((steps - chunk) / dt_s / 30.0, 3),
    }
    print(json.dumps(rec), flush=True)
    try:
        with open(out_path) as f:
            all_recs = json.load(f)
    except (OSError, ValueError):
        all_recs = {}
    all_recs[mode] = rec
    with open(out_path, "w") as f:
        json.dump(all_recs, f, indent=1)
    if not converged:
        raise SystemExit(
            f"fit_{mode} failed its convergence gate (decreased={decreased},"
            f" observable_ok={observable_ok}, zero_ok={zero_ok}) — see "
            + out_path
        )
    return rec


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

        @jax.jit
        def step(v):
            _, g = jax.value_and_grad(
                lambda v: jnp.mean(fwd(v, vt, tex) ** 2)
            )(v)
            return (v + 1e-30 * g,)

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


def write_matrix(records, path="BENCH_MATRIX.json"):
    """Write the config matrix artifact. Error rows are recorded (so one
    OOM doesn't erase the other configs' evidence) but make the run FAIL:
    prints a one-line summary per failed config and raises SystemExit(1).
    Unit-tested in tests/test_docs.py."""
    with open(path, "w") as f:
        json.dump(records, f, indent=1)
    failed = [r["config"] for r in records if "error" in r]
    if failed:
        print(json.dumps({
            "note": "BENCH MATRIX INCOMPLETE — configs failed",
            "failed": failed, "path": path,
        }), flush=True)
        raise SystemExit(1)
    return records


def main():
    import sys

    if "--parity-cpu-grads" in sys.argv[1:]:
        # Internal: CPU half of the parity gradient probe. The axon site
        # hook overrides the JAX_PLATFORMS env var, so CPU must be forced
        # via config here (CLAUDE.md environment rules).
        import jax

        jax.config.update("jax_platforms", "cpu")
        assert jax.devices()[0].platform == "cpu", jax.devices()
        pos = sys.argv.index("--parity-cpu-grads")
        out, tpu_npz = sys.argv[pos + 1], sys.argv[pos + 2]
        idx_fixed = np.load(tpu_npz)["idx"]
        aux = _grad_cases_aux()
        np.savez(out, **_grad_case_textured(idx_fixed=idx_fixed),
                 **{f"aux::{k}": v for k, v in aux.items()})
        return

    _init_backend()
    if "--parity" in sys.argv[1:]:
        bench_parity()
        return
    if "--fit" in sys.argv[1:]:
        pos = sys.argv.index("--fit") + 1
        mode = (
            sys.argv[pos]
            if pos < len(sys.argv) and not sys.argv[pos].startswith("-")
            else "full"
        )
        if mode not in ("full", "xy", "z"):
            sys.exit(f"--fit expects full|xy|z (got {mode!r})")
        bench_fit(mode)
        return
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
        # evidence: record the error and keep going — but an error row must
        # FAIL LOUD at the end (nonzero exit + summary), so the matrix
        # never silently claims more than it measured (VERDICT r4 #6).
        records = []
        for name, fn in fns.items():
            try:
                records.append(fn())
            except Exception as e:  # noqa: BLE001
                records.append({"config": name, "error": repr(e)[:2000]})
                print(json.dumps(records[-1]), flush=True)
        write_matrix(records)
    else:
        # Driver contract: exactly ONE JSON line (the primary config).
        bench_textured()


if __name__ == "__main__":
    main()
