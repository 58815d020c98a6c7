"""Multi-chip scaling — shard the pipeline over a (data, pix) device mesh.

The reference is single-GPU; this is the drtk_tpu scaling layer
(SURVEY.md §5.8): batch/cameras shard over the 'data' axis, image rows over
'pix', vertices replicate. Run on CPU with a virtual mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python 05_multichip_sharding.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import drtk_tpu as dt
from drtk_tpu.ops.grid_sample import grid_sample
from drtk_tpu.parallel.sharding import constrain, make_mesh, pipeline_sharding

batch, h, w = 2, 128, 128
rng = np.random.RandomState(0)
xy = rng.uniform(0, 1, (batch, 64, 2)).astype(np.float32) * [w, h]
z = rng.uniform(3, 9, (batch, 64, 1)).astype(np.float32)
v = jnp.asarray(np.concatenate([xy, z], -1))
vi = jnp.asarray(rng.randint(0, 64, (96, 3)).astype(np.int32))
vt = jnp.asarray(rng.rand(batch, 64, 2).astype(np.float32))
tex = jnp.asarray(rng.rand(batch, 3, 64, 64).astype(np.float32))

mesh = make_mesh(batch=batch)
sh = pipeline_sharding(mesh)
print("mesh:", mesh)


def forward(v):
    index_img = constrain(dt.rasterize(v, vi, h, w), sh["index"])
    _, bary = dt.render(v, vi, index_img)
    bary = constrain(bary, sh["image"])
    uv = jnp.moveaxis(dt.interpolate(vt, vi, index_img, bary), 1, -1) * 2 - 1
    img = grid_sample(tex, uv, padding_mode="border")
    img = constrain(img * (index_img != -1)[:, None], sh["image"])
    return dt.edge_grad_estimator(
        v_pix=v, vi=vi, bary_img=bary, img=img, index_img=index_img
    )


img_gt = jax.jit(forward)(v + 1.5)
opt = optax.adam(1e-1)
state = opt.init(v)


@jax.jit
def step(v, state):
    loss, g = jax.value_and_grad(
        lambda v: jnp.mean((forward(v) - img_gt) ** 2)
    )(v)
    updates, state = opt.update(g, state)
    return optax.apply_updates(v, updates), state, loss


with mesh:
    v = jax.device_put(v, sh["verts"])
    for it in range(20):
        v, state, loss = step(v, state)
    print(f"20 sharded steps, loss {float(loss):.3e}")
    print("vertex sharding:", v.sharding)
