"""Hello Triangle — the minimal drtk_tpu pipeline.

Mirrors the reference's DRTK_Tutorial_1_hello_triangle: rasterize one
triangle, render barycentrics, visualize them as RGB.
"""

import jax.numpy as jnp
import numpy as np

import drtk_tpu as dt
from common import save_ppm

h = w = 512

# One triangle in pixel space: v = [x_pix, y_pix, z_camera].
v = jnp.asarray(
    np.array([[[50, 450, 10], [256, 60, 10], [460, 450, 10]]], np.float32)
)
vi = jnp.asarray(np.array([[0, 1, 2]], np.int32))

index_img = dt.rasterize(v, vi, h, w)            # [1, H, W], -1 background
depth_img, bary_img = dt.render(v, vi, index_img)

print("covered pixels:", int((index_img != -1).sum()))
print("depth range:", float(depth_img.max()))

# Barycentrics as RGB (zeros at background).
save_ppm("hello_triangle.ppm", np.asarray(bary_img[0]))
