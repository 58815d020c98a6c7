"""grid_sample: exact parity vs torch.nn.functional.grid_sample (CPU oracle),
including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from drtk_tpu.ops.grid_sample import grid_sample

MODES = ["bilinear", "nearest", "bicubic"]
PADS = ["zeros", "border", "reflection"]


def _case(key=0, n=2, c=3, h=7, w=9, hg=5, wg=6, extreme=False):
    rng = np.random.RandomState(key)
    img = rng.randn(n, c, h, w).astype(np.float32)
    lim = 2.5 if extreme else 1.1
    grid = rng.uniform(-lim, lim, size=(n, hg, wg, 2)).astype(np.float32)
    return img, grid


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("pad", PADS)
@pytest.mark.parametrize("align", [False, True])
def test_forward_parity_vs_torch(mode, pad, align):
    img, grid = _case()
    out_j = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode, pad, align)
    out_t = torch.nn.functional.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode=mode, padding_mode=pad, align_corners=align,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("pad", PADS)
def test_forward_parity_far_out_of_bounds(mode, pad):
    img, grid = _case(key=3, extreme=True)
    out_j = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode, pad, False)
    out_t = torch.nn.functional.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode=mode, padding_mode=pad, align_corners=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("pad", PADS)
def test_grad_parity_vs_torch(mode, pad):
    img, grid = _case(key=1, h=6, w=6, hg=4, wg=4)
    cot = np.random.RandomState(2).randn(2, 3, 4, 4).astype(np.float32)

    def loss_j(img_, grid_):
        return jnp.sum(grid_sample(img_, grid_, mode, pad, False) * cot)

    gi_j, gg_j = jax.grad(loss_j, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    ti = torch.from_numpy(img).requires_grad_(True)
    tg = torch.from_numpy(grid).requires_grad_(True)
    out = torch.nn.functional.grid_sample(
        ti, tg, mode=mode, padding_mode=pad, align_corners=False
    )
    (out * torch.from_numpy(cot)).sum().backward()
    np.testing.assert_allclose(np.asarray(gi_j), ti.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_j), tg.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_point_grid_shape():
    # [N, 1, V, 2] point sampling (used by fisheye62 LUT correction)
    img, _ = _case()
    pts = np.random.RandomState(4).uniform(-1, 1, (2, 1, 11, 2)).astype(np.float32)
    out = grid_sample(jnp.asarray(img), jnp.asarray(pts), "bilinear", "border", True)
    assert out.shape == (2, 3, 1, 11)
