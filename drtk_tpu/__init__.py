"""drtk_tpu — TPU-native differentiable rasterization framework.

A from-scratch JAX/XLA/Pallas reimplementation of the full capability surface
of facebookresearch/DRTK (Differentiable Rendering Toolkit): the pipeline
``transform -> rasterize -> render -> interpolate -> (user shading) ->
edge_grad_estimator`` plus mipmapped texture sampling, grid scatter,
multi-sphere-image raymarching, and alias-free resampling filters — designed
for TPU (tile-local z-buffers instead of atomics, segment reductions instead
of warp shuffles, mesh sharding instead of grid-stride loops).
"""

from drtk_tpu import utils  # noqa
from drtk_tpu.ops.edge_grad import edge_grad_estimator, edge_grad_estimator_ref  # noqa
from drtk_tpu.ops.filter2d import (  # noqa
    FilterOptions,
    FilterType,
    downsample,
    filter,
    low_pass_filter,
    make_resampling_kernel,
    resample_filter,
    upsample,
)
from drtk_tpu.ops.interpolate import (  # noqa
    InterpolationMatrix,
    NormalMatrix,
    NormalStructure,
    interpolate,
    interpolate_ref,
    interpolation_matrix,
    interpolation_normal_matrix,
    interpolation_normal_matrix_values,
    interpolation_normal_structure,
)
from drtk_tpu.ops.grid_scatter import grid_scatter, grid_scatter_ref  # noqa
from drtk_tpu.ops.mipmap_grid_sample import (  # noqa
    mipmap_grid_sample,
    mipmap_grid_sample_ref,
)
from drtk_tpu.ops.msi import msi  # noqa
from drtk_tpu.ops.rasterize import rasterize, rasterize_with_depth  # noqa
from drtk_tpu.ops.render import render, render_ref  # noqa
from drtk_tpu.screen_space_uv_derivative import screen_space_uv_derivative  # noqa
from drtk_tpu.transform import transform, transform_with_v_cam  # noqa

__version__ = "0.1.0"
