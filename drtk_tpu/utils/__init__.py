from drtk_tpu.utils.geometry import (  # noqa
    face_attribute_to_vert,
    face_dpdt,
    face_info,
    vert_binormals,
    vert_normals,
)
from drtk_tpu.utils.indexing import index  # noqa
from drtk_tpu.utils.projection import (  # noqa
    DISTORTION_MODES,
    estimate_fisheye62_fov,
    estimate_fisheye_fov,
    estimate_rt_fov,
    project_points,
    project_points_grad,
)
