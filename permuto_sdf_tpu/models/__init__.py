from permuto_sdf_tpu.models.mlp import (
    init_linear,
    init_mlp,
    mlp_apply,
    init_lipshitz_mlp,
    lipshitz_mlp_apply,
    lipshitz_bound_full,
)
from permuto_sdf_tpu.models.fields import (
    SDFConfig,
    RGBConfig,
    NerfHashConfig,
    init_sdf,
    sdf_apply,
    sdf_with_gradient,
    sdf_curvature_from_gradient,
    init_rgb,
    rgb_apply,
    init_nerf_hash,
    nerf_hash_apply,
    nerf_hash_density,
    init_colorcal,
    colorcal_apply,
)
