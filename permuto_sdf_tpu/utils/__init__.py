from permuto_sdf_tpu.utils.losses import (
    sdf_loss,
    sdf_loss_sphere,
    sdf_loss_spheres,
    rgb_loss,
    eikonal_loss,
    map_range_val,
)
