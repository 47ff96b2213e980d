from permuto_sdf_tpu.datasets.mesh_io import (
    Mesh,
    load_obj,
    save_obj,
    make_uv_sphere,
    make_torus,
    compute_vertex_normals,
    sample_points_on_mesh,
    normalize_mesh_to_unit_sphere,
)
from permuto_sdf_tpu.datasets.tensor_reel import (
    TensorReel,
    random_rays_from_reel,
    rays_from_reprojection_reel,
    rays_from_frame,
    crop_reel_to_sphere,
    quantize_reel,
)
