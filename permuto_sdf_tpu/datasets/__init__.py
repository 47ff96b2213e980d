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
