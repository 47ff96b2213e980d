from permuto_sdf_tpu.parallel.mesh import make_ray_mesh, device_count
from permuto_sdf_tpu.parallel.data_parallel import make_dp_train_step, dp_keys
