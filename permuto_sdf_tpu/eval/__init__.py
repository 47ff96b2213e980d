from permuto_sdf_tpu.eval.metrics import psnr, ssim
from permuto_sdf_tpu.eval.chamfer import chamfer_distance, point_mesh_chamfer
