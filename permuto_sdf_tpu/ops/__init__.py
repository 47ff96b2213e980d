from permuto_sdf_tpu.ops.permuto_encoding import (
    PermutoEncodingSpec,
    permuto_encode,
    init_encoding_params,
    coarse2fine_window,
)
from permuto_sdf_tpu.ops.spherical_harmonics import spherical_harmonics
