from orc_tpu.ops.fields import FaceBC, device_bc, face_bc  # noqa: F401
from orc_tpu.ops.interpolation import (  # noqa: F401
    face_flux,
    face_pressure,
    face_velocity,
)
from orc_tpu.ops.gradients import (  # noqa: F401
    pressure_gradient,
    velocity_gradient,
)
from orc_tpu.ops.spmv import ell_spmv  # noqa: F401
