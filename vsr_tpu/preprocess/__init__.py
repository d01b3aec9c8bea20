from vsr_tpu.preprocess.resize import (  # noqa: F401
    bicubic_resize_matrix,
    resize_bicubic,
    resize_bicubic_jax,
)
from vsr_tpu.preprocess.kspace import (  # noqa: F401
    kspace_downscale,
    kspace_downscale_jax,
    kspace_truncation_mask,
)
