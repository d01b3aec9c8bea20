from vsr_tpu.ops.pixel_shuffle import pixel_shuffle, space_to_depth  # noqa: F401
from vsr_tpu.ops.upsample import upsample_bicubic, upsample_bilinear  # noqa: F401
from vsr_tpu.ops.warp import flow_warp  # noqa: F401
