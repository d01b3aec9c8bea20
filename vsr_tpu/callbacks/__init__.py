from vsr_tpu.callbacks.monitor import Monitor  # noqa: F401
from vsr_tpu.callbacks import logger as logger  # noqa: F401
