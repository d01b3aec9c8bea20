from vsr_tpu.utils.rng import RngTree, seed_to_int  # noqa: F401
from vsr_tpu.utils.normalize import denormalize, DATASET_STATS  # noqa: F401
