from vsr_tpu.data.transforms import compose, Compose  # noqa: F401
from vsr_tpu.data import transforms as transforms  # noqa: F401
from vsr_tpu.data import datasets as datasets  # noqa: F401
from vsr_tpu.data.loader import Dataloader  # noqa: F401
