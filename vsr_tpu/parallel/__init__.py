from vsr_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
from vsr_tpu.parallel.data_parallel import (  # noqa: F401
    shard_batch_specs,
    make_dp_step,
)
