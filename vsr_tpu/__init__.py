"""vsr_tpu — a TPU-native (JAX/XLA/Pallas) framework for cardiac cine-MRI
video super-resolution.

A ground-up rebuild of the capabilities of the PyTorch reference
``yangsenwxy/VSR`` (see ``SURVEY.md``): SISR / MISR / VSR task regimes over the
ACDC and DSB15 datasets, a config-driven train/test harness, the offline
preprocessing chain (DICOM->NIfTI, k-space truncation LR simulation, cardiac
ROI cropping), a model zoo of 10 SR architectures, PSNR/SSIM metrics, and
checkpoint/monitor/logging callbacks — all designed TPU-first:

- channels-last (NHWC) layouts and ``lax.conv_general_dilated`` on the MXU,
- ``lax.scan`` for recurrent/feedback nets instead of Python frame loops,
- Pallas kernels for the irregular-memory hot ops (deformable convolution,
  dynamic per-pixel filters),
- ``jax.sharding.Mesh`` + ``shard_map`` data/spatial parallelism with XLA
  collectives over ICI,
- explicit, checkpointable PRNG trees instead of global RNG state.
"""

__version__ = "0.1.0"

from vsr_tpu.config import Config, load_config, save_config  # noqa: F401
from vsr_tpu.registry import register, build, get_class  # noqa: F401
