"""Model zoo. Importing this package registers every net.

Registry split mirrors the reference (``src/model/nets/__init__.py``):
SISR = {Bicubic, EDSRNet, SRFBNet, DRFSISRNet};
MISR = {DUFNet, EDVRNet, RBPNet, TOFlowNet};
VSR  = {DRFNet, FRVSRNet}.
"""

from vsr_tpu.models.bicubic import Bicubic  # noqa: F401
from vsr_tpu.models.edsr import EDSRNet  # noqa: F401
from vsr_tpu.models.srfbn import SRFBNet  # noqa: F401
from vsr_tpu.models.drf import DRFNet, DRFSISRNet  # noqa: F401
from vsr_tpu.models.frvsr import FRVSRNet  # noqa: F401
from vsr_tpu.models.toflow import TOFlowNet  # noqa: F401
from vsr_tpu.models.duf import DUFNet  # noqa: F401
from vsr_tpu.models.rbpn import RBPNet  # noqa: F401
from vsr_tpu.models.edvr import EDVRNet as EDVRNet  # noqa: F401
from vsr_tpu.models.vol3d import Volume3DSRNet  # noqa: F401
from vsr_tpu.models.vol4d import Volume4DSRNet  # noqa: F401
from vsr_tpu.models.moe import MoEEDSRNet  # noqa: F401
from vsr_tpu.models.common import count_params, describe_params  # noqa: F401
