"""bf16 serving smoke for the whole zoo.

Every net must compile and produce finite outputs with ``dtype=bfloat16``
(the serving configuration). Regression for the FRVSRNet scan-carry dtype
mismatch the zoo serving bench surfaced: the recurrent nets must keep their
``lax.scan`` carry types stable when convs emit bf16.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.models import (
    DRFNet, DRFSISRNet, DUFNet, EDSRNet, EDVRNet, FRVSRNet, RBPNet, SRFBNet,
    TOFlowNet, Volume3DSRNet, Volume4DSRNet,
)

CASES = [
    ("EDSRNet", lambda d: EDSRNet(in_channels=1, out_channels=1,
                                  num_resblocks=2, num_features=8,
                                  upscale_factor=2, dtype=d),
     (1, 12, 12, 1), {}),
    ("SRFBNet", lambda d: SRFBNet(in_channels=1, out_channels=1, num_steps=2,
                                  num_features=8, num_groups=2,
                                  upscale_factor=2, dtype=d),
     (1, 12, 12, 1), {}),
    ("DRFSISRNet", lambda d: DRFSISRNet(in_channels=1, out_channels=1,
                                        num_steps=2, num_features=8,
                                        num_groups=2, upscale_factor=2,
                                        dtype=d), (1, 12, 12, 1), {}),
    ("DRFNet", lambda d: DRFNet(in_channels=1, out_channels=1, num_features=8,
                                num_groups=2, upscale_factor=2, dtype=d),
     (1, 3, 12, 12, 1), {}),
    ("FRVSRNet", lambda d: FRVSRNet(in_channels=1, out_channels=1,
                                    upscale_factor=2, num_resblocks=2,
                                    dtype=d), (1, 3, 12, 12, 1), {}),
    ("TOFlowNet", lambda d: TOFlowNet(in_channels=1, out_channels=1,
                                      num_frames=3, upscale_factor=2,
                                      dtype=d), (1, 3, 16, 16, 1),
     {"train": False}),
    ("DUFNet", lambda d: DUFNet(in_channels=1, out_channels=1, num_frames=7,
                                size_filter=3, upscale_factor=2, dtype=d),
     (1, 7, 12, 12, 1), {"train": False}),
    ("RBPNet", lambda d: RBPNet(in_channels=1, out_channels=1, base_filter=8,
                                feat=8, num_stages=2, num_resblocks=1,
                                num_frames=3, upscale_factor=2, dtype=d),
     (1, 3, 12, 12, 1), {}),
    ("EDVRNet", lambda d: EDVRNet(in_channels=1, out_channels=1, nf=16,
                                  nframes=3, groups=2, front_RBs=1,
                                  back_RBs=1, dtype=d), (1, 3, 16, 16, 1), {}),
    ("Volume3DSRNet", lambda d: Volume3DSRNet(in_channels=1, out_channels=1,
                                              num_resblocks=1, num_features=8,
                                              upscale_factor=2, dtype=d),
     (1, 3, 12, 12, 1), {}),
    ("Volume4DSRNet", lambda d: Volume4DSRNet(in_channels=1, out_channels=1,
                                              num_features=8, num_resblocks=1,
                                              upscale_factor=2, dtype=d),
     (1, 3, 2, 12, 12, 1), {}),
]


@pytest.mark.parametrize("name,make,shape,kw",
                         CASES, ids=[c[0] for c in CASES])
def test_zoo_bf16_forward(name, make, shape, kw, rng):
    net = make(jnp.bfloat16)
    x = jnp.asarray(rng.random(shape), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, **kw)
    out = jax.jit(lambda v, a: net.apply(v, a, **kw))(variables, x)
    if isinstance(out, tuple):
        out = out[0]
    assert np.isfinite(np.asarray(out, np.float32)).all()
