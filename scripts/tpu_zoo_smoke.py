"""Compile + run every net in the zoo on the real TPU (tiny shapes).

De-risks hardware-specific lowering issues per architecture and warms the
persistent compile cache. Run: python scripts/tpu_zoo_smoke.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.models import (
        Bicubic, DRFNet, DRFSISRNet, DUFNet, EDSRNet, EDVRNet, FRVSRNet,
        RBPNet, SRFBNet, TOFlowNet, Volume3DSRNet, Volume4DSRNet,
    )

    rng = np.random.default_rng(0)
    cases = [
        ("Bicubic", Bicubic(upscale_factor=2), (2, 24, 24, 1), {}),
        ("EDSRNet", EDSRNet(in_channels=1, out_channels=1, num_resblocks=4,
                            num_features=16, upscale_factor=2), (2, 24, 24, 1), {}),
        ("SRFBNet", SRFBNet(in_channels=1, out_channels=1, num_steps=2,
                            num_features=8, num_groups=2, upscale_factor=2),
         (1, 24, 24, 1), {}),
        ("DRFSISRNet", DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                                  num_features=8, num_groups=2, upscale_factor=2),
         (1, 24, 24, 1), {}),
        ("DRFNet", DRFNet(in_channels=1, out_channels=1, num_features=8,
                          num_groups=2, upscale_factor=2), (1, 4, 24, 24, 1), {}),
        ("FRVSRNet", FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                              num_resblocks=2), (1, 3, 24, 24, 1), {}),
        ("TOFlowNet", TOFlowNet(in_channels=1, out_channels=1, num_frames=3,
                                upscale_factor=2), (1, 3, 24, 24, 1),
         {"train": False}),
        ("DUFNet", DUFNet(in_channels=1, out_channels=1, num_frames=7,
                          size_filter=3, upscale_factor=2),
         (1, 7, 24, 24, 1), {"train": False}),
        ("RBPNet", RBPNet(in_channels=1, out_channels=1, base_filter=8, feat=8,
                          num_stages=3, num_resblocks=1, num_frames=3,
                          upscale_factor=2), (1, 3, 24, 24, 1), {}),
        ("EDVRNet", EDVRNet(in_channels=1, out_channels=1, nf=16, nframes=3,
                            groups=2, front_RBs=1, back_RBs=1),
         (1, 3, 24, 24, 1), {}),
        ("Volume3DSRNet", Volume3DSRNet(in_channels=1, out_channels=1,
                                        num_resblocks=2, num_features=8,
                                        upscale_factor=2), (1, 3, 24, 24, 1), {}),
        ("Volume4DSRNet", Volume4DSRNet(in_channels=1, out_channels=1,
                                        num_features=8, num_resblocks=1,
                                        upscale_factor=2), (1, 3, 2, 24, 24, 1), {}),
    ]

    failures = []
    for name, net, shape, kwargs in cases:
        x = jnp.asarray(rng.random(shape), jnp.float32)
        t0 = time.time()
        try:
            variables = net.init(jax.random.PRNGKey(0), x, **kwargs)
            fn = jax.jit(lambda v, a: net.apply(v, a, **kwargs))
            out = fn(variables, x)
            if isinstance(out, tuple):
                out = out[0]
            jax.block_until_ready(out)
            assert np.isfinite(np.asarray(out)).all(), "non-finite output"
            print(f"{name:16s} OK  out={tuple(out.shape)}  ({time.time() - t0:.1f}s)")
        except Exception as exc:
            failures.append((name, str(exc)[:200]))
            print(f"{name:16s} FAIL: {str(exc)[:200]}")
    if failures:
        raise SystemExit(f"{len(failures)} nets failed on TPU: {[f[0] for f in failures]}")
    print("ZOO TPU SMOKE: all nets OK")


if __name__ == "__main__":
    main()
