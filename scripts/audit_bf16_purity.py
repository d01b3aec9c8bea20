"""bf16-purity audit: find f32 leaks in the zoo's bf16 compute paths.

The PReLU f32-alpha leak (every bf16 activation promoted to f32 — found
via the DRF serving trace, cost 2-11% per net) motivates a systematic
check: lower every net at a tiny shape with dtype=bfloat16 and count HLO
convolution/dot ops whose output is f32. Legitimate f32 is fine
(sampling coordinates, softmax accumulators, final casts); f32 CONVS/DOTS
mean a weight or activation leaked.

Run: env JAX_PLATFORMS=cpu python scripts/audit_bf16_purity.py
"""

from __future__ import annotations

import re
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vsr_tpu.models import (
        DRFNet, DRFSISRNet, DUFNet, EDSRNet, EDVRNet, FRVSRNet, RBPNet,
        SRFBNet, TOFlowNet,
    )

    bf16 = jnp.bfloat16
    cases = [
        ("EDSRNet", EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                            num_features=8, upscale_factor=2, dtype=bf16),
         (1, 12, 12, 1), {}),
        ("SRFBNet", SRFBNet(in_channels=1, out_channels=1, num_steps=2,
                            num_features=8, num_groups=2, upscale_factor=2,
                            dtype=bf16), (1, 12, 12, 1), {}),
        ("DRFSISRNet", DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                                  num_features=8, num_groups=2,
                                  upscale_factor=2, dtype=bf16),
         (1, 12, 12, 1), {}),
        ("DRFNet", DRFNet(in_channels=1, out_channels=1, num_features=8,
                          num_groups=2, upscale_factor=2, dtype=bf16),
         (1, 3, 12, 12, 1), {}),
        ("FRVSRNet", FRVSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                              upscale_factor=2, dtype=bf16),
         (1, 3, 12, 12, 1), {}),
        ("TOFlowNet", TOFlowNet(in_channels=1, out_channels=1, num_frames=3,
                                upscale_factor=2, dtype=bf16),
         (1, 3, 12, 12, 1), {"train": False}),
        ("DUFNet", DUFNet(in_channels=1, out_channels=1, num_frames=7,
                          size_filter=3, upscale_factor=2, dtype=bf16),
         (1, 7, 12, 12, 1), {"train": False}),
        ("RBPNet", RBPNet(in_channels=1, out_channels=1, base_filter=8,
                          feat=8, num_stages=2, num_resblocks=1, num_frames=3,
                          upscale_factor=2, dtype=bf16), (1, 3, 12, 12, 1), {}),
        ("EDVRNet", EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=5,
                            groups=2, front_RBs=1, back_RBs=1, dtype=bf16),
         (1, 5, 16, 16, 1), {}),
    ]

    # StableHLO: `... = stablehlo.convolution(...) ... -> tensor<...xf32>`
    # Policy: CONVOLUTIONS must be bf16-pure (a f32 conv means a leaked
    # weight/activation — the PReLU-alpha class of bug). f32 dot_generals
    # are expected: the bilinear/bicubic resize matmuls and warp/DCN
    # coordinate math intentionally run f32 HIGHEST (parity-critical
    # resampling, PARITY.md), and they are thin (<=8 channels).
    conv_f32_pat = re.compile(
        r"stablehlo\.convolution[^\n]*->\s*tensor<[^>]*xf32>")
    dot_f32_pat = re.compile(
        r"stablehlo\.dot_general[^\n]*->\s*tensor<[^>]*xf32>")
    bad = {}
    for name, net, shape, kw in cases:
        x = jnp.zeros(shape, jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, **kw)
        hlo = jax.jit(
            lambda v, a: net.apply(v, a, **kw)).lower(variables, x).as_text()
        n_conv_f32 = len(conv_f32_pat.findall(hlo))
        n_dot_f32 = len(dot_f32_pat.findall(hlo))
        n_all = len(re.findall(r"stablehlo\.(?:convolution|dot_general)", hlo))
        assert n_all > 0, f"{name}: no conv/dot ops found — parser broken?"
        # DUF: one known f32 conv — the dynamic filters (f32 softmax) apply
        # to the RAW unnormalized center frame, which is f32 by contract.
        excused = name == "DUFNet" and n_conv_f32 == 1
        status = "OK " if n_conv_f32 == 0 else ("OK*" if excused else "LEAK")
        print(f"{status} {name:12s} {n_conv_f32} f32 convs "
              f"({n_dot_f32} f32 resampling dots) of {n_all}")
        if n_conv_f32 and not excused:
            bad[name] = n_conv_f32
    if bad:
        print(f"\nf32 conv leaks: {bad}")
        sys.exit(1)
    print("\nAll nets bf16-pure in convolutions "
          "(f32 confined to resampling dots + DUF's filter softmax).")


if __name__ == "__main__":
    main()
