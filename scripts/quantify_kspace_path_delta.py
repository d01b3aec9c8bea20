"""Quantify the eval-metric impact of the jax k-space path vs the exact one.

PARITY.md §2.2: the numpy path (float64 FFT) is the bit-comparable default
for offline preprocessing; the jax path (float32 separable MXU matmuls,
used by ``vsr_tpu.infer`` and ``bench.py``) matches ~98% of uint8 pixels
exactly and the rest within ±1 grey level. VERDICT round-2 ("What's weak"
#4) asked for the *downstream dB impact* of that difference to be
quantified, since the serving pipeline degrades with the jax path while
the reference protocol degrades with numpy.

Protocol: N synthetic cardiac-like HR frames (the validate_learning.py
generator), degraded x2 with BOTH paths, then evaluated the way the
reference's test protocol scores a model — metric(SR, HR) — using bicubic
SR (deterministic, so the only varying input is the LR). Reports:

- LR pixel agreement between the two paths (exact %, max |diff|),
- per-frame PSNR/SSIM of bicubic SR vs HR under each path, and the delta.

Run: ``python scripts/quantify_kspace_path_delta.py`` (any backend; the
matmul path is numerically identical across TPU/CPU up to f32 rounding —
the HIGHEST-precision complex64 einsum is not reassociated).
"""

from __future__ import annotations

import sys

import jax
import numpy as np

# Force CPU: the probe is numerical, not a timing run, and the axon plugin
# pre-imports jax so JAX_PLATFORMS in os.environ is too late (CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from vsr_tpu.metrics import PSNR, SSIM
from vsr_tpu.preprocess.kspace import kspace_downscale, kspace_downscale_jax
from vsr_tpu.preprocess.resize import resize_bicubic

sys.path.insert(0, "scripts")
from validate_learning import synth_images  # noqa: E402

N, SIZE, FACTOR = 64, 192, 2


def bicubic_sr(lr: np.ndarray) -> np.ndarray:
    """Reference-protocol bicubic SR: resize up, round, clip to [0,255]."""
    out = np.stack([resize_bicubic(f, SIZE, SIZE) for f in lr])
    return np.clip(np.round(out), 0, 255)


def main() -> None:
    hr = synth_images(N, SIZE, seed=7).astype(np.float64)

    lr_np = np.stack([kspace_downscale(f, FACTOR) for f in hr])
    lr_jx = np.asarray(kspace_downscale_jax(hr.astype(np.float32), FACTOR))

    diff = lr_jx.astype(np.float64) - lr_np
    exact = float((diff == 0).mean())
    print(f"LR agreement ({N} frames {SIZE}^2 /{FACTOR}): "
          f"{100 * exact:.3f}% pixels exact, max |diff| = {np.abs(diff).max():.1f}")

    psnr, ssim = PSNR(), SSIM(channels=1)
    hr_b = hr[..., None].astype(np.float32)
    rows = {}
    for name, lr in [("numpy-exact", lr_np), ("jax-matmul", lr_jx)]:
        sr = bicubic_sr(lr)[..., None].astype(np.float32)
        p = float(psnr(sr, hr_b))
        s = float(ssim(sr, hr_b))
        rows[name] = (p, s)
        print(f"  {name:12s}: bicubic-SR PSNR {p:.4f} dB  SSIM {s:.6f}")
    dp = rows["jax-matmul"][0] - rows["numpy-exact"][0]
    ds = rows["jax-matmul"][1] - rows["numpy-exact"][1]
    print(f"  delta (jax - exact): {dp:+.4f} dB PSNR, {ds:+.6f} SSIM")


if __name__ == "__main__":
    main()
