"""Shared offline-preprocessing pipeline for ACDC and DSB15.

Produces the exact on-disk tree the reference emits
(``/root/reference/src/acdc_preprocess.py:52-85`` /
``dsb15_preprocess.py:50-82``)::

    <out>/imgs/<type>/HR/<patient>/<patient>_2d_sliceSS_frameFF.nii.gz
    <out>/imgs/<type>/LR/X<f>/<patient>/...
    <out>/videos/<type>/HR/<patient>/<patient>_2d+1d_sequenceSS.nii.gz
    <out>/videos/<type>/LR/X<f>/<patient>/...

Two degradation backends:

- ``numpy``: float64, bit-comparable with the reference output.
- ``jax``: the fused XLA k-space downscale batched over every frame of a
  sequence in one device call — the throughput path. Differences vs numpy are
  confined to values exactly on a .5 rounding boundary.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from vsr_tpu.io.nifti import save_nifti
from vsr_tpu.preprocess.intensity import (
    RunningMoments,
    center_crop_multiple,
    clip_outliers_minmax,
)
from vsr_tpu.preprocess.kspace import kspace_downscale

DOWNSCALE_FACTORS = (2, 3, 4)


@dataclass
class PreprocessStats:
    moments: RunningMoments = field(default_factory=RunningMoments)

    @property
    def mean(self) -> float:
        return self.moments.mean

    @property
    def std(self) -> float:
        return self.moments.std


def _downscale_sequence_numpy(hr_video: np.ndarray, factor: int) -> np.ndarray:
    """(H, W, C, T) -> (H/f, W/f, C, T), reference-parity float64 path."""
    frames = [kspace_downscale(hr_video[..., t], factor) for t in range(hr_video.shape[-1])]
    return np.stack(frames, axis=-1)


def _downscale_sequence_jax(hr_video: np.ndarray, factor: int) -> np.ndarray:
    """Batched on-device path; one jit-compiled call per (shape, factor)."""
    import jax

    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    h, w, c, t = hr_video.shape
    frames = np.moveaxis(hr_video[:, :, 0, :], -1, 0)  # (T, H, W)
    fn = _jax_downscale_cache.get((h, w, factor))
    if fn is None:
        fn = jax.jit(lambda x: kspace_downscale_jax(x, factor))
        _jax_downscale_cache[(h, w, factor)] = fn
    lr = np.asarray(fn(frames.astype(np.float32)))  # (T, H/f, W/f)
    return np.moveaxis(lr, 0, -1)[:, :, None, :].astype(np.float32)


_jax_downscale_cache: dict = {}


def downscale_sequence(hr_video: np.ndarray, factor: int, backend: str = "numpy") -> np.ndarray:
    if backend == "numpy":
        return _downscale_sequence_numpy(hr_video, factor).astype(np.float32)
    if backend == "jax":
        return _downscale_sequence_jax(hr_video, factor)
    raise ValueError(f"Unknown backend {backend!r} (use 'numpy' or 'jax')")


def prepare_volume(data: np.ndarray) -> np.ndarray:
    """Outlier clip + min-max (int16 only) and /12 center crop, float32."""
    data = clip_outliers_minmax(data)
    h0, hn, w0, wn = center_crop_multiple(data.shape[:2])
    return data[h0:hn, w0:wn]


def write_sequence(
    output_dir: Path,
    type_: str,
    patient_name: str,
    seq_index: int,
    hr_video: np.ndarray,
    backend: str = "numpy",
    factors: tuple[int, ...] = DOWNSCALE_FACTORS,
) -> None:
    """Emit HR + all LR factors for one (H, W, 1, T) sequence."""
    seq_tag = f"{seq_index:0>2d}"
    hr_imgs_dir = output_dir / "imgs" / type_ / "HR" / patient_name
    hr_videos_dir = output_dir / "videos" / type_ / "HR" / patient_name
    save_nifti(hr_video, hr_videos_dir / f"{patient_name}_2d+1d_sequence{seq_tag}.nii.gz")
    for t in range(hr_video.shape[-1]):
        save_nifti(
            hr_video[..., t],
            hr_imgs_dir / f"{patient_name}_2d_slice{seq_tag}_frame{t + 1:0>2d}.nii.gz",
        )

    for factor in factors:
        lr_imgs_dir = output_dir / "imgs" / type_ / "LR" / f"X{factor}" / patient_name
        lr_videos_dir = output_dir / "videos" / type_ / "LR" / f"X{factor}" / patient_name
        lr_video = downscale_sequence(hr_video, factor, backend=backend)
        save_nifti(lr_video, lr_videos_dir / f"{patient_name}_2d+1d_sequence{seq_tag}.nii.gz")
        for t in range(lr_video.shape[-1]):
            save_nifti(
                lr_video[..., t],
                lr_imgs_dir / f"{patient_name}_2d_slice{seq_tag}_frame{t + 1:0>2d}.nii.gz",
            )


def process_acdc_volume(
    output_dir: Path,
    type_: str,
    patient_name: str,
    data: np.ndarray,
    stats: PreprocessStats,
    backend: str = "numpy",
) -> None:
    """One ACDC 4D volume (H, W, D, T): every depth slice becomes a sequence."""
    data = prepare_volume(data)
    stats.moments.update(data)
    for s in range(data.shape[2]):
        hr_video = data[:, :, s : s + 1, :]  # (H, W, 1, T)
        write_sequence(output_dir, type_, patient_name, s + 1, hr_video, backend=backend)


def process_dsb15_sequence(
    output_dir: Path,
    type_: str,
    patient_name: str,
    seq_index: int,
    data: np.ndarray,
    stats: PreprocessStats,
    backend: str = "numpy",
) -> bool:
    """One DSB15 sequence NIfTI (H, W, 1, T). Returns False when skipped
    (malformed series: wrong layout or <30 frames, dsb15_preprocess.py:28)."""
    if data.ndim != 4 or data.shape[2] != 1 or data.shape[-1] < 30:
        return False
    data = prepare_volume(data)
    stats.moments.update(data)
    write_sequence(output_dir, type_, patient_name, seq_index, data, backend=backend)
    return True


def log_stats(type_: str, stats: PreprocessStats) -> None:
    logging.info(
        f"The mean and the standard deviation of the {type_} data is "
        f"{stats.mean:.4f} and {stats.std:.4f}."
    )
