"""Synthetic preprocessed-data trees for tests (mimics the pipeline layout)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from vsr_tpu.io.nifti import save_nifti


def make_processed_tree(
    root: Path,
    types=("train", "valid"),
    patients_per_type: int = 2,
    slices: int = 2,
    frames: int = 6,
    hr_size: int = 24,
    factors=(2,),
    seed: int = 0,
) -> Path:
    """Create imgs/ and videos/ trees with consistent HR/LR contents."""
    rng = np.random.default_rng(seed)
    for type_ in types:
        for p in range(patients_per_type):
            patient = f"patient{p + 1:03d}"
            for s in range(1, slices + 1):
                hr_video = np.round(
                    rng.random((hr_size, hr_size, 1, frames)) * 255
                ).astype(np.float32)
                save_nifti(
                    hr_video,
                    root / "videos" / type_ / "HR" / patient / f"{patient}_2d+1d_sequence{s:0>2d}.nii.gz",
                )
                for t in range(frames):
                    save_nifti(
                        hr_video[..., t],
                        root / "imgs" / type_ / "HR" / patient / f"{patient}_2d_slice{s:0>2d}_frame{t + 1:0>2d}.nii.gz",
                    )
                for f in factors:
                    lr_size = hr_size // f
                    # Cheap consistent LR: strided subsample (content does not
                    # matter for plumbing tests).
                    lr_video = hr_video[::f, ::f].copy()
                    assert lr_video.shape[0] == lr_size
                    save_nifti(
                        lr_video,
                        root / "videos" / type_ / "LR" / f"X{f}" / patient / f"{patient}_2d+1d_sequence{s:0>2d}.nii.gz",
                    )
                    for t in range(frames):
                        save_nifti(
                            lr_video[..., t],
                            root / "imgs" / type_ / "LR" / f"X{f}" / patient / f"{patient}_2d_slice{s:0>2d}_frame{t + 1:0>2d}.nii.gz",
                        )
    return root
