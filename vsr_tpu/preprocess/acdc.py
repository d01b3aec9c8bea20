"""ACDC offline preprocessing CLI.

Split + pipeline parity with ``/root/reference/src/acdc_preprocess.py``:
8:2 train/valid split of ``training/**/*4d.nii.gz`` with the Mersenne-Twister
shuffle seeded by the string ``'vsr'`` (stdlib ``random`` — identical split to
the reference), ``testing/**`` as test, then per-volume intensity prep and
k-space LR simulation at x2/x3/x4.

Usage: ``python -m vsr_tpu.preprocess.acdc <data_dir> <output_dir> [--backend jax]``
"""

from __future__ import annotations

import argparse
import logging
import random
from pathlib import Path

from vsr_tpu.io.nifti import load_nifti
from vsr_tpu.preprocess.pipeline import (
    PreprocessStats,
    log_stats,
    process_acdc_volume,
)


def split_paths(data_dir: Path) -> dict[str, list[Path]]:
    paths = sorted((data_dir / "training").glob("**/*4d.nii.gz"))
    random.seed("vsr")  # Same split as the reference (acdc_preprocess.py:15).
    shuffled = list(paths)
    random.shuffle(shuffled)
    train_paths = sorted(shuffled[: int(len(shuffled) * 0.8)])
    valid_paths = sorted(set(paths) - set(train_paths))
    test_paths = sorted((data_dir / "testing").glob("**/*4d.nii.gz"))
    return {"train": train_paths, "valid": valid_paths, "test": test_paths}


def run(data_dir: Path, output_dir: Path, backend: str = "numpy") -> None:
    for type_, paths in split_paths(data_dir).items():
        logging.info(f"Process the {type_} data.")
        stats = PreprocessStats()
        for path in paths:
            patient_name = path.parts[-2]
            logging.info(f"Process {patient_name}.")
            data = load_nifti(path)  # (H, W, D, T)
            process_acdc_volume(output_dir, type_, patient_name, data, stats, backend=backend)
        log_stats(type_, stats)


def main() -> None:
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    parser = argparse.ArgumentParser(description="ACDC data preprocessing.")
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--backend", choices=["numpy", "jax"], default="numpy")
    args = parser.parse_args()
    run(args.data_dir, args.output_dir, backend=args.backend)


if __name__ == "__main__":
    main()
