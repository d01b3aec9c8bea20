"""DSB15 offline preprocessing CLI.

Parity with ``/root/reference/src/dsb15_preprocess.py``: walks already-split
``train/valid/test`` trees of converted NIfTI sequences, skips malformed
series, and emits the same HR/LR imgs+videos trees.

Usage: ``python -m vsr_tpu.preprocess.dsb15 <data_dir> <output_dir> [--backend jax]``
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from vsr_tpu.io.nifti import load_nifti
from vsr_tpu.preprocess.pipeline import (
    PreprocessStats,
    log_stats,
    process_dsb15_sequence,
)


def run(data_dir: Path, output_dir: Path, backend: str = "numpy") -> None:
    for type_ in ["train", "valid", "test"]:
        paths = sorted(d for d in (data_dir / type_).iterdir() if d.is_dir())
        logging.info(f"Process the {type_} data.")
        stats = PreprocessStats()
        for path in paths:
            patient_name = path.parts[-1]
            logging.info(f"Process {patient_name}.")
            sequence_paths = sorted(path.glob("*/*.nii.gz"))
            for j, sequence_path in enumerate(sequence_paths):
                data = load_nifti(sequence_path)  # (H, W, 1, T)
                process_dsb15_sequence(
                    output_dir, type_, patient_name, j + 1, data, stats, backend=backend
                )
        log_stats(type_, stats)


def main() -> None:
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    parser = argparse.ArgumentParser(description="DSB15 data preprocessing.")
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--backend", choices=["numpy", "jax"], default="numpy")
    args = parser.parse_args()
    run(args.data_dir, args.output_dir, backend=args.backend)


if __name__ == "__main__":
    main()
