"""Executable quickstart: the full protocol on a synthetic miniature dataset.

Usage: python scripts/demo_synthetic.py [workdir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, ".")


def make_raw(root: Path, n_patients: int = 4) -> None:
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:48, :48]
    for i in range(n_patients):
        split = "training" if i < n_patients - 1 else "testing"
        name = f"patient{i + 1:03d}"
        pdir = root / split / name
        pdir.mkdir(parents=True, exist_ok=True)
        vol = np.zeros((48, 48, 2, 6), np.int16)
        for t in range(6):
            cy = 24 + int(4 * np.cos(2 * np.pi * t / 6))
            blob = 800 * np.exp(-((yy - cy) ** 2 + (xx - 24) ** 2) / 60.0)
            for d in range(2):
                vol[..., d, t] = (blob + rng.integers(0, 80, (48, 48))).astype(np.int16)
        from vsr_tpu.io.nifti import save_nifti

        save_nifti(vol, pdir / f"{name}_4d.nii.gz")


def main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO, format="%(levelname)s | %(message)s")
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vsr_demo")
    raw, processed, cropped = work / "raw", work / "processed", work / "cropped"
    results = work / "results"

    print("== 1. synthetic raw dataset ==")
    make_raw(raw)

    print("== 2. offline preprocessing ==")
    from vsr_tpu.preprocess import acdc as acdc_pre

    acdc_pre.run(raw, processed, backend="numpy")

    print("== 3. cardiac ROI cropping ==")
    from vsr_tpu.preprocess import cropping

    cropped.mkdir(parents=True, exist_ok=True)
    cropping.run(processed / "videos" / "valid" / "HR", cropped)

    print("== 4. train EDSR x2 via the CLI ==")
    train_cfg = {
        "main": {"random_seed": "vsr", "saved_dir": str(results)},
        "dataset": {
            "name": "AcdcSISRDataset",
            "kwargs": {
                "data_dir": str(processed / "imgs"),
                "downscale_factor": 2,
                "transforms": [
                    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                    {"name": "ToTensor"},
                ],
                "augments": [
                    {"name": "RandomHorizontalFlip"},
                    {"name": "RandomCropPatch", "kwargs": {"size": [12, 12], "ratio": 2}},
                ],
            },
        },
        "dataloader": {"name": "Dataloader",
                       "kwargs": {"train_batch_size": 4, "valid_batch_size": 1,
                                  "shuffle": True, "num_workers": 2}},
        "net": {"name": "EDSRNet",
                "kwargs": {"in_channels": 1, "out_channels": 1, "num_resblocks": 2,
                           "num_features": 8, "upscale_factor": 2}},
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3, "weight_decay": 0}},
        "logger": {"name": "AcdcSISRLogger", "kwargs": {}},
        "monitor": {"name": "Monitor",
                    "kwargs": {"mode": "min", "target": "Loss",
                               "saved_freq": 2, "early_stop": 0}},
        "trainer": {"name": "AcdcSISRTrainer", "kwargs": {"num_epochs": 2}},
    }
    cfg_path = work / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(train_cfg))
    from vsr_tpu.config import load_config
    from vsr_tpu.main import run_test, run_train

    run_train(load_config(cfg_path))

    print("== 5. predict with export + cardiac metrics ==")
    test_cfg = dict(train_cfg)
    test_cfg["main"] = {
        "saved_dir": str(results / "pred"),
        "loaded_path": str(results / "checkpoints" / "model_best.ckpt"),
    }
    test_cfg["dataset"] = {
        "name": "AcdcSISRDataset",
        "kwargs": {k: v for k, v in train_cfg["dataset"]["kwargs"].items()
                   if k != "augments"},
    }
    test_cfg["dataloader"] = {"name": "Dataloader",
                              "kwargs": {"batch_size": 1, "shuffle": False}}
    test_cfg["metrics"] = [
        {"name": "PSNR"},
        {"name": "CardiacPSNR",
         "kwargs": {"coordinates_path": str(cropped / "coordinates.pkl")}},
    ]
    test_cfg["predictor"] = {"name": "AcdcSISRPredictor",
                             "kwargs": {"saved_dir": str(results / "pred"),
                                        "exported": True}}
    for k in ("trainer", "optimizer", "logger", "monitor"):
        test_cfg.pop(k, None)
    cfg_path2 = work / "test.yaml"
    cfg_path2.write_text(yaml.safe_dump(test_cfg))
    # Cardiac coordinates were computed for valid patients; the test patient
    # needs an entry — reuse the first bbox for the demo.
    import pickle

    coords = pickle.load(open(cropped / "coordinates.pkl", "rb"))
    coords.setdefault("patient004", next(iter(coords.values())))
    pickle.dump(coords, open(cropped / "coordinates.pkl", "wb"))
    run_test(load_config(cfg_path2))

    print("== 6. fused serving over raw volumes ==")
    import argparse

    from vsr_tpu.infer import run as infer_run

    stats = infer_run(argparse.Namespace(
        input_dir=raw / "testing", output_dir=work / "served",
        net="EDSRNet",
        net_kwargs='{"in_channels":1,"out_channels":1,"num_resblocks":2,'
                   '"num_features":8,"upscale_factor":2}',
        checkpoint=str(results / "checkpoints" / "model_best.ckpt"),
        factor=2, dataset="acdc", gif=True, bf16=False,
    ))
    print("served:", stats)
    print(f"\nDemo artifacts under {work}: results/pred/results.csv, "
          f"results/pred/imgs|videos, served/*.nii.gz|gif")


if __name__ == "__main__":
    main()
