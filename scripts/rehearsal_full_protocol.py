"""Full-protocol rehearsal at TPU scale (the reference workflow end to end).

Synthetic ACDC-style raw volumes -> offline preprocessing (exact numpy
k-space path) -> cardiac ROI cropping -> config-driven DEVICE training of
the flagship DRFNet (whole split HBM-resident, bucketed variable-T
validation, Monitor checkpointing) -> bucketed exported prediction with
Cardiac metrics -> fused --video serving. Everything through the public
CLI surfaces.

Run: python scripts/rehearsal_full_protocol.py [workdir]
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, ".")

TRANSFORMS = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]


def make_raw(root: Path, n_patients: int = 12, size: int = 96,
             depth: int = 2, t_frames: int = 10) -> None:
    from vsr_tpu.io.nifti import save_nifti

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:size, :size]
    for i in range(n_patients):
        split = "training" if i < n_patients - 2 else "testing"
        name = f"patient{i + 1:03d}"
        pdir = root / split / name
        pdir.mkdir(parents=True, exist_ok=True)
        # Vary T per patient so bucketing is exercised for real.
        t = t_frames + (i % 3) * 2
        vol = np.zeros((size, size, depth, t), np.int16)
        cy0, cx0 = rng.uniform(30, size - 30, 2)
        for ti in range(t):
            phase = 2 * np.pi * ti / t
            r = 14 + 4 * np.sin(phase)
            d = np.sqrt((yy - cy0) ** 2 + (xx - cx0) ** 2)
            img = 500 * np.exp(-((d - r) ** 2) / 18.0)
            img += 120 * np.exp(-((yy - cy0) ** 2 + (xx - cx0 - 18) ** 2) / 300.0)
            for di in range(depth):
                vol[..., di, ti] = (img + rng.integers(0, 60, (size, size))).astype(np.int16)
        save_nifti(vol, pdir / f"{name}_4d.nii.gz")


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s | %(message)s")
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vsr_rehearsal")
    raw, processed, cropped = work / "raw", work / "processed", work / "cropped"
    results = work / "results"
    timings = {}

    t0 = time.time()
    print("== 1. synthetic raw dataset (12 patients, variable T) ==", flush=True)
    make_raw(raw)

    print("== 2. offline preprocessing (exact numpy k-space path) ==", flush=True)
    from vsr_tpu.preprocess import acdc as acdc_pre

    acdc_pre.run(raw, processed, backend="numpy")
    timings["preprocess_s"] = round(time.time() - t0, 1)

    print("== 3. cardiac ROI cropping ==", flush=True)
    from vsr_tpu.preprocess import cropping

    cropped.mkdir(parents=True, exist_ok=True)
    cropping.run(processed / "videos" / "valid" / "HR", cropped)
    cropping.run(processed / "videos" / "test" / "HR", cropped)  # merges

    print("== 4. flagship DEVICE training via the CLI ==", flush=True)
    train_cfg = {
        "main": {"random_seed": "vsr", "saved_dir": str(results)},
        "dataset": {"name": "AcdcVSRDataset", "kwargs": {
            "data_dir": str(processed / "videos"), "downscale_factor": 2,
            "transforms": TRANSFORMS, "num_frames": 5}},
        "dataloader": {"name": "Dataloader", "kwargs": {
            "train_batch_size": 8, "valid_batch_size": 1, "shuffle": True,
            "num_workers": 0}},
        "net": {"name": "DRFNet", "kwargs": {
            "in_channels": 1, "out_channels": 1, "num_features": 32,
            "num_groups": 3, "upscale_factor": 2}},
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 2e-4, "weight_decay": 0}},
        "logger": {"name": "AcdcVSRLogger", "kwargs": {}},
        "monitor": {"name": "Monitor", "kwargs": {
            "mode": "min", "target": "Loss", "saved_freq": 10, "early_stop": 0}},
        "trainer": {"name": "AcdcVSRDeviceTrainer", "kwargs": {
            "num_epochs": 30, "patch": 24, "ratio": 2,
            "steps_per_epoch": 100, "t_bucket": 8}},
    }
    cfg_path = work / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(train_cfg))
    from vsr_tpu.config import load_config
    from vsr_tpu.main import run_test, run_train

    t1 = time.time()
    run_train(load_config(cfg_path))
    timings["train_3000_steps_s"] = round(time.time() - t1, 1)

    print("== 5. bucketed exported prediction with Cardiac metrics ==", flush=True)
    test_cfg = dict(train_cfg)
    test_cfg["main"] = {
        "saved_dir": str(results / "pred"),
        "loaded_path": str(results / "checkpoints" / "model_best.ckpt"),
    }
    test_cfg["dataloader"] = {"name": "Dataloader",
                              "kwargs": {"batch_size": 1, "shuffle": False}}
    test_cfg["metrics"] = [
        {"name": "PSNR"}, {"name": "SSIM"},
        {"name": "CardiacPSNR",
         "kwargs": {"coordinates_path": str(cropped / "coordinates.pkl")}},
    ]
    test_cfg["predictor"] = {"name": "AcdcVSRPredictor", "kwargs": {
        "saved_dir": str(results / "pred"), "exported": True, "t_bucket": 8}}
    for k in ("trainer", "optimizer", "logger", "monitor"):
        test_cfg.pop(k, None)
    test_path = work / "test.yaml"
    test_path.write_text(yaml.safe_dump(test_cfg))
    t2 = time.time()
    log = run_test(load_config(test_path))
    timings["predict_s"] = round(time.time() - t2, 1)

    print("== 6. fused --video serving over the raw TEST volumes ==", flush=True)
    import argparse

    from vsr_tpu.infer import run as infer_run

    t3 = time.time()
    stats = infer_run(argparse.Namespace(
        input_dir=raw / "testing", output_dir=work / "served",
        net="DRFNet",
        net_kwargs=json.dumps(train_cfg["net"]["kwargs"]),
        checkpoint=str(results / "checkpoints" / "model_best.ckpt"),
        factor=2, dataset="acdc", gif=False, bf16=True, int8=False,
        video=True, fused_tail=True))
    timings["serve_s"] = round(time.time() - t3, 1)

    csv = (results / "pred" / "results.csv").read_text().splitlines()
    n_gifs = len(list((results / "pred" / "videos").glob("**/*.gif")))
    assert log and log["PSNR"] > 30, log
    assert np.isfinite(log["CardiacPSNR"])
    assert len(csv) - 1 == 52 and n_gifs == 4
    print(f"REHEARSAL OK: test log {log}; {len(csv) - 1} per-frame CSV rows; "
          f"{n_gifs} GIFs; served {stats}; timings {timings}", flush=True)


if __name__ == "__main__":
    main()
