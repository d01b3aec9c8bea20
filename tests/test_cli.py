"""End-to-end CLI test: config YAML -> run_train -> run_test, like
``python -m vsr_tpu.main cfg.yaml [--test]``."""

import numpy as np
import yaml

from tests.synth import make_processed_tree
from vsr_tpu.config import load_config
from vsr_tpu.main import run_test, run_train
from vsr_tpu.registry import names


def _write_yaml(path, data):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


def test_train_then_test_cli(tmp_path):
    root = make_processed_tree(
        tmp_path / "data", types=("train", "valid", "test"), patients_per_type=1,
        slices=1, frames=4, hr_size=16,
    )
    saved_dir = tmp_path / "results"
    train_cfg = {
        "main": {"random_seed": "vsr", "saved_dir": str(saved_dir)},
        "dataset": {
            "name": "AcdcSISRDataset",
            "kwargs": {
                "data_dir": str(root / "imgs"),
                "downscale_factor": 2,
                "transforms": [
                    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                    {"name": "ToTensor"},
                ],
                "augments": [
                    {"name": "RandomHorizontalFlip"},
                    {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}},
                ],
            },
        },
        "dataloader": {
            "name": "Dataloader",
            "kwargs": {"train_batch_size": 2, "valid_batch_size": 1, "shuffle": True,
                       "num_workers": 0},
        },
        "net": {
            "name": "EDSRNet",
            "kwargs": {"in_channels": 1, "out_channels": 1, "num_resblocks": 1,
                       "num_features": 4, "upscale_factor": 2},
        },
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3, "weight_decay": 0}},
        "logger": {"name": "AcdcSISRLogger", "kwargs": {}},
        "monitor": {
            "name": "Monitor",
            "kwargs": {"mode": "min", "target": "Loss", "saved_freq": 1, "early_stop": 0},
        },
        "trainer": {"name": "AcdcSISRTrainer", "kwargs": {"num_epochs": 1}},
    }
    cfg_path = tmp_path / "train.yaml"
    _write_yaml(cfg_path, train_cfg)
    run_train(load_config(cfg_path))

    assert (saved_dir / "config.yaml").exists()
    assert (saved_dir / "checkpoints" / "model_best.ckpt").exists()
    assert (saved_dir / "log" / "metrics.jsonl").exists()

    test_cfg = {
        "main": {
            "saved_dir": str(saved_dir / "pred"),
            "loaded_path": str(saved_dir / "checkpoints" / "model_best.ckpt"),
        },
        "dataset": dict(train_cfg["dataset"]),
        "dataloader": {"name": "Dataloader", "kwargs": {"batch_size": 1, "shuffle": False}},
        "net": dict(train_cfg["net"]),
        "losses": train_cfg["losses"],
        "metrics": [{"name": "PSNR"}, {"name": "SSIM"}],
        "predictor": {
            "name": "AcdcSISRPredictor",
            "kwargs": {"saved_dir": str(saved_dir / "pred"), "exported": True},
        },
    }
    test_cfg["dataset"]["kwargs"] = dict(test_cfg["dataset"]["kwargs"])
    test_cfg["dataset"]["kwargs"].pop("augments")
    cfg_path2 = tmp_path / "test.yaml"
    _write_yaml(cfg_path2, test_cfg)
    run_test(load_config(cfg_path2))
    assert (saved_dir / "pred" / "results.csv").exists()


def test_bicubic_predictor_no_checkpoint(tmp_path):
    root = make_processed_tree(
        tmp_path / "data", types=("test",), patients_per_type=1, slices=1,
        frames=3, hr_size=16,
    )
    cfg = {
        "main": {"saved_dir": str(tmp_path / "pred")},
        "dataset": {
            "name": "AcdcSISRDataset",
            "kwargs": {
                "data_dir": str(root / "imgs"),
                "downscale_factor": 2,
                "transforms": [
                    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                    {"name": "ToTensor"},
                ],
            },
        },
        "dataloader": {"name": "Dataloader", "kwargs": {"batch_size": 1, "shuffle": False}},
        "net": {"name": "Bicubic", "kwargs": {"upscale_factor": 2}},
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "predictor": {"name": "AcdcSISRPredictor", "kwargs": {"exported": False}},
    }
    cfg_path = tmp_path / "bicubic.yaml"
    _write_yaml(cfg_path, cfg)
    run_test(load_config(cfg_path))


def test_repo_configs_parse_and_resolve():
    """Every shipped config must reference only registered components."""
    from pathlib import Path

    import vsr_tpu.main  # noqa: F401 — populates registries

    cfg_dir = Path(__file__).resolve().parent.parent / "configs"
    cfg_files = sorted(cfg_dir.glob("**/*.yaml"))
    assert len(cfg_files) >= 30, cfg_dir  # never pass vacuously
    for cfg_file in cfg_files:
        cfg = load_config(cfg_file)
        assert cfg.dataset.name in names("dataset"), cfg_file
        assert cfg.net.name in names("net"), cfg_file
        for spec in cfg.losses:
            assert spec["name"] in names("loss"), (cfg_file, spec)
        for spec in cfg.metrics:
            assert spec["name"] in names("metric"), (cfg_file, spec)
        if "trainer" in cfg:
            assert cfg.trainer.name in names("trainer"), cfg_file
            assert cfg.optimizer.name in names("optimizer"), cfg_file
            assert cfg.logger.name in names("logger"), cfg_file
        if "predictor" in cfg:
            assert cfg.predictor.name in names("predictor"), cfg_file
