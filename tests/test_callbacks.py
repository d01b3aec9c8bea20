"""Monitor and scheduler unit tests (reference had test_monitor.py)."""

import math

import pytest

from vsr_tpu.callbacks.monitor import Monitor
from vsr_tpu.optim import (
    CosineAnnealingLR,
    ExponentialLR,
    MultiStepLR,
    ReduceLROnPlateau,
    StepLR,
)


def test_monitor_save_schedule(tmp_path):
    m = Monitor(checkpoints_dir=tmp_path, mode="min", target="Loss",
                saved_freq=3, early_stop=0)
    assert m.is_saved(1) is None
    assert m.is_saved(3).name == "model_3.ckpt"
    assert m.is_saved(4) is None
    assert m.is_saved(6).name == "model_6.ckpt"


def test_monitor_best_min_and_early_stop(tmp_path):
    m = Monitor(checkpoints_dir=tmp_path, mode="min", target="Loss",
                saved_freq=10, early_stop=2)
    assert m.is_best({"Loss": 1.0}).name == "model_best.ckpt"
    assert m.is_best({"Loss": 0.5}) is not None
    assert m.is_best({"Loss": 0.6}) is None
    assert not m.is_early_stopped()
    assert m.is_best({"Loss": 0.7}) is None
    assert m.is_early_stopped()


def test_monitor_max_mode(tmp_path):
    m = Monitor(checkpoints_dir=tmp_path, mode="max", target="PSNR",
                saved_freq=10, early_stop=0)
    assert m.is_best({"PSNR": 20.0}) is not None
    assert m.is_best({"PSNR": 19.0}) is None
    assert m.is_best({"PSNR": 21.0}) is not None
    assert m.early_stop == math.inf  # 0 disables


def test_monitor_state_roundtrip(tmp_path):
    m = Monitor(checkpoints_dir=tmp_path, mode="min", target="Loss",
                saved_freq=1, early_stop=5)
    m.is_best({"Loss": 1.0})
    m.is_best({"Loss": 2.0})
    state = m.state_dict()
    m2 = Monitor(checkpoints_dir=tmp_path, mode="min", target="Loss",
                 saved_freq=1, early_stop=5)
    m2.load_state_dict(state)
    assert m2.best == 1.0 and m2.not_improved_count == 1


def test_step_lr():
    s = StepLR(step_size=2, gamma=0.1)
    s.bind(1.0)
    assert s.step() == pytest.approx(1.0)      # epoch 1
    assert s.step() == pytest.approx(0.1)      # epoch 2
    assert s.step() == pytest.approx(0.1)      # epoch 3
    assert s.step() == pytest.approx(0.01)     # epoch 4


def test_multistep_lr():
    s = MultiStepLR(milestones=[2, 4], gamma=0.5)
    s.bind(1.0)
    assert [round(s.step(), 4) for _ in range(5)] == [1.0, 0.5, 0.5, 0.25, 0.25]


def test_exponential_lr():
    s = ExponentialLR(gamma=0.9)
    s.bind(2.0)
    assert s.step() == pytest.approx(1.8)
    assert s.step() == pytest.approx(1.62)


def test_cosine_lr():
    s = CosineAnnealingLR(T_max=4, eta_min=0.0)
    s.bind(1.0)
    vals = [s.step() for _ in range(4)]
    assert vals[-1] == pytest.approx(0.0, abs=1e-9)
    assert vals[0] > vals[1] > vals[2] > vals[3]


def test_reduce_on_plateau():
    s = ReduceLROnPlateau(mode="min", factor=0.5, patience=1)
    s.bind(1.0)
    assert s.step(1.0) == pytest.approx(1.0)   # first value = best
    assert s.step(1.0) == pytest.approx(1.0)   # bad 1 (within patience)
    assert s.step(1.0) == pytest.approx(0.5)   # bad 2 -> reduce
    assert s.step(0.5) == pytest.approx(0.5)   # improvement
    state = s.state_dict()
    s2 = ReduceLROnPlateau(mode="min", factor=0.5, patience=1)
    s2.load_state_dict(state)
    assert s2.current_lr == pytest.approx(0.5)
    assert s2.best == pytest.approx(0.5)


def test_vsr_logger_grid_handles_tuple_outputs(tmp_path):
    """FRVSR valid outputs are (sr, warped_lr) with DIFFERENT spatial shapes;
    the grid must come from the SR element (regression: np.asarray on the
    inhomogeneous tuple used to raise and the grid was silently dropped)."""
    import numpy as np

    from vsr_tpu.callbacks.logger import VSRLogger

    logger = VSRLogger(log_dir=tmp_path)
    batch = {"hr_imgs": np.random.rand(1, 3, 16, 16, 1).astype(np.float32)}
    sr = np.random.rand(1, 4, 16, 16, 1).astype(np.float32)  # T-bucket padded
    warped = np.random.rand(1, 4, 8, 8, 1).astype(np.float32)
    grid = logger._make_grid(batch, (sr, warped))
    assert grid is not None and grid.ndim == 3
    logger.close()
