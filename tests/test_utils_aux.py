import time

from vsr_tpu.utils.profiling import StepTimer, trace
from vsr_tpu.utils.recovery import find_latest_checkpoint


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_s"] >= 0.01


def test_trace_noop():
    with trace(None):
        pass


def test_find_latest_checkpoint(tmp_path):
    assert find_latest_checkpoint(tmp_path / "nope") is None
    d = tmp_path / "ckpt"
    d.mkdir()
    assert find_latest_checkpoint(d) is None
    (d / "model_best.ckpt").write_bytes(b"x")
    assert find_latest_checkpoint(d).name == "model_best.ckpt"
    (d / "model_10.ckpt").write_bytes(b"x")
    (d / "model_2.ckpt").write_bytes(b"x")
    assert find_latest_checkpoint(d).name == "model_10.ckpt"
