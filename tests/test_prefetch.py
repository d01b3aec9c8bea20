import numpy as np

from vsr_tpu.data.prefetch import device_prefetch


def _batches(n):
    for i in range(n):
        yield {"x": np.full((2, 3), i, np.float32), "index": np.array([i, i])}


def test_prefetch_preserves_order_and_values():
    out = list(device_prefetch(_batches(5), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 3), i))
        assert hasattr(b["x"], "devices")  # on device


def test_prefetch_short_iterator():
    assert len(list(device_prefetch(_batches(1), depth=4))) == 1
    assert list(device_prefetch(_batches(0), depth=2)) == []
