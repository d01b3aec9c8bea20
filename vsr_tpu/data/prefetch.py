"""Device prefetching: overlap host->device transfer with compute.

The reference's analogue is worker-process prefetch into host RAM; on TPU
the expensive hop is host->HBM, so this wraps a batch iterator and keeps
``depth`` batches already resident on device (optionally sharded for a DP
mesh) while the current step runs — the "HBM-resident patch buffer with
device prefetch" called for by BASELINE.json.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator

import jax
import numpy as np


def device_prefetch(
    iterator: Iterable[dict[str, np.ndarray]],
    depth: int = 2,
    sharding=None,
) -> Iterator[dict]:
    """Yield batches already transferred to device.

    ``sharding``: optional ``jax.sharding.Sharding`` applied to every array
    (e.g. batch-sharded NamedSharding for data parallelism); default places
    on the default device. Transfers are async — ``device_put`` returns
    immediately and the copy overlaps with whatever the device is doing.
    """
    queue: deque = deque()

    def put(batch: dict) -> dict:
        out = {}
        for key, val in batch.items():
            if isinstance(val, np.ndarray) and val.dtype != object:
                out[key] = jax.device_put(val, sharding)
            else:
                out[key] = val
        return out

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
