"""Multi-host (multi-process) initialization.

One call sets up `jax.distributed` for a multi-host TPU slice (or a GPU/CPU
cluster), after which `jax.devices()` spans every host and the mesh helpers
in this package build DCN-spanning meshes transparently. The data loader
shards work per process via `process_shard` so each host reads only its part
of the dataset (host-sharded input pipeline).
"""

from __future__ import annotations

import logging


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On Cloud TPU the arguments are auto-detected from the environment;
    elsewhere pass them explicitly.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logging.info(
            f"jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    except Exception as exc:  # pragma: no cover - environment dependent
        logging.warning(f"jax.distributed.initialize failed ({exc}); single-process mode")


def process_shard(n_items: int) -> slice:
    """This process's contiguous shard of a dataset (host-sharded input)."""
    import jax

    per = n_items // jax.process_count()
    start = jax.process_index() * per
    end = start + per if jax.process_index() < jax.process_count() - 1 else n_items
    return slice(start, end)
