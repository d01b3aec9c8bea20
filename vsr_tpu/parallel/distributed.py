"""Multi-host (multi-process) training support.

`initialize` sets up ``jax.distributed`` so ``jax.devices()`` spans every
host and the mesh helpers in this package build DCN-spanning meshes
transparently (SURVEY.md §2.9's multi-host requirement). The pieces:

- :func:`initialize_from_config` — called by ``vsr_tpu.main`` before any
  jax computation; reads the ``main.distributed`` config section with
  ``VSR_COORDINATOR_ADDRESS`` / ``VSR_NUM_PROCESSES`` / ``VSR_PROCESS_ID``
  environment overrides (the same YAML is shared by every process; the
  per-process identity comes from the environment, as on Cloud TPU).
- :func:`host_shard_len` / the loader's ``host_shard=True`` — host-sharded
  input: each process reads only its slice of every global batch.
- :func:`host_local_to_global` / :func:`global_to_host_local` — convert the
  per-process batch (leading axis = local batch) into one global array
  sharded over the ``'data'`` mesh axis and back (gather only the
  process-local shards for logging).

On a single process every helper degrades to a no-op, so the same trainer
code path serves 1 chip, 1 host x N chips, and M hosts x N chips.
"""

from __future__ import annotations

import logging
import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed.

    On Cloud TPU the arguments are auto-detected from the environment
    (pass nothing); elsewhere pass them explicitly. Explicit arguments that
    fail to connect raise — a silently degraded single-process run would
    train on a fraction of the data.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    # Any explicitly-requested multi-process identity must not silently
    # degrade to a single-process run (each process would train its own
    # model on a shard and race on the checkpoint dir).
    explicit = (coordinator_address is not None or process_id is not None
                or num_processes is not None)
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
    except Exception as exc:
        if explicit:
            raise RuntimeError(
                f"jax.distributed.initialize failed for explicit coordinator "
                f"{coordinator_address!r}: {exc}") from exc
        logging.warning(  # pragma: no cover - environment dependent
            f"jax.distributed auto-initialize failed ({exc}); single-process mode")


def initialize_from_config(dist_cfg) -> None:
    """Wire ``main.distributed`` (+ env overrides) into :func:`initialize`.

    Enabled when the config section exists or ``VSR_NUM_PROCESSES`` is set.
    ``main.distributed: auto`` (or ``{}``) defers entirely to jax's Cloud
    TPU auto-detection.
    """
    env = os.environ
    if dist_cfg is None and "VSR_NUM_PROCESSES" not in env:
        return
    cfg = dict(dist_cfg) if isinstance(dist_cfg, dict) else {}
    coord = env.get("VSR_COORDINATOR_ADDRESS", cfg.get("coordinator_address"))
    nproc = env.get("VSR_NUM_PROCESSES", cfg.get("num_processes"))
    pid = env.get("VSR_PROCESS_ID", cfg.get("process_id"))
    initialize(
        coordinator_address=coord,
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None,
    )


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_multiprocess() -> bool:
    return process_count() > 1


def is_primary() -> bool:
    """True on the process that owns file writes (checkpoints, logs)."""
    return process_index() == 0


def process_shard(n_items: int) -> slice:
    """This process's contiguous shard of a dataset (host-sharded input)."""
    per = n_items // process_count()
    start = process_index() * per
    end = start + per if process_index() < process_count() - 1 else n_items
    return slice(start, end)


def host_shard_len(n_items: int, local_batch: int) -> int:
    """Number of per-process batches a host-sharded loader yields: global
    batches are ``local_batch * process_count`` samples; ragged tails are
    dropped (they cannot be split identically across processes)."""
    return n_items // (local_batch * process_count())


def host_local_to_global(tree, mesh, spec):
    """Per-process host-local arrays (leading axis = local batch) -> one
    global jax.Array sharded by ``spec`` over ``mesh``. Identity when
    single-process (the local batch IS the global batch)."""
    if not is_multiprocess():
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(tree, mesh, spec)


def mesh_process_blocks(mesh) -> dict[str, tuple[int, int]]:
    """Per mesh axis: ``(block_index, block_count)`` for THIS process.

    ``block_count`` is how many process groups partition the axis (1 =
    the axis lives entirely within each process's devices) and
    ``block_index`` is which of those blocks this process's devices
    occupy. Used to assemble multi-host global batches when spatial/seq
    axes shard activation dims: a process contributes its slice of every
    sharded dim, and processes in the same 'data' block read the SAME
    samples (``Dataloader._host_shard_override``).

    Requires each process's devices to form one contiguous, aligned
    sub-block of the mesh grid — true for :func:`make_mesh`'s row-major
    reshape of ``jax.devices()`` (sorted by process), where the LEADING
    mesh axes span processes.
    """
    import jax
    import numpy as np

    if not is_multiprocess():
        return {a: (0, 1) for a in mesh.axis_names}
    pidx = jax.process_index()
    procs = np.empty(mesh.devices.shape, dtype=np.int64)
    for i, d in np.ndenumerate(mesh.devices):
        procs[i] = d.process_index
    mask = procs == pidx
    if not mask.any():
        raise ValueError(
            f"process {pidx} owns no devices in the mesh "
            f"{dict(mesh.shape)} — multi-host meshes must span every "
            "process's devices")
    out: dict[str, tuple[int, int]] = {}
    block_prod = 1
    for ax, name in enumerate(mesh.axis_names):
        other = tuple(i for i in range(mask.ndim) if i != ax)
        pos = np.nonzero(mask.any(axis=other) if other else mask)[0]
        size, block = mask.shape[ax], len(pos)
        if (size % block or pos[0] % block
                or not np.array_equal(pos, np.arange(pos[0], pos[0] + block))):
            raise ValueError(
                f"process {pidx}'s devices are not a contiguous aligned "
                f"block along mesh axis {name!r} — order mesh_axes so "
                "process-spanning axes come first")
        block_prod *= block
        out[name] = (int(pos[0]) // block, size // block)
    if block_prod != int(mask.sum()):
        raise ValueError(
            f"process {pidx}'s devices do not form a cartesian sub-block "
            f"of the mesh {dict(mesh.shape)}")
    return out


def gather_sharded(tree):
    """Materialize every process-spanning SHARDED leaf as a full host array
    (fully-replicated and addressable leaves pass through untouched).

    A collective: every process must call it, in the same tree order —
    used by checkpoint writes and the batch-1 validation fallback when
    ZeRO/FSDP keep moments/params sharded across hosts. Identity when
    single-process.
    """
    if not is_multiprocess():
        return tree
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    def g(leaf):
        if (isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
                and not leaf.is_fully_replicated):
            return np.asarray(multihost_utils.process_allgather(
                leaf, tiled=True))
        return leaf

    return jax.tree_util.tree_map(g, tree)


def global_to_host_local(tree, mesh, spec):
    """Inverse of :func:`host_local_to_global` — materialize this process's
    addressable shards as host-local arrays (used only for logging images,
    never in the training math)."""
    if not is_multiprocess():
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.global_array_to_host_local_array(tree, mesh, spec)
