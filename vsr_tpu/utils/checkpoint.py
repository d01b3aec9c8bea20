"""Single-file checkpointing of JAX pytrees + auxiliary Python state.

Equivalent role to the reference's ``torch.save``/``torch.load`` payload
(``base_trainer.py:224-252``): network params, optimizer state, monitor
state, scheduler state, and epoch, restored to resume the exact run.

Format: one msgpack file containing ``{"state": <flax state dict of array
pytrees>, "aux": <JSON-like python data>}``. Restoration requires a template
pytree with the same structure (obtained by re-initializing the model /
optimizer), which keeps the format robust across code moves, unlike pickled
objects.
"""

from __future__ import annotations

import copy
import queue
import threading
from pathlib import Path
from typing import Any

from flax import serialization


def save_checkpoint(path: str | Path, state: Any, aux: dict | None = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(state),
        "aux": aux or {},
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    tmp.replace(path)  # atomic on POSIX


#: Marker for empty-dict nodes (e.g. optax's ``hyperparams_states = {}``) —
#: flatten_dict would silently drop them and break from_state_dict's
#: structure match on restore.
_EMPTY_NODE = "__vsr_empty_node__"


def _flatten_state(state: Any) -> dict:
    from flax import traverse_util

    flat = traverse_util.flatten_dict(
        serialization.to_state_dict(state), sep="/", keep_empty_nodes=True)
    return {k: (_EMPTY_NODE if v is traverse_util.empty_node else v)
            for k, v in flat.items()}


def _unflatten_state(flat: dict) -> dict:
    from flax import traverse_util

    flat = {k: (traverse_util.empty_node if (isinstance(v, str) and
                                             v == _EMPTY_NODE) else v)
            for k, v in flat.items()}
    return traverse_util.unflatten_dict(flat, sep="/")


def _encode_index(index, shape) -> list:
    """Shard index (tuple of slices) -> [[start, stop], ...] (msgpack-able)."""
    out = []
    for sl, dim in zip(index, shape):
        out.append([int(sl.start or 0), int(dim if sl.stop is None else sl.stop)])
    return out


def _decode_index(e: dict) -> list:
    """Shard entry -> [[start, stop], ...]. msgpack may restore the saved
    list-of-pairs as a dict keyed by position — one decoder shared by the
    load and consolidate paths so they cannot diverge."""
    idx = e["index"]
    if isinstance(idx, dict):
        idx = [idx[k] for k in sorted(idx, key=int)]
    return [[int(a), int(b)] for a, b in idx]


def _derive_save_id(aux: dict, manifest: dict) -> str:
    """Deterministic save nonce, identical across processes of one save but
    distinct between any two saves that could reuse the same file path.

    aux is lockstep-identical across processes (epoch, monitor state, RNG
    seed), and the trainer writes a given path at most once per epoch;
    across a crash + resume the epoch advances before the next save — so
    hashing aux separates every pair of saves that could mix on one path.
    The sharded-leaf manifest (leaf names + global shapes/dtypes — global
    properties, so also process-identical) is mixed in as well, so direct
    callers that pass aux=None still get distinct nonces whenever the
    state's structure differs; callers whose aux AND structure are both
    identical across two saves to one path get identical nonces and the
    mixed-shard detection cannot separate them — pass a distinguishing
    aux (e.g. a step counter) in that case, as the trainer always does.
    Computed WITHOUT collectives so the async writer thread can call it
    safely (a cross-host barrier here could interleave with main-thread
    collectives and deadlock — which is also why the main file is only
    ordered after this process's own shard write, not all processes').
    Deterministic on purpose: re-running the same training reproduces the
    checkpoint files bitwise."""
    import hashlib

    blob = serialization.msgpack_serialize(
        {"aux": aux, "manifest": manifest})
    return hashlib.sha256(blob).hexdigest()[:16]


def save_checkpoint_sharded(path: str | Path, state: Any, aux: dict | None = None) -> None:
    """Scalable checkpoint for FSDP/ZeRO/TP/EP state: every process writes
    ONLY the array shards it owns (``<path>.shard<k>``), process 0 writes
    the main file (replicated leaves + aux + a shard manifest). Nothing is
    gathered — no O(model) cross-host traffic or host memory, unlike
    :meth:`BaseTrainer.save`'s default gather-to-primary path (the
    reference's ``torch.save`` has no analogue, ``base_trainer.py:224``).

    Restore requires the SAME mesh/process topology (each leaf is
    reassembled from the shard indices the current placement asks for);
    :func:`load_checkpoint_sharded` raises a clear error otherwise.

    Every file of one save (main + all shards) embeds the same ``save_id``
    nonce; load/consolidate require an exact match, so a crash mid-save
    over a reused path (model_best.ckpt, model_preempt.ckpt) can never be
    silently reassembled from mixed-epoch shard files.
    """
    import jax
    import numpy as np

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten_state(state)
    replicated: dict = {}
    manifest: dict = {}
    my_shards: dict = {}
    for key, leaf in flat.items():
        if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            manifest[key] = {"shape": list(leaf.shape), "dtype": str(leaf.dtype)}
            entries = []
            for s in leaf.addressable_shards:
                if s.replica_id != 0:
                    continue  # another process/device owns this copy
                entries.append({"index": _encode_index(s.index, leaf.shape),
                                "data": np.asarray(s.data)})
            my_shards[key] = entries
        else:
            replicated[key] = np.asarray(leaf) if isinstance(
                leaf, jax.Array) else leaf
    save_id = _derive_save_id(aux or {}, manifest)
    proc = jax.process_index()
    shard_payload = serialization.msgpack_serialize(
        {"process": proc, "save_id": save_id, "leaves": my_shards})
    shard_path = path.with_name(path.name + f".shard{proc}")
    tmp = shard_path.with_suffix(shard_path.suffix + ".tmp")
    tmp.write_bytes(shard_payload)
    tmp.replace(shard_path)
    if proc == 0:
        # Written after this process's own shard, so on single-host runs
        # the main file (the manifest the nonce check anchors on) lands
        # last; see _derive_save_id for why there is no cross-host barrier.
        payload = serialization.msgpack_serialize({
            "format": "sharded-v1",
            "save_id": save_id,
            "replicated": replicated,
            "sharded": manifest,
            "num_processes": jax.process_count(),
            "aux": aux or {},
        })
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_bytes(payload)
        tmp.replace(path)


def is_sharded_checkpoint(path: str | Path) -> bool:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload.get("format") == "sharded-v1"


def load_checkpoint_sharded(path: str | Path, state_template: Any,
                            payload: dict | None = None):
    """Restore a :func:`save_checkpoint_sharded` checkpoint onto a PLACED
    template (leaves already carry their target shardings, e.g. via the
    trainer's ``_place_state``). Each process reads only its own shard
    file and assembles every sharded leaf device-by-device. Returns
    ``(state, aux)`` like :func:`load_checkpoint`. ``payload`` lets a
    caller that already parsed the main file pass it in instead of
    reading + msgpack-restoring it a second time."""
    import jax
    import numpy as np
    from flax import traverse_util

    path = Path(path)
    if payload is None:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    if payload.get("format") != "sharded-v1":
        raise ValueError(f"{path} is not a sharded-v1 checkpoint")
    save_id = payload.get("save_id")  # absent in pre-nonce checkpoints
    if payload["num_processes"] != jax.process_count():
        raise ValueError(
            f"sharded checkpoint was written by {payload['num_processes']} "
            f"process(es) but this run has {jax.process_count()} — restore "
            "needs the same topology (or a gathered checkpoint)")
    proc = jax.process_index()

    # This process's shards normally live in its own file; leaves that are
    # REPLICATED across processes but sharded locally (e.g. multi-host
    # tensor parallelism: split over an intra-host 'model' axis, copied
    # over the host-spanning 'data' axis) were deduplicated at save time
    # (replica_id==0 wins), so their data may sit in another process's
    # file — fall back to scanning the rest on a miss.
    _cache: dict = {}

    def _shard_file(p: int):
        if p not in _cache:
            sp = path.with_name(path.name + f".shard{p}")
            if not sp.exists():
                raise FileNotFoundError(
                    f"missing {sp} — every process's shard file must be on "
                    "a filesystem this process can read")
            with open(sp, "rb") as f:
                shard = serialization.msgpack_restore(f.read())
            if save_id is not None and shard.get("save_id") != save_id:
                raise ValueError(
                    f"{sp} is from a different save than {path} (save_id "
                    f"{shard.get('save_id')} != {save_id}) — a crash "
                    "mid-save left mixed-epoch shard files; restore from "
                    "an older intact checkpoint")
            _cache[p] = shard["leaves"]
        return _cache[p]

    def _lookup(key: str, want: tuple):
        order = [proc] + [p for p in range(payload["num_processes"])
                          if p != proc]
        for p in order:
            entries = _shard_file(p).get(key, [])
            if isinstance(entries, dict):  # msgpack may restore as a dict
                entries = list(entries.values())
            for e in entries:
                if tuple(map(tuple, _decode_index(e))) == want:
                    return e["data"]
        return None

    flat_tmpl = _flatten_state(state_template)
    out: dict = {}
    for key, leaf in flat_tmpl.items():
        if key in payload["sharded"]:
            meta = payload["sharded"][key]
            shape = tuple(meta["shape"])
            if not isinstance(leaf, jax.Array) or leaf.is_fully_replicated:
                raise ValueError(
                    f"checkpoint leaf {key!r} was saved sharded but the "
                    "template is not sharded — restore with the same "
                    "mesh/parallelism config, or from a gathered checkpoint")
            if tuple(leaf.shape) != shape:
                raise ValueError(
                    f"shape mismatch for {key!r}: checkpoint {shape}, "
                    f"template {tuple(leaf.shape)}")
            if str(leaf.dtype) != meta["dtype"]:
                raise ValueError(
                    f"dtype mismatch for {key!r}: checkpoint "
                    f"{meta['dtype']}, template {leaf.dtype} — the model/"
                    "optimizer dtype config changed since the save")
            sharding = leaf.sharding
            arrays = []
            for dev, idx in sharding.addressable_devices_indices_map(
                    shape).items():
                want = tuple(
                    (int(sl.start or 0), int(dim if sl.stop is None else sl.stop))
                    for sl, dim in zip(idx, shape))
                data = _lookup(key, want)
                if data is None:
                    raise ValueError(
                        f"{key!r}: no shard file holds shard {want} — the "
                        "mesh layout changed since the checkpoint was "
                        "written (consolidate it to re-shard)")
                arrays.append(jax.device_put(np.asarray(data), dev))
            out[key] = jax.make_array_from_single_device_arrays(
                shape, sharding, arrays)
        else:
            if key not in payload["replicated"]:
                raise ValueError(f"checkpoint is missing leaf {key!r}")
            out[key] = payload["replicated"][key]
    state = serialization.from_state_dict(
        state_template, _unflatten_state(out))
    return state, payload.get("aux", {})


def consolidate_sharded_checkpoint(path: str | Path, out_path: str | Path) -> None:
    """Stitch a sharded-v1 checkpoint (main file + every ``.shard<k>``)
    into a plain gathered checkpoint — pure numpy, no mesh or devices
    needed, so it runs on any host that can see all the files. The result
    loads everywhere a normal checkpoint does (infer/export/convert/
    differently-meshed trainers)."""
    import numpy as np
    from flax import traverse_util

    path = Path(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("format") != "sharded-v1":
        raise ValueError(f"{path} is not a sharded-v1 checkpoint")
    def _np_dtype(name: str):
        try:
            return np.dtype(name)
        except TypeError:  # bfloat16 etc. live in ml_dtypes, not numpy
            import ml_dtypes

            return np.dtype(getattr(ml_dtypes, name))

    flat = dict(payload["replicated"])
    filled: dict = {key: np.zeros(tuple(meta["shape"]),
                                  dtype=_np_dtype(meta["dtype"]))
                    for key, meta in payload["sharded"].items()}
    seen: dict = {key: np.zeros(tuple(meta["shape"]), dtype=bool)
                  for key, meta in payload["sharded"].items()}
    save_id = payload.get("save_id")  # absent in pre-nonce checkpoints
    for proc in range(payload["num_processes"]):
        shard_path = path.with_name(path.name + f".shard{proc}")
        if not shard_path.exists():
            raise FileNotFoundError(
                f"missing {shard_path} — consolidation needs every "
                "process's shard file")
        with open(shard_path, "rb") as f:
            shard = serialization.msgpack_restore(f.read())
        if save_id is not None and shard.get("save_id") != save_id:
            raise ValueError(
                f"{shard_path} is from a different save than {path} "
                f"(save_id {shard.get('save_id')} != {save_id}) — a crash "
                "mid-save left mixed-epoch shard files")
        for key, entries in shard["leaves"].items():
            if isinstance(entries, dict):  # msgpack may restore as a dict
                entries = list(entries.values())
            for e in entries:
                sl = tuple(slice(a, b) for a, b in _decode_index(e))
                filled[key][sl] = e["data"]
                seen[key][sl] = True
    for key, mask in seen.items():
        if not mask.all():
            raise ValueError(
                f"{key!r}: shard files do not cover the full array "
                f"({int(mask.sum())}/{mask.size} elements) — checkpoint "
                "is incomplete")
    flat.update(filled)
    state = _unflatten_state(flat)
    save_checkpoint(out_path, state, payload.get("aux", {}))


class AsyncCheckpointWriter:
    """Non-blocking checkpoint writes that overlap training.

    ``submit()`` snapshots the state WITHOUT waiting for the device->host
    transfer: every ``jax.Array`` leaf is copied ON DEVICE (``jnp.copy`` —
    an async dispatch that the runtime orders BEFORE any later train step
    that donates the original buffer, so the snapshot holds exactly the
    submit-time values), host arrays are copied in Python, and ``aux`` is
    deep-copied. The (path, snapshot, aux) job then goes to a single
    daemon writer thread that pulls the snapshot to host and writes the
    file through :func:`save_checkpoint`'s atomic tmp+rename — the device
    keeps executing queued steps while the transfer and the file IO run.

    One worker thread means writes land in submit order, so a later
    ``model_best.ckpt`` overwrite always wins. Worker errors are stashed
    and re-raised on the next ``submit()``/``wait()``. Call ``wait()``
    before reading a just-submitted file or exiting the process —
    otherwise an in-flight write may not have landed (the atomic rename
    guarantees the file is never half-written, but it may be the OLD
    version or absent).
    """

    def __init__(self, write_fn=None) -> None:
        # write_fn(path, snapshot, aux) — the snapshot's jax.Array leaves
        # keep their shardings, so a sharded writer (e.g.
        # save_checkpoint_sharded) can extract its owned shards in the
        # worker. Default: device_get + save_checkpoint.
        self._write_fn = write_fn
        # Bounded: each queued job pins a full on-device snapshot of
        # params+opt_state until the writer drains it; with the slow
        # dev-tunnel transfers (10-75 MB/s) an unbounded queue could pile
        # snapshots in HBM and OOM. submit() blocks when 2 are in flight.
        self._queue: queue.Queue = queue.Queue(maxsize=2)
        self._errors: list[BaseException] = []
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- public

    def submit(self, path: str | Path, state: Any, aux: dict | None = None) -> None:
        """Snapshot ``state`` (cheap: on-device copies) and enqueue the
        write; blocks only when 2 snapshots are already in flight (HBM
        bound). Raises any error stashed by a PREVIOUS write."""
        self._raise_pending()
        import jax

        snapshot = jax.tree_util.tree_map(self._snapshot_leaf, state)
        self._ensure_thread()
        self._queue.put((Path(path), snapshot, copy.deepcopy(aux or {})))

    def wait(self) -> None:
        """Block until every submitted write has landed; re-raise errors."""
        self._queue.join()
        self._raise_pending()

    # ------------------------------------------------------------ internal

    @staticmethod
    def _snapshot_leaf(leaf: Any) -> Any:
        import jax
        import jax.numpy as jnp
        import numpy as np

        if isinstance(leaf, jax.Array):
            # Fresh on-device buffer (verified non-aliasing + bit-exact,
            # incl. signed zeros) — safe against donate_argnames on the
            # original in the next dispatched train step.
            return jnp.copy(leaf)
        if isinstance(leaf, np.ndarray):
            return leaf.copy()
        return leaf  # python scalars / strings are immutable

    def _ensure_thread(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._worker, name="vsr-ckpt-writer", daemon=True)
            self._thread.start()

    def _worker(self) -> None:
        import jax

        while True:
            path, snapshot, aux = self._queue.get()
            try:
                if self._write_fn is not None:
                    self._write_fn(path, snapshot, aux)
                else:
                    save_checkpoint(path, jax.device_get(snapshot), aux)
            except BaseException as e:  # surfaced on next submit()/wait()
                with self._lock:
                    self._errors.append(e)
            finally:
                self._queue.task_done()

    def _raise_pending(self) -> None:
        with self._lock:
            if self._errors:
                err = self._errors[0]
                self._errors.clear()
                raise RuntimeError(
                    "async checkpoint write failed (earlier submit)") from err


def load_checkpoint(path: str | Path, state_template: Any | None = None,
                    payload: dict | None = None):
    """Returns (state, aux). If ``state_template`` is given, the stored state
    dict is restored onto it (shape/structure validated); otherwise the raw
    state dict is returned. ``payload`` lets a caller that already parsed
    the file (e.g. to branch on its format) skip the second read+parse."""
    if payload is None:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    if payload.get("format") == "sharded-v1":
        raise ValueError(
            f"{path} is a sharded checkpoint (per-process shard files). "
            "Restore it through a trainer with the same mesh topology, or "
            "consolidate it into a plain checkpoint first: "
            "python -m vsr_tpu.convert --consolidate <ckpt> <out.ckpt>")
    state = payload["state"]
    if state_template is not None:
        state = serialization.from_state_dict(state_template, state)
    return state, payload.get("aux", {})
