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

    def __init__(self) -> None:
        self._queue: queue.Queue = queue.Queue()
        self._errors: list[BaseException] = []
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- public

    def submit(self, path: str | Path, state: Any, aux: dict | None = None) -> None:
        """Snapshot ``state`` (cheap: on-device copies) and enqueue the
        write. Raises any error stashed by a PREVIOUS write."""
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


def load_checkpoint(path: str | Path, state_template: Any | None = None):
    """Returns (state, aux). If ``state_template`` is given, the stored state
    dict is restored onto it (shape/structure validated); otherwise the raw
    state dict is returned."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload["state"]
    if state_template is not None:
        state = serialization.from_state_dict(state_template, state)
    return state, payload.get("aux", {})
