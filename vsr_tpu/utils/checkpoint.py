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
