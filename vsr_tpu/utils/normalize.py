"""Dataset intensity statistics and denormalization.

Parity with ``/root/reference/src/utils.py:1-20``: metrics are computed on
z-score-denormalized tensors mapped back to [0, 255] with round-then-clamp.
The hard-coded train-set statistics match the reference exactly
(``utils.py:14,16``).
"""

from __future__ import annotations

import numpy as np

DATASET_STATS: dict[str, tuple[float, float]] = {
    "acdc": (54.089, 48.084),
    "dsb15": (51.193, 52.671),
}


def denormalize(imgs, dataset: str = "acdc"):
    """Map z-scored images back to [0, 255].

    Works on numpy or jax arrays. Matches the reference order of operations:
    ``(x * std + mean).round().clamp(0, 255)`` (``utils.py:18-19``). Note the
    reference multiplies by ``std`` without the ``+1e-10`` the Normalize
    transform divides by; we reproduce that asymmetry for bit parity.
    """
    try:
        mean, std = DATASET_STATS[dataset]
    except KeyError:
        raise ValueError(
            f"dataset should be one of {sorted(DATASET_STATS)}, got {dataset!r}"
        ) from None
    if isinstance(imgs, np.ndarray):
        return np.clip(np.round(imgs * std + mean), 0, 255)
    import jax.numpy as jnp

    return jnp.clip(jnp.round(imgs * std + mean), 0, 255)


def normalize(imgs, mean: float, std: float):
    """Forward z-score used by the Normalize transform: (x - mean) / (std + 1e-10)."""
    return (imgs - mean) / (std + 1e-10)
