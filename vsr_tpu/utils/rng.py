"""Deterministic, checkpoint-friendly randomness.

The reference relies on a fragile choreography of global RNG state: python
``random.seed`` + per-epoch numpy reseeds from a pre-sampled list
(``/root/reference/src/runner/trainers/base_trainer.py:49-54``) and per-worker
reseeds (``src/data/dataloader.py:51-53``). Here every consumer derives an
independent stream from a single root seed through ``np.random.SeedSequence``
spawn keys, so results do not depend on worker count, epoch replay order, or
library-internal draws:

    root -> ("data", epoch, sample_index)   per-sample augmentation Generator
    root -> ("init",)                       jax PRNG key for model init
    root -> ("train", step)                 jax PRNG key for dropout etc.

String seeds (the reference uses ``random.seed('vsr')``) are hashed with
SHA-256 so they are stable across processes and Python versions.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np


def seed_to_int(seed: int | str) -> int:
    """Map an int or string seed to a stable uint64-range int."""
    if isinstance(seed, (int, np.integer)):
        return int(seed) & 0xFFFFFFFFFFFFFFFF
    digest = hashlib.sha256(str(seed).encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "little")


def _tokens_to_ints(tokens: Iterable[int | str]) -> list[int]:
    return [seed_to_int(t) for t in tokens]


class RngTree:
    """Derives independent numpy Generators / JAX keys from one root seed."""

    def __init__(self, root_seed: int | str):
        self.root_seed = root_seed
        self._root = seed_to_int(root_seed)

    def numpy_generator(self, *tokens: int | str) -> np.random.Generator:
        ss = np.random.SeedSequence([self._root] + _tokens_to_ints(tokens))
        return np.random.Generator(np.random.Philox(ss))

    def jax_key(self, *tokens: int | str):
        """A jax PRNG key derived from the root seed and the token path.

        Imported lazily so pure-numpy consumers (data workers) never pay for
        a jax import.
        """
        import jax

        ss = np.random.SeedSequence([self._root] + _tokens_to_ints(tokens))
        return jax.random.PRNGKey(int(ss.generate_state(1, np.uint32)[0]))

    def __repr__(self) -> str:
        return f"RngTree(root_seed={self.root_seed!r})"
