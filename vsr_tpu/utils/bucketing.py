"""Temporal bucketing for variable-length sequence evaluation under jit.

The reference evaluates whole variable-T cardiac sequences
(``/root/reference/src/data/datasets/acdc_vsr_dataset.py:79-81``); under XLA
every distinct T is a fresh compile (~minutes through the dev tunnel). The
VSR/4D nets in this framework are *causal* recurrences (``lax.scan`` over
frames, hidden state flowing forward only — DRFNet, FRVSRNet,
Volume4DSRNet), so padding the time axis at the END cannot change the
outputs of the real frames: output[t] depends only on frames <= t. Sequences
are therefore padded up to a small set of bucket lengths (multiples of
``granularity``) and the padded frames masked out of losses/metrics —
compile count drops from O(#distinct T) to O(#buckets) with metric values
equal to the unpadded computation.

Padding replicates the last frame (edge mode) so padded frames stay in the
data distribution and cannot produce NaNs/Infs that would poison reductions.

NOT safe for non-causal temporal models (full-window 3D convs over T): only
the causal VSR/4D paths use this.
"""

from __future__ import annotations

import numpy as np


def bucket_length(t: int, granularity: int) -> int:
    """Smallest multiple of ``granularity`` >= t (t itself if disabled)."""
    if granularity is None or granularity <= 1:
        return t
    return -(-t // granularity) * granularity


def pad_time_edge(a, to_len: int, axis: int = 1):
    """Pad ``a`` along ``axis`` to ``to_len`` by repeating the last entry.

    Works on numpy and jax arrays (uses ``.take``); returns ``a`` unchanged
    when already long enough.
    """
    t = a.shape[axis]
    if to_len <= t:
        return a
    idx = np.concatenate([np.arange(t), np.full(to_len - t, t - 1)])
    return a.take(idx, axis=axis)


def time_mask(t: int, to_len: int) -> np.ndarray:
    """(to_len,) float32 mask: 1 for real frames, 0 for padding."""
    mask = np.zeros((to_len,), np.float32)
    mask[:t] = 1.0
    return mask
