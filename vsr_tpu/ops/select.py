"""Sort-free exact top-k SELECTION mask via radix threshold search.

The MoE expert-choice router (models/moe.py) selects, per ``(group,
expert)`` row of ``gs`` affinities, the ``k`` largest with stable ties
(earlier index wins) — ``lax.top_k``'s selection set. The shipped rank
router already avoids the TPU sort (8 GB/s) with a pairwise-comparison
rank, but that materializes a ``(rows, gs, gs)`` broadcast: HBM-bound at
~85 Gops/s, 20% of MoE serving device time (BENCH.md round 3, "the
remaining ceiling").

When only the selection MASK is needed (dense dispatch gates by
``rank < cap`` — slot order is never used), the threshold can be found
without any pairwise structure: binary/radix search over the float BIT
pattern for the k-th largest value (``O(passes * gs)`` traffic instead of
``O(gs^2)``), then one tie-resolution pass. The selected set is
bit-for-bit the rank router's (same value-descending, index-ascending
total order), proven by the cross-router layer tests.

MEASURED NEGATIVE at the shipped MoE shapes (gs=256, BENCH.md round 3):
radix1 2.87 / radix4 1.77 / radix8 0.37 vs rank/dense 3.23 vol/s,
monotone in candidates-per-pass. The pairwise rank runs as ONE fused
reduction (slow as it is at ~85 Gops/s); the radix passes are ~32
sequentially dependent reductions — each must wait for the previous
prefix, each re-reads the affinity rows, and none fuse with each
other, so per-pass overhead dominates the traffic saved. Kept opt-in
(``router_impl="radix"``) for shapes with gs large enough that the
quadratic broadcast overtakes the fixed pass chain.

Precondition: every element is a non-negative finite float (softmax
affinities). For such values the IEEE-754 bit pattern, read as a
non-negative int32, orders identically to the float value — which is
what makes the bitwise radix search exact.

Reference for the routing semantics this reproduces:
``/root/reference`` has no MoE — this is new TPU-first capability; the
selection contract is pinned against ``jax.lax.top_k`` in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _threshold_bits(bits, k, radix_bits):
    """Largest int32 ``t`` (per row) with ``count(bits >= t) >= k``.

    ``bits``: ``(..., gs)`` non-negative int32 keys. Greedy MSB-first
    construction, ``radix_bits`` bits per pass: pass ``p`` tries the
    ``2**radix_bits - 1`` nonzero extensions of the current prefix;
    ``count(bits >= cand | v << s)`` is non-increasing in ``v``, so the
    best extension is simply the number of extensions that still satisfy
    the count. Each pass reads ``bits`` once (multi-output fused
    compares) — total traffic ``ceil(32/radix_bits)`` row-reads instead
    of the pairwise formulation's ``gs``.
    """
    rows = bits.shape[:-1]
    cand = jnp.zeros(rows, jnp.int32)
    # Non-overlapping MSB-first passes over bit positions [s, s+R). Bit
    # 31 (IEEE sign) is 0 for every non-negative input; the top pass is
    # clipped so no candidate ever sets it (an int32 sign flip would
    # compare below every key and corrupt the greedy count).
    for s in list(range(0, 32, radix_bits))[::-1]:
        nvals = min(1 << radix_bits, 1 << max(0, 31 - s)) - 1
        if nvals == 0:
            continue
        sat = []
        for v in range(1, nvals + 1):
            t = cand | (v << s)
            cnt = jnp.sum((bits >= t[..., None]).astype(jnp.int32),
                          axis=-1)
            sat.append((cnt >= k).astype(jnp.int32))
        # The passes are disjoint and MSB-first, so bits [s, s+R) of
        # ``cand`` are still zero: t is strictly increasing in v, hence
        # count(bits >= t) is non-increasing in v and the best extension
        # is simply the number of satisfied ones.
        best = sum(sat)
        cand = cand | (best << s)
    return cand


def topk_mask(af, k, radix_bits=4):
    """Boolean mask of the ``k`` largest elements along the last axis.

    Exactly ``lax.top_k``'s selection (value-descending, ties broken by
    ascending index) — equivalently ``pairwise-rank < k`` — without a
    sort and without the ``(gs, gs)`` pairwise broadcast.

    ``af``: ``(..., gs)`` non-negative finite floats (bf16/f16 inputs are
    compared via their exact f32 lift). ``k``: static python int,
    ``1 <= k <= gs``. Returns bool ``(..., gs)``.
    """
    if not 1 <= k <= af.shape[-1]:
        raise ValueError(f"k={k} out of range for gs={af.shape[-1]}")
    if not 1 <= radix_bits <= 8:
        raise ValueError(f"radix_bits={radix_bits} must be in [1, 8]")
    af32 = af.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(af32, jnp.int32)
    thr_bits = _threshold_bits(bits, k, radix_bits)
    thr = jax.lax.bitcast_convert_type(thr_bits, jnp.float32)[..., None]
    gt = af32 > thr
    eq = af32 == thr
    # Among ties at exactly the threshold value, the first
    # (k - #greater) by index are selected — the stable tie-break.
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=-1, keepdims=True)
    eq_i = eq.astype(jnp.int32)
    tie_pos = jnp.cumsum(eq_i, axis=-1) - eq_i       # exclusive cumcount
    return gt | (eq & (tie_pos < k - n_gt))
