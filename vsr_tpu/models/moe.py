"""Mixture-of-Experts SR: expert-choice routed channel-FFN blocks on the
EDSR trunk.

The reference framework has no MoE (its widest knob is ``num_features``,
``/root/reference/src/model/nets/edsr_net.py:19``); this is the
framework's conditional-compute scaling path — parameter count grows with
``num_experts`` while per-token FLOPs stay constant — and the carrier for
the ``'expert'`` mesh axis (:mod:`vsr_tpu.parallel.ep`).

TPU-first design decisions:

- **Expert-choice routing** (experts pick their top-``capacity`` tokens)
  instead of token-choice top-k: perfectly balanced by construction, so no
  auxiliary load-balancing loss has to thread through the trainers, no
  token overflow/dropping semantics, and every shape is static — exactly
  what XLA wants. SR is non-causal (all tokens of an image exist at once),
  which is the regime expert choice was designed for.
- **Dense one-hot dispatch/combine einsums**, not gathers: the repo-wide
  lesson (BENCH.md hat-matmul samplers) is that the MXU beats the TPU
  gather unit by orders of magnitude on narrow-row indexed access; the
  GShard-style dispatch matmul is the canonical formulation.
- **Rank-based top-k** (``router_impl="rank"``, the default): TPU sorts
  run at ~8 GB/s and ``lax.top_k`` measured 47% of MoE serving device
  time (scripts/profile_net_serving.py). Each token's descending rank is
  a pairwise-comparison reduction instead (VPU compares, no sort), with
  ``lax.top_k``'s stable tie-break reproduced exactly — the two routers
  are bitwise equal (tests/test_expert_parallel.py) and ``"sort"`` is
  kept for A/B.
- **Radix threshold selection** (``router_impl="radix"``, dense dispatch
  only): when only the selection MASK is needed, the pairwise rank's
  ``(gs, gs)`` broadcast can be replaced by a radix search on the
  affinity bit pattern for the ``cap``-th largest value plus one
  stable-tie pass (:mod:`vsr_tpu.ops.select`) — ``O(passes*gs)``
  traffic, selection bitwise equal to the rank router's. MEASURED
  NEGATIVE on chip (probe_moe_dispatch.py: radix1 0.89x, radix4 0.55x,
  radix8 0.12x of rank/dense) — the rank is one fused reduction while
  the radix passes are ~32 serially dependent ones; kept as a tested
  opt-in for shapes with much larger ``gs``.
- **Per-image token groups** (``group_size`` tokens routed independently):
  keeps the one-hot dispatch tensor small (N*T*group_size*cf elements,
  independent of E) and — because groups never span images — makes every
  image's output invariant to its batch mates.
- Experts are one batched ``(E, d, h)`` einsum pair, so the ``'expert'``
  mesh axis shards the leading dim — 1/N of the experts held AND computed
  per device, with the combine all-reduced over the axis (the compiled
  schedule; see ``parallel/ep.py``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.models.common import Conv, ShuffleConv
from vsr_tpu.models.edsr import _ResBlock, _UpBlock
from vsr_tpu.parallel.ep import constrain_expert_dim
from vsr_tpu.registry import register


def _expert_init(in_axis: int):
    """LeCun-normal over the per-expert fan-in (leading dim is the expert
    stack, not a fan axis)."""
    return nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal",
        in_axis=in_axis, out_axis=-1, batch_axis=(0,))


class ExpertChoiceMoE(nn.Module):
    """Expert-choice routed per-token (per-pixel) FFN, residual.

    ``x``: ``(N, H, W, C)`` feature map. Each image's ``H*W`` tokens are
    split into groups of ``group_size``; within a group every expert
    selects its ``capacity = group_size * capacity_factor / num_experts``
    highest-affinity tokens and applies its 2-layer FFN to them; selected
    tokens receive the affinity-weighted expert output as a residual
    update (tokens no expert picked pass through unchanged). Token counts
    that don't divide ``group_size`` (arbitrary serving geometries) are
    padded with masked zero-affinity tokens — exactly the unpadded
    program when they do divide.

    Parameter names: the ``expert_*`` prefix marks the expert-stacked
    leaves for :mod:`vsr_tpu.parallel.ep`'s sharding rule.
    """

    num_experts: int
    capacity_factor: float = 1.25
    hidden_mult: int = 2
    group_size: int = 256
    router_impl: str = "rank"
    dispatch_impl: str = "sparse"
    radix_bits: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, h, w, d = x.shape
        t = h * w
        gs = min(self.group_size, t)
        # Token counts that don't divide into groups (arbitrary serving
        # geometries) are padded up with masked tokens: zero affinity
        # everywhere, so experts prefer every real token, and a padded
        # token that is picked anyway contributes with gate 0. Exactly
        # the unpadded program when t % gs == 0.
        pad = (-t) % gs
        e = self.num_experts
        cap = max(1, int(gs * self.capacity_factor / e))
        cap = min(cap, gs)
        hid = self.hidden_mult * d

        impls = {"router": (self.router_impl, ("rank", "rank_pallas",
                                               "radix", "sort")),
                 "dispatch": (self.dispatch_impl,
                              ("sparse", "dense", "dense_nhwc"))}
        for knob, (value, legal) in impls.items():
            if value not in legal:
                raise ValueError(
                    f"Unknown {knob}_impl {value!r}; legal: {legal} "
                    "(typos must fail here, not silently fall back)")
        if self.router_impl == "radix" and self.dispatch_impl == "sparse":
            raise ValueError(
                "router_impl='radix' produces a selection mask only (no "
                "rank, no capacity slots) — it requires "
                "dispatch_impl='dense'/'dense_nhwc'")
        if self.dispatch_impl == "dense_nhwc" and self.router_impl == "sort":
            raise ValueError(
                "dispatch_impl='dense_nhwc' routes by selection mask and "
                "needs router_impl='rank'/'rank_pallas'/'radix' (the sort "
                "router produces capacity slots, not per-token masks)")

        # Plain LeCun for the (d, e) router — _expert_init's batch_axis=(0,)
        # is only correct for the (e, ...) expert stacks (on (d, e) it
        # overlaps the fan-in axis, collapsing fan_in to 1 and initializing
        # ~sqrt(d)x too large, which saturates the routing softmax).
        router = self.param("router", nn.initializers.lecun_normal(),
                            (d, e), self.dtype or jnp.float32)
        wi = self.param("expert_wi", _expert_init(in_axis=-2), (e, d, hid),
                        self.dtype or jnp.float32)
        bi = self.param("expert_bi", nn.initializers.zeros, (e, hid),
                        self.dtype or jnp.float32)
        wo = self.param("expert_wo", _expert_init(in_axis=-2), (e, hid, d),
                        self.dtype or jnp.float32)
        bo = self.param("expert_bo", nn.initializers.zeros, (e, d),
                        self.dtype or jnp.float32)

        # Params joined to the ACTIVATION dtype at use, not only at init:
        # a checkpoint restore keeps the stored f32 leaves, and
        # jnp.einsum(bf16, f32) would silently promote the whole expert
        # FFN to f32 (the round-2 bf16 dtype-leak class).
        cd = x.dtype
        wi, bi, wo, bo = (p.astype(cd) for p in (wi, bi, wo, bo))

        def _route(af):
            """(G, e, gs) affinities -> (rank, sel): each token's
            descending rank per expert (or None for mask-only routers)
            and the top-cap selection mask (or None when only rank was
            computed). Both reproduce ``lax.top_k``'s selection set with
            its stable tie-break (earlier index wins)."""
            rank = sel = None
            if self.router_impl == "radix":
                # ops/select.py: radix threshold search — the cap-th
                # largest affinity found by binary search on the float
                # bit pattern, then one stable-tie pass. Selection-only;
                # measured slower than "rank" at gs=256 (module doc).
                from vsr_tpu.ops.select import topk_mask

                sel = topk_mask(jax.lax.stop_gradient(af), cap,
                                radix_bits=self.radix_bits)
            if self.router_impl == "rank_pallas":
                # ops/rank.py: the same pairwise-comparison rank as
                # "rank" below, but VMEM-resident in a Pallas kernel —
                # the (gs, gs) broadcast the XLA reduction materializes
                # never exists. Bitwise-identical selection; falls back
                # to the XLA path when gs doesn't fill whole 128-lane
                # registers.
                from vsr_tpu.ops.rank import (pairwise_rank,
                                              supports_pallas_rank)

                if supports_pallas_rank(gs):
                    # stop_gradient: pallas_call has no autodiff rule;
                    # the rank is integer (zero tangent) so cutting the
                    # edge is exact — gradients flow through the gate
                    # values only.
                    rank = pairwise_rank(
                        jax.lax.stop_gradient(af),
                        interpret=jax.default_backend() != "tpu")
            if rank is None and self.router_impl in ("rank",
                                                     "rank_pallas"):
                # TPU sorts run at ~8 GB/s and lax.top_k was 47% of MoE
                # serving device time (scripts/profile_net_serving.py).
                # The descending rank of each token is a pairwise-
                # comparison reduction instead — VPU compares, no sort —
                # with the same stable tie-break as top_k (earlier index
                # wins), so the selection AND slot order are identical
                # to the sort path.
                a_i = af[..., :, None]                      # (G, e, gs, 1)
                a_j = af[..., None, :]                      # (G, e, 1, gs)
                j_lt_i = (jnp.arange(gs)[None, :]
                          < jnp.arange(gs)[:, None])        # [i, j]: j < i
                rank = jnp.sum(
                    ((a_j > a_i)
                     | ((a_j == a_i) & j_lt_i)).astype(jnp.int32),
                    axis=-1)                                # (G, e, gs)
            return rank, sel

        # ---- routing (shared by every dispatch path) -------------------
        # Per-token affinity in f32 (softmax stability under bf16 nets).
        # The router contraction is an independent per-token dot, so it is
        # computed ONCE on the flat (n, t, d) tokens; padded slots get
        # zero affinity for every expert — real tokens always win the
        # top-cap, and a selected pad slot occupies capacity with gate 0.
        logits = jnp.einsum("ntd,de->nte",
                            x.reshape(n, t, d).astype(jnp.float32),
                            router.astype(jnp.float32))
        affinity_t = jax.nn.softmax(logits, axis=-1)        # (n, t, e)
        aff_full = affinity_t
        if pad:
            aff_full = jnp.concatenate(
                [aff_full, jnp.zeros((n, pad, e), aff_full.dtype)], axis=1)
        af = jnp.swapaxes(
            aff_full.reshape(n * (t + pad) // gs, gs, e), 1, 2)  # (G, e, gs)
        rank, sel = _route(af)

        if self.dispatch_impl == "dense_nhwc":
            # Image-layout dense dispatch (opt-in; measured 0.67x on
            # chip — see BENCH.md round 3). Motivation: the MoE trace
            # showed 17.6% of device time in layout copies of the
            # (N, H, W, C) activation between the conv layout and the
            # token-group einsum layout, so here the heavy tensors never
            # leave conv-land — the expert FFN is a 1x1 conv to all
            # experts' hiddens plus a feature-grouped 1x1 conv back
            # (group g = expert g, block-diagonal == the per-expert wo
            # einsum) — and only the e-channel affinity crosses into
            # group-land for the top-cap mask. On the v5e the
            # feature-grouped conv lowering loses more than the layout
            # copies cost (each group's 64-wide output underfills the
            # 128-lane MXU tile), so 'dense' stays the serving preset.
            # Same params, same selection, outputs equal to "dense"
            # (tests pin it).
            if sel is None:
                sel = rank < cap
            sel = jnp.swapaxes(sel, 1, 2).reshape(n, t + pad, e)
            sel = sel[:, :t].reshape(n, h, w, e)
            gate = jnp.where(sel, affinity_t.reshape(n, h, w, e),
                             0).astype(cd)                  # (n, h, w, e)
            dn = ("NHWC", "HWIO", "NHWC")
            # (1, 1, d, e*hid): out channel g*hid+i contracts wi[g, :, i].
            k_in = jnp.transpose(wi, (1, 0, 2)).reshape(1, 1, d, e * hid)
            hdn = jax.lax.conv_general_dilated(
                x, k_in, (1, 1), "VALID", dimension_numbers=dn)
            hdn = nn.relu(hdn + bi.reshape(e * hid))
            # Feature-grouped 1x1: group g maps hidden block g through
            # wo[g] — kernel[0, 0, i, g*d + j] = wo[g, i, j].
            k_out = jnp.transpose(wo, (1, 0, 2)).reshape(1, 1, hid, e * d)
            out = jax.lax.conv_general_dilated(
                hdn, k_out, (1, 1), "VALID", dimension_numbers=dn,
                feature_group_count=e)
            out = (out + bo.reshape(e * d)).reshape(n, h, w, e, d)
            combined = jnp.einsum("nxyed,nxye->nxyd", out, gate)
            return x + combined.astype(x.dtype)

        tokens = x.reshape(n, t, d)
        if pad:
            tokens = jnp.concatenate(
                [tokens, jnp.zeros((n, pad, d), tokens.dtype)], axis=1)
        tokens = tokens.reshape(n * (t + pad) // gs, gs, d)  # (G, gs, d)

        if self.dispatch_impl == "dense":
            # Dense dispatch: every expert's FFN runs on every token and
            # the gated selection mask combines — no one-hot tensors, no
            # capacity slots (rank is selection-only). At small E the
            # extra FFN FLOPs roughly equal the dispatch/combine einsum
            # FLOPs they replace, and the (G, e, cap, gs) one-hot traffic
            # disappears. Selected tokens' outputs are bitwise the sparse
            # path's (same per-token contractions, same e-order combine).
            if rank is None and sel is None:
                raise ValueError(
                    "dispatch_impl='dense' routes by selection mask and "
                    "needs router_impl='rank'/'rank_pallas'/'radix' (the "
                    "sort router produces capacity slots, not per-token "
                    "ranks)")
            if sel is None:
                sel = rank < cap
            gate_t = jnp.where(sel, af, 0).astype(tokens.dtype)
            hdn = jnp.einsum("gtd,edh->geth", tokens, wi) + bi[:, None, :]
            hdn = constrain_expert_dim(nn.relu(hdn), 1)
            out = (jnp.einsum("geth,ehd->getd", hdn, wo)
                   + bo[:, None, :])
            out = constrain_expert_dim(out, 1)
            combined = jnp.einsum("getd,get->gtd", out, gate_t)
        else:
            if rank is not None:
                # one_hot maps rank >= cap (unselected) to all-zero rows.
                dispatch = jax.nn.one_hot(rank, cap, dtype=tokens.dtype)
                gate = jnp.einsum("getc,get->gec", dispatch,
                                  af.astype(tokens.dtype))
            else:
                gate, idx = jax.lax.top_k(af, cap)          # (G, e, cap)
                dispatch = jnp.swapaxes(
                    jax.nn.one_hot(idx, gs, dtype=tokens.dtype), -1, -2)
                gate = gate.astype(tokens.dtype)
            xin = jnp.einsum("getc,gtd->gecd", dispatch, tokens)
            xin = constrain_expert_dim(xin, 1)              # EP: a2a in
            hdn = jnp.einsum("gecd,edh->gech", xin, wi) + bi[None, :, None, :]
            hdn = constrain_expert_dim(nn.relu(hdn), 1)
            out = jnp.einsum("gech,ehd->gecd", hdn, wo) + bo[None, :, None, :]
            out = constrain_expert_dim(out, 1)
            out = out * gate[..., None].astype(out.dtype)   # affinity-weighted
            combined = jnp.einsum("getc,gecd->gtd", dispatch, out)  # a2a back
        combined = combined.reshape(n, t + pad, d)[:, :t]
        return x + combined.reshape(n, h, w, d).astype(x.dtype)


@register("net")
class MoEEDSRNet(nn.Module):
    """EDSR trunk with an :class:`ExpertChoiceMoE` block after every
    ``moe_every``-th residual block.

    Args up to ``res_scale`` mirror :class:`vsr_tpu.models.edsr.EDSRNet`
    (reference ``edsr_net.py:19``); the MoE knobs are new capability. With
    ``num_experts=1`` the routing still runs (capacity permitting, every
    token through the single expert) — use plain ``EDSRNet`` when no
    conditional compute is wanted.
    """

    in_channels: int
    out_channels: int
    num_resblocks: int
    num_features: int
    upscale_factor: int
    res_scale: float = 0.1
    num_experts: int = 4
    capacity_factor: float = 1.25
    hidden_mult: int = 2
    group_size: int = 256
    moe_every: int = 2
    router_impl: str = "rank"
    dispatch_impl: str = "sparse"
    radix_bits: int = 4
    fused_tail: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        head = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(x)
        body = head
        for i in range(self.num_resblocks):
            body = _ResBlock(self.num_features, self.res_scale,
                             dtype=self.dtype)(body)
            if (i + 1) % self.moe_every == 0:
                body = ExpertChoiceMoE(
                    num_experts=self.num_experts,
                    capacity_factor=self.capacity_factor,
                    hidden_mult=self.hidden_mult,
                    group_size=self.group_size,
                    router_impl=self.router_impl,
                    dispatch_impl=self.dispatch_impl,
                    radix_bits=self.radix_bits,
                    dtype=self.dtype,
                )(body)
        body = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(body)
        body = body + head
        pre = _UpBlock(self.num_features, self.upscale_factor,
                       dtype=self.dtype)(body)
        return ShuffleConv(self.out_channels, 3,
                           factor=_UpBlock.split(self.upscale_factor),
                           fused=self.fused_tail, dtype=self.dtype)(pre)
