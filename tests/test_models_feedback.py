import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import DRFNet, DRFSISRNet, SRFBNet, count_params


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_srfbn_shapes(factor):
    net = SRFBNet(in_channels=1, out_channels=1, num_steps=3, num_features=8,
                  num_groups=2, upscale_factor=factor)
    x = jnp.zeros((2, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (3, 2, 8 * factor, 8 * factor, 1)


def test_srfbn_steps_share_params():
    # Params must not scale with num_steps (weight sharing across the scan).
    def n_params(steps):
        net = SRFBNet(in_channels=1, out_channels=1, num_steps=steps,
                      num_features=8, num_groups=2, upscale_factor=2)
        return count_params(net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1))))

    assert n_params(2) == n_params(5)


def test_srfbn_steps_differ():
    # Hidden-state feedback must make later steps differ from step 0.
    net = SRFBNet(in_channels=1, out_channels=1, num_steps=3, num_features=8,
                  num_groups=2, upscale_factor=2)
    x = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    out = np.asarray(net.apply(params, x))
    assert not np.allclose(out[0], out[1])


def test_drf_sisr_shapes():
    net = DRFSISRNet(in_channels=1, out_channels=1, num_steps=2, num_features=8,
                     num_groups=2, upscale_factor=2)
    x = jnp.zeros((1, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(params, x).shape == (2, 1, 16, 16, 1)


def test_drfnet_video_shapes():
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=2,
                 upscale_factor=2)
    x = jnp.zeros((2, 5, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 5, 16, 16, 1)


def test_drfnet_recurrence_carries_state():
    # Same frame content but different positions in the sequence should give
    # different outputs after frame 0 (hidden state carries).
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=2,
                 upscale_factor=2)
    rng = np.random.default_rng(0)
    f0 = rng.random((1, 1, 8, 8, 1)).astype(np.float32)
    f1 = rng.random((1, 1, 8, 8, 1)).astype(np.float32)
    seq = jnp.asarray(np.concatenate([f0, f1, f0], axis=1))
    params = net.init(jax.random.PRNGKey(0), seq)
    out = np.asarray(net.apply(params, seq))
    # Frame 2 has the same input as frame 0 but different hidden state.
    assert not np.allclose(out[0, 0], out[0, 2], atol=1e-6)


def test_drfnet_grad_flows():
    net = DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                 upscale_factor=2)
    x = jnp.ones((1, 3, 6, 6, 1))
    y = jnp.ones((1, 3, 12, 12, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((net.apply(p, x) - y) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_srfbn_jit():
    net = SRFBNet(in_channels=1, out_channels=1, num_steps=2, num_features=4,
                  num_groups=1, upscale_factor=2)
    x = jnp.zeros((1, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, x: net.apply(p, x))(params, x)
    assert out.shape == (2, 1, 16, 16, 1)


def test_scan_unroll_is_exact():
    """``unroll``/``split_transpose`` are lowering knobs, not math: fully
    unrolled scans must reproduce the scan outputs AND gradients bitwise
    (the training A/B in scripts/probe_drf_train_scan.py relies on this).
    Covers every scan family that exposes the knob."""
    from vsr_tpu.models import FRVSRNet, Volume4DSRNet

    x_img = jnp.array(np.random.default_rng(0).random((2, 12, 12, 1)),
                      jnp.float32)
    x_vid = jnp.array(np.random.default_rng(1).random((2, 4, 12, 12, 1)),
                      jnp.float32)
    x_vol = jnp.array(np.random.default_rng(2).random((1, 4, 3, 12, 12, 1)),
                      jnp.float32)
    # (cls, kwargs, knobs, x, grad_rtol) - the 3D-conv net's backward
    # re-associates reductions under unroll (fp32 noise ~1e-4 relative);
    # the 2D nets hold 1e-5.
    cases = [
        (Volume4DSRNet, dict(in_channels=1, out_channels=1, num_features=8,
                             num_resblocks=1, upscale_factor=2),
         dict(unroll=4), x_vol, 5e-4),
        (SRFBNet, dict(in_channels=1, out_channels=1, num_steps=3,
                       num_features=8, num_groups=2, upscale_factor=2),
         dict(unroll=3), x_img, 1e-5),
        (DRFSISRNet, dict(in_channels=1, out_channels=1, num_steps=3,
                          num_features=8, num_groups=2, upscale_factor=2),
         dict(unroll=3), x_img, 1e-5),
        (DRFNet, dict(in_channels=1, out_channels=1, num_features=8,
                      num_groups=2, upscale_factor=2),
         dict(unroll=4, split_transpose=True), x_vid, 1e-5),
        (FRVSRNet, dict(in_channels=1, out_channels=1, upscale_factor=2,
                        num_resblocks=2, is_prediction=True),
         dict(unroll=4), x_vid, 1e-5),
    ]
    for cls, kw, knobs, x, grad_rtol in cases:
        base = cls(**kw)
        params = base.init(jax.random.PRNGKey(0), x)
        alt = cls(**kw, **knobs)

        def loss(net):
            return lambda p: jnp.sum(jnp.asarray(net.apply(p, x)) ** 2)

        np.testing.assert_array_equal(
            np.asarray(base.apply(params, x)),
            np.asarray(alt.apply(params, x)), err_msg=cls.__name__)
        g0 = jax.grad(loss(base))(params)
        g1 = jax.grad(loss(alt))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=grad_rtol, atol=1e-6,
                                       err_msg=cls.__name__)
