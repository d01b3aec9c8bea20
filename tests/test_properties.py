"""Property-based tests (hypothesis) for the exactness-critical kernels:
the shuffle-fold identity, T-bucketing, int8 quantization bounds, and the
pixel-shuffle/space-to-depth inverse pair — randomized shapes instead of the
fixed cases in the unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from vsr_tpu.ops.fused_tail import conv_through_shuffle
from vsr_tpu.ops.pixel_shuffle import pixel_shuffle, space_to_depth
from vsr_tpu.quantize import dequantize_params, quantize_params
from vsr_tpu.utils.bucketing import bucket_length, pad_time_edge, time_mask

_SETTINGS = dict(max_examples=20, deadline=None)


@settings(**_SETTINGS)
@given(
    r=st.integers(2, 4),
    cin=st.integers(1, 6),
    cout=st.integers(1, 4),
    h=st.integers(3, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_fold_identity_property(r, cin, cout, h, seed):
    rng = np.random.default_rng(seed)
    pre = jnp.asarray(rng.standard_normal((1, h, h, cin * r * r)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = jax.lax.conv_general_dilated(
            pixel_shuffle(pre, r), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        out = conv_through_shuffle(pre, w, b, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@settings(**_SETTINGS)
@given(
    r=st.integers(2, 5),
    c=st.integers(1, 5),
    h=st.integers(1, 5),
    w=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
def test_shuffle_inverse_property(r, c, h, w, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, h, w, c * r * r)).astype(np.float32)
    y = np.asarray(space_to_depth(pixel_shuffle(jnp.asarray(x), r), r))
    np.testing.assert_array_equal(x, y)


@settings(**_SETTINGS)
@given(
    t=st.integers(1, 40),
    g=st.integers(0, 12),
)
def test_bucketing_properties(t, g):
    tb = bucket_length(t, g)
    assert tb >= t
    if g > 1:
        assert tb % g == 0 and tb - t < g
    else:
        assert tb == t
    a = np.arange(2 * t * 3, dtype=np.float32).reshape(2, t, 3)
    p = pad_time_edge(a, tb)
    assert p.shape[1] == tb
    np.testing.assert_array_equal(p[:, :t], a)
    if tb > t:
        np.testing.assert_array_equal(p[:, t:], np.repeat(a[:, -1:], tb - t, 1))
    m = time_mask(t, tb)
    assert m.sum() == t and (m[:t] == 1).all()


@settings(**_SETTINGS)
@given(
    shape=st.tuples(st.integers(1, 4), st.integers(1, 4),
                    st.integers(1, 6), st.integers(1, 6)),
    scale=st.floats(1e-3, 1e3),
    seed=st.integers(0, 2**31 - 1),
)
def test_quantize_error_bound_property(shape, scale, seed):
    rng = np.random.default_rng(seed)
    params = {"layer": {"kernel": (rng.standard_normal(shape) * scale).astype(np.float32),
                        "bias": rng.standard_normal(shape[-1:]).astype(np.float32)}}
    q, s = quantize_params(params)
    deq = dequantize_params(q, s)
    w, wq = params["layer"]["kernel"], np.asarray(deq["layer"]["kernel"])
    # per-output-channel symmetric: |err| <= channel_amax / 254 (+ fp eps)
    amax = np.abs(w).max(axis=tuple(range(w.ndim - 1)), keepdims=True)
    assert (np.abs(w - wq) <= amax / 127.0 * 0.5 + 1e-6 * scale + 1e-12).all()
    np.testing.assert_array_equal(params["layer"]["bias"], np.asarray(deq["layer"]["bias"]))
