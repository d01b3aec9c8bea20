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


@settings(**_SETTINGS)
@given(
    k=st.sampled_from([1, 3]),
    stride=st.integers(1, 2),
    dilation=st.integers(1, 2),
    dg=st.sampled_from([1, 2]),
    cg=st.integers(1, 3),
    cout=st.integers(1, 4),
    h=st.integers(4, 8),
    w=st.integers(4, 8),
    amp=st.floats(0.0, 6.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_deform_conv_sampler_paths_property(k, stride, dilation, dg, cg,
                                            cout, h, w, amp, seed):
    """The hat-matmul and 4-corner-gather samplers are the same math for
    ANY geometry: values and offset grads agree (incl. far out-of-bounds
    offsets, stride/dilation/groups)."""
    from vsr_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.default_rng(seed)
    cin = dg * cg
    pad = k // 2
    ho = (h + 2 * pad - (dilation * (k - 1) + 1)) // stride + 1
    wo = (w + 2 * pad - (dilation * (k - 1) + 1)) // stride + 1
    if ho < 1 or wo < 1:
        return
    x = jnp.asarray(rng.random((1, h, w, cin)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.3, jnp.float32)
    # Offsets on an exact 1/64 binary grid: coordinates land either exactly
    # on integers or >= 1/64 away. Within one f32 ulp of an integer the two
    # samplers legitimately differ (hypothesis found amp=2e-16: gx - j
    # rounds to exactly -1.0, a different — equally valid — subgradient
    # rounding choice than floor's).
    off = np.round((rng.random((1, ho, wo, dg, k * k, 2)) - 0.5) * amp * 64)
    off = jnp.asarray(off / 64.0, jnp.float32)

    def run(method):
        def loss(o):
            out = deform_conv2d(x, o, wt, stride=stride, padding=pad,
                                dilation=dilation, method=method)
            return jnp.sum(out ** 2), out
        (_, out), g = jax.value_and_grad(loss, has_aux=True)(off)
        return np.asarray(out), np.asarray(g)

    with jax.default_matmul_precision("float32"):
        out_g, grad_g = run("gather")
        out_m, grad_m = run("matmul")
    np.testing.assert_allclose(out_m, out_g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(grad_m, grad_g, rtol=1e-3, atol=1e-3)


@settings(**_SETTINGS)
@given(
    c=st.integers(1, 3),
    h=st.integers(3, 9),
    w=st.integers(3, 9),
    ho=st.integers(1, 6),
    wo=st.integers(1, 6),
    spread=st.floats(0.5, 3.0),
    mode=st.sampled_from(["zeros", "border"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_warp_sampler_paths_property(c, h, w, ho, wo, spread, mode, seed):
    """grid_sample_bilinear matmul vs gather agree in value and grid grad
    for random grids (including out-of-bounds) in both padding modes."""
    from vsr_tpu.ops.warp import grid_sample_bilinear

    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((2, h, w, c)), jnp.float32)
    # 1/64-grid coordinates: see the deform-conv property for why sub-ulp
    # distances from integers are excluded.
    gy = np.round((rng.random((2, ho, wo)) - 0.3) * spread * h * 64) / 64.0
    gx = np.round((rng.random((2, ho, wo)) - 0.3) * spread * w * 64) / 64.0
    gy = jnp.asarray(gy, jnp.float32)
    gx = jnp.asarray(gx, jnp.float32)

    def run(method):
        def loss(g):
            out = grid_sample_bilinear(img, g, gx, padding_mode=mode,
                                       method=method)
            return jnp.sum(out ** 2), out
        (_, out), grad = jax.value_and_grad(loss, has_aux=True)(gy)
        return np.asarray(out), np.asarray(grad)

    with jax.default_matmul_precision("float32"):
        out_g, grad_g = run("gather")
        out_m, grad_m = run("matmul")
    np.testing.assert_allclose(out_m, out_g, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(grad_m, grad_g, rtol=1e-4, atol=1e-4)
