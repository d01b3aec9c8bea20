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
