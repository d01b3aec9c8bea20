"""Quantization-aware training (vsr_tpu/quantize.py QAT section).

The fake-quant forward must agree with the deployed W8A8 integer path
(same scales, same conv geometry), its gradients must be the standard STE
(identity through round, masked by clip), and fine-tuning through it must
reduce the quantized-path loss — the property that makes QAT close the
post-training-quantization PSNR gap before export. No reference
counterpart (the reference trains/serves fp32 torch).
"""

import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.quantize import (
    calibrate_w8a8,
    fake_quant,
    kernel_size_filter,
    make_fake_quant_apply,
    make_qat_interceptor,
    make_w8a8_apply,
    resolve_qat,
)

from tests.test_quantize import _smooth_images, _train_briefly


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------- fake_quant
def test_fake_quant_forward_is_round_clip():
    x = jnp.array([-300.0, -127.6, -1.4, -0.5, 0.0, 0.49, 0.51, 126.5, 500.0])
    y = fake_quant(x, 1.0)
    expected = np.clip(np.round(np.clip(x, -127, 127)), -127, 127)
    np.testing.assert_array_equal(np.asarray(y), expected)
    # scale really scales
    y2 = fake_quant(jnp.array([0.26]), 0.5)
    np.testing.assert_allclose(np.asarray(y2), [0.5])


def test_fake_quant_ste_gradient():
    """d/dx = 1 inside the clip range (through round), 0 where clipped."""
    x = jnp.array([-200.0, -50.3, 0.2, 126.9, 140.0])
    g = jax.grad(lambda x: jnp.sum(fake_quant(x, 1.0)))(x)
    np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0])
    # gradient also scales-invariant inside the range
    g2 = jax.grad(lambda x: jnp.sum(fake_quant(x, 0.25)))(jnp.array([3.0]))
    np.testing.assert_allclose(np.asarray(g2), [1.0])


# ------------------------------------------------- forward agreement vs W8A8
def test_fake_quant_matches_w8a8_forward(rng):
    """Same scales, same conv set: the f32 fake-quant forward equals the
    s8xs8->s32 serving path to accumulation rounding."""
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params, x, _ = _train_briefly(net, rng, steps=30)
    scales = calibrate_w8a8(net, params, [x])
    assert scales  # the 16-feature body convs are eligible
    ref = jax.jit(make_w8a8_apply(net, params, act_scales=scales))(x)
    fq = jax.jit(make_fake_quant_apply(net, params, act_scales=scales))(x)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(ref),
                               atol=2e-3, rtol=0)
    # and it is NOT the plain forward (quantization really happened)
    plain = net.apply(params, x)
    assert float(jnp.max(jnp.abs(plain - ref))) > 1e-4


def test_fake_quant_dynamic_scales_match(rng):
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=16, upscale_factor=2)
    params, x, _ = _train_briefly(net, rng, steps=10)
    ref = jax.jit(make_w8a8_apply(net, params, act_scales="dynamic"))(x)
    fq = jax.jit(make_fake_quant_apply(net, params, act_scales="dynamic"))(x)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(ref),
                               atol=2e-3, rtol=0)


# ------------------------------------------------------------- QAT training
def test_qat_finetune_reduces_quantized_loss(rng):
    """Fine-tuning through the fake-quant forward reduces the loss OF THE
    QUANTIZED PATH and does not degrade the deployed W8A8 PSNR."""
    import optax

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params, x, y = _train_briefly(net, rng, steps=120)
    scales = calibrate_w8a8(net, params, [x])
    interceptor = make_qat_interceptor(act_scales=scales)

    def fq_loss(p):
        with nn.intercept_methods(interceptor):
            out = net.apply(p, x)
        return jnp.mean(jnp.abs(out - y))

    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(fq_loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    mean, std = 54.089, 48.084
    denorm = lambda a: jnp.clip(jnp.round(a * std + mean), 0, 255)

    def w8a8_psnr(p):
        out = jax.jit(make_w8a8_apply(net, p, act_scales=scales))(x)
        return float(PSNR()(denorm(out), denorm(y)))

    loss0 = float(fq_loss(params))
    ptq = w8a8_psnr(params)
    p = params
    losses = []
    for _ in range(60):
        p, opt, loss = step(p, opt)
        losses.append(float(loss))
    assert losses[-1] < loss0  # STE grads really optimize the quantized path
    qat = w8a8_psnr(p)
    assert qat >= ptq - 0.05, (ptq, qat)


def test_device_trainer_qat_smoke(rng):
    """qat=True on DeviceEpochTrainer: the in-scan step trains through the
    fake-quant forward (finite, decreasing loss; params move)."""
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    hr = _smooth_images(rng, 8, 16)
    lr = hr[:, ::2, ::2]
    trainer = DeviceEpochTrainer(
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                    num_features=16, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=Adam(lr=1e-3),
        lr_data=lr, hr_data=hr, batch_size=4, patch=8, ratio=2,
        steps_per_epoch=8, qat=True,
    )
    log1 = trainer.train_epoch()
    log4 = None
    for _ in range(3):
        log4 = trainer.train_epoch()
    assert np.isfinite(log1["Loss"])
    assert log4["Loss"] < log1["Loss"]


# -------------------------------------------------------------- resolve_qat
def test_resolve_qat_options(tmp_path):
    assert callable(resolve_qat(True))
    scales = {"body/Conv_0": 0.01}
    path = tmp_path / "scales.json"
    path.write_text(json.dumps(scales))
    assert callable(resolve_qat({"act_scales": str(path),
                                 "min_channels": 8, "kernels": [3]}))
    with pytest.raises(ValueError, match="unknown qat option"):
        resolve_qat({"min_chanels": 8})  # typo must raise


def test_kernel_size_filter(rng):
    """qat.kernels restricts fake-quant to the selected conv geometry —
    with no eligible conv quantized, the fq forward IS the plain forward."""
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=16, upscale_factor=2)
    params, x, _ = _train_briefly(net, rng, steps=5)
    # jit both sides: eager-vs-jit fusion differences are f32-rounding-level
    # but assert_array_equal demands bitwise
    plain = jax.jit(lambda x: net.apply(params, x))(x)
    none = jax.jit(make_fake_quant_apply(
        net, params, conv_filter=kernel_size_filter({6})))(x)  # no k6 convs
    np.testing.assert_array_equal(np.asarray(none), np.asarray(plain))
    some = jax.jit(make_fake_quant_apply(
        net, params, conv_filter=kernel_size_filter({3})))(x)
    assert float(jnp.max(jnp.abs(some - plain))) > 1e-5
