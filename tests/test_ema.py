"""EMA param tracking (``trainer.kwargs.ema_decay`` / ``infer --ema``).

Beyond-parity production-training feature (the reference has no EMA,
SURVEY.md §2.7): optim.with_param_ema keeps ``ema <- d*ema + (1-d)*params``
inside the optimizer state, so it is device-resident, checkpointed with
opt_state, and extractable for serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import (Adam, get_ema_params, get_learning_rate,
                           set_learning_rate, with_param_ema)
from vsr_tpu.runner.trainers import AcdcSISRTrainer


def test_transform_matches_manual_recursion():
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    tx = with_param_ema(Adam(lr=1e-2), 0.9)
    state = tx.init(params)
    ema_ref = jax.tree_util.tree_map(lambda p: np.asarray(p), params)
    rng = np.random.default_rng(0)
    for _ in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32),
            params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        ema_ref = jax.tree_util.tree_map(
            lambda e, p: 0.9 * e + 0.1 * np.asarray(p), ema_ref, params)
    for a, b in zip(jax.tree_util.tree_leaves(get_ema_params(state)),
                    jax.tree_util.tree_leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)


def test_lr_accessors_traverse_the_wrapper():
    params = {"w": jnp.ones((3,))}
    tx = with_param_ema(Adam(lr=1e-2), 0.99)
    state = tx.init(params)
    assert get_learning_rate(state) == pytest.approx(1e-2)
    set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)


def test_bad_decay_and_missing_ema():
    with pytest.raises(ValueError, match="decay"):
        with_param_ema(Adam(lr=1e-3), 1.0)
    with pytest.raises(ValueError, match="no param EMA"):
        get_ema_params(Adam(lr=1e-3).init({"w": jnp.ones(2)}))


def _net():
    return EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                   num_features=8, upscale_factor=2)


def _trainer(**kw):
    return AcdcSISRTrainer(
        train_dataloader=None, valid_dataloader=None, net=_net(),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-2), lr_scheduler=None, logger=None,
        monitor=None, num_epochs=1, **kw)


def _batch(n=4):
    rng = np.random.default_rng(1)
    return {
        "lr_img": rng.standard_normal((n, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((n, 16, 16, 1)).astype(np.float32),
        "index": np.arange(n),
    }


def test_trainer_tracks_and_serves_ema(tmp_path):
    trainer = _trainer(ema_decay=0.9)
    batch = _batch()
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    p0 = jax.tree_util.tree_map(np.asarray, trainer.params["params"])
    for _ in range(3):
        trainer.params, trainer.opt_state, _, _ = trainer._train_step(
            trainer.params, trainer.opt_state, inputs, targets,
            training=True)
    ema = get_ema_params(trainer.opt_state)
    live = trainer.params["params"]
    # EMA lags the live params: closer to the init than the live tree is.
    l_live = jax.tree_util.tree_leaves(live)
    l_ema = jax.tree_util.tree_leaves(ema)
    l_p0 = jax.tree_util.tree_leaves(p0)
    d_live = sum(float(jnp.abs(a - b).sum()) for a, b in zip(l_live, l_p0))
    d_ema = sum(float(jnp.abs(a - b).sum()) for a, b in zip(l_ema, l_p0))
    assert 0 < d_ema < d_live

    # Checkpoint -> infer --ema serving path extracts exactly that tree.
    trainer.monitor = type("M", (), {"state_dict": lambda self: {}})()
    trainer.save(tmp_path / "model.ckpt")
    from vsr_tpu.infer import build_serving_net

    _, served, _ = build_serving_net(
        "EDSRNet", dict(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=8, upscale_factor=2),
        str(tmp_path / "model.ckpt"), lr_hw=(8, 8), ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(served["params"]), l_ema):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # Without --ema the same checkpoint serves the live params.
    _, served_live, _ = build_serving_net(
        "EDSRNet", dict(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=8, upscale_factor=2),
        str(tmp_path / "model.ckpt"), lr_hw=(8, 8))
    for a, b in zip(jax.tree_util.tree_leaves(served_live["params"]), l_live):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ema_checkpoint_found_under_grad_clip_chain(tmp_path):
    # grad_clip wraps the EMA'd optimizer in optax.chain, which serializes
    # the opt_state as {'0': clip, '1': ema-wrapper} — infer --ema must
    # find the EMA tree through that nesting too.
    trainer = _trainer(ema_decay=0.9, grad_clip=1.0)
    batch = _batch()
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    trainer.params, trainer.opt_state, _, _ = trainer._train_step(
        trainer.params, trainer.opt_state, inputs, targets, training=True)
    ema = get_ema_params(trainer.opt_state)
    trainer.monitor = type("M", (), {"state_dict": lambda self: {}})()
    trainer.save(tmp_path / "model.ckpt")
    from vsr_tpu.infer import build_serving_net

    _, served, _ = build_serving_net(
        "EDSRNet", dict(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=8, upscale_factor=2),
        str(tmp_path / "model.ckpt"), lr_hw=(8, 8), ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(served["params"]),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ema_missing_in_checkpoint_raises(tmp_path):
    trainer = _trainer()  # no ema_decay
    batch = _batch()
    inputs, _t = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    trainer.monitor = type("M", (), {"state_dict": lambda self: {}})()
    trainer.save(tmp_path / "model.ckpt")
    from vsr_tpu.infer import build_serving_net

    with pytest.raises(ValueError, match="no EMA"):
        build_serving_net(
            "EDSRNet", dict(in_channels=1, out_channels=1, num_resblocks=1,
                            num_features=8, upscale_factor=2),
            str(tmp_path / "model.ckpt"), lr_hw=(8, 8), ema=True)


def test_ema_composes_with_grad_accumulation():
    # EMA is wrapped INSIDE optax.MultiSteps: the k-1 non-emit micro-steps
    # must NOT advance it, so after k micro-steps (= ONE applied update)
    # the EMA has taken exactly one step: d*init + (1-d)*new_params.
    d = 0.99
    trainer = _trainer(ema_decay=d, grad_accumulation=2)
    batch = _batch()
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    assert get_learning_rate(trainer.opt_state) == pytest.approx(1e-2)
    init_params = jax.tree_util.tree_map(np.asarray,
                                         trainer.params["params"])
    for _ in range(2):
        trainer.params, trainer.opt_state, scalars, _ = trainer._train_step(
            trainer.params, trainer.opt_state, inputs, targets,
            training=True)
    assert np.isfinite(float(next(iter(scalars.values()))))
    ema = get_ema_params(trainer.opt_state)
    for e, p0, p1 in zip(jax.tree_util.tree_leaves(ema),
                         jax.tree_util.tree_leaves(init_params),
                         jax.tree_util.tree_leaves(
                             trainer.params["params"])):
        np.testing.assert_allclose(
            np.asarray(e), d * p0 + (1 - d) * np.asarray(p1),
            rtol=1e-5, atol=1e-7)

    # The serving extraction walks the MultiSteps nesting in the
    # checkpoint state-dict too.
    import tempfile
    from pathlib import Path

    from vsr_tpu.infer import build_serving_net

    trainer.monitor = type("M", (), {"state_dict": lambda self: {}})()
    with tempfile.TemporaryDirectory() as td:
        trainer.save(Path(td) / "model.ckpt")
        _, served, _ = build_serving_net(
            "EDSRNet", dict(in_channels=1, out_channels=1, num_resblocks=1,
                            num_features=8, upscale_factor=2),
            str(Path(td) / "model.ckpt"), lr_hw=(8, 8), ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(served["params"]),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
