"""FSDP / ZeRO-3 parameter+optimizer sharding (trainer ``fsdp=True``).

The reference is single-GPU (SURVEY.md §2.9); vsr_tpu shards BOTH the
params and the optimizer moments' trailing dims over the 'data' mesh axis
(parallel/gspmd.py ``fsdp_axis``) and keeps them sharded between steps —
the partitioner all-gathers each param at its use sites and reduce-scatters
grads into the shard-local update. Math must match the unsharded step; the
params/moments must actually be split and STAY split. Runs on the 8 virtual
CPU devices from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import AcdcSISRTrainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _net():
    return EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                   num_features=8, upscale_factor=2)


def _make(mesh_axes, **kw):
    return AcdcSISRTrainer(
        train_dataloader=None, valid_dataloader=None, net=_net(),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=None, num_epochs=1, mesh_axes=mesh_axes, **kw)


def _batch(n=8):
    rng = np.random.default_rng(0)
    return {
        "lr_img": rng.standard_normal((n, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((n, 16, 16, 1)).astype(np.float32),
        "index": np.arange(n),
    }


def _run(trainer, n_steps, sharded):
    batch = _batch()
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    scalars = None
    for _ in range(n_steps):
        if sharded:
            trainer.params, trainer.opt_state, scalars, _ = \
                trainer._dp_train_step(trainer.params, trainer.opt_state,
                                       inputs, targets)
        else:
            trainer.params, trainer.opt_state, scalars, _ = \
                trainer._train_step(trainer.params, trainer.opt_state,
                                    inputs, targets, training=True)
    return trainer, {k: float(v) for k, v in scalars.items()}


def test_fsdp_matches_unsharded():
    t_f, s_f = _run(_make({"data": 8}, fsdp=True), 3, sharded=True)
    t_u, s_u = _run(_make(None), 3, sharded=False)
    for k in s_u:
        np.testing.assert_allclose(s_f[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(t_f.params),
                    jax.tree_util.tree_leaves(t_u.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_fsdp_params_and_moments_actually_sharded():
    trainer, _ = _run(_make({"data": 8}, fsdp=True), 2, sharded=True)
    n_data = 8

    def count_split(tree):
        found = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
                continue
            if leaf.shape[-1] >= n_data and leaf.shape[-1] % n_data == 0:
                shard_shape = leaf.addressable_shards[0].data.shape
                assert shard_shape[-1] == leaf.shape[-1] // n_data, (
                    leaf.shape, shard_shape)
                found += 1
        return found

    # Both trees split, and they STAY split after repeated steps (the
    # returned layout is pinned to the input layout for donation).
    assert count_split(trainer.params) > 0, "no param leaf split over 'data'"
    assert count_split(trainer.opt_state) > 0, "no moment leaf split"


def test_fsdp_checkpoint_roundtrip(tmp_path):
    from vsr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    trainer, _ = _run(_make({"data": 8}, fsdp=True), 1, sharded=True)
    path = tmp_path / "model.ckpt"
    # The save path gathers sharded leaves to host transparently.
    save_checkpoint(path, {"params": trainer.params,
                           "opt_state": trainer.opt_state})
    fresh = _make({"data": 8}, fsdp=True)
    batch = _batch()
    inputs, targets = fresh._get_inputs_targets(batch)
    fresh.params = fresh.net.init(jax.random.PRNGKey(1), inputs)
    fresh.opt_state = fresh.tx.init(fresh.params["params"])
    state, _aux = load_checkpoint(path, {"params": fresh.params,
                                         "opt_state": fresh.opt_state})
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And a restored trainer can keep stepping through the sharded jit.
    fresh.params, fresh.opt_state = state["params"], state["opt_state"]
    fresh.params, fresh.opt_state, scalars, _ = fresh._dp_train_step(
        fresh.params, fresh.opt_state, inputs, targets)
    assert np.isfinite(float(next(iter(scalars.values()))))


def test_fsdp_guards():
    with pytest.raises(ValueError, match="fsdp needs"):
        _make(None, fsdp=True)
    with pytest.raises(NotImplementedError, match="redundant"):
        _make({"data": 4, "model": 2}, fsdp=True)
    with pytest.raises(NotImplementedError, match="spatial"):
        _make({"data": 4, "spatial": 2}, fsdp=True)
    with pytest.raises(NotImplementedError, match="subsumes"):
        _make({"data": 8}, fsdp=True, zero_optim=True)
    with pytest.raises(NotImplementedError, match="pipe"):
        _make({"data": 4, "pipe": 2}, fsdp=True, pipe_microbatches=2)
    with pytest.raises(ValueError, match="size >= 2"):
        _make({"data": 1}, fsdp=True)


def test_device_trainer_rejects_fsdp():
    from vsr_tpu.runner.device_trainer import AcdcSISRDeviceTrainer

    with pytest.raises(NotImplementedError, match="FSDP"):
        AcdcSISRDeviceTrainer(
            train_dataloader=None, valid_dataloader=None, net=_net(),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, patch=8, ratio=2,
            mesh_axes={"data": 8}, fsdp=True)
