"""ZeRO-1 optimizer-state sharding (trainer ``zero_optim=True``).

The reference is single-GPU (SURVEY.md §2.9); vsr_tpu shards the optimizer
moments' trailing dims over the 'data' mesh axis (parallel/gspmd.py
``zero_axis``) while params stay replicated — the partitioner inserts
reduce-scatter/all-gather. Math must match the unsharded step; the moments
must actually be split. Runs on the 8 virtual CPU devices from conftest.
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


@pytest.mark.parametrize("mesh_axes", [{"data": 8}, {"data": 4, "spatial": 2}])
def test_zero_matches_unsharded(mesh_axes):
    t_z, s_z = _run(_make(mesh_axes, zero_optim=True), 3, sharded=True)
    t_u, s_u = _run(_make(None), 3, sharded=False)
    for k in s_u:
        np.testing.assert_allclose(s_z[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(t_z.params),
                    jax.tree_util.tree_leaves(t_u.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_zero_moments_actually_sharded():
    trainer, _ = _run(_make({"data": 8}, zero_optim=True), 1, sharded=True)
    n_data = 8
    found_split = False
    for leaf in jax.tree_util.tree_leaves(trainer.opt_state):
        if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
            continue
        if leaf.shape[-1] >= n_data and leaf.shape[-1] % n_data == 0:
            shard_shape = leaf.addressable_shards[0].data.shape
            assert shard_shape[-1] == leaf.shape[-1] // n_data, (
                leaf.shape, shard_shape)
            found_split = True
    assert found_split, "no moment leaf was split over 'data'"
    # Params stay replicated.
    for leaf in jax.tree_util.tree_leaves(trainer.params):
        assert leaf.addressable_shards[0].data.shape == leaf.shape


def test_zero_guards():
    with pytest.raises(NotImplementedError, match="redundant"):
        _make({"data": 4, "model": 2}, zero_optim=True)
    with pytest.raises(ValueError, match="zero_optim needs"):
        _make({"spatial": 2}, zero_optim=True)
    # Silent-no-op guards: meshless zero_optim / pipe-less microbatches.
    with pytest.raises(ValueError, match="zero_optim needs"):
        _make(None, zero_optim=True)
    with pytest.raises(ValueError, match="pipe_microbatches"):
        _make({"data": 8}, pipe_microbatches=2)


def test_device_trainer_rejects_zero_and_pipe():
    from vsr_tpu.runner.device_trainer import AcdcSISRDeviceTrainer

    def make_dev(**kw):
        return AcdcSISRDeviceTrainer(
            train_dataloader=None, valid_dataloader=None, net=_net(),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, patch=8, ratio=2, **kw)

    with pytest.raises(NotImplementedError, match="ZeRO"):
        make_dev(mesh_axes={"data": 8}, zero_optim=True)
    with pytest.raises(NotImplementedError, match="pipe"):
        make_dev(mesh_axes={"data": 2, "pipe": 2}, pipe_microbatches=2)
    with pytest.raises(NotImplementedError, match="model"):
        make_dev(mesh_axes={"data": 4, "model": 2})


def test_device_trainer_multihost_guards(monkeypatch):
    """Round 5: multi-host 'data' meshes are SUPPORTED (parity proven in
    tests/test_multihost.py::test_device_epoch_two_process_matches_
    single_process) — construction succeeds; non-data axes still refuse
    under multi-process."""
    import vsr_tpu.parallel.distributed as dist
    from vsr_tpu.runner.device_trainer import AcdcSISRDeviceTrainer

    monkeypatch.setattr(dist, "is_multiprocess", lambda: True)

    def make_dev(**kw):
        return AcdcSISRDeviceTrainer(
            train_dataloader=None, valid_dataloader=None, net=_net(),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, patch=8, ratio=2, **kw)

    make_dev(mesh_axes={"data": 8})  # data-only mesh: constructs
    with pytest.raises(NotImplementedError, match="spatial"):
        make_dev(mesh_axes={"spatial": 2, "data": 4})
    with pytest.raises(NotImplementedError, match="seq"):
        make_dev(mesh_axes={"seq": 2, "data": 4})
