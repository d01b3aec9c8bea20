"""Spatially-sharded training of REAL nets through the trainer.

VERDICT round-1 item #5: ``mesh_axes={'data': 4, 'spatial': 2}`` must train a
real model through the trainer's own step machinery (GSPMD: batch over
'data', frame/volume H over 'spatial'; XLA inserts the conv halo exchanges),
matching the single-device step within float tolerance. Runs on the 8
virtual CPU devices from conftest.
"""

import jax
import numpy as np
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import DRFNet, Volume3DSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import Acdc3DSRTrainer, AcdcVSRTrainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _params_close(a, b, **tol):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **tol)


def _run_steps(trainer, batch, n_steps, sharded):
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    step = trainer._dp_train_step if sharded else trainer._train_step
    scalars = None
    for _ in range(n_steps):
        if sharded:
            trainer.params, trainer.opt_state, scalars, _ = step(
                trainer.params, trainer.opt_state, inputs, targets)
        else:
            trainer.params, trainer.opt_state, scalars, _ = step(
                trainer.params, trainer.opt_state, inputs, targets,
                training=True)
    return trainer.params, {k: float(v) for k, v in scalars.items()}


def _make(cls, net, mesh_axes):
    return cls(
        train_dataloader=None, valid_dataloader=None, net=net,
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None, monitor=None,
        num_epochs=1, mesh_axes=mesh_axes,
    )


def test_vol3d_trainer_data_x_spatial_matches_single_device():
    rng = np.random.default_rng(0)
    batch = {
        "lr_vol": rng.standard_normal((4, 8, 8, 6, 1)).astype(np.float32),
        "hr_vol": rng.standard_normal((4, 16, 16, 6, 1)).astype(np.float32),
        "index": np.arange(4),
    }
    net = lambda: Volume3DSRNet(in_channels=1, out_channels=1, num_features=4,
                                num_resblocks=1, upscale_factor=2)

    sharded = _make(Acdc3DSRTrainer, net(), {"data": 4, "spatial": 2})
    assert "spatial" in sharded.mesh.shape
    p_s, s_s = _run_steps(sharded, batch, 3, sharded=True)

    single = _make(Acdc3DSRTrainer, net(), None)
    p_u, s_u = _run_steps(single, batch, 3, sharded=False)

    for k in s_u:
        np.testing.assert_allclose(s_s[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    _params_close(p_s, p_u, rtol=5e-4, atol=1e-5)


def test_vsr_trainer_data_x_spatial_matches_single_device():
    rng = np.random.default_rng(1)
    batch = {
        "lr_imgs": rng.standard_normal((4, 3, 8, 8, 1)).astype(np.float32),
        "hr_imgs": rng.standard_normal((4, 3, 16, 16, 1)).astype(np.float32),
        "index": np.arange(4),
    }
    net = lambda: DRFNet(in_channels=1, out_channels=1, num_features=4,
                         num_groups=1, upscale_factor=2)

    sharded = _make(AcdcVSRTrainer, net(), {"data": 4, "spatial": 2})
    p_s, s_s = _run_steps(sharded, batch, 3, sharded=True)

    single = _make(AcdcVSRTrainer, net(), None)
    p_u, s_u = _run_steps(single, batch, 3, sharded=False)

    for k in s_u:
        np.testing.assert_allclose(s_s[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    _params_close(p_s, p_u, rtol=5e-4, atol=1e-5)


def test_spatial_only_mesh_works():
    """mesh_axes={'spatial': m} (no data axis) degrades the 'data' spec
    entries to replicated instead of crashing at construction."""
    rng = np.random.default_rng(2)
    batch = {
        "lr_vol": rng.standard_normal((1, 8, 8, 4, 1)).astype(np.float32),
        "hr_vol": rng.standard_normal((1, 16, 16, 4, 1)).astype(np.float32),
        "index": np.arange(1),
    }
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_features=4,
                        num_resblocks=1, upscale_factor=2)
    tr = _make(Acdc3DSRTrainer, net, {"spatial": 4})
    p_s, s_s = _run_steps(tr, batch, 2, sharded=True)
    single = _make(Acdc3DSRTrainer,
                   Volume3DSRNet(in_channels=1, out_channels=1, num_features=4,
                                 num_resblocks=1, upscale_factor=2), None)
    p_u, s_u = _run_steps(single, batch, 2, sharded=False)
    for k in s_u:
        np.testing.assert_allclose(s_s[k], s_u[k], rtol=2e-4, atol=1e-5)
