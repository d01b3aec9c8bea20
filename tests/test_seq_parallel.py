"""Sequence ('seq'-axis) parallelism: GSPMD sharding of the depth / window
axis the 3D(+t) convolutions reach over.

SURVEY.md §5 ("Long-context / sequence parallelism"): the TPU rebuild of
temporal extent scaling shards the volume depth (Volume3DSR/4D) or the
MISR frame window (DUF's temporal convs) across the mesh; XLA inserts the
temporal-conv halo exchanges exactly as it does for 'spatial' — the
conv-world analogue of context parallelism. Recurrent-T tasks have no
shardable axis and must refuse the mesh loudly. Runs on the 8 virtual CPU
devices from conftest.
"""

import jax
import numpy as np
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import DRFNet, Volume3DSRNet
from vsr_tpu.models.duf import DUFNet
from vsr_tpu.models.vol4d import Volume4DSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import (Acdc3DSRTrainer, Acdc4DSRTrainer,
                                     AcdcMISRTrainer, AcdcSISRTrainer,
                                     AcdcVSRTrainer)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _make(cls, net, mesh_axes):
    return cls(
        train_dataloader=None, valid_dataloader=None, net=net,
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=None, num_epochs=1, mesh_axes=mesh_axes)


def _run_steps(trainer, batch, n_steps, sharded):
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
    return trainer.params, {k: float(v) for k, v in scalars.items()}


def _assert_same(p_s, s_s, p_u, s_u):
    for k in s_u:
        np.testing.assert_allclose(s_s[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("mesh_axes", [
    {"data": 4, "seq": 2},
    {"data": 2, "seq": 2, "spatial": 2},
])
def test_vol3d_data_x_seq_matches_single_device(mesh_axes):
    rng = np.random.default_rng(0)
    batch = {
        "lr_vol": rng.standard_normal((4, 8, 8, 4, 1)).astype(np.float32),
        "hr_vol": rng.standard_normal((4, 16, 16, 4, 1)).astype(np.float32),
        "index": np.arange(4),
    }
    net = lambda: Volume3DSRNet(in_channels=1, out_channels=1,
                                num_features=4, num_resblocks=1,
                                upscale_factor=2)
    p_s, s_s = _run_steps(_make(Acdc3DSRTrainer, net(), mesh_axes),
                          batch, 3, sharded=True)
    p_u, s_u = _run_steps(_make(Acdc3DSRTrainer, net(), None),
                          batch, 3, sharded=False)
    _assert_same(p_s, s_s, p_u, s_u)


def test_vol4d_data_x_seq_matches_single_device():
    rng = np.random.default_rng(1)
    batch = {
        "lr_vols": rng.standard_normal((2, 3, 8, 8, 4, 1)).astype(np.float32),
        "hr_vols": rng.standard_normal(
            (2, 3, 16, 16, 4, 1)).astype(np.float32),
        "index": np.arange(2),
    }
    net = lambda: Volume4DSRNet(in_channels=1, out_channels=1,
                                num_features=4, num_resblocks=1,
                                upscale_factor=2)
    p_s, s_s = _run_steps(_make(Acdc4DSRTrainer, net(), {"data": 2, "seq": 2}),
                          batch, 2, sharded=True)
    p_u, s_u = _run_steps(_make(Acdc4DSRTrainer, net(), None),
                          batch, 2, sharded=False)
    _assert_same(p_s, s_s, p_u, s_u)


def test_duf_misr_data_x_seq_matches_single_device():
    """DUF's temporal (3D) convs reach across the sharded window axis —
    the real halo-exchange case for 'seq'."""
    rng = np.random.default_rng(2)
    batch = {
        "lr_imgs": rng.standard_normal((2, 8, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((2, 16, 16, 1)).astype(np.float32),
        "index": np.arange(2),
    }
    net = lambda: DUFNet(in_channels=1, out_channels=1, num_frames=8,
                         size_filter=3, upscale_factor=2)

    # SGD, not Adam: the sharded forward is BITWISE equal and raw grads
    # agree to 1e-9 (pure reassociation), but Adam's m/sqrt(v) on DUF's
    # near-zero filter-softmax grads turns that into sign noise — SGD
    # keeps the param comparison a direct gradient-exactness check.
    from vsr_tpu.optim import SGD

    def make(mesh_axes):
        return AcdcMISRTrainer(
            train_dataloader=None, valid_dataloader=None, net=net(),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=SGD(lr=0.1), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, mesh_axes=mesh_axes)

    p_s, s_s = _run_steps(make({"data": 2, "seq": 2}), batch, 2,
                          sharded=True)
    p_u, s_u = _run_steps(make(None), batch, 2, sharded=False)
    _assert_same(p_s, s_s, p_u, s_u)


def test_seq_refused_on_recurrent_and_frame_tasks():
    from vsr_tpu.models import EDSRNet

    drf = DRFNet(in_channels=1, out_channels=1, num_features=4,
                 num_groups=1, upscale_factor=2)
    with pytest.raises(NotImplementedError, match="seq"):
        _make(AcdcVSRTrainer, drf, {"data": 4, "seq": 2})
    edsr = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                   num_features=4, upscale_factor=2)
    with pytest.raises(NotImplementedError, match="seq"):
        _make(AcdcSISRTrainer, edsr, {"data": 4, "seq": 2})


def test_seq_x_model_refused():
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_features=4,
                        num_resblocks=1, upscale_factor=2)
    with pytest.raises(NotImplementedError, match="seq"):
        _make(Acdc3DSRTrainer, net, {"data": 2, "seq": 2, "model": 2})
