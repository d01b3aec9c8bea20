"""Elastic resume: a checkpoint written under ONE mesh/parallelism layout
restores under ANY OTHER layout and training continues with the same math.

This is the production preemption story (SURVEY.md §5 failure recovery):
the device allocation that resumes a run is not guaranteed to match the one
that wrote the checkpoint. vsr_tpu checkpoints are layout-free by
construction — ``BaseTrainer.save`` gathers ZeRO/FSDP-sharded leaves to
full host arrays and ``load`` -> ``_place_state`` re-places them per the
RESTORING trainer's mesh rule — so any (mesh, placement) pair can hand off
to any other. The reference has no analogue (single-GPU torch .pth,
``/root/reference/src/runner/trainers/base_trainer.py``).

SGD keeps the sharded-vs-unsharded comparisons tight: Adam's m/sqrt(v) on
near-zero grads amplifies reduction-order noise into sign flips (round-3
note in CLAUDE.md). Runs on the 8 virtual CPU devices from conftest.
"""

import jax
import numpy as np
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import SGD
from vsr_tpu.runner.trainers import AcdcSISRTrainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _net():
    return EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                   num_features=8, upscale_factor=2)


class _StubMonitor:
    def state_dict(self):
        return {}

    def load_state_dict(self, d):
        pass


def _make(mesh_axes, **kw):
    trainer = AcdcSISRTrainer(
        train_dataloader=None, valid_dataloader=None, net=_net(),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=SGD(lr=1e-2), lr_scheduler=None, logger=None,
        monitor=_StubMonitor(), num_epochs=1, mesh_axes=mesh_axes, **kw)
    return trainer


def _batch(n=8):
    rng = np.random.default_rng(0)
    return {
        "lr_img": rng.standard_normal((n, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((n, 16, 16, 1)).astype(np.float32),
        "index": np.arange(n),
    }


def _init(trainer, inputs):
    # No dataloader in these trainers — init manually (what
    # _ensure_initialized would do), then place per the mesh rule.
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    trainer._place_state()


def _step(trainer, inputs, targets, n=1):
    for _ in range(n):
        if trainer.mesh is not None:
            trainer.params, trainer.opt_state, scalars, _ = \
                trainer._dp_train_step(trainer.params, trainer.opt_state,
                                       inputs, targets)
        else:
            trainer.params, trainer.opt_state, scalars, _ = \
                trainer._train_step(trainer.params, trainer.opt_state,
                                    inputs, targets, training=True)
    return {k: float(v) for k, v in scalars.items()}


def _host_leaves(tree):
    return [np.asarray(a) for a in jax.tree_util.tree_leaves(tree)]


LAYOUTS = {
    "single": dict(mesh_axes=None),
    "fsdp8": dict(mesh_axes={"data": 8}, fsdp=True),
    "zero4": dict(mesh_axes={"data": 4}, zero_optim=True),
    "tp2x2": dict(mesh_axes={"data": 2, "model": 2}),
}


@pytest.mark.parametrize("src,dst", [
    ("fsdp8", "single"),   # shrink to one device after preemption
    ("fsdp8", "zero4"),    # different placement rule AND mesh size
    ("tp2x2", "fsdp8"),    # tensor parallel -> fully sharded DP
    ("single", "fsdp8"),   # scale out a single-device run
])
def test_checkpoint_crosses_layouts(tmp_path, src, dst):
    batch = _batch()

    # Train 2 steps under the source layout, checkpoint through the
    # trainer's own save (gathers sharded leaves to host arrays).
    a = _make(**LAYOUTS[src])
    inputs, targets = a._get_inputs_targets(batch)
    _init(a, inputs)
    _step(a, inputs, targets, n=2)
    ckpt = tmp_path / "model.ckpt"
    a.save(ckpt, epoch=3)

    # Reference continuation: an unsharded trainer restores the same
    # checkpoint and takes one more step.
    ref = _make(mesh_axes=None)
    _init(ref, inputs)
    ref.load(ckpt)
    ref_restored = _host_leaves(ref.params)
    _step(ref, jnp_in := inputs, targets)
    ref_after = _host_leaves(ref.params)

    # Elastic restore under the destination layout.
    b = _make(**LAYOUTS[dst])
    _init(b, inputs)
    b.load(ckpt)
    assert b.epoch == 4  # aux survived the layout change
    for x, y in zip(_host_leaves(b.params), ref_restored):
        np.testing.assert_array_equal(x, y)
    _step(b, jnp_in, targets)
    for x, y in zip(_host_leaves(b.params), ref_after):
        np.testing.assert_allclose(x, y, rtol=2e-5, atol=1e-6)


def test_ema_state_crosses_layouts(tmp_path):
    # The optimizer-state EMA twin is sharded like the moments under FSDP;
    # it must survive the gather/re-place cycle into a different layout.
    from vsr_tpu.optim import get_ema_params

    batch = _batch()
    a = _make(mesh_axes={"data": 8}, fsdp=True, ema_decay=0.9)
    inputs, targets = a._get_inputs_targets(batch)
    _init(a, inputs)
    _step(a, inputs, targets, n=2)
    ema_src = _host_leaves(get_ema_params(a.opt_state))
    ckpt = tmp_path / "model.ckpt"
    a.save(ckpt)

    b = _make(mesh_axes=None, ema_decay=0.9)
    _init(b, inputs)
    b.load(ckpt)
    for x, y in zip(_host_leaves(get_ema_params(b.opt_state)), ema_src):
        np.testing.assert_array_equal(x, y)
