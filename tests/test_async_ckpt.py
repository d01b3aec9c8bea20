"""Async (non-blocking) checkpoint writes — trainer.kwargs.async_ckpt.

Beyond-parity production feature (the reference's torch.save blocks the
epoch loop, base_trainer.py:224-252): save() snapshots params/opt_state
ON DEVICE and a background thread does the host transfer + file IO while
the train loop keeps dispatching steps. The snapshot is taken with
jnp.copy, so it is immune to the train step's buffer donation
(donate_argnames on params/opt_state) — the file holds exactly the
submit-time values, bit-identical to a synchronous save.
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
from vsr_tpu.utils.checkpoint import (AsyncCheckpointWriter, load_checkpoint,
                                      save_checkpoint)


def _tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_writer_matches_sync_file(tmp_path):
    state = {
        "w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b16": jnp.ones((4,), jnp.bfloat16) / 3,
        "host": np.full((2,), 7, np.int32),
        "step": 5,
    }
    aux = {"epoch": 3, "note": "x"}
    save_checkpoint(tmp_path / "sync.ckpt", state, aux)
    w = AsyncCheckpointWriter()
    w.submit(tmp_path / "async.ckpt", state, aux)
    w.wait()
    assert (tmp_path / "sync.ckpt").read_bytes() == (
        tmp_path / "async.ckpt").read_bytes()


def test_snapshot_survives_donation_and_mutation(tmp_path):
    a = jnp.arange(8, dtype=jnp.float32)
    host = np.zeros((3,), np.float32)
    aux = {"tag": ["keep"]}
    w = AsyncCheckpointWriter()
    w.submit(tmp_path / "snap.ckpt", {"a": a, "host": host}, aux)
    # Donate the original device buffer and mutate the host leaves AFTER
    # submit — the file must hold the submit-time values.
    jax.jit(lambda x: x * 2, donate_argnums=0)(a)
    host += 99
    aux["tag"].append("mutated")
    w.wait()
    state, saved_aux = load_checkpoint(tmp_path / "snap.ckpt")
    np.testing.assert_array_equal(state["a"], np.arange(8, dtype=np.float32))
    np.testing.assert_array_equal(state["host"], np.zeros((3,), np.float32))
    assert saved_aux["tag"] == ["keep"]


def test_writes_land_in_submit_order(tmp_path):
    w = AsyncCheckpointWriter()
    path = tmp_path / "model.ckpt"
    for i in range(5):
        w.submit(path, {"v": jnp.full((2,), float(i))})
    w.wait()
    state, _ = load_checkpoint(path)
    np.testing.assert_array_equal(state["v"], [4.0, 4.0])


def test_worker_error_surfaces_on_wait(tmp_path):
    w = AsyncCheckpointWriter()
    blocker = tmp_path / "dir_in_the_way"
    blocker.mkdir()
    w.submit(blocker, {"v": jnp.ones(2)})  # path is a directory -> IO error
    with pytest.raises(RuntimeError, match="async checkpoint"):
        w.wait()
    # Error is cleared; the writer stays usable.
    w.submit(tmp_path / "ok.ckpt", {"v": jnp.ones(2)})
    w.wait()
    assert (tmp_path / "ok.ckpt").exists()


# --------------------------------------------------------------- trainer


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


def _init(trainer, batch):
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    trainer.monitor = type("M", (), {"state_dict": lambda self: {},
                                     "load_state_dict": lambda self, d: None})()
    return inputs, targets


def test_trainer_async_save_equals_sync_save(tmp_path):
    batch = _batch()
    t_sync, t_async = _trainer(), _trainer(async_ckpt=True)
    for t in (t_sync, t_async):
        inputs, targets = _init(t, batch)
        for _ in range(2):
            t.params, t.opt_state, _, _ = t._train_step(
                t.params, t.opt_state, inputs, targets, training=True)
    t_sync.save(tmp_path / "sync.ckpt")
    t_async.save(tmp_path / "async.ckpt")

    # The async save returns immediately; training continues and DONATES
    # the live buffers before the write lands.
    inputs, targets = t_async._get_inputs_targets(batch)
    t_async.params, t_async.opt_state, _, _ = t_async._train_step(
        t_async.params, t_async.opt_state, inputs, targets, training=True)
    t_async.wait_for_checkpoints()

    s_sync, aux_sync = load_checkpoint(tmp_path / "sync.ckpt")
    s_async, aux_async = load_checkpoint(tmp_path / "async.ckpt")
    _tree_equal(s_sync, s_async)
    assert aux_sync == aux_async


def test_trainer_load_drains_pending_write(tmp_path):
    batch = _batch()
    t = _trainer(async_ckpt=True)
    inputs, targets = _init(t, batch)
    t.params, t.opt_state, _, _ = t._train_step(
        t.params, t.opt_state, inputs, targets, training=True)
    want = jax.tree_util.tree_map(np.asarray, t.params)
    t.save(tmp_path / "model.ckpt")
    # load() must wait for the in-flight write, then restore those values.
    t.params, t.opt_state, _, _ = t._train_step(
        t.params, t.opt_state, inputs, targets, training=True)
    t.load(tmp_path / "model.ckpt")
    _tree_equal(t.params, want)
    assert t.epoch == 2  # aux epoch 1 -> resume at 2
