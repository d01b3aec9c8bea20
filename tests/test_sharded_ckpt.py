"""Sharded checkpoints (trainer.kwargs.sharded_ckpt) — each process writes
only the shards it owns.

Beyond-parity scaling feature: the default save path gathers every
cross-host FSDP/ZeRO shard to process 0 (O(model) DCN traffic + host
memory) before one torch.save-style write, which stops scaling once the
model outgrows a host. sharded-v1 writes ``<ckpt>.shard<k>`` per process
plus a main file (replicated leaves + aux + manifest); restore reassembles
each leaf against the trainer's placement rule, and
``vsr_tpu.convert --consolidate`` stitches the files into a plain
checkpoint offline (pure numpy). Runs on the 8 virtual CPU devices.
"""

import jax
import numpy as np
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import AcdcSISRTrainer
from vsr_tpu.utils.checkpoint import (consolidate_sharded_checkpoint,
                                      load_checkpoint)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _net():
    return EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                   num_features=8, upscale_factor=2)


def _make(mesh_axes, **kw):
    t = AcdcSISRTrainer(
        train_dataloader=None, valid_dataloader=None, net=_net(),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=None, num_epochs=1, mesh_axes=mesh_axes, **kw)
    t.monitor = type("M", (), {"state_dict": lambda self: {"best": 1.0},
                               "load_state_dict": lambda self, d: None,
                               "checkpoints_dir": "/tmp"})()
    return t


def _batch(n=8):
    rng = np.random.default_rng(0)
    return {
        "lr_img": rng.standard_normal((n, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((n, 16, 16, 1)).astype(np.float32),
        "index": np.arange(n),
    }


def _init_and_step(trainer, n_steps=2, seed=0):
    batch = _batch()
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(seed), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    trainer._place_state()
    for _ in range(n_steps):
        trainer.params, trainer.opt_state, _, _ = trainer._dp_train_step(
            trainer.params, trainer.opt_state, inputs, targets)
    return trainer


def _tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _some_leaf_sharded(tree):
    return any(isinstance(l, jax.Array) and not l.is_fully_replicated
               for l in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("kw", [
    {"fsdp": True},          # params + moments sharded
    {"zero_optim": True},    # moments only
])
def test_sharded_roundtrip(tmp_path, kw):
    src = _init_and_step(_make({"data": 8}, sharded_ckpt=True, **kw))
    assert _some_leaf_sharded(src.opt_state)
    path = tmp_path / "model.ckpt"
    src.save(path)
    assert path.exists() and (tmp_path / "model.ckpt.shard0").exists()

    dst = _make({"data": 8}, sharded_ckpt=True, **kw)
    batch = _batch()
    inputs, _ = dst._get_inputs_targets(batch)
    dst.params = dst.net.init(jax.random.PRNGKey(99), inputs)  # different
    dst.opt_state = dst.tx.init(dst.params["params"])
    dst._place_state()
    dst.load(path)
    _tree_equal(src.params, dst.params)
    _tree_equal(src.opt_state, dst.opt_state)
    # Restored leaves are PLACED sharded (no replicated blow-up).
    assert _some_leaf_sharded(dst.opt_state)
    assert dst.epoch == 2


def test_consolidate_matches_live_state(tmp_path):
    src = _init_and_step(_make({"data": 8}, fsdp=True, sharded_ckpt=True))
    src.save(tmp_path / "model.ckpt")
    consolidate_sharded_checkpoint(tmp_path / "model.ckpt",
                                   tmp_path / "plain.ckpt")
    state, aux = load_checkpoint(tmp_path / "plain.ckpt")
    want = jax.device_get({"params": src.params, "opt_state": src.opt_state})
    from flax import serialization, traverse_util

    got = traverse_util.flatten_dict(state, sep="/")
    ref = traverse_util.flatten_dict(
        serialization.to_state_dict(want), sep="/")
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]),
                                      err_msg=k)
    assert aux["epoch"] == 1
    # The consolidated file loads everywhere a plain checkpoint does: an
    # UNSHARDED trainer resumes from it.
    plain = _make(None)
    batch = _batch()
    inputs, _ = plain._get_inputs_targets(batch)
    plain.params = plain.net.init(jax.random.PRNGKey(5), inputs)
    plain.opt_state = plain.tx.init(plain.params["params"])
    plain.load(tmp_path / "plain.ckpt")
    _tree_equal(plain.params, src.params)


def test_plain_loader_refuses_sharded_file(tmp_path):
    src = _init_and_step(_make({"data": 8}, fsdp=True, sharded_ckpt=True))
    src.save(tmp_path / "model.ckpt")
    with pytest.raises(ValueError, match="consolidate"):
        load_checkpoint(tmp_path / "model.ckpt")


def test_sharded_ckpt_needs_mesh():
    with pytest.raises(ValueError, match="sharded_ckpt needs mesh_axes"):
        _make(None, sharded_ckpt=True)


def test_sharded_composes_with_async(tmp_path):
    src = _init_and_step(
        _make({"data": 8}, fsdp=True, sharded_ckpt=True, async_ckpt=True))
    path = tmp_path / "model.ckpt"
    src.save(path)
    src.wait_for_checkpoints()
    sync = _init_and_step(_make({"data": 8}, fsdp=True, sharded_ckpt=True))
    sync.save(tmp_path / "sync.ckpt")
    assert path.read_bytes() == (tmp_path / "sync.ckpt").read_bytes()
    assert (tmp_path / "model.ckpt.shard0").read_bytes() == (
        tmp_path / "sync.ckpt.shard0").read_bytes()


def test_mixed_save_shards_detected(tmp_path):
    """A crash mid-save over a reused path can leave the NEW main file next
    to an OLD shard file (or vice versa). The embedded save_id nonce makes
    load and consolidate refuse the mix instead of silently reassembling
    mixed-epoch state."""
    src = _init_and_step(_make({"data": 8}, fsdp=True, sharded_ckpt=True))
    path = tmp_path / "model.ckpt"
    src.save(path)
    stale_shard = (tmp_path / "model.ckpt.shard0").read_bytes()
    # Second save to the SAME path at a later epoch (different aux).
    src.epoch += 1
    src.save(path)
    assert (tmp_path / "model.ckpt.shard0").read_bytes() != stale_shard
    # Simulate the crash: fresh main file, stale shard file.
    (tmp_path / "model.ckpt.shard0").write_bytes(stale_shard)
    dst = _make({"data": 8}, fsdp=True, sharded_ckpt=True)
    batch = _batch()
    inputs, _ = dst._get_inputs_targets(batch)
    dst.params = dst.net.init(jax.random.PRNGKey(99), inputs)
    dst.opt_state = dst.tx.init(dst.params["params"])
    dst._place_state()
    with pytest.raises(ValueError, match="different save"):
        dst.load(path)
    with pytest.raises(ValueError, match="different save"):
        consolidate_sharded_checkpoint(path, tmp_path / "plain.ckpt")


def test_sharded_dtype_mismatch_raises(tmp_path):
    src = _init_and_step(_make({"data": 8}, fsdp=True, sharded_ckpt=True))
    path = tmp_path / "model.ckpt"
    src.save(path)
    dst = _make({"data": 8}, fsdp=True, sharded_ckpt=True)
    batch = _batch()
    inputs, _ = dst._get_inputs_targets(batch)
    dst.params = dst.net.init(jax.random.PRNGKey(99), inputs)
    dst.opt_state = dst.tx.init(dst.params["params"])
    import jax.numpy as jnp

    dst.opt_state = jax.tree_util.tree_map(
        lambda l: l.astype(jnp.bfloat16)
        if isinstance(l, jax.Array) and l.dtype == jnp.float32 else l,
        dst.opt_state)
    dst._place_state()
    with pytest.raises(ValueError, match="dtype mismatch"):
        dst.load(path)


def test_consolidate_cli(tmp_path):
    src = _init_and_step(_make({"data": 8}, fsdp=True, sharded_ckpt=True))
    src.save(tmp_path / "model.ckpt")
    from vsr_tpu.convert import main as convert_main

    convert_main(["--consolidate", str(tmp_path / "model.ckpt"),
                  str(tmp_path / "plain.ckpt")])
    state, _ = load_checkpoint(tmp_path / "plain.ckpt")
    assert "params" in state and "opt_state" in state
