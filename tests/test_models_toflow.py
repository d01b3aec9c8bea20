import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import TOFlowNet
from vsr_tpu.models.toflow import SpyNet


@pytest.mark.parametrize("factor", [2, 4])
def test_toflow_shapes(factor):
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=5, upscale_factor=factor)
    x = jnp.zeros((1, 5, 8, 8, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 8 * factor, 8 * factor, 1)


def test_toflow_pads_non16():
    # 8x2=16 ok; try 10 -> 20, needs pad to 32.
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3, upscale_factor=2)
    x = jnp.zeros((1, 3, 10, 14, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 20, 28, 1)


def test_spynet_flow_shape():
    spy = SpyNet()
    ref = jnp.zeros((2, 32, 32, 1))
    variables = spy.init(jax.random.PRNGKey(0), ref, ref, train=False)
    flow = spy.apply(variables, ref, ref, train=False)
    assert flow.shape == (2, 32, 32, 2)


def test_toflow_batch_stats_update():
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3, upscale_factor=2)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 8, 8, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out, new_vars = net.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(new_vars["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(before, after))
    assert changed


def test_toflow_grad():
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3, upscale_factor=2)
    x = jnp.ones((1, 3, 8, 8, 1))
    y = jnp.ones((1, 16, 16, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def loss(p):
        out, _ = net.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean((out - y) ** 2)

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_toflow_trainer_integration(tmp_path):
    """BatchNorm state must thread through the generic trainer."""
    from tests.synth import make_processed_tree
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcMISRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import AcdcMISRTrainer

    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=4, hr_size=16)
    transforms = [{"name": "ToTensor"}]
    train_ds = AcdcMISRDataset(data_dir=root / "videos", type="train",
                               downscale_factor=2, transforms=transforms,
                               num_frames=3)
    valid_ds = AcdcMISRDataset(data_dir=root / "videos", type="valid",
                               downscale_factor=2, transforms=transforms,
                               num_frames=3)
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3, upscale_factor=2)
    trainer = AcdcMISRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=net,
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-4), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()
    assert "batch_stats" in trainer.params
    assert (tmp_path / "ckpt" / "model_1.ckpt").exists()
