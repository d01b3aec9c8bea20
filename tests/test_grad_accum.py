import jax
import numpy as np

from tests.synth import make_processed_tree
from vsr_tpu.callbacks.monitor import Monitor
from vsr_tpu.data.datasets import AcdcSISRDataset
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import Adam, get_learning_rate
from vsr_tpu.runner.trainers import AcdcSISRTrainer


def _make(data_root, tmp_path, batch_size, grad_accumulation):
    transforms = [{"name": "ToTensor"}]
    augments = [{"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}}]
    train_ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="train",
                               downscale_factor=2, transforms=transforms,
                               augments=augments)
    valid_ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="valid",
                               downscale_factor=2, transforms=transforms)
    return AcdcSISRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=batch_size, shuffle=True,
                                    drop_last=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                    num_features=4, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "c", mode="min",
                        target="Loss", saved_freq=10, early_stop=0),
        num_epochs=1,
        grad_accumulation=grad_accumulation,
    )


def test_grad_accumulation_runs_and_lr_accessible(tmp_path):
    root = make_processed_tree(tmp_path / "d", types=("train", "valid"),
                               patients_per_type=1, slices=2, frames=8,
                               hr_size=16)
    t = _make(root, tmp_path, batch_size=2, grad_accumulation=4)
    t.train()
    assert abs(get_learning_rate(t.opt_state) - 1e-3) < 1e-9
    leaves = jax.tree_util.tree_leaves(t.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

def test_grad_clip_runs_and_lr_accessible(tmp_path):
    """grad_clip wraps the optimizer in an optax.chain tuple — training
    runs, the clipped step is finite, and get/set_learning_rate still
    reach the injected hyperparams through the tuple state."""
    from vsr_tpu.optim import set_learning_rate

    root = make_processed_tree(tmp_path / "d", types=("train", "valid"),
                               patients_per_type=1, slices=2, frames=8,
                               hr_size=16)
    t = _make(root, tmp_path, batch_size=2, grad_accumulation=1)
    t2 = AcdcSISRTrainer(
        train_dataloader=t.train_dataloader, valid_dataloader=t.valid_dataloader,
        net=t.net, loss_fns=[L1Loss()], loss_weights=[1.0],
        metric_fns=[PSNR()], optimizer=Adam(lr=1e-3), lr_scheduler=None,
        logger=None, monitor=Monitor(checkpoints_dir=tmp_path / "c2",
                                     mode="min", target="Loss",
                                     saved_freq=10, early_stop=0),
        num_epochs=1, grad_clip=0.5)
    t2.train()
    assert abs(get_learning_rate(t2.opt_state) - 1e-3) < 1e-9
    set_learning_rate(t2.opt_state, 5e-4)
    assert abs(get_learning_rate(t2.opt_state) - 5e-4) < 1e-9
    leaves = jax.tree_util.tree_leaves(t2.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_grad_clip_actually_clips():
    """With a tiny max-norm the parameter step length is bounded by
    lr * max_norm (Adam rescales per-coordinate, so compare against the
    unclipped step direction being shortened: clipped grads have global
    norm <= max_norm going INTO the update rule)."""
    import jax.numpy as jnp
    import optax

    from vsr_tpu.optim import SGD

    tx_raw = SGD(lr=1.0)
    tx_clip = optax.chain(optax.clip_by_global_norm(0.1), SGD(lr=1.0))
    params = {"w": jnp.asarray([3.0, 4.0])}  # grad norm will be 5
    grads = {"w": jnp.asarray([3.0, 4.0])}
    up_raw, _ = tx_raw.update(grads, tx_raw.init(params), params)
    up_clip, _ = tx_clip.update(grads, tx_clip.init(params), params)
    norm_raw = float(jnp.linalg.norm(up_raw["w"]))
    norm_clip = float(jnp.linalg.norm(up_clip["w"]))
    assert abs(norm_raw - 5.0) < 1e-5
    assert abs(norm_clip - 0.1) < 1e-5
