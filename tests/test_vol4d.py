import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.data.datasets import AcdcVolumeVSRDataset
from vsr_tpu.models import Volume4DSRNet


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vol4d")
    return make_processed_tree(root, types=("train", "valid"), patients_per_type=2,
                               slices=3, frames=6, hr_size=24)


def test_vol4d_net_shapes():
    net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                        num_resblocks=1, upscale_factor=2)
    x = jnp.zeros((1, 3, 2, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 3, 2, 16, 16, 1)


def test_vol4d_recurrence_carries_state(rng):
    net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                        num_resblocks=1, upscale_factor=2)
    f0 = rng.random((1, 1, 2, 8, 8, 1)).astype(np.float32)
    f1 = rng.random((1, 1, 2, 8, 8, 1)).astype(np.float32)
    seq = jnp.asarray(np.concatenate([f0, f1, f0], axis=1))
    params = net.init(jax.random.PRNGKey(0), seq)
    out = np.asarray(net.apply(params, seq))
    assert not np.allclose(out[0, 0], out[0, 2], atol=1e-6)


def test_vol4d_dataset_windows(data_root):
    ds = AcdcVolumeVSRDataset(data_dir=data_root / "videos", type="train",
                              downscale_factor=2, transforms=[{"name": "ToTensor"}],
                              num_frames=3)
    assert len(ds) == 2 * 6
    s = ds.__getitem__(0)
    assert s["lr_vols"].shape == (3, 12, 12, 3, 1)
    assert s["hr_vols"].shape == (3, 24, 24, 3, 1)
    valid = AcdcVolumeVSRDataset(data_dir=data_root / "videos", type="valid",
                                 downscale_factor=2, transforms=[{"name": "ToTensor"}],
                                 num_frames=3)
    assert len(valid) == 2  # whole sequences per patient
    s = valid.__getitem__(0)
    assert s["lr_vols"].shape == (6, 12, 12, 3, 1)


def test_vol4d_trainer(data_root, tmp_path):
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import Acdc4DSRTrainer

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    augments = [
        {"name": "RandomHorizontalFlip"},
        {"name": "RandomCropPatch", "kwargs": {"size": [8, 8, 3], "ratio": 2}},
    ]
    train_ds = AcdcVolumeVSRDataset(data_dir=data_root / "videos", type="train",
                                    downscale_factor=2, transforms=transforms,
                                    augments=augments, num_frames=3)
    valid_ds = AcdcVolumeVSRDataset(data_dir=data_root / "videos", type="valid",
                                    downscale_factor=2, transforms=transforms,
                                    num_frames=3)
    trainer = Acdc4DSRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                          num_resblocks=1, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()
    assert (tmp_path / "ckpt" / "model_1.ckpt").exists()


def test_vol4d_predictor(data_root, tmp_path):
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, SliceSSIM
    from vsr_tpu.runner.predictors import Acdc4DSRPredictor

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    ds = AcdcVolumeVSRDataset(data_dir=data_root / "videos", type="valid",
                              downscale_factor=2, transforms=transforms,
                              num_frames=3)
    p = Acdc4DSRPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                          num_resblocks=1, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0],
        metric_fns=[PSNR(), SliceSSIM()],
        saved_dir=str(tmp_path / "v4"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["PSNR"]) and np.isfinite(log["SliceSSIM"])
    rows = (tmp_path / "v4" / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 2 * 6  # 2 patients x 6 frames
    from vsr_tpu.io.nifti import load_nifti

    vol = load_nifti(tmp_path / "v4" / "volumes" / "patient001" / "sequence_sr.nii.gz")
    assert vol.shape == (24, 24, 3, 6)


def test_vol4d_hoist_tail_exact_and_same_tree():
    """``hoist_tail`` (serving: upsample tail batched over T*N outside the
    T-scan — scripts/profile_vol4d_serving.py) computes the identical
    function with the IDENTICAL param tree, across upscale factors and
    the carry_f32 hybrid, so checkpoints interchange freely."""
    for factor, kw in [(2, {}), (4, {}),
                       (3, {"dtype": jnp.bfloat16, "carry_f32": True,
                            "unroll": 5})]:
        net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                            num_resblocks=2, upscale_factor=factor, **kw)
        hoist = net.clone(hoist_tail=True)
        x = jnp.asarray(np.random.default_rng(factor).random(
            (2, 5, 3, 8, 8, 1)), jnp.float32)
        p = net.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(
                    hoist.init(jax.random.PRNGKey(2), x)))
        a = net.apply(p, x).astype(jnp.float32)
        b = hoist.apply(p, x).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vol_fused_tail_exact_and_same_tree():
    """``fused_tail`` on the volumetric nets computes the final conv
    FOLDED through the last 2D-in-3D shuffle (ops/fused_tail.py 3D
    variant): exact up to float reassociation, identical param tree."""
    from vsr_tpu.models import Volume3DSRNet

    for f in (2, 3, 4):
        net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                            num_features=8, upscale_factor=f)
        fz = net.clone(fused_tail=True)
        x = jnp.asarray(np.random.default_rng(f).random((2, 3, 8, 8, 1)),
                        jnp.float32)
        p = net.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(
                    fz.init(jax.random.PRNGKey(1), x)))
        np.testing.assert_allclose(np.asarray(net.apply(p, x)),
                                   np.asarray(fz.apply(p, x)), atol=1e-6)
    for f in (2, 4):
        net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=8,
                            num_resblocks=2, upscale_factor=f)
        fz = net.clone(fused_tail=True, hoist_tail=True)
        x = jnp.asarray(np.random.default_rng(f).random((1, 5, 3, 8, 8, 1)),
                        jnp.float32)
        p = net.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(
                    fz.init(jax.random.PRNGKey(1), x)))
        np.testing.assert_allclose(np.asarray(net.apply(p, x)),
                                   np.asarray(fz.apply(p, x)), atol=1e-6)


def test_vol4d_remat_composes_with_tail_modes():
    """remat treats the step's mode string as a static argument
    (nn.remat static_argnums) — gradients flow for every tail mode."""
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 2, 8, 8, 1)),
                    jnp.float32)
    base = Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                         num_resblocks=1, upscale_factor=2)
    p = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(p, x)
    for kw in ({"remat": True}, {"remat": True, "hoist_tail": True},
               # the shipped 4D device-training config: folded tail
               # INSIDE the remat'd scan step, no hoist
               {"remat": True, "fused_tail": True},
               {"remat": True, "hoist_tail": True, "fused_tail": True}):
        net = base.clone(**kw)
        jax.grad(lambda pp: jnp.sum(net.apply(pp, x) ** 2))(p)  # no crash
        np.testing.assert_allclose(np.asarray(net.apply(p, x)),
                                   np.asarray(ref), atol=1e-6)
