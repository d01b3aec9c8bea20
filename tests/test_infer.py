import argparse

import numpy as np

from vsr_tpu.infer import run
from vsr_tpu.io.nifti import load_nifti, save_nifti


def _args(**kw):
    """Namespace with the FULL serving-CLI flag surface (keep in sync with
    vsr_tpu.infer.main's argparse)."""
    defaults = dict(net="Bicubic", net_kwargs='{"upscale_factor": 2}',
                    checkpoint="", factor=2, dataset="acdc", gif=True,
                    bf16=False, int8=False, video=False, fused_tail=False,
                    mesh="", bucket_t=0, windows=0, window_order="middle",
                    chunk=0, psnr=False)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_infer_bicubic_end_to_end(tmp_path, rng):
    src = tmp_path / "raw"
    (src / "patientA").mkdir(parents=True)
    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    save_nifti(vol, src / "patientA" / "patientA_4d.nii.gz")

    out = tmp_path / "sr"
    stats = run(_args(input_dir=src, output_dir=out))
    assert stats["volumes"] == 1 and stats["frames"] == 6

    sr = load_nifti(out / "patientA" / "patientA_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 3)  # x2 SR of the x2-degraded LR
    assert sr.min() >= 0 and sr.max() <= 255
    gifs = list((out / "patientA").glob("*.gif"))
    assert len(gifs) == 2


def test_infer_with_trained_checkpoint(tmp_path, rng):
    """Checkpoint interop: trainer-saved ckpt loads into the serving CLI."""
    from tests.synth import make_processed_tree
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcSISRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import AcdcSISRTrainer

    root = make_processed_tree(tmp_path / "tree", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=4,
                               hr_size=24)
    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    net_kwargs = dict(in_channels=1, out_channels=1, num_resblocks=1,
                      num_features=4, upscale_factor=2)
    trainer = AcdcSISRTrainer(
        train_dataloader=Dataloader(
            AcdcSISRDataset(data_dir=root / "imgs", type="train",
                            downscale_factor=2, transforms=transforms,
                            augments=[{"name": "RandomCropPatch",
                                       "kwargs": {"size": [8, 8], "ratio": 2}}]),
            batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(
            AcdcSISRDataset(data_dir=root / "imgs", type="valid",
                            downscale_factor=2, transforms=transforms),
            batch_size=1),
        net=EDSRNet(**net_kwargs),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()

    src = tmp_path / "raw" / "p"
    src.mkdir(parents=True)
    vol = np.round(rng.random((24, 24, 1, 2)) * 255).astype(np.float32)
    save_nifti(vol, src / "p_4d.nii.gz")
    import json

    stats = run(_args(
        input_dir=tmp_path / "raw", output_dir=tmp_path / "sr",
        net="EDSRNet", net_kwargs=json.dumps(net_kwargs),
        checkpoint=str(tmp_path / "ckpt" / "model_best.ckpt"), gif=False,
    ))
    assert stats["frames"] == 2
    sr = load_nifti(tmp_path / "sr" / "p" / "p_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 1, 2)


def test_infer_video_mode_flagship(tmp_path, rng):
    """--video serves a whole-sequence VSR net (DRFNet) through the CLI path,
    keeping every SR frame."""
    import argparse

    import numpy as np

    from tests.synth import make_processed_tree  # noqa: F401 (env parity)
    from vsr_tpu.infer import run
    from vsr_tpu.io.nifti import load_nifti, save_nifti

    vol = np.round(rng.random((24, 24, 2, 4)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    stats = run(_args(
        input_dir=tmp_path / "in", output_dir=tmp_path / "out",
        net="DRFNet",
        net_kwargs='{"in_channels":1,"out_channels":1,"num_features":4,'
                   '"num_groups":1,"upscale_factor":2}',
        gif=False, video=True))
    assert stats["frames"] == 8
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 4)  # every frame SR'd, geometry preserved
    assert np.isfinite(sr).all()


def test_infer_flag_composition(tmp_path, rng):
    """--video + --int8 + fused_tail compose in one serving pipeline."""
    import argparse

    import numpy as np

    from vsr_tpu.infer import run
    from vsr_tpu.io.nifti import load_nifti, save_nifti

    vol = np.round(rng.random((24, 24, 1, 4)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    stats = run(_args(
        input_dir=tmp_path / "in", output_dir=tmp_path / "out",
        net="DRFNet",
        net_kwargs='{"in_channels":1,"out_channels":1,"num_features":4,'
                   '"num_groups":1,"upscale_factor":2}',
        gif=False, int8=True, video=True, fused_tail=True))
    assert stats["frames"] == 4
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 1, 4) and np.isfinite(sr).all()


def test_infer_video_bucketed_t(tmp_path, rng):
    """--bucket-t: volumes with different T share ONE compiled program and
    the causal pad-then-slice output equals the per-T exact serving."""
    kw = ('{"in_channels":1,"out_channels":1,"num_features":4,'
          '"num_groups":1,"upscale_factor":2}')
    for name, t in (("pA", 3), ("pB", 4)):
        (tmp_path / "in" / name).mkdir(parents=True)
        vol = np.round(rng.random((24, 24, 2, t)) * 255).astype(np.float32)
        save_nifti(vol, tmp_path / "in" / name / f"{name}_4d.nii.gz")

    exact = run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "o1",
                      net="DRFNet", net_kwargs=kw, video=True))
    bucketed = run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "o2",
                         net="DRFNet", net_kwargs=kw, video=True, bucket_t=4))
    assert exact["programs"] == 2 and bucketed["programs"] == 1
    assert bucketed["frames"] == exact["frames"] == 14
    for name in ("pA", "pB"):
        a = load_nifti(tmp_path / "o1" / name / f"{name}_4d_sr.nii.gz")
        b = load_nifti(tmp_path / "o2" / name / f"{name}_4d_sr.nii.gz")
        np.testing.assert_array_equal(a, b)  # causality => bitwise equal


def test_infer_misr_windows(tmp_path, rng):
    """--windows serves a MISR net through the CLI: every output frame comes
    from one circular temporal window (reference acdc_misr_dataset.py:53-68),
    matching a manual per-window application exactly."""
    import jax
    import jax.numpy as jnp

    from vsr_tpu.models import RBPNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    vol = np.round(rng.random((24, 24, 2, 4)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")

    kwargs = dict(in_channels=1, out_channels=1, base_filter=8, feat=8,
                  num_stages=2, num_resblocks=1, num_frames=3,
                  upscale_factor=2)
    import json
    stats = run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "out",
                      net="RBPNet", net_kwargs=json.dumps(kwargs),
                      gif=False, windows=3))
    assert stats["frames"] == 8 and stats["programs"] == 1
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 4) and np.isfinite(sr).all()

    # Manual oracle: same normalize/degrade, explicit middle-ordered windows.
    net = RBPNet(**kwargs)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 12, 12, 1)))
    frames = np.moveaxis(vol.reshape(24, 24, 8), -1, 0)
    lr = np.asarray(kspace_downscale_jax(jnp.asarray(frames), 2))
    z = ((lr - 54.089) / (48.084 + 1e-10))[..., None].reshape(2, 4, 12, 12, 1)
    outs = []
    for d in range(2):
        for t in range(4):
            idx = [(t - 1) % 4, t, (t + 1) % 4]
            win = z[d, idx][None]
            o = np.asarray(net.apply(params, jnp.asarray(win)))[0]
            outs.append(o)
    oracle = np.clip(np.round(np.stack(outs)[..., 0] * 48.084 + 54.089), 0, 255)
    got = np.moveaxis(sr.reshape(24, 24, 8), -1, 0)
    np.testing.assert_array_equal(got, oracle)


def test_infer_misr_windows_batchnorm_net(tmp_path, rng):
    """--windows with a BatchNorm net (DUF): the train=False flag threads
    through init and apply."""
    import json

    vol = np.round(rng.random((24, 24, 1, 3)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    stats = run(_args(
        input_dir=tmp_path / "in", output_dir=tmp_path / "out",
        net="DUFNet",
        net_kwargs=json.dumps(dict(in_channels=1, out_channels=1,
                                   num_frames=7, size_filter=3,
                                   upscale_factor=2)),
        gif=False, windows=7))
    assert stats["frames"] == 3
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 1, 3) and np.isfinite(sr).all()


def test_infer_feedback_net_takes_last_step(tmp_path, rng):
    """SRFBN/DRFSISR stack refinement steps on axis 0 — the CLI must serve
    the LAST step (predictors.py:287), not index into the batch axis
    (regression: sr[:, -1] crashed the reshape for these nets)."""
    import json

    import jax
    import jax.numpy as jnp

    from vsr_tpu.models import SRFBNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    vol = np.round(rng.random((24, 24, 2, 2)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")

    kwargs = dict(in_channels=1, out_channels=1, num_steps=2, num_features=8,
                  num_groups=2, upscale_factor=2)
    stats = run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "out",
                      net="SRFBNet", net_kwargs=json.dumps(kwargs), gif=False))
    assert stats["frames"] == 4
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 2)

    net = SRFBNet(**kwargs)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    frames = np.moveaxis(vol.reshape(24, 24, 4), -1, 0)
    lr = np.asarray(kspace_downscale_jax(jnp.asarray(frames), 2))
    z = ((lr - 54.089) / (48.084 + 1e-10))[..., None]
    steps = np.asarray(net.apply(params, jnp.asarray(z)))  # (steps, N, H, W, C)
    oracle = np.clip(np.round(steps[-1][..., 0] * 48.084 + 54.089), 0, 255)
    got = np.moveaxis(sr.reshape(24, 24, 4), -1, 0)
    np.testing.assert_array_equal(got, oracle)


def test_infer_even_window_target_alignment(tmp_path, rng):
    """Even MISR windows: the net's target slot is misr_target_index(nf) =
    nf//2 - 1, so the CLI's middle-ordered window for output frame t must
    place t at that slot (regression: nf//2 shifted every SR frame by one)."""
    import json

    import jax
    import jax.numpy as jnp

    from vsr_tpu.models import RBPNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    vol = np.round(rng.random((24, 24, 1, 4)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")

    kwargs = dict(in_channels=1, out_channels=1, base_filter=8, feat=8,
                  num_stages=2, num_resblocks=1, num_frames=4,
                  upscale_factor=2)
    run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "out",
              net="RBPNet", net_kwargs=json.dumps(kwargs), gif=False,
              windows=4))
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")

    net = RBPNet(**kwargs)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 12, 12, 1)))
    frames = np.moveaxis(vol.reshape(24, 24, 4), -1, 0)
    lr = np.asarray(kspace_downscale_jax(jnp.asarray(frames), 2))
    z = ((lr - 54.089) / (48.084 + 1e-10))[..., None]
    outs = []
    for t in range(4):
        # target slot = misr_target_index(4) = 1 -> window [t-1, t, t+1, t+2]
        idx = [(t - 1) % 4, t, (t + 1) % 4, (t + 2) % 4]
        o = np.asarray(net.apply(params, jnp.asarray(z[idx][None])))[0]
        outs.append(o)
    oracle = np.clip(np.round(np.stack(outs)[..., 0] * 48.084 + 54.089), 0, 255)
    got = np.moveaxis(sr.reshape(24, 24, 4), -1, 0)
    np.testing.assert_array_equal(got, oracle)


def test_infer_bucket_t_requires_video(tmp_path, rng):
    """--bucket-t without --video is an explicit error, not a silent no-op."""
    import pytest

    vol = np.round(rng.random((24, 24, 1, 3)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    with pytest.raises(SystemExit, match="--bucket-t requires --video"):
        run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "out",
                  bucket_t=4))


def test_infer_psnr_report(tmp_path, rng):
    """--psnr writes metrics.csv and a mean PSNR into the stats; bicubic SR
    of a smooth volume should land in a sane range."""
    import csv

    vol = np.round(rng.random((24, 24, 1, 2)) * 64 + 96).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    stats = run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "out",
                      gif=False, psnr=True))
    assert "psnr_mean" in stats and 5.0 < stats["psnr_mean"] < 60.0
    with open(tmp_path / "out" / "metrics.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["volume", "PSNR"] and len(rows) == 2
    assert abs(float(rows[1][1]) - stats["psnr_mean"]) < 1e-3


def test_infer_chunked_equals_unchunked(tmp_path, rng):
    """--chunk consumes frames/windows in lax.map chunks inside the program
    — outputs bitwise equal to the unchunked pipeline, including a chunk
    size that does NOT divide the frame count (edge-repeat pad + slice)."""
    import json

    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")

    kwargs = json.dumps(dict(in_channels=1, out_channels=1, num_steps=2,
                             num_features=4, num_groups=2, upscale_factor=2))
    run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "a",
              net="SRFBNet", net_kwargs=kwargs, gif=False))
    run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "b",
              net="SRFBNet", net_kwargs=kwargs, gif=False, chunk=4))
    a = load_nifti(tmp_path / "a" / "p1_4d_sr.nii.gz")
    b = load_nifti(tmp_path / "b" / "p1_4d_sr.nii.gz")
    np.testing.assert_array_equal(a, b)

    # Window (MISR) mode too.
    kwargs = json.dumps(dict(in_channels=1, out_channels=1, base_filter=8,
                             feat=8, num_stages=2, num_resblocks=1,
                             num_frames=3, upscale_factor=2))
    run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "c",
              net="RBPNet", net_kwargs=kwargs, gif=False, windows=3))
    run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "d",
              net="RBPNet", net_kwargs=kwargs, gif=False, windows=3, chunk=4))
    c = load_nifti(tmp_path / "c" / "p1_4d_sr.nii.gz")
    dd = load_nifti(tmp_path / "d" / "p1_4d_sr.nii.gz")
    np.testing.assert_array_equal(c, dd)


def test_infer_chunk_mesh_exclusive(tmp_path, rng):
    import pytest

    vol = np.round(rng.random((24, 24, 1, 2)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    with pytest.raises(SystemExit, match="mutually exclusive"):
        run(_args(input_dir=tmp_path / "in", output_dir=tmp_path / "out",
                  chunk=2, mesh="data=2"))


def test_infer_misr_flag_composition(tmp_path, rng):
    """--windows + --chunk + --bf16 + --int8 compose in one program."""
    import json

    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")
    stats = run(_args(
        input_dir=tmp_path / "in", output_dir=tmp_path / "out",
        net="RBPNet",
        net_kwargs=json.dumps(dict(in_channels=1, out_channels=1,
                                   base_filter=8, feat=8, num_stages=2,
                                   num_resblocks=1, num_frames=3,
                                   upscale_factor=2)),
        gif=False, windows=3, chunk=4, bf16=True, int8=True))
    assert stats["frames"] == 6
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 3) and np.isfinite(sr).all()
    assert sr.min() >= 0 and sr.max() <= 255
