"""Predictor coverage for the SRFB (step-stack) and MISR variants, and the
VSR predictor with a tuple-output (FRVSR-style) net."""

import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.data.datasets import AcdcMISRDataset, AcdcSISRDataset, AcdcVSRDataset
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import DRFSISRNet, FRVSRNet, TOFlowNet
from vsr_tpu.runner.predictors import (
    AcdcMISRPredictor,
    AcdcSISRSRFBPredictor,
    AcdcVSRPredictor,
)

TRANSFORMS = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pred_more")
    return make_processed_tree(root, types=("test",), patients_per_type=1,
                               slices=2, frames=4, hr_size=16)


def test_srfb_predictor(data_root, tmp_path):
    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="test",
                         downscale_factor=2, transforms=TRANSFORMS)
    p = AcdcSISRSRFBPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                       num_features=4, num_groups=1, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "srfb"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["Loss"]) and np.isfinite(log["PSNR"])
    assert (tmp_path / "srfb" / "results.csv").exists()
    # Exported images are HR-sized (last step of the stack).
    pngs = list((tmp_path / "srfb" / "imgs").glob("**/*.png"))
    assert len(pngs) == len(ds)


def test_misr_predictor(data_root, tmp_path):
    ds = AcdcMISRDataset(data_dir=data_root / "videos", type="test",
                         downscale_factor=2, transforms=TRANSFORMS, num_frames=3)
    p = AcdcMISRPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=TOFlowNet(in_channels=1, out_channels=1, num_frames=3, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "misr"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["PSNR"])
    gifs = list((tmp_path / "misr" / "videos").glob("**/*.gif"))
    assert len(gifs) == 2  # both sequences incl. trailing flush


def test_vsr_predictor_with_tuple_output_net(data_root, tmp_path):
    ds = AcdcVSRDataset(data_dir=data_root / "videos", type="test",
                        downscale_factor=2, transforms=TRANSFORMS, num_frames=3)
    p = AcdcVSRPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                     num_resblocks=1),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "frvsr"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["PSNR"])
    rows = (tmp_path / "frvsr" / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 2 * 4  # header + 2 sequences x 4 frames


# ------------------------------------------------------------------
# Per-sequence batched evaluation (VERDICT round-2 item #6): the
# O(#sequences)-dispatch path must reproduce the per-frame path exactly.
# ------------------------------------------------------------------


def _run_both_paths(make_predictor, tmp_path):
    import csv

    logs, csvs = [], []
    for mode, name in [(True, "seq"), (False, "frame")]:
        p = make_predictor(tmp_path / name, mode)
        logs.append(p.predict())
        with open(tmp_path / name / "results.csv", newline="") as f:
            csvs.append(list(csv.reader(f)))
    return logs, csvs


def _assert_identical(logs, csvs, tmp_path):
    """Pixels byte-identical; float CSV/log values to f32 round-off.

    True byte-identity of raw-float loss columns is impossible: XLA unrolls
    short loops and re-fuses the loss reduction per trip count (see the
    ImagePredictor docstring); names and rounded-pixel artifacts must still
    match EXACTLY, floats to a few ulps."""
    names0 = [r[0] for r in csvs[0]]
    names1 = [r[0] for r in csvs[1]]
    assert names0 == names1
    vals0 = np.asarray([[float(x) for x in r[1:]] for r in csvs[0][1:]])
    vals1 = np.asarray([[float(x) for x in r[1:]] for r in csvs[1][1:]])
    np.testing.assert_allclose(vals0, vals1, rtol=3e-6, atol=1e-6)
    for k in logs[0]:
        np.testing.assert_allclose(logs[0][k], logs[1][k], rtol=3e-6,
                                   atol=1e-6, err_msg=k)
    seq_pngs = sorted(str(q.relative_to(tmp_path / "seq"))
                      for q in (tmp_path / "seq").glob("imgs/**/*.png"))
    frame_pngs = sorted(str(q.relative_to(tmp_path / "frame"))
                        for q in (tmp_path / "frame").glob("imgs/**/*.png"))
    assert seq_pngs == frame_pngs and seq_pngs
    for rel in seq_pngs:
        a = (tmp_path / "seq" / rel).read_bytes()
        b = (tmp_path / "frame" / rel).read_bytes()
        assert a == b, f"PNG differs: {rel}"
    gifs0 = sorted(str(q.relative_to(tmp_path / "seq"))
                   for q in (tmp_path / "seq").glob("videos/**/*.gif"))
    gifs1 = sorted(str(q.relative_to(tmp_path / "frame"))
                   for q in (tmp_path / "frame").glob("videos/**/*.gif"))
    assert gifs0 == gifs1 and gifs0
    for rel in gifs0:
        assert (tmp_path / "seq" / rel).read_bytes() == \
            (tmp_path / "frame" / rel).read_bytes(), f"GIF differs: {rel}"


def test_sisr_sequence_batch_identical(data_root, tmp_path):
    from vsr_tpu.models import EDSRNet

    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="test",
                         downscale_factor=2, transforms=TRANSFORMS)
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=2)
    from vsr_tpu.runner.predictors import AcdcSISRPredictor

    def make(saved, seq):
        return AcdcSISRPredictor(
            test_dataloader=Dataloader(ds, batch_size=1),
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0],
            metric_fns=[PSNR()], saved_dir=str(saved), exported=True,
            sequence_batch=seq, t_bucket=3)  # 4 frames -> pads to 6

    logs, csvs = _run_both_paths(make, tmp_path)
    assert len(csvs[0]) == 1 + len(ds)
    _assert_identical(logs, csvs, tmp_path)


def test_misr_sequence_batch_identical(data_root, tmp_path):
    ds = AcdcMISRDataset(data_dir=data_root / "videos", type="test",
                         downscale_factor=2, transforms=TRANSFORMS,
                         num_frames=3)
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3,
                    upscale_factor=2)

    def make(saved, seq):
        return AcdcMISRPredictor(
            test_dataloader=Dataloader(ds, batch_size=1),
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0],
            metric_fns=[PSNR()], saved_dir=str(saved), exported=True,
            sequence_batch=seq)

    logs, csvs = _run_both_paths(make, tmp_path)
    _assert_identical(logs, csvs, tmp_path)


def test_srfb_sequence_batch_identical(data_root, tmp_path):
    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="test",
                         downscale_factor=2, transforms=TRANSFORMS)
    net = DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                     num_features=4, num_groups=1, upscale_factor=2)

    def make(saved, seq):
        return AcdcSISRSRFBPredictor(
            test_dataloader=Dataloader(ds, batch_size=1),
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0],
            metric_fns=[PSNR()], saved_dir=str(saved), exported=True,
            sequence_batch=seq)

    logs, csvs = _run_both_paths(make, tmp_path)
    _assert_identical(logs, csvs, tmp_path)


def test_sequence_batch_net_outputs_bit_identical(data_root):
    """The lax.map net application reproduces the batch-1 net outputs
    EXACTLY (the ulp drift documented on ImagePredictor is confined to the
    in-program loss reductions, not the net)."""
    import jax
    import jax.numpy as jnp
    from vsr_tpu.models import EDSRNet

    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="test",
                         downscale_factor=2, transforms=TRANSFORMS)
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=2)
    xs = np.stack([np.asarray(ds.__getitem__(i, rng=None)["lr_img"])
                   for i in range(4)])
    params = net.init(jax.random.PRNGKey(7), jnp.asarray(xs[:1]))
    per_frame = jax.jit(lambda p, z: net.apply(p, z))
    seq = jax.jit(lambda p, zs: jax.lax.map(
        lambda z: net.apply(p, z[None])[0], zs))
    o_seq = np.asarray(seq(params, jnp.asarray(xs)))
    for i in range(4):
        o1 = np.asarray(per_frame(params, jnp.asarray(xs[i:i + 1])))[0]
        np.testing.assert_array_equal(o_seq[i], o1)
