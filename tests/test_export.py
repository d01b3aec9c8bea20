"""Deployment export (.vsrx): serialized self-contained serving programs."""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.export import (
    ExportedServing,
    export_serving,
    make_serving_fn,
    save_artifact,
)
from vsr_tpu.models import DRFNet, EDSRNet, SRFBNet


def _roundtrip(tmp_path, net, shape, rng, **kw):
    lr_hw = (1, shape[-2] // 2, shape[-1] // 2, 1)
    if kw.get("video_t"):
        example = jnp.zeros((1, 2) + lr_hw[1:])
    else:
        example = jnp.zeros(lr_hw)
    params = net.init(jax.random.PRNGKey(0), example)
    blob, meta = export_serving(net, params, shape, 2, **kw)
    path = tmp_path / "m.vsrx"
    save_artifact(path, blob, meta)
    served = ExportedServing(path)
    x = jnp.asarray(np.round(rng.random(shape) * 255), jnp.float32)
    _, sr = served(x)
    _, ref = jax.jit(make_serving_fn(net, params, 2, "acdc", **kw))(x)
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(ref))
    return served


def test_export_roundtrip_edsr(tmp_path, rng):
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=2)
    served = _roundtrip(tmp_path, net, (6, 24, 24), rng)
    assert served.meta["factor"] == 2
    assert served.meta["frames_shape"] == [6, 24, 24]


def test_export_roundtrip_feedback_net(tmp_path, rng):
    """Feedback nets: the exported program serves the LAST step."""
    net = SRFBNet(in_channels=1, out_channels=1, num_steps=2, num_features=4,
                  num_groups=2, upscale_factor=2)
    _roundtrip(tmp_path, net, (4, 24, 24), rng)


def test_export_roundtrip_video_net(tmp_path, rng):
    """Whole-sequence VSR export (video_t baked into the program)."""
    net = DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=2,
                 upscale_factor=2)
    _roundtrip(tmp_path, net, (6, 24, 24), rng, video_t=3)


def test_export_roundtrip_moe(tmp_path, rng):
    """MoE export: routing (rank selection + dense dispatch) serializes
    through jax.export and serves treeless."""
    from vsr_tpu.models import MoEEDSRNet

    net = MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                     num_features=4, upscale_factor=2, num_experts=2,
                     group_size=36, moe_every=1, dispatch_impl="dense")
    _roundtrip(tmp_path, net, (4, 24, 24), rng)


def test_export_cli_and_run(tmp_path, rng):
    """The argparse surface: export an artifact, then serve a tree from it."""
    import argparse

    from vsr_tpu.export import _cmd_export, _cmd_run
    from vsr_tpu.io.nifti import load_nifti, save_nifti

    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")

    art = tmp_path / "edsr.vsrx"
    _cmd_export(argparse.Namespace(
        net="EDSRNet",
        net_kwargs=json.dumps(dict(in_channels=1, out_channels=1,
                                   num_resblocks=1, num_features=4,
                                   upscale_factor=2)),
        checkpoint="", factor=2, dataset="acdc", shape="6,24,24",
        video_t=0, bf16=False, platforms="", out=str(art)))
    assert art.exists()

    _cmd_run(argparse.Namespace(run=str(art), input_dir=tmp_path / "in",
                                output_dir=tmp_path / "out"))
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 3) and np.isfinite(sr).all()
    assert sr.min() >= 0 and sr.max() <= 255


def test_export_version_guard(tmp_path):
    path = tmp_path / "future.vsrx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("meta.json", json.dumps({"format_version": 999}))
        zf.writestr("program.stablehlo", b"")
    with pytest.raises(ValueError, match="newer"):
        ExportedServing(path)


def test_export_int8_artifact(tmp_path, rng):
    """--int8 bakes quantized weights in: artifact shrinks ~4x vs f32 and
    output stays within the int8 accuracy envelope of the direct pipeline."""
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    shape = (4, 24, 24)
    blob_f, meta_f = export_serving(net, params, shape, 2)
    blob_q, meta_q = export_serving(net, params, shape, 2, int8=True)
    assert meta_q["int8"] and not meta_f["int8"]
    assert len(blob_q) < 0.45 * len(blob_f)

    p = tmp_path / "q.vsrx"
    save_artifact(p, blob_q, meta_q)
    served = ExportedServing(p)
    x = jnp.asarray(np.round(rng.random(shape) * 255), jnp.float32)
    _, sr_q = served(x)
    _, sr_f = jax.jit(make_serving_fn(net, params, 2, "acdc"))(x)
    # int8 weights: small deviation allowed, not exactness.
    assert np.mean(np.abs(np.asarray(sr_q) - np.asarray(sr_f))) < 2.0


def test_export_w8a8_artifact(tmp_path, rng):
    """--w8a8 bakes static-scale int8-MXU convs in: the artifact output
    equals the direct W8A8 pipeline exactly, and lazy calibration
    (w8a8=True) is rejected — export is a static program."""
    from vsr_tpu.infer import make_prep
    from vsr_tpu.quantize import calibrate_w8a8

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    shape = (4, 24, 24)
    x = jnp.asarray(np.round(rng.random(shape) * 255), jnp.float32)
    z = jax.jit(lambda h: make_prep(2, "acdc")(h)[1])(x)
    cal = calibrate_w8a8(net, params, [z])
    assert cal

    blob, meta = export_serving(net, params, shape, 2, w8a8=cal)
    assert meta["w8a8_convs"] == len(cal)
    p = tmp_path / "w8a8.vsrx"
    save_artifact(p, blob, meta)
    served = ExportedServing(p)
    _, sr = served(x)
    _, ref = jax.jit(make_serving_fn(net, params, 2, "acdc", w8a8=cal))(x)
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(ref))
    # ... and the W8A8 program really differs from full precision.
    _, full = jax.jit(make_serving_fn(net, params, 2, "acdc"))(x)
    assert not np.array_equal(np.asarray(ref), np.asarray(full))

    with pytest.raises(ValueError, match="static"):
        make_serving_fn(net, params, 2, "acdc", w8a8=True)


def test_export_w8a8_cli_calibrates_from_volumes(tmp_path, rng):
    """The CLI surface: --w8a8 --calib <dir> calibrates activation scales
    from sample NIfTI volumes at export time; --w8a8-scales <json> bakes
    precomputed ones — both produce artifacts that serve."""
    import argparse

    from vsr_tpu.export import _cmd_export, _cmd_run
    from vsr_tpu.io.nifti import load_nifti, save_nifti

    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    (tmp_path / "in").mkdir()
    save_nifti(vol, tmp_path / "in" / "p1_4d.nii.gz")

    kwargs = json.dumps(dict(in_channels=1, out_channels=1, num_resblocks=1,
                             num_features=16, upscale_factor=2))
    art = tmp_path / "edsr_w8a8.vsrx"
    _cmd_export(argparse.Namespace(
        net="EDSRNet", net_kwargs=kwargs, checkpoint="", factor=2,
        dataset="acdc", shape="6,24,24", video_t=0, bf16=False,
        platforms="", out=str(art), w8a8=True, w8a8_scales="",
        calib=str(tmp_path / "in"), calib_method="outputs"))
    served = ExportedServing(art)
    assert served.meta["w8a8_convs"] > 0
    _cmd_run(argparse.Namespace(run=str(art), input_dir=tmp_path / "in",
                                output_dir=tmp_path / "out"))
    sr = load_nifti(tmp_path / "out" / "p1_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 3) and np.isfinite(sr).all()

    # Precomputed-scales file path (a real conv path — a dict matching no
    # conv in the net is now rejected instead of silently serving bf16).
    scales = {"Conv_0/Conv_0": 0.05}
    sf = tmp_path / "scales.json"
    sf.write_text(json.dumps(scales))
    art2 = tmp_path / "edsr_scales.vsrx"
    _cmd_export(argparse.Namespace(
        net="EDSRNet", net_kwargs=kwargs, checkpoint="", factor=2,
        dataset="acdc", shape="6,24,24", video_t=0, bf16=False,
        platforms="", out=str(art2), w8a8=False, w8a8_scales=str(sf),
        calib="", calib_method="outputs"))
    assert ExportedServing(art2).meta["w8a8_convs"] == 1

    # --w8a8 without scales or calib volumes is a hard error.
    with pytest.raises(SystemExit, match="scales"):
        _cmd_export(argparse.Namespace(
            net="EDSRNet", net_kwargs=kwargs, checkpoint="", factor=2,
            dataset="acdc", shape="6,24,24", video_t=0, bf16=False,
            platforms="", out=str(tmp_path / "x.vsrx"), w8a8=True,
            w8a8_scales="", calib="", calib_method="outputs"))


def test_export_batchnorm_misr_windows(tmp_path, rng):
    """BatchNorm MISR net (TOFlow) exports in circular-window mode: one SR
    frame per input frame (the reference MISR eval protocol — the same
    program infer --windows serves), batch_stats baked into the artifact."""
    from vsr_tpu.models import TOFlowNet

    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3,
                    upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 3, 12, 12, 1)), train=False)
    shape = (6, 24, 24)  # 2 slices x 3 frames
    window = (3, 3, "middle")
    blob, meta = export_serving(net, params, shape, 2, window=window,
                                train_flag=True)
    p = tmp_path / "toflow.vsrx"
    save_artifact(p, blob, meta)
    served = ExportedServing(p)
    assert served.meta["window"] == [3, 3, "middle"]
    x = jnp.asarray(np.round(rng.random(shape) * 255), jnp.float32)
    _, sr = served(x)
    assert np.asarray(sr).shape == (6, 24, 24)  # one SR frame per frame
    _, ref = make_serving_fn(net, params, 2, "acdc", window=window,
                             train_flag=True)(x)
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(ref))


def test_export_roundtrip_volume_net(tmp_path, rng):
    """Volumetric-net export: volume mode baked into the artifact."""
    from vsr_tpu.models import Volume3DSRNet

    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 12, 12, 1)))
    shape, volume = (6, 24, 24), ("3d", 3)
    blob, meta = export_serving(net, params, shape, 2, volume=volume)
    path = tmp_path / "vol.vsrx"
    save_artifact(path, blob, meta)
    served = ExportedServing(path)
    assert served.meta["volume"] == ["3d", 3]
    x = jnp.asarray(np.round(rng.random(shape) * 255), jnp.float32)
    _, sr = served(x)
    _, ref = jax.jit(make_serving_fn(net, params, 2, "acdc",
                                     volume=volume))(x)
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(ref))
