"""Serving presets (vsr_tpu/presets.py): the measured per-net knobs become
a CLI/API feature.  Pure-Python logic tests + one CPU end-to-end plumb.

The preset VALUES are pinned to the on-chip measurements in BENCH.md
round 3 (zoo_serving*.json) — if a retune changes a number there, update
both places deliberately.
"""
import argparse
import json

import numpy as np
import pytest

from vsr_tpu.presets import (
    LEVELS,
    SERVING_PRESETS,
    apply_preset_to_args,
    serving_config,
)


def _infer_args(**kw):
    """vsr_tpu.infer-shaped namespace (subset test_infer.py pins)."""
    defaults = dict(net="EDSRNet", net_kwargs="", checkpoint="", factor=2,
                    dataset="acdc", gif=False, bf16=False, int8=False,
                    video=False, fused_tail=False, mesh="", bucket_t=0,
                    windows=0, window_order="middle", chunk=0, psnr=False,
                    w8a8=False, w8a8_scales="", w8a8_kernels="", preset="")
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def _serve_args(**kw):
    """vsr_tpu.serve-shaped namespace: no --w8a8 (static scales only),
    --video-t/--seq-t instead of --video."""
    defaults = dict(net="DUFNet", net_kwargs="", checkpoint="", factor=2,
                    dataset="acdc", bf16=False, int8=False, w8a8_scales="",
                    w8a8_kernels="", mesh="", video_t=0, windows=0,
                    seq_t=0, window_order="middle", chunk=0, preset="")
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def _export_args(**kw):
    defaults = dict(net="EDSRNet", net_kwargs="", checkpoint="", factor=2,
                    dataset="acdc", bf16=False, int8=False, w8a8=False,
                    w8a8_scales="", w8a8_kernels="", calib="",
                    calib_method="outputs", video_t=0, windows=0, seq_t=0,
                    window_order="middle", chunk=0, preset="")
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_every_zoo_net_has_a_preset_and_levels_resolve():
    import vsr_tpu.models  # noqa: F401  (populates the registry)
    from vsr_tpu.registry import get_class

    for name in ("Bicubic", "EDSRNet", "SRFBNet", "DRFSISRNet", "DRFNet",
                 "FRVSRNet", "TOFlowNet", "DUFNet", "RBPNet", "EDVRNet"):
        assert name in SERVING_PRESETS
        get_class("net", name)  # preset names stay real registered nets
        for level in LEVELS:
            serving_config(name, level)  # must not raise


def test_serving_config_values():
    assert serving_config("DUFNet", "fast") == {
        "windows": 7, "chunk": 100, "w8a8": True}
    assert serving_config("DUFNet", "tuned") == {"windows": 7, "chunk": 100}
    cfg = serving_config("EDSRNet", "fast")
    assert cfg["net_kwargs"] == {"fused_tail": True}
    # Engaged W8A8 serves its OWN measured grouping (vpc 8 = 18.6 vol/s
    # vs bf16's 16.6 at 4 — BENCH round-3 s5); tuned stays at 4.
    assert cfg["volumes_per_call"] == 8 and cfg["w8a8"] is True
    assert serving_config("EDSRNet", "tuned")["volumes_per_call"] == 4
    # scan-body net: quantization only with precomputed scales
    assert "w8a8" not in serving_config("SRFBNet", "fast")
    srfb = serving_config("SRFBNet", "fast", have_scales=True)
    assert srfb["w8a8"] == "scales" and srfb["w8a8_kernels"] == {6}
    # DRFNet never quantizes (regresses at every subset)
    assert "w8a8" not in serving_config("DRFNet", "fast", have_scales=True)
    # window length follows a user override of the net's window kwarg
    assert serving_config("DUFNet", "tuned",
                          net_kwargs={"num_frames": 5})["windows"] == 5
    assert serving_config("EDVRNet", "tuned",
                          net_kwargs={"nframes": 7})["windows"] == 7


def test_serving_config_rejects_unknown():
    with pytest.raises(ValueError, match="preset"):
        serving_config("NoSuchNet")
    with pytest.raises(ValueError, match="level"):
        serving_config("EDSRNet", "turbo")


def test_apply_infer_edsr_tuned_vs_fast():
    args = _infer_args()
    apply_preset_to_args(args, "tuned")
    assert json.loads(args.net_kwargs) == {"fused_tail": True}
    assert args.w8a8 is False and args.chunk == 0

    args = _infer_args()
    apply_preset_to_args(args, "fast")
    assert args.w8a8 is True and not args.w8a8_kernels


def test_apply_infer_explicit_flags_win():
    args = _infer_args(net="DUFNet", chunk=25,
                       net_kwargs='{"num_frames": 5}')
    apply_preset_to_args(args, "fast")
    assert args.chunk == 25           # user chunk kept
    assert args.windows == 5          # follows the num_frames override
    args2 = _infer_args(net="EDSRNet",
                        net_kwargs='{"fused_tail": false}')
    apply_preset_to_args(args2, "tuned")
    assert json.loads(args2.net_kwargs) == {"fused_tail": False}


def test_apply_infer_mesh_blocks_chunk_and_lazy_w8a8():
    args = _infer_args(net="DUFNet", mesh="data=2")
    notes = apply_preset_to_args(args, "fast")
    assert args.chunk == 0 and args.w8a8 is False
    assert any("mesh" in n for n in notes)


def test_apply_infer_scan_net_needs_scales(tmp_path):
    args = _infer_args(net="SRFBNet")
    notes = apply_preset_to_args(args, "fast")
    assert args.w8a8 is False and args.chunk == 60
    assert any("scan bodies" in n for n in notes)

    scales = tmp_path / "scales.json"
    scales.write_text('{"FB/Conv_0": 1.5}')
    args = _infer_args(net="SRFBNet", w8a8_scales=str(scales))
    apply_preset_to_args(args, "fast")
    assert args.w8a8_kernels == "6"   # selective k6-only W8A8


def test_apply_infer_video_nets():
    args = _infer_args(net="DRFNet")
    apply_preset_to_args(args, "fast")
    assert args.video is True
    assert json.loads(args.net_kwargs) == {"fused_tail": True}
    assert args.w8a8 is False         # DRF never quantizes
    # an explicit serving mode is respected
    args = _infer_args(net="DRFNet", windows=3)
    apply_preset_to_args(args, "tuned")
    assert args.video is False and args.windows == 3


def test_apply_preset_never_conflicts_with_user_mode_flags():
    # User forces --video on a windows+chunk preset net: the preset's
    # chunk must be skipped (run() rejects chunk+video), not applied.
    args = _infer_args(net="TOFlowNet", video=True)
    notes = apply_preset_to_args(args, "tuned")
    assert args.chunk == 0 and args.windows == 0
    assert any("chunk skipped" in n for n in notes)

    # User explicitly chunks a whole-sequence-preset net: the preset's
    # video switch must be skipped instead of erroring the user's flag.
    args = _infer_args(net="DRFNet", chunk=60)
    notes = apply_preset_to_args(args, "tuned")
    assert args.video is False and args.chunk == 60
    assert any("video skipped" in n for n in notes)


def test_apply_serve_namespace_static_scales_only():
    args = _serve_args(net="DUFNet")
    notes = apply_preset_to_args(args, "fast")
    assert args.chunk == 100
    assert not hasattr(args, "w8a8")  # never invents the flag
    assert any("static scales" in n for n in notes)
    assert args.windows == 0          # needs --seq-t here
    assert any("--seq-t" in n for n in notes)

    args = _serve_args(net="DUFNet", seq_t=12)
    apply_preset_to_args(args, "tuned")
    assert args.windows == 7

    args = _serve_args(net="FRVSRNet")
    notes = apply_preset_to_args(args, "tuned")
    assert args.video_t == 0          # fixed-T program: user must pick T
    assert any("--video-t" in n for n in notes)


def test_apply_export_namespace_calib_paths(tmp_path):
    args = _export_args(net="EDSRNet")
    notes = apply_preset_to_args(args, "fast")
    assert args.w8a8 is False and any("--calib" in n for n in notes)

    args = _export_args(net="EDSRNet", calib=str(tmp_path))
    apply_preset_to_args(args, "fast")
    assert args.w8a8 is True

    # scan-body net: calibrating from volumes needs the callback recorder
    args = _export_args(net="FRVSRNet", calib=str(tmp_path))
    notes = apply_preset_to_args(args, "fast")
    assert args.w8a8 is False
    assert any("callback" in n for n in notes)
    args = _export_args(net="FRVSRNet", calib=str(tmp_path),
                        calib_method="callback")
    apply_preset_to_args(args, "fast")
    assert args.w8a8 is True


def test_apply_unknown_net_is_clean_cli_error():
    with pytest.raises(SystemExit, match="preset"):
        apply_preset_to_args(_infer_args(net="NoSuchNet"), "tuned")


def test_volume_net_presets_exist():
    """The volumetric families carry measured presets (zoo round-3 s5;
    W8A8 added round 4: vol3d 1.22-1.32x bf16 at -0.001 dB via lazy
    calibration, vol4d needs precomputed callback scales)."""
    from vsr_tpu.presets import serving_config

    # vol4d round 5: hoist_tail moves the upsample tail out of the T-scan
    # (the in-scan thin out-conv made vpc>1 NEGATIVE) and fused_tail folds
    # the final conv through the shuffle; hoisted+fused keeps scaling —
    # vpc 8 = 14.3 vol/s = 1.62x the old vpc-1 row
    # (scripts/profile_vol4d_serving.py + round-5 re-sweep).
    for name, vpc in (("Volume3DSRNet", 4), ("Volume4DSRNet", 8)):
        cfg = serving_config(name, "tuned")
        assert cfg.get("volumes_per_call") == vpc
        assert cfg["net_kwargs"]["fused_tail"] is True
    assert serving_config("Volume4DSRNet", "tuned")["net_kwargs"][
        "hoist_tail"] is True
    fast3 = serving_config("Volume3DSRNet", "fast")
    assert fast3["w8a8"] is True
    # The int8 MXU's vpc optimum sits past bf16's: engaged-W8A8 serves
    # its OWN measured grouping (vpc 8 = 32.3 vol/s vs bf16's 25.4 at 4).
    assert fast3["volumes_per_call"] == 8
    # vol4d: never-quantize (0.60x measured — in-scan quantize/dequant
    # breaks the hidden-volume scan fusion), even with scales in hand.
    assert "w8a8" not in serving_config("Volume4DSRNet", "fast",
                                        have_scales=True)


def test_infer_preset_end_to_end(tmp_path, rng):
    """--preset tuned plumbs through the real serving CLI run() on CPU."""
    from vsr_tpu.infer import run
    from vsr_tpu.io.nifti import load_nifti, save_nifti

    src = tmp_path / "raw"
    (src / "patientA").mkdir(parents=True)
    vol = np.round(rng.random((24, 24, 1, 4)) * 255).astype(np.float32)
    save_nifti(vol, src / "patientA" / "patientA_4d.nii.gz")

    kwargs = dict(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=2)
    base = _infer_args(net="EDSRNet", net_kwargs=json.dumps(kwargs),
                       input_dir=src, output_dir=tmp_path / "plain")
    run(base)
    tuned = _infer_args(net="EDSRNet", net_kwargs=json.dumps(kwargs),
                        input_dir=src, output_dir=tmp_path / "tuned")
    apply_preset_to_args(tuned, "tuned")
    assert json.loads(tuned.net_kwargs)["fused_tail"] is True
    run(tuned)

    a = load_nifti(tmp_path / "plain" / "patientA" / "patientA_4d_sr.nii.gz")
    b = load_nifti(tmp_path / "tuned" / "patientA" / "patientA_4d_sr.nii.gz")
    np.testing.assert_allclose(a, b, atol=1e-4)  # fused tail is exact


def test_presets_match_zoo_bench_harness():
    """presets.py and scripts/bench_zoo_serving.py are two statements of
    the same on-chip measurements — pin them to each other so a retune in
    one place can't silently drift from the other."""
    import pathlib
    import sys

    scripts_dir = str(pathlib.Path(__file__).resolve().parents[1] / "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import bench_zoo_serving as zoo
    finally:
        sys.path.remove(scripts_dir)

    for name, _factor, task, net, opts in zoo.build_cases():
        preset = SERVING_PRESETS[name]
        assert preset.get("chunk") == opts.get("chunk"), name
        if task == "misr":
            assert preset.get("windows") == opts.get("win"), name
        if "vpc" in opts:
            assert preset.get("volumes_per_call") == opts["vpc"], name
        if task == "vsr":
            assert preset.get("video", False) or name == "Bicubic", name
        # fused-tail serving in the harness <-> preset net_kwargs
        harness_ft = bool(getattr(net, "fused_tail", False))
        preset_ft = bool(preset.get("net_kwargs", {}).get("fused_tail"))
        assert harness_ft == preset_ft, name
        # scan-body nets must not advertise lazy calibration
        if name in zoo.SCAN_NETS and "w8a8" in preset:
            assert preset["w8a8"] == "scales", name
