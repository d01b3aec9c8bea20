"""Serving autotuner (vsr_tpu.tune) + --preset-file plumbing.

The tuner sweeps exact serving knobs on the local backend and writes a
{net: preset_entry} JSON; load_preset_file/serving_config(overrides=...)
make that file override the shipped v5e table. The reference has no
serving tuning story (batch-1 test configs only).
"""

import argparse
import json

import numpy as np
import pytest

from vsr_tpu.presets import load_preset_file, serving_config
from vsr_tpu.tune import run as tune_run


def _args(tmp_path, **kw):
    defaults = dict(net="EDSRNet",
                    net_kwargs='{"in_channels": 1, "out_channels": 1, '
                               '"num_resblocks": 1, "num_features": 4, '
                               '"upscale_factor": 2}',
                    checkpoint="", shape="6,24,24", factor=2,
                    dataset="acdc", video_t=0, windows=0, seq_t=0,
                    window_order="middle", bf16=False,
                    chunk_grid="0,3", repeats=1,
                    out=str(tmp_path / "tuned.json"))
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_tune_edsr_writes_preset_file(tmp_path):
    out = tune_run(_args(tmp_path))
    # fused_tail x {0, 3} chunk = 4 measured rows, all successful.
    ok = [r for r in out["measured"] if "error" not in r]
    assert len(ok) == 4
    data = json.loads((tmp_path / "tuned.json").read_text())
    entry = data["presets"]["EDSRNet"]
    # EVERY swept knob is written explicitly (chunk 0 / fused_tail False
    # included) so the per-net merge below can't resurrect shipped values
    # the sweep measured against.
    assert "chunk" in entry and "net_kwargs" in entry
    assert "fused_tail" in entry["net_kwargs"]
    # The file round-trips through the --preset-file loader; swept knobs
    # take the measured values, unswept shipped knobs (volumes_per_call,
    # fast-level w8a8) survive the merge.
    overrides = load_preset_file(str(tmp_path / "tuned.json"))
    cfg = serving_config("EDSRNet", "tuned", overrides=overrides)
    if entry["chunk"]:
        assert cfg["chunk"] == entry["chunk"]
    assert cfg["net_kwargs"]["fused_tail"] == \
        entry["net_kwargs"]["fused_tail"]
    assert cfg["volumes_per_call"] == 4  # shipped knob survives
    assert "w8a8" in serving_config("EDSRNet", "fast", overrides=overrides)


def test_tune_volume_net(tmp_path):
    out = tune_run(_args(
        tmp_path, net="Volume3DSRNet",
        net_kwargs='{"in_channels": 1, "out_channels": 1, '
                   '"num_resblocks": 1, "num_features": 4, '
                   '"upscale_factor": 2}',
        shape="8,24,24", seq_t=4, chunk_grid="0,2"))
    ok = [r for r in out["measured"] if "error" not in r]
    # Round 5: the 3D net gained fused_tail, so the sweep A/Bs it too
    # (fused x {0, 2} chunk = 4 rows).
    assert len(ok) == 4
    data = json.loads((tmp_path / "tuned.json").read_text())
    assert "fused_tail" in data["presets"]["Volume3DSRNet"]["net_kwargs"]


def test_tune_guards(tmp_path):
    with pytest.raises(SystemExit, match="seq-t"):
        tune_run(_args(tmp_path, windows=5))
    with pytest.raises(SystemExit, match="N,H,W"):
        tune_run(_args(tmp_path, shape="6,24"))
    with pytest.raises(SystemExit, match="multiple"):
        tune_run(_args(tmp_path, video_t=4, net="DRFNet",
                       net_kwargs='{"in_channels": 1, "out_channels": 1, '
                                  '"num_features": 4, "num_groups": 1, '
                                  '"upscale_factor": 2}'))


def test_load_preset_file_rejects_junk(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"EDSRNet": "not-a-dict"}))
    with pytest.raises(ValueError, match="preset_entry"):
        load_preset_file(str(bad))


def test_serving_config_override_unknown_net(tmp_path):
    """A preset-file can add nets the shipped table doesn't know."""
    overrides = {"MyCustomNet": {"chunk": 7}}
    cfg = serving_config("MyCustomNet", "tuned", overrides=overrides)
    assert cfg == {"chunk": 7}
    # ... including through apply_preset_to_args at level 'fast' (this
    # used to KeyError on the raw SERVING_PRESETS index).
    from vsr_tpu.presets import apply_preset_to_args

    ns = argparse.Namespace(net="MyCustomNet", net_kwargs="", chunk=0,
                            mesh="", video=False, windows=0, seq_t=0,
                            w8a8=False, w8a8_scales="", w8a8_kernels="")
    apply_preset_to_args(ns, "fast", overrides=overrides)
    assert ns.chunk == 7


def test_tune_windows_divisibility_guard(tmp_path):
    with pytest.raises(SystemExit, match="multiple of --seq-t"):
        tune_run(_args(tmp_path, net="DUFNet", windows=5, seq_t=4,
                       shape="7,24,24",
                       net_kwargs='{"in_channels": 1, "out_channels": 1, '
                                  '"num_frames": 5, "size_filter": 3, '
                                  '"upscale_factor": 2}'))


def test_tune_moe_sweeps_dispatch(tmp_path):
    """MoE nets sweep dispatch_impl (sparse vs dense) alongside
    fused_tail x chunk, and the best entry pins it explicitly."""
    out = tune_run(_args(
        tmp_path, net="MoEEDSRNet",
        net_kwargs='{"in_channels": 1, "out_channels": 1, '
                   '"num_resblocks": 2, "num_features": 4, '
                   '"upscale_factor": 2, "num_experts": 2, '
                   '"group_size": 36, "moe_every": 1}'))
    ok = [r for r in out["measured"] if "error" not in r]
    # fused_tail x dispatch x chunk = 2 * 2 * 2 rows.
    assert len(ok) == 8
    assert {r["dispatch_impl"] for r in ok} == {"sparse", "dense"}
    entry = json.loads(
        (tmp_path / "tuned.json").read_text())["presets"]["MoEEDSRNet"]
    assert entry["net_kwargs"]["dispatch_impl"] in ("sparse", "dense")
    assert "fused_tail" in entry["net_kwargs"]


def test_tune_moe_radix_router_sweeps_dense_only(tmp_path):
    """router_impl='radix' refuses sparse dispatch (models/moe.py holds the
    ONLY copy of the legality rules); the sweep records the refusal as
    per-chunk error rows instead of crashing the whole run."""
    out = tune_run(_args(
        tmp_path, net="MoEEDSRNet",
        net_kwargs='{"in_channels": 1, "out_channels": 1, '
                   '"num_resblocks": 2, "num_features": 4, '
                   '"upscale_factor": 2, "num_experts": 2, '
                   '"group_size": 36, "moe_every": 1, '
                   '"router_impl": "radix"}'))
    ok = [r for r in out["measured"] if "error" not in r]
    assert ok and {r["dispatch_impl"] for r in ok} == {"dense"}
    # The refused radix x sparse combo is RECORDED (per chunk point, same
    # row schema as timing failures), not silently pruned from the grid.
    bad = [r for r in out["measured"] if "error" in r]
    assert bad and all(r["dispatch_impl"] == "sparse" and "chunk" in r
                       for r in bad)


def test_tune_train_vol4d(tmp_path):
    """--train handles 4D nets: rank-5 --train-shape (M,T,D,H,W) buffers
    drive the standalone DeviceEpochTrainer (round-5; previously only the
    config-driven mixin accepted rank-6 buffers)."""
    from vsr_tpu.tune import run_train

    args = argparse.Namespace(
        net="Volume4DSRNet",
        net_kwargs='{"in_channels": 1, "out_channels": 1, '
                   '"num_features": 4, "num_resblocks": 1, '
                   '"upscale_factor": 2}',
        factor=2, train_shape="8,3,4,16,16", batch=2, patch=8, steps=2,
        ga_grid="1", repeats=1, out=str(tmp_path / "train_tuned.json"))
    out = run_train(args)
    ok = [r for r in out["measured"] if "error" not in r]
    # unroll {1, T=3} x dtype {f32, bf16, bf16+carry} = 6 rows.
    assert len(ok) == 6
    assert all(np.isfinite(r["steps_per_sec"]) for r in ok)
    data = json.loads((tmp_path / "train_tuned.json").read_text())
    assert "Volume4DSRNet" in data["train_presets"]
