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
    assert "EDSRNet" in data["presets"]
    # The file round-trips through the --preset-file loader and overrides
    # the shipped entry.
    overrides = load_preset_file(str(tmp_path / "tuned.json"))
    cfg = serving_config("EDSRNet", "tuned", overrides=overrides)
    assert cfg == {k: v for k, v in data["presets"]["EDSRNet"].items()}


def test_tune_volume_net(tmp_path):
    out = tune_run(_args(
        tmp_path, net="Volume3DSRNet",
        net_kwargs='{"in_channels": 1, "out_channels": 1, '
                   '"num_resblocks": 1, "num_features": 4, '
                   '"upscale_factor": 2}',
        shape="8,24,24", seq_t=4, chunk_grid="0,2"))
    ok = [r for r in out["measured"] if "error" not in r]
    assert len(ok) == 2  # no fused_tail kwarg on the 3D net


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
