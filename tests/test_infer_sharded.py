"""Mesh-sharded serving (parallel/serving.py + infer --mesh).

Runs on the 8-virtual-device CPU mesh from conftest; the same code path
partitions over real chips via ``python -m vsr_tpu.infer --mesh data=-1``.
"""

import argparse
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.infer import make_pipeline, run
from vsr_tpu.io.nifti import load_nifti, save_nifti
from vsr_tpu.models import EDSRNet
from vsr_tpu.parallel.mesh import make_mesh
from vsr_tpu.parallel.serving import parse_mesh_axes


def _args(**kw):
    defaults = dict(net="Bicubic", net_kwargs='{"upscale_factor": 2}',
                    checkpoint="", factor=2, dataset="acdc", gif=False,
                    bf16=False, int8=False, video=False, fused_tail=False,
                    mesh="", bucket_t=0)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_parse_mesh_axes():
    assert parse_mesh_axes("data=2,spatial=4") == {"data": 2, "spatial": 4}
    assert parse_mesh_axes("data=-1") == {"data": -1}
    assert parse_mesh_axes(" data = 3 ") == {"data": 3}


def test_parse_mesh_axes_rejects_bad_specs():
    with pytest.raises(ValueError, match="explicit size"):
        parse_mesh_axes("data")  # bare name is no longer a silent -1
    with pytest.raises(ValueError, match="Unknown mesh axis"):
        parse_mesh_axes("dta=2")  # typo'd axis name
    with pytest.raises(ValueError, match="Empty"):
        parse_mesh_axes(" , ")


def test_sharded_pipeline_matches_unsharded(rng):
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))

    ref_pipe = make_pipeline(net, params, 2, "acdc")
    mesh = make_mesh({"data": 2, "spatial": 2})
    sh_pipe = make_pipeline(net, params, 2, "acdc", mesh=mesh)

    # N=5 does not divide data=2 -> exercises the edge-repeat padding.
    frames = np.round(rng.random((5, 24, 24)) * 255).astype(np.float32)
    lr_ref, sr_ref = jax.tree_util.tree_map(np.asarray, ref_pipe(frames))
    lr_sh, sr_sh = jax.tree_util.tree_map(np.asarray, sh_pipe(frames))

    assert sr_sh.shape == sr_ref.shape == (5, 24, 24)
    assert lr_sh.shape == lr_ref.shape
    # The spatially-partitioned k-space matmuls may reassociate partial sums
    # across shards; after round() that is at most one grey level.
    assert np.abs(sr_sh - sr_ref).max() <= 1
    assert (sr_sh == sr_ref).mean() > 0.99
    np.testing.assert_allclose(lr_sh, lr_ref, atol=1e-3)


def test_sharded_w8a8_pipeline(rng):
    """W8A8 with precomputed static scales composes with mesh sharding
    (lazy w8a8=True calibration is rejected — it cannot trace under the
    partitioner); the sharded int8 output matches the unsharded one."""
    from vsr_tpu.infer import make_prep
    from vsr_tpu.quantize import calibrate_w8a8

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=16, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    frames = np.round(rng.random((5, 24, 24)) * 255).astype(np.float32)
    z = jax.jit(lambda h: make_prep(2, "acdc")(h)[1])(frames)
    cal = calibrate_w8a8(net, params, [z])
    assert cal

    mesh = make_mesh({"data": 2})
    ref = make_pipeline(net, params, 2, "acdc", w8a8=cal)
    sh = make_pipeline(net, params, 2, "acdc", w8a8=cal, mesh=mesh)
    _, sr_ref = jax.tree_util.tree_map(np.asarray, ref(frames))
    _, sr_sh = jax.tree_util.tree_map(np.asarray, sh(frames))
    assert sr_sh.shape == sr_ref.shape == (5, 24, 24)
    assert np.abs(sr_sh - sr_ref).max() <= 1
    assert (sr_sh == sr_ref).mean() > 0.99

    with pytest.raises(ValueError, match="lazy"):
        make_pipeline(net, params, 2, "acdc", w8a8=True, mesh=mesh)


def test_sharded_video_pipeline(rng):
    """Whole-sequence (VSR) serving shards by sequences: padding happens in
    whole-T units so the internal (D, T, ...) reshape stays aligned."""
    from vsr_tpu.models import DRFNet

    net = DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                 upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 12, 12, 1)))
    mesh = make_mesh({"data": 2})

    ref = make_pipeline(net, params, 2, "acdc", video_t=4)
    sh = make_pipeline(net, params, 2, "acdc", video_t=4, mesh=mesh)

    # 3 sequences of T=4 -> pads one whole sequence to reach 4.
    frames = np.round(rng.random((12, 24, 24)) * 255).astype(np.float32)
    _, sr_ref = jax.tree_util.tree_map(np.asarray, ref(frames))
    _, sr_sh = jax.tree_util.tree_map(np.asarray, sh(frames))
    assert sr_sh.shape == sr_ref.shape == (12, 24, 24)
    assert np.abs(sr_sh - sr_ref).max() <= 1
    assert (sr_sh == sr_ref).mean() > 0.99


def test_sharded_video_rejects_partial_sequences(rng):
    from vsr_tpu.models import DRFNet

    net = DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                 upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 12, 12, 1)))
    pipe = make_pipeline(net, params, 2, "acdc", video_t=4,
                         mesh=make_mesh({"data": 2}))
    frames = np.zeros((10, 24, 24), np.float32)  # not a multiple of T=4
    try:
        pipe(frames)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "whole sequences" in str(e)


def test_infer_cli_mesh_end_to_end(tmp_path, rng):
    """--mesh through the serving CLI: EDSR over data=2,spatial=2."""
    src = tmp_path / "raw" / "p"
    src.mkdir(parents=True)
    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    save_nifti(vol, src / "p_4d.nii.gz")

    stats = run(_args(
        input_dir=tmp_path / "raw", output_dir=tmp_path / "sr",
        net="EDSRNet",
        net_kwargs=json.dumps(dict(in_channels=1, out_channels=1,
                                   num_resblocks=1, num_features=4,
                                   upscale_factor=2)),
        mesh="data=2,spatial=2"))
    assert stats["frames"] == 6
    sr = load_nifti(tmp_path / "sr" / "p" / "p_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 3) and np.isfinite(sr).all()
