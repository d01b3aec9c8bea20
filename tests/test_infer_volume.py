"""Volume-mode serving: the CLI serves the volumetric net families.

Volume3DSRNet/Volume4DSRNet (beyond-reference zoo members, PARITY.md)
serve through the same `vsr_tpu.infer` CLI as every other net: the
NIfTI's slice-major D*T frames regroup on device into T volumes of D
slices ("3d") or one (T, D, ...) scan sample ("4d"), and the SR frames
flatten back in input order. The pipeline must equal the direct net
apply composed with the prep stage.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.infer import make_pipeline, make_prep, run
from vsr_tpu.io.nifti import load_nifti, save_nifti
from vsr_tpu.models import Volume3DSRNet
from vsr_tpu.models.vol4d import Volume4DSRNet


def _args(**kw):
    defaults = dict(net="Volume3DSRNet",
                    net_kwargs='{"in_channels": 1, "out_channels": 1, '
                               '"num_resblocks": 1, "num_features": 4, '
                               '"upscale_factor": 2}',
                    checkpoint="", factor=2, dataset="acdc", gif=False,
                    bf16=False, int8=False, video=False, fused_tail=False,
                    mesh="", bucket_t=0, windows=0, window_order="middle",
                    chunk=0, psnr=False)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


@pytest.mark.parametrize("mode", ["3d", "4d"])
def test_volume_pipeline_matches_direct_apply(mode, rng):
    d, t, hr = 3, 4, 24
    frames = jnp.asarray(
        np.round(rng.random((d * t, hr, hr)) * 255), jnp.float32)
    if mode == "3d":
        net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                            num_features=4, upscale_factor=2)
    else:
        net = Volume4DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                            num_features=4, upscale_factor=2)
    prep = make_prep(2, "acdc", volume=(mode, t))
    lr, z = jax.jit(prep)(frames)
    params = net.init(jax.random.PRNGKey(0), z)

    pipe = make_pipeline(net, params, 2, "acdc", volume=(mode, t))
    lr_p, sr_p = pipe(frames)
    np.testing.assert_array_equal(np.asarray(lr_p), np.asarray(lr))

    out = net.apply(params, z)  # (T, D, H, W, 1) / (1, T, D, H, W, 1)
    if mode == "4d":
        out = out[0]
    out = jnp.swapaxes(out, 0, 1).reshape(d * t, hr, hr)
    mean, std = 54.089, 48.084
    ref = jnp.clip(jnp.round(out.astype(jnp.float32) * std + mean), 0, 255)
    np.testing.assert_allclose(np.asarray(sr_p), np.asarray(ref),
                               rtol=0, atol=1e-3)


def test_volume3d_chunked_is_exact(rng):
    d, t, hr = 2, 5, 24
    frames = jnp.asarray(
        np.round(rng.random((d * t, hr, hr)) * 255), jnp.float32)
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2)
    _, z = jax.jit(make_prep(2, "acdc", volume=("3d", t)))(frames)
    params = net.init(jax.random.PRNGKey(0), z)
    _, sr = make_pipeline(net, params, 2, "acdc", volume=("3d", t))(frames)
    _, sr_c = make_pipeline(net, params, 2, "acdc", volume=("3d", t),
                            chunk=2)(frames)
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(sr_c))


@pytest.mark.parametrize("net_name,mode", [("Volume3DSRNet", "3d"),
                                           ("Volume4DSRNet", "4d")])
def test_volume_cli_end_to_end(net_name, mode, tmp_path, rng):
    src = tmp_path / "raw"
    (src / "patientA").mkdir(parents=True)
    vol = np.round(rng.random((24, 24, 3, 4)) * 255).astype(np.float32)
    save_nifti(vol, src / "patientA" / "patientA_4d.nii.gz")

    out = tmp_path / "sr"
    stats = run(_args(net=net_name, input_dir=src, output_dir=out,
                      psnr=True))
    assert stats["volumes"] == 1 and stats["frames"] == 12
    sr = load_nifti(out / "patientA" / "patientA_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 3, 4)
    assert "psnr_mean" in stats


def test_volume_guards(tmp_path, rng):
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2)
    params = {"params": {}}
    with pytest.raises(ValueError, match="excludes"):
        make_pipeline(net, params, 2, "acdc", volume=("3d", 4), video_t=4)
    with pytest.raises(ValueError, match="chunk has no effect"):
        make_pipeline(net, params, 2, "acdc", volume=("4d", 4), chunk=2)
    src = tmp_path / "raw"
    (src / "p").mkdir(parents=True)
    save_nifti(np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32),
               src / "p" / "p_4d.nii.gz")
    with pytest.raises(SystemExit, match="video"):
        run(_args(net="Volume3DSRNet", video=True, input_dir=src,
                  output_dir=tmp_path / "out"))


def test_volume3d_int8_pipeline_close(rng):
    """Weight-only int8 covers the 3D conv kernels (name+ndim rule in
    quantize._is_kernel) — the volume pipeline serves --int8 too."""
    d, t, hr = 2, 4, 24
    frames = jnp.asarray(
        np.round(rng.random((d * t, hr, hr)) * 255), jnp.float32)
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=8, upscale_factor=2)
    _, z = jax.jit(make_prep(2, "acdc", volume=("3d", t)))(frames)
    params = net.init(jax.random.PRNGKey(0), z)
    _, sr = make_pipeline(net, params, 2, "acdc", volume=("3d", t))(frames)
    _, sr_q = make_pipeline(net, params, 2, "acdc", volume=("3d", t),
                            int8=True)(frames)
    # Same uint8-valued outputs within a couple of grey levels.
    diff = np.abs(np.asarray(sr) - np.asarray(sr_q))
    assert diff.max() <= 2.0, diff.max()
