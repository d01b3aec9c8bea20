"""Streaming (online/causal) serving parity vs the batch pipelines.

Every stream family must reproduce ``infer.make_pipeline``'s outputs
bit-for-bit: the recurrent streams run the SAME step modules with the scan
carry crossing call boundaries, and the window stream reassembles the SAME
circular windows (``acdc_misr_dataset.py:53-68`` protocol) frame by frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vsr_tpu.infer import make_pipeline
from vsr_tpu.models import DRFNet, DUFNet, EDSRNet, FRVSRNet
from vsr_tpu.ops.pixel_shuffle import pixel_shuffle
from vsr_tpu.stream import WindowStream, make_stream

D, T, H, W = 2, 7, 24, 24


@pytest.fixture(scope="module")
def hr():
    rng = np.random.default_rng(0)
    return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)


def _stream_video(net, params, hr_frames):
    stream = make_stream(net, params, factor=2)
    srs = []
    for t in range(T):
        _lr, sr = stream.push(hr_frames.reshape(D, T, H, W)[:, t])
        srs.append(np.asarray(sr))
    return np.stack(srs, axis=1).reshape(D * T, H, W)


@pytest.mark.parametrize("make_net", [
    lambda: DRFNet(in_channels=1, out_channels=1, num_features=8,
                   num_groups=2, upscale_factor=2),
    # Round-5 fix: the stream adapter mirrors the batch net's carry_f32
    # plumbing (InBlock out_f32 + f32 carry) — it recurred at bf16 before.
    lambda: DRFNet(in_channels=1, out_channels=1, num_features=8,
                   num_groups=2, upscale_factor=2, dtype=jnp.bfloat16,
                   carry_f32=True),
    lambda: FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                     num_resblocks=2, is_prediction=True),
], ids=["drf", "drf-hybrid", "frvsr"])
def test_recurrent_stream_matches_batch_pipeline(hr, make_net):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, H // 2, W // 2, 1)))
    _lr, sr_p = jax.jit(make_pipeline(net, params, 2, "acdc", video_t=T))(hr)
    sr_s = _stream_video(net, params, hr)
    if net.dtype is not None:
        # bf16: the one-scan batch program and the per-push programs
        # compile with different fusions — rounding-boundary pixels may
        # flip by 1 grey (0.3% here). The f32 carry itself is exact:
        # without the round-5 carry_f32 mirroring this diverges by many
        # greys as the bf16 recurrence compounds.
        assert np.max(np.abs(sr_s.astype(np.int32)
                             - np.asarray(sr_p, np.int32))) <= 1
    else:
        np.testing.assert_array_equal(sr_s, np.asarray(sr_p))


class TinyMISR(nn.Module):
    """Minimal (N, nf, h, w, 1) -> (N, H, W, 1) net to pin the window
    logic itself (real-net integration: the DUF test below)."""

    @nn.compact
    def __call__(self, x):
        n, nf, h, w, c = x.shape
        x = x.transpose(0, 2, 3, 1, 4).reshape(n, h, w, nf * c)
        return pixel_shuffle(nn.Conv(4, (3, 3), padding="SAME")(x), 2)


def _stream_windows(net, params, hr_frames, nf, order, train_flag=False):
    stream = make_stream(net, params, factor=2, windows=nf, order=order,
                         train_flag=train_flag)
    got = {}
    for t in range(T):
        out = stream.push(hr_frames.reshape(D, T, H, W)[:, t])
        if out is not None:
            got[out[0]] = np.asarray(out[2])
    for t_out, _lr, sr in stream.flush():
        assert t_out not in got, "boundary frame emitted twice"
        got[t_out] = np.asarray(sr)
    assert sorted(got) == list(range(T)), "missing output frames"
    return np.stack([got[t] for t in range(T)], axis=1).reshape(D * T, H, W)


@pytest.mark.parametrize("nf,order", [(5, "middle"), (4, "middle"),
                                      (5, "last"), (7, "middle")])
def test_window_stream_matches_batch_pipeline(hr, nf, order):
    net = TinyMISR()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, nf, H // 2, W // 2, 1)))
    _lr, sr_p = jax.jit(
        make_pipeline(net, params, 2, "acdc", window=(nf, T, order)))(hr)
    sr_s = _stream_windows(net, params, hr, nf, order)
    np.testing.assert_array_equal(sr_s, np.asarray(sr_p))


def test_window_stream_real_net(hr):
    """DUF (BatchNorm net: train flag threaded) through the window stream.
    nf=7: the _DenseLayer16 backbone's valid-padded 3D convs consume 6
    temporal frames (T -> T-6 -> 1)."""
    nf = 7
    net = DUFNet(in_channels=1, out_channels=1, num_frames=nf, size_filter=3,
                 upscale_factor=2, backbone="_DenseLayer16")
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, nf, H // 2, W // 2, 1)), train=False)
    _lr, sr_p = jax.jit(make_pipeline(net, params, 2, "acdc",
                                      window=(nf, T, "middle"),
                                      train_flag=True))(hr)
    sr_s = _stream_windows(net, params, hr, nf, "middle", train_flag=True)
    np.testing.assert_array_equal(sr_s, np.asarray(sr_p))


def test_frame_stream_matches_batch_pipeline(hr):
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H // 2, W // 2, 1)))
    _lr, sr_p = jax.jit(make_pipeline(net, params, 2, "acdc"))(hr)
    stream = make_stream(net, params, factor=2)
    srs = [np.asarray(stream.push(hr.reshape(D, T, H, W)[:, t])[1])
           for t in range(T)]
    sr_s = np.stack(srs, axis=1).reshape(D * T, H, W)
    np.testing.assert_array_equal(sr_s, np.asarray(sr_p))


def test_stream_geometry_guards(hr):
    net = TinyMISR()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 5, H // 2, W // 2, 1)))
    stream = make_stream(net, params, factor=2, windows=5)
    stream.push(np.zeros((D, H, W), np.float32))
    with pytest.raises(ValueError, match="geometry changed"):
        stream.push(np.zeros((D, H, W * 2), np.float32))
    with pytest.raises(ValueError, match="shorter than the window"):
        stream.flush()
    stream.reset()
    stream.push(np.zeros((D, H, W * 2), np.float32))  # ok after reset

    with pytest.raises(ValueError, match=r"\(N, H, W\)"):
        stream.push(np.zeros((H, W), np.float32))
    with pytest.raises(ValueError, match="middle.*last|order"):
        WindowStream(net, params, 2, "acdc", 5, order="center")


def test_recurrent_stream_reset_restarts_sequence(hr):
    """reset() must re-zero the carry: streaming the same frames twice
    gives identical outputs."""
    net = DRFNet(in_channels=1, out_channels=1, num_features=8,
                 num_groups=2, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, H // 2, W // 2, 1)))
    stream = make_stream(net, params, factor=2)
    first = [np.asarray(stream.push(hr.reshape(D, T, H, W)[:, t])[1])
             for t in range(3)]
    stream.reset()
    again = [np.asarray(stream.push(hr.reshape(D, T, H, W)[:, t])[1])
             for t in range(3)]
    np.testing.assert_array_equal(np.stack(first), np.stack(again))


def test_volume3d_stream_matches_batch_pipeline(hr):
    """Each push = one (D, H, W) time point through the 3D net; outputs
    bitwise equal to the batch volume pipeline's frames."""
    from vsr_tpu.models import Volume3DSRNet

    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, D, H // 2, W // 2, 1)))
    _, sr_batch = make_pipeline(net, params, 2, "acdc",
                                volume=("3d", T))(jnp.asarray(hr))
    stream = make_stream(net, params, factor=2)
    seq = hr.reshape(D, T, H, W)
    srs = [np.asarray(stream.push(seq[:, t])[1]) for t in range(T)]
    got = np.stack(srs, axis=1).reshape(D * T, H, W)
    np.testing.assert_array_equal(got, np.asarray(sr_batch))


@pytest.mark.parametrize("kw", [
    {},
    # Round-5 fix: the stream adapter must mirror the batch net's
    # hybrid-precision plumbing (f32 hidden carry + head out_dtype) —
    # it silently recurred at bf16 before.
    {"dtype": jnp.bfloat16, "carry_f32": True},
    {"hoist_tail": True, "fused_tail": True},
], ids=["f32", "hybrid", "tails"])
def test_volume4d_stream_matches_batch_pipeline(hr, kw):
    """The 4D net's time recurrence crosses push boundaries with the
    hidden volume carry in HBM — bitwise equal to the whole-scan scan
    (for the hoisted/fused batch tails the per-push step computes the
    same math modulo float reassociation: compared to 1 grey)."""
    from vsr_tpu.models.vol4d import Volume4DSRNet

    net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=4,
                        num_resblocks=1, upscale_factor=2, **kw)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, D, H // 2, W // 2, 1)))
    _, sr_batch = make_pipeline(net, params, 2, "acdc",
                                volume=("4d", T))(jnp.asarray(hr))
    stream = make_stream(net, params, factor=2)
    seq = hr.reshape(D, T, H, W)
    srs = [np.asarray(stream.push(seq[:, t])[1]) for t in range(T)]
    got = np.stack(srs, axis=1).reshape(D * T, H, W)
    if kw.get("hoist_tail"):
        assert np.max(np.abs(got.astype(np.int32)
                             - np.asarray(sr_batch, np.int32))) <= 1
    else:
        np.testing.assert_array_equal(got, np.asarray(sr_batch))


def test_volume_stream_rejects_windows(hr):
    from vsr_tpu.models import Volume3DSRNet

    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, D, H // 2, W // 2, 1)))
    with pytest.raises(ValueError, match="volume per push"):
        make_stream(net, params, factor=2, windows=5)
