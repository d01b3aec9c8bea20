"""HTTP serving daemon tests (vsr_tpu/serve.py) — tiny artifact, CPU.

Covers: health/meta/metrics endpoints, npy and NIfTI request/response
round-trips against the direct ExportedServing result, frame-count
bridging (edge-padded chunking), shape routing, and error paths.
"""

from __future__ import annotations

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.export import ExportedServing, export_serving, save_artifact
from vsr_tpu.models import EDSRNet
from vsr_tpu.serve import make_server

N, H, W = 6, 24, 24  # HR frames the artifact is specialized to (24 = /12)
FACTOR = 2


def _make_artifact(tmp_path, frames=N, name="tiny.vsrx"):
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=FACTOR)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))
    blob, meta = export_serving(net, params, (frames, H, W), FACTOR)
    path = tmp_path / name
    save_artifact(path, blob, meta)
    return path


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    paths = [_make_artifact(tmp), _make_artifact(tmp, frames=2, name="b.vsrx")]
    srv = make_server(paths, port=0, warmup=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def _post_npy(server, arr, query=""):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        _url(server, "/v1/sr" + query), data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), resp.headers.get("Content-Type")


def test_healthz_and_meta(server):
    with urllib.request.urlopen(_url(server, "/healthz")) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert {tuple(a["frames_shape"]) for a in health["artifacts"]} == {
        (N, H, W), (2, H, W)}
    with urllib.request.urlopen(_url(server, "/v1/meta")) as resp:
        metas = json.loads(resp.read())
    assert len(metas) == 2 and metas[0]["factor"] == FACTOR


def test_sr_npy_matches_direct_call(server):
    rng = np.random.default_rng(0)
    frames = np.round(rng.random((N, H, W)) * 255).astype(np.float32)
    status, body, ctype = _post_npy(server, frames)
    assert status == 200 and ctype == "application/x-npy"
    sr = np.load(io.BytesIO(body))
    assert sr.shape == (N, H, W)  # SR comes back at the input HR geometry

    direct = ExportedServing(server.pool.paths[0])
    _, want = direct(frames)
    np.testing.assert_allclose(sr, np.asarray(want, np.float32),
                               rtol=0, atol=1e-5)


def test_sr_bridges_frame_count_with_padding(server):
    """A 10-frame volume routes to the 6-frame artifact (largest <= M) and
    is served in 2 edge-padded chunks; result equals direct chunked calls."""
    rng = np.random.default_rng(1)
    frames = np.round(rng.random((10, H, W)) * 255).astype(np.float32)
    before = server.metrics.padded_frames
    status, body, _ = _post_npy(server, frames)
    assert status == 200
    sr = np.load(io.BytesIO(body))
    assert sr.shape == (10, H, W)
    assert server.metrics.padded_frames == before + 2

    direct = ExportedServing(server.pool.paths[0])
    _, a = direct(frames[:6])
    _, b = direct(np.pad(frames[6:], ((0, 2), (0, 0), (0, 0)), mode="edge"))
    want = np.concatenate([np.asarray(a), np.asarray(b)[:4]], axis=0)
    np.testing.assert_allclose(sr, want.astype(np.float32),
                               rtol=0, atol=1e-5)


def test_sr_routes_exact_frame_match(server):
    """A 2-frame volume uses the 2-frame artifact — no padding."""
    before = server.metrics.padded_frames
    frames = np.zeros((2, H, W), np.float32)
    status, body, _ = _post_npy(server, frames)
    assert status == 200
    assert np.load(io.BytesIO(body)).shape == (2, H, W)
    assert server.metrics.padded_frames == before


def test_sr_nifti_roundtrip(server, tmp_path):
    from vsr_tpu.io.nifti import load_nifti, save_nifti

    rng = np.random.default_rng(2)
    vol = np.round(rng.random((H, W, 2, 3)) * 255).astype(np.float32)
    path = tmp_path / "vol.nii.gz"
    save_nifti(vol, path)
    req = urllib.request.Request(
        _url(server, "/v1/sr"), data=path.read_bytes(),
        headers={"Content-Type": "application/gzip"})
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        body = resp.read()
    out_path = tmp_path / "sr.nii.gz"
    out_path.write_bytes(body)
    sr = load_nifti(out_path)
    assert sr.shape == (H, W, 2, 3)
    assert np.isfinite(np.asarray(sr, np.float64)).all()


def test_sr_rejects_unknown_geometry(server):
    frames = np.zeros((4, 36, 36), np.float32)
    buf = io.BytesIO()
    np.save(buf, frames)
    req = urllib.request.Request(
        _url(server, "/v1/sr"), data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"})
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400
    assert "no artifact" in json.loads(err.value.read())["error"]


def test_sr_rejects_bad_body(server):
    req = urllib.request.Request(
        _url(server, "/v1/sr"), data=b"not a volume",
        headers={"Content-Type": "application/x-npy"})
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400


def test_sr_rejects_empty_volume(server):
    # A (0, H, W) npy is a malformed input (400), not an internal error:
    # without the _parse_volume guard it reaches np.concatenate([]) -> 500.
    with pytest.raises(urllib.error.HTTPError) as err:
        _post_npy(server, np.zeros((0, 16, 16), np.float32))
    assert err.value.code == 400


def test_batcher_refuses_contract_violations():
    from vsr_tpu.serve import _Batcher

    calls = []
    b = _Batcher(lambda x: (calls.append(x.shape), x * 2)[1],
                 cap=4, unit=2, wait_s=0.0, metrics_ref=lambda: None)
    # Over-cap and off-granule segments must raise, not hang the leader
    # loop on an empty dispatch prefix.
    with pytest.raises(ValueError):
        b.submit(np.zeros((6, 4, 4), np.float32))
    with pytest.raises(ValueError):
        b.submit(np.zeros((3, 4, 4), np.float32))
    with pytest.raises(ValueError):
        b.submit(np.zeros((0, 4, 4), np.float32))
    out = b.submit(np.ones((2, 4, 4), np.float32))
    assert out.shape == (2, 4, 4) and float(out[0, 0, 0]) == 2.0


def test_metrics_exposition(server):
    with urllib.request.urlopen(_url(server, "/metrics")) as resp:
        text = resp.read().decode()
    assert 'vsr_requests_total{endpoint="/v1/sr",status="200"}' in text
    assert "vsr_volumes_served_total" in text
    assert "vsr_sr_latency_seconds_count" in text
    assert text.rstrip().splitlines()[-1].startswith("vsr_inflight_requests")


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(_url(server, "/nope"))
    assert err.value.code == 404
    # Unknown paths share one counter label — a URL scanner must not grow
    # the metrics dict (or inject raw paths into the exposition).
    with urllib.request.urlopen(_url(server, "/metrics")) as resp:
        text = resp.read().decode()
    assert 'endpoint="<other>",status="404"' in text
    assert "/nope" not in text


def test_metrics_histogram_and_label_escaping():
    """Bucket counts are cumulative exactly once (observe stores per-bucket,
    render cumulates) and label values are Prometheus-escaped."""
    from vsr_tpu.serve import Metrics

    m = Metrics()
    m.observe("/v1/sr", 200, 0.01)
    m.observe("/v1/sr", 200, 0.5)
    text = m.render()
    assert 'vsr_sr_latency_seconds_bucket{le="0.05"} 1' in text
    assert 'vsr_sr_latency_seconds_bucket{le="0.25"} 1' in text
    assert 'vsr_sr_latency_seconds_bucket{le="1.0"} 2' in text
    assert 'vsr_sr_latency_seconds_bucket{le="+Inf"} 2' in text
    assert "vsr_sr_latency_seconds_count 2" in text

    m.observe('bad"path\nnew', 404, 0.0)
    escaped = m.render()
    assert 'endpoint="bad\\"path\\nnew"' in escaped
    assert 'bad"path\n' not in escaped


def test_live_mesh_pipeline_serving(tmp_path):
    """A live (net+checkpoint) pipeline sharded over a data x spatial mesh
    serves through the daemon and matches the direct mesh pipeline; /healthz
    reports its mesh; it pools alongside artifacts (routes by shape)."""
    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.parallel.mesh import make_mesh
    from vsr_tpu.serve import LivePipeline

    mesh = make_mesh({"data": 4, "spatial": 2})
    live = LivePipeline(net_name="EDSRNet",
                        net_kwargs={"in_channels": 1, "out_channels": 1,
                                    "num_resblocks": 1, "num_features": 4,
                                    "upscale_factor": FACTOR},
                        checkpoint="", frames_shape=(N, H, W),
                        factor=FACTOR, mesh=mesh)
    art = _make_artifact(tmp_path, frames=2, name="side.vsrx")
    srv = make_server([art], port=0, warmup=True, live=[live])
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(_url(srv, "/healthz")) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert any(p.startswith("live:EDSRNet") for p in
                   (a["path"] for a in health["artifacts"]))
        with urllib.request.urlopen(_url(srv, "/v1/meta")) as resp:
            metas = json.loads(resp.read())
        assert any(m.get("live") and m["mesh"] == {"data": 4, "spatial": 2}
                   for m in metas)

        rng = np.random.default_rng(3)
        frames = np.round(rng.random((N, H, W)) * 255).astype(np.float32)
        status, body, _ = _post_npy(srv, frames)
        assert status == 200
        sr = np.load(io.BytesIO(body))

        net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                      num_features=4, upscale_factor=FACTOR)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))
        _, want = make_pipeline(net, params, FACTOR, "acdc",
                                mesh=mesh)(frames)
        np.testing.assert_allclose(sr, np.asarray(want, np.float32),
                                   rtol=0, atol=1e-5)

        # The 2-frame artifact still routes 2-frame volumes.
        status, body, _ = _post_npy(srv, np.zeros((2, H, W), np.float32))
        assert status == 200
        assert np.load(io.BytesIO(body)).shape == (2, H, W)
    finally:
        srv.shutdown()


def test_live_pipeline_rejects_lazy_w8a8():
    from vsr_tpu.serve import LivePipeline

    with pytest.raises(ValueError, match="lazy"):
        LivePipeline(net_name="EDSRNet", net_kwargs={}, checkpoint="",
                     frames_shape=(2, H, W), factor=FACTOR, w8a8=True)


def test_no_warmup_becomes_warm_lazily(tmp_path):
    """Under --no-warmup, /healthz starts 503 ('warming') and flips to 200
    once every artifact has compiled through real requests."""
    paths = [_make_artifact(tmp_path, frames=2, name="lazy_a.vsrx"),
             _make_artifact(tmp_path, frames=3, name="lazy_b.vsrx")]
    srv = make_server(paths, port=0, warmup=False)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(_url(srv, "/healthz"))
        assert err.value.code == 503
        assert json.loads(err.value.read())["status"] == "warming"

        status, _, _ = _post_npy(srv, np.zeros((2, H, W), np.float32))
        assert status == 200
        with pytest.raises(urllib.error.HTTPError) as err:  # one of two warm
            urllib.request.urlopen(_url(srv, "/healthz"))
        assert err.value.code == 503

        status, _, _ = _post_npy(srv, np.zeros((3, H, W), np.float32))
        assert status == 200
        with urllib.request.urlopen(_url(srv, "/healthz")) as resp:
            assert json.loads(resp.read())["status"] == "ok"
    finally:
        srv.shutdown()


# ---------------------------------------------------------------- streaming


@pytest.fixture(scope="module")
def stream_server():
    """A daemon with ONLY streaming sessions configured (recurrent DRF)."""
    srv = make_server([], port=0, warmup=True, stream_spec={
        "net": "DRFNet",
        "net_kwargs": {"in_channels": 1, "out_channels": 1,
                       "num_features": 4, "num_groups": 1,
                       "upscale_factor": 2},
        "checkpoint": "", "factor": 2, "dataset": "acdc", "windows": 0,
    })
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _stream_post(server, path, arr=None):
    data = b""
    if arr is not None:
        buf = io.BytesIO()
        np.save(buf, arr)
        data = buf.getvalue()
    req = urllib.request.Request(
        _url(server, path), data=data,
        headers={"Content-Type": "application/x-npy"})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), dict(resp.headers)


def test_stream_sessions_match_direct_stream(stream_server):
    """open -> push x3 -> close: SR frames equal the Python-API stream
    with the same (deterministic template-init) params."""
    from vsr_tpu.infer import build_serving_net
    from vsr_tpu.stream import make_stream

    status, body, _ = _stream_post(stream_server, "/v1/stream/open")
    sid = json.loads(body)["id"]
    assert json.loads(body)["family"] == "RecurrentStream"

    net, params, _tf = build_serving_net(
        "DRFNet", {"in_channels": 1, "out_channels": 1, "num_features": 4,
                   "num_groups": 1, "upscale_factor": 2}, "",
        lr_hw=(48, 48), video=True)
    direct = make_stream(net, params, factor=2)

    rng = np.random.default_rng(3)
    for t in range(3):
        stack = np.round(rng.random((2, 24, 24)) * 255).astype(np.float32)
        status, body, headers = _stream_post(
            stream_server, f"/v1/stream/{sid}/push", stack)
        assert status == 200
        assert headers["X-VSR-Frame-Index"] == str(t)
        got = np.load(io.BytesIO(body))
        _lr, want = direct.push(stack)
        np.testing.assert_array_equal(got, np.asarray(want))

    # flush on a recurrent stream: no deferred frames, resets indexing
    status, body, headers = _stream_post(
        stream_server, f"/v1/stream/{sid}/flush")
    assert status == 200 and headers["X-VSR-Frame-Indices"] == ""
    stack = np.round(rng.random((2, 24, 24)) * 255).astype(np.float32)
    status, _, headers = _stream_post(
        stream_server, f"/v1/stream/{sid}/push", stack)
    assert headers["X-VSR-Frame-Index"] == "0"

    req = urllib.request.Request(_url(stream_server, f"/v1/stream/{sid}"),
                                 method="DELETE")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200


def test_stream_sessions_are_isolated(stream_server):
    """Two interleaved sessions carry independent state (fork semantics):
    interleaved pushes equal a serial single-session run."""
    rng = np.random.default_rng(4)
    seq = [np.round(rng.random((2, 24, 24)) * 255).astype(np.float32)
           for _ in range(2)]

    _, body, _ = _stream_post(stream_server, "/v1/stream/open")
    a = json.loads(body)["id"]
    _, body, _ = _stream_post(stream_server, "/v1/stream/open")
    b = json.loads(body)["id"]
    outs_a, outs_b = [], []
    for s in seq:  # interleave identical sequences
        _, body, _ = _stream_post(stream_server, f"/v1/stream/{a}/push", s)
        outs_a.append(np.load(io.BytesIO(body)))
        _, body, _ = _stream_post(stream_server, f"/v1/stream/{b}/push", s)
        outs_b.append(np.load(io.BytesIO(body)))
    np.testing.assert_array_equal(np.stack(outs_a), np.stack(outs_b))
    for sid in (a, b):
        req = urllib.request.Request(
            _url(stream_server, f"/v1/stream/{sid}"), method="DELETE")
        urllib.request.urlopen(req)


def test_stream_error_paths(stream_server, server):
    # unknown session
    with pytest.raises(urllib.error.HTTPError) as exc:
        _stream_post(stream_server, "/v1/stream/nope/push",
                     np.zeros((2, 24, 24), np.float32))
    assert exc.value.code == 404
    # geometry change mid-sequence -> 400
    _, body, _ = _stream_post(stream_server, "/v1/stream/open")
    sid = json.loads(body)["id"]
    _stream_post(stream_server, f"/v1/stream/{sid}/push",
                 np.zeros((2, 24, 24), np.float32))
    with pytest.raises(urllib.error.HTTPError) as exc:
        _stream_post(stream_server, f"/v1/stream/{sid}/push",
                     np.zeros((2, 24, 36), np.float32))
    assert exc.value.code == 400
    # reset clears the geometry pin
    status, body, _ = _stream_post(stream_server, f"/v1/stream/{sid}/reset")
    assert status == 200
    status, _, _ = _stream_post(stream_server, f"/v1/stream/{sid}/push",
                                np.zeros((2, 24, 36), np.float32))
    assert status == 200
    # a server without a stream spec: open -> 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        _stream_post(server, "/v1/stream/open")
    assert exc.value.code == 404
    # healthz reports the stream spec + session count
    with urllib.request.urlopen(_url(stream_server, "/healthz")) as resp:
        health = json.loads(resp.read())
    assert health["stream"]["net"] == "DRFNet"
    assert health["stream"]["sessions"] >= 1


def test_route_volume_programs_exact_only():
    """Volume-mode programs serve their exact D*T frame count: routing
    never bridges a mismatched request through them."""
    import pytest

    from vsr_tpu.serve import ArtifactPool

    class _Fake:
        def __init__(self, meta):
            self.meta = meta

    vol = _Fake({"frames_shape": [6, 24, 24], "volume": ["3d", 3],
                 "net": "Volume3DSRNet"})
    plain = _Fake({"frames_shape": [4, 24, 24], "volume": None,
                   "net": "EDSRNet"})
    pool = ArtifactPool([], warmup=False, live=[vol, plain],
                        allow_empty=False)
    assert pool.route((6, 24, 24)) is vol          # exact match wins
    assert pool.route((9, 24, 24)) is plain        # bridge via plain only
    pool_vol_only = ArtifactPool([], warmup=False, live=[vol],
                                 allow_empty=False)
    with pytest.raises(LookupError, match="exact"):
        pool_vol_only.route((9, 24, 24))
    # video/window programs regroup N = D*T into INDEPENDENT per-slice
    # sequences: any whole number of matching-T sequences bridges (batched
    # granule-aligned calls); partial or mismatched-T sequences do not.
    vid = _Fake({"frames_shape": [6, 24, 24], "video_t": 3, "volume": None,
                 "net": "DRFNet"})
    pool_vid = ArtifactPool([], warmup=False, live=[vid], allow_empty=False)
    assert pool_vid.route((6, 24, 24)) is vid
    assert pool_vid.route((9, 24, 24)) is vid       # 3 sequences of T=3
    with pytest.raises(LookupError, match="sequences"):
        pool_vid.route((8, 24, 24))                 # partial sequence
    with pytest.raises(LookupError, match="sequences"):
        pool_vid.route((9, 24, 24), req_t=4)        # mismatched T


def test_sr_volume_refuses_mismatched_dt_geometry():
    """Exact-N route to a regrouping program still refuses a NIfTI whose
    (d, t) factorization differs from the program's per-slice T."""
    import pytest

    from vsr_tpu.serve import ArtifactPool, Metrics

    class _Fake:
        def __init__(self, meta):
            self.meta = meta

    vol = _Fake({"frames_shape": [12, 24, 24], "volume": ["3d", 4],
                 "net": "Volume3DSRNet"})
    pool = ArtifactPool([], warmup=False, live=[vol], allow_empty=False)
    frames = np.zeros((12, 24, 24), np.float32)
    # Only the wrong-T volume program exists: clean routing error.
    with pytest.raises(LookupError, match="exact"):
        pool.sr_volume(frames, Metrics(), nii_geom=(24, 24, 4, 3))
    # Same t: the exact volume program routes (geometry check passes).
    assert pool.route((12, 24, 24), req_t=4) is vol
    # With a bridgeable per-frame program alongside, the mismatched-T
    # request routes THERE instead of 400ing on the volume program.
    plain = _Fake({"frames_shape": [6, 24, 24], "volume": None,
                   "net": "EDSRNet"})
    pool2 = ArtifactPool([], warmup=False, live=[vol, plain],
                         allow_empty=False)
    assert pool2.route((12, 24, 24), req_t=3) is plain


def test_volume_artifact_over_http(tmp_path):
    """A volume-mode .vsrx serves over /v1/sr: exact-N npy requests work;
    a mismatched frame count gets a clean 400 (no bridging through the
    regrouping program)."""
    from vsr_tpu.models import Volume3DSRNet

    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=FACTOR)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, H // FACTOR, W // FACTOR, 1)))
    blob, meta = export_serving(net, params, (N, H, W), FACTOR,
                                volume=("3d", 3))
    path = tmp_path / "vol.vsrx"
    save_artifact(path, blob, meta)
    srv = make_server([path], port=0, warmup=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        frames = np.round(
            np.random.default_rng(0).random((N, H, W)) * 255
        ).astype(np.float32)
        status, body, ctype = _post_npy(srv, frames)
        assert status == 200 and ctype == "application/x-npy"
        sr = np.load(io.BytesIO(body))
        assert sr.shape == (N, H, W)
        ref = np.asarray(ExportedServing(path)(frames)[1], np.float32)
        np.testing.assert_array_equal(sr, ref)
        # Mismatched N: volume programs never bridge.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_npy(srv, frames[:4])
        assert e.value.code == 400
        assert "exact" in json.loads(e.value.read())["error"]
    finally:
        srv.shutdown()


def test_debug_profile_endpoint(server):
    """POST /debug/profile captures a jax trace zip; bad/concurrent
    requests get clean errors."""
    req = urllib.request.Request(
        _url(server, "/debug/profile?seconds=0.6"), data=b"")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert resp.headers.get("Content-Type") == "application/zip"
        body = resp.read()
    import zipfile as _zf

    with _zf.ZipFile(io.BytesIO(body)) as zf:
        assert any(n.startswith("trace") for n in zf.namelist())
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(urllib.request.Request(
            _url(server, "/debug/profile?seconds=999"), data=b""))
    assert e.value.code == 400


# ---------------------------------------------------------------------------
# Dynamic cross-request batching (_Batcher / ArtifactPool coalescing)
# ---------------------------------------------------------------------------

def _run_threads(fns):
    results = [None] * len(fns)
    errs = []

    def wrap(i, fn):
        try:
            results[i] = fn()
        except Exception as exc:  # pragma: no cover - surfaced by assert
            errs.append(exc)

    ts = [threading.Thread(target=wrap, args=(i, fn))
          for i, fn in enumerate(fns)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert not errs, errs
    return results


def test_batcher_coalesces_and_is_exact():
    """Concurrent sub-capacity segments share one call; each gets exactly
    its own rows; padding repeats the final granule and is dropped."""
    from vsr_tpu.serve import _Batcher

    calls = []

    def call_fn(x):
        calls.append(np.array(x))
        return x * 2.0  # any deterministic per-frame map

    b = _Batcher(call_fn, cap=6, unit=1, wait_s=5.0, metrics_ref=lambda: None)
    a = np.full((2, 4, 4), 1.0, np.float32)
    c = np.full((4, 4, 4), 3.0, np.float32)
    out_a, out_c = _run_threads([lambda: b.submit(a), lambda: b.submit(c)])
    assert len(calls) == 1 and calls[0].shape == (6, 4, 4)
    np.testing.assert_array_equal(out_a, a * 2)
    np.testing.assert_array_equal(out_c, c * 2)

    # partial batch alone: padded by repeating the last granule, sliced back
    calls.clear()
    b0 = _Batcher(call_fn, cap=6, unit=3, wait_s=0.0,
                  metrics_ref=lambda: None)
    seq = np.arange(3 * 16, dtype=np.float32).reshape(3, 4, 4)
    out = b0.submit(seq)
    assert calls[0].shape == (6, 4, 4)
    np.testing.assert_array_equal(calls[0][3:], seq)  # tiled last unit
    np.testing.assert_array_equal(out, seq * 2)


def test_batcher_error_propagates_and_recovers():
    from vsr_tpu.serve import _Batcher

    state = {"fail": True}

    def call_fn(x):
        if state["fail"]:
            raise RuntimeError("chip fell over")
        return x + 1.0

    b = _Batcher(call_fn, cap=4, unit=1, wait_s=2.0, metrics_ref=lambda: None)
    x = np.zeros((2, 4, 4), np.float32)

    def one():
        return b.submit(x)

    errs = []

    def wrap():
        try:
            one()
        except RuntimeError as exc:
            errs.append(exc)

    ts = [threading.Thread(target=wrap) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert len(errs) == 2  # both coalesced requesters see the failure
    state["fail"] = False
    np.testing.assert_array_equal(one(), x + 1.0)  # batcher not poisoned


def test_pool_coalesces_concurrent_http_requests(tmp_path):
    """Two concurrent 3-frame requests to a 6-frame artifact share one
    device call (with --batch-wait) and each result equals the request
    served alone."""
    paths = [_make_artifact(tmp_path, frames=6, name="c6.vsrx")]
    srv = make_server(paths, port=0, warmup=True, batch_wait_ms=2000)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        rng = np.random.default_rng(7)
        f1 = np.round(rng.random((3, H, W)) * 255).astype(np.float32)
        f2 = np.round(rng.random((3, H, W)) * 255).astype(np.float32)
        before_calls = srv.metrics.batch_calls

        r1, r2 = _run_threads([lambda: _post_npy(srv, f1),
                               lambda: _post_npy(srv, f2)])
        assert r1[0] == 200 and r2[0] == 200
        sr1 = np.load(io.BytesIO(r1[1]))
        sr2 = np.load(io.BytesIO(r2[1]))
        assert srv.metrics.batch_calls == before_calls + 1
        assert srv.metrics.coalesced_requests >= 2

        direct = ExportedServing(paths[0])
        _, w1 = direct(np.pad(f1, ((0, 3), (0, 0), (0, 0)), mode="edge"))
        _, w2 = direct(np.pad(f2, ((0, 3), (0, 0), (0, 0)), mode="edge"))
        # each request's rows are bitwise those of ANY batch containing
        # them at the same offsets; compare against the solo-call rows
        joint = np.concatenate([f1, f2], axis=0)
        _, wj = direct(joint)
        np.testing.assert_allclose(sr1, np.asarray(wj)[:3], rtol=0,
                                   atol=1e-5)
        np.testing.assert_allclose(sr2, np.asarray(wj)[3:], rtol=0,
                                   atol=1e-5)
        # and equals the padded solo call on the same rows (per-frame
        # program: batch composition cannot change a frame's result)
        np.testing.assert_allclose(sr1, np.asarray(w1)[:3], rtol=0,
                                   atol=1e-5)
        np.testing.assert_allclose(sr2, np.asarray(w2)[:3], rtol=0,
                                   atol=1e-5)
    finally:
        srv.shutdown()


def test_pool_batching_single_request_unchanged(tmp_path):
    """batch_wait_ms=0: a lone request flows straight through (no stall),
    bit-identical to the direct padded call, with padding counted."""
    paths = [_make_artifact(tmp_path, frames=4, name="c4.vsrx")]
    srv = make_server(paths, port=0, warmup=True, batch_wait_ms=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        rng = np.random.default_rng(8)
        frames = np.round(rng.random((6, H, W)) * 255).astype(np.float32)
        before = srv.metrics.padded_frames
        status, body, _ = _post_npy(srv, frames)
        assert status == 200
        sr = np.load(io.BytesIO(body))
        assert sr.shape == (6, H, W)
        assert srv.metrics.padded_frames == before + 2
        direct = ExportedServing(paths[0])
        _, a = direct(frames[:4])
        _, b = direct(np.pad(frames[4:], ((0, 2), (0, 0), (0, 0)),
                             mode="edge"))
        want = np.concatenate([np.asarray(a), np.asarray(b)[:2]], axis=0)
        np.testing.assert_allclose(sr, want.astype(np.float32), rtol=0,
                                   atol=1e-5)
    finally:
        srv.shutdown()


def test_live_expert_mesh_moe_serving():
    """A live MoE pipeline sharded over a data x expert mesh serves
    through the daemon and matches the direct expert-mesh pipeline."""
    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.models import MoEEDSRNet
    from vsr_tpu.parallel.mesh import make_mesh
    from vsr_tpu.serve import LivePipeline

    moe_kwargs = {"in_channels": 1, "out_channels": 1, "num_resblocks": 1,
                  "num_features": 4, "upscale_factor": FACTOR,
                  "num_experts": 4, "group_size": 48, "moe_every": 1}
    mesh = make_mesh({"data": 2, "expert": 4})
    live = LivePipeline(net_name="MoEEDSRNet", net_kwargs=moe_kwargs,
                        checkpoint="", frames_shape=(N, H, W),
                        factor=FACTOR, mesh=mesh)
    srv = make_server([], port=0, warmup=True, live=[live])
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(_url(srv, "/v1/meta")) as resp:
            metas = json.loads(resp.read())
        assert any(m.get("live") and m["mesh"] == {"data": 2, "expert": 4}
                   for m in metas)
        rng = np.random.default_rng(4)
        frames = np.round(rng.random((N, H, W)) * 255).astype(np.float32)
        status, body, _ = _post_npy(srv, frames)
        assert status == 200
        sr = np.load(io.BytesIO(body))

        net = MoEEDSRNet(**moe_kwargs)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))
        _, want = make_pipeline(net, params, FACTOR, "acdc",
                                mesh=mesh)(frames)
        np.testing.assert_allclose(sr, np.asarray(want, np.float32),
                                   rtol=0, atol=1e-5)
    finally:
        srv.shutdown()


def test_live_seq_mesh_volume_serving():
    """A live VOLUME pipeline sharded over a {seq, spatial} mesh (depth
    over 'seq' — round-4 serving axis) serves through the daemon and
    matches the direct seq-sharded pipeline."""
    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.models import Volume3DSRNet
    from vsr_tpu.parallel.mesh import make_mesh
    from vsr_tpu.serve import LivePipeline

    d, t = 4, 3
    mesh = make_mesh({"seq": 2, "spatial": 2})
    live = LivePipeline(net_name="Volume3DSRNet",
                        net_kwargs={"in_channels": 1, "out_channels": 1,
                                    "num_resblocks": 1, "num_features": 4,
                                    "upscale_factor": FACTOR},
                        checkpoint="", frames_shape=(d * t, H, W),
                        factor=FACTOR, mesh=mesh, volume=("3d", t))
    srv = make_server([], port=0, warmup=True, live=[live])
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(_url(srv, "/v1/meta")) as resp:
            metas = json.loads(resp.read())
        assert any(m.get("volume") == ["3d", t]
                   and m.get("mesh") == {"seq": 2, "spatial": 2}
                   for m in metas)
        rng = np.random.default_rng(5)
        frames = np.round(rng.random((d * t, H, W)) * 255).astype(np.float32)
        status, body, _ = _post_npy(srv, frames)
        assert status == 200
        sr = np.load(io.BytesIO(body))

        net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                            num_features=4, upscale_factor=FACTOR)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 2, H // FACTOR, W // FACTOR, 1)))
        _, want = make_pipeline(net, params, FACTOR, "acdc",
                                volume=("3d", t), mesh=mesh)(frames)
        np.testing.assert_allclose(sr, np.asarray(want, np.float32),
                                   rtol=0, atol=1e-5)
    finally:
        srv.shutdown()
