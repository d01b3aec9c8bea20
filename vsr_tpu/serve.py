"""Production HTTP serving for ``.vsrx`` artifacts (stdlib only).

The reference stops at "load the checkpoint in Python"
(``/root/reference/src/runner/predictors/base_predictor.py:130``); a TPU
deployment wants a long-lived process that owns the chip, keeps compiled
programs warm, and serves volumes over the network. This daemon fronts one
or more exported ``.vsrx`` artifacts (``vsr_tpu.export`` — StableHLO serving
programs with params baked in; no model code or checkpoints needed at
serving time) behind a small HTTP API:

  GET  /healthz   liveness + loaded-artifact summary (503 until warm)
  GET  /v1/meta   full artifact metadata (shapes, factor, precision)
  GET  /metrics   Prometheus text exposition (requests, latency, volumes)
  POST /v1/sr     super-resolve one volume

``/v1/sr`` accepts either a raw ``.npy`` body (float HR frames, shape
``(N, H, W)`` — ``Content-Type: application/x-npy``) or a NIfTI volume
(``.nii``/``.nii.gz`` bytes, any other content type), which is preprocessed
exactly as ``vsr_tpu.export --run`` does (outlier clip + /12 center crop).
The response mirrors the request format (override with ``?format=npy|nii``).

Serving semantics, TPU-first:
- Artifacts are SHAPE-SPECIALIZED (static-shape programs). Requests route
  to the artifact whose ``(H, W)`` matches; frame counts are bridged by
  batching the volume through the artifact's frame dim in chunks, edge-
  padding the last chunk and slicing the SR result back — the same
  bucketing story as compilation, applied at the serving boundary.
- One device executor: HTTP IO is threaded, device calls are serialized
  under a lock (a single chip runs one program at a time anyway; queueing
  in-process keeps tail latency visible in /metrics instead of in XLA).
- Programs are warmed (compiled) at startup so the first request doesn't
  pay the compile.

CLI:
  python -m vsr_tpu.serve --artifact edsr_x2.vsrx [--artifact ...] \
      [--host 127.0.0.1] [--port 8973] [--no-warmup]
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

from vsr_tpu.export import ExportedServing

_LAT_BUCKETS = (0.05, 0.25, 1.0, 5.0, 30.0, float("inf"))


class Metrics:
    """Tiny thread-safe Prometheus-style registry."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = {}  # (endpoint, status) -> count
        self.lat_sum = 0.0
        self.lat_count = 0
        self.lat_buckets = [0] * len(_LAT_BUCKETS)
        self.volumes = 0
        self.padded_frames = 0
        self.inflight = 0

    def observe(self, endpoint: str, status: int, seconds: float) -> None:
        with self._lock:
            key = (endpoint, status)
            self.requests[key] = self.requests.get(key, 0) + 1
            if endpoint == "/v1/sr" and status == 200:
                self.lat_sum += seconds
                self.lat_count += 1
                for i, b in enumerate(_LAT_BUCKETS):
                    if seconds <= b:
                        self.lat_buckets[i] += 1

    def render(self) -> str:
        with self._lock:
            lines = ["# TYPE vsr_requests_total counter"]
            for (ep, st), n in sorted(self.requests.items()):
                lines.append(
                    f'vsr_requests_total{{endpoint="{ep}",status="{st}"}} {n}')
            lines.append("# TYPE vsr_sr_latency_seconds histogram")
            acc = 0
            for i, b in enumerate(_LAT_BUCKETS):
                acc += self.lat_buckets[i]
                le = "+Inf" if b == float("inf") else repr(b)
                lines.append(f'vsr_sr_latency_seconds_bucket{{le="{le}"}} {acc}')
            lines.append(f"vsr_sr_latency_seconds_sum {self.lat_sum}")
            lines.append(f"vsr_sr_latency_seconds_count {self.lat_count}")
            lines.append("# TYPE vsr_volumes_served_total counter")
            lines.append(f"vsr_volumes_served_total {self.volumes}")
            lines.append("# TYPE vsr_padded_frames_total counter")
            lines.append(f"vsr_padded_frames_total {self.padded_frames}")
            lines.append("# TYPE vsr_inflight_requests gauge")
            lines.append(f"vsr_inflight_requests {self.inflight}")
            return "\n".join(lines) + "\n"


class ArtifactPool:
    """Loaded artifacts + routing + the serialized device executor."""

    def __init__(self, paths, warmup: bool = True):
        if not paths:
            raise ValueError("at least one --artifact is required")
        self.servings = [ExportedServing(p) for p in paths]
        self.paths = [str(p) for p in paths]
        self._device_lock = threading.Lock()
        self._warmed: set = set()  # ids of servings compiled at least once
        if warmup:
            self.warmup()

    @property
    def warm(self) -> bool:
        """True once every program has compiled (at startup, or — under
        --no-warmup — lazily as requests exercise each artifact)."""
        return len(self._warmed) == len(self.servings)

    def warmup(self) -> None:
        for s in self.servings:
            zeros = np.zeros(s.meta["frames_shape"], np.float32)
            self._call(s, zeros)

    def _call(self, serving, frames: np.ndarray) -> np.ndarray:
        import jax

        with self._device_lock:
            _, sr = serving(jax.device_put(frames))
            self._warmed.add(id(serving))
            return np.asarray(sr, np.float32)

    def route(self, frames_shape) -> "ExportedServing":
        """Pick the artifact for an (M, H, W) input: exact shape first, then
        same (H, W) with the largest frame dim <= M (fewest padded calls),
        then the smallest frame dim (one padded call)."""
        n, h, w = frames_shape
        same_hw = [s for s in self.servings
                   if tuple(s.meta["frames_shape"][1:]) == (h, w)]
        if not same_hw:
            have = sorted({tuple(s.meta["frames_shape"][1:])
                           for s in self.servings})
            raise LookupError(
                f"no artifact for HR geometry {h}x{w}; loaded: {have}")
        exact = [s for s in same_hw if s.meta["frames_shape"][0] == n]
        if exact:
            return exact[0]
        fits = [s for s in same_hw if s.meta["frames_shape"][0] <= n]
        if fits:
            return max(fits, key=lambda s: s.meta["frames_shape"][0])
        return min(same_hw, key=lambda s: s.meta["frames_shape"][0])

    def sr_volume(self, frames: np.ndarray, metrics: Metrics) -> np.ndarray:
        """Super-resolve (M, H, W) HR frames through the routed artifact,
        bridging M to the artifact's frame dim by edge-padded chunking."""
        serving = self.route(frames.shape)
        step = serving.meta["frames_shape"][0]
        outs = []
        for i in range(0, frames.shape[0], step):
            chunk = frames[i:i + step]
            pad = step - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0), (0, 0)),
                               mode="edge")
                with metrics._lock:
                    metrics.padded_frames += pad
            sr = self._call(serving, np.ascontiguousarray(
                chunk, dtype=np.float32))
            outs.append(sr[:sr.shape[0] - pad] if pad else sr)
        with metrics._lock:
            metrics.volumes += 1
        return np.concatenate(outs, axis=0)


def _parse_volume(body: bytes, content_type: str):
    """Request body -> (frames (M, H, W) float32, response_kind, nii_geom).

    ``nii_geom`` is the (h, w, d, t) of a NIfTI request (frames are the
    preprocessed d*t stack) — needed to fold SR frames back into a volume.
    """
    if content_type == "application/x-npy":
        arr = np.load(io.BytesIO(body), allow_pickle=False)
        if arr.ndim != 3:
            raise ValueError(f"expected (N, H, W) frames, got {arr.shape}")
        return np.asarray(arr, np.float32), "npy", None
    # Anything else: treat as NIfTI bytes (.nii or .nii.gz).
    from vsr_tpu.export import _load_hr_frames

    suffix = ".nii.gz" if body[:2] == b"\x1f\x8b" else ".nii"
    with tempfile.NamedTemporaryFile(suffix=suffix) as f:
        f.write(body)
        f.flush()
        frames, geom = _load_hr_frames(Path(f.name))
    return np.asarray(frames, np.float32), "nii", geom


def _encode_volume(sr: np.ndarray, kind: str, nii_geom):
    """SR frames come back at the input HR geometry (the pipeline is
    HR -> k-space downscale -> SR back to HR, `export --run` contract:
    vsr_tpu/export.py:303), so no factor scaling on the way out."""
    if kind == "npy":
        buf = io.BytesIO()
        np.save(buf, sr)
        return buf.getvalue(), "application/x-npy"
    from vsr_tpu.io.nifti import save_nifti

    if nii_geom is not None:
        h, w, d, t = nii_geom
        vol = np.moveaxis(sr, 0, -1).reshape(h, w, d, t)
    else:
        vol = np.moveaxis(sr, 0, -1)
    with tempfile.NamedTemporaryFile(suffix=".nii.gz") as f:
        save_nifti(vol, f.name)
        f.seek(0)
        return Path(f.name).read_bytes(), "application/gzip"


def make_server(artifact_paths, host: str = "127.0.0.1", port: int = 0,
                warmup: bool = True) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.serve_forever()`` it or
    run it in a thread (tests). ``port=0`` binds an ephemeral port."""
    pool = ArtifactPool(artifact_paths, warmup=warmup)
    metrics = Metrics()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logging.info("%s - %s", self.address_string(), fmt % args)

        def _send(self, status: int, body: bytes, ctype: str) -> None:
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, status: int, obj) -> None:
            self._send(status, json.dumps(obj).encode(),
                       "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            t0 = time.perf_counter()
            if path == "/healthz":
                status = 200 if pool.warm else 503
                self._send_json(status, {
                    "status": "ok" if pool.warm else "warming",
                    "artifacts": [
                        {"path": p, "frames_shape": s.meta["frames_shape"],
                         "factor": s.meta["factor"]}
                        for p, s in zip(pool.paths, pool.servings)],
                })
            elif path == "/v1/meta":
                status = 200
                self._send_json(200, [s.meta for s in pool.servings])
            elif path == "/metrics":
                status = 200
                self._send(200, metrics.render().encode(),
                           "text/plain; version=0.0.4")
            else:
                status = 404
                self._send_json(404, {"error": f"unknown path {path}"})
            metrics.observe(path, status, time.perf_counter() - t0)

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/v1/sr":
                self._send_json(404, {"error": f"unknown path {parsed.path}"})
                metrics.observe(parsed.path, 404, 0.0)
                return
            t0 = time.perf_counter()
            status = 500
            with metrics._lock:
                metrics.inflight += 1
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                try:
                    frames, kind, geom = _parse_volume(body, ctype)
                except Exception as exc:
                    status = 400
                    self._send_json(400, {"error": f"bad volume: {exc}"})
                    return
                fmt = parse_qs(parsed.query).get("format", [kind])[0]
                if fmt not in ("npy", "nii"):
                    status = 400
                    self._send_json(400, {"error": f"unknown format {fmt!r}"})
                    return
                try:
                    sr = pool.sr_volume(frames, metrics)
                except LookupError as exc:  # no artifact for this geometry
                    status = 400
                    self._send_json(400, {"error": str(exc)})
                    return
                payload, out_ctype = _encode_volume(sr, fmt, geom)
                status = 200
                self._send(200, payload, out_ctype)
            except Exception as exc:  # internal error
                logging.exception("sr request failed")
                try:
                    self._send_json(500, {"error": str(exc)})
                except Exception:
                    pass
            finally:
                with metrics._lock:
                    metrics.inflight -= 1
                metrics.observe("/v1/sr", status, time.perf_counter() - t0)

    server = ThreadingHTTPServer((host, port), Handler)
    server.pool = pool  # type: ignore[attr-defined]
    server.metrics = metrics  # type: ignore[attr-defined]
    return server


def main() -> None:
    logging.basicConfig(format="%(asctime)s | %(levelname)s | %(message)s",
                        level=logging.INFO, datefmt="%Y-%m-%d %H:%M:%S")
    p = argparse.ArgumentParser(
        description="HTTP serving daemon for .vsrx artifacts")
    p.add_argument("--artifact", action="append", required=True,
                   help="path to a .vsrx artifact (repeatable — one per "
                        "serving geometry; requests route by shape)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8973)
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling all programs at startup")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    server = make_server(args.artifact, args.host, args.port,
                         warmup=not args.no_warmup)
    logging.info(f"serving {len(args.artifact)} artifact(s) on "
                 f"http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
