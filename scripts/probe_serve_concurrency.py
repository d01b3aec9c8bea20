"""Measure vsr_tpu.serve daemon throughput under concurrent clients.

The daemon serializes device DISPATCH behind ArtifactPool._device_lock,
but host<->device transfers deliberately happen OUTSIDE the lock (round-3
review fix): through the dev tunnel (10-75 MB/s) a request's readback
takes longer than its compute, so overlapping one request's transfers
with the next request's program is where daemon throughput comes from.
This probe quantifies that: aggregate volumes/s for the same total work
issued by 1, 2, and 4 concurrent HTTP clients.

Per CLAUDE.md timing rules this is an end-to-end pipeline measurement:
every request carries a DISTINCT volume and the clock stops only after
every response body (the full SR volume) has been received.

Run: python scripts/probe_serve_concurrency.py
"""

from __future__ import annotations

import io
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, ".")

FRAMES, H, W, FACTOR = 30, 192, 192, 2
TOTAL_REQUESTS = 24


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vsr_tpu.export import (_enable_compile_cache, export_serving,
                                save_artifact)
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.serve import make_server

    _enable_compile_cache()
    print(f"backend={jax.default_backend()}", flush=True)

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                  num_features=64, upscale_factor=FACTOR, fused_tail=True,
                  dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))
    t0 = time.perf_counter()
    blob, meta = export_serving(net, params, (FRAMES, H, W), FACTOR)
    save_artifact("/tmp/vsr_serve_probe.vsrx", blob, meta)
    print(f"export+compile {time.perf_counter() - t0:.0f}s", flush=True)

    srv = make_server(["/tmp/vsr_serve_probe.vsrx"], port=0, warmup=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/v1/sr"

    rng = np.random.default_rng(0)
    vols = [np.asarray(rng.random((FRAMES, H, W)) * 255, np.float32)
            for _ in range(TOTAL_REQUESTS)]
    bodies = []
    for v in vols:
        buf = io.BytesIO()
        np.save(buf, v)
        bodies.append(buf.getvalue())

    def post(body: bytes) -> int:
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req) as resp:
            return len(resp.read())  # drain the full SR volume

    post(bodies[0])  # warm every layer of the path once

    for clients in (1, 2, 4):
        # Same total work, split across N client threads.
        chunks = [bodies[i::clients] for i in range(clients)]
        got = []

        def run(mine):
            got.extend(post(b) for b in mine)

        t0 = time.perf_counter()
        ts = [threading.Thread(target=run, args=(c,)) for c in chunks]
        [t.start() for t in ts]
        [t.join() for t in ts]
        dt = time.perf_counter() - t0
        assert len(got) == TOTAL_REQUESTS and min(got) > 0
        print(f"clients={clients}: {TOTAL_REQUESTS / dt:6.2f} vol/s "
              f"({dt:.1f}s for {TOTAL_REQUESTS} x {FRAMES}-frame volumes)",
              flush=True)

    srv.shutdown()


if __name__ == "__main__":
    main()
