"""On-chip throughput of the streaming (online) serving path.

Recurrent streams have a GENUINE serial dependency between pushes (the
carry), so a loop of K pushes with ONE final readback is exactly the
chained timing scheme the relay audit validated (CLAUDE.md) — no
per-frame readbacks inside the loop.  Reported as frames/s (one frame =
one (D, H, W) slice-stack push) next to the batch pipeline's rate at the
same geometry, i.e. the price of frame-at-a-time latency vs whole-sequence
batching.

Run: python scripts/probe_stream_throughput.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192  # bench geometry: one volume per T pushes


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.models import (DRFNet, FRVSRNet, Volume3DSRNet,
                                Volume4DSRNet)
    from vsr_tpu.stream import make_stream

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    reps = 3
    # Distinct volumes per call + one block over ALL outputs - the zoo
    # harness's audited timing shape (CLAUDE.md: never reuse one input or
    # sync only the last call through the relay).
    vols = [np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)
            for _ in range(reps)]
    stacks = [[np.ascontiguousarray(v.reshape(D, T, H, W)[:, t])
               for t in range(T)] for v in vols]

    for name, net in [
        ("DRFNet-6x64 (flagship)",
         DRFNet(in_channels=1, out_channels=1, num_features=64, num_groups=6,
                upscale_factor=2, dtype=jnp.bfloat16, fused_tail=True)),
        ("FRVSRNet-10",
         FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                  num_resblocks=10, is_prediction=True, dtype=jnp.bfloat16)),
        # Volumetric streams (round-3 s5): one (D, H, W) volume per push.
        ("Volume3DSRNet 8RB/32",
         Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=8,
                       num_features=32, upscale_factor=2,
                       dtype=jnp.bfloat16)),
        ("Volume4DSRNet 4RB/32",
         Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                       num_resblocks=4, upscale_factor=2,
                       dtype=jnp.bfloat16)),
    ]:
        from vsr_tpu.infer import VOLUME_NETS

        vmode = VOLUME_NETS.get(type(net).__name__)
        ex = (jnp.zeros((1, 2, 2, H // 2, W // 2, 1)) if vmode == "4d"
              else jnp.zeros((1, 2, H // 2, W // 2, 1)))
        params = jax.jit(lambda k, ex=ex: net.init(k, ex))(
            jax.random.PRNGKey(0))

        # Batch reference: whole-sequence pipeline, one volume per call.
        pipe = jax.jit(make_pipeline(
            net, params, 2, "acdc",
            video_t=None if vmode else T,
            volume=(vmode, T) if vmode else None))
        _lr, sr = pipe(vols[0])
        np.asarray(sr)  # compile + settle
        t0 = time.perf_counter()
        outs = [pipe(v)[1] for v in vols]
        jax.block_until_ready(outs)
        batch_fps = reps * D * T / (time.perf_counter() - t0)

        # Stream: T pushes per volume (serially chained through the
        # carry), block over every emitted frame at the end.
        stream = make_stream(net, params, factor=2)
        for s in stacks[0]:  # warm (compile) + fill state
            out = stream.push(s)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = []
        for vol in stacks:
            stream.reset()
            for s in vol:
                outs.append(stream.push(s)[1])
        jax.block_until_ready(outs)
        stream_fps = reps * D * T / (time.perf_counter() - t0)

        print(f"{name}: batch {batch_fps:7.1f} frames/s | "
              f"stream {stream_fps:7.1f} frames/s "
              f"({stream_fps / batch_fps:.2f}x of batch; "
              f"{stream_fps / D:.1f} pushes/s)", flush=True)


if __name__ == "__main__":
    main()
