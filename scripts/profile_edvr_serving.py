"""Profile EDVR window serving: where do the milliseconds go?

Round-2 history: EDVR first served at 0.033 vol/s — this trace showed the
deformable-conv bilinear gathers (4 fused gathers of 8-channel group rows)
running at ~3 GB/s, <1% of HBM bandwidth (8 of 128 lanes used). That
motivated the hat-matmul sampler (ops/deform_conv.py method="matmul"),
which lifted serving 33x to 1.08 vol/s. The script remains the tool for
finding the CURRENT bottleneck: it captures a jax.profiler device trace of
one 30-window chunk and prints the top device ops by self time.

Run: python scripts/profile_edvr_serving.py [outdir]
"""

from __future__ import annotations

import glob
import gzip
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main(outdir: str = "/tmp/edvr_trace") -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.models import EDVRNet

    B, NF, HH, WW = 30, 5, 48, 48
    net = EDVRNet(in_channels=1, out_channels=1, nf=64, nframes=NF, groups=8,
                  front_RBs=5, back_RBs=10, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, NF, HH, WW, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x[:1])

    fn = jax.jit(lambda v, a: net.apply(v, a))
    jax.block_until_ready(fn(params, x))  # compile outside the trace

    import time
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(params, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"EDVR chunk of {B} windows: {dt * 1e3:.1f} ms "
          f"({B / dt:.1f} windows/s)", flush=True)

    with jax.profiler.trace(outdir):
        out = fn(params, x)
        jax.block_until_ready(out)

    # Parse the trace protobuf: sum device-op durations by op name prefix.
    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(f"no trace json under {outdir}; inspect with tensorboard")
        return
    import json

    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # Keep only TPU device lanes (drop host threads).
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in trace.get("traceEvents", [])
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    by_op: dict[str, float] = defaultdict(float)
    total = 0.0
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        name = e.get("name", "?")
        key = name.split(".")[0].split("(")[0][:60]
        by_op[key] += e["dur"]
        total += e["dur"]
    print(f"\ntop device ops (of {total / 1e3:.1f} ms traced):")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v / 1e3:9.2f} ms  {100 * v / max(total, 1):5.1f}%  {k}")


if __name__ == "__main__":
    main(*sys.argv[1:])
