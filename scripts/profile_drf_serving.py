"""Profile flagship DRFNet serving: op-level evidence for the MFU ceiling.

BENCH.md documents the flagship at ~17% MFU from FLOP counting (k6s2 64-ch
component ceiling); this captures a jax.profiler device trace of one
serving call at the bench protocol shape (4 volumes = 40 slice-sequences of
T=30 96^2 LR frames, bf16) and prints the top device ops by self time —
distinguishing conv MXU time from layout copies / scan overhead.

Run: python scripts/profile_drf_serving.py [outdir]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def main(outdir: str = "/tmp/drf_trace") -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import time

    import jax.numpy as jnp

    from vsr_tpu.models import DRFNet

    B, T, HH, WW = 40, 30, 96, 96
    net = DRFNet(in_channels=1, out_channels=1, num_features=64,
                 num_groups=6, upscale_factor=2, fused_tail=True,
                 dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, T, HH, WW, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x[:1, :2])

    fn = jax.jit(lambda v, a: net.apply(v, a))
    jax.block_until_ready(fn(params, x))  # compile outside the trace

    t0 = time.perf_counter()
    for _i in range(3):
        out = fn(params, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"DRF serving call ({B} sequences x {T} frames): {dt * 1e3:.1f} ms "
          f"({B * T / dt:.0f} HR frames/s)", flush=True)

    with jax.profiler.trace(outdir):
        out = fn(params, x)
        jax.block_until_ready(out)

    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(f"no trace json under {outdir}; inspect with tensorboard")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
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
