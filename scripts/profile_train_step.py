"""Device-trace profile of the TRAINING step (VERDICT round-2 weak #1:
training had never been profiled; all MFU evidence was serving-side).

Traces one device-epoch program (lax.scan of sample -> augment -> fused
fwd/bwd/Adam) for the bench protocol EDSR-16/64 and for the flagship DRFNet
VSR trainer, prints the top device ops by self time, and reports achieved
TFLOP/s from XLA cost_analysis of the standalone step (the scan body counts
once in cost_analysis, so the per-step program is lowered separately — same
rule as bench.py's serving MFU).

Run: python scripts/profile_train_step.py [edsr|drf ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK_TFLOPS = 197.0  # bf16 peak (v5e), same constant as bench.py


def summarize(outdir: str) -> None:
    """Aggregate the XLA-op track by hlo_category and top tf_op sites,
    with achieved TFLOP/s / GB/s per row (from the events' model_flops /
    raw_bytes_accessed metadata)."""
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
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in trace.get("traceEvents", [])
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n}
    ev = [e for e in trace["traceEvents"]
          if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev_pids
          and e.get("args", {}).get("hlo_category")
          and e["args"]["hlo_category"] != "while"]  # while = container
    by_cat = defaultdict(lambda: [0.0, 0.0, 0.0])
    by_site = defaultdict(lambda: [0.0, 0.0, 0.0])
    total = 0.0
    for e in ev:
        a = e["args"]
        fl = float(a.get("model_flops", 0) or 0)
        byt = float(a.get("raw_bytes_accessed", 0) or 0)
        for table, key in ((by_cat, a["hlo_category"]),
                           (by_site, a.get("tf_op", e["name"])[:95])):
            table[key][0] += e["dur"]
            table[key][1] += fl
            table[key][2] += byt
        total += e["dur"]
    for title, table, n in (("by category", by_cat, 10),
                            ("top sites", by_site, 14)):
        print(f"{title} (of {total / 1e3:.1f} ms op time):")
        for k, (d, fl, byt) in sorted(table.items(), key=lambda kv: -kv[1][0])[:n]:
            tf = fl / (d * 1e-6) / 1e12 if d else 0
            gbs = byt / (d * 1e-6) / 1e9 if d else 0
            print(f"  {d / 1e3:9.2f} ms {100 * d / max(total, 1):5.1f}%  "
                  f"{tf:6.1f} TF/s {gbs:6.0f} GB/s  {k}")

def _flops_of(jitted, *args) -> float:
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def profile_edsr() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((256, 64, 64, 1)) * 255).astype(np.float32)
    trainer = DeviceEpochTrainer(
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                    num_features=64, upscale_factor=2, dtype=jnp.bfloat16),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, ::2, ::2],
        hr_data=hrbuf, batch_size=16, patch=32, ratio=2, steps_per_epoch=200)
    trainer.train_epoch()  # compile
    t0 = time.perf_counter()
    trainer.train_epoch()
    dt = time.perf_counter() - t0
    steps_s = 200 / dt
    f_step = _flops_of(
        jax.jit(lambda p, o, i, t: trainer._train_step(p, o, i, t)),
        trainer.params, trainer.opt_state,
        jnp.zeros((16, 32, 32, 1)), jnp.zeros((16, 64, 64, 1)))
    tf = f_step * steps_s / 1e12
    print(f"EDSR train: {steps_s:.0f} steps/s, {tf:.1f} TFLOP/s "
          f"({100 * tf / PEAK_TFLOPS:.0f}% of bf16 peak)", flush=True)
    with jax.profiler.trace("/tmp/edsr_train_trace"):
        trainer.train_epoch()
    print("\n===== EDSR-16/64 device training epoch =====")
    summarize("/tmp/edsr_train_trace")


def profile_drf() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    # VSR windows: (M, T, h, w, 1) raw frames, T=5 training windows.
    hrbuf = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    trainer = DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=64,
                   num_groups=6, upscale_factor=2, dtype=jnp.bfloat16),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, :, ::2, ::2],
        hr_data=hrbuf, batch_size=8, patch=32, ratio=2, steps_per_epoch=50)
    trainer.train_epoch()
    t0 = time.perf_counter()
    trainer.train_epoch()
    dt = time.perf_counter() - t0
    steps_s = 50 / dt
    f_step = _flops_of(
        jax.jit(lambda p, o, i, t: trainer._train_step(p, o, i, t)),
        trainer.params, trainer.opt_state,
        jnp.zeros((8, 5, 32, 32, 1)), jnp.zeros((8, 5, 64, 64, 1)))
    tf = f_step * steps_s / 1e12
    note = (" (NB: DRF scans frames internally — cost_analysis counts the "
            "frame body once; treat as a lower bound)" if f_step else "")
    print(f"DRF train: {steps_s:.1f} steps/s, {tf:.1f} TFLOP/s "
          f"({100 * tf / PEAK_TFLOPS:.0f}% of bf16 peak){note}", flush=True)
    with jax.profiler.trace("/tmp/drf_train_trace"):
        trainer.train_epoch()
    print("\n===== DRFNet-5x64 device training epoch =====")
    summarize("/tmp/drf_train_trace")


def main(names: list[str]) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for name in names or ["edsr", "drf"]:
        {"edsr": profile_edsr, "drf": profile_drf}[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
