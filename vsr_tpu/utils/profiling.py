"""Profiling hooks.

The reference has no tracing (SURVEY.md §5 — only tqdm postfix). Here:
``trace(dir)`` wraps ``jax.profiler`` for TensorBoard-viewable device
traces, and ``StepTimer`` collects wall-time percentiles without forcing
device syncs except at report time.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield


class StepTimer:
    """Wall-clock step statistics with an explicit sync boundary."""

    def __init__(self) -> None:
        self.samples: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Optionally blocks on ``result`` before taking the timestamp."""
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.samples.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        xs = sorted(self.samples)
        n = len(xs)
        return {
            "steps": n,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p90_s": xs[min(n - 1, int(n * 0.9))],
            "max_s": xs[-1],
        }


def compiled_flops(jitted, *args) -> float:
    """Total FLOPs of the compiled program from XLA cost_analysis (0.0 when
    unavailable). NB: ``lax.scan`` bodies count ONCE regardless of trip
    count — lower the per-step module, not the scanned epoch program."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def summarize_trace(outdir: str) -> None:
    """Aggregate a jax.profiler trace's XLA-op track by hlo_category and top
    tf_op sites, with achieved TFLOP/s / GB/s per row (from the events'
    model_flops / raw_bytes_accessed metadata).

    Classification rules that matter (cost an hour each to learn): event
    NAMES mislabel convs as ``multiply_add_fusion`` — trust only the
    ``hlo_category`` arg; and ``while`` rows are containers whose duration
    double-counts their body, so they are excluded.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(f"no trace json under {outdir}; inspect with tensorboard")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace_json = json.load(f)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in trace_json.get("traceEvents", [])
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n}
    ev = [e for e in trace_json["traceEvents"]
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
