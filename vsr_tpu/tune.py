"""On-device serving autotuner: measure the knobs on YOUR chip.

The shipped presets (vsr_tpu/presets.py) are v5e measurements; a different
TPU generation, geometry, or net config can have different optima. This
CLI sweeps the exact-math serving knobs — ``lax.map`` chunk size and the
fused sub-pixel tail — on synthetic volumes of the serving geometry,
using the audited timing scheme (two distinct HBM-resident buffers, one
warmup, one final ``block_until_ready``; CLAUDE.md: never read back
inside a timed loop through a relay), and writes a ``--preset-file`` JSON
the serving CLIs consume:

  python -m vsr_tpu.tune --net DUFNet --net-kwargs '{...}' \
      --checkpoint m.ckpt --shape 300,192,192 --windows 7 --seq-t 30 \
      --out tuned.json
  python -m vsr_tpu.infer IN OUT --net DUFNet ... --preset-file tuned.json

Only exact knobs are swept (outputs identical across the sweep up to
float reassociation); quantization (int8/W8A8) changes numerics and stays
an explicit user decision. The reference has no serving tuning story at
all (batch-1 test configs only).
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from typing import Any

import numpy as np


def _parse_grid(spec: str) -> list[int]:
    vals = sorted({int(s) for s in spec.split(",") if s.strip() != ""})
    if any(v < 0 for v in vals):
        raise SystemExit("--chunk-grid values must be >= 0 (0 = disabled)")
    return vals


def _time_pipeline(pipeline, bufs, repeats: int) -> float:
    """Seconds per sweep over all buffers (min of ``repeats``).

    CHAINED timing (CLAUDE.md relay audit): ``block_until_ready`` can be
    a no-op through a remote device relay, so call ``i+1`` consumes a
    zero-valued scalar derived from call ``i``'s output (a genuine data
    dependency that changes no math) and ONE ``float()`` readback at the
    end forces the whole chain."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(pipeline(bufs[0]))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        carry = jnp.zeros((), bufs[0].dtype)
        t0 = time.perf_counter()
        for b in bufs:
            _lr, sr = pipeline(b + carry)
            carry = (sr.ravel()[0] * 0).astype(bufs[0].dtype)
        float(carry)  # the single readback that drains the chain
        best = min(best, time.perf_counter() - t0)
    return best


def run(args) -> dict:
    import jax

    from vsr_tpu.export import _enable_compile_cache

    _enable_compile_cache()  # gated: never overrides a configured dir
    import jax.numpy as jnp

    from vsr_tpu.infer import (build_serving_net, make_pipeline,
                               resolve_volume)

    shape = tuple(int(s) for s in args.shape.split(","))
    if len(shape) != 3:
        raise SystemExit(f"--shape must be N,H,W, got {args.shape!r}")
    n, h, w = shape
    net_kwargs = json.loads(args.net_kwargs) if args.net_kwargs else {}
    if args.bf16:
        net_kwargs["dtype"] = jnp.bfloat16
    if args.windows and args.video_t:
        raise SystemExit("--windows and --video-t are mutually exclusive")
    if args.windows and not args.seq_t:
        raise SystemExit("--windows needs --seq-t (frames per slice)")
    volume = resolve_volume(args.net, video=bool(args.video_t),
                            windows=args.windows,
                            seq_t=int(args.seq_t or 0), chunk=0,
                            n_frames=n, exc=SystemExit)
    if args.video_t and n % args.video_t:
        raise SystemExit(f"frames dim {n} not a multiple of --video-t")
    if args.windows and n % args.seq_t:
        raise SystemExit(f"frames dim {n} is not a multiple of --seq-t "
                         f"{args.seq_t} (windows regroup N = D*T)")
    window = ((args.windows, args.seq_t, args.window_order)
              if args.windows else None)
    video_t = args.video_t or None

    # Knob space: chunk applies to frame/window modes and 3D volume mode;
    # the fused tail applies to nets that carry the kwarg.
    chunk_grid = _parse_grid(args.chunk_grid)
    if video_t or (volume and volume[0] == "4d"):
        chunk_grid = [0]  # those modes have no chunk knob

    from vsr_tpu.registry import build as registry_build

    probe_net = registry_build(
        "net", {"name": args.net, "kwargs": dict(net_kwargs)})
    tail_grid = ([False, True] if hasattr(probe_net, "fused_tail")
                 and "fused_tail" not in net_kwargs else [None])
    # MoE dispatch (models/moe.py): sparse one-hot vs dense gated-mask —
    # equal within float reassociation; the optimum flips with E and the
    # chip generation (BENCH.md round 3: dense 1.12x at E=4 on v5e).
    # Which (router, dispatch) combos are legal lives in models/moe.py
    # ONLY — an illegal one (e.g. radix x sparse) is refused at build and
    # recorded as an error row below, so this grid never duplicates the
    # legality rules. 'sort' keeps the un-swept default: dense dispatch
    # needs per-token ranks the sort router does not produce.
    dispatch_grid = (["sparse", "dense"]
                     if hasattr(probe_net, "dispatch_impl")
                     and "dispatch_impl" not in net_kwargs
                     and net_kwargs.get("router_impl") != "sort"
                     else [None])

    rng = np.random.default_rng(0)
    bufs = [jax.device_put(np.round(
        rng.random((n, h, w)) * 255).astype(np.float32)) for _ in range(2)]
    jax.block_until_ready(bufs)

    rows: list[dict[str, Any]] = []
    best = None
    for tail in tail_grid:
      for dispatch in dispatch_grid:
        kw = dict(net_kwargs)
        if tail is not None:
            kw["fused_tail"] = tail
        if dispatch is not None:
            kw["dispatch_impl"] = dispatch
        try:
            net, params, train_flag = build_serving_net(
                args.net, kw, args.checkpoint,
                lr_hw=(h // args.factor, w // args.factor),
                video=bool(video_t), windows=args.windows,
                volume=volume[0] if volume else None)
        except (ValueError, NotImplementedError) as exc:
            # A REFUSED knob combination (models/moe.py legality rules)
            # must not abort the sweep — record it at every chunk point it
            # would have covered (same row schema as timing failures) and
            # move on. Anything else (bad checkpoint path, OOM) stays
            # fatal with its real traceback.
            label = {k: v for k, v in
                     (("fused_tail", tail), ("dispatch_impl", dispatch))
                     if v is not None}
            err = f"{type(exc).__name__}: {str(exc)[:160]}"
            logging.warning(f"{label} REFUSED to build: {err}")
            rows.extend({"chunk": chunk, **label, "error": err}
                        for chunk in chunk_grid)
            continue
        for chunk in chunk_grid:
            label = {"chunk": chunk}
            if tail is not None:
                label["fused_tail"] = tail
            if dispatch is not None:
                label["dispatch_impl"] = dispatch
            try:
                pipe = make_pipeline(
                    net, params, args.factor, args.dataset,
                    video_t=video_t, window=window, volume=volume,
                    train_flag=train_flag, chunk=chunk)
                dt = _time_pipeline(pipe, bufs, args.repeats)
                vps = len(bufs) / dt
                row = {**label, "volumes_per_sec": round(vps, 3)}
                logging.info(f"{label} -> {vps:.3f} vol/s")
            except Exception as exc:
                row = {**label, "error": f"{type(exc).__name__}: "
                                         f"{str(exc)[:160]}"}
                logging.warning(f"{label} FAILED: {row['error']}")
                rows.append(row)
                continue
            rows.append(row)
            if best is None or vps > best[0]:
                best = (vps, label)

    if best is None:
        raise SystemExit("every knob combination failed — see the log")
    vps, knobs = best
    # EXPLICIT values for every swept knob (chunk 0 / fused_tail False
    # included): the --preset-file loader merges the entry over the
    # shipped one, so an omitted knob would silently resurrect the v5e
    # value this sweep just measured against.
    entry: dict[str, Any] = {"chunk": knobs["chunk"]}
    swept_kwargs = {k: knobs[k] for k in ("fused_tail", "dispatch_impl")
                    if k in knobs}
    if swept_kwargs:
        entry["net_kwargs"] = swept_kwargs
    if video_t:
        entry["video"] = True
    if args.windows:
        entry["windows"] = args.windows
    out = {
        "presets": {args.net: entry},
        "measured": rows,
        "best_volumes_per_sec": round(vps, 3),
        "geometry": list(shape),
        "factor": args.factor,
        "backend": jax.default_backend(),
        "created": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    logging.info(
        f"best {knobs} at {vps:.3f} vol/s -> {args.out} (use it with "
        f"--preset-file {args.out} on vsr_tpu.infer/serve/export)")
    return out


def main() -> None:
    logging.basicConfig(format="%(asctime)s | %(levelname)s | %(message)s",
                        level=logging.INFO, datefmt="%Y-%m-%d %H:%M:%S")
    p = argparse.ArgumentParser(
        description="Sweep exact serving knobs on this machine's chip and "
                    "write a --preset-file JSON")
    p.add_argument("--net", required=True)
    p.add_argument("--net-kwargs", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--shape", required=True,
                   help="HR frames geometry N,H,W to tune for")
    p.add_argument("--factor", type=int, default=2)
    p.add_argument("--dataset", choices=["acdc", "dsb15"], default="acdc")
    p.add_argument("--video-t", dest="video_t", type=int, default=0)
    p.add_argument("--windows", type=int, default=0)
    p.add_argument("--seq-t", dest="seq_t", type=int, default=0)
    p.add_argument("--window-order", dest="window_order",
                   choices=["middle", "last"], default="middle")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--chunk-grid", dest="chunk_grid", default="0,30,60,100")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--out", default="tuned.json")
    run(p.parse_args())


if __name__ == "__main__":
    main()
