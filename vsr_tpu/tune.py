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
    # Seed UN-swept shipped-preset net kwargs (hoist_tail, unroll, ...)
    # so the sweep measures the program that will actually be served —
    # without this, e.g. a Volume4DSRNet sweep would time the in-scan-tail
    # configuration while serving runs the hoisted one, and the written
    # knob winners would not transfer. Swept knobs and explicit
    # --net-kwargs still win.
    from vsr_tpu.presets import SERVING_PRESETS

    _swept = {"fused_tail", "dispatch_impl"}
    for _k, _v in SERVING_PRESETS.get(args.net, {}).get(
            "net_kwargs", {}).items():
        if _k not in net_kwargs and _k not in _swept:
            net_kwargs[_k] = _v
            logging.info(f"tune: seeding shipped preset net kwarg "
                         f"{_k}={_v} (un-swept; override via --net-kwargs)")
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
    for b in bufs:
        # Real transfer sync — block_until_ready does not await in-flight
        # device_puts through the relay (probe_vol4d_timing.py); a timed
        # row whose input is still streaming would measure the transfer.
        float(b.sum())

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


def run_train(args) -> dict:
    """``--train`` mode: sweep TRAINING knobs on the device-epoch trainer.

    Knobs (BENCH.md-measured candidates): ``scan_unroll`` (the +25-29%
    activation-stash win on the recurrent nets), compute ``dtype``
    (f32 / bf16 / bf16+carry_f32 — the hybrid keeps the recurrent carries
    f32, closing bf16's 0.47 dB flagship gap), ``grad_accumulation``
    (micro-step rate at k accumulations), and MoE ``dispatch_impl``.
    Timing: whole epochs as one device program each (the trusted
    device-epoch pattern; one readback per epoch).

    Unlike the serving sweep, dtype/carry_f32 CHANGE NUMERICS — every row
    carries ``"exact"`` and the result reports both ``best`` (overall)
    and ``best_exact`` (f32 math only); quality evidence for the bf16
    variants lives in BENCH.md / scripts/validate_vsr_learning.py.
    """
    import jax

    from vsr_tpu.export import _enable_compile_cache

    _enable_compile_cache()
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.registry import build as registry_build
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    shape = tuple(int(s) for s in args.train_shape.split(","))
    if len(shape) not in (3, 4, 5):
        raise SystemExit(
            f"--train-shape must be M,H,W (frame nets), M,T,H,W "
            f"(sequence/3D-volume nets) or M,T,D,H,W (4D nets), got "
            f"{args.train_shape!r}")
    net_kwargs = json.loads(args.net_kwargs) if args.net_kwargs else {}
    if "dtype" in net_kwargs:
        raise SystemExit(
            "--train sweeps the compute dtype itself — drop 'dtype' from "
            "--net-kwargs (the sweep covers float32 / bfloat16 / "
            "bfloat16+carry_f32)")
    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random(shape + (1,)) * 255).astype(np.float32)
    # Stride the LAST TWO spatial dims (works for (M,H,W), (M,T,H,W)
    # AND (M,T,D,H,W) buffers — depth is never scaled, transforms.py).
    lrbuf = (hrbuf[:, ::args.factor, ::args.factor, :]
             if len(shape) == 3 else
             hrbuf[..., ::args.factor, ::args.factor, :])
    t_len = shape[1] if len(shape) >= 4 else None

    probe_net = registry_build(
        "net", {"name": args.net, "kwargs": dict(net_kwargs)})
    unroll_grid = ([1] if not hasattr(probe_net, "unroll")
                   or "unroll" in net_kwargs
                   else sorted({1, int(getattr(probe_net, "num_steps", 0)
                                       or t_len or 1)}))
    dtype_grid: list[tuple[str, Any, bool]] = [("float32", None, False),
                                               ("bfloat16", jnp.bfloat16, False)]
    if hasattr(probe_net, "carry_f32"):
        dtype_grid.append(("bfloat16+carry_f32", jnp.bfloat16, True))
    ga_grid = sorted({int(s) for s in args.ga_grid.split(",") if s.strip()})
    # dispatch_impl must be a CONSTRUCTOR field (MoEEDSRNet); DRF exposes
    # it as a read-only property for EP validation.
    dispatch_grid = (["sparse", "dense"]
                     if "dispatch_impl" in getattr(
                         type(probe_net), "__dataclass_fields__", {})
                     and "dispatch_impl" not in net_kwargs
                     and net_kwargs.get("router_impl") != "sort"
                     else [None])

    rows: list[dict[str, Any]] = []
    best = best_exact = None
    for unroll in unroll_grid:
      for dname, dtype, carry in dtype_grid:
        for ga in ga_grid:
          for dispatch in dispatch_grid:
            kw = dict(net_kwargs)
            if dtype is not None:
                kw["dtype"] = dtype
            if carry:
                kw["carry_f32"] = True
            if dispatch is not None:
                kw["dispatch_impl"] = dispatch
            label = {"scan_unroll": unroll, "dtype": dname,
                     "grad_accumulation": ga,
                     **({"dispatch_impl": dispatch} if dispatch else {})}
            exact = dtype is None
            try:
                tx = optax.adam(1e-4)
                if ga > 1:
                    tx = optax.MultiSteps(tx, every_k_schedule=ga)
                trainer = DeviceEpochTrainer(
                    net=registry_build("net", {"name": args.net,
                                               "kwargs": kw}),
                    loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
                    optimizer=tx, lr_data=lrbuf, hr_data=hrbuf,
                    batch_size=args.batch, patch=args.patch,
                    ratio=args.factor, steps_per_epoch=args.steps,
                    scan_unroll=unroll)
                t0 = time.perf_counter()
                trainer.train_epoch()  # compile + warm
                compile_s = time.perf_counter() - t0
                rate = 0.0
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    trainer.train_epoch()
                    rate = max(rate,
                               args.steps / (time.perf_counter() - t0))
                row = {**label, "steps_per_sec": round(rate, 2),
                       "exact": exact, "compile_s": round(compile_s, 1)}
                logging.info(f"{label} -> {rate:.1f} steps/s")
            except Exception as exc:
                row = {**label, "exact": exact,
                       "error": f"{type(exc).__name__}: {str(exc)[:160]}"}
                logging.warning(f"{label} FAILED: {row['error']}")
                rows.append(row)
                continue
            rows.append(row)
            if best is None or rate > best[0]:
                best = (rate, label)
            if exact and (best_exact is None or rate > best_exact[0]):
                best_exact = (rate, label)

    if best is None:
        raise SystemExit("every training knob combination failed — see log")

    def entry(knobs: dict) -> dict:
        e: dict[str, Any] = {"scan_unroll": knobs["scan_unroll"]}
        if knobs["grad_accumulation"] > 1:
            e["grad_accumulation"] = knobs["grad_accumulation"]
        nk: dict[str, Any] = {}
        if knobs["dtype"] != "float32":
            nk["dtype"] = "bfloat16"
        if "carry_f32" in knobs["dtype"]:
            nk["carry_f32"] = True
        if knobs.get("dispatch_impl"):
            nk["dispatch_impl"] = knobs["dispatch_impl"]
        if nk:
            e["net_kwargs"] = nk
        return e

    out = {
        "train_presets": {args.net: entry(best[1])},
        "train_presets_exact": {args.net: entry(best_exact[1])}
        if best_exact else {},
        "measured": rows,
        "best_steps_per_sec": round(best[0], 2),
        "geometry": list(shape),
        "batch": args.batch, "patch": args.patch, "factor": args.factor,
        "backend": jax.default_backend(),
        "created": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    logging.info(
        f"best {best[1]} at {best[0]:.1f} steps/s"
        + (f" (best exact-math: {best_exact[1]} at {best_exact[0]:.1f})"
           if best_exact else "")
        + f" -> {args.out} (merge train_presets[*] into "
        "trainer.kwargs / net.kwargs of your *_device.yaml)")
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
    p.add_argument("--shape", default="",
                   help="HR frames geometry N,H,W to tune for "
                        "(serving mode; required unless --train)")
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
    p.add_argument("--train", action="store_true",
                   help="sweep TRAINING knobs (scan_unroll / dtype+"
                        "carry_f32 / grad_accumulation / MoE dispatch) on "
                        "the device-epoch trainer instead of serving knobs. "
                        "The sweep's LR buffer is pixel-strided synthetic "
                        "noise (NOT the k-space degrade real training "
                        "uses): steps/s rankings are the product; ignore "
                        "any loss values printed during the sweep")
    p.add_argument("--train-shape", dest="train_shape", default="",
                   help="HR training buffer geometry: M,H,W (frame nets), "
                        "M,T,H,W (sequence / 3D-volume nets) or "
                        "M,T,D,H,W (4D nets)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--patch", type=int, default=32,
                   help="LR patch size sampled from the buffers")
    p.add_argument("--steps", type=int, default=50,
                   help="steps per timed device epoch")
    p.add_argument("--ga-grid", dest="ga_grid", default="1",
                   help="grad_accumulation grid, e.g. 1,2,4")
    args = p.parse_args()
    if args.train:
        if not args.train_shape:
            raise SystemExit("--train needs --train-shape M[,T],H,W")
        run_train(args)
    else:
        if not args.shape:
            raise SystemExit("serving mode needs --shape N,H,W "
                             "(or pass --train)")
        run(args)


if __name__ == "__main__":
    main()
