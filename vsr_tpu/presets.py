"""Measured serving presets: per-net knob settings that won on the chip.

Every number here was measured on one TPU v5e through the zoo serving
protocol (BENCH.md round 3; ``zoo_serving*.json``; ``scripts/probe_*``)
rather than guessed.  The reference framework has no analogue — its test
configs hard-code batch 1 (``/root/reference/configs/test/acdc_vsr_config.yaml``)
— so this module is where the round's tuning results become a product knob
instead of a table in BENCH.md.

Two levels:

- ``tuned`` — **exact** knobs only: ``lax.map`` chunk sizes, fused sub-pixel
  tails (the fold commutes with the checkpoint; float-exact), MISR window /
  VSR video serving modes, and recommended volumes-per-call for API batch
  serving.  Outputs are the same as the un-preset path to float eps.
- ``fast`` — ``tuned`` plus W8A8 (int8 weights x int8 activations on the
  double-rate MXU) where it measured FASTER on chip.  Approximate:
  quality gated per net in BENCH.md (uint8 output bit-identical on the zoo
  buffer for RBPN/DUF/TOFlow/EDVR; <=2 grey levels for EDSR).  Nets whose
  eligible convs live inside ``lax.scan`` bodies (SRFBN/DRFSISR/FRVSR) can
  only be quantized from a precomputed scales file
  (``scripts/calibrate_zoo_net.py``) — without one the preset leaves them
  at full precision and says so.  DRFNet regresses under every W8A8 subset
  (scan-body fusion break, BENCH.md) and is never quantized by a preset.

Usage::

    vsr_tpu.infer  IN OUT --net DUFNet --preset fast ...
    vsr_tpu.serve  --net DUFNet --preset tuned ...
    from vsr_tpu.presets import serving_config
    serving_config("DUFNet", "fast")
    # {'windows': 7, 'chunk': 100, 'w8a8': True}  (True = lazy-calibratable)

Explicit user flags always win: the preset only fills knobs still at their
CLI defaults.
"""
from __future__ import annotations

import logging

LEVELS = ("tuned", "fast")

#: Flax construction kwarg that holds each MISR net's window length, so the
#: preset follows a user's ``--net-kwargs`` override instead of assuming.
_WINDOW_KWARG = {
    "TOFlowNet": "num_frames",
    "DUFNet": "num_frames",
    "RBPNet": "num_frames",
    "EDVRNet": "nframes",
}

#: w8a8 field: ``"lazy"`` = first-batch calibration reaches every eligible
#: conv (no scan bodies); ``"scales"`` = needs a precomputed scales file
#: (eligible convs sit inside lax.scan bodies); absent = never quantize.
SERVING_PRESETS: dict[str, dict] = {
    "Bicubic": {},
    "EDSRNet": {
        "net_kwargs": {"fused_tail": True},   # +8.6% (ops/fused_tail.py)
        "volumes_per_call": 4,                # probe_edsr_vpc.py optimum
        "w8a8": "lazy",                       # 1.32x, <=2 grey levels
        # int8 MXU keeps scaling past bf16's optimum: W8A8 at vpc 8 =
        # 18.6 vol/s vs 16.6 at 4 (BENCH round-3 s5; bench.py times it).
        "volumes_per_call_w8a8": 8,
    },
    "MoEEDSRNet": {
        # dense dispatch: gated-mask all-expert FFN, no one-hot tensors —
        # 1.12x sparse at E=4 serving (probe_moe_dispatch.py); sparse
        # stays the default for EP training (per-expert local compute).
        "net_kwargs": {"fused_tail": True, "dispatch_impl": "dense"},
        "volumes_per_call": 4,                # EDSR-series optimum
        # no w8a8: the expert einsums dominate; convs alone gain little
    },
    "SRFBNet": {
        "net_kwargs": {"unroll": 4},          # unrolled feedback steps:
                                              # +5.7% (probe_unroll_serving)
        "chunk": 60,
        "w8a8": "scales",                     # scan-body feedback steps
        "w8a8_kernels": {6},                  # k6-only: 1.08x; full: 0.91x
    },
    "DRFSISRNet": {
        "net_kwargs": {"fused_tail": True, "unroll": 4},  # +2.4%
        "chunk": 60,
        "w8a8": "scales",
        "w8a8_kernels": {6},                  # 1.08x (probe_w8a8_selective)
    },
    "DRFNet": {
        "net_kwargs": {"fused_tail": True},
        "volumes_per_call": 4,
        "video": True,                        # whole-sequence VSR serving
        # no w8a8: regresses at every conv subset (BENCH.md round 3)
    },
    "FRVSRNet": {
        "volumes_per_call": 2,
        "video": True,
        "w8a8": "scales",                     # 1.12x with calibrated scales
    },
    "TOFlowNet": {"windows": 5, "chunk": 60, "w8a8": "lazy"},   # 1.09x
    "DUFNet": {"windows": 7, "chunk": 100, "w8a8": "lazy"},     # 1.15x
    "RBPNet": {"windows": 5, "chunk": 30, "w8a8": "lazy"},      # 1.34x
    "EDVRNet": {"windows": 5, "chunk": 30, "w8a8": "lazy"},     # 1.04x
    # Volumetric families: volume mode is automatic (infer.VOLUME_NETS);
    # volumes/call swept on chip (scripts/probe_vol_serving.py: 3D scales
    # 5.9 -> 25.2 vol/s from vpc 1 -> 4, vpc 8 only +2% more; the old "4D
    # peaks at vpc=1" was the in-scan thin tail — see Volume4DSRNet).
    # vol3d W8A8 (round 4, probe_w8a8_vol_serving): 1.22-1.32x bf16; the
    # int8 MXU keeps scaling past bf16's vpc-4 optimum, so the W8A8 path
    # carries its own vpc (8 -> 32.3 vol/s vs bf16's 25.4 at 4).
    # fused_tail (round 5, probe_vol_fused_tail): the final thin conv
    # folds through the 2D-in-3D shuffle — 26.3 -> 27.5 vol/s (+4.6%).
    "Volume3DSRNet": {"net_kwargs": {"fused_tail": True},
                      "volumes_per_call": 4, "w8a8": "lazy",
                      "volumes_per_call_w8a8": 8},
    # vol4d: NO w8a8 — measured 0.60x with callback scales (the in-scan
    # quantize/dequant pairs break the hidden-volume scan-body fusion;
    # the same regression class as DRFNet's all-conv W8A8). Explicit
    # --w8a8-scales still works for A/B, the preset never engages it.
    # hoist_tail (round 5, scripts/profile_vol4d_serving.py): the
    # upsample tail leaves the T-scan and batches over T*vpc — the
    # in-scan thin out-conv (C_out=1 at HR) ran at 0.6 TF/s and was
    # 30% of scan time, which is also why the shipped net DECREASED
    # with vpc (8.8/8.5/7.8 at 1/2/4); hoisted it scales again:
    # 9.4/12.3/13.2 vol/s -> vpc 4 = 1.50x the old row. Same params,
    # bitwise at f32; ±1 grey on 0.9% pixels at bf16 (conv-tiling
    # reassociation, the usual bf16 class).
    "Volume4DSRNet": {"net_kwargs": {"hoist_tail": True,
                                     "fused_tail": True},
                      # hoisted+fused keeps scaling: 13.4/13.9/14.3
                      # vol/s at vpc 4/6/8 (round-5 re-sweep).
                      "volumes_per_call": 8},
}


def load_preset_file(path: str) -> dict:
    """A ``--preset-file`` JSON (written by ``python -m vsr_tpu.tune``, or
    by hand): ``{net_name: preset_entry}`` in SERVING_PRESETS shape. The
    entries OVERRIDE the built-ins for the nets they name — machine-local
    measurements beat the shipped v5e numbers."""
    import json

    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(
            f"{path}: expected a JSON object of {{net_name: preset_entry}}"
            f", got {type(data).__name__}")
    entries = data.get("presets", data)  # tune.py wraps under "presets"
    if not isinstance(entries, dict) or not all(
            isinstance(v, dict) for v in entries.values()):
        raise ValueError(
            f"{path}: expected {{net_name: preset_entry}} (optionally "
            "under a 'presets' key)")
    return entries


def merged_preset_table(overrides: dict | None) -> dict:
    """SERVING_PRESETS with ``overrides`` (a --preset-file) MERGED per net,
    override keys winning: a tune.py file carries only the exact knobs it
    swept; wholesale replacement would silently strip the shipped
    w8a8/volumes_per_call knobs. tune.py writes explicit values (chunk 0,
    fused_tail False) for everything it DID sweep, so its measurements
    still win. The single merge authority — serving_config and
    apply_preset_to_args both consult it."""
    table = dict(SERVING_PRESETS)
    if overrides:
        for name, entry in overrides.items():
            merged = dict(table.get(name, {}))
            nk = {**merged.get("net_kwargs", {}),
                  **entry.get("net_kwargs", {})}
            merged.update(entry)
            if nk:
                merged["net_kwargs"] = nk
            table[name] = merged
    return table


def serving_config(net_name: str, level: str = "tuned",
                   net_kwargs: dict | None = None,
                   have_scales: bool = False,
                   overrides: dict | None = None) -> dict:
    """The measured serving knobs for ``net_name`` at ``level``.

    Returns a dict with any of: ``net_kwargs`` (extra construction kwargs,
    e.g. ``fused_tail``), ``chunk``, ``windows``, ``video``,
    ``volumes_per_call``, ``w8a8`` (``True`` = lazy first-batch
    calibration), ``w8a8_kernels``.  ``net_kwargs`` (the user's) is
    consulted for window-length overrides; ``have_scales`` says whether a
    precomputed activation-scales file is available (required to quantize
    the scan-body nets). ``overrides`` (from :func:`load_preset_file`)
    replaces the built-in entry for nets it names.
    """
    if level not in LEVELS:
        raise ValueError(f"Unknown preset level {level!r}; one of {LEVELS}")
    table = merged_preset_table(overrides)
    if net_name not in table:
        raise ValueError(
            f"No serving preset for net {net_name!r}; presets exist for: "
            f"{', '.join(sorted(table))}")
    preset = table[net_name]
    out: dict = {}
    if preset.get("net_kwargs"):
        out["net_kwargs"] = dict(preset["net_kwargs"])
    for knob in ("chunk", "video", "volumes_per_call"):
        if knob in preset:
            out[knob] = preset[knob]
    if "windows" in preset:
        kw = _WINDOW_KWARG.get(net_name)
        out["windows"] = int((net_kwargs or {}).get(kw, preset["windows"])
                             if kw else preset["windows"])
    if level == "fast" and "w8a8" in preset:
        mode = preset["w8a8"]
        if mode == "lazy":
            out["w8a8"] = True
        elif mode == "scales" and have_scales:
            out["w8a8"] = "scales"  # caller supplies the dict
        # scan-body net without scales: stay full precision (exact)
        if "w8a8" in out and "w8a8_kernels" in preset:
            out["w8a8_kernels"] = set(preset["w8a8_kernels"])
        if "w8a8" in out and "volumes_per_call_w8a8" in preset:
            # The int8 MXU's vpc optimum can sit past bf16's (EDSR and
            # vol3d both measured this) — the engaged-W8A8 preset serves
            # its own measured grouping.
            out["volumes_per_call"] = preset["volumes_per_call_w8a8"]
    return out


def apply_preset_to_args(args, level: str,
                         overrides: dict | None = None) -> list[str]:
    """Fill a CLI namespace in place from the net's preset.

    Works for all three serving CLIs — ``vsr_tpu.infer`` (bool ``--video``,
    lazy-calibration-capable ``--w8a8``), ``vsr_tpu.export`` (``--video-t``,
    W8A8 only with ``--calib``/``--w8a8-scales``) and ``vsr_tpu.serve``
    (``--video-t``, static scales only) — by detecting which knobs the
    namespace carries.  Only knobs still at their argparse defaults are
    touched: explicit user flags win.  Impossible combinations (chunk under
    ``--mesh``, lazy W8A8 where only static scales work) are skipped with a
    logged note instead of erroring, so ``--preset`` composes with the rest
    of the CLI.  Returns the list of notes (also logged).
    """
    import json

    have_scales = bool(getattr(args, "w8a8_scales", "")
                       or getattr(args, "calib", ""))
    try:
        cfg = serving_config(
            args.net, level,
            net_kwargs=json.loads(args.net_kwargs) if args.net_kwargs else {},
            have_scales=have_scales, overrides=overrides)
    except ValueError as exc:  # unknown net/level: a clean CLI error
        raise SystemExit(str(exc)) from None
    applied: list[str] = []

    if cfg.get("net_kwargs"):
        user = json.loads(args.net_kwargs) if args.net_kwargs else {}
        extra = {k: v for k, v in cfg["net_kwargs"].items() if k not in user}
        if extra:
            user.update(extra)
            args.net_kwargs = json.dumps(user)
            applied.append(f"net_kwargs += {extra}")

    mesh = bool(getattr(args, "mesh", ""))
    video_set = bool(getattr(args, "video", False)
                     or getattr(args, "video_t", 0))
    windows_set = bool(getattr(args, "windows", 0))
    user_chunk = bool(getattr(args, "chunk", 0))  # before the preset fills it

    if cfg.get("chunk") and not getattr(args, "chunk", 0):
        if mesh:
            applied.append("chunk skipped (--mesh shards the un-chunked "
                           "batch)")
        elif video_set:
            applied.append("chunk skipped (the --video path is already "
                           "sequence-batched)")
        else:
            args.chunk = cfg["chunk"]
            applied.append(f"chunk = {cfg['chunk']}")

    if (cfg.get("video") and not video_set and not windows_set
            and user_chunk):
        # The user explicitly chunked frame-mode serving; switching the
        # mode under them would turn their flag into a hard CLI error.
        applied.append("video skipped (explicit --chunk pins frame-mode "
                       "serving)")
    elif cfg.get("video") and not video_set and not windows_set:
        if hasattr(args, "video"):  # infer: T comes from each volume
            args.video = True
            applied.append("video = True (whole-sequence VSR serving)")
        else:  # export/serve compile a fixed-T program the user must pick
            applied.append(f"{args.net} serves best whole-sequence; "
                           "pass --video-t <frames per slice>")
    if cfg.get("windows") and not windows_set and not video_set:
        if hasattr(args, "seq_t") and not getattr(args, "seq_t", 0):
            applied.append(f"windows = {cfg['windows']} needs --seq-t "
                           "(frames per slice) here; not applied")
        else:
            args.windows = cfg["windows"]
            applied.append(f"windows = {cfg['windows']} (circular MISR eval)")

    w8a8 = cfg.get("w8a8")
    already = (getattr(args, "w8a8", False) or getattr(args, "int8", False)
               or getattr(args, "w8a8_scales", ""))
    if w8a8 is True and not already:
        # "lazy" nets: every eligible conv is reachable by first-batch
        # calibration — but only vsr_tpu.infer can do that; export needs
        # sample volumes (--calib) and the daemon static scales.
        if not hasattr(args, "w8a8"):
            applied.append("w8a8 skipped (live serving takes static scales "
                           "only; pass --w8a8-scales from "
                           "scripts/calibrate_zoo_net.py)")
        elif hasattr(args, "calib"):  # export CLI
            if getattr(args, "calib", ""):
                args.w8a8 = True
                applied.append("w8a8 = calibrate from --calib volumes")
            else:
                applied.append("w8a8 skipped (export needs --calib <nifti "
                               "dir> or --w8a8-scales to calibrate)")
        elif mesh:
            applied.append("w8a8 skipped (lazy calibration needs static "
                           "scales under --mesh; pass --w8a8-scales)")
        else:
            args.w8a8 = True
            applied.append("w8a8 = lazy first-batch calibration")
    if w8a8 == "scales" and not already and hasattr(args, "calib") \
            and getattr(args, "calib", ""):
        # Scan-body net on the export CLI with sample volumes: only the
        # callback recorder reaches lax.scan-body convs.
        if getattr(args, "calib_method", "outputs") == "callback":
            args.w8a8 = True
            applied.append("w8a8 = calibrate from --calib volumes "
                           "(callback recorder)")
        else:
            applied.append("w8a8 skipped (this net's eligible convs live in "
                           "scan bodies; re-run with --calib-method "
                           "callback)")
    merged_entry = merged_preset_table(overrides).get(args.net, {})
    if level == "fast" and "w8a8" not in cfg \
            and merged_entry.get("w8a8") == "scales":
        applied.append("w8a8 skipped (eligible convs live in scan bodies; "
                       "pass --w8a8-scales from scripts/calibrate_zoo_net.py "
                       "to quantize)")
    kernels = cfg.get("w8a8_kernels")
    if kernels and not getattr(args, "w8a8_kernels", ""):
        # Only restrict scales the preset itself enabled or the user
        # supplied; never invent a quantization mode.
        if getattr(args, "w8a8", False) or getattr(args, "w8a8_scales", ""):
            args.w8a8_kernels = ",".join(str(k) for k in sorted(kernels))
            applied.append(f"w8a8_kernels = {args.w8a8_kernels} "
                           "(full W8A8 regresses on the DBPN ladders)")

    for line in applied:
        logging.info(f"preset[{level}] {args.net}: {line}")
    return applied
