"""Fused batch-inference CLI: raw volumes -> k-space LR -> SR, on device.

The serving path of BASELINE.json config #4: walk a directory of raw
4D NIfTI volumes (or converted DSB15 series), run the whole
degrade-normalize-SR-denormalize chain as ONE jit-compiled device program
per slice-stack, and write SR sequences as NIfTI (+ optional GIFs).

Usage:
  python -m vsr_tpu.infer <input_dir> <output_dir> \
      --checkpoint results/.../model_best.ckpt \
      --net EDSRNet --net-kwargs '{"in_channels":1,...}' \
      --factor 2 [--dataset acdc] [--gif] [--bf16]

With ``--net Bicubic`` no checkpoint is needed (baseline serving).
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

import vsr_tpu.models  # noqa: F401 — registers nets
from vsr_tpu.io.nifti import load_nifti, save_nifti
from vsr_tpu.preprocess.intensity import center_crop_multiple, clip_outliers_minmax
from vsr_tpu.registry import build
from vsr_tpu.utils.normalize import DATASET_STATS


def make_prep(factor: int, dataset: str, video_t: int | None = None,
              window: tuple[int, int, str] | None = None,
              volume: tuple[str, int] | None = None):
    """The serving pipeline's input stage as a standalone traceable fn:
    HR float frames (N, H, W) -> (lr_frames, z) where ``z`` is the
    net-input batch (frames / ``video_t`` sequences / circular MISR
    windows / ``volume`` stacks). Shared by :func:`make_pipeline` and
    export-time W8A8 calibration (vsr_tpu/export.py) so the calibration
    inputs are exactly the batches the artifact will see.

    ``volume``: ``("3d"|"4d", t)`` for the volumetric nets — the N = D*t
    slice-major frames regroup into T volumes of D slices: ``"3d"`` gives
    (T, D, h, w, 1) (each time point one sample), ``"4d"`` adds the scan
    batch dim (1, T, D, h, w, 1)."""
    import jax.numpy as jnp

    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    mean, std = DATASET_STATS[dataset]

    def prep(hr_frames):
        lr = kspace_downscale_jax(hr_frames, factor)
        z = (lr - mean) / (std + 1e-10)
        z = z[..., None]
        if volume:
            vmode, vt = volume
            n, h, w, c = z.shape
            z = z.reshape(n // vt, vt, h, w, c)  # (D, T, h, w, c)
            z = jnp.swapaxes(z, 0, 1)            # (T, D, h, w, c)
            if vmode == "4d":
                z = z[None]                      # (1, T, D, h, w, c)
        elif video_t:
            n, h, w, c = z.shape
            z = z.reshape(n // video_t, video_t, h, w, c)
        elif window:
            from vsr_tpu.data.datasets import misr_target_index

            nf, seq_t, order = window
            n, h, w, c = z.shape
            seq = z.reshape(n // seq_t, seq_t, h, w, c)
            # Place output frame t at the net's target slot: the dataset
            # convention (datasets.py:misr_target_index) is nf//2 for odd
            # windows and nf//2 - 1 for even ones — nf//2 here would shift
            # every even-window SR sequence by one frame.
            shift = misr_target_index(nf) if order == "middle" else nf - 1
            idx = (jnp.arange(seq_t)[:, None]
                   + jnp.arange(nf)[None, :] - shift) % seq_t
            z = jnp.take(seq, idx, axis=1).reshape(n, nf, h, w, c)
        return lr, z

    return prep


# Nets whose forward takes an explicit ``train`` flag (they carry BatchNorm
# batch_stats); every serving surface (infer CLI, export, serve daemon,
# bench/calibration scripts) keys off this one list.
TRAIN_FLAG_NETS = ("TOFlowNet", "DUFNet")

# The volumetric net families (beyond-reference members): the CLI serves
# them automatically in volume mode — each NIfTI time point becomes one
# (D, h, w) sample ("3d") or the whole scan one (T, D, h, w) sample ("4d").
VOLUME_NETS = {"Volume3DSRNet": "3d", "Volume4DSRNet": "4d"}


def resolve_volume(net_name: str, *, video=False, windows: int = 0,
                   seq_t: int = 0, chunk: int = 0, mesh=None,
                   n_frames: int | None = None,
                   exc=ValueError) -> tuple[str, int] | None:
    """The ONE volume-mode guard cluster shared by every serving surface
    (infer CLI, export, serve live pipelines): returns ``(mode, t)`` for a
    volumetric net (``None`` otherwise) after validating the flag
    combination, raising ``exc`` with the canonical message on misuse."""
    vmode = VOLUME_NETS.get(net_name)
    if not vmode:
        return None
    if video or windows:
        raise exc("--video/--video-t/--windows do not apply to the "
                  "volumetric nets (volume mode is automatic)")
    if mesh is not None:
        bad = [a for a in ("model", "expert")
               if mesh.shape.get(a, 1) > 1]
        if bad:
            raise exc(f"volume serving does not compose with the "
                      f"{'/'.join(bad)!r} mesh axes — feature-sharded "
                      "kernels + depth-partitioned 3D convs hit the same "
                      "two-axis partitioner exposure as spatial x model "
                      "(tp.reject_spatial_x_model); shard depth with "
                      "seq/spatial (+data for 3d)")
        if vmode == "4d" and mesh.shape.get("data", 1) > 1:
            raise exc("4D volume serving has no batch dim to shard over "
                      "'data' (the whole scan is one causal sample) — "
                      "use seq/spatial")
        if chunk:
            raise exc("--chunk does not compose with volume serving "
                      "under --mesh (the lax.map chunking would hide the "
                      "volume sharding from the partitioner)")
    if not seq_t:
        raise exc("volumetric nets need --seq-t (frames per slice, T of "
                  "the N = D*T frame dim)")
    if vmode == "4d" and chunk:
        raise exc("--chunk has no effect on 4D volume serving (the whole "
                  "scan is one sample)")
    if n_frames is not None and n_frames % seq_t:
        raise exc(f"frames dim {n_frames} is not a multiple of the "
                  f"per-slice T {seq_t} (volume mode regroups N = D*T)")
    return (vmode, seq_t)


def build_serving_net(net_name: str, net_kwargs: dict, checkpoint: str = "",
                      *, lr_hw: tuple[int, int], video: bool = False,
                      windows: int = 0, volume: str | None = None,
                      ema: bool = False):
    """Registry-build a net and template-init (+ optionally checkpoint-load)
    its params for serving: the shared block behind the ``infer`` CLI, the
    ``export`` CLI, and the serving daemon's live pipelines.

    ``lr_hw``: the LR (net-input) spatial geometry. ``video``/``windows``/
    ``volume`` pick the example rank (whole-sequence VSR / circular MISR
    windows / volumetric stacks / per-frame). Returns
    ``(net, params, train_flag)``.
    """
    import jax
    import jax.numpy as jnp

    net = build("net", {"name": net_name, "kwargs": dict(net_kwargs)})
    lh, lw = lr_hw
    train_flag = net_name in TRAIN_FLAG_NETS
    if volume == "3d":
        example = jnp.zeros((1, 2, lh, lw, 1))
    elif volume == "4d":
        example = jnp.zeros((1, 2, 2, lh, lw, 1))
    elif video:
        example = jnp.zeros((1, 2, lh, lw, 1))
    elif windows:
        example = jnp.zeros((1, windows, lh, lw, 1))
    else:
        example = jnp.zeros((1, lh, lw, 1))
    init_kw = {"train": False} if train_flag else {}
    # jit the init: eager per-op init through a remote device link is
    # minutes; one compiled program is seconds.
    params = jax.jit(lambda k: net.init(k, example, **init_kw))(
        jax.random.PRNGKey(0))
    if checkpoint:
        from flax import serialization

        from vsr_tpu.utils.checkpoint import load_checkpoint

        state, _ = load_checkpoint(checkpoint)
        params = serialization.from_state_dict(params, state["params"])
        if ema:
            # Serve the EMA twin tracked by with_param_ema (optim.py): the
            # trainable collection is replaced by opt_state's ``ema`` tree
            # (non-trainable collections, e.g. batch_stats, stay live).
            # The wrapper may sit under optax.MultiSteps (grad
            # accumulation), so walk ``inner_opt_state`` nesting for the
            # exact ParamEmaState state-dict shape — a dict of exactly
            # {inner_opt_state, ema} — rather than any stray 'ema' key.
            def _find_ema(sd):
                if not isinstance(sd, dict):
                    return None
                if set(sd) == {"inner_opt_state", "ema"}:
                    return sd["ema"]
                # Recurse into EVERY nested dict, not just
                # 'inner_opt_state': optax.chain (e.g. grad_clip +
                # with_param_ema) serializes as {'0': ..., '1': ...}
                # tuples that would otherwise hide the EMA state.
                for v in sd.values():
                    found = _find_ema(v)
                    if found is not None:
                        return found
                return None

            ema_sd = _find_ema(state.get("opt_state"))
            if ema_sd is None:
                raise ValueError(
                    f"--ema: {checkpoint} carries no EMA params — train "
                    "with trainer.kwargs.ema_decay to track one")
            restored = serialization.from_state_dict(
                dict(params)["params"], ema_sd)
            params = dict(params)
            params["params"] = restored
    elif ema:
        raise ValueError("--ema needs --checkpoint")
    return net, params, train_flag


def _check_scales_match(params, scales: dict, w8a8_kernels) -> dict:
    """Apply the optional kernel-size filter and refuse a scales dict that
    quantizes NOTHING: an all-miss dict (calibrated for a different net, or
    stale after a rename, or over-filtered) would otherwise silently serve
    full precision via make_w8a8_apply's per-path fallback — the user
    believes W8A8 is on while A/B'ing bf16 against itself. Partial misses
    are legitimate (e.g. k6-filtered ladder calibrations) and logged."""
    from vsr_tpu.quantize import filter_scales_by_kernel, kernel_shapes

    if w8a8_kernels is not None:
        scales = filter_scales_by_kernel(params, scales, w8a8_kernels)
        if not scales:
            raise ValueError(
                f"w8a8_kernels={sorted(w8a8_kernels)} filtered every "
                "calibrated conv out — no conv of these kernel sizes is "
                "calibrated for this net")
    matched = set(scales) & set(kernel_shapes(params))
    if not matched:
        raise ValueError(
            "W8A8 scales match no conv in this net (calibrated for a "
            "different net/config, or stale paths?) — serving would "
            "silently be full precision. Sample scale paths: "
            f"{sorted(scales)[:3]}")
    if len(matched) < len(scales):
        logging.warning(
            f"W8A8: {len(scales) - len(matched)} of {len(scales)} scale "
            "entries match no conv in this net and are ignored")
    return scales


def make_pipeline(net, params, factor: int, dataset: str, int8: bool = False,
                  video_t: int | None = None, mesh=None,
                  window: tuple[int, int, str] | None = None,
                  volume: tuple[str, int] | None = None,
                  train_flag: bool = False, chunk: int = 0,
                  w8a8=False, w8a8_kernels=None):
    """One jitted device program: HR float frames (N, H, W) ->
    (lr_frames, sr_frames) uint8-valued float32.

    ``int8=True``: kernels are held in HBM as int8 with per-channel scales
    and dequantized inside the program (vsr_tpu/quantize.py) — 4x smaller
    weight footprint/traffic; accuracy gated at <0.05 dB PSNR delta in
    tests/test_quantize.py.

    ``w8a8``: serve the wide convs as s8 x s8 -> s32 on the double-rate
    int8 MXU (vsr_tpu/quantize.py). ``True`` calibrates static activation
    scales on the first batch (1.34x bf16 on the chip at the EDSR bench
    shape); a ``{path: scale}`` dict bakes precomputed scales; ``"dynamic"``
    uses per-call scales (universal but measured 0.89x — avoid). Accuracy
    gated at <0.5 dB in tests/test_quantize.py; narrow head/tail convs stay
    full precision. Composes with ``mesh`` when the scales are static
    (dict/"dynamic"); only the lazy ``True`` form is mesh-incompatible.

    ``w8a8_kernels``: restrict W8A8 to convs of these spatial kernel sizes
    (e.g. ``{6}``); the rest serve full precision. The DBPN-ladder nets
    need this: full W8A8 regresses there (quantizing the 1x1 squeezes
    breaks the concat fusions) while k6-only measures 1.08x on
    SRFBN/DRFSISR (scripts/probe_w8a8_selective.py). Static-scale forms
    only (lazy ``True`` or a dict — not ``"dynamic"``).

    ``video_t``: for sequence (VSR) nets — the N frames are D*video_t
    slice-sequences; the net sees (D, T, h, w, 1) and every SR frame is
    kept (frame order preserved).

    ``volume``: ``("3d"|"4d", t)`` for the volumetric nets
    (Volume3D/4DSRNet) — the N = D*t slice-major frames regroup into T
    volumes of D slices ("3d": batch of T samples; "4d": one (T, D, ...)
    scan sample); outputs flatten back to the input frame order.

    ``mesh``: a ``jax.sharding.Mesh`` — the pipeline is partitioned over it
    (frames over ``'data'``, H over ``'spatial'``; parallel/serving.py) for
    multi-chip batch serving.

    ``window``: for MISR nets — ``(n_frames, seq_t, order)``: the N frames
    are D*seq_t slice-sequences; every output frame gets one circular
    ``n_frames`` temporal window (the reference MISR eval protocol,
    ``acdc_misr_dataset.py:53-68``), built on device by a gather.
    ``order='middle'`` centers the window on the output frame, ``'last'``
    ends it there. ``train_flag``: pass ``train=False`` explicitly (the
    BatchNorm nets, TOFlow/DUF).

    ``chunk``: consume the frames/windows in ``lax.map`` chunks of this
    size inside the one program (frame/window modes only — the VSR video
    path is already sequence-batched). Bounds live activation memory AND
    is faster for the heavy MISR nets (zoo bench: DUF chunk 100 = +45%,
    TOFlow chunk 60 = +48% over chunk 30); the batch pads by edge-repeat
    to a chunk multiple and slices back (exact — items are independent)."""
    import jax
    import jax.numpy as jnp

    if chunk < 0:
        raise ValueError("chunk must be >= 0 (0 = disabled)")
    if chunk and video_t:
        raise ValueError(
            "chunk applies to frame/window serving; the video_t (whole-"
            "sequence) path is already sequence-batched")
    if volume and (video_t or window):
        raise ValueError("volume serving excludes video_t/window modes")
    if volume and volume[0] == "4d" and chunk:
        raise ValueError("chunk has no effect on 4D volume serving (the "
                         "whole scan is one sample)")
    if volume and mesh is not None:
        # Re-run the shared guard cluster (callers that bypass
        # resolve_volume get the same refusals).
        resolve_volume({"3d": "Volume3DSRNet", "4d": "Volume4DSRNet"}[
            volume[0]], seq_t=volume[1], chunk=chunk, mesh=mesh)
    if mesh is not None and mesh.shape.get("seq", 1) > 1 and not volume:
        raise ValueError(
            "the 'seq' mesh axis shards the volumetric pipelines' DEPTH — "
            "frame/video/window serving has no seq-shardable dim (the "
            "axis would silently replicate); use data/spatial")
    mean, std = DATASET_STATS[dataset]

    if mesh is not None and mesh.shape.get("expert", 1) > 1:
        # Expert-parallel serving (parallel/ep.py): the MoE net's expert
        # stacks (expert_* leaves) shard their leading num_experts dim over
        # 'expert'; each device computes its experts and the combine is
        # all-reduced over the axis, under the constraints the layer pins
        # (activated by use_mesh at the pipeline wrap below). Same
        # composition rule as training: 'data' only.
        from vsr_tpu.parallel.ep import (resolve_dispatch_impl,
                                         shard_expert_params,
                                         validate_expert_mesh)

        validate_expert_mesh(mesh, params, context="--mesh serving",
                             exc=ValueError,
                             dispatch_impl=resolve_dispatch_impl(net))
        params = shard_expert_params(params, mesh)
    elif mesh is not None and "model" in mesh.shape:
        # Tensor-parallel serving: the closed-over params commit to their
        # 'model'-axis shardings (output-feature dims split); GSPMD inserts
        # the boundary collectives in the partitioned pipeline. spatial x
        # model is refused (SPMD partitioner miscompile, see tp.py).
        from vsr_tpu.parallel.tp import (reject_spatial_x_model,
                                         shard_model_params)

        reject_spatial_x_model(mesh)
        params = shard_model_params(params, mesh)

    extra = {"train": False} if train_flag else {}
    if int8 and w8a8:
        raise ValueError("int8 (weight-only HBM residency) and w8a8 (int8 "
                         "MXU compute) are separate paths; pick one")
    if w8a8 is True and mesh is not None:
        raise ValueError(
            "w8a8 lazy (first-batch) calibration is not supported under "
            "--mesh; pass precomputed static scales (--w8a8-scales / a "
            "{path: scale} dict from calibrate_w8a8)")
    if w8a8_kernels is not None and (not w8a8 or w8a8 == "dynamic"):
        raise ValueError("w8a8_kernels filters static activation scales — "
                         "it needs w8a8=True (lazy calibration) or a "
                         "non-empty precomputed {path: scale} dict, not "
                         f"w8a8={w8a8!r}")
    if isinstance(w8a8, dict) and not w8a8:
        raise ValueError("w8a8={} is an empty scales dict — it would "
                         "silently serve full precision; pass False to "
                         "disable W8A8 explicitly")
    if w8a8:
        from vsr_tpu.quantize import make_w8a8_apply

        # A dict (from calibrate_w8a8) bakes static scales directly;
        # w8a8=True calibrates LAZILY on the first batch below — static
        # scales fuse the act-quantize into the producer and measure 1.34x
        # bf16 on the chip, where dynamic per-call scales measure 0.89x
        # (scripts/probe_w8a8_serving.py). "dynamic" forces the latter.
        if isinstance(w8a8, dict) or w8a8 == "dynamic":
            scales = w8a8 if isinstance(w8a8, dict) else "dynamic"
            if isinstance(scales, dict):
                scales = _check_scales_match(params, scales, w8a8_kernels)
            net_apply = make_w8a8_apply(net, params, act_scales=scales,
                                        **extra)
        else:
            net_apply = None  # resolved at first call
    elif int8:
        from vsr_tpu.quantize import make_quantized_apply, quantize_params

        qparams, scales = quantize_params(params)
        if mesh is not None and "expert" in mesh.shape:
            # quantize_params gathered the sharded leaves to host numpy;
            # re-apply the expert/model placement to the int8 tree (same
            # structure + kernel shapes -> same specs) or every device
            # would hold the full weight set, silently defeating EP/TP.
            from vsr_tpu.parallel.ep import shard_expert_params

            qparams = shard_expert_params(qparams, mesh)
            scales = shard_expert_params(scales, mesh)
        elif mesh is not None and "model" in mesh.shape:
            from vsr_tpu.parallel.tp import shard_model_params

            qparams = shard_model_params(qparams, mesh)
            scales = shard_model_params(scales, mesh)
        net_apply = make_quantized_apply(net, qparams, scales, **extra)
    else:
        net_apply = lambda z: net.apply(params, z, **extra)

    prep = make_prep(factor, dataset, video_t=video_t, window=window,
                     volume=volume)

    def make_fn(net_apply):
        def pipeline(hr_frames):
            lr, z = prep(hr_frames)
            if mesh is not None and volume:
                # Pin the regrouped volume batch to the mesh: depth over
                # 'seq' (3D-conv halo exchanges across slices — SURVEY §5's
                # context-parallel analogue at inference), time-batch over
                # 'data' (3d only), H over 'spatial'. The raw input frames
                # stay replicated (prep is a sliver of the conv compute);
                # GSPMD distributes everything downstream of this pin.
                from jax.sharding import NamedSharding, PartitionSpec as P

                from vsr_tpu.parallel.gspmd import _prune_spec

                vspec = (P("data", "seq", "spatial") if volume[0] == "3d"
                         else P(None, None, "seq", "spatial"))
                z = jax.lax.with_sharding_constraint(
                    z, NamedSharding(mesh, _prune_spec(mesh, vspec)))
            def apply_reduce(zb):
                """net -> one frame-shaped output per item (last feedback
                step, first tuple element) so chunked results stack
                cleanly."""
                out = net_apply(zb)
                if isinstance(out, tuple):
                    out = out[0]
                if out.ndim == 5 and not video_t and not volume:
                    out = out[-1]  # feedback nets stack steps on axis 0
                return out

            if chunk and not video_t:
                n_items = z.shape[0]
                pad = (-n_items) % chunk
                if pad:
                    z = jnp.concatenate(
                        [z, jnp.repeat(z[-1:], pad, axis=0)], axis=0)
                zc = z.reshape(-1, chunk, *z.shape[1:])
                sr = jax.lax.map(apply_reduce, zc)
                sr = sr.reshape(-1, *sr.shape[2:])[:n_items]
            else:
                sr = apply_reduce(z)
            if volume:
                # (T, D, H, W, C) [3d] / (1, T, D, H, W, C) [4d] back to
                # slice-major frames, the inverse of prep's regrouping.
                if volume[0] == "4d":
                    sr = sr[0]
                sr = jnp.swapaxes(sr, 0, 1)  # (D, T, H, W, C)
                sr = sr.reshape(-1, *sr.shape[2:])
            elif sr.ndim == 5:
                if video_t:  # whole-sequence SR: flatten frames back out
                    sr = sr.reshape(-1, *sr.shape[2:])
            sr = sr.astype(jnp.float32)[..., 0]
            sr = jnp.clip(jnp.round(sr * std + mean), 0, 255)
            return lr, sr

        return pipeline

    if net_apply is None:
        # w8a8=True: calibrate static activation scales on the FIRST batch
        # served (its normalized LR inputs), then serve every batch with
        # the baked-scale program. Scan-body convs (recurrent nets) cannot
        # be calibrated and stay full precision — exactness preserved.
        from vsr_tpu.quantize import (
            calibrate_w8a8, filter_scales_by_kernel, make_w8a8_apply,
        )

        state: dict = {}

        def lazy(hr_frames):
            if "fn" not in state:
                z = jax.jit(lambda h: prep(h)[1])(jnp.asarray(hr_frames))
                # Calibrate on one chunk-sized slice when serving is
                # chunked: scales are per-tensor maxima, and the full
                # un-chunked batch would compile a second large program
                # (and re-raise the activation footprint chunking bounds).
                z_cal = z[:chunk] if (chunk and not video_t) else z
                act_scales = calibrate_w8a8(net, params, [z_cal], **extra)
                if w8a8_kernels is not None:
                    act_scales = filter_scales_by_kernel(
                        params, act_scales, w8a8_kernels)
                if not act_scales:
                    raise ValueError(
                        "lazy W8A8 calibration found no quantizable conv "
                        + (f"of kernel sizes {sorted(w8a8_kernels)} "
                           if w8a8_kernels is not None else "")
                        + "— the whole net would silently serve full "
                        "precision. Eligible = non-recurrent nn.Conv with "
                        "min(C_in, C_out) >= 16; thinner nets cannot "
                        "benefit (drop --w8a8 / use --preset tuned), and "
                        "scan-body (recurrent) convs need precomputed "
                        "scales from calibrate_w8a8(method='callback') / "
                        "--w8a8-scales")
                state["fn"] = jax.jit(make_fn(make_w8a8_apply(
                    net, params, act_scales=act_scales, **extra)))
            return state["fn"](hr_frames)

        return lazy

    pipeline = make_fn(net_apply)
    if mesh is not None and volume:
        from vsr_tpu.parallel.serving import shard_volume_pipeline

        return shard_volume_pipeline(pipeline, mesh, volume[0], volume[1],
                                     factor=factor)
    if mesh is not None:
        from vsr_tpu.parallel.serving import shard_pipeline

        if mesh.shape.get("expert", 1) > 1:
            # Activate the MoE layers' expert-dim sharding constraints at
            # trace time (ep.use_mesh is a trace-time context; the with
            # block is live while jit/eval_shape trace the pipeline).
            from vsr_tpu.parallel.ep import use_mesh as _ep_use_mesh

            inner = pipeline

            def pipeline(hr_frames, _inner=inner):
                with _ep_use_mesh(mesh):
                    return _inner(hr_frames)

        return shard_pipeline(pipeline, mesh,
                              seq_len=video_t or (window[1] if window else None))
    return jax.jit(pipeline)


def run(args) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    net_kwargs = json.loads(args.net_kwargs) if args.net_kwargs else {}
    if args.bf16:
        net_kwargs["dtype"] = jnp.bfloat16
    if getattr(args, "fused_tail", False):
        # EDSR/DRF family + volumetric nets: fold the final conv through
        # the (2D-in-3D) pixel shuffle (ops/fused_tail.py).
        net_kwargs["fused_tail"] = True
    net = None  # built with the params at the first volume (LR geometry)

    mesh = None
    if getattr(args, "mesh", ""):
        from vsr_tpu.parallel.mesh import make_mesh
        from vsr_tpu.parallel.serving import parse_mesh_axes

        mesh = make_mesh(parse_mesh_axes(args.mesh))
        logging.info(f"Serving over mesh {dict(mesh.shape)}")

    paths = sorted(Path(args.input_dir).glob("**/*.nii*"))
    if not paths:
        raise SystemExit(f"No NIfTI volumes under {args.input_dir}")

    w8a8_arg = getattr(args, "w8a8", False)
    scales_path = getattr(args, "w8a8_scales", "")
    if scales_path:  # precomputed static scales imply --w8a8
        with open(scales_path) as f:
            w8a8_arg = {k: float(v) for k, v in json.load(f).items()}
    w8a8_kernels = None
    if getattr(args, "w8a8_kernels", ""):
        if not w8a8_arg:
            raise SystemExit("--w8a8-kernels needs --w8a8 or --w8a8-scales")
        w8a8_kernels = {int(s) for s in args.w8a8_kernels.split(",")}

    params = None
    pipelines: dict = {}
    n_frames = 0
    psnr_rows: list[tuple[str, float]] = []
    start = time.perf_counter()
    for path in paths:
        data = clip_outliers_minmax(load_nifti(path))
        if data.ndim == 3:
            data = data[..., None]  # (H, W, D) -> single-frame
        h0, hn, w0, wn = center_crop_multiple(data.shape[:2])
        data = data[h0:hn, w0:wn]  # (H, W, D, T)
        h, w, d, t = data.shape
        frames = np.moveaxis(data.reshape(h, w, d * t), -1, 0)  # (D*T, H, W)
        hr_ref = frames  # ground truth for --psnr (pre any bucket padding)

        video = bool(getattr(args, "video", False))
        windows = int(getattr(args, "windows", 0) or 0)
        if windows and video:
            raise SystemExit("--windows (MISR) and --video (VSR) are "
                             "mutually exclusive")
        vol = resolve_volume(
            args.net, video=video, windows=windows, seq_t=t,
            chunk=int(getattr(args, "chunk", 0) or 0), mesh=mesh,
            n_frames=frames.shape[0], exc=SystemExit)
        vmode = vol[0] if vol else None
        if int(getattr(args, "chunk", 0) or 0) < 0:
            raise SystemExit("--chunk must be >= 0 (0 = disabled)")
        if getattr(args, "chunk", 0) and mesh is not None:
            raise SystemExit("--chunk and --mesh are mutually exclusive "
                             "(the mesh path shards the un-chunked batch)")
        if getattr(args, "chunk", 0) and video:
            raise SystemExit("--chunk applies to frame/window serving; the "
                             "--video path is already sequence-batched")
        if getattr(args, "bucket_t", 0) and not video:
            raise SystemExit("--bucket-t requires --video (circular MISR "
                             "windows over a padded period are not exact, "
                             "and frame-at-a-time nets have no T axis to "
                             "bucket)")
        # Bucketed sequence length: round T up to a multiple of --bucket-t so
        # many distinct-T volumes share a few compiled programs (the serving
        # analogue of utils/bucketing.py). The recurrent VSR nets are causal
        # over T, so trailing pad frames cannot influence the first t outputs
        # — slicing back is exact; pad content is wrap-around (cine loops).
        bucket = int(getattr(args, "bucket_t", 0) or 0)
        t_eff = -(-t // bucket) * bucket if (video and bucket) else t
        if t_eff != t:
            seq = frames.reshape(d, t, *frames.shape[1:])
            frames = seq[:, np.arange(t_eff) % t].reshape(
                d * t_eff, *frames.shape[1:])
        # The BatchNorm nets take an explicit train flag (and carry
        # batch_stats in their variables).
        train_flag = args.net in TRAIN_FLAG_NETS
        if params is None:
            net, params, train_flag = build_serving_net(
                args.net, net_kwargs, args.checkpoint,
                lr_hw=(h // args.factor, w // args.factor),
                video=video, windows=windows, volume=vmode,
                ema=bool(getattr(args, "ema", False)))

        key = (h, w, t_eff if video else (t if (windows or vmode) else None))
        if key not in pipelines:
            pipelines[key] = make_pipeline(
                net, params, args.factor, args.dataset,
                int8=getattr(args, "int8", False),
                w8a8=w8a8_arg,
                w8a8_kernels=w8a8_kernels,
                video_t=t_eff if video else None,
                mesh=mesh,
                window=((windows, t, getattr(args, "window_order", "middle"))
                        if windows else None),
                volume=(vmode, t) if vmode else None,
                train_flag=train_flag,
                chunk=int(getattr(args, "chunk", 0) or 0))
        lr, sr = pipelines[key](frames if mesh is not None
                                else jax.device_put(frames))
        sr_np = np.asarray(sr).astype(np.float32)
        if t_eff != t:  # drop the causal pad frames
            sr_np = sr_np.reshape(d, t_eff, *sr_np.shape[1:])[:, :t]
            sr_np = sr_np.reshape(d * t, *sr_np.shape[2:])
        n_frames += d * t

        rel = path.relative_to(args.input_dir)
        out_base = Path(args.output_dir) / rel.parent / rel.name.split(".")[0]
        sr_seq = np.moveaxis(sr_np, 0, -1).reshape(h, w, d, t)
        save_nifti(sr_seq.astype(np.float32), Path(str(out_base) + "_sr.nii.gz"))
        if args.gif:
            import imageio

            for di in range(d):
                gif_path = Path(str(out_base) + f"_slice{di + 1:0>2d}.gif")
                with imageio.get_writer(gif_path) as writer:
                    for ti in range(t):
                        writer.append_data(sr_seq[:, :, di, ti].astype(np.uint8))
        if getattr(args, "psnr", False):
            # The pipeline degrades the input volume by --factor and
            # super-resolves it back, so the input IS the ground truth.
            # Reference PSNR convention (max=255, 1e-10 eps; metrics.py:46),
            # computed in numpy on the already-host arrays — never push
            # volumes back through the (slow, erratic) device link inside
            # the serving loop.
            diff = sr_np.astype(np.float64) - hr_ref.astype(np.float64)
            mse = np.mean(np.square(diff), axis=(1, 2))  # per frame
            val = float(np.mean(10.0 * np.log10(255.0 ** 2 / (mse + 1e-10))))
            psnr_rows.append((str(rel), val))
            logging.info(f"{path.name}: PSNR {val:.3f} dB")
        logging.info(f"{path.name}: {d * t} frames -> {out_base}_sr.nii.gz")

    elapsed = time.perf_counter() - start
    stats = {"volumes": len(paths), "frames": n_frames,
             "seconds": round(elapsed, 3),
             "frames_per_sec": round(n_frames / elapsed, 2),
             "programs": len(pipelines)}
    if psnr_rows:
        import csv

        csv_path = Path(args.output_dir) / "metrics.csv"
        with open(csv_path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["volume", "PSNR"])
            writer.writerows(psnr_rows)
        stats["psnr_mean"] = round(
            sum(v for _, v in psnr_rows) / len(psnr_rows), 4)
        logging.info(f"Mean PSNR {stats['psnr_mean']:.3f} dB -> {csv_path}")
    logging.info(f"Inference done: {stats}")
    return stats


def main() -> None:
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    parser = argparse.ArgumentParser(description="Fused SR inference over a volume tree.")
    parser.add_argument("input_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--net", default="EDSRNet")
    parser.add_argument("--net-kwargs", default="")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--ema", action="store_true",
                        help="serve the EMA param twin tracked by "
                             "trainer.kwargs.ema_decay (stored in the "
                             "checkpoint's opt_state)")
    parser.add_argument("--factor", type=int, default=2)
    parser.add_argument("--dataset", choices=["acdc", "dsb15"], default="acdc")
    parser.add_argument("--gif", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight quantization for serving")
    parser.add_argument("--w8a8", action="store_true",
                        help="int8 weights AND activations on the double-"
                             "rate int8 MXU (wide convs only; head/tail "
                             "stay full precision — see quantize.py); "
                             "static activation scales are calibrated on "
                             "the first served batch")
    parser.add_argument("--w8a8-scales", dest="w8a8_scales", default="",
                        help="JSON file of precomputed {module_path: scale} "
                             "activation scales (vsr_tpu.quantize."
                             "calibrate_w8a8 / scripts/calibrate_zoo_net.py "
                             "— required to quantize scan-body convs of "
                             "the recurrent nets); implies --w8a8")
    parser.add_argument("--w8a8-kernels", dest="w8a8_kernels", default="",
                        help="comma-separated spatial kernel sizes to "
                             "quantize (e.g. '6' or '3,6'); other convs "
                             "serve full precision. The DBPN-ladder nets "
                             "(SRFBN/DRFSISR) regress under full W8A8 but "
                             "win 1.08x at k6-only "
                             "(scripts/probe_w8a8_selective.py)")
    parser.add_argument("--video", action="store_true",
                        help="sequence (VSR) net: SR every slice's whole "
                             "time series as one sequence")
    parser.add_argument("--windows", type=int, default=0,
                        help="MISR net (DUF/EDVR/RBPN/TOFlow): serve every "
                             "frame from one circular N-frame temporal "
                             "window (the reference MISR eval protocol)")
    parser.add_argument("--window-order", dest="window_order",
                        choices=["middle", "last"], default="middle",
                        help="window alignment relative to the output frame")
    parser.add_argument("--chunk", type=int, default=0,
                        help="consume frames/windows in lax.map chunks of "
                             "this size inside the program (bounds live "
                             "memory; faster for heavy MISR nets — see "
                             "BENCH.md zoo table for per-net optima)")
    parser.add_argument("--bucket-t", dest="bucket_t", type=int, default=0,
                        help="with --video: round each sequence's T up to a "
                             "multiple of this (wrap-around pad, sliced back "
                             "after — exact for the causal VSR nets) so "
                             "variable-T volumes share compiled programs")
    parser.add_argument("--mesh", default="",
                        help="partition serving over a device mesh, e.g. "
                             "'data=4', 'data=2,spatial=2', or "
                             "'data=2,model=2' (-1 = all remaining devices; "
                             "'model' shards the net's parameters)")
    parser.add_argument("--psnr", action="store_true",
                        help="report PSNR of each SR volume vs its input "
                             "(the input is ground truth: it is degraded "
                             "by --factor on device, then super-resolved); "
                             "writes <output_dir>/metrics.csv")
    parser.add_argument("--fused-tail", dest="fused_tail", action="store_true",
                        help="fold the final conv through the pixel-shuffle "
                             "(EDSR/DRF; +~9%% serving throughput)")
    parser.add_argument("--preset-file", dest="preset_file", default="",
                        help="JSON of {net: preset_entry} measured on THIS "
                             "machine (python -m vsr_tpu.tune); overrides "
                             "the built-in table for the nets it names. "
                             "Implies --preset tuned unless --preset given")
    parser.add_argument("--preset", choices=["tuned", "fast"], default="",
                        help="apply the net's measured serving knobs "
                             "(vsr_tpu/presets.py): 'tuned' = exact knobs "
                             "only (chunk/fused-tail/video/windows), "
                             "'fast' = tuned + W8A8 where it measured "
                             "faster (quality gated per net in BENCH.md). "
                             "Explicit flags win over the preset")
    args = parser.parse_args()
    if args.preset_file and not args.preset:
        args.preset = "tuned"
    if args.preset:
        from vsr_tpu.presets import apply_preset_to_args, load_preset_file

        try:
            overrides = (load_preset_file(args.preset_file)
                         if args.preset_file else None)
        except (OSError, ValueError) as exc:
            raise SystemExit(f"--preset-file: {exc}") from None
        apply_preset_to_args(args, args.preset, overrides=overrides)
    run(args)


if __name__ == "__main__":
    main()
