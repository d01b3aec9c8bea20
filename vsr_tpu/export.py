"""Model export for deployment: serialized, self-contained serving programs.

The reference has no deployment story beyond "load the checkpoint in
Python" (``/root/reference/src/runner/predictors/base_predictor.py:130``);
production TPU serving wants the opposite: a single artifact that runs
without the model zoo's Python code. This module serializes the FUSED
serving pipeline (k-space degrade -> normalize -> net -> denormalize, the
same program ``vsr_tpu.infer`` builds) via ``jax.export`` (StableHLO +
calling convention, versioned and stable across jax releases), with the
trained parameters baked in as constants.

Artifact format (``.vsrx``): a zip with
  program.stablehlo  — jax.export blob (params embedded)
  meta.json          — net name/kwargs, factor, dataset stats, shapes,
                       lowering platforms, creation info

Export is shape-specialized (TPU serving is static-shape by design);
export one artifact per serving geometry, or a small set — the same
bucketing story as compilation.

CLI:
  python -m vsr_tpu.export --net EDSRNet --checkpoint model.ckpt \
      --shape 300,96,96 --factor 2 --out edsr_x2.vsrx [--platforms tpu,cpu]
  python -m vsr_tpu.export --run edsr_x2.vsrx in_dir out_dir   # serve it
"""

from __future__ import annotations

import argparse
import json
import logging
import time
import zipfile
from pathlib import Path
from typing import Any, Sequence

import numpy as np

from vsr_tpu.utils.normalize import DATASET_STATS

FORMAT_VERSION = 1


def make_serving_fn(net, params, factor: int, dataset: str,
                    video_t: int | None = None, train_flag: bool = False,
                    int8: bool = False, window=None, chunk: int = 0,
                    w8a8=False, volume=None):
    """The fused HR-frames -> (lr, sr) serving program — delegated to
    ``vsr_tpu.infer.make_pipeline`` (mesh=None) so the exported artifact is
    THE SAME program the CLI serves: frame, whole-sequence (``video_t``),
    and circular MISR window (``window=(nf, seq_t, order)``) modes, int8
    weight baking, W8A8 int8-MXU convs (``w8a8``: a ``{path: scale}`` dict
    of static activation scales — export is a static program, so lazy
    ``w8a8=True`` calibration is rejected here), feedback-net last-step
    selection. Returns a jitted callable ``hr_frames -> (lr, sr)``.
    """
    from vsr_tpu.infer import make_pipeline

    if w8a8 is True:
        raise ValueError(
            "export needs static W8A8 activation scales (a {path: scale} "
            "dict from vsr_tpu.quantize.calibrate_w8a8) — lazy first-batch "
            "calibration cannot be serialized")
    return make_pipeline(net, params, factor, dataset, int8=int8,
                         video_t=video_t, mesh=None, window=window,
                         volume=volume, train_flag=train_flag, chunk=chunk,
                         w8a8=w8a8)


def export_serving(
    net: Any,
    params: Any,
    frames_shape: Sequence[int],
    factor: int,
    dataset: str = "acdc",
    video_t: int | None = None,
    train_flag: bool = False,
    int8: bool = False,
    window=None,
    chunk: int = 0,
    w8a8=False,
    volume=None,
    platforms: Sequence[str] | None = None,
) -> tuple[bytes, dict]:
    """Serialize the fused serving program. Returns (blob, meta)."""
    import jax
    from jax import export as jexport

    fn = make_serving_fn(net, params, factor, dataset, video_t=video_t,
                         train_flag=train_flag, int8=int8, window=window,
                         chunk=chunk, w8a8=w8a8, volume=volume)
    spec = jax.ShapeDtypeStruct(tuple(frames_shape), jax.numpy.float32)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(fn, **kw)(spec)
    meta = {
        "format_version": FORMAT_VERSION,
        "frames_shape": list(frames_shape),
        "factor": factor,
        "dataset": dataset,
        "video_t": video_t,
        "window": list(window) if window else None,
        "volume": list(volume) if volume else None,
        "chunk": chunk,
        "int8": int8,
        "w8a8_convs": len(w8a8) if isinstance(w8a8, dict) else 0,
        "platforms": list(exp.platforms),
        "created": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    return exp.serialize(), meta


def save_artifact(path: str | Path, blob: bytes, meta: dict) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("program.stablehlo", blob)
        zf.writestr("meta.json", json.dumps(meta, indent=1))


class ExportedServing:
    """A loaded ``.vsrx`` artifact: ``__call__(hr_frames) -> (lr, sr)``.

    Needs only jax + this class — no model code, no checkpoint."""

    def __init__(self, path: str | Path):
        from jax import export as jexport

        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read("meta.json"))
            if self.meta.get("format_version", 0) > FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {self.meta['format_version']} is newer "
                    f"than this runtime ({FORMAT_VERSION})")
            self._exp = jexport.deserialize(zf.read("program.stablehlo"))

    def __call__(self, hr_frames):
        return self._exp.call(hr_frames)


def _enable_compile_cache() -> None:
    import jax

    if jax.config.jax_compilation_cache_dir is not None:
        # Never override an already-configured cache dir: the pytest suite
        # runs with its PRIVATE dir (tests/conftest.py) precisely so
        # differently-flagged processes can't poison the shared one.
        return
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _cmd_export(args) -> None:
    import jax.numpy as jnp

    _enable_compile_cache()
    net_kwargs = json.loads(args.net_kwargs) if args.net_kwargs else {}
    if args.bf16:
        net_kwargs["dtype"] = jnp.bfloat16
    shape = tuple(int(s) for s in args.shape.split(","))
    windows = int(getattr(args, "windows", 0) or 0)
    if windows and args.video_t:
        raise SystemExit("--windows (MISR) and --video-t (VSR) are "
                         "mutually exclusive")
    chunk = int(getattr(args, "chunk", 0) or 0)
    if chunk < 0:
        raise SystemExit("--chunk must be >= 0 (0 = disabled)")
    if chunk and args.video_t:
        raise SystemExit("--chunk applies to frame/window serving; the "
                         "--video-t path is already sequence-batched")

    from vsr_tpu.infer import build_serving_net, resolve_volume

    volume = resolve_volume(args.net, video=bool(args.video_t),
                            windows=windows,
                            seq_t=int(getattr(args, "seq_t", 0) or 0),
                            chunk=chunk, n_frames=shape[0], exc=SystemExit)
    vmode = volume[0] if volume else None
    if volume and (getattr(args, "w8a8", False) or
                   getattr(args, "w8a8_scales", "")):
        raise SystemExit("W8A8 quantizes wide 2D nn.Conv layers; the "
                         "volumetric nets' 3D convs have no quantizable "
                         "path — drop --w8a8/--w8a8-scales")

    h, w = shape[-2], shape[-1]
    net, params, train_flag = build_serving_net(
        args.net, net_kwargs, args.checkpoint,
        lr_hw=(h // args.factor, w // args.factor),
        video=bool(args.video_t), windows=windows, volume=vmode)

    # MISR window serving needs the per-slice sequence length (seq_t) to
    # build circular windows on device: --seq-t, like infer's per-volume t.
    window = None
    if windows:
        if not args.seq_t:
            raise SystemExit("--windows needs --seq-t (frames per slice "
                             "sequence in the serving geometry)")
        window = (windows, args.seq_t,
                  getattr(args, "window_order", "middle"))

    w8a8: Any = False
    scales_path = getattr(args, "w8a8_scales", "")
    if scales_path:
        with open(scales_path) as f:
            w8a8 = {k: float(v) for k, v in json.load(f).items()}
    elif getattr(args, "w8a8", False):
        if not args.calib:
            raise SystemExit(
                "--w8a8 export needs static activation scales: pass "
                "--w8a8-scales <json> (vsr_tpu.quantize.calibrate_w8a8 / "
                "scripts/calibrate_zoo_net.py) or --calib <nifti dir> to "
                "calibrate from sample volumes here")
        w8a8 = _calibrate_from_volumes(
            net, params, Path(args.calib), shape, args.factor, args.dataset,
            args.video_t or None, window, train_flag, args.calib_method,
            volume=volume)
        logging.info(f"Calibrated {len(w8a8)} conv activation scales "
                     f"from {args.calib} (method={args.calib_method})")
    if w8a8 and getattr(args, "int8", False):
        raise SystemExit("--int8 (weight-only) and --w8a8 (int8 MXU "
                         "compute) are separate paths; pick one")
    if getattr(args, "w8a8_kernels", ""):
        if not isinstance(w8a8, dict):
            raise SystemExit("--w8a8-kernels needs W8A8 scales "
                             "(--w8a8-scales or --w8a8 with --calib)")
        from vsr_tpu.quantize import filter_scales_by_kernel

        sizes = {int(s) for s in args.w8a8_kernels.split(",")}
        w8a8 = filter_scales_by_kernel(params, w8a8, sizes)
        logging.info(f"--w8a8-kernels {sorted(sizes)}: "
                     f"{len(w8a8)} convs stay quantized")

    platforms = args.platforms.split(",") if args.platforms else None
    blob, meta = export_serving(
        net, params, shape, args.factor, dataset=args.dataset,
        video_t=args.video_t or None, train_flag=train_flag,
        int8=getattr(args, "int8", False), window=window,
        chunk=chunk, w8a8=w8a8, volume=volume, platforms=platforms)
    meta.update({"net": args.net, "net_kwargs": net_kwargs
                 if not args.bf16 else {**net_kwargs, "dtype": "bfloat16"}})
    save_artifact(args.out, blob, meta)
    logging.info(f"Exported {args.net} ({meta['platforms']}) "
                 f"{shape} -> {args.out} "
                 f"({Path(args.out).stat().st_size / 1e6:.1f} MB)")


def _load_hr_frames(path: Path) -> tuple[np.ndarray, tuple[int, ...]]:
    """One NIfTI volume -> (frames (d*t, h, w) float, (h, w, d, t)) with the
    serving preprocessing (outlier clip + /12 center crop) applied — the
    same frames `vsr_tpu.infer` feeds the pipeline."""
    from vsr_tpu.io.nifti import load_nifti
    from vsr_tpu.preprocess.intensity import (center_crop_multiple,
                                              clip_outliers_minmax)

    data = clip_outliers_minmax(load_nifti(path))
    if data.ndim == 3:
        data = data[..., None]
    h0, hn, w0, wn = center_crop_multiple(data.shape[:2])
    data = data[h0:hn, w0:wn]
    h, w, d, t = data.shape
    return np.moveaxis(data.reshape(h, w, d * t), -1, 0), (h, w, d, t)


def _calibrate_from_volumes(net, params, calib_dir: Path, want, factor,
                            dataset, video_t, window, train_flag,
                            method: str, max_volumes: int = 4,
                            volume=None) -> dict:
    """Export-time W8A8 calibration: build net-input batches from sample
    NIfTI volumes of the artifact geometry (via the SAME prep stage the
    artifact will run, ``infer.make_prep``) and return static activation
    scales. ``method="callback"`` also reaches ``nn.scan``-body convs
    (recurrent nets) — run it on the CPU backend (see quantize.py)."""
    import jax

    from vsr_tpu.infer import make_prep
    from vsr_tpu.quantize import calibrate_w8a8

    prep = jax.jit(lambda h: make_prep(factor, dataset, video_t=video_t,
                                       window=window, volume=volume)(h)[1])
    zs = []
    for path in sorted(Path(calib_dir).glob("**/*.nii*")):
        frames, _ = _load_hr_frames(path)
        if frames.shape == tuple(want):
            zs.append(prep(frames.astype(np.float32)))
        if len(zs) >= max_volumes:
            break
    if not zs:
        raise SystemExit(
            f"--calib: no NIfTI volume under {calib_dir} matches the "
            f"artifact geometry {tuple(want)}")
    extra = {"train": False} if train_flag else {}
    return calibrate_w8a8(net, params, zs, method=method, **extra)


def _cmd_run(args) -> None:
    import jax

    from vsr_tpu.io.nifti import save_nifti

    _enable_compile_cache()
    serving = ExportedServing(args.run)
    want = tuple(serving.meta["frames_shape"])
    paths = sorted(Path(args.input_dir).glob("**/*.nii*"))
    if not paths:
        raise SystemExit(f"No NIfTI volumes under {args.input_dir}")
    done = 0
    for path in paths:
        frames, (h, w, d, t) = _load_hr_frames(path)
        if frames.shape != want:
            logging.warning(
                f"{path.name}: shape {frames.shape} != artifact {want} — "
                "skipped (export one artifact per serving geometry)")
            continue
        _, sr = serving(jax.device_put(frames.astype(np.float32)))
        sr_np = np.asarray(sr, dtype=np.float32)
        rel = path.relative_to(args.input_dir)
        out_base = Path(args.output_dir) / rel.parent / rel.name.split(".")[0]
        out_base.parent.mkdir(parents=True, exist_ok=True)
        save_nifti(np.moveaxis(sr_np, 0, -1).reshape(h, w, d, t),
                   Path(str(out_base) + "_sr.nii.gz"))
        done += 1
    logging.info(f"Served {done}/{len(paths)} volumes from {args.run}")
    if done == 0:
        raise SystemExit(
            f"All {len(paths)} volumes were skipped (shape != artifact "
            f"geometry {want}) — nothing served")


def main() -> None:
    logging.basicConfig(format="%(asctime)s | %(levelname)s | %(message)s",
                        level=logging.INFO, datefmt="%Y-%m-%d %H:%M:%S")
    p = argparse.ArgumentParser(
        description="Export / run self-contained serving artifacts (.vsrx)")
    p.add_argument("--run", default="",
                   help="path to a .vsrx artifact: serve input_dir->output_dir")
    p.add_argument("input_dir", nargs="?", type=Path)
    p.add_argument("output_dir", nargs="?", type=Path)
    p.add_argument("--net", default="EDSRNet")
    p.add_argument("--net-kwargs", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--factor", type=int, default=2)
    p.add_argument("--dataset", choices=["acdc", "dsb15"], default="acdc")
    p.add_argument("--shape", default="300,96,96",
                   help="HR frames shape N,H,W the artifact is specialized to")
    p.add_argument("--video-t", dest="video_t", type=int, default=0,
                   help="whole-sequence (VSR) serving with this T")
    p.add_argument("--windows", type=int, default=0,
                   help="MISR net (DUF/EDVR/RBPN/TOFlow): one circular "
                        "N-frame window per output frame")
    p.add_argument("--seq-t", dest="seq_t", type=int, default=0,
                   help="frames per slice sequence in the serving geometry "
                        "(required with --windows and with the volumetric "
                        "nets' automatic volume mode)")
    p.add_argument("--window-order", dest="window_order",
                   choices=["middle", "last"], default="middle")
    p.add_argument("--chunk", type=int, default=0,
                   help="bake lax.map chunking of this size into the "
                        "artifact (memory-bounded serving; see BENCH.md "
                        "for per-net optima)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="bake int8-quantized weights into the artifact "
                        "(4x smaller; <0.05 dB gated in tests)")
    p.add_argument("--w8a8", action="store_true",
                   help="bake W8A8 int8-MXU convs into the artifact "
                        "(double-rate MXU — see BENCH.md zoo table for "
                        "which nets win); needs --w8a8-scales or --calib")
    p.add_argument("--w8a8-scales", dest="w8a8_scales", default="",
                   help="JSON file of precomputed {module_path: scale} "
                        "activation scales (vsr_tpu.quantize.calibrate_w8a8"
                        " / scripts/calibrate_zoo_net.py); implies --w8a8")
    p.add_argument("--w8a8-kernels", dest="w8a8_kernels", default="",
                   help="comma-separated spatial kernel sizes to quantize "
                        "(e.g. '6'); other convs stay full precision — "
                        "the selective-W8A8 knob the DBPN-ladder nets "
                        "need (scripts/probe_w8a8_selective.py)")
    p.add_argument("--calib", default="",
                   help="with --w8a8: directory of sample NIfTI volumes of "
                        "the artifact geometry to calibrate activation "
                        "scales from at export time")
    p.add_argument("--calib-method", dest="calib_method",
                   choices=["outputs", "callback"], default="outputs",
                   help="calibration recorder: 'callback' also reaches "
                        "nn.scan-body convs (recurrent nets) but runs one "
                        "host callback per conv per step — use on the CPU "
                        "backend (scales are backend-independent)")
    p.add_argument("--platforms", default="",
                   help="lowering platforms, e.g. 'tpu' or 'tpu,cpu' "
                        "(default: current backend)")
    p.add_argument("--out", default="model.vsrx")
    p.add_argument("--preset-file", dest="preset_file", default="",
                   help="JSON of {net: preset_entry} measured on THIS "
                        "machine (python -m vsr_tpu.tune); overrides the "
                        "built-in table. Implies --preset tuned")
    p.add_argument("--preset", choices=["tuned", "fast"], default="",
                   help="apply the net's measured serving knobs "
                        "(vsr_tpu/presets.py) to the exported program; "
                        "explicit flags win. W8A8 at export time needs "
                        "--calib or --w8a8-scales")
    args = p.parse_args()
    if args.preset_file and not args.preset:
        args.preset = "tuned"
    if args.preset and not args.run:
        from vsr_tpu.presets import apply_preset_to_args, load_preset_file

        try:
            overrides = (load_preset_file(args.preset_file)
                         if args.preset_file else None)
        except (OSError, ValueError) as exc:
            raise SystemExit(f"--preset-file: {exc}") from None
        apply_preset_to_args(args, args.preset, overrides=overrides)
    if args.run:
        if not (args.input_dir and args.output_dir):
            raise SystemExit("--run needs input_dir and output_dir")
        _cmd_run(args)
    else:
        _cmd_export(args)


if __name__ == "__main__":
    main()
