"""Predictors: test-set evaluation + CSV/PNG/GIF export.

Role parity with ``/root/reference/src/runner/predictors/*``: batch-size-1
streaming evaluation, per-sample (SISR/MISR) or per-frame (VSR) metric rows
in ``results.csv``, per-frame PNGs, per-sequence GIFs, and Cardiac* metrics
receiving the patient name (``acdc_sisr_predictor.py:143-146``).

Deviations (documented):
- the reference never flushes the final slice's GIF in the SISR/MISR
  predictors (``acdc_sisr_predictor.py:72-78`` only dumps on slice change);
  we flush the trailing sequence too;
- nets returning tuples (FRVSR) are evaluated on their SR output
  (``outputs[0]``).
"""

from __future__ import annotations

import csv
import logging
from functools import partial
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from vsr_tpu.registry import register
from vsr_tpu.utils.bucketing import bucket_length, pad_time_edge
from vsr_tpu.utils.checkpoint import load_checkpoint
from vsr_tpu.utils.normalize import denormalize
from vsr_tpu.utils.rng import RngTree


def _dump_video(path: Path, imgs: Sequence[np.ndarray]) -> None:
    import imageio

    with imageio.get_writer(path) as writer:
        for img in imgs:
            writer.append_data(img)


def _save_png(path: Path, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


class BasePredictor:
    dataset_stats = "acdc"

    def __init__(
        self,
        test_dataloader,
        net,
        loss_fns: Sequence,
        loss_weights: Sequence[float],
        metric_fns: Sequence,
        saved_dir: str | None = None,
        exported: bool = False,
        device: str | None = None,
        t_bucket: int = 16,
        **kwargs: Any,
    ):
        # Sequence predictors pad variable-T inputs to t_bucket multiples
        # (causal nets only — see vsr_tpu/utils/bucketing.py); <=1 disables.
        self.t_bucket = int(t_bucket)
        if test_dataloader.batch_size != 1:
            raise ValueError(
                f"The testing batch size should be 1. Got {test_dataloader.batch_size}."
            )
        self.test_dataloader = test_dataloader
        self.net = net
        self.loss_fns = list(loss_fns)
        self.loss_weights = np.asarray([float(w) for w in loss_weights])
        self.metric_fns = list(metric_fns)
        self.exported = exported
        if exported:
            self.saved_dir = Path(saved_dir)
        self.params = None
        import inspect

        try:
            self._net_train_kwarg = "train" in inspect.signature(
                type(net).__call__
            ).parameters
        except (TypeError, ValueError):
            self._net_train_kwarg = False
        apply_kwargs = {"train": False} if self._net_train_kwarg else {}
        self._apply = jax.jit(lambda p, x: self.net.apply(p, x, **apply_kwargs))
        self._denormalize = partial(denormalize, dataset=self.dataset_stats)

    # ------------------------------------------------------------- loading

    def _ensure_initialized(self) -> None:
        if self.params is not None:
            return
        batch = next(iter(self.test_dataloader))
        inputs = self._example_inputs(batch)
        init_kwargs = {"train": False} if self._net_train_kwarg else {}
        self.params = self.net.init(
            RngTree("predict-init").jax_key("init"),
            jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, jnp.float32), inputs),
            **init_kwargs,
        )

    def load(self, path: str | Path) -> None:
        """Restore net params only (``base_predictor.py:130-136``)."""
        self._ensure_initialized()
        state, _ = load_checkpoint(path)
        from flax import serialization

        self.params = serialization.from_state_dict(self.params, state["params"])

    # --------------------------------------------------------------- hooks

    def _example_inputs(self, batch: dict):
        raise NotImplementedError

    def _init_log(self) -> dict:
        log = {"Loss": 0.0}
        for fn in self.loss_fns:
            log[fn.__class__.__name__] = 0.0
        for fn in self.metric_fns:
            log[fn.__class__.__name__] = 0.0
        return log

    @staticmethod
    def _host_metric(fn) -> bool:
        """Metrics needing per-patient dynamic crops stay on the host path.
        Opt-in via a ``host_only`` attribute; the reference's 'Cardiac'
        class-name convention is kept as the fallback."""
        return bool(getattr(fn, "host_only",
                            "Cardiac" in fn.__class__.__name__))

    def _split_metric_cols(self) -> tuple[list[int], list[int]]:
        """(jit-eval column indices, host-path column indices)."""
        std = [i for i, fn in enumerate(self.metric_fns)
               if not self._host_metric(fn)]
        host = [i for i in range(len(self.metric_fns)) if i not in std]
        return std, host

    def _metric_value(self, fn, output, target, patient: str):
        if getattr(fn, "needs_name", "Cardiac" in fn.__class__.__name__):
            return fn(output, target, patient)
        return fn(output, target)

    def _write_csv(self, results: list) -> None:
        self.saved_dir.mkdir(parents=True, exist_ok=True)
        with open(self.saved_dir / "results.csv", "w", newline="") as f:
            csv.writer(f).writerows(results)

    def _csv_header(self) -> list[str]:
        return (
            ["name"]
            + [fn.__class__.__name__ for fn in self.metric_fns]
            + [fn.__class__.__name__ for fn in self.loss_fns]
        )


class ImagePredictor(BasePredictor):
    """Shared flow for SISR/MISR/SRFB: one HR frame per sample; GIFs are
    assembled when the slice id changes (+ trailing flush).

    Two dispatch modes:

    - ``sequence_batch=True`` (default): frames of one slice sequence are
      evaluated by ONE jitted program per sequence (``lax.map`` of the
      batch-1 net + eval over the frames) — O(#sequences) dispatches
      instead of O(#frames), the difference between ~300 and ~12 device
      round trips per test volume. Sequences pad to ``t_bucket`` multiples
      by edge-repeat (items are independent; padding is sliced off), so the
      whole test set compiles O(#buckets) programs.
    - ``sequence_batch=False``: the reference's literal batch-1 loop
      (``acdc_sisr_predictor.py:52-100``), kept for A/B and as the
      fallback when the loader shuffles.

    Output parity between the modes: exported pixels (PNG/GIF bytes) are
    BIT-identical, and every CSV/log value agrees to float32 round-off
    (few ulps). Exact bit-identity of the raw-float loss columns is not
    achievable: XLA unrolls short loops and re-fuses the loss reduction
    into its neighbors differently per trip count, reassociating the f32
    sum — measured: a `lax.map` body over 1 item and over 6 items yields
    per-item means differing in the last ulp even with identical inputs
    and an optimization_barrier around the net output. The net outputs
    themselves ARE bit-identical across the modes (verified in
    tests/test_predictors_more.py).
    """

    input_key = "lr_img"

    def __init__(self, *args, sequence_batch: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.sequence_batch = bool(sequence_batch)

    def _example_inputs(self, batch):
        return jnp.asarray(batch[self.input_key])

    # Per-variant hooks ----------------------------------------------------
    def _sample_losses(self, output, target) -> list:
        return [fn(output, target) for fn in self.loss_fns]

    def _eval_output(self, output):
        """The tensor metrics/export should use (identity for plain nets)."""
        return output

    # ---------------------------------------------------------------------
    def _ensure_sample_eval(self) -> None:
        """ONE jitted dispatch per sample for all losses + non-Cardiac
        metrics (Cardiac* crops are per-patient dynamic shapes and stay on
        the host path)."""
        if getattr(self, "_sample_eval", None) is not None:
            return
        self._std_cols, self._cardiac_cols = self._split_metric_cols()
        std_fns = [self.metric_fns[i] for i in self._std_cols]

        def sample_eval(output, target):
            losses = (jnp.stack(self._sample_losses(output, target))
                      if self.loss_fns else jnp.zeros((0,)))
            d_out = self._denormalize(self._eval_output(output))
            d_tgt = self._denormalize(target)
            stds = (jnp.stack([fn(d_out, d_tgt) for fn in std_fns])
                    if std_fns else jnp.zeros((0,)))
            return losses, stds, d_out, d_tgt

        self._sample_eval = jax.jit(sample_eval)

    # ------------------------------------------------- per-sequence batching
    def _ensure_seq_eval(self) -> None:
        """ONE jitted program per sequence: ``lax.map`` over frames of
        [batch-1 net apply -> losses -> denormalize -> std metrics]. Each
        iteration sees exactly the batch-1 shapes of the per-frame path, so
        the results are BIT-IDENTICAL to it (a batched net apply would
        reassociate conv reductions and drift in the last ulp)."""
        if getattr(self, "_seq_eval", None) is not None:
            return
        self._std_cols, self._cardiac_cols = self._split_metric_cols()
        std_fns = [self.metric_fns[i] for i in self._std_cols]
        apply_kwargs = {"train": False} if self._net_train_kwarg else {}

        def seq_eval(params, inputs, targets):
            def one(args):
                x, t = args
                o = self.net.apply(params, x[None], **apply_kwargs)
                if isinstance(o, tuple):
                    o = o[0]
                # The per-frame path runs net and eval as two separate jit
                # programs; keep that boundary here so XLA cannot fuse the
                # loss into the net epilogue (bit-identity with that path).
                o = jax.lax.optimization_barrier(o)
                t = t[None]
                losses = (jnp.stack(self._sample_losses(o, t))
                          if self.loss_fns else jnp.zeros((0,)))
                d_out = self._denormalize(self._eval_output(o))
                d_tgt = self._denormalize(t)
                stds = (jnp.stack([fn(d_out, d_tgt) for fn in std_fns])
                        if std_fns else jnp.zeros((0,)))
                return losses, stds, d_out, d_tgt  # d_* keep the (1,...) dim

            return jax.lax.map(one, (inputs, targets))

        self._seq_eval = jax.jit(seq_eval)

    def _sequence_groups(self, dataset) -> list[tuple[str, str, list[int]]]:
        """Dataset-order runs of samples sharing (patient, slice id)."""
        groups: list[tuple[str, str, list[int]]] = []
        for i in range(len(dataset)):
            patient, sid, _ = dataset.sample_name(i)
            if not groups or (groups[-1][0], groups[-1][1]) != (patient, sid):
                groups.append((patient, sid, []))
            groups[-1][2].append(i)
        return groups

    def _predict_sequences(self) -> dict:
        from vsr_tpu.data.loader import default_collate

        self._ensure_initialized()
        self._ensure_seq_eval()
        dataset = self.test_dataloader.dataset
        if self.exported:
            results = [self._csv_header()]

        log = self._init_log()
        count = 0
        groups = self._sequence_groups(dataset)
        # Honor the loader's configured collation (falls back to the
        # default stacker) so both dispatch modes see identical batches.
        collate = getattr(self.test_dataloader, "collate_fn",
                          None) or default_collate
        for patient, sid, indices in tqdm(groups, desc="testing"):
            samples = [dataset.__getitem__(i, rng=None) for i in indices]
            batch = collate(samples)
            inputs = np.asarray(batch[self.input_key])
            targets = np.asarray(batch["hr_img"])
            t_real = inputs.shape[0]
            tb = bucket_length(t_real, self.t_bucket)
            if tb != t_real:  # edge-repeat pad; items are independent
                inputs = pad_time_edge(inputs, tb, axis=0)
                targets = pad_time_edge(targets, tb, axis=0)

            losses_v, stds_v, d_out_v, d_tgt_v = self._seq_eval(
                self.params, jnp.asarray(inputs), jnp.asarray(targets))
            frame_losses = np.asarray(losses_v)[:t_real]   # (T, nL)
            frame_stds = np.asarray(stds_v)[:t_real]       # (T, nStd)
            d_outs = np.asarray(d_out_v)[:t_real]          # (T, 1, H, W, C)
            d_tgts = np.asarray(d_tgt_v)[:t_real]

            sr_imgs = []
            for k, i in enumerate(indices):
                _, _, fid = dataset.sample_name(i)
                losses = frame_losses[k]
                loss = float((losses * self.loss_weights).sum()) \
                    if self.loss_fns else 0.0
                metrics = [0.0] * len(self.metric_fns)
                for j, col in enumerate(self._std_cols):
                    metrics[col] = frame_stds[k, j]
                for col in self._cardiac_cols:
                    metrics[col] = self._metric_value(
                        self.metric_fns[col], d_outs[k], d_tgts[k], patient)

                if self.exported:
                    results.append(
                        [f"{patient}_2d_slice{sid}_frame{fid}"]
                        + [float(m) for m in metrics]
                        + [float(l) for l in losses]
                    )
                    sr_imgs.append(d_outs[k][0, ..., 0].astype(np.uint8))
                    out_dir = self.saved_dir / "imgs" / patient
                    out_dir.mkdir(parents=True, exist_ok=True)
                    _save_png(out_dir / f"slice{sid}_frame{fid}.png",
                              sr_imgs[-1])

                log["Loss"] += loss
                for fn, l in zip(self.loss_fns, losses):
                    log[fn.__class__.__name__] += float(l)
                for fn, m in zip(self.metric_fns, metrics):
                    log[fn.__class__.__name__] += float(m)
                count += 1

            if self.exported:
                out_dir = self.saved_dir / "videos" / patient
                out_dir.mkdir(parents=True, exist_ok=True)
                _dump_video(out_dir / f"sequence{sid}.gif", sr_imgs)

        if self.exported:
            self._write_csv(results)
        for key in log:
            log[key] /= count
        logging.info(f"Test log: {log}.")
        return log

    def predict(self) -> dict:
        if self.sequence_batch and not getattr(
                self.test_dataloader, "shuffle", False):
            return self._predict_sequences()
        self._ensure_initialized()
        self._ensure_sample_eval()
        dataset = self.test_dataloader.dataset
        if self.exported:
            videos_dir = self.saved_dir / "videos"
            imgs_dir = self.saved_dir / "imgs"
            results = [self._csv_header()]
            sr_imgs: list[np.ndarray] = []
            tmp_sid = None
            tmp_patient = None

        log = self._init_log()
        count = 0
        for batch in tqdm(self.test_dataloader, total=len(self.test_dataloader), desc="testing"):
            index = int(np.asarray(batch["index"])[0])
            patient, sid, fid = dataset.sample_name(index)
            inputs = jnp.asarray(batch[self.input_key])
            target = jnp.asarray(batch["hr_img"])
            output = self._apply(self.params, inputs)

            losses_v, stds, d_out, d_tgt = self._sample_eval(output, target)
            losses = np.asarray(losses_v)
            loss = float((losses * self.loss_weights).sum()) if self.loss_fns else 0.0
            metrics = [0.0] * len(self.metric_fns)
            stds = np.asarray(stds)
            for j, col in enumerate(self._std_cols):
                metrics[col] = stds[j]
            for col in self._cardiac_cols:
                metrics[col] = self._metric_value(
                    self.metric_fns[col], d_out, d_tgt, patient)

            if self.exported:
                results.append(
                    [f"{patient}_2d_slice{sid}_frame{fid}"]
                    + [float(m) for m in metrics]
                    + [float(l) for l in losses]
                )
                if tmp_sid is not None and (sid, patient) != (tmp_sid,
                                                              tmp_patient):
                    out_dir = videos_dir / tmp_patient
                    out_dir.mkdir(parents=True, exist_ok=True)
                    _dump_video(out_dir / f"sequence{tmp_sid}.gif", sr_imgs)
                    sr_imgs = []
                sr_img = np.asarray(d_out)[0, ..., 0].astype(np.uint8)
                sr_imgs.append(sr_img)
                tmp_sid, tmp_patient = sid, patient
                out_dir = imgs_dir / patient
                out_dir.mkdir(parents=True, exist_ok=True)
                _save_png(out_dir / f"slice{sid}_frame{fid}.png", sr_img)

            log["Loss"] += loss
            for fn, l in zip(self.loss_fns, losses):
                log[fn.__class__.__name__] += float(l)
            for fn, m in zip(self.metric_fns, metrics):
                log[fn.__class__.__name__] += float(m)
            count += 1

        if self.exported:
            if sr_imgs:  # trailing flush (reference bug fixed)
                out_dir = videos_dir / tmp_patient
                out_dir.mkdir(parents=True, exist_ok=True)
                _dump_video(out_dir / f"sequence{tmp_sid}.gif", sr_imgs)
            self._write_csv(results)

        for key in log:
            log[key] /= count
        logging.info(f"Test log: {log}.")
        return log


class SISRPredictor(ImagePredictor):
    input_key = "lr_img"


class SISRSRFBPredictor(ImagePredictor):
    """Feedback nets return (S, N, H, W, C): losses mean over steps, metrics
    and export on the last step (``acdc_sisr_srfb_predictor.py``)."""

    input_key = "lr_img"

    def _sample_losses(self, output, target):
        return [
            jnp.mean(jax.vmap(lambda o, fn=fn: fn(o, target))(output))
            for fn in self.loss_fns
        ]

    def _eval_output(self, output):
        return output[-1]


class MISRPredictor(ImagePredictor):
    input_key = "lr_imgs"


class VSRPredictor(BasePredictor):
    """Whole-sequence eval with per-frame losses/metrics (T, #fns) and
    T-weighted log averaging (``acdc_vsr_predictor.py:119-170``).

    Variable-T sequences are end-padded to multiples of ``t_bucket`` frames
    (the VSR nets are causal scans, so the real frames' outputs are exactly
    the unpadded computation; see ``vsr_tpu/utils/bucketing.py``) — the
    whole test set compiles O(#buckets) programs instead of one per distinct
    T. All per-frame losses and non-Cardiac metrics are computed in ONE
    jitted call per sequence (Cardiac* metrics crop to a per-patient bbox —
    a dynamic shape — and stay on the host path)."""

    def _example_inputs(self, batch):
        return jnp.asarray(batch["lr_imgs"])

    def _sequence_arrays(self, batch):
        return np.asarray(batch["lr_imgs"]), np.asarray(batch["hr_imgs"])

    def _ensure_frame_eval(self) -> None:
        if getattr(self, "_frame_eval", None) is not None:
            return
        self._std_cols, self._cardiac_cols = self._split_metric_cols()
        std_fns = [self.metric_fns[i] for i in self._std_cols]

        def frame_eval(outputs, targets):
            tb = outputs.shape[1]
            if self.loss_fns:
                per_losses = jax.vmap(
                    lambda o, t: jnp.stack([fn(o, t) for fn in self.loss_fns]),
                    in_axes=(1, 1),
                )(outputs, targets)  # (Tb, nL)
            else:
                per_losses = jnp.zeros((tb, 0))
            d_out = self._denormalize(outputs)
            d_tgt = self._denormalize(targets)
            if std_fns:
                per_std = jnp.stack(
                    [jax.vmap(fn, in_axes=(1, 1))(d_out, d_tgt) for fn in std_fns],
                    axis=1,
                )  # (Tb, nStd)
            else:
                per_std = jnp.zeros((tb, 0))
            return per_losses, per_std, d_out, d_tgt

        self._frame_eval = jax.jit(frame_eval)

    def _row_name(self, patient: str, sid, t: int) -> str:
        return f"{patient}_2d_slice{sid}_frame{t + 1:0>2d}"

    def _export_sequence(self, d_out: np.ndarray, patient: str, sid) -> None:
        """d_out: denormalized (1, T, H, W, C) SR frames (real frames only)."""
        sr_imgs = [d_out[0, t, ..., 0].astype(np.uint8)
                   for t in range(d_out.shape[1])]
        out_dir = self.saved_dir / "videos" / patient
        out_dir.mkdir(parents=True, exist_ok=True)
        _dump_video(out_dir / f"sequence{sid}.gif", sr_imgs)
        out_dir = self.saved_dir / "imgs" / patient
        out_dir.mkdir(parents=True, exist_ok=True)
        for t, sr_img in enumerate(sr_imgs):
            _save_png(out_dir / f"slice{sid}_frame{t + 1:0>2d}.png", sr_img)

    def predict(self) -> dict:
        self._ensure_initialized()
        self._ensure_frame_eval()
        dataset = self.test_dataloader.dataset
        if self.exported:
            results = [self._csv_header()]

        log = self._init_log()
        count = 0
        for batch in tqdm(self.test_dataloader, total=len(self.test_dataloader), desc="testing"):
            index = int(np.asarray(batch["index"])[0])
            patient, sid, _ = dataset.sample_name(index)
            lr, hr = self._sequence_arrays(batch)  # (1, T, ...)
            T = lr.shape[1]
            tb = bucket_length(T, self.t_bucket)
            inputs = jnp.asarray(pad_time_edge(lr, tb))
            targets = jnp.asarray(pad_time_edge(hr, tb))
            outputs = self._apply(self.params, inputs)
            if isinstance(outputs, tuple):
                outputs = outputs[0]

            per_losses, per_std, d_out, d_tgt = self._frame_eval(outputs, targets)
            frame_losses = np.asarray(per_losses)[:T]  # (T, nL)
            loss = float((frame_losses.mean(axis=0) * self.loss_weights).sum()) \
                if self.loss_fns else 0.0

            frame_metrics = np.zeros((T, len(self.metric_fns)))
            if self._std_cols:
                frame_metrics[:, self._std_cols] = np.asarray(per_std)[:T]
            d_out = np.asarray(d_out)[:, :T]
            d_tgt = np.asarray(d_tgt)[:, :T]
            for col in self._cardiac_cols:
                fn = self.metric_fns[col]
                frame_metrics[:, col] = [
                    float(self._metric_value(fn, d_out[:, t], d_tgt[:, t], patient))
                    for t in range(T)
                ]

            if self.exported:
                for t in range(T):
                    results.append(
                        [self._row_name(patient, sid, t)]
                        + [float(m) for m in frame_metrics[t]]
                        + [float(l) for l in frame_losses[t]]
                    )
                self._export_sequence(d_out, patient, sid)

            w = T
            log["Loss"] += loss * w
            for fn, l in zip(self.loss_fns, frame_losses.mean(axis=0)):
                log[fn.__class__.__name__] += float(l) * w
            for fn, m in zip(self.metric_fns, frame_metrics.mean(axis=0)):
                log[fn.__class__.__name__] += float(m) * w
            count += w

        if self.exported:
            self._write_csv(results)

        for key in log:
            log[key] /= count
        logging.info(f"Test log: {log}.")
        return log


class VolumePredictor(BasePredictor):
    """3D volumetric SR eval: one volume per sample; exports the SR volume
    as NIfTI plus mid-slice PNGs. Metrics on the whole denormalized volume
    (SSIM dim=3 works directly on (N, D, H, W, C))."""

    def _example_inputs(self, batch):
        return jnp.moveaxis(jnp.asarray(batch["lr_vol"]), 3, 1)

    def predict(self) -> dict:
        self._ensure_initialized()
        dataset = self.test_dataloader.dataset
        if self.exported:
            results = [self._csv_header()]
            vols_dir = self.saved_dir / "volumes"

        log = self._init_log()
        count = 0
        for batch in tqdm(self.test_dataloader, total=len(self.test_dataloader), desc="testing"):
            index = int(np.asarray(batch["index"])[0])
            patient, _, fid = dataset.sample_name(index)
            inputs = jnp.moveaxis(jnp.asarray(batch["lr_vol"]), 3, 1)
            targets = jnp.moveaxis(jnp.asarray(batch["hr_vol"]), 3, 1)
            output = self._apply(self.params, inputs)

            losses = [fn(output, targets) for fn in self.loss_fns]
            loss = float(sum(w * l for w, l in zip(self.loss_weights, losses)))
            d_out, d_tgt = self._denormalize(output), self._denormalize(targets)
            metrics = [self._metric_value(fn, d_out, d_tgt, patient) for fn in self.metric_fns]

            if self.exported:
                results.append(
                    [f"{patient}_frame{fid}"]
                    + [float(m) for m in metrics]
                    + [float(l) for l in losses]
                )
                from vsr_tpu.io.nifti import save_nifti

                vol = np.asarray(d_out)[0, ..., 0]  # (D, H, W)
                out_dir = vols_dir / patient
                out_dir.mkdir(parents=True, exist_ok=True)
                save_nifti(np.moveaxis(vol, 0, -1).astype(np.float32),
                           out_dir / f"frame{fid}_sr.nii.gz")
                _save_png(out_dir / f"frame{fid}_mid.png",
                          vol[vol.shape[0] // 2].astype(np.uint8))

            log["Loss"] += loss
            for fn, l in zip(self.loss_fns, losses):
                log[fn.__class__.__name__] += float(l)
            for fn, m in zip(self.metric_fns, metrics):
                log[fn.__class__.__name__] += float(m)
            count += 1

        if self.exported:
            self._write_csv(results)
        for key in log:
            log[key] /= count
        logging.info(f"Test log: {log}.")
        return log


def _twin(base: type, name: str, stats: str) -> type:
    cls = type(name, (base,), {"dataset_stats": stats})
    register("predictor", name)(cls)
    return cls


AcdcSISRPredictor = _twin(SISRPredictor, "AcdcSISRPredictor", "acdc")
Dsb15SISRPredictor = _twin(SISRPredictor, "Dsb15SISRPredictor", "dsb15")
AcdcSISRSRFBPredictor = _twin(SISRSRFBPredictor, "AcdcSISRSRFBPredictor", "acdc")
Dsb15SISRSRFBPredictor = _twin(SISRSRFBPredictor, "Dsb15SISRSRFBPredictor", "dsb15")
AcdcMISRPredictor = _twin(MISRPredictor, "AcdcMISRPredictor", "acdc")
Dsb15MISRPredictor = _twin(MISRPredictor, "Dsb15MISRPredictor", "dsb15")
AcdcVSRPredictor = _twin(VSRPredictor, "AcdcVSRPredictor", "acdc")
Dsb15VSRPredictor = _twin(VSRPredictor, "Dsb15VSRPredictor", "dsb15")
Acdc3DSRPredictor = _twin(VolumePredictor, "Acdc3DSRPredictor", "acdc")
Dsb153DSRPredictor = _twin(VolumePredictor, "Dsb153DSRPredictor", "dsb15")


class Volume4DPredictor(VSRPredictor):
    """4D spatio-temporal eval: whole volumetric sequences, per-frame
    losses/metrics averaged over T (T-weighted log), SR sequence exported as
    one 4D NIfTI per patient. Inherits the VSR predictor's T-bucketing and
    single-jit frame evaluation (Volume4DSRNet is a causal scan)."""

    def _example_inputs(self, batch):
        return jnp.moveaxis(jnp.asarray(batch["lr_vols"]), 4, 2)

    def _sequence_arrays(self, batch):
        return (np.moveaxis(np.asarray(batch["lr_vols"]), 4, 2),
                np.moveaxis(np.asarray(batch["hr_vols"]), 4, 2))

    def _row_name(self, patient, sid, t):
        return f"{patient}_frame{t + 1:0>2d}"

    def _export_sequence(self, d_out, patient, sid):
        from vsr_tpu.io.nifti import save_nifti

        # (1, T, D, H, W, 1) -> (H, W, D, T).
        vol4d = d_out[0, ..., 0].transpose(2, 3, 1, 0)
        out_dir = self.saved_dir / "volumes" / patient
        out_dir.mkdir(parents=True, exist_ok=True)
        save_nifti(vol4d.astype(np.float32), out_dir / "sequence_sr.nii.gz")


Acdc4DSRPredictor = _twin(Volume4DPredictor, "Acdc4DSRPredictor", "acdc")
Dsb154DSRPredictor = _twin(Volume4DPredictor, "Dsb154DSRPredictor", "dsb15")
