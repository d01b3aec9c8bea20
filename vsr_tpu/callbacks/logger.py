"""Training loggers: scalars + HR|SR image grids per epoch.

Role parity with ``/root/reference/src/callbacks/loggers/*``: one logger per
task family, each pairing train/valid scalars per key and emitting a
side-by-side target-vs-output image grid each epoch
(``base_logger.py:40-48``, ``acdc_sisr_logger.py:22-30``).

Backends: always a ``metrics.jsonl`` (one JSON object per epoch — trivially
machine-readable); plus TensorBoard event files via
``torch.utils.tensorboard`` when importable, and PNG grids under
``<log_dir>/images``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from vsr_tpu.registry import register


def _to_uint8_grid(pairs: list[np.ndarray], pad: int = 2) -> np.ndarray:
    """Tile a list of equally-sized (H, W, C) float images into one row-major
    grid, min-max normalized over the whole grid (the tensors arriving here
    are z-scored)."""
    arrs = [np.asarray(p, dtype=np.float32) for p in pairs]
    h, w, c = arrs[0].shape
    n = len(arrs)
    cols = min(n, 8)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * (h + pad) + pad, cols * (w + pad) + pad, c), np.float32)
    for i, a in enumerate(arrs):
        r, col = divmod(i, cols)
        y0, x0 = pad + r * (h + pad), pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = a
    lo, hi = grid.min(), grid.max()
    if hi > lo:
        grid = (grid - lo) / (hi - lo)
    grid = (grid * 255.0).round().astype(np.uint8)
    if c == 1:
        grid = np.repeat(grid, 3, axis=-1)
    return grid


class BaseLogger:
    """Args accept (and ignore) the reference's ``net``/``dummy_input``
    graph-plotting kwargs (graph export was a commented-out TODO upstream)."""

    def __init__(self, log_dir: str | Path, net=None, dummy_input=None, **kwargs):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        (self.log_dir / "images").mkdir(exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(self.log_dir))
        except Exception:
            self._tb = None

    def write(self, epoch: int, train_log: dict, train_batch, train_outputs,
              valid_log: dict, valid_batch, valid_outputs) -> None:
        record = {"epoch": epoch, "train": dict(train_log), "valid": dict(valid_log)}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for key in train_log:
                self._tb.add_scalars(key, {"train": train_log[key], "valid": valid_log[key]}, epoch)
        try:
            grid = self._make_grid(valid_batch, valid_outputs)
        except Exception:
            grid = None
        if grid is not None:
            from PIL import Image

            Image.fromarray(grid).save(self.log_dir / "images" / f"epoch_{epoch:05d}.png")
            if self._tb is not None:
                self._tb.add_image("valid/target_vs_output", grid, epoch, dataformats="HWC")

    def _make_grid(self, batch, outputs) -> np.ndarray | None:
        raise NotImplementedError

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class SISRLogger(BaseLogger):
    """Grid = [HR target | SR output] per sample."""

    def _make_grid(self, batch, outputs):
        targets = np.asarray(batch["hr_img"])
        outs = np.asarray(outputs)
        pairs = [img for t, o in zip(targets, outs) for img in (t, o)]
        return _to_uint8_grid(pairs)


class SISRSRFBLogger(BaseLogger):
    """Feedback nets return per-step stacks (S, N, H, W, C): use the last."""

    def _make_grid(self, batch, outputs):
        targets = np.asarray(batch["hr_img"])
        outs = np.asarray(outputs)[-1]
        pairs = [img for t, o in zip(targets, outs) for img in (t, o)]
        return _to_uint8_grid(pairs)


class MISRLogger(SISRLogger):
    pass


class VSRLogger(BaseLogger):
    """Sequences (N, T, H, W, C): show the last frame like the reference
    (``acdc_vsr_logger.py:22-25``)."""

    def _make_grid(self, batch, outputs):
        hr = np.asarray(batch["hr_imgs"])
        targets = hr[:, -1]
        # Tuple check FIRST: FRVSR outputs (sr, warped_lr) with different
        # spatial shapes — np.asarray on that tuple would raise.
        if isinstance(outputs, tuple):
            outputs = outputs[0]
        outs = np.asarray(outputs)
        # Validation outputs may be T-bucket padded (trainers.py VSRTrainer);
        # index the LAST REAL frame, matching the target.
        outs = outs[:, hr.shape[1] - 1]
        pairs = [img for t, o in zip(targets, outs) for img in (t, o)]
        return _to_uint8_grid(pairs)


class VolumeLogger(BaseLogger):
    """3D volumes (N, H, W, D, C) batch / (N, D, H, W, C) outputs: show the
    middle depth slice."""

    def _make_grid(self, batch, outputs):
        targets = np.asarray(batch["hr_vol"])  # (N, H, W, D, C)
        outs = np.asarray(outputs)  # (N, D, H, W, C)
        d = targets.shape[3] // 2
        pairs = [
            img
            for t, o in zip(targets, outs)
            for img in (t[:, :, d], o[d])
        ]
        return _to_uint8_grid(pairs)


class Volume4DLogger(BaseLogger):
    """4D sequences — batch (N, T, H, W, D, C) / outputs (N, Tb, D, H, W, C)
    (outputs may be T-bucket padded): show the mid-depth slice of the last
    real frame."""

    def _make_grid(self, batch, outputs):
        hr = np.asarray(batch["hr_vols"])
        outs = np.asarray(outputs)
        t = hr.shape[1] - 1
        d = hr.shape[4] // 2
        targets = hr[:, t, :, :, d]
        outs = outs[:, t, d]
        pairs = [img for tg, o in zip(targets, outs) for img in (tg, o)]
        return _to_uint8_grid(pairs)


# Registry names mirror the reference's 8 task loggers (+ the volumetric
# additions).
for _name, _cls in [
    ("AcdcSISRLogger", SISRLogger),
    ("Dsb15SISRLogger", SISRLogger),
    ("AcdcSISRSRFBLogger", SISRSRFBLogger),
    ("Dsb15SISRSRFBLogger", SISRSRFBLogger),
    ("AcdcMISRLogger", MISRLogger),
    ("Dsb15MISRLogger", MISRLogger),
    ("AcdcVSRLogger", VSRLogger),
    ("Dsb15VSRLogger", VSRLogger),
    ("Acdc3DSRLogger", VolumeLogger),
    ("Dsb153DSRLogger", VolumeLogger),
    ("Acdc4DSRLogger", Volume4DLogger),
    ("Dsb154DSRLogger", Volume4DLogger),
]:
    register("logger", _name)(_cls)
