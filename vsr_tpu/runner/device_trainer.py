"""Fully on-device training: HBM-resident dataset, zero host round trips.

The BASELINE.json north star calls for "an HBM-resident 3D+time patch buffer
with device-side prefetch". This module goes further: for the patch-training
regimes (SISR/MISR/VSR windows), the *entire* preprocessed training split
fits in HBM (ACDC: a few hundred MB), so an epoch becomes ONE jit-compiled
program —

    lax.scan over steps [ sample indices -> gather windows -> random paired
    crop (dynamic_slice per sample) -> random flips -> fused train step ]

— with `jax.random` supplying every random choice. No per-step dispatch, no
host<->device traffic, no Python in the loop. On the dev-tunnel TPU this is
~50x the step rate of the host-driven loop (which pays ~50 ms of dispatch
latency per step); on real hardware it removes the input pipeline as a
bottleneck entirely.

Augmentation semantics mirror the host pipeline (RandomHorizontalFlip /
RandomVerticalFlip / RandomCropPatch with HR coords = LR coords x ratio) but
draw from the explicit PRNG key chain instead of numpy Generators, so this
mode is deterministic-by-key rather than bit-identical to the host loader.
"""

from __future__ import annotations

import logging

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vsr_tpu.utils.normalize import DATASET_STATS
from vsr_tpu.utils.rng import RngTree


def stack_dataset(dataset, limit: int | None = None,
                  indices=None) -> tuple[np.ndarray, np.ndarray]:
    """Materialize a dataset's (lr, hr) pairs as two dense arrays.

    Works for any dataset whose samples share shapes (train windows do).
    Returns (M, ...) numpy arrays ready for ``jax.device_put``.
    ``indices`` restricts stacking to those samples (multi-host buffer
    blocks: each process loads ONLY its slice from disk).
    """
    if indices is None:
        n = len(dataset) if limit is None else min(limit, len(dataset))
        indices = range(n)
    lrs, hrs = [], []
    for i in indices:
        s = dataset.__getitem__(i, rng=None)
        lrs.append(next(s[k] for k in ("lr_img", "lr_imgs", "lr_vol", "lr_vols")
                        if k in s))
        hrs.append(next(s[k] for k in ("hr_img", "hr_imgs", "hr_vol", "hr_vols")
                        if k in s))
    return np.stack(lrs), np.stack(hrs)


def sample_crop_flip(key, lr, hr, patch: int, ratio: int, stats):
    """Shared on-device augmentation: random paired crops + flips +
    normalization on an already-gathered (lr, hr) batch.

    lr: (B, ..., h, w, C) with any leading sample axes — (B, h, w, C) frames,
    (B, T, h, w, C) windows, (B, D, h, w, C) volumes, (B, T, D, h, w, C) 4D
    windows; hr: same rank with the LAST TWO spatial dims ``x ratio`` (the
    temporal/depth axes are never scaled — mirroring RandomCropPatch,
    transforms.py).
    """
    k_y, k_x, k_hf, k_vf = jax.random.split(key, 4)
    batch = lr.shape[0]
    h, w = lr.shape[-3], lr.shape[-2]
    y0 = jax.random.randint(k_y, (batch,), 0, h - patch + 1)
    x0 = jax.random.randint(k_x, (batch,), 0, w - patch + 1)

    def crop(img, y, x, size):
        lead = img.ndim - 3  # axes before (h, w, C): T and/or D, untouched
        return jax.lax.dynamic_slice(
            img, (0,) * lead + (y, x, 0),
            img.shape[:lead] + (size, size, img.shape[-1]))

    lr_c = jax.vmap(lambda im, y, x: crop(im, y, x, patch))(lr, y0, x0)
    hr_c = jax.vmap(lambda im, y, x: crop(im, y, x, patch * ratio))(
        hr, y0 * ratio, x0 * ratio)

    hf = jax.random.bernoulli(k_hf, 0.5, (batch,))
    vf = jax.random.bernoulli(k_vf, 0.5, (batch,))

    def flip(img, do_h, do_v):
        img = jnp.where(do_h, jnp.flip(img, axis=-2), img)
        img = jnp.where(do_v, jnp.flip(img, axis=-3), img)
        return img

    lr_c = jax.vmap(flip)(lr_c, hf, vf)
    hr_c = jax.vmap(flip)(hr_c, hf, vf)

    mean, std = stats
    norm = lambda x: (x - mean) / (std + 1e-10)
    return norm(lr_c), norm(hr_c)



#: "auto" fully unrolls net-internal scans only up to this many steps
#: (training windows/feedback depths are 4-5; serving-length scans would
#: blow compile time for no measured gain - probe_unroll_serving.py
#: measured 0.98x at the T=30 VSR serving scans).
MAX_AUTO_UNROLL = 8


def auto_unroll_net(net, scan_unroll, length_hint=None):
    """The shared auto-scan-unroll policy (one implementation for the
    standalone DeviceEpochTrainer and the config-driven mixin).

    The scan backward stashes every iteration's activations via
    dynamic_update_slice - 26% of the flagship DRF train step at 0.4 TF/s
    (scripts/profile_train_step.py). At training sizes (T=5 windows, 4
    feedback steps) straight-lining the loop lets XLA fuse the stash:
    measured +25-29% steps/s across DRFNet / FRVSR / SRFBN / DRFSISR
    (scripts/probe_drf_train_scan.py, probe_scan_unroll_zoo.py). Exact -
    outputs bitwise / grads to ulp vs the scan lowering
    (tests/test_models_feedback.py::test_scan_unroll_is_exact).

    ``scan_unroll``: "auto" (full unroll when the scan length is known and
    <= MAX_AUTO_UNROLL), an int (explicit factor), or 0/1 to keep the
    rolled scan. ``length_hint``: the frame-scan length (training window
    T) for nets without a static num_steps. Returns the (possibly cloned)
    net; a net whose ``unroll`` was explicitly configured is respected.
    """
    if not hasattr(net, "unroll") or net.unroll != 1:
        return net
    if isinstance(scan_unroll, int):
        n = scan_unroll
    else:
        length = getattr(net, "num_steps", None) or length_hint
        if length is None or length > MAX_AUTO_UNROLL:
            return net
        n = int(length)
    if n <= 1:
        return net
    logging.info(f"Device trainer: {type(net).__name__} scan unroll={n} "
                 "(exact; +25-29% measured).")
    return net.clone(unroll=n)


class DeviceEpochTrainer:
    """Single-program epochs over an HBM-resident (lr, hr) pair buffer.

    Args:
        net: flax module mapping lr batch -> sr batch.
        loss_fns / loss_weights / metric_fns: as in BaseTrainer.
        optimizer: optax transformation.
        lr_data / hr_data: (M, h, w, C) and (M, H, W, C) arrays (or with a
            leading window axis for sequence tasks: (M, T, h, w, C)).
        batch_size, patch, ratio: sampler config (patch = LR crop size).
        dataset_stats: 'acdc' | 'dsb15' for metric denormalization.
    """

    def __init__(
        self,
        net,
        loss_fns: Sequence,
        loss_weights: Sequence[float],
        metric_fns: Sequence,
        optimizer,
        lr_data: np.ndarray,
        hr_data: np.ndarray,
        batch_size: int,
        patch: int,
        ratio: int,
        steps_per_epoch: int | None = None,
        dataset_stats: str = "acdc",
        random_seed: int | str = "vsr",
        window: int | None = None,
        scan_unroll: int | str = "auto",
        qat: dict | bool | None = None,
    ):
        # ``window``: when set and the buffers are whole sequences
        # (M, T_full, h, w, C), each sample is a ``window``-frame temporal
        # slice with circular wrap, gathered on device — storing sequences
        # once instead of duplicating frames into every window (T_full/
        # window x less HBM than pre-windowed buffers).
        self.window = window
        # (M, T, h, w, C) windows or (M, T, D, h, w, C) 4D volumes
        hint = (window or lr_data.shape[1]) if lr_data.ndim >= 5 else None
        self.net = net = auto_unroll_net(net, scan_unroll, hint)
        self.loss_fns = list(loss_fns)
        self.loss_weights = [float(w) for w in loss_weights]
        self.metric_fns = list(metric_fns)
        self.tx = optimizer
        self.batch_size = batch_size
        self.patch = patch
        self.ratio = ratio
        self.m = lr_data.shape[0]
        self.steps_per_epoch = steps_per_epoch or max(1, self.m // batch_size)
        self.stats = DATASET_STATS[dataset_stats]
        self.rng_tree = RngTree(random_seed)
        # QAT: the in-scan train step's forward runs under the fake-quant
        # interceptor (same option schema as BaseTrainer.qat).
        self._qat_interceptor = None
        if qat:
            from vsr_tpu.quantize import resolve_qat

            self._qat_interceptor = resolve_qat(qat)

        self.lr_buf = jax.device_put(jnp.asarray(lr_data, jnp.float32))
        self.hr_buf = jax.device_put(jnp.asarray(hr_data, jnp.float32))

        example = self._sample_example()
        self.params = net.init(self.rng_tree.jax_key("init"), example)
        self.opt_state = self.tx.init(self.params["params"])
        self.epoch = 0

        self._epoch_fn = jax.jit(self._run_epoch_fn, donate_argnames=("params", "opt_state"))

    # ------------------------------------------------------------------
    def _sample_example(self):
        """(M, [T,] [D,] h, w, C) buffers -> a (B, [T,] [D,] patch,
        patch, C) example (4D nets included; ``window`` replaces T)."""
        shape = self.lr_buf.shape
        lead = shape[1:-3]
        if self.window is not None:
            if self.lr_buf.ndim != 5:
                # _sample_batch's circular-window gather indexes rank-5
                # buffers only; silently skipping it for other ranks
                # would train on whole sequences while claiming windows.
                raise NotImplementedError(
                    f"window={self.window} needs (M, T_full, h, w, C) "
                    f"sequence buffers; got rank-{self.lr_buf.ndim}")
            lead = (self.window,) + shape[2:-3]
        return jnp.zeros((self.batch_size, *lead,
                          self.patch, self.patch, shape[-1]))

    def _sample_batch(self, key):
        """Random samples (+ circular temporal windows) -> shared paired
        crop/flip/normalize."""
        k_idx, k_t, k_aug = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (self.batch_size,), 0, self.m)
        lr = self.lr_buf[idx]
        hr = self.hr_buf[idx]
        if self.window is not None and lr.ndim == 5:
            # Circular temporal windows gathered on device.
            t_full = lr.shape[1]
            t0 = jax.random.randint(k_t, (self.batch_size,), 0, t_full)
            offsets = jnp.arange(self.window)
            tidx = (t0[:, None] + offsets[None, :]) % t_full  # (B, window)
            lr = jnp.take_along_axis(lr, tidx[:, :, None, None, None], axis=1)
            hr = jnp.take_along_axis(hr, tidx[:, :, None, None, None], axis=1)
        return sample_crop_flip(k_aug, lr, hr, self.patch, self.ratio, self.stats)

    def _apply_net(self, p, inputs):
        if self._qat_interceptor is None:
            return self.net.apply({"params": p}, inputs)
        import flax.linen as nn

        with nn.intercept_methods(self._qat_interceptor):
            return self.net.apply({"params": p}, inputs)

    def _train_step(self, params, opt_state, inputs, targets):
        def loss_fn(p):
            outputs = self._apply_net(p, inputs)
            if isinstance(outputs, tuple):
                outputs = outputs[0]
            losses = [fn(outputs, targets) for fn in self.loss_fns]
            total = sum(w * l for w, l in zip(self.loss_weights, losses))
            return total, outputs

        (total, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["params"]
        )
        import optax

        updates, opt_state = self.tx.update(grads, opt_state, params["params"])
        params = {"params": optax.apply_updates(params["params"], updates)}

        mean, std = self.stats
        denorm = lambda x: jnp.clip(jnp.round(x * std + mean), 0, 255)
        scalars = {"Loss": total}
        for fn in self.metric_fns:
            scalars[fn.__class__.__name__] = fn(denorm(outputs), denorm(targets))
        return params, opt_state, scalars

    def _run_epoch_fn(self, params, opt_state, key):
        def body(carry, step_key):
            params, opt_state = carry
            inputs, targets = self._sample_batch(step_key)
            params, opt_state, scalars = self._train_step(
                params, opt_state, inputs, targets
            )
            return (params, opt_state), scalars

        keys = jax.random.split(key, self.steps_per_epoch)
        (params, opt_state), scalars = jax.lax.scan(body, (params, opt_state), keys)
        return params, opt_state, jax.tree_util.tree_map(jnp.mean, scalars)

    # ------------------------------------------------------------------
    def train_epoch(self) -> dict:
        """One fully-on-device epoch; returns the mean scalar log."""
        self.epoch += 1
        key = self.rng_tree.jax_key("device-epoch", self.epoch)
        self.params, self.opt_state, scalars = self._epoch_fn(
            self.params, self.opt_state, key
        )
        log = {k: float(v) for k, v in scalars.items()}
        logging.info(f"Device epoch {self.epoch}: { {k: round(v, 5) for k, v in log.items()} }")
        return log


def stack_dataset_raw(dataset, limit: int | None = None, indices=None):
    """Stack a dataset with its augments and normalization BYPASSED.

    Device trainers re-apply augmentation (paired crop + flips) and
    normalization on device from explicit PRNG keys, so buffers must hold the
    raw [0, 255] frames. The dataset's transforms are swapped for a bare
    ToTensor and its augments for identity during stacking, then restored.
    """
    from vsr_tpu.data.transforms import compose

    old_t, old_a = dataset.transforms, dataset.augments
    dataset.transforms = compose(None)  # ToTensor only
    dataset.augments = lambda *imgs, rng=None: imgs
    try:
        return stack_dataset(dataset, limit, indices)
    finally:
        dataset.transforms, dataset.augments = old_t, old_a


class DeviceTrainerMixin:
    """Config-driven device-epoch training with full BaseTrainer parity.

    Mixed into the task trainers, this replaces ONLY the training epoch with
    the single-program device epoch (the whole train split HBM-resident, one
    ``lax.scan`` of fused sample->augment->step per epoch). Validation,
    checkpointing, Monitor best/early-stop, logger, lr scheduling, and
    RNG-in-checkpoint resume are all inherited from BaseTrainer — the
    reference trainer contract (``base_trainer.py:46-97``) holds unchanged,
    and checkpoints interoperate with the host-loop trainers (same params /
    opt_state / monitor structures).

    Config kwargs (trainer.kwargs): ``patch`` (LR crop size), ``ratio``
    (upscale factor for the paired HR crop), optional ``steps_per_epoch``
    (default: dataset_size // batch_size), optional ``buffer_limit`` (cap on
    HBM-resident samples). The dataset config's ``augments`` list is ignored
    in the training epoch: the device path always applies the standard
    HFlip + VFlip + RandomCropPatch pipeline from explicit PRNG keys;
    normalization uses the canonical dataset stats (utils/normalize.py),
    which are the values every reference config carries.
    """

    def __init__(self, *args, patch: int, ratio: int,
                 steps_per_epoch: int | None = None,
                 buffer_limit: int | None = None,
                 scan_unroll: int | str = "auto", **kwargs):
        super().__init__(*args, **kwargs)
        # The device epoch is ONE shard_map over the whole mesh; a nested
        # GSPMD/pipe/ZeRO step inside it would either crash (nested
        # shard_map over the same mesh) or silently replicate — reject the
        # combinations up front. 'spatial'/'seq' are also a REGIME
        # mismatch, not just unwired: device-epoch training samples small
        # patches (16-96 px crops, windows of 4-7 frames) whose whole
        # point is fitting thousands of samples in HBM, while
        # spatial/seq sharding exists for activations too LARGE for one
        # device — a 32-px patch split 8 ways is halo exchange over
        # 4-px strips. Large-volume sharded training is the host-loop
        # trainer's job (it shards real full-size volumes). 'spatial'
        # gets the same treatment at buffer time (_ensure_buffers).
        if self.mesh is not None:
            bad = [a for a in ("model", "pipe", "seq")
                   if a in self.mesh.shape]
            if bad:
                raise NotImplementedError(
                    f"device trainers support data-parallel meshes only "
                    f"(mesh_axes={{'data': n}}); {bad} axes are host-loop "
                    f"trainer features (patch-sized samples have nothing "
                    "to shard spatially)")
        if self._zero_axis is not None:
            # Measured rationale (BENCH.md round 5): at device-epoch net
            # sizes the Adam moments are 3-17 MB (EDSR-16/64 10.9 MB,
            # flagship DRF-64/6 17.1 MB, vol3d 4.7 MB, vol4d 2.7 MB) —
            # an 8-way ZeRO-1 would free at most ~15 MB/device of 16 GB
            # HBM (<0.1%), while this trainer's actual HBM pressure, the
            # sample buffers (~460 MB at ACDC scale), ALREADY shards over
            # 'data'. Sharding the moments inside the epoch shard_map
            # would also break optax-chain global reductions
            # (clip_by_global_norm sees one shard). Net sizes where
            # ZeRO-1 pays use the host-loop trainer's GSPMD path.
            raise NotImplementedError(
                "zero_optim is not wired into the device-epoch shard_map "
                "(its opt_state in_specs are replicated; moments at these "
                "net sizes are <20 MB vs the ~0.5 GB sample buffers that "
                "already shard — see BENCH.md round 5) — use the "
                "host-loop trainer for ZeRO-1")
        if self._fsdp_axis is not None:
            raise NotImplementedError(
                "fsdp is not wired into the device-epoch shard_map (its "
                "params/opt_state in_specs are replicated) — use the "
                "host-loop trainer for FSDP/ZeRO-3")
        if self._expert_axis is not None:
            raise NotImplementedError(
                "the 'expert' axis is not wired into the device-epoch "
                "shard_map (its params in_specs are replicated) — use the "
                "host-loop trainer for expert parallelism")
        if self._multiprocess:
            # Multi-host 'data' meshes ARE supported: each process stacks
            # only ITS contiguous block of the train split, the blocks are
            # assembled into ONE global P('data')-sharded buffer pair
            # (host_local_to_global), and the epoch stays a single jitted
            # shard_map whose per-step pmean rides DCN between hosts
            # exactly as it rides ICI within one (SURVEY §2.9 /
            # BASELINE config #5). Non-data axes were rejected above;
            # 'spatial' is rejected here too (its buffer-time check in
            # _ensure_buffers would otherwise fire after a long stack).
            if self.mesh is not None and self.mesh.shape.get("spatial", 1) != 1:
                raise NotImplementedError(
                    "device trainers support data-parallel meshes only "
                    "(mesh_axes={'data': n}); spatial sharding is a "
                    "host-loop trainer feature")
        self.patch = int(patch)
        self.ratio = int(ratio)
        self._steps_cfg = steps_per_epoch
        self.buffer_limit = buffer_limit
        self.scan_unroll = scan_unroll
        self.lr_buf = None
        self._device_epoch = None

    def _apply_scan_unroll(self) -> None:
        """Apply :func:`auto_unroll_net` once the buffers reveal the
        frame-scan length (trainer.kwargs.scan_unroll: "auto"|int)."""
        hint = None
        if self.lr_buf is not None and self.lr_buf.ndim >= 5:
            # (M, T, h, w, C) windows / (M, T, D, h, w, C) 4D volumes —
            # axis 1 is the net's scanned axis in both buffer layouts
            hint = int(self.lr_buf.shape[1])
        self.net = auto_unroll_net(self.net, self.scan_unroll, hint)

    # ------------------------------------------------------------- buffers
    def _buffer_layout(self, lr: np.ndarray, hr: np.ndarray):
        """Transpose stacked transform-layout buffers into the NET layout
        (identity for the 2D tasks; volume twins move D before H)."""
        return lr, hr

    def _ensure_buffers(self) -> None:
        if self.lr_buf is not None:
            return
        self.batch_size = self.train_dataloader.batch_size
        n_data = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        if self.mesh is not None and self.mesh.shape.get("spatial", 1) != 1:
            raise ValueError(
                "device trainers support data-parallel meshes only "
                "(mesh_axes={'data': n}); spatial sharding is a host-loop "
                "trainer feature")
        if self._multiprocess:
            self._ensure_buffers_multihost(n_data)
            self._apply_scan_unroll()
            return
        lr, hr = stack_dataset_raw(self.train_dataloader.dataset,
                                   limit=self.buffer_limit)
        lr, hr = self._buffer_layout(lr, hr)
        if n_data > 1:
            # Multi-chip: the sample buffers are SHARDED over the data axis
            # (each chip holds M/n samples — HBM capacity scales with the
            # mesh), every chip samples from its local shard with a
            # device-folded key, and gradients pmean over ICI inside the
            # epoch scan. Global batch = config batch_size.
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.batch_size % n_data:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by data "
                    f"axis {n_data}")
            if lr.shape[0] < n_data:
                raise ValueError(
                    f"train split has {lr.shape[0]} samples — fewer than "
                    f"the data axis size {n_data}; every chip needs at "
                    f"least one buffered sample")
            m = (lr.shape[0] // n_data) * n_data
            if m != lr.shape[0]:
                logging.info(
                    f"DP buffers: truncating {lr.shape[0]} -> {m} samples "
                    f"(multiple of data axis {n_data}).")
            lr, hr = lr[:m], hr[:m]
            shard = NamedSharding(self.mesh, P("data"))
            self.lr_buf = jax.device_put(jnp.asarray(lr, jnp.float32), shard)
            self.hr_buf = jax.device_put(jnp.asarray(hr, jnp.float32), shard)
            self.m = m // n_data           # per-device samples
            self._step_batch = self.batch_size // n_data
            self.steps_per_epoch = self._steps_cfg or max(
                1, m // self.batch_size)

            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map

            sharded = shard_map(
                self._device_epoch_dp_fn,
                mesh=self.mesh,
                in_specs=(P(), P(), P(), P("data"), P("data")),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
            self._device_epoch = jax.jit(sharded, donate_argnums=(0, 1))
        else:
            self.lr_buf = jax.device_put(jnp.asarray(lr, jnp.float32))
            self.hr_buf = jax.device_put(jnp.asarray(hr, jnp.float32))
            self.m = lr.shape[0]
            self._step_batch = self.batch_size
            self.steps_per_epoch = self._steps_cfg or max(
                1, self.m // self.batch_size)
            self._device_epoch = jax.jit(
                self._device_epoch_fn, donate_argnames=("params", "opt_state"))
        self._apply_scan_unroll()

    def _ensure_buffers_multihost(self, n_data: int) -> None:
        """Multi-host 'data'-mesh buffers: ONE global P('data')-sharded
        sample buffer pair over the process-spanning mesh.

        Each process stacks from disk only its contiguous block of the
        (truncated) train split and contributes it via
        ``host_local_array_to_global_array``; every device then holds
        exactly the per-device shard a single-process run over the same
        global mesh would, so the epoch program — including the random
        draws, whose key folds in the GLOBAL ``axis_index('data')`` — is
        unchanged, and the per-step grad pmean rides DCN between hosts
        the same way it rides ICI within one (BASELINE config #5's
        HBM-resident DP design, now host-spanning). The epoch jit pins
        params/opt_state/key replicated and the buffers P('data'): the
        same convention as ``make_gspmd_step``'s multi-host DP jit, so
        host-local params on the first call commit cleanly.

        ``train_batch_size`` stays the GLOBAL batch (the device-trainer
        convention — each device steps batch/n_data samples), unlike the
        host-loop trainers where it is the per-process loader batch.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vsr_tpu.parallel.distributed import (host_local_to_global,
                                                  process_count)

        d_idx, d_cnt = self._mesh_blocks["data"]
        if d_cnt != process_count():  # unreachable: only 'data' spans hosts
            raise AssertionError(
                f"device-epoch mesh's 'data' axis splits into {d_cnt} "
                f"process blocks but there are {process_count()} processes")
        dataset = self.train_dataloader.dataset
        n = len(dataset)
        if self.buffer_limit is not None:
            n = min(self.buffer_limit, n)
        if self.batch_size % n_data:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by data "
                f"axis {n_data}")
        m = (n // n_data) * n_data
        if m == 0:
            raise ValueError(
                f"train split has {n} samples — fewer than the data axis "
                f"size {n_data}; every chip needs at least one buffered "
                "sample")
        if m != n:
            logging.info(
                f"DP buffers: truncating {n} -> {m} samples (multiple of "
                f"data axis {n_data}).")
        block = m // d_cnt
        lr, hr = stack_dataset_raw(
            dataset, indices=range(d_idx * block, (d_idx + 1) * block))
        lr, hr = self._buffer_layout(lr, hr)
        spec = P("data")
        self.lr_buf = host_local_to_global(
            jnp.asarray(lr, jnp.float32), self.mesh, spec)
        self.hr_buf = host_local_to_global(
            jnp.asarray(hr, jnp.float32), self.mesh, spec)
        self.m = m // n_data              # per-device samples
        self._step_batch = self.batch_size // n_data
        self.steps_per_epoch = self._steps_cfg or max(1, m // self.batch_size)

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        sharded = shard_map(
            self._device_epoch_dp_fn,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), spec, spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        rep = NamedSharding(self.mesh, P())
        buf = NamedSharding(self.mesh, spec)
        self._device_epoch = jax.jit(
            sharded, in_shardings=(rep, rep, rep, buf, buf),
            out_shardings=(rep, rep, rep), donate_argnums=(0, 1))

    def _example_inputs(self):
        self._ensure_buffers()
        shape = self.lr_buf.shape
        # (M, [T,] [D,] h, w, C) -> a (B, [T,] [D,] patch, patch, C) example.
        return jnp.zeros((self.batch_size, *shape[1:-3],
                          self.patch, self.patch, shape[-1]))

    # ------------------------------------------------------------- sampling
    def _pack_device_targets(self, hr, inputs):
        """Hook matching the task trainer's target structure (``inputs`` is
        the sampled LR batch, for tasks whose loss references it)."""
        return hr

    def _sample_batch(self, key, lr_buf=None, hr_buf=None):
        """Random per-device samples -> shared paired crop/flip/normalize."""
        from vsr_tpu.utils.normalize import DATASET_STATS

        lr_buf = self.lr_buf if lr_buf is None else lr_buf
        hr_buf = self.hr_buf if hr_buf is None else hr_buf
        k_idx, k_aug = jax.random.split(key)
        idx = jax.random.randint(k_idx, (self._step_batch,), 0, self.m)
        return sample_crop_flip(k_aug, lr_buf[idx], hr_buf[idx], self.patch,
                                self.ratio, DATASET_STATS[self.dataset_stats])

    # --------------------------------------------------------------- epoch
    def _epoch_scan(self, params, opt_state, key, lr_buf, hr_buf,
                    axis_name=None):
        def body(carry, step_key):
            params, opt_state = carry
            inputs, hr = self._sample_batch(step_key, lr_buf, hr_buf)
            targets = self._pack_device_targets(hr, inputs)
            params, opt_state, scalars, _ = self._step(
                params, opt_state, inputs, targets, training=True,
                axis_name=axis_name)
            return (params, opt_state), scalars

        keys = jax.random.split(key, self.steps_per_epoch)
        (params, opt_state), scalars = jax.lax.scan(body, (params, opt_state), keys)
        return params, opt_state, jax.tree_util.tree_map(jnp.mean, scalars)

    def _device_epoch_fn(self, params, opt_state, key, lr_buf, hr_buf):
        return self._epoch_scan(params, opt_state, key, lr_buf, hr_buf)

    def _device_epoch_dp_fn(self, params, opt_state, key, lr_buf, hr_buf):
        """Per-device body under shard_map: each chip samples its OWN local
        buffer shard with a device-folded key; the per-step pmean inside
        _step allreduces grads/scalars over ICI."""
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return self._epoch_scan(params, opt_state, key, lr_buf, hr_buf,
                                axis_name="data")

    def _run_epoch(self, mode: str, epoch: int):
        if mode != "training":
            return super()._run_epoch(mode, epoch)
        if self._mid_epoch_resume is not None:
            # A host-loop trainer's STEP-GRANULAR preempt checkpoint: the
            # device-epoch scan has no mid-epoch entry point (one program
            # per epoch — preemption here already loses no batches).
            # Silently ignoring the marker would skip the interrupted
            # epoch's replayed tail.
            raise NotImplementedError(
                "this mid-epoch preemption checkpoint was written by a "
                "host-loop trainer; resume it with the same trainer "
                "family (device-epoch trainers train whole epochs as one "
                "program and cannot enter an epoch at a batch offset)")
        self._epoch_training = True
        self._ensure_buffers()
        key = self.rng_tree.jax_key("device-epoch", epoch)
        self.params, self.opt_state, scalars = self._device_epoch(
            self.params, self.opt_state, key, self.lr_buf, self.hr_buf)
        log = {k: float(v) for k, v in scalars.items()}
        return log, None, None


def _register_device_trainers() -> None:
    """Device-epoch twins of every patch-training task trainer."""
    from vsr_tpu.registry import register
    from vsr_tpu.runner.trainers import (
        FRVSRTrainer,
        MISRTrainer,
        SISRSRFBTrainer,
        SISRTrainer,
        Volume4DTrainer,
        VolumeTrainer,
        VSRTrainer,
    )

    class _DeviceVSRBase(DeviceTrainerMixin, VSRTrainer):
        def _pack_device_targets(self, hr, inputs):
            # (hr, frame mask) — all frames real in fixed training windows.
            return hr, jnp.ones((hr.shape[0], hr.shape[1]), hr.dtype)

    class _DeviceFRVSRBase(DeviceTrainerMixin, FRVSRTrainer):
        def _pack_device_targets(self, hr, inputs):
            # FRVSR losses reference the LR inputs (flow-warp loss).
            mask = jnp.ones((hr.shape[0], hr.shape[1]), hr.dtype)
            return inputs, hr, mask

    for name, base, stats in [
        ("AcdcSISRDeviceTrainer", SISRTrainer, "acdc"),
        ("Dsb15SISRDeviceTrainer", SISRTrainer, "dsb15"),
        ("AcdcSISRSRFBDeviceTrainer", SISRSRFBTrainer, "acdc"),
        ("Dsb15SISRSRFBDeviceTrainer", SISRSRFBTrainer, "dsb15"),
        ("AcdcMISRDeviceTrainer", MISRTrainer, "acdc"),
        ("Dsb15MISRDeviceTrainer", MISRTrainer, "dsb15"),
    ]:
        cls = type(name, (DeviceTrainerMixin, base), {"dataset_stats": stats})
        register("trainer", name)(cls)
        globals()[name] = cls
    class _DeviceVolumeBase(DeviceTrainerMixin, VolumeTrainer):
        """3D volumetric twin (BASELINE config #2): buffers stored in the
        net's (M, D, H, W, C) layout so the shared on-device paired crop
        slices (h, w) at axes -3/-2 with D untouched — the device analogue
        of RandomCropPatch's unscaled depth dim (transforms.py)."""

        def _buffer_layout(self, lr, hr):
            return np.moveaxis(lr, 3, 1), np.moveaxis(hr, 3, 1)

    class _DeviceVolume4DBase(DeviceTrainerMixin, Volume4DTrainer):
        """4D spatio-temporal twin (BASELINE config #3): (M, T, D, H, W, C)
        buffers; targets carry the (hr, frame-mask) pair the VSR-style
        step expects (all frames real in fixed training windows)."""

        def _buffer_layout(self, lr, hr):
            return np.moveaxis(lr, 4, 2), np.moveaxis(hr, 4, 2)

        def _pack_device_targets(self, hr, inputs):
            return hr, jnp.ones((hr.shape[0], hr.shape[1]), hr.dtype)

    for name, base, stats in [
        ("AcdcVSRDeviceTrainer", _DeviceVSRBase, "acdc"),
        ("Dsb15VSRDeviceTrainer", _DeviceVSRBase, "dsb15"),
        ("AcdcFRVSRDeviceTrainer", _DeviceFRVSRBase, "acdc"),
        ("Dsb15FRVSRDeviceTrainer", _DeviceFRVSRBase, "dsb15"),
        ("Acdc3DSRDeviceTrainer", _DeviceVolumeBase, "acdc"),
        ("Dsb153DSRDeviceTrainer", _DeviceVolumeBase, "dsb15"),
        ("Acdc4DSRDeviceTrainer", _DeviceVolume4DBase, "acdc"),
        ("Dsb154DSRDeviceTrainer", _DeviceVolume4DBase, "dsb15"),
    ]:
        cls = type(name, (base,), {"dataset_stats": stats})
        register("trainer", name)(cls)
        globals()[name] = cls


_register_device_trainers()
