"""Multi-host (2-process) data-parallel training over a localhost
coordinator — VERDICT round-2 item #2 ("make multi-host real").

The parent builds a synthetic SISR tree + a config with
``mesh_axes={'data': 4}`` and a host-sharded loader, then launches TWO real
``python -m vsr_tpu.main`` CLI processes (2 virtual CPU devices each) that
connect through ``jax.distributed`` (Gloo on CPU; ICI/DCN on a TPU slice)
and train one model on the global batch. Assertions:

- both processes complete; process 0 writes the checkpoints, process 1
  does not (replicated state, one owner);
- the final parameters equal a single-process 4-device DP run on the same
  data within fp32 tolerance — full-dataset batches make the two batch
  streams identical, so this checks the whole multi-host path (host-sharded
  loader slices, host_local_to_global assembly, pmean over the
  process-spanning mesh, primary-only checkpointing);
- per-epoch Train/Valid logs agree across the two processes and with the
  single-process run.
"""

from __future__ import annotations

import ast
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from tests.synth import make_processed_tree

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _config(tree: Path, saved: Path, local_batch: int, host_shard: bool,
            valid_batch: int | None = None) -> dict:
    return {
        "main": {"saved_dir": str(saved), "random_seed": "vsr"},
        "dataset": {
            "name": "AcdcSISRDataset",
            "kwargs": {
                "data_dir": str(tree / "imgs"),
                "downscale_factor": 2,
                "transforms": [
                    {"name": "Normalize",
                     "kwargs": {"means": [54.089], "stds": [48.084]}},
                    {"name": "ToTensor"},
                ],
                "augments": [],
            },
        },
        "dataloader": {
            "name": "Dataloader",
            "kwargs": {"train_batch_size": local_batch,
                       "valid_batch_size": valid_batch or local_batch,
                       "shuffle": False, "num_workers": 0,
                       "host_shard": host_shard},
        },
        "net": {"name": "EDSRNet",
                "kwargs": {"in_channels": 1, "out_channels": 1,
                           "num_resblocks": 2, "num_features": 8,
                           "upscale_factor": 2}},
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001}},
        "logger": {"name": "AcdcSISRLogger"},
        "monitor": {"name": "Monitor",
                    "kwargs": {"mode": "min", "target": "Loss",
                               "saved_freq": 1}},
        "trainer": {"name": "AcdcSISRTrainer",
                    "kwargs": {"num_epochs": 2,
                               "mesh_axes": {"data": 4}}},
    }


def _parse_logs(text: str, tag: str) -> list[dict]:
    out = []
    for line in text.splitlines():
        pos = line.find(tag)
        if pos >= 0:
            out.append(ast.literal_eval(line[pos + len(tag):].rstrip(".")))
    return out


def _launch_pair(root: Path, cfg: dict, tag: str) -> list[str]:
    """Launch TWO real CLI processes over a localhost coordinator; return
    their logs (asserting both exited 0)."""
    cfg_path = root / f"{tag}.yaml"
    with open(cfg_path, "w") as f:
        # sort_keys=False: mesh_axes ORDER decides which axis spans the
        # processes (make_mesh reshapes jax.devices() row-major) — the
        # default alphabetical sort would silently turn a seq-leading
        # mesh into a data-leading one.
        yaml.safe_dump(cfg, f, sort_keys=False)

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            # NOT the suite's cache dir: these workers run with different
            # XLA machine flags (2 virtual devices vs the suite's 8), and
            # mixed-flag writers can poison a shared CPU cache into
            # entries that deadlock later runs (CLAUDE.md round-3 gotcha).
            JAX_COMPILATION_CACHE_DIR="/tmp/vsr_tpu_jax_cache_cpu_mh2",
            PYTHONPATH=str(REPO),
            VSR_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            VSR_NUM_PROCESSES="2",
            VSR_PROCESS_ID=str(pid),
        )
        out = open(root / f"{tag}_proc{pid}.log", "w")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vsr_tpu.main", str(cfg_path)],
            cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT))
    codes = [p.wait(timeout=420) for p in procs]
    for f in outs:
        f.close()
    logs = [(root / f"{tag}_proc{i}.log").read_text() for i in range(2)]
    assert codes == [0, 0], f"worker failure:\n{logs[0][-3000:]}\n{logs[1][-3000:]}"
    return logs


@pytest.fixture(scope="module")
def mh_run(tmp_path_factory):
    """Launch the 2-process distributed run once; tests assert on it."""
    root = tmp_path_factory.mktemp("multihost")
    tree = root / "data"
    make_processed_tree(tree, types=("train", "valid"), patients_per_type=2,
                        slices=1, frames=6, hr_size=24, factors=(2,), seed=5)

    saved = root / "dist_out"
    # valid_batch=1 (the reference-style default) exercises the per-process
    # shard-eval fallback + cross-process log reduction: 1 does not divide
    # the 2-device local mesh slice, so validation cannot use the DP step.
    cfg = _config(tree, saved, local_batch=6, host_shard=True, valid_batch=1)
    logs = _launch_pair(root, cfg, "dist")
    return root, saved, logs


def test_two_process_training_completes(mh_run):
    _, saved, logs = mh_run
    for text in logs:
        assert "jax.distributed: process" in text
        assert "/2" in text.split("jax.distributed: process", 1)[1][:20]
    assert (saved / "checkpoints" / "model_2.ckpt").exists()


def test_process_logs_agree(mh_run):
    _, _, logs = mh_run
    t0, t1 = (_parse_logs(t, "Train log: ") for t in logs)
    v0, v1 = (_parse_logs(t, "Valid log: ") for t in logs)
    assert len(t0) == len(t1) == 2
    for a, b in zip(t0 + v0, t1 + v1):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=k)


def test_matches_single_process_run(mh_run, tmp_path):
    """Final params + logs of the 2-host run == a single-process 4-device DP
    run over the same data (full-dataset batches => identical batch
    streams)."""
    root, saved, logs = mh_run
    from vsr_tpu.config import Config
    from vsr_tpu.main import run_train
    from vsr_tpu.utils.checkpoint import load_checkpoint

    single_saved = tmp_path / "single_out"
    cfg = _config(root / "data", single_saved, local_batch=12,
                  host_shard=False, valid_batch=1)
    run_train(Config(cfg))

    dist_state, _ = load_checkpoint(saved / "checkpoints" / "model_2.ckpt")
    single_state, _ = load_checkpoint(single_saved / "checkpoints" / "model_2.ckpt")

    flat_d = jax_flatten(dist_state["params"])
    flat_s = jax_flatten(single_state["params"])
    assert flat_d.keys() == flat_s.keys()
    for key in flat_d:
        np.testing.assert_allclose(flat_d[key], flat_s[key], rtol=1e-5,
                                   atol=1e-6, err_msg=key)


def jax_flatten(tree, prefix="") -> dict[str, np.ndarray]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(jax_flatten(v, f"{prefix}/{k}"))
        return out
    return {prefix: np.asarray(tree)}


def test_fsdp_two_process_matches_plain_dp(mh_run):
    """2-process FSDP (params+moments sharded ACROSS HOSTS) trains the same
    model as the plain 2-process DP run: exercises cross-host param
    placement, the collective checkpoint gather (full-shaped leaves in the
    file), the batch-1 validation fallback's shard gather, and the
    load->re-place resume path."""
    root, saved, _logs = mh_run
    from vsr_tpu.utils.checkpoint import load_checkpoint

    fsdp_saved = root / "fsdp_out"
    cfg = _config(root / "data", fsdp_saved, local_batch=6, host_shard=True,
                  valid_batch=1)
    cfg["trainer"]["kwargs"]["fsdp"] = True
    _launch_pair(root, cfg, "fsdp")

    dp_state, _ = load_checkpoint(saved / "checkpoints" / "model_2.ckpt")
    f_state, _ = load_checkpoint(fsdp_saved / "checkpoints" / "model_2.ckpt")
    flat_dp = jax_flatten(dp_state["params"])
    flat_f = jax_flatten(f_state["params"])
    assert flat_dp.keys() == flat_f.keys()
    for key in flat_dp:
        # FSDP reassociates the gradient reduction (reduce-scatter vs
        # all-reduce) — fp32-reassociation tolerance, same as the
        # single-host ZeRO/FSDP equivalence tests.
        np.testing.assert_allclose(flat_f[key], flat_dp[key], rtol=5e-4,
                                   atol=1e-5, err_msg=key)
    # The gathered checkpoint holds FULL-shaped moment leaves (the
    # collective gather ran), so it interoperates with any topology.
    flat_opt = jax_flatten(f_state["opt_state"])
    full = jax_flatten(dp_state["opt_state"])
    for key in full:
        assert flat_opt[key].shape == full[key].shape, key

    # Resume leg: 2 more epochs from the sharded-trained checkpoint
    # (load -> _place_state -> sharded jit in_shardings).
    cfg["main"]["loaded_path"] = str(
        fsdp_saved / "checkpoints" / "model_2.ckpt")
    cfg["trainer"]["kwargs"]["num_epochs"] = 3
    logs = _launch_pair(root, cfg, "fsdp_resume")
    assert all("Resume training." in t for t in logs)
    t0 = _parse_logs(logs[0], "Train log: ")
    assert len(t0) == 1 and np.isfinite(t0[0]["Loss"])


def _vol4d_config(tree: Path, saved: Path, batch: int, host_shard: bool,
                  mesh_axes: dict | None) -> dict:
    cfg = {
        "main": {"saved_dir": str(saved), "random_seed": "vsr"},
        "dataset": {
            "name": "AcdcVolumeVSRDataset",
            "kwargs": {
                "data_dir": str(tree / "videos"),
                "downscale_factor": 2,
                "transforms": [
                    {"name": "Normalize",
                     "kwargs": {"means": [54.089], "stds": [48.084]}},
                    {"name": "ToTensor"},
                ],
                "augments": [],
                "num_frames": 3,
            },
        },
        "dataloader": {
            "name": "Dataloader",
            "kwargs": {"train_batch_size": batch, "valid_batch_size": 1,
                       "shuffle": False, "num_workers": 0,
                       "host_shard": host_shard},
        },
        "net": {"name": "Volume4DSRNet",
                "kwargs": {"in_channels": 1, "out_channels": 1,
                           "num_features": 4, "num_resblocks": 1,
                           "upscale_factor": 2}},
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001}},
        "logger": {"name": "Acdc4DSRLogger"},
        "monitor": {"name": "Monitor",
                    "kwargs": {"mode": "min", "target": "Loss",
                               "saved_freq": 1}},
        "trainer": {"name": "Acdc4DSRTrainer",
                    "kwargs": {"num_epochs": 2}},
    }
    if mesh_axes:
        cfg["trainer"]["kwargs"]["mesh_axes"] = mesh_axes
    return cfg


@pytest.fixture(scope="module")
def vol_tree(tmp_path_factory):
    """Synthetic videos tree with DEPTH 4 (the 'seq' axis shards volume
    depth — mh_run's slices=1 tree has nothing to shard)."""
    root = tmp_path_factory.mktemp("multihost_vol")
    make_processed_tree(root / "data", types=("train", "valid"),
                        patients_per_type=2, slices=4, frames=6, hr_size=24,
                        factors=(2,), seed=9)
    return root


@pytest.mark.parametrize("mesh_axes,local_batch", [
    # 'data' leading -> spans the 2 processes; 'seq' (volume depth) shards
    # within each host. Each process loads its half of every global batch.
    ({"data": 2, "seq": 2}, 2),
    # 'seq' leading -> the DEPTH axis spans the processes: both processes
    # read the SAME global batch (the trainer overrides the loader's host
    # shard to 1 data block) and contribute their depth slice; XLA places
    # the 3x3x3-conv halo exchanges across the process boundary (DCN on a
    # real pod). The strongest multi-host volume-sharding case.
    ({"seq": 2, "data": 2}, 4),
])
def test_vol4d_multihost_seq_matches_single_process(vol_tree, tmp_path,
                                                    mesh_axes, local_batch):
    """Multi-host SEQ-PARALLEL 4D volume training (VERDICT round-3 item
    #1): 2 processes train a Volume4DSRNet over a {data, seq} mesh and
    must produce the same parameters as an unsharded single-process run
    on the same batch stream."""
    root = vol_tree
    from vsr_tpu.config import Config
    from vsr_tpu.main import run_train
    from vsr_tpu.utils.checkpoint import load_checkpoint

    tag = "x".join(f"{k}{v}" for k, v in mesh_axes.items())
    dist_saved = root / f"vol4d_{tag}_out"
    cfg = _vol4d_config(root / "data", dist_saved, batch=local_batch,
                        host_shard=True, mesh_axes=mesh_axes)
    _launch_pair(root, cfg, f"vol4d_{tag}")

    single_saved = tmp_path / "vol4d_single"
    cfg1 = _vol4d_config(root / "data", single_saved, batch=4,
                         host_shard=False, mesh_axes=None)
    run_train(Config(cfg1))

    d_state, _ = load_checkpoint(dist_saved / "checkpoints" / "model_2.ckpt")
    s_state, _ = load_checkpoint(single_saved / "checkpoints" / "model_2.ckpt")
    flat_d = jax_flatten(d_state["params"])
    flat_s = jax_flatten(s_state["params"])
    assert flat_d.keys() == flat_s.keys()
    for key in flat_d:
        np.testing.assert_allclose(flat_d[key], flat_s[key], rtol=5e-4,
                                   atol=1e-5, err_msg=key)


def test_spatial_two_process_matches_plain_dp(mh_run):
    """Multi-host SPATIAL sharding: mesh {'spatial': 2 across hosts,
    'data': 2 within each host} — every process reads the full global
    batch and computes its H-half of every conv (halo exchanges across
    the process boundary). Final params must match the plain 2-process
    DP run on the same batch stream."""
    root, saved, _logs = mh_run
    from vsr_tpu.utils.checkpoint import load_checkpoint

    sp_saved = root / "spatial_out"
    # Both processes load the full global batch (12): 'data' does not
    # span hosts here, so the trainer overrides the loader to ONE shard.
    cfg = _config(root / "data", sp_saved, local_batch=12, host_shard=True,
                  valid_batch=1)
    cfg["trainer"]["kwargs"]["mesh_axes"] = {"spatial": 2, "data": 2}
    _launch_pair(root, cfg, "spatial")

    dp_state, _ = load_checkpoint(saved / "checkpoints" / "model_2.ckpt")
    s_state, _ = load_checkpoint(sp_saved / "checkpoints" / "model_2.ckpt")
    flat_dp = jax_flatten(dp_state["params"])
    flat_s = jax_flatten(s_state["params"])
    assert flat_dp.keys() == flat_s.keys()
    for key in flat_dp:
        np.testing.assert_allclose(flat_s[key], flat_dp[key], rtol=5e-4,
                                   atol=1e-5, err_msg=key)


def _device_cfg(tree: Path, saved: Path, global_batch: int,
                host_shard: bool) -> dict:
    """Device-epoch twin config: train_batch_size is the GLOBAL batch
    (device-trainer convention — same value single- and multi-process)."""
    cfg = _config(tree, saved, local_batch=global_batch,
                  host_shard=host_shard, valid_batch=1)
    cfg["trainer"] = {"name": "AcdcSISRDeviceTrainer",
                      "kwargs": {"num_epochs": 2, "patch": 8, "ratio": 2,
                                 "steps_per_epoch": 4,
                                 "mesh_axes": {"data": 4}}}
    return cfg


def test_device_epoch_two_process_matches_single_process(mh_run, tmp_path):
    """Multi-host DEVICE-EPOCH training (round-4 verdict item #1): the
    production-rate trainer spans hosts on a 'data' mesh — each process
    stacks only its block of the train split, the blocks assemble into one
    global P('data')-sharded HBM buffer pair, and the whole epoch stays a
    single jitted shard_map whose grad pmean crosses the process boundary.
    Because every device holds the same buffer shard and folds the same
    axis_index into its sample keys as in a single-process run over the
    same global mesh, final params must match a single-process 4-device
    device-epoch run to fp32 tolerance."""
    root, _saved, _logs = mh_run
    from vsr_tpu.config import Config
    from vsr_tpu.main import run_train
    from vsr_tpu.utils.checkpoint import load_checkpoint

    dev_saved = root / "device_out"
    cfg = _device_cfg(root / "data", dev_saved, global_batch=8,
                      host_shard=True)
    logs = _launch_pair(root, cfg, "device")
    assert (dev_saved / "checkpoints" / "model_2.ckpt").exists()

    # Per-epoch logs agree across the two processes (replicated scalars).
    t0, t1 = (_parse_logs(t, "Train log: ") for t in logs)
    assert len(t0) == len(t1) == 2
    for a, b in zip(t0, t1):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=k)

    single_saved = tmp_path / "device_single"
    cfg1 = _device_cfg(root / "data", single_saved, global_batch=8,
                       host_shard=False)
    run_train(Config(cfg1))

    d_state, _ = load_checkpoint(dev_saved / "checkpoints" / "model_2.ckpt")
    s_state, _ = load_checkpoint(
        single_saved / "checkpoints" / "model_2.ckpt")
    flat_d = jax_flatten(d_state["params"])
    flat_s = jax_flatten(s_state["params"])
    assert flat_d.keys() == flat_s.keys()
    for key in flat_d:
        np.testing.assert_allclose(flat_d[key], flat_s[key], rtol=1e-5,
                                   atol=1e-6, err_msg=key)

    # Resume leg: 2 more epochs from the multi-host checkpoint (load ->
    # re-commit replicated state into the process-spanning epoch jit).
    cfg["main"]["loaded_path"] = str(dev_saved / "checkpoints" / "model_2.ckpt")
    cfg["trainer"]["kwargs"]["num_epochs"] = 3
    logs = _launch_pair(root, cfg, "device_resume")
    assert all("Resume training." in t for t in logs)
    t0 = _parse_logs(logs[0], "Train log: ")
    assert len(t0) == 1 and np.isfinite(t0[0]["Loss"])


def test_vol4d_device_epoch_two_process_matches_single_process(
        vol_tree, tmp_path):
    """Multi-host device-epoch for a VOLUME family: exercises the
    _buffer_layout transpose (transform layout -> net layout) inside the
    per-process block stacking, the rank-6 global P('data') buffers, and
    the 4D epoch program across the process boundary."""
    root = vol_tree
    from vsr_tpu.config import Config
    from vsr_tpu.main import run_train
    from vsr_tpu.utils.checkpoint import load_checkpoint

    def cfg_for(saved, host_shard):
        cfg = _vol4d_config(root / "data", saved, batch=4,
                            host_shard=host_shard, mesh_axes={"data": 4})
        cfg["trainer"] = {"name": "Acdc4DSRDeviceTrainer",
                          "kwargs": {"num_epochs": 2, "patch": 8,
                                     "ratio": 2, "steps_per_epoch": 3,
                                     "mesh_axes": {"data": 4}}}
        return cfg

    dev_saved = root / "vol4d_device_out"
    _launch_pair(root, cfg_for(dev_saved, True), "vol4d_device")
    single_saved = tmp_path / "vol4d_device_single"
    run_train(Config(cfg_for(single_saved, False)))

    d_state, _ = load_checkpoint(dev_saved / "checkpoints" / "model_2.ckpt")
    s_state, _ = load_checkpoint(
        single_saved / "checkpoints" / "model_2.ckpt")
    flat_d = jax_flatten(d_state["params"])
    flat_s = jax_flatten(s_state["params"])
    assert flat_d.keys() == flat_s.keys()
    for key in flat_d:
        np.testing.assert_allclose(flat_d[key], flat_s[key], rtol=1e-5,
                                   atol=1e-6, err_msg=key)


def test_multihost_pipe_still_refused():
    """'pipe' stays single-host (hand-built shard_map schedule over the
    local ring) — the guard must name the alternatives."""
    from unittest import mock

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import AcdcSISRTrainer

    with mock.patch("vsr_tpu.parallel.distributed.process_count",
                    return_value=2):
        with pytest.raises(NotImplementedError, match="pipe"):
            AcdcSISRTrainer(
                train_dataloader=None, valid_dataloader=None,
                net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                            num_features=8, upscale_factor=2),
                loss_fns=[L1Loss()], loss_weights=[1.0],
                metric_fns=[PSNR()], optimizer=Adam(lr=1e-3),
                lr_scheduler=None, logger=None, monitor=None, num_epochs=1,
                mesh_axes={"data": 4, "pipe": 2}, pipe_microbatches=2)


def test_multihost_mid_epoch_preemption_bitwise(mh_run):
    """SIGTERM lands on BOTH processes mid-epoch; the cluster votes a
    common stop batch, writes a step-granular preempt checkpoint, and the
    auto-resumed pair replays the interrupted epoch's tail — final params
    BITWISE equal to a never-interrupted 2-process run (round-4
    step-granular preemption x multi-host)."""
    import signal
    import time

    root, _saved, _logs = mh_run
    from vsr_tpu.utils.checkpoint import load_checkpoint

    def cfg_for(saved):
        # local_batch 2 -> 3 train batches/epoch: the preempt vote at
        # batch index 0 stops at steps_done=1 < 3 (a REAL mid-epoch cut).
        c = _config(root / "data", saved, local_batch=2, host_shard=True,
                    valid_batch=2)
        c["trainer"]["kwargs"]["num_epochs"] = 8
        c["main"]["auto_resume"] = True
        return c

    saved_u = root / "preempt_uninterrupted"
    _launch_pair(root, cfg_for(saved_u), "pre_u")

    # Interrupted pair: poll the logs for epoch 3, then SIGTERM both.
    saved_i = root / "preempt_interrupted"
    cfg = cfg_for(saved_i)
    cfg_path = root / "pre_i.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = dict(
            os.environ, JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COMPILATION_CACHE_DIR="/tmp/vsr_tpu_jax_cache_cpu_mh2",
            PYTHONPATH=str(REPO),
            VSR_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            VSR_NUM_PROCESSES="2", VSR_PROCESS_ID=str(pid),
        )
        out = open(root / f"pre_i_proc{pid}.log", "w")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vsr_tpu.main", str(cfg_path)],
            cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT))
    deadline = time.time() + 300
    while time.time() < deadline:
        texts = [(root / f"pre_i_proc{i}.log").read_text() for i in range(2)]
        if all("Epoch 3." in t for t in texts):
            break
        if any(p.poll() is not None for p in procs):
            break  # finished before we could interrupt (counted below)
        time.sleep(0.5)
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGTERM)
    codes = [p.wait(timeout=180) for p in procs]
    for f in outs:
        f.close()
    assert codes == [0, 0]
    ckpt = saved_i / "checkpoints" / "model_preempt.ckpt"
    assert ckpt.exists(), "run completed before the signal landed"
    _, aux = load_checkpoint(ckpt)
    # A signal mid-TRAIN-epoch stops at the next vote boundary (batch 0 ->
    # a mid-epoch cut); one landing in validation/epoch turnover produces
    # an epoch-boundary checkpoint — bitwise resume must hold either way.
    mid = bool(aux.get("mid_epoch"))

    # Auto-resume pair replays the tail and finishes epochs 1..8.
    logs = _launch_pair(root, cfg, "pre_i_resume")
    if mid:
        assert all("Mid-epoch resume" in t for t in logs)

    u_state, _ = load_checkpoint(saved_u / "checkpoints" / "model_8.ckpt")
    i_state, _ = load_checkpoint(saved_i / "checkpoints" / "model_8.ckpt")
    flat_u = jax_flatten(u_state["params"])
    flat_i = jax_flatten(i_state["params"])
    assert flat_u.keys() == flat_i.keys()
    for key in flat_u:
        np.testing.assert_array_equal(flat_i[key], flat_u[key], err_msg=key)


def test_expert_two_process_matches_single_process(mh_run, tmp_path):
    """2-process EXPERT-PARALLEL MoE training (mesh {'data': 2 across
    hosts, 'expert': 2 within each host}): exercises cross-host placement
    of the expert-stacked leaves (replicated over the process-spanning
    'data' axis, split over the local 'expert' axis), the collective
    checkpoint gather, and the batch-1 validation fallback. Final params
    must match a single-process run with the SAME mesh over the same
    data."""
    root, _saved, _logs = mh_run
    from vsr_tpu.utils.checkpoint import load_checkpoint

    moe_net = {"name": "MoEEDSRNet",
               "kwargs": {"in_channels": 1, "out_channels": 1,
                          "num_resblocks": 2, "num_features": 8,
                          "upscale_factor": 2, "num_experts": 2,
                          "group_size": 72, "moe_every": 2}}

    ep_saved = root / "ep_out"
    cfg = _config(root / "data", ep_saved, local_batch=6, host_shard=True,
                  valid_batch=1)
    cfg["net"] = moe_net
    cfg["trainer"]["kwargs"]["mesh_axes"] = {"data": 2, "expert": 2}
    _launch_pair(root, cfg, "ep")

    single_saved = tmp_path / "ep_single"
    from vsr_tpu.config import Config
    from vsr_tpu.main import run_train

    cfg1 = _config(root / "data", single_saved, local_batch=12,
                   host_shard=False, valid_batch=1)
    cfg1["net"] = moe_net
    cfg1["trainer"]["kwargs"]["mesh_axes"] = {"data": 2, "expert": 2}
    run_train(Config(cfg1))

    d_state, _ = load_checkpoint(ep_saved / "checkpoints" / "model_2.ckpt")
    s_state, _ = load_checkpoint(
        single_saved / "checkpoints" / "model_2.ckpt")
    flat_d = jax_flatten(d_state["params"])
    flat_s = jax_flatten(s_state["params"])
    assert flat_d.keys() == flat_s.keys()
    assert any("expert_" in k for k in flat_d)
    for key in flat_d:
        np.testing.assert_allclose(flat_d[key], flat_s[key], rtol=5e-4,
                                   atol=1e-5, err_msg=key)
    # The gathered checkpoint holds FULL-shaped expert stacks.
    for key, v in jax_flatten(d_state["opt_state"]).items():
        if "expert_wi" in key and v.ndim == 3:
            assert v.shape[0] == 2, key


def test_tensor_parallel_two_process_matches_plain_dp(mh_run):
    """2-process TENSOR-PARALLEL training (mesh {'data': 2 across hosts,
    'model': 2 within each host}): params + moments split their
    output-feature dims on every host; must train the same model as the
    plain 2-process DP run."""
    root, saved, _logs = mh_run
    from vsr_tpu.utils.checkpoint import load_checkpoint

    tp_saved = root / "tp_out"
    cfg = _config(root / "data", tp_saved, local_batch=6, host_shard=True,
                  valid_batch=1)
    cfg["trainer"]["kwargs"]["mesh_axes"] = {"data": 2, "model": 2}
    _launch_pair(root, cfg, "tp")

    dp_state, _ = load_checkpoint(saved / "checkpoints" / "model_2.ckpt")
    t_state, _ = load_checkpoint(tp_saved / "checkpoints" / "model_2.ckpt")
    flat_dp = jax_flatten(dp_state["params"])
    flat_t = jax_flatten(t_state["params"])
    assert flat_dp.keys() == flat_t.keys()
    for key in flat_dp:
        np.testing.assert_allclose(flat_t[key], flat_dp[key], rtol=5e-4,
                                   atol=1e-5, err_msg=key)


def test_sharded_ckpt_two_process_tp_roundtrip(mh_run):
    """2-process tensor-parallel training with ``sharded_ckpt: true``:
    every process writes only the param/moment shards it OWNS (replica 0
    of each index — the host-spanning 'data' axis replicates TP leaves, so
    process 1's file is mostly empty), restore pulls missing shards from
    the other process's file, and offline consolidation rebuilds a plain
    checkpoint that matches the plain-DP run."""
    root, saved, _logs = mh_run
    from vsr_tpu.utils.checkpoint import (consolidate_sharded_checkpoint,
                                          load_checkpoint)

    sh_saved = root / "sharded_tp_out"
    cfg = _config(root / "data", sh_saved, local_batch=6, host_shard=True,
                  valid_batch=1)
    cfg["trainer"]["kwargs"]["mesh_axes"] = {"data": 2, "model": 2}
    cfg["trainer"]["kwargs"]["sharded_ckpt"] = True
    _launch_pair(root, cfg, "sharded_tp")

    ckpt = sh_saved / "checkpoints" / "model_2.ckpt"
    assert ckpt.exists()
    for p in range(2):
        assert ckpt.with_name(ckpt.name + f".shard{p}").exists()

    # Offline consolidation (pure numpy) -> plain checkpoint == plain DP.
    consolidate_sharded_checkpoint(ckpt, root / "consolidated_tp.ckpt")
    c_state, c_aux = load_checkpoint(root / "consolidated_tp.ckpt")
    dp_state, _ = load_checkpoint(saved / "checkpoints" / "model_2.ckpt")
    flat_dp = jax_flatten(dp_state["params"])
    flat_c = jax_flatten(c_state["params"])
    assert flat_dp.keys() == flat_c.keys()
    for key in flat_dp:
        assert flat_c[key].shape == flat_dp[key].shape, key
        np.testing.assert_allclose(flat_c[key], flat_dp[key], rtol=5e-4,
                                   atol=1e-5, err_msg=key)
    assert c_aux["epoch"] == 2

    # Resume leg straight from the SHARDED checkpoint: each process
    # reassembles its placement (process 1 via the cross-file fallback).
    cfg["main"]["loaded_path"] = str(ckpt)
    cfg["trainer"]["kwargs"]["num_epochs"] = 3
    logs = _launch_pair(root, cfg, "sharded_tp_resume")
    assert all("Resume training." in t for t in logs)
    t0 = _parse_logs(logs[0], "Train log: ")
    assert len(t0) == 1 and np.isfinite(t0[0]["Loss"])
