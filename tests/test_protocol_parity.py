"""End-to-end protocol parity: the reference's OWN runner vs vsr_tpu.

VERDICT round-2 item #1 (the last unverified layer of the <=0.05 dB claim):
run ``/root/reference/src/main.py --test`` — the genuine reference code,
with functional shims for its missing deps (tests/_refharness.py) — and
``vsr_tpu.main`` test mode over the SAME mini-dataset files with
transplant-identical weights, then diff the per-frame results.csv rows and
the final log dicts. This pins the composed protocol: dataset pairing and
windowing, Normalize/ToTensor ordering, denormalize-then-metric (round,
clamp), Cardiac bbox cropping, per-frame CSV semantics, and T-weighted
log averaging (``acdc_vsr_predictor.py:119-170``, ``src/main.py:110-156``).

Tolerance: forward parity is <=5e-7 (test_ref_parity.py), but denormalize
ROUNDS to integer grey levels before the metrics — a pixel landing within
float-eps of a rounding boundary may round differently across frameworks,
moving a 24x24-frame PSNR by O(1e-3) dB. CSV values are therefore compared
with atol 5e-3 / rtol 1e-4 (raw losses, computed on unrounded floats, get
1e-5).
"""

from __future__ import annotations

import ast
import importlib
import logging
import pickle
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from tests._oracle import load_ref_net, torch11_grid_sample  # noqa: E402
from tests._refharness import (  # noqa: E402
    Box,
    _LogCapture,
    read_results_csv,
    run_reference_main,
)
from tests._transplant import (  # noqa: E402
    flax_leaf_order,
    perturb_variables,
    torch_leaf_order,
    transplant,
)
from tests.synth import make_processed_tree  # noqa: E402
from vsr_tpu.config import Config  # noqa: E402
from vsr_tpu.main import run_test  # noqa: E402
from vsr_tpu.utils.checkpoint import save_checkpoint  # noqa: E402

LOSSES = [
    {"name": "L1Loss", "weight": 1.0},
    {"name": "MSELoss", "weight": 0.1},
]
#: Per-family normalize stats — must match the reference's hard-coded
#: denormalize table (``src/utils.py:13-16``) so round-trips are exact.
STATS = {"Acdc": (54.089, 48.084), "Dsb15": (51.193, 52.671)}


def _normalize(family):
    mean, std = STATS[family]
    return [
        {"name": "Normalize", "kwargs": {"means": [mean], "stds": [std]}},
        {"name": "ToTensor"},
    ]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("protocol")
    make_processed_tree(root, types=("test",), patients_per_type=2, slices=2,
                        frames=6, hr_size=24, factors=(2,), seed=7)
    coords = {"patient001": (4, 20, 3, 21), "patient002": (2, 22, 5, 21)}
    (root / "cropped").mkdir()
    with open(root / "cropped" / "coordinates.pkl", "wb") as f:
        pickle.dump(coords, f)
    return root


def _metrics_cfg(tree):
    coords = str(tree / "cropped" / "coordinates.pkl")
    return [
        {"name": "PSNR"},
        {"name": "SSIM"},
        {"name": "CardiacPSNR", "kwargs": {"coordinates_path": coords}},
        {"name": "CardiacSSIM", "kwargs": {"coordinates_path": coords}},
    ]


def _make_checkpoints(tmp_path, net, tnet, example, run_fn, apply_kwargs=None):
    """Init the flax net, perturb, transplant into the torch net, and write
    both frameworks' checkpoint formats. Returns (our_ckpt, ref_ckpt)."""
    apply_kwargs = apply_kwargs or {}
    rng = np.random.default_rng(11)
    variables = net.init(jax.random.PRNGKey(0), example, **apply_kwargs)
    variables = perturb_variables(variables, rng)
    entries_f = flax_leaf_order(net, variables, example, **apply_kwargs)
    tnet = tnet.eval()
    with torch11_grid_sample():
        entries_t = torch_leaf_order(tnet, run_fn)
    transplant(variables, entries_f, entries_t)

    our_ckpt = tmp_path / "ours.ckpt"
    ref_ckpt = tmp_path / "ref.pth"
    save_checkpoint(our_ckpt, {"params": variables})
    torch.save({"net": tnet.state_dict()}, ref_ckpt)
    return our_ckpt, ref_ckpt


def _base_config(tree, tmp_path, which, dataset_cfg, net_cfg, predictor_name,
                 ckpt, predictor_extra=None):
    saved = tmp_path / f"{which}_out"
    return {
        "main": {"saved_dir": str(saved), "loaded_path": str(ckpt),
                 "random_seed": "vsr"},
        "dataset": dataset_cfg,
        "dataloader": {"name": "Dataloader",
                       "kwargs": {"batch_size": 1, "shuffle": False,
                                  "num_workers": 0}},
        "net": net_cfg,
        "losses": LOSSES,
        "metrics": _metrics_cfg(tree),
        "predictor": {"name": predictor_name,
                      "kwargs": {"saved_dir": str(saved), "exported": True,
                                 "device": "cpu",
                                 **(predictor_extra or {})}},
    }


def _run_both(tmp_path, ref_cfg, our_cfg):
    """Run the reference main (test branch) + vsr_tpu run_test; return
    ((ref_log, ref_csv), (our_log, our_csv))."""
    ref_path = tmp_path / "ref_config.yaml"
    with open(ref_path, "w") as f:
        yaml.safe_dump(ref_cfg, f)
    ref_log = run_reference_main(ref_path, test=True)
    ref_csv = read_results_csv(
        ref_cfg["predictor"]["kwargs"]["saved_dir"] + "/results.csv")

    our_config = Config(our_cfg)
    our_log = run_test(our_config)
    our_csv = read_results_csv(
        our_cfg["predictor"]["kwargs"]["saved_dir"] + "/results.csv")
    return (ref_log, ref_csv), (our_log, our_csv)


def _assert_csv_match(ref_csv, our_csv, n_metrics=4):
    ref_header, ref_names, ref_vals = ref_csv
    our_header, our_names, our_vals = our_csv
    assert our_header == ref_header
    assert our_names == ref_names
    assert our_vals.shape == ref_vals.shape
    # Non-degeneracy: a real random-weight run yields finite, row-varying
    # PSNR — guards against the comparison passing on constant/zero output.
    assert np.all(np.isfinite(ref_vals))
    assert np.std(ref_vals[:, 0]) > 1e-3
    # Metric columns: computed on rounded uint8 grey levels (see module doc).
    np.testing.assert_allclose(our_vals[:, :n_metrics], ref_vals[:, :n_metrics],
                               rtol=1e-4, atol=5e-3)
    # Loss columns: raw float pipeline, no rounding in between.
    np.testing.assert_allclose(our_vals[:, n_metrics:], ref_vals[:, n_metrics:],
                               rtol=1e-4, atol=1e-5)


def _assert_log_match(ref_log, our_log):
    assert set(our_log) == set(ref_log)
    for key in ref_log:
        np.testing.assert_allclose(
            our_log[key], ref_log[key], rtol=1e-4, atol=5e-3, err_msg=key)


@pytest.mark.parametrize("family", ["Acdc", "Dsb15"])
def test_sisr_protocol_parity(tree, tmp_path, family):
    """Parametrized over the Acdc/Dsb15 twins (byte-identical upstream
    except denormalize stats — ``dsb15_sisr_predictor.py``)."""
    from vsr_tpu.models import EDSRNet

    Ref = load_ref_net("src.model.nets.edsr_net", "EDSRNet")
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    tnet = Ref(1, 1, 2, 8, 2)
    example = jnp.zeros((1, 12, 12, 1), jnp.float32)
    our_ckpt, ref_ckpt = _make_checkpoints(
        tmp_path, net, tnet, example,
        lambda m: m(torch.zeros(1, 1, 12, 12)))

    dataset = {"name": f"{family}SISRDataset",
               "kwargs": {"data_dir": str(tree / "imgs"),
                          "downscale_factor": 2,
                          "transforms": _normalize(family)}}
    net_cfg = {"name": "EDSRNet",
               "kwargs": {"in_channels": 1, "out_channels": 1,
                          "num_resblocks": 2, "num_features": 8,
                          "upscale_factor": 2}}
    ref_cfg = _base_config(tree, tmp_path, "ref", dataset, net_cfg,
                           f"{family}SISRPredictor", ref_ckpt)
    our_cfg = _base_config(tree, tmp_path, "ours", dataset, net_cfg,
                           f"{family}SISRPredictor", our_ckpt)
    (ref_log, ref_csv), (our_log, our_csv) = _run_both(tmp_path, ref_cfg, our_cfg)

    assert len(ref_csv[1]) == 2 * 2 * 6  # patients x slices x frames
    _assert_csv_match(ref_csv, our_csv)
    _assert_log_match(ref_log, our_log)


@pytest.mark.parametrize("family", ["Acdc", "Dsb15"])
def test_misr_protocol_parity(tree, tmp_path, family):
    """Parametrized over the Acdc/Dsb15 twins (byte-identical upstream
    except denormalize stats — ``dsb15_misr_predictor.py``)."""
    from vsr_tpu.models import TOFlowNet

    Ref = load_ref_net("src.model.nets.toflow_net", "TOFlowNet")
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3,
                    upscale_factor=2)
    tnet = Ref(1, 1, 3, 2)
    example = jnp.zeros((1, 3, 12, 12, 1), jnp.float32)
    frames = [torch.zeros(1, 1, 12, 12) for _ in range(3)]
    our_ckpt, ref_ckpt = _make_checkpoints(
        tmp_path, net, tnet, example, lambda m: m(frames),
        apply_kwargs={"train": False})

    dataset = {"name": f"{family}MISRDataset",
               "kwargs": {"data_dir": str(tree / "videos"),
                          "downscale_factor": 2,
                          "transforms": _normalize(family),
                          "num_frames": 3, "temporal_order": "middle"}}
    net_cfg = {"name": "TOFlowNet",
               "kwargs": {"in_channels": 1, "out_channels": 1,
                          "num_frames": 3, "upscale_factor": 2}}
    ref_cfg = _base_config(tree, tmp_path, "ref", dataset, net_cfg,
                           f"{family}MISRPredictor", ref_ckpt)
    our_cfg = _base_config(tree, tmp_path, "ours", dataset, net_cfg,
                           f"{family}MISRPredictor", our_ckpt)
    (ref_log, ref_csv), (our_log, our_csv) = _run_both(tmp_path, ref_cfg, our_cfg)

    assert len(ref_csv[1]) == 2 * 2 * 6  # every (sequence, t) window
    _assert_csv_match(ref_csv, our_csv)
    _assert_log_match(ref_log, our_log)


@pytest.mark.parametrize("family", ["Acdc", "Dsb15"])
def test_vsr_protocol_parity(tree, tmp_path, family):
    """Parametrized over the Acdc/Dsb15 twins: the reference pairs are
    byte-identical except for the denormalize stats (``src/utils.py:13-16``,
    ``dsb15_vsr_predictor.py:29``), so this pins every reference-named
    dataset/predictor surface against its own oracle."""
    from vsr_tpu.models import DRFNet

    Ref = load_ref_net("src.model.nets.drf_net", "DRFNet")
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=2,
                 upscale_factor=2)
    tnet = Ref(1, 1, 8, 2, 2)
    example = jnp.zeros((1, 6, 12, 12, 1), jnp.float32)
    frames = [torch.zeros(1, 1, 12, 12) for _ in range(6)]
    our_ckpt, ref_ckpt = _make_checkpoints(
        tmp_path, net, tnet, example, lambda m: m(frames))

    dataset = {"name": f"{family}VSRDataset",
               "kwargs": {"data_dir": str(tree / "videos"),
                          "downscale_factor": 2,
                          "transforms": _normalize(family),
                          "num_frames": 5}}
    net_cfg = {"name": "DRFNet",
               "kwargs": {"in_channels": 1, "out_channels": 1,
                          "num_features": 8, "num_groups": 2,
                          "upscale_factor": 2}}
    ref_cfg = _base_config(tree, tmp_path, "ref", dataset, net_cfg,
                           f"{family}VSRPredictor", ref_ckpt)
    # t_bucket=4 forces real end-padding of the T=6 sequences through the
    # bucketed eval path — parity must hold through the padding machinery.
    our_cfg = _base_config(tree, tmp_path, "ours", dataset, net_cfg,
                           f"{family}VSRPredictor", our_ckpt,
                           predictor_extra={"t_bucket": 4})
    (ref_log, ref_csv), (our_log, our_csv) = _run_both(tmp_path, ref_cfg, our_cfg)

    assert len(ref_csv[1]) == 2 * 2 * 6  # per-frame rows for each sequence
    _assert_csv_match(ref_csv, our_csv)
    _assert_log_match(ref_log, our_log)


# --------------------------------------------------------------------------
# Trainer-side protocol parity: N epochs of the reference's OWN BaseTrainer
# stack (real AcdcSISRTrainer + Monitor + AcdcSISRLogger + torch Adam) vs N
# epochs of ours, from transplant-identical weights over the same files in
# the same batch order (shuffle off, no random augments). Loss curves and
# epoch metrics must agree — this pins the training step semantics: loss
# weighting, optimizer update, denormalized metrics, epoch-mean accumulation
# (``base_trainer.py:99-144``).
# --------------------------------------------------------------------------


def _parse_logs(lines, tag):
    return [ast.literal_eval(l[len(tag):].rstrip("."))
            for l in lines if l.startswith(tag)]


@pytest.fixture(scope="module")
def train_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_protocol")
    # 12 samples per split; batch 4 -> even batches (the reference weights
    # its running log by the CONFIGURED batch size, so ragged last batches
    # would compare its quirk rather than the protocol).
    make_processed_tree(root, types=("train", "valid"), patients_per_type=2,
                        slices=1, frames=6, hr_size=24, factors=(2,), seed=3)
    return root


@pytest.mark.parametrize("family", ["Acdc", "Dsb15"])
def test_train_protocol_parity(train_tree, tmp_path, family):
    """Parametrized over the Acdc/Dsb15 trainer+logger twins (which differ
    only in denormalize stats — ``dsb15_sisr_trainer.py:13``)."""
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.registry import build

    num_epochs = 2
    mean, std = STATS[family]
    Ref = load_ref_net("src.model.nets.edsr_net", "EDSRNet")
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    tnet = Ref(1, 1, 2, 8, 2)
    example = jnp.zeros((1, 12, 12, 1), jnp.float32)
    rng = np.random.default_rng(23)
    variables = net.init(jax.random.PRNGKey(0), example)
    variables = perturb_variables(variables, rng)
    entries_f = flax_leaf_order(net, variables, example)
    entries_t = torch_leaf_order(tnet.eval(), lambda m: m(torch.zeros(1, 1, 12, 12)))
    transplant(variables, entries_f, entries_t)

    # ---------------- reference side: its real trainer/monitor/logger stack
    ds_mod = importlib.import_module("src.data.datasets")
    dl_mod = importlib.import_module("src.data.dataloader")
    tr_mod = importlib.import_module("src.runner.trainers")
    lg_mod = importlib.import_module("src.callbacks.loggers")
    mon_mod = importlib.import_module("src.callbacks.monitor")

    transforms = [Box({"name": "Normalize",
                       "kwargs": {"means": [mean], "stds": [std]}}),
                  Box({"name": "ToTensor"})]

    def ref_loader(split):
        # augments=[] (not None): the reference defaults augments to a bare
        # ToTensor, which would feed tensors into Normalize; an empty
        # Compose keeps train batches deterministic AND numpy.
        ds = ds_mod.AcdcSISRDataset(
            data_dir=Path(train_tree / "imgs"), type=split,
            downscale_factor=2, transforms=transforms, augments=[])
        assert len(ds) == 12
        return dl_mod.Dataloader(ds, batch_size=4, shuffle=False, num_workers=0)

    ref_trainer = getattr(tr_mod, f"{family}SISRTrainer")(
        device=torch.device("cpu"),
        train_dataloader=ref_loader("train"),
        valid_dataloader=ref_loader("valid"),
        net=tnet,
        loss_fns=[torch.nn.L1Loss(), torch.nn.MSELoss()],
        loss_weights=[1.0, 0.1],
        metric_fns=[importlib.import_module("src.model.metrics").PSNR()],
        optimizer=torch.optim.Adam(tnet.parameters(), lr=1e-3),
        lr_scheduler=None,
        logger=getattr(lg_mod, f"{family}SISRLogger")(
            log_dir=tmp_path / "ref_log", net=tnet,
            dummy_input=torch.randn(1, 1, 12, 12)),
        monitor=mon_mod.Monitor(
            checkpoints_dir=tmp_path / "ref_ckpt", mode="min", target="Loss",
            saved_freq=1, early_stop=0),
        num_epochs=num_epochs,
    )
    capture = _LogCapture()
    root_logger = logging.getLogger()
    root_logger.addHandler(capture)
    old_level = root_logger.level
    root_logger.setLevel(logging.INFO)
    try:
        with torch11_grid_sample():
            ref_trainer.train()
    finally:
        root_logger.removeHandler(capture)
        root_logger.setLevel(old_level)
    ref_train_logs = _parse_logs(capture.lines, "Train log: ")
    ref_valid_logs = _parse_logs(capture.lines, "Valid log: ")
    assert len(ref_train_logs) == num_epochs

    # ---------------- vsr_tpu side, identical weights / batches / hparams
    def our_loader(split, shuffle=False):
        ds = build("dataset", {
            "name": "AcdcSISRDataset",
            "kwargs": {"data_dir": str(train_tree / "imgs"),
                       "downscale_factor": 2,
                       "transforms": [dict(t) for t in transforms],
                       "augments": []},
        }, type=split)
        return build("loader", {"name": "Dataloader",
                                "kwargs": {"batch_size": 4, "shuffle": shuffle,
                                           "num_workers": 0}}, ds)

    our_trainer = build(
        "trainer", {"name": f"{family}SISRTrainer",
                    "kwargs": {"num_epochs": num_epochs}},
        train_dataloader=our_loader("train"),
        valid_dataloader=our_loader("valid"),
        net=net,
        loss_fns=[build("loss", {"name": "L1Loss"}),
                  build("loss", {"name": "MSELoss"})],
        loss_weights=[1.0, 0.1],
        metric_fns=[build("metric", {"name": "PSNR"})],
        optimizer=build("optimizer", {"name": "Adam", "kwargs": {"lr": 1e-3}}),
        lr_scheduler=None,
        logger=build("logger", {"name": f"{family}SISRLogger"},
                     log_dir=tmp_path / "our_log"),
        monitor=build("monitor", {"name": "Monitor",
                                  "kwargs": {"mode": "min", "target": "Loss",
                                             "saved_freq": 1}},
                      checkpoints_dir=tmp_path / "our_ckpt"),
    )
    our_trainer._ensure_initialized()
    our_trainer.params = jax.tree_util.tree_map(jnp.asarray, variables)
    our_trainer.opt_state = our_trainer.tx.init(our_trainer.params["params"])

    capture2 = _LogCapture()
    root_logger.addHandler(capture2)
    root_logger.setLevel(logging.INFO)
    try:
        our_trainer.train()
    finally:
        root_logger.removeHandler(capture2)
        root_logger.setLevel(old_level)
    our_train_logs = _parse_logs(capture2.lines, "Train log: ")
    our_valid_logs = _parse_logs(capture2.lines, "Valid log: ")
    assert len(our_train_logs) == num_epochs

    for e in range(num_epochs):
        for ref_log, our_log, which in [
            (ref_train_logs[e], our_train_logs[e], "train"),
            (ref_valid_logs[e], our_valid_logs[e], "valid"),
        ]:
            assert set(our_log) == set(ref_log)
            for key in ref_log:
                np.testing.assert_allclose(
                    our_log[key], ref_log[key], rtol=2e-3, atol=2e-3,
                    err_msg=f"epoch {e + 1} {which} {key}")
    # The training actually moved: epoch-2 train loss improved on epoch-1.
    assert our_train_logs[1]["Loss"] < our_train_logs[0]["Loss"]
