"""Config-driven train/test CLI.

Usage parity with the reference (``python -m src.main <config.yaml>
[--test]`` -> ``python -m vsr_tpu.main <config.yaml> [--test]``), with the
same YAML section schema (``main / dataset / dataloader / net / losses /
metrics / optimizer / [lr_scheduler] / logger / monitor / trainer|
predictor``) resolved through the registries instead of module reflection
(see ``registry.py``; reference ``_get_instance`` at ``main.py:167-178``).

The torch.nn loss-name fallback (``main.py:60-65``) is preserved by
registering the torch built-in loss names natively in ``vsr_tpu.losses``.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from vsr_tpu.config import load_config, save_config
from vsr_tpu.registry import build

# Importing these modules populates the registries.
import vsr_tpu.data.datasets  # noqa: F401
import vsr_tpu.data.transforms  # noqa: F401
import vsr_tpu.data.loader  # noqa: F401
import vsr_tpu.losses  # noqa: F401
import vsr_tpu.metrics  # noqa: F401
import vsr_tpu.models  # noqa: F401
import vsr_tpu.optim  # noqa: F401
import vsr_tpu.callbacks.logger  # noqa: F401
import vsr_tpu.callbacks.monitor  # noqa: F401
import vsr_tpu.runner.trainers  # noqa: F401
import vsr_tpu.runner.predictors  # noqa: F401


def build_net(config):
    """Build the net; YAML 'dtype' strings (e.g. 'bfloat16') become jnp
    dtypes so mixed-precision compute is config-selectable."""
    spec = {"name": config.net.name, "kwargs": dict(config.net.get("kwargs") or {})}
    dtype = spec["kwargs"].get("dtype")
    if isinstance(dtype, str):
        import jax.numpy as jnp

        named = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}
        spec["kwargs"]["dtype"] = named[dtype]
    return build("net", spec)


def build_losses(config):
    loss_fns, loss_weights = [], []
    for spec in config.losses:
        loss_fns.append(build("loss", spec))
        loss_weights.append(spec.get("weight", 1.0))
    return loss_fns, loss_weights


def build_metrics(config):
    return [build("metric", spec) for spec in config.metrics]


def run_train(config) -> None:
    saved_dir = Path(config.main.saved_dir)
    saved_dir.mkdir(parents=True, exist_ok=True)
    save_config(config, saved_dir / "config.yaml")

    logging.info("Create the training and validation datasets.")
    train_dataset = build("dataset", config.dataset, type="train")
    valid_dataset = build("dataset", config.dataset, type="valid")

    logging.info("Create the training and validation dataloaders.")
    dl_kwargs = dict(config.dataloader.get("kwargs") or {})
    train_bs = dl_kwargs.pop("train_batch_size")
    valid_bs = dl_kwargs.pop("valid_batch_size")
    # Dataset classes may define a custom collate_fn (main.py:48-50 parity).
    from vsr_tpu.registry import get_class

    collate_fn = getattr(get_class("dataset", config.dataset.name), "collate_fn", None)
    if collate_fn is not None:
        dl_kwargs.setdefault("collate_fn", collate_fn)
    train_loader = build(
        "loader", {"name": config.dataloader.name, "kwargs": dl_kwargs},
        train_dataset, batch_size=train_bs,
    )
    valid_kwargs = {**dl_kwargs, "shuffle": False}
    valid_loader = build(
        "loader", {"name": config.dataloader.name, "kwargs": valid_kwargs},
        valid_dataset, batch_size=valid_bs,
    )

    logging.info("Create the network architecture.")
    net = build_net(config)

    logging.info("Create the loss functions and the metric functions.")
    loss_fns, loss_weights = build_losses(config)
    metric_fns = build_metrics(config)

    logging.info("Create the optimizer.")
    optimizer = build("optimizer", config.optimizer)

    lr_scheduler = None
    if config.get("lr_scheduler"):
        logging.info("Create the learning rate scheduler.")
        lr_scheduler = build("lr_scheduler", config.lr_scheduler)

    logging.info("Create the logger.")
    logger = build("logger", config.logger, log_dir=saved_dir / "log")

    logging.info("Create the monitor.")
    monitor = build("monitor", config.monitor, checkpoints_dir=saved_dir / "checkpoints")

    logging.info("Create the trainer.")
    trainer = build(
        "trainer",
        config.trainer,
        train_dataloader=train_loader,
        valid_dataloader=valid_loader,
        net=net,
        loss_fns=loss_fns,
        loss_weights=loss_weights,
        metric_fns=metric_fns,
        optimizer=optimizer,
        lr_scheduler=lr_scheduler,
        logger=logger,
        monitor=monitor,
        random_seed=config.main.get("random_seed", "vsr"),
    )

    loaded_path = config.main.get("loaded_path")
    if not loaded_path and config.main.get("auto_resume"):
        from vsr_tpu.utils.recovery import find_latest_checkpoint

        found = find_latest_checkpoint(saved_dir / "checkpoints")
        if found:
            loaded_path = str(found)
            logging.info(f'Auto-resume found checkpoint "{loaded_path}".')
    if loaded_path:
        logging.info(f'Load the previous checkpoint from "{loaded_path}".')
        trainer.load(Path(loaded_path))
        logging.info("Resume training.")
    else:
        logging.info("Start training.")
    trainer.train()
    logging.info("End training.")


def run_test(config) -> dict:
    logging.info("Create the testing dataset and dataloader.")
    test_dataset = build("dataset", config.dataset, type="test")
    dl_kwargs = dict(config.dataloader.get("kwargs") or {})
    dl_kwargs.pop("train_batch_size", None)
    dl_kwargs.pop("valid_batch_size", None)
    dl_kwargs.setdefault("batch_size", 1)
    test_loader = build(
        "loader", {"name": config.dataloader.name, "kwargs": dl_kwargs}, test_dataset
    )

    logging.info("Create the network architecture.")
    net = build_net(config)

    loss_fns, loss_weights = build_losses(config)
    metric_fns = build_metrics(config)

    logging.info("Create the predictor.")
    predictor = build(
        "predictor",
        config.predictor,
        test_dataloader=test_loader,
        net=net,
        loss_fns=loss_fns,
        loss_weights=loss_weights,
        metric_fns=metric_fns,
    )

    if config.net.name != "Bicubic":
        logging.info(f'Load the previous checkpoint from "{config.main.loaded_path}".')
        predictor.load(Path(config.main.loaded_path))
    logging.info("Start testing.")
    return predictor.predict()
    logging.info("End testing.")


def main() -> None:
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    parser = argparse.ArgumentParser(description="The script for the training and the testing.")
    parser.add_argument("config_path", type=Path, help="The path of the config file.")
    parser.add_argument("--test", action="store_true", help="Perform testing instead of training.")
    args = parser.parse_args()

    config = load_config(args.config_path)
    logging.info(f'Loaded the config from "{args.config_path}".')

    # Multi-host: connect the processes BEFORE any computation so every
    # mesh below spans the full device set (config `main.distributed`,
    # overridable per process via VSR_COORDINATOR_ADDRESS /
    # VSR_NUM_PROCESSES / VSR_PROCESS_ID — see parallel/distributed.py).
    from vsr_tpu.parallel.distributed import initialize_from_config

    initialize_from_config(config.main.get("distributed"))

    if args.test:
        run_test(config)
    else:
        run_train(config)


if __name__ == "__main__":
    main()
