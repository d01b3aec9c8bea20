"""Tensor ('model'-axis) parallelism: params sharded over the mesh.

The reference is single-GPU (SURVEY.md §2.9); the 'model' axis is this
framework's parameter-sharding capability (vsr_tpu/parallel/tp.py):
output-feature dims of conv kernels / biases / optimizer moments split
across the axis (Megatron-style column sharding as GSPMD annotations), and
the partitioned step must match the single-device step within float
tolerance. Runs on the 8 virtual CPU devices from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.parallel.mesh import make_mesh
from vsr_tpu.parallel.tp import (model_partition_specs, model_spec,
                                 shard_model_params)
from vsr_tpu.runner.trainers import AcdcSISRTrainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _params_close(a, b, **tol):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **tol)


def _make(net, mesh_axes):
    return AcdcSISRTrainer(
        train_dataloader=None, valid_dataloader=None, net=net,
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None, monitor=None,
        num_epochs=1, mesh_axes=mesh_axes,
    )


def _run_steps(trainer, batch, n_steps, sharded):
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    if sharded and "model" in trainer.mesh.shape:
        trainer.params = shard_model_params(trainer.params, trainer.mesh)
        trainer.opt_state = shard_model_params(trainer.opt_state, trainer.mesh)
    step = trainer._dp_train_step if sharded else trainer._train_step
    scalars = None
    for _ in range(n_steps):
        if sharded:
            trainer.params, trainer.opt_state, scalars, _ = step(
                trainer.params, trainer.opt_state, inputs, targets)
        else:
            trainer.params, trainer.opt_state, scalars, _ = step(
                trainer.params, trainer.opt_state, inputs, targets,
                training=True)
    return trainer.params, {k: float(v) for k, v in scalars.items()}


def _net():
    return EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                   num_features=8, upscale_factor=2)


def _batch(rng, n=4):
    return {
        "lr_img": rng.standard_normal((n, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((n, 16, 16, 1)).astype(np.float32),
        "index": np.arange(n),
    }


def test_model_spec_shape_rule():
    mesh = make_mesh({"model": 2}, devices=jax.devices()[:2])
    # Conv kernel (kh, kw, cin, cout): shard cout.
    assert model_spec((3, 3, 4, 8), 2) == P(None, None, None, "model")
    # Bias / PReLU alpha: shard the channel dim.
    assert model_spec((8,), 2) == P("model")
    # Narrow tail (cout=1), scalars, non-divisible: replicated.
    assert model_spec((3, 3, 8, 1), 2) == P()
    assert model_spec((), 2) == P()
    assert model_spec((3, 3, 4, 7), 2) == P()
    # Axis of size 1 (or absent): everything replicated.
    assert model_spec((3, 3, 4, 8), 1) == P()

    net = _net()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    specs = jax.tree_util.tree_leaves(
        model_partition_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P))
    assert any(s == P(None, None, None, "model") for s in specs)
    assert any(s == P() for s in specs)  # the cout=1 tail stays replicated


def test_trainer_data_x_model_matches_single_device():
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    sharded = _make(_net(), {"data": 2, "model": 2})
    assert "model" in sharded.mesh.shape
    p_s, s_s = _run_steps(sharded, batch, 3, sharded=True)

    single = _make(_net(), None)
    p_u, s_u = _run_steps(single, batch, 3, sharded=False)

    for k in s_u:
        np.testing.assert_allclose(s_s[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    _params_close(p_s, p_u, rtol=5e-4, atol=1e-5)


def test_spatial_x_model_mesh_is_rejected():
    """jax 0.9.0's SPMD partitioner miscompiles spatially-partitioned convs
    with feature-sharded kernels (scripts/repro_spmd_spatial_model_conv.py),
    so the trainer and the serving pipeline must refuse such meshes instead
    of training/serving wrong numerics."""
    with pytest.raises(NotImplementedError, match="spatial"):
        _make(_net(), {"data": 2, "spatial": 2, "model": 2})

    from vsr_tpu.infer import make_pipeline

    net = _net()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    mesh = make_mesh({"spatial": 2, "model": 2}, devices=jax.devices()[:4])
    with pytest.raises(NotImplementedError, match="spatial"):
        make_pipeline(net, params, 2, "acdc", mesh=mesh)


def test_model_sharded_params_are_actually_split():
    """The 'model' axis must reduce per-device parameter bytes — sharded
    kernels place half their cout per device on a 2-way axis."""
    mesh = make_mesh({"model": 2}, devices=jax.devices()[:2])
    net = _net()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    sharded = shard_model_params(params, mesh)
    kernel = sharded["params"]["_ResBlock_0"]["Conv_0"]["Conv_0"]["kernel"]
    assert kernel.shape == (3, 3, 8, 8)
    shard_shapes = {s.data.shape for s in kernel.addressable_shards}
    assert shard_shapes == {(3, 3, 8, 4)}


def test_tensor_parallel_serving_matches_single_device():
    from vsr_tpu.infer import make_pipeline

    net = _net()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    frames = np.asarray(
        np.random.default_rng(2).random((5, 24, 24)) * 255, np.float32)

    lr_u, sr_u = jax.jit(make_pipeline(net, params, 2, "acdc"))(frames)

    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    pipe = make_pipeline(net, params, 2, "acdc", mesh=mesh)
    lr_s, sr_s = pipe(frames)  # N=5 also exercises the pad/slice path
    np.testing.assert_allclose(np.asarray(lr_s), np.asarray(lr_u),
                               rtol=1e-5, atol=1e-4)
    # uint8-valued outputs: partial-sum reassociation may flip values that
    # sit within float eps of a rounding boundary.
    diff = np.abs(np.asarray(sr_s, np.float32) - np.asarray(sr_u, np.float32))
    assert (diff > 1).mean() == 0.0
