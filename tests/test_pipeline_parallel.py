"""Pipeline ('pipe'-axis) parallelism: GPipe schedule over mesh stages.

The reference is single-GPU (SURVEY.md §2.9); vsr_tpu/parallel/pipeline.py
cuts the EDSR resblock chain into P stages streamed with ppermute. The
pipelined forward/train step must match the sequential net within float
tolerance, and the param split/merge must round-trip exactly. Runs on the
8 virtual CPU devices from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import EDSRNet
from vsr_tpu.models.vol3d import Volume3DSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.parallel.mesh import make_mesh
from vsr_tpu.parallel.pipeline import (chain_spec, make_pipelined_apply,
                                       make_pipelined_train_step,
                                       merge_edsr_params,
                                       merge_vol3d_params, split_edsr_params,
                                       split_vol3d_params)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _net(num_resblocks=4):
    return EDSRNet(in_channels=1, out_channels=1,
                   num_resblocks=num_resblocks, num_features=8,
                   upscale_factor=2)


def _init(net, n=4, h=8):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, h, h, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    return params, x


def test_split_merge_roundtrip():
    net = _net()
    params, _ = _init(net)
    merged = merge_edsr_params(*split_edsr_params(params, net.num_resblocks))
    ref = jax.tree_util.tree_leaves_with_path(params)
    got = dict(jax.tree_util.tree_leaves_with_path(merged))
    assert len(ref) == len(got)
    for path, leaf in ref:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(got[path]))


@pytest.mark.parametrize("stages,microbatches", [(4, 2), (2, 4), (1, 1)])
def test_pipelined_forward_matches_sequential(stages, microbatches):
    net = _net(num_resblocks=4)
    params, x = _init(net)
    ref = net.apply(params, x)
    mesh = make_mesh({"pipe": stages}, devices=jax.devices()[:stages])
    apply = make_pipelined_apply(net, mesh, microbatches)
    out = jax.jit(apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("upscale", [2, 4])
def test_vol3d_split_merge_roundtrip(upscale):
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=4,
                        num_features=8, upscale_factor=upscale)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    merged = merge_vol3d_params(
        *split_vol3d_params(params, net.num_resblocks))
    ref = jax.tree_util.tree_leaves_with_path(params)
    got = dict(jax.tree_util.tree_leaves_with_path(merged))
    assert len(ref) == len(got)
    for path, leaf in ref:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(got[path]))


def test_vol3d_pipelined_forward_matches_sequential():
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=4,
                        num_features=8, upscale_factor=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 3, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(params, x)
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    out = jax.jit(make_pipelined_apply(net, mesh, 2))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vol3d_pipelined_train_step_matches_sequential():
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=4,
                        num_features=8, upscale_factor=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 3, 8, 8, 1)), jnp.float32)
    targets = jnp.asarray(rng.standard_normal((4, 3, 16, 16, 1)),
                          jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    loss_fn = lambda out, tgt: jnp.abs(out - tgt).mean()
    tx = Adam(lr=1e-3)
    opt = tx.init(params["params"])

    @jax.jit
    def seq_step(p, o):
        l, g = jax.value_and_grad(
            lambda p: loss_fn(net.apply(p, x), targets))(p)
        import optax
        upd, o2 = tx.update(g["params"], o, p["params"])
        return {**p, "params": optax.apply_updates(p["params"], upd)}, o2, l

    p_ref, o_ref, l_ref = seq_step(params, opt)
    mesh = make_mesh({"data": 2, "pipe": 4})
    step = make_pipelined_train_step(net, mesh, tx, 2, loss_fn)
    p, o, l = step(params, opt, x, targets)
    np.testing.assert_allclose(float(l), float(l_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_pipelined_forward_data_x_pipe():
    """{'data': 2, 'pipe': 4}: each data row runs its own pipeline over its
    batch shard."""
    net = _net(num_resblocks=4)
    params, x = _init(net, n=8)
    ref = net.apply(params, x)
    mesh = make_mesh({"data": 2, "pipe": 4})
    apply = make_pipelined_apply(net, mesh, 2)
    out = jax.jit(apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_train_step_matches_sequential():
    net = _net(num_resblocks=4)
    params, x = _init(net)
    targets = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 16, 16, 1)), jnp.float32)
    loss_fn = lambda out, tgt: jnp.abs(out - tgt).mean()

    tx = Adam(lr=1e-3)
    opt = tx.init(params["params"])
    p_ref, o_ref = params, opt
    losses_ref = []
    @jax.jit
    def seq_step(p, o):
        def loss(p):
            return loss_fn(net.apply(p, x), targets)
        l, g = jax.value_and_grad(loss)(p)
        import optax
        upd, o2 = tx.update(g["params"], o, p["params"])
        return {**p, "params": optax.apply_updates(p["params"], upd)}, o2, l
    for _ in range(3):
        p_ref, o_ref, l = seq_step(p_ref, o_ref)
        losses_ref.append(float(l))

    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    step = make_pipelined_train_step(net, mesh, tx, 2, loss_fn)
    p, o = params, opt
    losses = []
    for _ in range(3):
        p, o, l = step(p, o, x, targets)
        losses.append(float(l))

    np.testing.assert_allclose(losses, losses_ref, rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_trainer_data_x_pipe_matches_single_device():
    """mesh_axes={'data': 2, 'pipe': 4} through the real trainer step (the
    config-driven path): scalars and updated params match single-device."""
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.runner.trainers import AcdcSISRTrainer

    def make(mesh_axes):
        kw = {"pipe_microbatches": 2} if mesh_axes else {}
        return AcdcSISRTrainer(
            train_dataloader=None, valid_dataloader=None, net=_net(4),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, mesh_axes=mesh_axes, **kw)

    rng = np.random.default_rng(3)
    batch = {
        "lr_img": rng.standard_normal((4, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((4, 16, 16, 1)).astype(np.float32),
        "index": np.arange(4),
    }

    def run(trainer, n_steps, sharded):
        inputs, targets = trainer._get_inputs_targets(batch)
        trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
        trainer.opt_state = trainer.tx.init(trainer.params["params"])
        scalars = None
        for _ in range(n_steps):
            if sharded:
                trainer.params, trainer.opt_state, scalars, _ = \
                    trainer._dp_train_step(trainer.params, trainer.opt_state,
                                           inputs, targets)
            else:
                trainer.params, trainer.opt_state, scalars, _ = \
                    trainer._train_step(trainer.params, trainer.opt_state,
                                        inputs, targets, training=True)
        return trainer.params, {k: float(v) for k, v in scalars.items()}

    p_s, s_s = run(make({"data": 2, "pipe": 4}), 3, sharded=True)
    p_u, s_u = run(make(None), 3, sharded=False)
    for k in s_u:
        np.testing.assert_allclose(s_s[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_trainer_pipe_guards():
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models.frvsr import FRVSRNet
    from vsr_tpu.runner.trainers import AcdcSISRTrainer

    def make(net, mesh_axes):
        return AcdcSISRTrainer(
            train_dataloader=None, valid_dataloader=None, net=net,
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, mesh_axes=mesh_axes)

    with pytest.raises(NotImplementedError, match="pipe"):
        make(_net(4), {"pipe": 2, "model": 2})
    with pytest.raises(NotImplementedError, match="EDSR"):
        make(FRVSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                      upscale_factor=2), {"pipe": 2})
    # Training batches that cannot engage the pipeline fail LOUDLY (eval
    # batches fall back to the sequential apply instead).
    tr = make(_net(4), {"pipe": 4})
    tr.params = tr.net.init(jax.random.PRNGKey(0),
                            jnp.zeros((4, 8, 8, 1)))
    bad_in = jnp.zeros((3, 8, 8, 1))
    with pytest.raises(ValueError, match="cannot engage"):
        tr._apply(tr.params, bad_in, training=True)
    out, _ = tr._apply(tr.params, bad_in, training=False)  # eval: fine
    assert out.shape == (3, 16, 16, 1)


def test_validation_errors():
    net = _net(num_resblocks=4)
    mesh = make_mesh({"pipe": 8})
    with pytest.raises(ValueError, match="does not split"):
        make_pipelined_apply(net, mesh, 2)
    mesh4 = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    apply = make_pipelined_apply(_net(4), mesh4, 3)
    params, x = _init(_net(4), n=4)
    with pytest.raises(ValueError, match="not divisible"):
        jax.jit(apply)(params, x)
