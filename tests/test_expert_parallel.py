"""Mixture-of-Experts SR (models/moe.py) + expert parallelism (parallel/ep.py).

The reference framework has no MoE and no parallelism (SURVEY.md §2.9;
its widest capacity knob is ``num_features``,
``/root/reference/src/model/nets/edsr_net.py:19``). This is new
capability: expert-choice routed FFN blocks on the EDSR trunk, with the
expert stacks sharded over an ``'expert'`` mesh axis — each device
computes its own experts and the combine is all-reduced over the axis
(the compiled schedule, pinned below). Sharded math must equal the
unsharded step; expert leaves must actually be split and STAY split.
Runs on the 8 virtual CPU devices from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import MoEEDSRNet
from vsr_tpu.models.moe import ExpertChoiceMoE
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import AcdcSISRTrainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _net(**kw):
    kw.setdefault("num_experts", 4)
    kw.setdefault("group_size", 64)
    return MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                      num_features=8, upscale_factor=2, **kw)


def _make(mesh_axes, net=None, **kw):
    return AcdcSISRTrainer(
        train_dataloader=None, valid_dataloader=None,
        net=net if net is not None else _net(),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=None, num_epochs=1, mesh_axes=mesh_axes, **kw)


def _batch(n=8):
    rng = np.random.default_rng(0)
    return {
        "lr_img": rng.standard_normal((n, 8, 8, 1)).astype(np.float32),
        "hr_img": rng.standard_normal((n, 16, 16, 1)).astype(np.float32),
        "index": np.arange(n),
    }


def _run(trainer, n_steps, sharded):
    batch = _batch()
    inputs, targets = trainer._get_inputs_targets(batch)
    trainer.params = trainer.net.init(jax.random.PRNGKey(0), inputs)
    trainer.opt_state = trainer.tx.init(trainer.params["params"])
    trainer._place_state()
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
    return trainer, {k: float(v) for k, v in scalars.items()}


# ------------------------------------------------------------- model


def test_moe_forward_shape_and_finite():
    net = _net()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 1)),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_moe_batch_invariance():
    """Per-image token groups: an image's output must not depend on its
    batch mates (routing never crosses images)."""
    net = _net()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    x2 = jnp.concatenate([x[:1], x[1:] * 3.0], axis=0)
    y2 = net.apply(params, x2)
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(y2[0]))


def test_moe_nondivisible_tokens_padded():
    """Arbitrary geometries: token counts that don't divide group_size run
    through the masked-padding path (padded slots get zero affinity, so
    real tokens always win the top-k) and stay batch-invariant."""
    net = _net(group_size=48)  # 48 does not divide 8*8=64 -> pad 32
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(y)).all()
    y2 = net.apply(params, jnp.concatenate([x[:1], x[1:] * 3.0], axis=0))
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(y2[0]))


def test_moe_single_expert_runs():
    net = _net(num_experts=1, capacity_factor=1.0)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 8, 1)),
                    jnp.float32)
    y = net.apply(net.init(jax.random.PRNGKey(0), x), x)
    assert np.isfinite(np.asarray(y)).all()


def test_moe_expert_params_update():
    """Router AND expert stacks receive gradient through the top-k
    dispatch (gate weights carry it)."""
    t, _ = _run(_make(None), 1, sharded=False)
    fresh = _net().init(
        jax.random.PRNGKey(0),
        jnp.zeros((8, 8, 8, 1), jnp.float32))
    moved = {"router": False, "expert_wi": False}
    flat = jax.tree_util.tree_leaves_with_path(t.params)
    fresh_flat = dict(jax.tree_util.tree_leaves_with_path(fresh))
    for path, leaf in flat:
        name = str(path[-1])
        for key in moved:
            if key in name and not np.array_equal(
                    np.asarray(leaf), np.asarray(fresh_flat[tuple(path)])):
                moved[key] = True
    assert all(moved.values()), moved


def test_moe_rank_router_equals_sort_router():
    """The rank (pairwise-comparison) router must reproduce the sort
    (lax.top_k) router bitwise — same selection, same slot order, same
    stable tie-break — on random AND tie-heavy affinities, for outputs
    and gradients."""
    rng = np.random.default_rng(5)
    x_rand = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
    # Quantized inputs make duplicate affinities likely (tie exercise).
    x_tied = jnp.asarray(
        np.round(rng.standard_normal((2, 8, 8, 6)) * 2) / 2, jnp.float32)
    for x in (x_rand, x_tied):
        layers = {impl: ExpertChoiceMoE(num_experts=4, capacity_factor=1.0,
                                        group_size=16, router_impl=impl)
                  for impl in ("rank", "sort")}
        params = layers["rank"].init(jax.random.PRNGKey(0), x)

        outs, grads = {}, {}
        for impl, layer in layers.items():
            def loss(p, layer=layer):
                return (layer.apply(p, x) ** 2).mean()
            outs[impl] = layer.apply(params, x)
            grads[impl] = jax.grad(loss)(params)
        np.testing.assert_array_equal(np.asarray(outs["rank"]),
                                      np.asarray(outs["sort"]))
        for a, b in zip(jax.tree_util.tree_leaves(grads["rank"]),
                        jax.tree_util.tree_leaves(grads["sort"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_pairwise_rank_kernel_matches_topk_and_xla():
    """ops/rank.py (interpret mode on CPU): the Pallas rank must equal the
    XLA pairwise reduction AND reproduce lax.top_k's selection/slot order,
    including stable ties and ragged row tails (rows % TILE_R != 0)."""
    from vsr_tpu.ops.rank import TILE_R, pairwise_rank

    rng = np.random.default_rng(8)
    rows = TILE_R + 37  # ragged tail
    gs = 128
    af = rng.standard_normal((rows, gs)).astype(np.float32)
    # Tie-heavy row WITHOUT signed zeros: comparison-based rank ties
    # -0.0 with 0.0 where top_k's total-order sort splits them; MoE
    # affinities are softmax outputs (>= 0, never -0.0), so the layer
    # never sees the difference (documented in ops/rank.py).
    af[5] = np.abs(np.round(af[5] * 2) / 2)
    af_j = jnp.asarray(af)
    got = np.asarray(pairwise_rank(af_j, interpret=True))

    a_i = af_j[:, :, None]
    a_j = af_j[:, None, :]
    j_lt_i = jnp.arange(gs)[None, :] < jnp.arange(gs)[:, None]
    want = np.asarray(jnp.sum(
        ((a_j > a_i) | ((a_j == a_i) & j_lt_i)).astype(jnp.int32), axis=-1))
    np.testing.assert_array_equal(got, want)

    # Slot order vs lax.top_k: token with rank c is top_k's c-th pick.
    _, idx = jax.lax.top_k(af_j, gs)
    order = np.asarray(idx)
    for r in (0, 5, rows - 1):
        by_rank = np.argsort(got[r], kind="stable")
        np.testing.assert_array_equal(by_rank, order[r])


def test_moe_rank_pallas_router_equals_rank():
    """router_impl='rank_pallas' (interpret on CPU) equals 'rank' bitwise
    through the full layer."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)), jnp.float32)
    outs = {}
    for impl in ("rank", "rank_pallas"):
        layer = ExpertChoiceMoE(num_experts=4, capacity_factor=1.0,
                                group_size=128, router_impl=impl)
        params = layer.init(jax.random.PRNGKey(0), x)
        outs[impl] = np.asarray(layer.apply(params, x))
    np.testing.assert_array_equal(outs["rank"], outs["rank_pallas"])


def test_moe_dense_dispatch_equals_sparse():
    """dispatch_impl='dense' (mask-combined all-expert FFN) must reproduce
    the sparse one-hot dispatch path — same selection, same outputs and
    gradients — on random and tie-heavy inputs."""
    rng = np.random.default_rng(6)
    for x in (jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32),
              jnp.asarray(np.round(rng.standard_normal((2, 8, 8, 6)) * 2)
                          / 2, jnp.float32)):
        layers = {impl: ExpertChoiceMoE(num_experts=4, capacity_factor=1.0,
                                        group_size=16, dispatch_impl=impl)
                  for impl in ("dense", "sparse")}
        params = layers["dense"].init(jax.random.PRNGKey(0), x)
        outs, grads = {}, {}
        for impl, layer in layers.items():
            def loss(p, layer=layer):
                return (layer.apply(p, x) ** 2).mean()
            outs[impl] = layer.apply(params, x)
            grads[impl] = jax.grad(loss)(params)
        np.testing.assert_allclose(np.asarray(outs["dense"]),
                                   np.asarray(outs["sparse"]),
                                   rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(grads["dense"]),
                        jax.tree_util.tree_leaves(grads["sparse"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_moe_dense_dispatch_needs_rank_router():
    layer = ExpertChoiceMoE(num_experts=2, router_impl="sort",
                            dispatch_impl="dense", group_size=16)
    x = jnp.zeros((1, 4, 4, 6), jnp.float32)
    with pytest.raises(ValueError, match="dense"):
        layer.init(jax.random.PRNGKey(0), x)


def test_moe_layer_capacity_covers_all_tokens():
    """With capacity_factor >= 1 every token can be picked; with the
    default softmax affinities, the combined update is non-zero for
    most tokens (sanity that dispatch/combine einsums wire up)."""
    layer = ExpertChoiceMoE(num_experts=2, capacity_factor=1.0,
                            group_size=16)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4, 4, 6)),
                    jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == x.shape
    # residual: y - x is the MoE update
    upd = np.asarray(y - x)
    assert np.abs(upd).max() > 0


# ------------------------------------------------------- expert mesh


def test_ep_matches_unsharded():
    t_e, s_e = _run(_make({"data": 2, "expert": 4}), 3, sharded=True)
    t_u, s_u = _run(_make(None), 3, sharded=False)
    for k in s_u:
        np.testing.assert_allclose(s_e[k], s_u[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(t_e.params),
                    jax.tree_util.tree_leaves(t_u.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_ep_expert_stacks_actually_sharded():
    trainer, _ = _run(_make({"data": 2, "expert": 4}), 2, sharded=True)

    def count_split(tree):
        found = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = str(path[-1])
            if "expert_" not in name or not isinstance(leaf, jax.Array):
                continue
            shard = leaf.addressable_shards[0].data.shape
            assert shard[0] == leaf.shape[0] // 4, (name, leaf.shape, shard)
            found += 1
        return found

    # Expert stacks split over 'expert' in params AND moments, and they
    # STAY split after repeated steps (layout pinned for donation).
    assert count_split(trainer.params) > 0
    assert count_split(trainer.opt_state) > 0
    # Non-expert leaves (conv kernels) stay replicated.
    for path, leaf in jax.tree_util.tree_leaves_with_path(trainer.params):
        if "expert_" in str(path[-1]) or not isinstance(leaf, jax.Array):
            continue
        assert leaf.addressable_shards[0].data.shape == leaf.shape


def test_ep_compiled_schedule():
    """Pin the partitioner's expert-parallel schedule from the compiled
    HLO: the expert weight stacks are NEVER all-gathered (each device
    computes only its experts — the point of the axis), and the combine
    (plus router softmax stats) is all-reduced over the 'expert'
    submesh. With tokens replicated over the expert axis no GShard
    all-to-all is needed (documented in parallel/ep.py)."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from vsr_tpu.parallel.ep import expert_shardings, use_mesh
    from vsr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 2, "expert": 4})
    net = _net()
    x = jnp.zeros((8, 8, 8, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    shardings = expert_shardings(params, mesh)

    def fwd(p, z):
        with use_mesh(mesh):
            return net.apply(p, z)

    hlo = jax.jit(fwd, in_shardings=(shardings, NamedSharding(
        mesh, P("data")))).lower(
        jax.device_put(params, shardings), x).compile().as_text()

    # No all-gather may produce an expert-stack shape: wi is (4, 8, 16)
    # full / (1, 8, 16) per device; gathering it would be data-parallel
    # in disguise.
    for m in re.finditer(r"all-gather\(?[^\n]*", hlo):
        line = m.group(0)
        assert "f32[4,8,16]" not in line and "f32[4,16,8]" not in line, line
    # The combine all-reduce over the 'expert' submesh exists:
    # replica_groups=[2,4] = 2 groups of the 4 expert-adjacent devices.
    assert re.search(r"all-reduce[^\n]*replica_groups=\[2,4\]", hlo)
    assert "all-to-all" not in hlo  # documented: not the GShard schedule


def test_ep_checkpoint_roundtrip(tmp_path):
    from vsr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    trainer, _ = _run(_make({"data": 2, "expert": 4}), 1, sharded=True)
    path = tmp_path / "model.ckpt"
    save_checkpoint(path, {"params": trainer.params,
                           "opt_state": trainer.opt_state})
    fresh = _make({"data": 2, "expert": 4})
    batch = _batch()
    inputs, targets = fresh._get_inputs_targets(batch)
    fresh.params = fresh.net.init(jax.random.PRNGKey(1), inputs)
    fresh.opt_state = fresh.tx.init(fresh.params["params"])
    state, _aux = load_checkpoint(path, {"params": fresh.params,
                                         "opt_state": fresh.opt_state})
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    fresh.params, fresh.opt_state = state["params"], state["opt_state"]
    fresh._place_state()
    fresh.params, fresh.opt_state, scalars, _ = fresh._dp_train_step(
        fresh.params, fresh.opt_state, inputs, targets)
    assert np.isfinite(float(next(iter(scalars.values()))))


def test_ep_guards():
    with pytest.raises(NotImplementedError, match="composes with 'data'"):
        _make({"expert": 4, "model": 2})
    with pytest.raises(NotImplementedError, match="composes with 'data'"):
        _make({"expert": 4, "spatial": 2})
    with pytest.raises(NotImplementedError, match="zero_optim/fsdp"):
        _make({"data": 2, "expert": 4}, zero_optim=True)
    with pytest.raises(NotImplementedError, match="zero_optim/fsdp"):
        _make({"data": 2, "expert": 4}, fsdp=True)
    # An 'expert' axis on a net with no expert stacks is refused at init.
    from vsr_tpu.models import EDSRNet

    t = _make({"data": 2, "expert": 4},
              net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                          num_features=8, upscale_factor=2))
    t.params = t.net.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 8, 8, 1), jnp.float32))
    t.opt_state = t.tx.init(t.params["params"])
    with pytest.raises(NotImplementedError, match="no expert-stacked"):
        t._place_state()


def test_ep_serving_matches_single_device():
    """infer --mesh data=2,expert=4: partitioned pipeline output equals the
    unsharded single-device pipeline."""
    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.parallel.mesh import make_mesh

    net = _net()
    rng = np.random.default_rng(7)
    frames = np.asarray(rng.random((5, 16, 16)) * 255, np.float32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 1), jnp.float32))
    ref_lr, ref_sr = make_pipeline(net, params, 2, "acdc")(frames)
    mesh = make_mesh({"data": 2, "expert": 4})
    lr, sr = make_pipeline(net, params, 2, "acdc", mesh=mesh)(frames)
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(ref_lr))
    np.testing.assert_allclose(np.asarray(sr), np.asarray(ref_sr),
                               atol=1.0)  # pixels are 0..255 grey levels
    assert np.mean(np.asarray(sr) != np.asarray(ref_sr)) < 0.01


def test_ep_int8_serving_keeps_expert_stacks_sharded():
    """--int8 --mesh expert=N: quantize_params gathers to host numpy, so
    the pipeline must RE-apply the expert placement to the int8 tree —
    and jnp.asarray (make_quantized_apply) must not collapse it back to
    replicated."""
    from vsr_tpu.parallel.ep import shard_expert_params
    from vsr_tpu.parallel.mesh import make_mesh
    from vsr_tpu.quantize import quantize_params

    net = _net()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 1), jnp.float32))
    mesh = make_mesh({"data": 2, "expert": 4})
    qparams, scales = quantize_params(shard_expert_params(params, mesh))
    qparams = shard_expert_params(qparams, mesh)
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)  # the apply wrap
    found = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(qparams):
        if "expert_" not in str(path[-1]) or not isinstance(leaf, jax.Array):
            continue
        shard = leaf.addressable_shards[0].data.shape
        assert shard[0] == leaf.shape[0] // 4, (path, leaf.shape, shard)
        found += 1
    assert found > 0

    # And the full int8 pipeline still serves correct pixels on the mesh.
    from vsr_tpu.infer import make_pipeline

    rng = np.random.default_rng(7)
    frames = np.asarray(rng.random((5, 16, 16)) * 255, np.float32)
    ref_lr, ref_sr = make_pipeline(net, params, 2, "acdc", int8=True)(frames)
    lr, sr = make_pipeline(net, params, 2, "acdc", int8=True,
                           mesh=mesh)(frames)
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(ref_lr))
    np.testing.assert_allclose(np.asarray(sr), np.asarray(ref_sr), atol=1.0)


def test_ep_serving_guards():
    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.parallel.mesh import make_mesh

    net = _net()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 1), jnp.float32))
    with pytest.raises(ValueError, match="composes with 'data' only"):
        make_pipeline(net, params, 2, "acdc",
                      mesh=make_mesh({"spatial": 2, "expert": 4}))
    plain = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                    num_features=8, upscale_factor=2)
    pp = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    with pytest.raises(ValueError, match="no"):
        make_pipeline(plain, pp, 2, "acdc",
                      mesh=make_mesh({"data": 2, "expert": 4}))


def test_ep_rejects_indivisible_num_experts():
    """num_experts not divisible by the 'expert' axis would silently
    replicate the whole axis — refused at placement (training) and
    pipeline build (serving)."""
    net = _net(num_experts=6)  # 6 % 4 != 0
    t = _make({"data": 2, "expert": 4}, net=net)
    x = jnp.zeros((2, 8, 8, 1), jnp.float32)
    t.params = net.init(jax.random.PRNGKey(0), x)
    t.opt_state = t.tx.init(t.params["params"])
    with pytest.raises(NotImplementedError, match="not divisible"):
        t._place_state()

    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="not divisible"):
        make_pipeline(net, t.params, 2, "acdc",
                      mesh=make_mesh({"data": 2, "expert": 4}))


def test_ep_rejects_dense_nhwc_dispatch():
    """dispatch_impl='dense_nhwc' folds all experts into replicated conv
    kernels — numerically fine but it silently defeats the per-expert-
    local EP schedule, so an 'expert' mesh axis refuses it (trainer
    placement AND serving pipeline, via the shared validator)."""
    net = _net(dispatch_impl="dense_nhwc")
    t = _make({"data": 2, "expert": 4}, net=net)
    x = jnp.zeros((2, 8, 8, 1), jnp.float32)
    t.params = net.init(jax.random.PRNGKey(0), x)
    t.opt_state = t.tx.init(t.params["params"])
    with pytest.raises(NotImplementedError, match="dense_nhwc"):
        t._place_state()

    from vsr_tpu.infer import make_pipeline
    from vsr_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="dense_nhwc"):
        make_pipeline(net, t.params, 2, "acdc",
                      mesh=make_mesh({"data": 2, "expert": 4}))


def test_moe_unknown_impl_names_fail():
    x = jnp.zeros((1, 8, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="router_impl"):
        _net(router_impl="Rank").init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="dispatch_impl"):
        _net(dispatch_impl="Dense").init(jax.random.PRNGKey(0), x)


def test_pallas_rank_support_bounds():
    from vsr_tpu.ops.rank import supports_pallas_rank

    assert supports_pallas_rank(128) and supports_pallas_rank(256)
    assert not supports_pallas_rank(64)    # lane misalignment
    assert not supports_pallas_rank(1024)  # VMEM budget


def test_moe_router_init_is_lecun():
    """The router must init at LeCun scale (std ~ 1/sqrt(d)); the expert-
    stack initializer would land ~sqrt(d)x larger on the (d, e) shape and
    saturate the routing softmax."""
    net = MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                     num_features=64, upscale_factor=2, num_experts=4,
                     group_size=64)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 1), jnp.float32))
    flat = jax.tree_util.tree_leaves_with_path(params)
    routers = [np.asarray(leaf) for path, leaf in flat
               if str(path[-1]) == "'router'"
               or getattr(path[-1], "key", None) == "router"]
    assert routers
    for r in routers:
        assert r.std() < 3.0 / np.sqrt(64), r.std()


def test_device_trainer_rejects_expert_axis():
    from vsr_tpu.runner.device_trainer import AcdcSISRDeviceTrainer

    with pytest.raises(NotImplementedError, match="expert"):
        AcdcSISRDeviceTrainer(
            train_dataloader=None, valid_dataloader=None, net=_net(),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, patch=8, ratio=2,
            mesh_axes={"data": 2, "expert": 4})


# ------------------------------------------------- MoE on the flagship


def test_drf_moe_default_off_is_parity_net():
    """num_experts=0 (the default) must add NO parameters — the reference-
    parity DRFNet structure is untouched."""
    from vsr_tpu.models import DRFNet

    x = jnp.zeros((1, 2, 8, 8, 1), jnp.float32)
    base = DRFNet(in_channels=1, out_channels=1, num_features=8,
                  num_groups=1, upscale_factor=2)
    params = base.init(jax.random.PRNGKey(0), x)
    names = [str(p[-1]) for p, _ in
             jax.tree_util.tree_leaves_with_path(params)]
    assert not any("expert" in n or "router" in n for n in names)


def test_drf_moe_forward_and_expert_training():
    """DRFNet(num_experts=4): MoE inside the frame scan — forward finite,
    expert stacks present (broadcast across frames), and the expert-mesh
    trainer step matches the unsharded step."""
    from vsr_tpu.models import DRFNet
    from vsr_tpu.runner.trainers import AcdcVSRTrainer

    net = DRFNet(in_channels=1, out_channels=1, num_features=8,
                 num_groups=1, upscale_factor=2, num_experts=4,
                 expert_group_size=64)

    def make(mesh_axes):
        return AcdcVSRTrainer(
            train_dataloader=None, valid_dataloader=None, net=net,
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, mesh_axes=mesh_axes)

    rng = np.random.default_rng(11)
    batch = {
        "lr_imgs": rng.standard_normal((4, 2, 8, 8, 1)).astype(np.float32),
        "hr_imgs": rng.standard_normal((4, 2, 16, 16, 1)).astype(np.float32),
        "index": np.arange(4)}

    results = {}
    for key, axes, sharded in (("ep", {"data": 2, "expert": 4}, True),
                               ("plain", None, False)):
        t = make(axes)
        inputs, targets = t._get_inputs_targets(batch)
        t.params = net.init(jax.random.PRNGKey(0), inputs)
        t.opt_state = t.tx.init(t.params["params"])
        t._place_state()
        step = t._dp_train_step if sharded else (
            lambda p, o, i, g: t._train_step(p, o, i, g, training=True))
        p, o, scalars, _ = step(t.params, t.opt_state, inputs, targets)
        results[key] = (p, {k: float(v) for k, v in scalars.items()})

    names = [str(pth[-1]) for pth, _ in
             jax.tree_util.tree_leaves_with_path(results["plain"][0])]
    assert any("expert_wi" in n for n in names)
    for k in results["plain"][1]:
        np.testing.assert_allclose(results["ep"][1][k],
                                   results["plain"][1][k],
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(results["ep"][0]),
                    jax.tree_util.tree_leaves(results["plain"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_rank_pallas_router_is_trainable():
    """jax.grad through router_impl='rank_pallas' must work (pallas_call
    has no autodiff rule — the layer cuts the edge with stop_gradient;
    the rank is integer so the cut is exact) and match the XLA rank
    router's gradients."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 6)), jnp.float32)
    grads = {}
    for impl in ("rank", "rank_pallas"):
        layer = ExpertChoiceMoE(num_experts=2, capacity_factor=1.0,
                                group_size=128, router_impl=impl)
        params = layer.init(jax.random.PRNGKey(0), x)
        grads[impl] = jax.grad(
            lambda p, layer=layer: (layer.apply(p, x) ** 2).mean())(params)
    for a, b in zip(jax.tree_util.tree_leaves(grads["rank"]),
                    jax.tree_util.tree_leaves(grads["rank_pallas"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_moe_expert_params_cast_to_activation_dtype():
    """Serving a restored f32 checkpoint under dtype=bfloat16 must not
    promote the expert FFN back to f32 — params join the activation
    dtype at use (the round-2 bf16 dtype-leak class)."""
    net = _net(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    # Simulate a checkpoint restore: leaves come back f32.
    params_f32 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params)
    y = net.apply(params_f32, x)
    assert np.isfinite(np.asarray(y)).all()
    # Prove it from the jaxpr: every non-router dot (the expert FFN and
    # dispatch einsums) must run on bf16 operands even with f32 params
    # (the router logits dot is intentionally f32 for softmax stability).
    jaxpr = jax.make_jaxpr(lambda p: net.apply(p, x))(params_f32)
    dots = [e for e in jaxpr.jaxpr.eqns for e in _all_eqns(e)
            if e.primitive.name == "dot_general"]
    dtypes = {str(e.invars[0].aval.dtype) for e in dots}
    assert "bfloat16" in dtypes, dtypes


def _all_eqns(eqn):
    """Flatten nested (scan/pjit/custom) jaxprs."""
    yield eqn
    for v in eqn.params.values():
        inner = getattr(v, "jaxpr", None)
        if inner is not None:
            for e in getattr(inner, "eqns", []):
                yield from _all_eqns(e)


def test_topk_mask_matches_topk_selection():
    """ops/select.py radix threshold search: the mask must equal the
    pairwise-rank selection (== lax.top_k's set with stable ties) on
    random, tie-heavy, all-equal, and padded-zero rows, for every k and
    several radix widths."""
    from vsr_tpu.ops.select import topk_mask

    rng = np.random.default_rng(11)
    gs = 24
    rows = []
    rows.append(rng.random((gs,)).astype(np.float32))          # random
    rows.append(np.abs(np.round(rng.standard_normal(gs) * 2) / 2)
                .astype(np.float32))                           # tie-heavy
    rows.append(np.full((gs,), 0.25, np.float32))              # all-equal
    pad = rng.random((gs,)).astype(np.float32)
    pad[gs // 2:] = 0.0                                        # pad zeros
    rows.append(pad)
    rows.append(np.zeros((gs,), np.float32))                   # all-zero
    af = jnp.asarray(np.stack(rows))

    a_i = af[:, :, None]
    a_j = af[:, None, :]
    j_lt_i = jnp.arange(gs)[None, :] < jnp.arange(gs)[:, None]
    rank = np.asarray(jnp.sum(
        ((a_j > a_i) | ((a_j == a_i) & j_lt_i)).astype(jnp.int32), axis=-1))

    for k in (1, 2, gs // 3, gs - 1, gs):
        want = rank < k
        for radix_bits in (1, 3, 4, 8):
            got = np.asarray(topk_mask(af, k, radix_bits=radix_bits))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"k={k} R={radix_bits}")
        # And against lax.top_k's selected index set directly.
        _, idx = jax.lax.top_k(af, k)
        for r in range(af.shape[0]):
            sel = np.zeros(gs, bool)
            sel[np.asarray(idx)[r]] = True
            np.testing.assert_array_equal(
                np.asarray(topk_mask(af, k))[r], sel, err_msg=f"row {r}")


def test_topk_mask_guards():
    from vsr_tpu.ops.select import topk_mask

    af = jnp.zeros((4, 8), jnp.float32)
    with pytest.raises(ValueError, match="k="):
        topk_mask(af, 0)
    with pytest.raises(ValueError, match="k="):
        topk_mask(af, 9)
    with pytest.raises(ValueError, match="radix_bits"):
        topk_mask(af, 2, radix_bits=0)


def test_moe_radix_router_equals_rank():
    """router_impl='radix' (threshold search, dense dispatch) equals
    'rank' bitwise through the full layer — outputs AND gradients — on
    random and tie-heavy inputs, including non-divisible token counts
    (padded zero-affinity slots)."""
    rng = np.random.default_rng(12)
    shapes = [(2, 8, 8, 6), (1, 9, 7, 6)]  # second: t % gs != 0
    for shape in shapes:
        x_rand = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        x_tied = jnp.asarray(
            np.round(rng.standard_normal(shape) * 2) / 2, jnp.float32)
        for x in (x_rand, x_tied):
            layers = {impl: ExpertChoiceMoE(
                num_experts=4, capacity_factor=1.0, group_size=16,
                router_impl=impl, dispatch_impl="dense")
                for impl in ("rank", "radix")}
            params = layers["rank"].init(jax.random.PRNGKey(0), x)
            outs, grads = {}, {}
            for impl, layer in layers.items():
                def loss(p, layer=layer, x=x):
                    return (layer.apply(p, x) ** 2).mean()
                outs[impl] = layer.apply(params, x)
                grads[impl] = jax.grad(loss)(params)
            np.testing.assert_array_equal(np.asarray(outs["rank"]),
                                          np.asarray(outs["radix"]))
            for a, b in zip(jax.tree_util.tree_leaves(grads["rank"]),
                            jax.tree_util.tree_leaves(grads["radix"])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_moe_radix_router_requires_dense():
    layer = ExpertChoiceMoE(num_experts=2, router_impl="radix",
                            dispatch_impl="sparse", group_size=16)
    x = jnp.zeros((1, 4, 4, 6), jnp.float32)
    with pytest.raises(ValueError, match="radix"):
        layer.init(jax.random.PRNGKey(0), x)


def test_moe_dense_nhwc_equals_dense():
    """dispatch_impl='dense_nhwc' (image-layout conv FFN + grouped 1x1
    output projection) must match 'dense' BITWISE on outputs (same
    per-token contractions on the MXU) and to accumulation-order noise
    on gradients, on random and tie-heavy inputs, divisible and
    non-divisible token counts, and under both mask routers."""
    rng = np.random.default_rng(21)
    for shape in [(2, 8, 8, 6), (1, 9, 7, 6)]:
        for tied in (False, True):
            xs = rng.standard_normal(shape)
            if tied:
                xs = np.round(xs * 2) / 2
            x = jnp.asarray(xs, jnp.float32)
            for router in ("rank", "radix"):
                layers = {impl: ExpertChoiceMoE(
                    num_experts=4, capacity_factor=1.0, group_size=16,
                    router_impl=router, dispatch_impl=impl)
                    for impl in ("dense", "dense_nhwc")}
                params = layers["dense"].init(jax.random.PRNGKey(0), x)
                outs, grads = {}, {}
                for impl, layer in layers.items():
                    outs[impl] = layer.apply(params, x)
                    grads[impl] = jax.grad(
                        lambda p, l=layer: (l.apply(p, x) ** 2).mean()
                    )(params)
                np.testing.assert_array_equal(
                    np.asarray(outs["dense"]),
                    np.asarray(outs["dense_nhwc"]),
                    err_msg=f"{shape} tied={tied} router={router}")
                for a, b in zip(
                        jax.tree_util.tree_leaves(grads["dense"]),
                        jax.tree_util.tree_leaves(grads["dense_nhwc"])):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), atol=1e-6, rtol=0)


def test_moe_dense_nhwc_guards():
    x = jnp.zeros((1, 4, 4, 6), jnp.float32)
    layer = ExpertChoiceMoE(num_experts=2, router_impl="sort",
                            dispatch_impl="dense_nhwc", group_size=16)
    with pytest.raises(ValueError, match="dense_nhwc"):
        layer.init(jax.random.PRNGKey(0), x)


def test_moe_dense_nhwc_net_checkpoint_compatible():
    """Same param tree as the grouped dispatches — a checkpoint trained
    with 'sparse' serves under 'dense_nhwc' unchanged."""
    kw = dict(in_channels=1, out_channels=1, num_resblocks=2,
              num_features=8, upscale_factor=2, num_experts=4,
              group_size=16, moe_every=1)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 8, 8, 1)), jnp.float32)
    sparse = MoEEDSRNet(dispatch_impl="sparse", **kw)
    nhwc = MoEEDSRNet(dispatch_impl="dense_nhwc", **kw)
    params = sparse.init(jax.random.PRNGKey(0), x)
    ps = jax.tree_util.tree_structure(params)
    pn = jax.tree_util.tree_structure(nhwc.init(jax.random.PRNGKey(0), x))
    assert ps == pn
    # And dense_nhwc applies the sparse-trained params (selected tokens'
    # outputs are the same contractions; unselected pass through).
    np.testing.assert_allclose(
        np.asarray(sparse.apply(params, x)),
        np.asarray(nhwc.apply(params, x)), atol=2e-5, rtol=0)


def test_ep_refuses_undetermined_dispatch_impl():
    """A net carrying expert stacks but exposing no dispatch_impl (a future
    embedder that forgot to plumb the knob) is refused loudly — None must
    never silently pass the folded-dispatch guard."""
    from vsr_tpu.parallel.ep import validate_expert_mesh
    from vsr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 2, "expert": 4})
    params = {"params": {"moe": {
        "expert_wi": jnp.zeros((4, 8, 16), jnp.float32)}}}
    with pytest.raises(NotImplementedError, match="dispatch_impl"):
        validate_expert_mesh(mesh, params, context="test", dispatch_impl=None)


def test_embedded_moe_nets_expose_dispatch_impl():
    """DRFNet/DRFSISRNet embed ExpertChoiceMoE with the module default —
    the property keeps ep.resolve_dispatch_impl truthful for them."""
    from vsr_tpu.models import DRFNet, DRFSISRNet
    from vsr_tpu.parallel.ep import resolve_dispatch_impl

    drf = DRFNet(in_channels=1, out_channels=1, num_features=8,
                 num_groups=2, upscale_factor=2, num_experts=2)
    sisr = DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                      num_features=8, num_groups=2, upscale_factor=2,
                      num_experts=2)
    assert resolve_dispatch_impl(drf) == ExpertChoiceMoE.dispatch_impl
    assert resolve_dispatch_impl(sisr) == ExpertChoiceMoE.dispatch_impl
    assert ExpertChoiceMoE.dispatch_impl == "sparse"
