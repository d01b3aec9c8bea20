"""Optimizer/scheduler name coverage and torch-golden update parity.

The reference resolves optimizers/schedulers from torch.optim by name
(/root/reference/src/main.py:73,76); every name a reference config could use
must exist here and take the same steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vsr_tpu.optim as O

torch = pytest.importorskip("torch")


@pytest.mark.parametrize(
    "name,kwargs,torch_kwargs",
    [
        ("Adam", {"lr": 1e-2}, {"lr": 1e-2}),
        ("AdamW", {"lr": 1e-2}, {"lr": 1e-2}),
        ("SGD", {"lr": 1e-2, "momentum": 0.9}, {"lr": 1e-2, "momentum": 0.9}),
        ("RMSprop", {"lr": 1e-2}, {"lr": 1e-2}),
        ("Adagrad", {"lr": 0.1}, {"lr": 0.1}),
        ("Adadelta", {"lr": 1.0}, {"lr": 1.0}),
        ("Adamax", {"lr": 2e-3}, {"lr": 2e-3}),
        ("NAdam", {"lr": 2e-3}, {"lr": 2e-3}),
        ("RAdam", {"lr": 1e-3}, {"lr": 1e-3}),
        ("ASGD", {"lr": 1e-2}, {"lr": 1e-2}),
        ("ASGD", {"lr": 0.5, "lambd": 1e-2, "alpha": 0.6, "t0": 2,
                  "weight_decay": 1e-3},
         {"lr": 0.5, "lambd": 1e-2, "alpha": 0.6, "t0": 2,
          "weight_decay": 1e-3}),
        ("Rprop", {"lr": 1e-2}, {"lr": 1e-2}),
        ("Rprop", {"lr": 0.1, "etas": (0.4, 1.5),
                   "step_sizes": (1e-4, 0.5)},
         {"lr": 0.1, "etas": (0.4, 1.5), "step_sizes": (1e-4, 0.5)}),
    ],
)
def test_optimizer_updates_match_torch(name, kwargs, torch_kwargs, rng):
    tx = getattr(O, name)(**kwargs)
    w0 = rng.standard_normal(32).astype(np.float32)
    grads = [rng.standard_normal(32).astype(np.float32) for _ in range(5)]

    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        u, state = tx.update(jnp.asarray(g), state, w)
        w = w + u

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = getattr(torch.optim, name)([tp], **torch_kwargs)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    np.testing.assert_allclose(np.asarray(w), tp.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_asgd_averaged_iterate_matches_torch(rng):
    """The tracked average ``ax`` must follow torch's LAGGED mu schedule
    (mu for step t is computed at the end of step t-1) — invisible to the
    params-only comparison above because ax never feeds back into params."""
    kwargs = {"lr": 0.5, "lambd": 1e-2, "alpha": 0.6, "t0": 2}
    tx = O.ASGD(**kwargs)
    w0 = rng.standard_normal(32).astype(np.float32)
    grads = [rng.standard_normal(32).astype(np.float32) for _ in range(6)]

    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        u, state = tx.update(jnp.asarray(g), state, w)
        w = w + u
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    ax = [l for path, l in leaves if any("ax" in str(p) for p in path)]
    assert len(ax) == 1

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.ASGD([tp], **kwargs)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
    golden_ax = topt.state[tp]["ax"].detach().numpy()
    np.testing.assert_allclose(np.asarray(ax[0]), golden_ax,
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"base_lr": 0.01, "max_lr": 0.1, "step_size_up": 3},
        {"base_lr": 0.01, "max_lr": 0.1, "step_size_up": 2,
         "step_size_down": 5, "mode": "triangular2"},
        {"base_lr": 0.02, "max_lr": 0.2, "step_size_up": 4,
         "mode": "exp_range", "gamma": 0.9},
    ],
)
def test_cyclic_lr_matches_torch(kwargs):
    sched = O.CyclicLR(cycle_momentum=False, **kwargs)
    sched.bind(0.5)  # optimizer lr is overridden by base_lr, as in torch
    tp = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tp], lr=0.5)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        topt, cycle_momentum=False, **kwargs)
    ours, golden = [], []
    for _ in range(17):
        golden.append(topt.param_groups[0]["lr"])
        ours.append(sched._lr())
        sched.step()
        topt.step()
        tsched.step()
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-12)


def test_cyclic_lr_refuses_momentum_cycling():
    with pytest.raises(ValueError, match="cycle_momentum"):
        O.CyclicLR(base_lr=0.01, max_lr=0.1, cycle_momentum=True)
    # torch's DEFAULT is cycle_momentum=True (when the optimizer has
    # momentum/betas) — omitting the knob must fail loudly too, not
    # silently run an LR-only schedule the torch config wouldn't.
    with pytest.raises(ValueError, match="cycle_momentum"):
        O.CyclicLR(base_lr=0.01, max_lr=0.1)
    with pytest.raises(ValueError, match="momentum"):
        O.CyclicLR(base_lr=0.01, max_lr=0.1, cycle_momentum=False,
                   base_momentum=0.8, max_momentum=0.9)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"max_lr": 0.1, "total_steps": 12},
        {"max_lr": 0.1, "total_steps": 12, "anneal_strategy": "linear"},
        {"max_lr": 0.2, "epochs": 4, "steps_per_epoch": 3,
         "pct_start": 0.25, "div_factor": 10.0, "final_div_factor": 100.0},
        {"max_lr": 0.1, "total_steps": 15, "three_phase": True,
         "pct_start": 0.2},
        {"max_lr": 0.1, "total_steps": 15, "three_phase": True,
         "pct_start": 0.2, "anneal_strategy": "linear"},
    ],
)
def test_one_cycle_lr_matches_torch(kwargs):
    sched = O.OneCycleLR(cycle_momentum=False, **kwargs)
    sched.bind(0.5)  # optimizer lr is overridden by max_lr/div_factor
    tp = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tp], lr=0.5)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        topt, cycle_momentum=False, **kwargs)
    total = kwargs.get("total_steps") or (
        kwargs["epochs"] * kwargs["steps_per_epoch"])
    ours, golden = [], []
    for _ in range(total):
        golden.append(topt.param_groups[0]["lr"])
        ours.append(sched._lr())
        sched.step()
        topt.step()
        tsched.step()
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-12)


def test_one_cycle_lr_refusals():
    with pytest.raises(ValueError, match="cycle_momentum"):
        O.OneCycleLR(max_lr=0.1, total_steps=10)
    with pytest.raises(ValueError, match="cycle_momentum"):
        O.OneCycleLR(max_lr=0.1, total_steps=10, cycle_momentum=True)
    with pytest.raises(ValueError, match="momentum"):
        O.OneCycleLR(max_lr=0.1, total_steps=10, cycle_momentum=False,
                     base_momentum=0.85)
    with pytest.raises(ValueError, match="total_steps"):
        O.OneCycleLR(max_lr=0.1, cycle_momentum=False)
    with pytest.raises(ValueError, match="total_steps"):
        O.OneCycleLR(max_lr=0.1, cycle_momentum=False, epochs=3)
    # Stepping past total_steps raises, as in torch.
    s = O.OneCycleLR(max_lr=0.1, total_steps=3, cycle_momentum=False)
    for _ in range(3):
        s.step()
    with pytest.raises(ValueError, match="total steps"):
        s.step()


def test_cosine_warm_restarts_matches_torch():
    sched = O.CosineAnnealingWarmRestarts(T_0=4, T_mult=2, eta_min=1e-5)
    sched.bind(0.1)
    tp = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tp], lr=0.1)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        topt, T_0=4, T_mult=2, eta_min=1e-5)
    ours, golden = [], []
    for _ in range(13):
        golden.append(topt.param_groups[0]["lr"])
        ours.append(sched._lr())
        sched.step()
        topt.step()
        tsched.step()
    np.testing.assert_allclose(ours, golden, rtol=1e-6)


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("StepLR", {"step_size": 3, "gamma": 0.5}),
        ("MultiStepLR", {"milestones": [2, 5, 9], "gamma": 0.3}),
        ("ExponentialLR", {"gamma": 0.9}),
        ("CosineAnnealingLR", {"T_max": 7, "eta_min": 1e-5}),
        ("ConstantLR", {"factor": 0.25, "total_iters": 4}),
        ("LinearLR", {"start_factor": 0.1, "end_factor": 1.0,
                      "total_iters": 6}),
        ("PolynomialLR", {"total_iters": 8, "power": 2.0}),
    ],
)
def test_epoch_schedulers_match_torch(name, kwargs):
    sched = getattr(O, name)(**kwargs)
    sched.bind(0.1)
    tp = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tp], lr=0.1)
    tsched = getattr(torch.optim.lr_scheduler, name)(topt, **kwargs)
    ours, golden = [], []
    for _ in range(12):
        golden.append(topt.param_groups[0]["lr"])
        ours.append(sched._lr())
        sched.step()
        topt.step()
        tsched.step()
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("name,kwargs", [
    ("StepLR", {"step_size": 10, "step_size_typo": 3}),
    ("CyclicLR", {"base_lr": 0.01, "max_lr": 0.1,
                  "cycle_momentum": False, "scale_mode": "iterations"}),
    ("ReduceLROnPlateau", {"min_lrs": 1e-6}),
])
def test_scheduler_refuses_unknown_kwargs(name, kwargs):
    """Silently swallowing an unknown scheduler kwarg (a typo, or a torch
    knob like CyclicLR's scale_mode that this reimplementation does not
    drive) would train a different LR curve than the same torch config."""
    with pytest.raises(ValueError, match="unsupported kwargs"):
        getattr(O, name)(**kwargs)


def test_scheduler_tolerates_cosmetic_torch_kwargs():
    s = O.StepLR(step_size=10, verbose=True, last_epoch=-1)
    s.bind(0.5)
    assert s.step() == 0.5
    with pytest.raises(ValueError, match="last_epoch"):
        O.StepLR(step_size=10, last_epoch=3)
