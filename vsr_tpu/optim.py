"""Optimizers and LR schedulers.

The reference resolves optimizers/schedulers by name from ``torch.optim`` /
``torch.optim.lr_scheduler`` (``main.py:73-76``), so configs say ``Adam`` /
``SGD`` / ``StepLR`` / ``ReduceLROnPlateau`` with torch kwargs. Here the same
names map to optax gradient transformations built with
``optax.inject_hyperparams`` so the learning rate lives in the optimizer
state and can be mutated by epoch-level schedulers (the JAX equivalent of
``optimizer.param_groups[0]['lr'] = ...``).

Semantics notes:
- ``weight_decay`` is applied as L2-into-gradient (decayed weights added
  *before* the Adam/SGD scaling), matching torch's coupled weight decay.
- Schedulers are plain Python objects driven once per epoch by the trainer;
  their state is a JSON-friendly dict for checkpointing. ``ReduceLROnPlateau``
  steps on the validation ``Loss`` like the intended reference behavior
  (``base_trainer.py:67`` — note the reference's own line crashes on an
  undefined ``mode`` variable; we implement what it meant to do and document
  the divergence).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence

import optax

from vsr_tpu.registry import register


def _maybe_l2(weight_decay: float) -> optax.GradientTransformation:
    return optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity()


@register("optimizer")
def Adam(learning_rate: float = 1e-3, lr: float | None = None,
         betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, amsgrad: bool = False):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


@register("optimizer")
def AdamW(learning_rate: float = 1e-3, lr: float | None = None,
          betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 1e-2):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)

    return optax.inject_hyperparams(make)(learning_rate=lr)


@register("optimizer")
def SGD(learning_rate: float = 1e-2, lr: float | None = None,
        momentum: float = 0.0, weight_decay: float = 0.0, nesterov: bool = False):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity(),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


@register("optimizer")
def RMSprop(learning_rate: float = 1e-2, lr: float | None = None,
            alpha: float = 0.99, eps: float = 1e-8, weight_decay: float = 0.0,
            momentum: float = 0.0):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            # torch adds eps OUTSIDE the sqrt (g / (sqrt(v) + eps)).
            optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False),
            optax.trace(decay=momentum) if momentum else optax.identity(),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


def _scale_by_torch_adagrad(eps: float, initial_accumulator_value: float):
    """torch Adagrad places eps OUTSIDE the sqrt (g / (sqrt(acc) + eps));
    optax.scale_by_rss puts it inside, which diverges for tiny gradients."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"acc": jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params)}

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(lambda a, g: a + g * g, state["acc"], grads)
        updates = jax.tree_util.tree_map(
            lambda g, a: g / (jnp.sqrt(a) + eps), grads, acc)
        return updates, {"acc": acc}

    return optax.GradientTransformation(init, update)


@register("optimizer")
def Adagrad(learning_rate: float = 1e-2, lr: float | None = None,
            eps: float = 1e-10, weight_decay: float = 0.0,
            initial_accumulator_value: float = 0.0):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            _scale_by_torch_adagrad(eps, initial_accumulator_value),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


@register("optimizer")
def Adadelta(learning_rate: float = 1.0, lr: float | None = None,
             rho: float = 0.9, eps: float = 1e-6, weight_decay: float = 0.0):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            optax.scale_by_adadelta(rho=rho, eps=eps),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


@register("optimizer")
def Adamax(learning_rate: float = 2e-3, lr: float | None = None,
           betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.0):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            optax.scale_by_adamax(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


def _scale_by_torch_nadam(b1: float, b2: float, eps: float,
                          momentum_decay: float):
    """torch.optim.NAdam's exact update (its mu_t momentum-decay schedule
    differs from optax's nesterov-adam)."""
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": zeros,
                "v": jax.tree_util.tree_map(jnp.zeros_like, params),
                "t": jnp.zeros([], jnp.int32),
                "mu_prod": jnp.ones([], jnp.float32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * momentum_decay))
        mu_prod = state["mu_prod"] * mu_t
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1 - b2) * g * g, state["v"], grads)
        bc2 = 1.0 - b2 ** tf

        def u(mm, vv, g):
            mhat = (mu_next * mm / (1.0 - mu_prod * mu_next)
                    + (1.0 - mu_t) * g / (1.0 - mu_prod))
            return mhat / (jnp.sqrt(vv / bc2) + eps)

        updates = jax.tree_util.tree_map(u, m, v, grads)
        return updates, {"m": m, "v": v, "t": t, "mu_prod": mu_prod}

    return optax.GradientTransformation(init, update)


@register("optimizer")
def NAdam(learning_rate: float = 2e-3, lr: float | None = None,
          betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0, momentum_decay: float = 0.004):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            _scale_by_torch_nadam(betas[0], betas[1], eps, momentum_decay),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


@register("optimizer")
def RAdam(learning_rate: float = 1e-3, lr: float | None = None,
          betas: Sequence[float] = (0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0):
    lr = lr if lr is not None else learning_rate

    def make(learning_rate):
        return optax.chain(
            _maybe_l2(weight_decay),
            optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


def _scale_by_torch_asgd(lambd: float, alpha: float, t0: float):
    """torch.optim.ASGD's exact parameter path: decay ``p *= 1 - lambd*eta``
    then ``p -= eta*grad`` with the lagged eta schedule
    ``eta_t = lr / (1 + lambd*lr*t)**alpha`` (eta_0 = lr). The averaged
    iterate ``ax`` is tracked like torch's state (lagged
    mu = 1/max(1, (t-1) - t0)) but, as in torch, never swapped into the
    live params."""
    import jax
    import jax.numpy as jnp

    def make(learning_rate):
        def init(params):
            # jnp.array(copy=True): inject_hyperparams passes its OWN
            # learning_rate buffer here — aliasing it into this state
            # would make the trainer's donated step donate it twice.
            return {"ax": jax.tree_util.tree_map(jnp.zeros_like, params),
                    "eta": jnp.array(learning_rate, jnp.float32, copy=True),
                    "t": jnp.zeros([], jnp.int32)}

        def update(grads, state, params):
            if params is None:
                raise ValueError("ASGD requires params")
            t = state["t"] + 1
            eta = state["eta"]
            updates = jax.tree_util.tree_map(
                lambda p, g: -(lambd * eta) * p - eta * g, params, grads)
            # Like eta, mu is LAGGED in torch: step t applies the mu
            # computed at the END of step t-1, i.e. 1/max(1, (t-1) - t0)
            # (torch._single_tensor_asgd updates mu after the averaging).
            mu = 1.0 / jnp.maximum(1.0, t.astype(jnp.float32) - 1.0 - t0)
            ax = jax.tree_util.tree_map(
                lambda a, p, u: jnp.where(mu == 1.0, p + u,
                                          a + ((p + u) - a) * mu),
                state["ax"], params, updates)
            eta_next = learning_rate / (
                1.0 + lambd * learning_rate * t.astype(jnp.float32)) ** alpha
            return updates, {"ax": ax, "eta": eta_next, "t": t}

        return optax.GradientTransformation(init, update)

    return make


@register("optimizer")
def ASGD(learning_rate: float = 1e-2, lr: float | None = None,
         lambd: float = 1e-4, alpha: float = 0.75, t0: float = 1e6,
         weight_decay: float = 0.0):
    lr = lr if lr is not None else learning_rate
    inner = _scale_by_torch_asgd(lambd, alpha, t0)

    def make(learning_rate):
        return optax.chain(_maybe_l2(weight_decay), inner(learning_rate))

    return optax.inject_hyperparams(make)(learning_rate=lr)


def _scale_by_torch_rprop(etas: Sequence[float], step_sizes: Sequence[float]):
    """torch.optim.Rprop: per-weight step sizes grown/shrunk by the sign
    agreement of consecutive gradients; the gradient is zeroed (and recorded
    as zero) where the sign flipped."""
    import jax
    import jax.numpy as jnp
    etaminus, etaplus = etas
    smin, smax = step_sizes

    def make(learning_rate):
        def init(params):
            return {"prev": jax.tree_util.tree_map(jnp.zeros_like, params),
                    "step_size": jax.tree_util.tree_map(
                        lambda p: jnp.full_like(p, learning_rate), params)}

        def update(grads, state, params=None):
            def per_leaf(g, prev, ss):
                s = g * prev
                factor = jnp.where(s > 0, etaplus,
                                   jnp.where(s < 0, etaminus, 1.0))
                ss = jnp.clip(ss * factor, smin, smax)
                g = jnp.where(s < 0, 0.0, g)
                return -jnp.sign(g) * ss, g, ss

            flat = jax.tree_util.tree_map(
                per_leaf, grads, state["prev"], state["step_size"])
            updates = jax.tree_util.tree_map(
                lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
            prev = jax.tree_util.tree_map(
                lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
            ss = jax.tree_util.tree_map(
                lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
            return updates, {"prev": prev, "step_size": ss}

        return optax.GradientTransformation(init, update)

    return make


@register("optimizer")
def Rprop(learning_rate: float = 1e-2, lr: float | None = None,
          etas: Sequence[float] = (0.5, 1.2),
          step_sizes: Sequence[float] = (1e-6, 50.0)):
    """lr is only the INITIAL per-weight step size (as in torch); later
    set_learning_rate calls do not rescale existing step sizes."""
    lr = lr if lr is not None else learning_rate
    return optax.inject_hyperparams(_scale_by_torch_rprop(etas, step_sizes))(
        learning_rate=lr)


def _unwrap_hyperparams_state(opt_state):
    """Find the inject_hyperparams state (possibly inside optax.MultiSteps,
    :func:`with_param_ema`, or an ``optax.chain`` tuple — e.g. the trainer's
    ``grad_clip`` wrap)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):
        return _unwrap_hyperparams_state(opt_state.inner_opt_state)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        for element in opt_state:
            try:
                return _unwrap_hyperparams_state(element)
            except ValueError:
                continue
    raise ValueError("Optimizer state carries no injected hyperparams")


class ParamEmaState(NamedTuple):
    """State of :func:`with_param_ema`: the wrapped optimizer's state plus
    the exponential moving average of the POST-update params. The field name
    ``inner_opt_state`` keeps :func:`get_learning_rate` /
    :func:`set_learning_rate` working through the wrapper."""

    inner_opt_state: Any
    ema: Any


def with_param_ema(tx: optax.GradientTransformation,
                   decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the parameters inside the
    optimizer state: ``ema <- decay * ema + (1 - decay) * new_params``.

    The EMA twin rides the normal optimizer state, so it is device-resident
    during training, checkpointed with ``opt_state`` for free, and sharded
    by the same trailing-dim rules as the moments under ZeRO/FSDP/tensor
    parallelism. Extract it with :func:`get_ema_params` (or serve it via
    ``vsr_tpu.infer --ema``). The reference framework has no EMA
    (SURVEY.md §2.7); this is a beyond-parity production-training feature —
    EMA weights are the standard eval/serving weights for long SR runs.
    """
    import jax

    d = float(decay)
    if not 0.0 < d < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    import jax.numpy as jnp

    def init(params):
        # Real copies, not aliases: the trainer donates params and
        # opt_state to the jitted step — aliased leaves would be the same
        # buffer donated twice.
        return ParamEmaState(
            inner_opt_state=tx.init(params),
            ema=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True),
                                       params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("with_param_ema needs params in tx.update()")
        new_updates, new_inner = tx.update(updates, state.inner_opt_state,
                                           params)
        new_params = optax.apply_updates(params, new_updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, state.ema, new_params)
        return new_updates, ParamEmaState(new_inner, new_ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """The EMA param tree from a :func:`with_param_ema`-wrapped state (the
    trainable collection only, matching what ``tx.init`` saw).

    Traverses ``inner_opt_state`` wrappers (MultiSteps) AND plain tuples —
    ``optax.chain`` (e.g. the ``grad_clip`` knob) stores its member states
    as a tuple the attribute walk alone would miss."""

    def find(state):
        if isinstance(state, ParamEmaState):
            return state
        if hasattr(state, "inner_opt_state"):
            return find(state.inner_opt_state)
        if isinstance(state, (tuple, list)):
            for member in state:
                found = find(member)
                if found is not None:
                    return found
        return None

    state = find(opt_state)
    if state is None:
        raise ValueError(
            "Optimizer state carries no param EMA — train with "
            "trainer.kwargs.ema_decay to track one")
    return state.ema


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning-rate hyperparameter in an opt state."""
    import jax.numpy as jnp

    inner = _unwrap_hyperparams_state(opt_state)
    current = inner.hyperparams["learning_rate"]
    inner.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=getattr(current, "dtype", jnp.float32)
    )
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_unwrap_hyperparams_state(opt_state).hyperparams["learning_rate"])


def _refuse_unknown_kwargs(name: str, kwargs: dict) -> None:
    """Schedulers resolve by name from YAML configs the way the reference
    resolves torch.optim.lr_scheduler names (src/main.py:76) — a swallowed
    unknown key (a typo like ``step_size_dwon``, or a torch knob this
    reimplementation does not drive, like CyclicLR's ``scale_fn``) would
    silently train a different LR curve than the same torch config.
    ``verbose`` is cosmetic in torch and ignored; ``last_epoch`` is
    accepted only at torch's -1 default (resume restores the epoch via
    ``load_state_dict``, not construction)."""
    kwargs = dict(kwargs)
    kwargs.pop("verbose", None)
    if kwargs.pop("last_epoch", -1) != -1:
        raise ValueError(
            f"{name}: last_epoch is restored by checkpoint resume "
            "(load_state_dict), not construction — only the torch default "
            "-1 is accepted")
    if kwargs:
        raise ValueError(
            f"{name}: unsupported kwargs {sorted(kwargs)} — unknown keys "
            "fail loudly (a typo, or a torch knob this scheduler does not "
            "implement)")


class Scheduler:
    """Epoch-level LR scheduler: returns the LR for the *next* epoch."""

    needs_metric = False

    def __init__(self, base_lr: float | None = None):
        self.base_lr = base_lr
        self.last_epoch = 0

    def bind(self, base_lr: float) -> None:
        if self.base_lr is None:
            self.base_lr = base_lr

    def step(self, metric: float | None = None) -> float:
        self.last_epoch += 1
        return self._lr()

    def _lr(self) -> float:
        raise NotImplementedError

    def state_dict(self) -> dict:
        return {"base_lr": self.base_lr, "last_epoch": self.last_epoch}

    def load_state_dict(self, state: dict) -> None:
        self.base_lr = state["base_lr"]
        self.last_epoch = state["last_epoch"]


@register("lr_scheduler")
class StepLR(Scheduler):
    def __init__(self, step_size: int, gamma: float = 0.1, **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.step_size = step_size
        self.gamma = gamma

    def _lr(self) -> float:
        return self.base_lr * self.gamma ** (self.last_epoch // self.step_size)


@register("lr_scheduler")
class MultiStepLR(Scheduler):
    def __init__(self, milestones: Sequence[int], gamma: float = 0.1, **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def _lr(self) -> float:
        passed = sum(1 for m in self.milestones if m <= self.last_epoch)
        return self.base_lr * self.gamma**passed


@register("lr_scheduler")
class ExponentialLR(Scheduler):
    def __init__(self, gamma: float, **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.gamma = gamma

    def _lr(self) -> float:
        return self.base_lr * self.gamma**self.last_epoch


@register("lr_scheduler")
class ConstantLR(Scheduler):
    """torch.optim.lr_scheduler.ConstantLR: ``base_lr * factor`` for the
    first ``total_iters`` epochs, ``base_lr`` after."""

    def __init__(self, factor: float = 1.0 / 3, total_iters: int = 5,
                 **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.factor = factor
        self.total_iters = total_iters

    def _lr(self) -> float:
        return self.base_lr * (
            self.factor if self.last_epoch < self.total_iters else 1.0)


@register("lr_scheduler")
class LinearLR(Scheduler):
    """torch.optim.lr_scheduler.LinearLR: the multiplicative factor ramps
    linearly from ``start_factor`` to ``end_factor`` over ``total_iters``
    epochs (warmup when start < end)."""

    def __init__(self, start_factor: float = 1.0 / 3,
                 end_factor: float = 1.0, total_iters: int = 5,
                 **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters

    def _lr(self) -> float:
        t = min(self.last_epoch, self.total_iters) / self.total_iters
        return self.base_lr * (
            self.start_factor + (self.end_factor - self.start_factor) * t)


@register("lr_scheduler")
class PolynomialLR(Scheduler):
    """torch.optim.lr_scheduler.PolynomialLR: decays to zero at
    ``total_iters`` epochs with the given ``power``."""

    def __init__(self, total_iters: int = 5, power: float = 1.0,
                 **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.total_iters = total_iters
        self.power = power

    def _lr(self) -> float:
        t = min(self.last_epoch, self.total_iters) / self.total_iters
        return self.base_lr * (1.0 - t) ** self.power


@register("lr_scheduler")
class CosineAnnealingLR(Scheduler):
    def __init__(self, T_max: int, eta_min: float = 0.0, **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.T_max = T_max
        self.eta_min = eta_min

    def _lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.last_epoch / self.T_max)
        ) / 2


@register("lr_scheduler")
class CosineAnnealingWarmRestarts(Scheduler):
    def __init__(self, T_0: int, T_mult: int = 1, eta_min: float = 0.0,
                 **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        if T_0 <= 0:
            raise ValueError(f"Expected positive integer T_0, got {T_0}")
        if T_mult < 1:
            raise ValueError(f"Expected integer T_mult >= 1, got {T_mult}")
        self.T_0 = T_0
        self.T_mult = int(T_mult)
        self.eta_min = eta_min

    def _lr(self) -> float:
        t, t_i = self.last_epoch, self.T_0
        while t >= t_i:
            t -= t_i
            t_i = t_i * self.T_mult if self.T_mult > 1 else t_i
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * t / t_i)
        ) / 2


@register("lr_scheduler")
class CyclicLR(Scheduler):
    """torch.optim.lr_scheduler.CyclicLR stepped at the reference's
    epoch cadence (base_trainer.py:64-70 calls scheduler.step() once per
    epoch). ``base_lr`` comes from the config (as in torch it overrides
    the optimizer's lr); momentum cycling is not implemented, and torch
    DEFAULTS to ``cycle_momentum=True`` whenever the optimizer has
    momentum/betas — so a config must pass ``cycle_momentum: false``
    explicitly to acknowledge the LR-only schedule (a silent default here
    would silently train differently from the same torch config)."""

    def __init__(self, base_lr: float, max_lr: float,
                 step_size_up: int = 2000, step_size_down: int | None = None,
                 mode: str = "triangular", gamma: float = 1.0,
                 cycle_momentum: bool | None = None,
                 base_momentum: float | None = None,
                 max_momentum: float | None = None, **kwargs: Any):
        super().__init__(base_lr=base_lr)
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        if cycle_momentum is None or cycle_momentum:
            raise ValueError(
                "CyclicLR momentum cycling is not implemented — this "
                "scheduler drives only the learning rate, while torch "
                "DEFAULTS to cycle_momentum=True when the optimizer has "
                "momentum/betas. Pass cycle_momentum: false explicitly to "
                "opt in to the LR-only schedule.")
        if base_momentum is not None or max_momentum is not None:
            raise ValueError(
                "base_momentum/max_momentum are momentum-cycling knobs; "
                "momentum cycling is not implemented (see cycle_momentum)")
        if mode not in ("triangular", "triangular2", "exp_range"):
            raise ValueError(f"unknown CyclicLR mode {mode!r}")
        self.max_lr = max_lr
        self.step_size_up = step_size_up
        self.step_size_down = (step_size_down if step_size_down is not None
                               else step_size_up)
        self.mode = mode
        self.gamma = gamma

    def _lr(self) -> float:
        total = self.step_size_up + self.step_size_down
        cycle = math.floor(1 + self.last_epoch / total)
        x = 1.0 + self.last_epoch / total - cycle
        ratio = self.step_size_up / total
        if x <= ratio:
            scale = x / ratio
        else:
            scale = (x - 1.0) / (ratio - 1.0)
        height = (self.max_lr - self.base_lr) * scale
        if self.mode == "triangular":
            return self.base_lr + height
        if self.mode == "triangular2":
            return self.base_lr + height / (2.0 ** (cycle - 1))
        return self.base_lr + height * self.gamma ** self.last_epoch


@register("lr_scheduler")
class OneCycleLR(Scheduler):
    """torch.optim.lr_scheduler.OneCycleLR stepped at the reference's
    epoch cadence (base_trainer.py:64-70 — one ``scheduler.step()`` per
    epoch, so ``total_steps`` counts epochs here). Warmup from
    ``max_lr / div_factor`` to ``max_lr`` over ``pct_start`` of the run,
    then anneal to ``max_lr / div_factor / final_div_factor`` (cos or
    linear; optional symmetric ``three_phase``). As with CyclicLR,
    momentum cycling is not implemented and torch DEFAULTS to
    ``cycle_momentum=True`` — configs must pass ``cycle_momentum: false``
    to opt in to the LR-only schedule."""

    def __init__(self, max_lr: float, total_steps: int | None = None,
                 epochs: int | None = None,
                 steps_per_epoch: int | None = None,
                 pct_start: float = 0.3, anneal_strategy: str = "cos",
                 cycle_momentum: bool | None = None,
                 base_momentum: float | None = None,
                 max_momentum: float | None = None,
                 div_factor: float = 25.0, final_div_factor: float = 1e4,
                 three_phase: bool = False, **kwargs: Any):
        super().__init__(base_lr=max_lr / div_factor)
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        if cycle_momentum is None or cycle_momentum:
            raise ValueError(
                "OneCycleLR momentum cycling is not implemented — this "
                "scheduler drives only the learning rate, while torch "
                "DEFAULTS to cycle_momentum=True when the optimizer has "
                "momentum/betas. Pass cycle_momentum: false explicitly to "
                "opt in to the LR-only schedule.")
        if base_momentum is not None or max_momentum is not None:
            raise ValueError(
                "base_momentum/max_momentum are momentum-cycling knobs; "
                "momentum cycling is not implemented (see cycle_momentum)")
        if total_steps is None:
            if epochs is None or steps_per_epoch is None:
                raise ValueError(
                    "OneCycleLR needs total_steps, or epochs together with "
                    "steps_per_epoch")
            total_steps = epochs * steps_per_epoch
        if total_steps <= 0:
            raise ValueError(f"Expected positive total_steps, got {total_steps}")
        if not 0.0 <= pct_start <= 1.0:
            raise ValueError(f"Expected pct_start in [0, 1], got {pct_start}")
        if anneal_strategy not in ("cos", "linear"):
            raise ValueError(f"unknown anneal_strategy {anneal_strategy!r}")
        self.max_lr = max_lr
        self.total_steps = int(total_steps)
        self.anneal_strategy = anneal_strategy
        initial_lr = max_lr / div_factor
        min_lr = initial_lr / final_div_factor
        # torch's phase table (lr_scheduler.OneCycleLR.__init__): fractional
        # end_step boundaries, last phase always ends at total_steps - 1.
        if three_phase:
            self.phases = [
                (float(pct_start * total_steps) - 1, initial_lr, max_lr),
                (float(2 * pct_start * total_steps) - 2, max_lr, initial_lr),
                (self.total_steps - 1, initial_lr, min_lr),
            ]
        else:
            self.phases = [
                (float(pct_start * total_steps) - 1, initial_lr, max_lr),
                (self.total_steps - 1, max_lr, min_lr),
            ]

    def _anneal(self, start: float, end: float, pct: float) -> float:
        if self.anneal_strategy == "cos":
            return end + (start - end) / 2.0 * (1 + math.cos(math.pi * pct))
        return (end - start) * pct + start

    def _lr(self) -> float:
        step_num = self.last_epoch
        if step_num > self.total_steps:
            raise ValueError(
                f"Tried to step {step_num} times. The specified number of "
                f"total steps is {self.total_steps}")
        start_step = 0.0
        for i, (end_step, start_lr, end_lr) in enumerate(self.phases):
            if step_num <= end_step or i == len(self.phases) - 1:
                pct = (step_num - start_step) / (end_step - start_step)
                return self._anneal(start_lr, end_lr, pct)
            start_step = end_step
        raise AssertionError("unreachable")


@register("lr_scheduler")
class ReduceLROnPlateau(Scheduler):
    """Steps on the validation 'Loss' (what base_trainer.py:67 intended)."""

    needs_metric = True

    def __init__(self, mode: str = "min", factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0, cooldown: int = 0,
                 **kwargs: Any):
        super().__init__()
        _refuse_unknown_kwargs(type(self).__name__, kwargs)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.best: float | None = None
        self.num_bad = 0
        self.cooldown_counter = 0
        self.current_lr: float | None = None

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def step(self, metric: float | None = None) -> float:
        if metric is None:
            raise ValueError("ReduceLROnPlateau.step needs the validation metric")
        self.last_epoch += 1
        if self.current_lr is None:
            self.current_lr = self.base_lr
        if self._improved(metric):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.current_lr = max(self.current_lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.current_lr

    def state_dict(self) -> dict:
        return {
            **super().state_dict(),
            "best": self.best,
            "num_bad": self.num_bad,
            "cooldown_counter": self.cooldown_counter,
            "current_lr": self.current_lr,
        }

    def load_state_dict(self, state: dict) -> None:
        super().load_state_dict(state)
        self.best = state["best"]
        self.num_bad = state["num_bad"]
        self.cooldown_counter = state["cooldown_counter"]
        self.current_lr = state["current_lr"]
