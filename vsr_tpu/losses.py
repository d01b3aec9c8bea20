"""Loss functions as pure-jnp callables.

Parity with ``/root/reference/src/model/losses.py`` plus the torch.nn
built-ins the reference resolves by name (``main.py:60-65``): configs naming
``L1Loss`` / ``MSELoss`` / ``SmoothL1Loss`` keep working here.

Reference quirk preserved: ``CharbonnierLoss`` adds epsilon (not epsilon^2)
under the sqrt (``losses.py:33``).
"""

from __future__ import annotations

import jax.numpy as jnp

from vsr_tpu.registry import register


class Loss:
    """Base: a named callable (output, target) -> scalar."""

    def __call__(self, output, target):
        raise NotImplementedError

    @property
    def name(self) -> str:
        return self.__class__.__name__

    def __repr__(self) -> str:
        return self.__class__.__name__


@register("loss")
class L1Loss(Loss):
    def __call__(self, output, target):
        return jnp.mean(jnp.abs(output - target))


@register("loss")
class MSELoss(Loss):
    def __call__(self, output, target):
        return jnp.mean(jnp.square(output - target))


@register("loss")
class SmoothL1Loss(Loss):
    """torch.nn.SmoothL1Loss semantics (beta=1)."""

    def __call__(self, output, target):
        err = jnp.abs(output - target)
        return jnp.mean(jnp.where(err < 1.0, 0.5 * err * err, err - 0.5))


@register("loss")
class HuberLoss(Loss):
    """min(|e|, delta) quadratic + linear split, mean (losses.py:14-20)."""

    def __init__(self, delta: float):
        self.delta = float(delta)

    def __call__(self, output, target):
        abs_error = jnp.abs(output - target)
        quadratic = jnp.minimum(abs_error, self.delta)
        linear = abs_error - quadratic
        return jnp.mean(0.5 * quadratic**2 + self.delta * linear)


@register("loss")
class CharbonnierLoss(Loss):
    def __init__(self, epsilon: float):
        self.epsilon = float(epsilon)

    def __call__(self, output, target):
        return jnp.mean(jnp.sqrt(jnp.square(output - target) + self.epsilon))


@register("loss")
class FlowLoss(MSELoss):
    """Alias of MSE used as the FRVSR flow-warp loss (losses.py:37-44)."""
