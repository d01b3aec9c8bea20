"""Fused Pallas DUF kernel vs the XLA reference path (interpret mode on CPU;
the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vsr_tpu.ops.pallas_duf as pallas_duf
from vsr_tpu.ops.dynamic_filter import apply_dynamic_filters


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    original = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return original(*args, **kwargs)

    monkeypatch.setattr(pallas_duf.pl, "pallas_call", interp)
    # The jit cache would keep the compiled (non-interpret) version.
    pallas_duf.duf_dynamic_filter_pallas._clear_cache()
    yield
    pallas_duf.duf_dynamic_filter_pallas._clear_cache()


@pytest.mark.parametrize("size,upscale,h,w", [(3, 2, 16, 16), (5, 2, 8, 24), (3, 3, 9, 12)])
def test_matches_xla_path(rng, size, upscale, h, w):
    x = jnp.asarray(rng.random((2, h, w)), jnp.float32)
    logits = jnp.asarray(
        rng.standard_normal((2, h, w, size * size, upscale * upscale)), jnp.float32
    )
    ours = pallas_duf.duf_dynamic_filter_pallas(x, logits, size=size, upscale=upscale)
    golden = apply_dynamic_filters(
        x[..., None], jax.nn.softmax(logits, axis=3), upscale
    )[..., 0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-4)


def test_uniform_logits_average(rng):
    # Equal logits -> mean over the k^2 neighborhood for every sub-pixel.
    x = jnp.asarray(rng.random((1, 8, 8)), jnp.float32)
    logits = jnp.zeros((1, 8, 8, 9, 4), jnp.float32)
    out = pallas_duf.duf_dynamic_filter_pallas(x, logits, size=3, upscale=2)
    xp = np.pad(np.asarray(x)[0], 1)
    mean33 = np.stack(
        [xp[dy : dy + 8, dx : dx + 8] for dy in range(3) for dx in range(3)]
    ).mean(axis=0)
    np.testing.assert_allclose(np.asarray(out)[0, ::2, ::2], mean33, atol=1e-5)
