"""Test-side shim over the framework's weight-interop machinery.

The execution-order capture and layout transforms were promoted to
``vsr_tpu.interop`` (they now also power the user-facing
``vsr_tpu.convert`` checkpoint importer); the parity tests keep importing
from here. Only ``perturb_variables`` is test-specific.
"""

from __future__ import annotations

import numpy as np

from vsr_tpu.interop import (  # noqa: F401  (re-exports for the test suite)
    dcn_offset_perm,
    flax_leaf_order,
    import_torch_state,
    torch_leaf_order,
    transplant,
)


def perturb_variables(variables, rng: np.random.Generator, scale: float = 0.02):
    # 0.02 keeps deep activations in a regime where both frameworks agree to
    # <=5e-7 fp32 (larger noise only adds float round-off amplification in
    # the warp/BN-heavy nets) while still making zero-init layers active
    # enough that layout errors exceed the 5e-6 test tolerance by >3x.
    """Add noise to every param so zero-initialized layers (DCN offset convs,
    resblock biases) contribute to the forward pass; keep BN variances
    positive."""
    import jax

    def leaf(path, a):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        a = np.asarray(a)
        if name == "var":
            return a * np.exp(rng.normal(0.0, scale, a.shape)).astype(a.dtype)
        return a + rng.normal(0.0, scale, a.shape).astype(a.dtype)

    return jax.tree_util.tree_map_with_path(leaf, variables)
