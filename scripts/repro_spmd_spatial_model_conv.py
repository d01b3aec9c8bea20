"""Repro: jax 0.9.0 SPMD partitioner miscompiles spatial x feature conv.

A SAME conv whose input H axis is sharded over one mesh axis while its
kernel's feature dim is sharded over another returns WRONG NUMERICS on the
CPU backend (8 virtual devices) — max abs error ~20 on unit-normal data.
The bug sits in the halo-exchange path: a 1x1 kernel (no halo) is exact,
any kh>1 kernel is wrong; both cin- and cout-sharded kernels are affected,
and which direction (fwd/grad) is wrong flips with whole-program
partitioning choices (with/without a gather constraint or output pinning),
so no annotation workaround is robust.

Because this environment has one real TPU chip, the TPU partitioner cannot
be exonerated — so vsr_tpu refuses meshes that combine 'spatial' and
'model' axes (vsr_tpu/parallel/tp.py:reject_spatial_x_model) instead of
shipping silently-wrong math. data x model and data x spatial each verify
exact and stay supported.

Run: python scripts/repro_spmd_spatial_model_conv.py
Expected output (jax 0.9.0): spatial-only/model-only exact, combined ~2e1.
"""
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main() -> None:
    print("jax", jax.__version__)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("spatial", "model"))
    SPA = NamedSharding(mesh, P(None, "spatial", None, None))
    COUT = NamedSharding(mesh, P(None, None, None, "model"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for kh in (1, 3):
        k = jnp.asarray(rng.standard_normal((kh, kh, 4, 8)).astype(np.float32))
        ref = conv(x, k)
        for name, xs, ks in [
            ("spatial only", jax.device_put(x, SPA), k),
            ("model only  ", x, jax.device_put(k, COUT)),
            ("combined    ", jax.device_put(x, SPA), jax.device_put(k, COUT)),
        ]:
            err = float(jnp.abs(jax.jit(conv)(xs, ks) - ref).max())
            print(f"k={kh}x{kh} {name} max err: {err:.3e}")


if __name__ == "__main__":
    main()
