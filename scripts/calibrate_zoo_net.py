"""CPU-side W8A8 calibration for a zoo net (incl. scan-body convs).

Re-creates the named zoo case exactly as scripts/bench_zoo_serving.py does
(same net kwargs, same PRNGKey(0) init — flax init is deterministic across
backends), builds a real-distribution input slice from the same synthetic
volume generator, and runs ``calibrate_w8a8(method="callback")`` — the
``jax.debug.callback`` recorder fires inside ``lax.scan``/``nn.scan``
bodies, so the recurrent nets' step convs get static scales too. Prints the
``{module_path: scale}`` dict as ONE JSON line on stdout (the last line).

Run on the CPU backend (callbacks through the axon relay pay a device->host
readback per conv per scan iteration):

    env JAX_PLATFORMS=cpu python scripts/calibrate_zoo_net.py DRFNet
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_zoo_serving import D, T, H, W, build_cases, make_build_z  # noqa: E402


def main(argv: list[str]) -> None:
    subpixel = "--subpixel" in argv
    fsq = "--fused-squeeze" in argv
    deconv = "--deconv" in argv  # also calibrate nn.ConvTranspose sites
    names = [a for a in argv if not a.startswith("--")]
    if len(names) != 1:
        raise SystemExit("usage: calibrate_zoo_net.py <NetName> "
                         "[--subpixel] [--fused-squeeze] [--deconv]")
    name = names[0]

    import jax

    # Always CPU: the axon plugin hook pre-imports jax and can override the
    # JAX_PLATFORMS env var; the config update is authoritative.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.infer import TRAIN_FLAG_NETS
    from vsr_tpu.quantize import calibrate_w8a8

    by_name = {c[0]: c for c in build_cases(subpixel, fsq)}
    if name not in by_name:
        raise SystemExit(f"unknown net {name!r}; have {sorted(by_name)}")
    _, factor, task, net, opts = by_name[name]
    win = opts.get("win")
    h, w = H // factor, W // factor

    if task == "sisr":
        example = jnp.zeros((1, h, w, 1))
    elif task == "vsr":
        example = jnp.zeros((1, 2, h, w, 1))
    else:
        example = jnp.zeros((1, win, h, w, 1))
    extra = {"train": False} if name in TRAIN_FLAG_NETS else {}
    params = net.init(jax.random.PRNGKey(0), example, **extra)

    # One volume (vpc=1 — activation scales don't depend on the batch), the
    # same generator/seed family as the bench buffers.
    rng = np.random.default_rng(7)
    vol = np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)
    build_z = make_build_z(jnp, kspace_downscale_jax, factor, task, win, 1)
    z = jax.jit(build_z)(vol)
    # Slice to keep the 1-core CPU forward tractable: one whole sequence
    # (vsr — the scan needs the full T) / a handful of frames or windows.
    z = z[:1] if task == "vsr" else z[:8]

    cal = calibrate_w8a8(net, params, [z], method="callback",
                         quantize_deconvs=deconv, **extra)
    print(json.dumps(cal))


if __name__ == "__main__":
    main(sys.argv[1:])
