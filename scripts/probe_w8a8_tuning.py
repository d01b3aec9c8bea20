"""On-chip A/B: serving-knob retune under W8A8 + EDSR batch scaling.

The zoo W8A8 table (zoo_serving_w8a8.json) was measured at each net's
bf16-optimal volumes-per-call / chunk. int8 halves the bytes per conv, so
the arithmetic-intensity balance shifts and the optima may move. This
probe re-sweeps the knobs for the W8A8 WINNERS (EDSR/RBPN/DUF/TOFlow) and
also checks whether the bf16 EDSR headline gains from more volumes per
call. Chained-dependency timing is inherited from bench_zoo_serving's
pipeline shape (distinct HBM-resident inputs, one block at the end).

Run: python scripts/probe_w8a8_tuning.py [--bf16-only]
Appends one JSON line per variant to /tmp/w8a8_tuning.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench_zoo_serving import (  # noqa: E402
    D, T, H, W, MEAN, STD, build_cases, make_build_z,
)

OUT = "/tmp/w8a8_tuning.jsonl"

# (net, w8a8?, vpc, chunk) variants. The shipped zoo settings are the
# first row per net (reference point re-measured in the same session).
VARIANTS = [
    ("EDSRNet", False, 2, 0),
    ("EDSRNet", False, 4, 0),
    ("EDSRNet", True, 2, 0),
    ("EDSRNet", True, 4, 0),
    ("RBPNet", True, 1, 60),
    ("RBPNet", True, 1, 100),
    ("RBPNet", True, 1, 150),
    ("DUFNet", True, 1, 100),
    ("DUFNet", True, 1, 150),
    ("TOFlowNet", True, 1, 60),
    ("TOFlowNet", True, 1, 100),
]


def main(argv: list[str]) -> None:
    bf16_only = "--bf16-only" in argv
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.infer import TRAIN_FLAG_NETS
    from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply

    by_name = {c[0]: c for c in build_cases()}

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    done = []
    for name, w8a8, vpc, chunk in VARIANTS:
        if bf16_only and w8a8:
            continue
        _, factor, task, net, opts = by_name[name]
        win = opts.get("win")
        extra = {"train": False} if name in TRAIN_FLAG_NETS else {}
        h, w = H // factor, W // factor
        if task == "sisr":
            example = jnp.zeros((1, h, w, 1))
        elif task == "vsr":
            example = jnp.zeros((1, 2, h, w, 1))
        else:
            example = jnp.zeros((1, win, h, w, 1))
        params = net.init(jax.random.PRNGKey(0), example, **extra)
        build_z = make_build_z(jnp, kspace_downscale_jax,
                               factor, task, win, vpc)
        try:
            bufs = [jax.device_put(np.concatenate(
                [make_volume(7 + vpc * i + j) for j in range(vpc)]))
                for i in range(2)]
            jax.block_until_ready(bufs)

            apply_fn = (lambda c, net=net, params=params, extra=extra:
                        net.apply(params, c, **extra))
            if w8a8:
                k = chunk or 60
                z_cal = jax.jit(lambda hf: build_z(hf)[:k])(bufs[0])
                cal = calibrate_w8a8(net, params, [z_cal], **extra)
                apply_fn = make_w8a8_apply(net, params, act_scales=cal,
                                           **extra)

            @jax.jit
            def pipeline(hr_frames, task=task, chunk=chunk, vpc=vpc,
                         apply_fn=apply_fn):
                z = build_z(hr_frames)

                def one(c):
                    out = apply_fn(c)
                    if isinstance(out, (tuple, list)):
                        out = (out[-1] if isinstance(out, list) else out[0])
                    if out.ndim == c.ndim + 1:
                        out = out[-1]
                    return out

                if task == "vsr":
                    sr = apply_fn(z)
                    if isinstance(sr, tuple):
                        sr = sr[0]
                    sr = sr.reshape(vpc * D * T, *sr.shape[2:])
                elif chunk:
                    n = z.shape[0]
                    zc = z.reshape(n // chunk, chunk, *z.shape[1:])
                    sr = jax.lax.map(one, zc)
                    sr = sr.reshape(n, *sr.shape[2:])
                else:
                    sr = one(z)
                sr = sr.astype(jnp.float32)
                out = jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0]
                return out.astype(jnp.uint8)

            t0 = time.time()
            jax.block_until_ready(pipeline(bufs[0]))
            compile_s = time.time() - t0
            t0 = time.time()
            outs = [pipeline(b) for b in bufs]
            jax.block_until_ready(outs)
            vps = 2 * vpc / (time.time() - t0)
            row = {"net": name, "w8a8": w8a8, "vpc": vpc, "chunk": chunk,
                   "volumes_per_sec": round(vps, 3),
                   "compile_s": round(compile_s, 1)}
        except Exception as exc:
            row = {"net": name, "w8a8": w8a8, "vpc": vpc, "chunk": chunk,
                   "error": str(exc)[:200]}
        done.append(row)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
