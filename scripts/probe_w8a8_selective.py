"""Selective W8A8 A/B for the DBPN-ladder nets (DRF/SRFBN/DRFSISR).

Full W8A8 REGRESSES on these nets (DRF 0.80x, SRFBN/DRFSISR 0.91x,
zoo_serving_w8a8.json): their device time is concat/fusion-bound and the
quantize/requant steps between ladder stages break exactly the fusions that
path depends on. This probe asks whether a SUBSET of the eligible convs
still wins: per-conv-class filters are applied by pruning the calibrated
scale dict (uncalibrated convs serve full precision — vsr_tpu/quantize.py).

Variants per net (conv classes from kernel_shapes(params)):
  bf16      — no quantization (reference)
  all       — every eligible nn.Conv (the shipped --w8a8 behavior)
  k6_only   — only the k6s2 down-projection convs
  no_1x1    — k>1 convs (down-projections + 3x3s; the concat-consuming
              1x1 squeezes stay bf16)
  1x1_only  — only the squeezes
  deconv_all— all convs + nn.ConvTranspose up-projections
              (quantize_deconvs=True; component probe says ~1.03x)

Timing matches scripts/bench_zoo_serving.py (2 buffers, one block at the
end). Run on the chip: python scripts/probe_w8a8_selective.py [net ...]
Calibrations come from calibrate_zoo_net.py in a CPU subprocess (cached in
/tmp) — do not run concurrently with other CPU-jax processes sharing
/tmp/vsr_tpu_jax_cache_cpu.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_zoo_serving import (  # noqa: E402
    D, H, MEAN, STD, T, W, build_cases, make_build_z,
)

DEFAULT_NETS = ["DRFNet", "SRFBNet", "DRFSISRNet"]


def get_calibration(name: str) -> dict:
    cache = f"/tmp/w8a8_cal_deconv_{name}.json"
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "calibrate_zoo_net.py"), name, "--deconv"],
        capture_output=True, text=True, timeout=3600)
    if proc.returncode:
        raise RuntimeError(f"calibration failed: {proc.stderr[-800:]}")
    cal = json.loads(proc.stdout.splitlines()[-1])
    with open(cache, "w") as f:
        json.dump(cal, f)
    return cal


def main(argv: list[str]) -> None:
    names = [a for a in argv if not a.startswith("--")] or DEFAULT_NETS

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import kernel_shapes, make_w8a8_apply

    cases = {c[0]: c for c in build_cases()}

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    results: dict = {}
    for name in names:
        _, factor, task, net, opts = cases[name]
        h, w = H // factor, W // factor
        vpc = opts.get("vpc", 1)
        chunk = opts.get("chunk")
        win = opts.get("win")
        example = (jnp.zeros((1, 2, h, w, 1)) if task == "vsr"
                   else jnp.zeros((1, win, h, w, 1)) if task == "misr"
                   else jnp.zeros((1, h, w, 1)))
        params = net.init(jax.random.PRNGKey(0), example)
        shapes = kernel_shapes(params)
        cal = get_calibration(name)

        def kclass(path):
            if "ConvTranspose" in path:
                return "deconv"
            k = shapes.get(path, (0,))[0]
            return {1: "1x1", 3: "k3", 6: "k6"}.get(k, f"k{k}")

        classes = {}
        for p in cal:
            classes.setdefault(kclass(p), []).append(p)
        print(f"{name}: calibrated classes: "
              f"{ {k: len(v) for k, v in classes.items()} }", flush=True)

        convs_only = {p: s for p, s in cal.items()
                      if "ConvTranspose" not in p}
        variants = [
            ("bf16", None, False),
            ("all", convs_only, False),
            ("k6_only", {p: s for p, s in convs_only.items()
                         if kclass(p) == "k6"}, False),
            ("no_1x1", {p: s for p, s in convs_only.items()
                        if kclass(p) != "1x1"}, False),
            ("1x1_only", {p: s for p, s in convs_only.items()
                          if kclass(p) == "1x1"}, False),
            ("deconv_all", dict(cal), True),
        ]

        build_z = make_build_z(jnp, kspace_downscale_jax,
                               factor, task, win, vpc)
        bufs = [jax.device_put(np.concatenate(
            [make_volume(7 + vpc * i + j) for j in range(vpc)]))
            for i in range(2)]
        jax.block_until_ready(bufs)

        results[name] = {}
        for vname, scales, qdeconv in variants:
            if scales is None:
                apply_fn = lambda c: net.apply(params, c)
            elif not scales:
                print(f"  {vname:10s}: empty class, skipped", flush=True)
                continue
            else:
                apply_fn = make_w8a8_apply(net, params, act_scales=scales,
                                           quantize_deconvs=qdeconv)

            def net_chunks(z, apply_fn, chunk=chunk):
                n = z.shape[0]
                zc = z.reshape(n // chunk, chunk, *z.shape[1:])

                def one(c):
                    out = apply_fn(c)
                    if isinstance(out, (tuple, list)):
                        out = out[-1] if isinstance(out, list) else out[0]
                    if out.ndim == c.ndim + 1:
                        out = out[-1]
                    return out

                out = jax.lax.map(one, zc)
                return out.reshape(n, *out.shape[2:])

            @jax.jit
            def pipeline(hr_frames, apply_fn=apply_fn):
                z = build_z(hr_frames)
                if task == "sisr":
                    sr = net_chunks(z, apply_fn) if chunk else apply_fn(z)
                    if sr.ndim == 5:
                        sr = sr[:, -1]
                elif task == "vsr":
                    sr = apply_fn(z)
                    if isinstance(sr, tuple):
                        sr = sr[0]
                    sr = sr.reshape(vpc * D * T, *sr.shape[2:])
                else:
                    sr = net_chunks(z, apply_fn)
                sr = sr.astype(jnp.float32)
                out = jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0]
                return out.astype(jnp.uint8)

            t0 = time.time()
            jax.block_until_ready(pipeline(bufs[0]))
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            outs = [pipeline(b) for b in bufs]
            jax.block_until_ready(outs)
            vps = 2 * vpc / (time.perf_counter() - t0)
            n_q = len(scales) if scales else 0
            results[name][vname] = round(vps, 3)
            base = results[name].get("bf16")
            rel = f" ({vps / base:.2f}x bf16)" if base and vname != "bf16" \
                else ""
            print(f"  {vname:10s}: {vps:7.3f} vol/s{rel}  "
                  f"[{n_q} quantized, compile {compile_s:.0f}s]", flush=True)

    with open("/tmp/w8a8_selective.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:])
