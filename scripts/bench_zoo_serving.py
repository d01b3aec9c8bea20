"""End-to-end serving throughput for EVERY net in the zoo (one TPU chip).

Per net, at its config-standard production size (configs/train/*.yaml), runs
the full fused device pipeline — k-space LR simulation -> normalize -> SR ->
denormalize/uint8 — over ACDC-geometry volumes (D=10 slices x T=30 frames of
192x192 HR) and reports volumes/s and HR frames/s.

Task shapes:
- SISR nets see independent frames; the heavy iterative nets (SRFBN/DRF-
  SISR) consume them in bounded-memory chunks via lax.map inside one jit
  (the 300-frame whole-volume program exceeds the remote compiler);
- VSR nets see whole slice-sequences (D sequences of T frames per volume),
  several volumes per call where that measured faster (bench.py's flagship
  protocol: 4 volumes/call for DRFNet);
- MISR nets see one circular temporal window per output frame (the
  reference's eval protocol, acdc_misr_dataset.py:53-68) — all D*T windows
  are built ON DEVICE from the LR stack by a gather, then consumed in
  chunks.

Writes zoo_serving.json. Run: python scripts/bench_zoo_serving.py [net ...]
``--subpixel``: serve the DBPN-ladder nets (SRFBN/DRFSISR/DRF/RBPN) with
``subpixel_deconv=True`` (exact phase-conv deconvs, ops/subpixel.py) and
write zoo_serving_subpixel.json instead — A/B against the default path.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084


def main(only: list[str]) -> None:
    subpixel = "--subpixel" in only
    fsq = "--fused-squeeze" in only
    only = [n for n in only if not n.startswith("--")]
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.models import (
        Bicubic, DRFNet, DRFSISRNet, DUFNet, EDSRNet, EDVRNet, FRVSRNet,
        RBPNet, SRFBNet, TOFlowNet,
    )
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    bf16 = jnp.bfloat16

    # (name, factor, task, net, opts) — opts: vpc = volumes per call,
    # chunk = frames/windows per lax.map step (bounds live memory),
    # win = MISR window length.
    cases = [
        ("Bicubic", 2, "sisr", Bicubic(upscale_factor=2), {}),
        ("EDSRNet", 2, "sisr",
         EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                 num_features=64, upscale_factor=2, fused_tail=True,
                 dtype=bf16), {"vpc": 2}),
        ("SRFBNet", 2, "sisr",
         SRFBNet(in_channels=1, out_channels=1, num_steps=4, num_features=64,
                 num_groups=6, upscale_factor=2, dtype=bf16,
                 subpixel_deconv=subpixel, fused_squeeze=fsq), {"chunk": 60}),
        ("DRFSISRNet", 2, "sisr",
         DRFSISRNet(in_channels=1, out_channels=1, num_steps=4,
                    num_features=64, num_groups=6, upscale_factor=2,
                    fused_tail=True, dtype=bf16,
                    subpixel_deconv=subpixel, fused_squeeze=fsq),
         {"chunk": 60}),
        ("DRFNet", 2, "vsr",
         DRFNet(in_channels=1, out_channels=1, num_features=64, num_groups=6,
                upscale_factor=2, fused_tail=True, dtype=bf16,
                subpixel_deconv=subpixel, fused_squeeze=fsq), {"vpc": 4}),
        ("FRVSRNet", 4, "vsr",
         FRVSRNet(in_channels=1, out_channels=1, upscale_factor=4,
                  num_resblocks=10, dtype=bf16), {"vpc": 2}),
        ("TOFlowNet", 2, "misr",
         TOFlowNet(in_channels=1, out_channels=1, num_frames=5,
                   upscale_factor=2, dtype=bf16), {"win": 5, "chunk": 60}),
        ("DUFNet", 2, "misr",
         DUFNet(in_channels=1, out_channels=1, num_frames=7, size_filter=5,
                upscale_factor=2, backbone="_DenseLayer16", dtype=bf16),
         {"win": 7, "chunk": 100}),
        ("RBPNet", 2, "misr",
         RBPNet(in_channels=1, out_channels=1, base_filter=64, feat=64,
                num_stages=3, num_resblocks=5, num_frames=5, upscale_factor=2,
                dtype=bf16, subpixel_deconv=subpixel),
         {"win": 5, "chunk": 30}),
        ("EDVRNet", 4, "misr",
         EDVRNet(in_channels=1, out_channels=1, nf=64, nframes=5, groups=8,
                 front_RBs=5, back_RBs=10, dtype=bf16),
         {"win": 5, "chunk": 30}),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    results = {}
    for name, factor, task, net, opts in cases:
        h, w = H // factor, W // factor
        vpc = opts.get("vpc", 1)
        chunk = opts.get("chunk")
        win = opts.get("win")
        if task == "sisr":
            example = jnp.zeros((1, h, w, 1))
        elif task == "vsr":
            example = jnp.zeros((1, 2, h, w, 1))
        else:
            example = jnp.zeros((1, win, h, w, 1))
        extra = {"train": False} if name in ("TOFlowNet", "DUFNet") else {}
        params = net.init(jax.random.PRNGKey(0), example, **extra)

        def net_chunks(z, net=net, params=params, extra=extra, chunk=chunk):
            """Apply the net over the leading axis in lax.map chunks."""
            n = z.shape[0]
            zc = z.reshape(n // chunk, chunk, *z.shape[1:])

            def one(c):
                out = net.apply(params, c, **extra)
                if isinstance(out, (tuple, list)):
                    out = out[-1] if isinstance(out, list) else out[0]
                if out.ndim == c.ndim + 1:  # stacked per-step outputs (SRFB)
                    out = out[-1]
                return out

            out = jax.lax.map(one, zc)
            return out.reshape(n, *out.shape[2:])

        @jax.jit
        def pipeline(hr_frames, net=net, params=params, factor=factor,
                     task=task, win=win, chunk=chunk, vpc=vpc, extra=extra):
            lr = kspace_downscale_jax(hr_frames, factor)  # (vpc*D*T, h, w)
            z = ((lr - MEAN) / (STD + 1e-10))[..., None]
            if task == "sisr":
                if chunk:
                    sr = net_chunks(z)
                else:
                    sr = net.apply(params, z)
                    if isinstance(sr, (tuple, list)):
                        sr = sr[-1]
                if sr.ndim == 5:
                    sr = sr[:, -1]
            elif task == "vsr":
                hh, ww = z.shape[1:3]
                sr = net.apply(params, z.reshape(vpc * D, T, hh, ww, 1))
                if isinstance(sr, tuple):  # FRVSR: (sr_frames, warped_lr)
                    sr = sr[0]
                sr = sr.reshape(vpc * D * T, *sr.shape[2:])
            else:
                hh, ww = z.shape[1:3]
                seq = z.reshape(vpc * D, T, hh, ww, 1)
                # Circular win-frame window centered on every t, on device.
                idx = (jnp.arange(T)[:, None]
                       + jnp.arange(win)[None, :] - win // 2) % T
                wins = jnp.take(seq, idx, axis=1)  # (vpc*D, T, win, hh, ww, 1)
                wins = wins.reshape(vpc * D * T, win, hh, ww, 1)
                sr = net_chunks(wins)
            sr = sr.astype(jnp.float32)
            out = jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0]
            return out.astype(jnp.uint8)

        try:
            bufs = [jax.device_put(np.concatenate(
                [make_volume(7 + vpc * i + j) for j in range(vpc)]))
                for i in range(2)]
            jax.block_until_ready(bufs)
            t0 = time.time()
            jax.block_until_ready(pipeline(bufs[0]))
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            outs = [pipeline(b) for b in bufs]
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            vps = 2 * vpc / dt
            results[name] = {
                "task": task, "factor": factor, "volumes_per_call": vpc,
                "volumes_per_sec": round(vps, 3),
                "hr_frames_per_sec": round(vps * D * T, 1),
                "compile_s": round(compile_s, 1),
            }
            print(f"{name:12s} x{factor} {task}: {vps:8.3f} vol/s "
                  f"({vps * D * T:9.1f} frames/s)  [{vpc} vol/call, "
                  f"compile {compile_s:.0f}s]", flush=True)
        except Exception as exc:
            results[name] = {"error": str(exc)[:300]}
            print(f"{name:12s} FAIL: {str(exc)[:300]}", flush=True)

    out_name = ("zoo_serving_subpixel.json" if subpixel
                else "zoo_serving_fsq.json" if fsq else "zoo_serving.json")
    if only:  # partial rerun: merge over the existing table
        try:
            with open(out_name) as f:
                results = {**json.load(f), **results}
        except FileNotFoundError:
            pass
    with open(out_name, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
