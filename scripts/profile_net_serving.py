"""Device-trace profiles for the bottom of the zoo serving table.

VERDICT round-2 weak #2: RBPN 0.42 / SRFBN 0.60 / DRFSISR 0.62 vol/s got no
trace-driven attack. This captures a jax.profiler trace of ONE serving call
per net at the exact zoo-bench protocol (scripts/bench_zoo_serving.py:
chunked lax.map over 300 192^2-HR frames / windows, bf16) and prints the
top device ops by self time — the evidence for what to rewrite or why the
number is the ceiling.

Run: python scripts/profile_net_serving.py SRFBNet DRFSISRNet RBPNet
Traces land in /tmp/<net>_trace (inspect with tensorboard if needed).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084


from vsr_tpu.utils.profiling import summarize_trace as summarize  # noqa: E402


def main(names: list[str]) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.models import (DRFSISRNet, DUFNet, EDVRNet, FRVSRNet,
                                MoEEDSRNet, RBPNet, SRFBNet, TOFlowNet)
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    bf16 = jnp.bfloat16
    cases = {
        "SRFBNet": (
            SRFBNet(in_channels=1, out_channels=1, num_steps=4,
                    num_features=64, num_groups=6, upscale_factor=2,
                    dtype=bf16), "sisr", 2, {"chunk": 60}),
        "DRFSISRNet": (
            DRFSISRNet(in_channels=1, out_channels=1, num_steps=4,
                       num_features=64, num_groups=6, upscale_factor=2,
                       fused_tail=True, dtype=bf16), "sisr", 2, {"chunk": 60}),
        "RBPNet": (
            RBPNet(in_channels=1, out_channels=1, base_filter=64, feat=64,
                   num_stages=3, num_resblocks=5, num_frames=5,
                   upscale_factor=2, dtype=bf16), "misr", 2,
            {"win": 5, "chunk": 30}),
        "TOFlowNet": (
            TOFlowNet(in_channels=1, out_channels=1, num_frames=5,
                      upscale_factor=2, dtype=bf16), "misr", 2,
            {"win": 5, "chunk": 60, "eval": True}),
        "DUFNet": (
            DUFNet(in_channels=1, out_channels=1, num_frames=7, size_filter=5,
                   upscale_factor=2, backbone="_DenseLayer16", dtype=bf16),
            "misr", 2, {"win": 7, "chunk": 100, "eval": True}),
        "EDVRNet": (
            EDVRNet(in_channels=1, out_channels=1, nf=64, nframes=5, groups=8,
                    front_RBs=5, back_RBs=10, dtype=bf16), "misr", 4,
            {"win": 5, "chunk": 30}),
        "FRVSRNet": (
            FRVSRNet(in_channels=1, out_channels=1, upscale_factor=4,
                     num_resblocks=10, dtype=bf16), "vsr", 4, {}),
        "MoEEDSRNet": (
            MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                       num_features=64, upscale_factor=2, num_experts=4,
                       group_size=256, moe_every=2, fused_tail=True,
                       dispatch_impl="dense",
                       dtype=bf16), "sisr", 2, {"chunk": 60}),
    }
    for name in names or list(cases):
        net, task, factor, opts = cases[name]
        h, w = H // factor, W // factor
        chunk = opts.get("chunk")
        win = opts.get("win")
        extra = {"train": False} if opts.get("eval") else {}
        if task == "sisr":
            example = jnp.zeros((1, h, w, 1))
        elif task == "vsr":
            example = jnp.zeros((1, 2, h, w, 1))
        else:
            example = jnp.zeros((1, win, h, w, 1))
        params = net.init(jax.random.PRNGKey(0), example, **extra)

        def net_chunks(z):
            n = z.shape[0]
            zc = z.reshape(n // chunk, chunk, *z.shape[1:])

            def one(c):
                out = net.apply(params, c, **extra)
                if isinstance(out, (tuple, list)):
                    out = out[-1] if isinstance(out, list) else out[0]
                if out.ndim == c.ndim + 1:
                    out = out[-1]
                return out

            out = jax.lax.map(one, zc)
            return out.reshape(n, *out.shape[2:])

        @jax.jit
        def pipeline(hr_frames):
            lr = kspace_downscale_jax(hr_frames, factor)
            z = ((lr - MEAN) / (STD + 1e-10))[..., None]
            if task == "sisr":
                sr = net_chunks(z)
            elif task == "vsr":
                hh, ww = z.shape[1:3]
                sr = net.apply(params, z.reshape(D, T, hh, ww, 1))
                if isinstance(sr, tuple):  # FRVSR: (sr_frames, warped_lr)
                    sr = sr[0]
                sr = sr.reshape(D * T, *sr.shape[2:])
            else:
                hh, ww = z.shape[1:3]
                seq = z.reshape(D, T, hh, ww, 1)
                idx = (jnp.arange(T)[:, None]
                       + jnp.arange(win)[None, :] - win // 2) % T
                wins = jnp.take(seq, idx, axis=1).reshape(D * T, win, hh, ww, 1)
                sr = net_chunks(wins)
            sr = sr.astype(jnp.float32)
            out = jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0]
            return out.astype(jnp.uint8)

        rng = np.random.default_rng(7)
        vol = jax.device_put(np.round(
            rng.random((D * T, H, W)) * 255).astype(np.float32))
        jax.block_until_ready(vol)
        t0 = time.time()
        jax.block_until_ready(pipeline(vol))
        print(f"{name}: compile+first call {time.time() - t0:.1f}s", flush=True)
        # Chained serial timing (CLAUDE.md: block_until_ready can no-op
        # through the relay): call i+1 consumes a scalar from call i's
        # output; ONE readback at the end syncs the whole chain.
        iters = 3
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            out = pipeline(vol + carry * 1e-12)
            carry = out.astype(jnp.float32).ravel()[0] * 1e-12
        float(carry)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {1 / dt:.3f} vol/s ({D * T / dt:.1f} frames/s, "
              f"chained x{iters})", flush=True)

        outdir = f"/tmp/{name}_trace"
        with jax.profiler.trace(outdir):
            jax.block_until_ready(pipeline(vol))
        print(f"\n===== {name} =====")
        summarize(outdir)


if __name__ == "__main__":
    main(sys.argv[1:])
