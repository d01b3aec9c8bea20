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
``--w8a8``: serve every net W8A8 (calibrated static int8 activation scales,
vsr_tpu/quantize.py) and write zoo_serving_w8a8.json; each row also reports
PSNR of the W8A8 output against the bf16 output of the SAME buffer (scan-
body convs in the recurrent nets stay full precision — uncalibratable).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084

#: Nets whose compute lives inside lax.scan / nn.scan bodies — in-process
#: "outputs" calibration cannot reach those convs; --w8a8 calibrates them
#: in a CPU subprocess via calibrate_w8a8(method="callback").
SCAN_NETS = {"SRFBNet", "DRFSISRNet", "DRFNet", "FRVSRNet"}


def build_cases(subpixel: bool = False, fsq: bool = False):
    """The zoo case list: (name, factor, task, net, opts) — opts: vpc =
    volumes per call, chunk = frames/windows per lax.map step (bounds live
    memory), win = MISR window length."""
    import jax.numpy as jnp

    from vsr_tpu.models import (
        Bicubic, DRFNet, DRFSISRNet, DUFNet, EDSRNet, EDVRNet, FRVSRNet,
        MoEEDSRNet, RBPNet, SRFBNet, TOFlowNet, Volume3DSRNet,
        Volume4DSRNet,
    )

    bf16 = jnp.bfloat16
    return [
        ("Bicubic", 2, "sisr", Bicubic(upscale_factor=2), {}),
        ("EDSRNet", 2, "sisr",
         EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                 num_features=64, upscale_factor=2, fused_tail=True,
                 dtype=bf16), {"vpc": 4}),  # probe_edsr_vpc.py optimum
        ("MoEEDSRNet", 2, "sisr",
         MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                    num_features=64, upscale_factor=2, num_experts=4,
                    group_size=256, moe_every=2, fused_tail=True,
                    dispatch_impl="dense", dtype=bf16), {"vpc": 4}),
        ("SRFBNet", 2, "sisr",
         SRFBNet(in_channels=1, out_channels=1, num_steps=4, num_features=64,
                 num_groups=6, upscale_factor=2, dtype=bf16, unroll=4,
                 subpixel_deconv=subpixel, fused_squeeze=fsq), {"chunk": 60}),
        ("DRFSISRNet", 2, "sisr",
         DRFSISRNet(in_channels=1, out_channels=1, num_steps=4,
                    num_features=64, num_groups=6, upscale_factor=2,
                    fused_tail=True, dtype=bf16, unroll=4,
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
        # The volumetric families (beyond-reference; configs/train/acdc_
        # {3d,4d}_vol_x2.yaml sizes): each time point is one (D, h, w)
        # sample (3d) / the whole scan one (T, D, h, w) sample (4d) —
        # vsr_tpu.infer serves them the same way (volume mode).
        ("Volume3DSRNet", 2, "vol3d",
         Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=8,
                       num_features=32, upscale_factor=2, dtype=bf16,
                       fused_tail=True),
         # vpc sweep: 25.2 at vpc 4 (vpc=1: 5.9); fused_tail round 5:
         # 26.3 -> 27.5 vol/s (probe_vol_fused_tail.py).
         {"vpc": 4}),
        ("Volume4DSRNet", 2, "vol4d",
         Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                       num_resblocks=4, upscale_factor=2, dtype=bf16,
                       hoist_tail=True, fused_tail=True),
         # hoist+fused tail: 14.3 vol/s at vpc 8 = 1.62x the old
         # in-scan-tail row whose thin out-conv made vpc>1 NEGATIVE
         # (scripts/profile_vol4d_serving.py + re-sweep, round 5).
         {"vpc": 8}),
    ]


def make_build_z(jnp, kspace_downscale_jax, factor, task, win, vpc):
    """HR frames -> the net-input batch (pre-chunking); shared between the
    chip bench and the CPU calibration subprocess."""

    def build_z(hr_frames):
        lr = kspace_downscale_jax(hr_frames, factor)  # (vpc*D*T, h, w)
        z = ((lr - MEAN) / (STD + 1e-10))[..., None]
        hh, ww = z.shape[1:3]
        if task == "vsr":
            return z.reshape(vpc * D, T, hh, ww, 1)
        if task in ("vol3d", "vol4d"):
            # Slice-major frames -> volumes per time point: (vpc, D, T,
            # h, w, 1) -> (vpc, T, D, ...) -> batch.
            vols = jnp.swapaxes(z.reshape(vpc, D, T, hh, ww, 1), 1, 2)
            if task == "vol3d":
                return vols.reshape(vpc * T, D, hh, ww, 1)
            return vols  # (vpc, T, D, h, w, 1)
        if task == "misr":
            seq = z.reshape(vpc * D, T, hh, ww, 1)
            # Circular win-frame window centered on every t, on device.
            idx = (jnp.arange(T)[:, None]
                   + jnp.arange(win)[None, :] - win // 2) % T
            wins = jnp.take(seq, idx, axis=1)  # (vpc*D, T, win, ...)
            return wins.reshape(vpc * D * T, win, hh, ww, 1)
        return z

    return build_z


def main(only: list[str]) -> None:
    subpixel = "--subpixel" in only
    fsq = "--fused-squeeze" in only
    w8a8 = "--w8a8" in only
    only = [n for n in only if not n.startswith("--")]
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.infer import TRAIN_FLAG_NETS
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    cases = build_cases(subpixel, fsq)
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
        elif task == "vol3d":
            example = jnp.zeros((1, 2, h, w, 1))
        elif task == "vol4d":
            example = jnp.zeros((1, 2, 2, h, w, 1))
        else:
            example = jnp.zeros((1, win, h, w, 1))
        extra = {"train": False} if name in TRAIN_FLAG_NETS else {}
        params = net.init(jax.random.PRNGKey(0), example, **extra)

        build_z = make_build_z(jnp, kspace_downscale_jax,
                               factor, task, win, vpc)

        try:
            bufs = [jax.device_put(np.concatenate(
                [make_volume(7 + vpc * i + j) for j in range(vpc)]))
                for i in range(2)]
            for b in bufs:
                # REAL transfer sync: block_until_ready does NOT await
                # in-flight device_puts through the relay — a timed call
                # whose input is still streaming measures the transfer
                # (cost a 3x-wrong vol4d row; probe_vol4d_timing.py).
                float(b.sum())

            apply_fn = (lambda c, net=net, params=params, extra=extra:
                        net.apply(params, c, **extra))
            n_cal = 0
            if (w8a8 and name != "Bicubic"
                    and task not in ("vol3d", "vol4d")):
                from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply

                if name in SCAN_NETS:
                    # Scan-body convs need callback calibration, which must
                    # not run through the axon relay (one device->host
                    # readback per conv per iteration) — run it on the CPU
                    # backend in a subprocess (scales are backend-free).
                    import os
                    import subprocess

                    proc = subprocess.run(
                        [sys.executable,
                         os.path.join(os.path.dirname(
                             os.path.abspath(__file__)),
                             "calibrate_zoo_net.py"), name]
                        + (["--subpixel"] if subpixel else [])
                        + (["--fused-squeeze"] if fsq else []),
                        env={**os.environ, "JAX_PLATFORMS": "cpu"},
                        capture_output=True, text=True, timeout=1800)
                    if proc.returncode:
                        raise RuntimeError(
                            f"calibration subprocess failed: "
                            f"{proc.stderr[-500:]}")
                    cal = json.loads(proc.stdout.splitlines()[-1])
                else:
                    # Calibrate on a real-distribution slice of the first
                    # buffer (the first chunk of frames or windows).
                    k = chunk or 60
                    z_cal = jax.jit(lambda h: build_z(h)[:k])(bufs[0])
                    cal = calibrate_w8a8(net, params, [z_cal], **extra)
                n_cal = len(cal)
                apply_fn = make_w8a8_apply(net, params, act_scales=cal,
                                           **extra)

            def net_chunks(z, apply_fn, chunk=chunk):
                """Apply the net over the leading axis in lax.map chunks.
                ``apply_fn`` is an explicit argument (NOT a def-time default)
                so the quality A/B below really swaps the bf16 apply in."""
                n = z.shape[0]
                zc = z.reshape(n // chunk, chunk, *z.shape[1:])

                def one(c):
                    out = apply_fn(c)
                    if isinstance(out, (tuple, list)):
                        out = out[-1] if isinstance(out, list) else out[0]
                    if out.ndim == c.ndim + 1:  # stacked per-step outs (SRFB)
                        out = out[-1]
                    return out

                out = jax.lax.map(one, zc)
                return out.reshape(n, *out.shape[2:])

            @jax.jit
            def pipeline(hr_frames, task=task, chunk=chunk, vpc=vpc,
                         apply_fn=apply_fn):
                z = build_z(hr_frames)
                if task == "sisr":
                    if chunk:
                        sr = net_chunks(z, apply_fn)
                    else:
                        sr = apply_fn(z)
                        if isinstance(sr, (tuple, list)):
                            sr = sr[-1]
                    if sr.ndim == 5:
                        sr = sr[:, -1]
                elif task == "vsr":
                    sr = apply_fn(z)
                    if isinstance(sr, tuple):  # FRVSR: (sr, warped_lr)
                        sr = sr[0]
                    sr = sr.reshape(vpc * D * T, *sr.shape[2:])
                elif task in ("vol3d", "vol4d"):
                    sr = apply_fn(z)  # (vpc*T, D, ...) / (vpc, T, D, ...)
                    vols = (sr.reshape(vpc, T, D, *sr.shape[2:])
                            if task == "vol3d" else sr)
                    sr = jnp.swapaxes(vols, 1, 2).reshape(
                        vpc * D * T, *vols.shape[3:])
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
            dt = time.perf_counter() - t0
            vps = 2 * vpc / dt
            results[name] = {
                "task": task, "factor": factor, "volumes_per_call": vpc,
                "volumes_per_sec": round(vps, 3),
                "hr_frames_per_sec": round(vps * D * T, 1),
                "compile_s": round(compile_s, 1),
            }
            if (w8a8 and name != "Bicubic"
                    and task not in ("vol3d", "vol4d")):
                # Quality vs the bf16 path on the SAME buffer.
                base_apply = (lambda c, net=net, params=params, extra=extra:
                              net.apply(params, c, **extra))
                base = jax.jit(lambda h: pipeline.__wrapped__(
                    h, apply_fn=base_apply))(bufs[0])
                got = np.asarray(outs[0], np.float64)
                ref = np.asarray(base, np.float64)
                mse = float(np.mean((ref - got) ** 2))
                pq = 10 * np.log10(255.0 ** 2 / (mse + 1e-10))
                results[name]["calibrated_convs"] = n_cal
                results[name]["psnr_vs_bf16"] = round(pq, 2)
                results[name]["max_diff"] = int(np.abs(ref - got).max())
            print(f"{name:12s} x{factor} {task}: {vps:8.3f} vol/s "
                  f"({vps * D * T:9.1f} frames/s)  [{vpc} vol/call, "
                  f"compile {compile_s:.0f}s"
                  + (f", {n_cal} cal convs, "
                     f"{results[name].get('psnr_vs_bf16', '?')} dB vs bf16"
                     if w8a8 and name != "Bicubic" else "") + "]", flush=True)
        except Exception as exc:
            results[name] = {"error": str(exc)[:300]}
            print(f"{name:12s} FAIL: {str(exc)[:300]}", flush=True)

    out_name = ("zoo_serving_subpixel.json" if subpixel
                else "zoo_serving_fsq.json" if fsq
                else "zoo_serving_w8a8.json" if w8a8 else "zoo_serving.json")
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
