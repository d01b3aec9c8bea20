"""Fold the Normalize/denormalize affines into the EDSR head/tail convs
(round-4 verdict item #5a).

The headline pipeline runs two elementwise affine passes outside the net:
``z = (lr - mean)/(std+eps)`` over the LR frames and ``sr*std + mean``
over the full-res output. Both are linear, so they fold EXACTLY (up to
float rounding) into the first and last convolutions:

    head:  W' = W / s,             b' = b - (mean/s) * sum(W)
    tail:  W'' = W * std,          b'' = b*std + mean

(The input normalize uses s = std + 1e-10 and the output denorm bare
std — the pipeline's own asymmetry, preserved.) The folded pipeline
feeds raw [0,255] frames straight from k-space into the net and emits
grey levels, removing the standalone normalize pass over LR and the
denorm multiply from the output epilogue (round/clip remain).

Measures the exact bench.py protocol (EDSR-16/64 bf16 fused_tail,
vpc=4, chained-in-jit timing) + quality (grey flips + PSNR between
paths). Ship only if the win is real — XLA may already fuse both
affines into neighbouring ops, making this structurally neutral.

Run (chip): python scripts/probe_normalize_fold.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084
FACTOR, BLOCKS, FEATURES, VPC = 2, 16, 64, 4


def fold_normalize_edsr(params, mean, std, eps=1e-10):
    """Param surgery on an EDSRNet tree: returns a new tree with the
    input/output affines folded into the head/tail convs."""
    import jax
    import jax.numpy as jnp

    p = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy of leaves
    s = std + eps
    head = dict(p["params"]["Conv_0"]["Conv_0"])
    k, b = head["kernel"], head["bias"]
    head["kernel"] = (k / s).astype(k.dtype)
    head["bias"] = (b - (mean / s) * k.sum(axis=(0, 1, 2))).astype(b.dtype)
    tail_scope = dict(p["params"]["ShuffleConv_0"]["FoldableConv_0"])
    k2, b2 = tail_scope["kernel"], tail_scope["bias"]
    tail_scope["kernel"] = (k2 * std).astype(k2.dtype)
    tail_scope["bias"] = (b2 * std + mean).astype(b2.dtype)
    new = dict(p["params"])
    new["Conv_0"] = {"Conv_0": head}
    new["ShuffleConv_0"] = {"FoldableConv_0": tail_scope}
    return {"params": new}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.models import EDSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=BLOCKS,
                  num_features=FEATURES, upscale_factor=FACTOR,
                  fused_tail=True, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))
    folded = fold_normalize_edsr(params, MEAN, STD)

    def shipped_body(hr_frames):
        lr = kspace_downscale_jax(hr_frames, FACTOR)
        z = ((lr - MEAN) / (STD + 1e-10))[..., None]
        sr = net.apply(params, z).astype(jnp.float32)
        return jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0].astype(
            jnp.uint8)

    def folded_body(hr_frames):
        lr = kspace_downscale_jax(hr_frames, FACTOR)
        g = net.apply(folded, lr[..., None]).astype(jnp.float32)
        return jnp.clip(jnp.round(g), 0, 255)[..., 0].astype(jnp.uint8)

    def chained(body):
        @jax.jit
        def pipeline(hr_frames, carry):
            out = body(hr_frames + carry * 1e-12)
            return out, out.astype(jnp.float32)[(0,) * out.ndim] * 1e-12

        return pipeline

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    bufs = [jax.device_put(np.concatenate(
        [make_volume(VPC * i + j) for j in range(VPC)])) for i in range(2)]
    for b in bufs:
        float(b.sum())  # real transfer sync (see probe_vol4d_timing.py)

    # Quality first (one call each).
    a = np.asarray(jax.jit(shipped_body)(bufs[0]))
    f = np.asarray(jax.jit(folded_body)(bufs[0]))
    flips = float((a != f).mean())
    md = int(np.abs(a.astype(np.int32) - f.astype(np.int32)).max())
    mse = float(np.mean((a.astype(np.float64) - f.astype(np.float64)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / (mse + 1e-10))
    print(f"quality: {flips * 100:.4f}% grey flips, max |d| {md}, "
          f"{psnr:.1f} dB vs shipped path", flush=True)

    for tag, body in [("shipped", shipped_body), ("folded", folded_body)]:
        pipeline = chained(body)
        carry = jnp.float32(0.0)
        t0 = time.time()
        out, carry = pipeline(bufs[0], carry)
        jax.block_until_ready((out, carry))
        compile_s = time.time() - t0
        iters = 6
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for i in range(iters):
            out, carry = pipeline(bufs[i % 2], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {VPC / dt:7.3f} vol/s [compile {compile_s:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
