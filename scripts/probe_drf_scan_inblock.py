"""Probe: in-scan InBlock for flagship DRFNet serving.

The stock DRFNet applies the shared InBlock to ALL N*T frames up front
(models/drf.py:129-134) — best MXU batching, but the (N*T, h, w, 4F)
intermediate is what limits serving to 4 volumes/call on the 16G chip
(bench.py:150-153). This probe restates the SAME weights with the InBlock
applied per frame INSIDE the lax.scan: the live intermediate shrinks by ~T x,
letting more volumes batch per call. Numerics are identical (same params,
same math, verified here before timing).

Run on the TPU chip: python scripts/probe_drf_scan_inblock.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from flax import linen as nn

    from vsr_tpu.models import DRFNet
    from vsr_tpu.models.drf import _DRFStep, _OutBlock  # noqa: F401
    from vsr_tpu.models.feedback import FBlock, InBlock
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    D, T, H, W = 10, 30, 192, 192
    FACTOR, F, G = 2, 64, 6
    mean, std = 54.089, 48.084
    h_lr, w_lr = H // FACTOR, W // FACTOR

    class _StepIB(nn.Module):
        """_DRFStep with the InBlock inside: carry = (frame_idx, hidden)."""

        num_features: int
        num_groups: int
        out_channels: int
        upscale_factor: int
        fused_tail: bool = False
        dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, carry, xt):
            i, hidden = carry
            in_feat = InBlock(self.num_features, dtype=self.dtype)(xt)
            # Frame 0: hidden state resets to the frame's own features
            # (reference drf_net.py:42-43) — identical to the stock carry
            # init of in_feats_t[0]. (Feature dtype is f32 regardless of the
            # conv dtype: PReLU's f32 alpha promotes.)
            hidden = jnp.where(i == 0, in_feat, hidden.astype(in_feat.dtype))
            f = FBlock(self.num_features, self.num_groups,
                       self.upscale_factor, dtype=self.dtype)(in_feat, hidden)
            out = _OutBlock(self.out_channels, self.upscale_factor,
                            fused=self.fused_tail, dtype=self.dtype)(in_feat + f)
            return (i + 1, f), out

    class DRFNetScanIB(nn.Module):
        num_features: int
        num_groups: int
        out_channels: int = 1
        upscale_factor: int = 2
        fused_tail: bool = True

        @nn.compact
        def __call__(self, x):
            n, t, h, w, c = x.shape
            x_t = jnp.moveaxis(x, 1, 0)
            scan = nn.scan(_StepIB, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=0, out_axes=0)
            hidden0 = jnp.zeros((n, h, w, self.num_features), jnp.float32)
            _, outs = scan(self.num_features, self.num_groups,
                           self.out_channels, self.upscale_factor,
                           fused_tail=self.fused_tail, name="step")(
                (jnp.zeros((), jnp.int32), hidden0), x_t)
            return jnp.moveaxis(outs, 0, 1)

    stock = DRFNet(in_channels=1, out_channels=1, num_features=F,
                   num_groups=G, upscale_factor=FACTOR, fused_tail=True,
                   dtype=jnp.bfloat16)
    params = stock.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, h_lr, w_lr, 1)))

    # Remap: DRFNet/{InBlock_0, step/*} -> DRFNetScanIB/step/{InBlock_0, *}.
    p = params["params"]
    params_ib = {"params": {"step": {"InBlock_0": p["InBlock_0"], **p["step"]}}}
    scanib = DRFNetScanIB(num_features=F, num_groups=G)

    # --- numerics check (tiny shape, still on device) ---------------------
    xs = jnp.asarray(np.random.default_rng(0).random((2, 3, 24, 24, 1)),
                     jnp.float32)
    a = np.asarray(stock.apply(params, xs), np.float32)
    b = np.asarray(scanib.apply(params_ib, xs), np.float32)
    print("max |stock - scanIB| =", np.abs(a - b).max(), flush=True)
    # Same weights/math; bf16 convs tile differently batched (N*T) vs per
    # frame, so allow bf16-level reassociation (2^-10 in z-units ~ 0.05 grey
    # levels after denormalize — far under the 0.5 rounding threshold).
    assert np.abs(a - b).max() <= 4e-3, "in-scan InBlock diverged"

    def make_pipeline(apply_fn, vpc):
        @jax.jit
        def pipeline(hr_frames):
            lr = kspace_downscale_jax(hr_frames, FACTOR)
            z = (lr - mean) / (std + 1e-10)
            z = z.reshape(vpc * D, T, h_lr, w_lr, 1)
            sr = apply_fn(z).astype(jnp.float32)
            out = jnp.clip(jnp.round(sr * std + mean), 0, 255)[..., 0]
            return out.astype(jnp.uint8)
        return pipeline

    def vol(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    def timed(pipeline, vpc, n_calls=2):
        bufs = [jax.device_put(np.concatenate([vol(100 + vpc * i + j)
                                               for j in range(vpc)]))
                for i in range(n_calls)]
        jax.block_until_ready(bufs)
        jax.block_until_ready(pipeline(bufs[0]))
        t0 = time.perf_counter()
        outs = [pipeline(b) for b in bufs]
        jax.block_until_ready(outs)
        return n_calls * vpc / (time.perf_counter() - t0)

    results = {}
    for name, net_apply, prm, vpcs in [
        ("stock", stock.apply, params, (4,)),
        ("scanIB", scanib.apply, params_ib, (4, 8, 16)),
    ]:
        for vpc in vpcs:
            try:
                vps = timed(make_pipeline(lambda z, a=net_apply, q=prm: a(q, z),
                                          vpc), vpc)
                results[f"{name}_vpc{vpc}"] = vps
                print(f"{name} VPC={vpc}: {vps:.3f} vol/s", flush=True)
            except Exception as e:  # OOM etc.
                print(f"{name} VPC={vpc}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
    print(results)


if __name__ == "__main__":
    main()
