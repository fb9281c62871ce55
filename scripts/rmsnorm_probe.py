"""Does a Pallas fused RMSNorm beat XLA's fusion in the DiT? Measure it.

Two probes on the real chip (CLAUDE.md rules: host-readback sync, n-scaled
timing to defeat the ~35 ms dispatch+readback constant):

1. micro: a carry-dependent lax.scan over the weighted rms_norm at the 121f
   denoise activation shape (6144, 4096) bf16 — per-call cost for the XLA
   chain vs kernels/rms_norm.py, derived from two scan lengths.
2. macro: the REAL 121f distilled denoise step (int4 DiT, 48 blocks; each
   block runs 2 weighted q/k norms + 2 weightless adaln norms) traced with
   set_rms_impl("xla") vs ("pallas"), timed over 4 chained steps.

Usage: python scripts/rmsnorm_probe.py [--micro-only]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def micro():
    from ltx_tpu.kernels.rms_norm import rms_norm_pallas
    from ltx_tpu.ops.normalization import rms_norm

    rows, d = 6144, 4096
    x0 = jax.random.normal(jax.random.key(0), (rows, d), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (d,), jnp.bfloat16)

    def run(fn, n):
        def body(c, _):
            # carry-dependent: normalize, then re-scale so the carry keeps
            # moving (pure norm is idempotent -> XLA could hoist)
            c = fn(c, w) * jnp.bfloat16(1.0009765625)
            return c, ()

        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
        out = f(x0)
        sync(out)  # compile + warm
        t0 = time.time()
        out = f(x0)
        sync(out)
        return time.time() - t0

    for name, fn in (("xla", rms_norm),
                     ("pallas", lambda x, w: rms_norm_pallas(x, w))):
        n1, n2 = 16, 144
        t1, t2 = run(fn, n1), run(fn, n2)
        per = (t2 - t1) / (n2 - n1)
        bw = rows * d * 2 * 2 / per / 1e9  # bf16 read+write GB/s
        print(f"micro {name:7s}: {per * 1e6:8.1f} us/call  "
              f"({bw:.0f} GB/s effective)  [t{n1}={t1:.3f} t{n2}={t2:.3f}]")


def macro():
    import bench as dit_bench
    from ltx_tpu.core.config import TransformerConfig
    from ltx_tpu.ops import normalization, schedule
    from ltx_tpu.ops.latents import VideoLatentShape
    from ltx_tpu.pipeline.denoise import (
        GuidanceSpec, build_guidance_context, make_denoise_step,
    )

    tcfg = TransformerConfig()
    params = dit_bench.build_params(tcfg, bits=4)
    sync(params["scale_shift_table"])
    emb = jnp.asarray(
        jax.random.normal(jax.random.key(2), (1, 1024, 3840)), jnp.bfloat16)
    mask = jnp.ones(emb.shape[:2], jnp.float32)
    g = GuidanceSpec(False, 1.0, 0.0, 0.0, (29,), 0.0, 1.0)
    ctx, bias = build_guidance_context(g, emb, mask, None, None)
    shape = VideoLatentShape.from_pixels(1, 121, 512, 768)
    sig = schedule.get_sigmas(8, distilled=True,
                              token_count=shape.token_count)
    lat = jax.random.normal(jax.random.key(3), shape.shape) * float(sig[0])

    for impl in ("xla", "pallas"):
        normalization.set_rms_impl(impl)
        step = make_denoise_step(params, tcfg, g, shape, ctx, bias)
        vel = jnp.zeros_like(lat)
        t0 = time.time()
        l1, _ = step(jnp.array(lat), float(sig[0]), float(sig[1]), vel,
                     jnp.asarray(False), jax.random.key(4))
        sync(l1)
        compile_s = time.time() - t0
        t0 = time.time()
        cur = jnp.array(lat)
        for i in range(4):
            cur, vel = step(cur, float(sig[i]), float(sig[i + 1]), vel,
                            jnp.asarray(i > 0), jax.random.key(5))
        sync(cur)
        per = (time.time() - t0) / 4
        print(f"macro {impl:7s}: {per:.3f} s/step (121f distilled; "
              f"compile {compile_s:.1f} s)")
    normalization.set_rms_impl("xla")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro-only", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices())
    micro()
    if not args.micro_only:
        macro()
