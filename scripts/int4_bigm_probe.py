"""Big-m int4 matmul strategy probe (kernels/quantization.py big-m path).

The fused int4 kernel's grid is m-outermost: every weight tile dequantizes
once PER M-TILE, so VPU dequant work grows with m/bm — and at m=19840 the
divisibility fallback forces bm=128 (155 re-dequants/matmul). The big-m
path dequantizes ONCE (Pallas kernel -> bf16 HBM scratch) and runs a plain
MXU dot.

Probes (real chip, host-readback sync):
1. matmul-level: fused vs dequant+dot at m in {1536, 6144, 19840} on the
   DiT's (4096, 16384) FFN shape, n-scaled chained calls.
2. step-level: the flagship AV stage-2 denoise step (19840 video tokens,
   3 dual steps measured 7.17 s/step fused — BENCH_NOTES §16) with
   BIG_M_DEQUANT_THRESHOLD disabled vs default.

Usage: python scripts/int4_bigm_probe.py [--matmul-only|--step-only]
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


def probe_matmul():
    import bench as dit_bench
    from ltx_tpu.kernels import quantization as qz

    k, n = 4096, 16384
    qp = {kk: v[0] for kk, v in
          dit_bench.build_quantized_linear(1, k, n, bias=False).items()}

    for m in (1536, 6144, 19840):
        x0 = jax.random.normal(jax.random.key(0), (m, k), jnp.bfloat16)

        def run(thresh, reps):
            qz.BIG_M_DEQUANT_THRESHOLD = thresh

            @jax.jit
            def chain(x):
                for _ in range(reps):
                    out = qz.int4_matmul(qp, x)          # (m, n)
                    x = out[:, :k] * jnp.bfloat16(1e-3)  # carry-dependent
                return x

            r = chain(x0)
            sync(r)  # compile+warm
            t0 = time.time()
            r = chain(x0)
            sync(r)
            return (time.time() - t0) / reps

        t_fused = run(1 << 30, 8)
        t_bigm = run(1, 8)
        flops = 2 * m * k * n
        print(f"matmul m={m:6d}: fused {t_fused * 1e3:7.2f} ms "
              f"({flops / t_fused / 1e12:5.1f} TF/s)   "
              f"dequant+dot {t_bigm * 1e3:7.2f} ms "
              f"({flops / t_bigm / 1e12:5.1f} TF/s)")
    qz.BIG_M_DEQUANT_THRESHOLD = 8192


def probe_step():
    from scripts.contract_bench import build_av_params_int4
    from ltx_tpu.core.config import TransformerConfig
    from ltx_tpu.kernels import quantization as qz
    from ltx_tpu.models import dit_av
    from ltx_tpu.ops import schedule
    from ltx_tpu.ops.latents import VideoLatentShape
    from ltx_tpu.pipeline.denoise import (
        GuidanceSpec, build_guidance_context, make_av_denoise_step,
    )

    tcfg = TransformerConfig()
    params = build_av_params_int4(tcfg)
    sync(params["scale_shift_table"])
    emb = jnp.asarray(
        jax.random.normal(jax.random.key(1), (1, 1024, 3840)), jnp.bfloat16)
    mask = jnp.ones(emb.shape[:2], jnp.float32)
    g = GuidanceSpec(False, 1.0, 0.0, 0.0, (29,), 0.0, 1.0)
    v_ctx, bias = build_guidance_context(g, emb, mask, None, None)
    a_ctx, _ = build_guidance_context(g, emb, mask, None, None)

    frames, width, height, fps = 241, 1024, 640, 24.0
    audio_frames = dit_av.audio_frame_count(frames / fps)
    shape = VideoLatentShape.from_pixels(1, frames, height, width)
    sig = schedule.STAGE_2_SIGMAS
    vlat = jax.random.normal(jax.random.key(2), shape.shape) * float(sig[0])
    alat = (jax.random.normal(jax.random.key(3),
                              (1, audio_frames, tcfg.audio_in_channels))
            * float(sig[0]))

    for name, thresh in (("fused ", 1 << 30), ("big-m ", 8192)):
        qz.BIG_M_DEQUANT_THRESHOLD = thresh
        step = make_av_denoise_step(params, tcfg, g, shape, audio_frames,
                                    v_ctx, a_ctx, bias,
                                    video_euler="plain")
        t0 = time.time()
        v1, a1 = step(jnp.array(vlat), jnp.array(alat), float(sig[0]),
                      float(sig[1]), jax.random.key(4))
        sync(v1)
        compile_s = time.time() - t0
        t0 = time.time()
        cv, ca = jnp.array(vlat), jnp.array(alat)
        for i in range(3):
            cv, ca = step(cv, ca, float(sig[min(i, 2)]),
                          float(sig[min(i + 1, 3)]), jax.random.key(5))
        sync(cv)
        per = (time.time() - t0) / 3
        print(f"AV stage-2 {name}: {per:.3f} s/step (19840 tok; "
              f"compile {compile_s:.1f} s)")
    qz.BIG_M_DEQUANT_THRESHOLD = 8192


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--matmul-only", action="store_true")
    ap.add_argument("--step-only", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices())
    if not args.step_only:
        probe_matmul()
    if not args.matmul_only:
        probe_step()
