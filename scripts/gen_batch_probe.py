"""Batched-generation throughput ON the chip (VERDICT r3 #6 'Done').

B same-config prompts stack on the denoise batch axis
(pipeline.generate_videos / serve --gen-batch). This probe measures the
real-shape win on one chip: the 8-step int4 DiT denoise + tiled VAE decode
at 25f@768x512 (the north-star generation config) for B=1 vs B=2 vs B=4 —
per-VIDEO wall time and videos/min. Guidance context rows ride B-major
exactly like the pipeline builds them.

MEASURED (BENCH_NOTES §24): ~1.00x at 25f@768x512 — the denoise at 1536
tokens is already compute-bound (weight streaming amortizes over the
token axis, unlike enhance's T=1 matvec chain), so B multiplies real
FLOPs; only the fixed per-step dispatch amortizes (+31% at 9f@256x256).

Run: python scripts/gen_batch_probe.py [--batches 1,2,4]
"""

import argparse
import dataclasses
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--height", type=int, default=512)
    args = ap.parse_args()

    import bench as dit_bench
    from ltx_tpu.core.config import TransformerConfig
    from ltx_tpu.models import vae
    from ltx_tpu.ops import schedule
    from ltx_tpu.ops.latents import VideoLatentShape
    from ltx_tpu.pipeline.denoise import (
        GuidanceSpec, make_denoise_step, run_denoise_loop,
    )

    tcfg = TransformerConfig()
    dit_params = dit_bench.build_params(tcfg, bits=4)
    sync(dit_params["scale_shift_table"])
    guidance = GuidanceSpec(False, 1.0, 0.0, 0.0, (29,), 0.0, 1.0)

    vcfg = vae.VAEConfig()
    vparams = vae.init_decoder_params(jax.random.key(3), vcfg,
                                      dtype=jnp.bfloat16)
    sync(vparams["conv_in"]["w"])

    results = []
    for b in (int(x) for x in args.batches.split(",")):
        shape = VideoLatentShape.from_pixels(
            b, args.frames, args.height, args.width)
        ctx = jax.random.normal(jax.random.key(4),
                                (b, 1024, tcfg.caption_channels),
                                jnp.bfloat16)
        sigmas = schedule.get_sigmas(8, distilled=True,
                                     token_count=shape.token_count)
        step = make_denoise_step(dit_params, tcfg, guidance, shape, ctx,
                                 None)
        latent0 = jax.random.normal(jax.random.key(5), shape.shape) \
            * float(sigmas[0])
        # warm compile (denoise + decode programs for this B)
        t0 = time.time()
        lat = run_denoise_loop(step, latent0, sigmas, key=jax.random.key(6))
        sync(lat)
        for i in range(b):
            fr = vae.decode_video(
                vparams, lat[i: i + 1].astype(jnp.bfloat16), vcfg,
                timestep=0.05, noise_key=jax.random.key(7 + i))
            sync(fr)
        compile_s = time.time() - t0

        t0 = time.time()
        lat = run_denoise_loop(step, jnp.array(latent0), sigmas,
                               key=jax.random.key(8))
        sync(lat)
        denoise_s = time.time() - t0
        t0 = time.time()
        for i in range(b):
            fr = vae.decode_video(
                vparams, lat[i: i + 1].astype(jnp.bfloat16), vcfg,
                timestep=0.05, noise_key=jax.random.key(9 + i))
            sync(fr)
        decode_s = time.time() - t0

        per_video = (denoise_s + decode_s) / b
        row = {"B": b, "denoise_s": round(denoise_s, 2),
               "decode_s": round(decode_s, 2),
               "per_video_s": round(per_video, 2),
               "videos_per_min": round(60.0 / per_video, 2),
               "compile_s": round(compile_s, 1)}
        results.append(row)
        print(row, flush=True)
        del step, lat, latent0, ctx
        gc.collect()

    base = results[0]["per_video_s"]
    for r in results:
        r["throughput_x"] = round(base / r["per_video_s"], 2)
    import json

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
