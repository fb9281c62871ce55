"""Autoregressive DRIFT measurement for chained long video (VERDICT r4
next #5).

Latent-carry autoregression's known failure mode is statistical drift:
each segment denoises from a tail the model itself produced, so
per-channel latent statistics can wander over many segments and decoded
frames drift in brightness/contrast. r4 measured chain SPEED only; this
probe runs 8 segments at the north-star shape (25f@768x512, int4 DiT,
8-step distilled, precomputed embeddings — the chain orchestration, not
Gemma) and records per segment:

  * carried-tail latent per-channel stats: L2 drift of channel means from
    segment 0's tail, and the geometric-mean std ratio vs segment 0;
  * full denoised-latent mean/std;
  * decoded frame mean/std (segment slices of the stitched output).

Runs the sweep TWICE: tail_renorm=0.0 (the r4 behavior) and 1.0 (the
round-5 AdaIN knob) — the knob's effect on the drift curve is the
deliverable (docs/BENCH_NOTES.md §28).

CAVEAT: random int4 weights — the DiT is not a trained denoiser, so the
ABSOLUTE drift here characterizes the orchestration's statistical
behavior, not the real model's; what transfers is the mechanism (does the
carried-tail statistic wander? does the knob pin it?).

Run: python scripts/chain_drift_probe.py [--segments 8]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def log(msg):
    print(f"[drift] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--cond-frames", type=int, default=9)
    ap.add_argument("--renorms", default="0.0,1.0")
    args = ap.parse_args()

    from bench import build_params as build_dit_int4
    from ltx_tpu.core.config import GenerationConfig, MemoryConfig, \
        TransformerConfig
    from ltx_tpu.models import vae
    from ltx_tpu.pipeline import generate as gen_mod
    from ltx_tpu.pipeline.generate import LTXPipeline

    tcfg = TransformerConfig()
    vcfg = vae.VAEConfig()
    t0 = time.time()
    dit_params = build_dit_int4(tcfg, bits=4)
    sync(dit_params["scale_shift_table"])
    vparams = vae.init_decoder_params(jax.random.key(6), vcfg,
                                      dtype=jnp.bfloat16)
    sync(vparams["conv_in"]["b"])
    log(f"fixtures: {time.time() - t0:.1f} s")

    pipe = LTXPipeline(
        transformer_params=dit_params, transformer_config=tcfg,
        vae_decoder_params=vparams, vae_config=vcfg,
        memory=MemoryConfig(vae_tile_size=8, vae_tile_overlap=1),
        is_distilled=True,
    )
    cfg = GenerationConfig(width=args.width, height=args.height,
                           num_frames=args.frames, num_steps=8, seed=42,
                           image_cond_noise_scale=0.15)
    emb = {
        "video": np.asarray(
            jax.random.normal(jax.random.key(9),
                              (1, 1024, tcfg.caption_channels),
                              jnp.bfloat16) * 0.2),
        "mask": np.ones((1, 1024), np.float32),
    }
    k_lat = (args.cond_frames - 1) // 8 + 1

    report = {}
    for renorm in (float(r) for r in args.renorms.split(",")):
        seen = []
        orig_loop = gen_mod.run_denoise_loop

        def spy(step, latent, sigmas, **kw):
            out = orig_loop(step, latent, sigmas, **kw)
            seen.append(out)  # device array; stats reduce on device
            return out

        gen_mod.run_denoise_loop = spy
        t0 = time.time()
        try:
            result = pipe.generate_video_chain(
                "probe", cfg, segments=args.segments,
                cond_frames=args.cond_frames,
                precomputed_embeddings=emb, tail_renorm=renorm)
        finally:
            gen_mod.run_denoise_loop = orig_loop
        wall = time.time() - t0

        rows = []
        ref_mean = ref_std = None
        frames = np.asarray(result.frames, np.float32)
        for i, lat in enumerate(seen):
            tail = lat[:, :, -k_lat:].astype(jnp.float32)
            ch_mean = np.asarray(jnp.mean(tail, axis=(0, 2, 3, 4)))
            ch_std = np.asarray(jnp.std(tail, axis=(0, 2, 3, 4)))
            full_mean = float(jnp.mean(lat))
            full_std = float(jnp.std(lat.astype(jnp.float32)))
            if i == 0:
                ref_mean, ref_std = ch_mean, ch_std
            lo = 0 if i == 0 else (args.frames
                                   + (i - 1) * (args.frames
                                                - args.cond_frames))
            hi = lo + (args.frames if i == 0
                       else args.frames - args.cond_frames)
            seg_f = frames[lo:hi]
            rows.append({
                "segment": i,
                "tail_mean_drift_l2": round(float(
                    np.linalg.norm(ch_mean - ref_mean)), 4),
                "tail_std_ratio_geo": round(float(np.exp(np.mean(
                    np.log((ch_std + 1e-8) / (ref_std + 1e-8))))), 4),
                "latent_mean": round(full_mean, 4),
                "latent_std": round(full_std, 4),
                "frames_mean": round(float(seg_f.mean()), 4),
                "frames_std": round(float(seg_f.std()), 4),
            })
            log(f"renorm={renorm} seg {i}: {rows[-1]}")
        report[f"tail_renorm_{renorm}"] = {
            "wall_s": round(wall, 1), "segments": rows}

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
