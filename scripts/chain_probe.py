"""REAL-shape chained long-video probe on one chip.

Measures `LTXPipeline.generate_video_chain` at the north-star shape
(25f@768x512, int4 DiT, 8-step distilled) with 3 segments, proving the
two design claims on hardware:

  1. ONE compiled extension program: segment 1 pays the extension step's
     compile; segment 2 (rebind of context/tail on step._jit) must run at
     pure denoise speed — its 8-step wall should match segment 1's minus
     the compile (~= segment 0's steady-state T2V denoise).
  2. All-denoise-then-all-decode: the DiT never leaves the chip between
     segments; 3 decodes follow.

Text encoding is bypassed via the chain's precomputed_embeddings hook
(the generate_video parity-injection surface) — this probe measures the
chain orchestration, not Gemma.

Run: python scripts/chain_probe.py [--frames 25 --segments 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--segments", type=int, default=3)
    ap.add_argument("--cond-frames", type=int, default=9)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from bench import build_params as build_dit_int4
    from ltx_tpu.core.config import GenerationConfig, TransformerConfig
    from ltx_tpu.models import vae
    from ltx_tpu.pipeline.generate import LTXPipeline

    def sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).sum())

    def log(msg):
        print(f"[chain_probe] {msg}", file=sys.stderr, flush=True)

    t_all = time.time()
    tcfg = TransformerConfig()
    vcfg = vae.VAEConfig()

    t0 = time.time()
    dit_params = build_dit_int4(tcfg, bits=4)
    sync(dit_params["scale_shift_table"])
    log(f"DiT int4 fixture: {time.time() - t0:.1f} s")
    t0 = time.time()
    vae_params = vae.init_decoder_params(jax.random.key(1), vcfg,
                                         dtype=jnp.bfloat16)
    sync(vae_params["conv_in"]["b"])
    log(f"VAE fixture: {time.time() - t0:.1f} s")

    pipe = LTXPipeline(
        transformer_params=dit_params,
        transformer_config=tcfg,
        vae_decoder_params=vae_params,
        vae_config=vcfg,
        is_distilled=True,
    )

    config = GenerationConfig(width=args.width, height=args.height,
                              num_frames=args.frames,
                              num_steps=args.steps, seed=7)
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((1, 128, tcfg.caption_channels)) \
        .astype(np.float32) * 0.02

    t0 = time.time()
    result = pipe.generate_video_chain(
        "ignored", config, segments=args.segments,
        cond_frames=args.cond_frames,
        precomputed_embeddings={
            "video": jnp.asarray(emb, jnp.bfloat16),
            "mask": jnp.ones(emb.shape[:2], jnp.int32),
        })
    wall = time.time() - t0
    frames = np.asarray(result.frames)
    n = args.steps
    seg_walls = [sum(result.timings.denoise_steps[i * n:(i + 1) * n])
                 for i in range(args.segments)]
    log("per-segment denoise walls (seg 0 = T2V compile+run, seg 1 = "
        "extension compile+run, seg 2+ = REBOUND program, run only): "
        + ", ".join(f"{w:.2f} s" for w in seg_walls))
    for i in range(args.segments):
        log(f"seg {i} per-step: " + ", ".join(
            f"{w:.2f}" for w in result.timings.denoise_steps[i * n:
                                                             (i + 1) * n]))
    log(f"vae decode total ({args.segments} decodes): "
        f"{result.timings.vae_decode:.1f} s")
    want_frames = args.frames + (args.segments - 1) * (args.frames
                                                       - args.cond_frames)
    assert frames.shape == (want_frames, args.height, args.width, 3), \
        frames.shape
    assert np.isfinite(frames.astype(np.float32)).all()
    if args.segments >= 3:
        # the rebind claim, on hardware: seg 2 must not recompile.
        # Steady-state = median of seg 0's post-compile steps; a remote
        # recompile would add ~30-300 s on top.
        steady = float(np.median(result.timings.denoise_steps[n - 4:n]))
        budget = 3.0 * n * steady + 10.0
        log(f"steady step {steady:.3f} s -> seg-2 budget {budget:.1f} s")
        assert seg_walls[2] < budget, (seg_walls, steady)
    print(f"CHAIN PROBE OK: {frames.shape} in {wall:.1f} s; segment "
          f"denoise walls {[round(w, 2) for w in seg_walls]} s "
          f"(total wall {time.time() - t_all:.1f} s)")


if __name__ == "__main__":
    main()
