"""COLD-WALL measurement of the round-5 warm-compile choreography
(VERDICT r4 next #1) on one chip.

Drives the PRODUCTION `LTXPipeline.generate_video_with_audio_two_stage`
path — the flagship orchestration: dual AV stage-1 -> 2x upscale -> dual
stage-2 (plain Euler) -> tiled video decode + audio decode — from a COLD
compile state, with `_should_warm` forced on so all four programs
(denoise_s1, upscaler, denoise_s2, vae) compile in background threads
starting BEFORE the text phase, each joined right before its phase.

What the r4 serial baseline paid (BENCH_CONTRACT_r04 flagship keys,
241f@1024x640): s1 compile 9.7 s + upscaler ~60 s + s2 18.1 s + VAE ~63 s
≈ 150 s of compiles strictly serialized between phases. With the round-5
warm choreography the expected cold wall adds ~max(compile_i) instead of
sum(compile_i): later programs compile DURING stage-1/upscale execution
(compile/execute concurrency measured in BENCH_NOTES §1; this probe also
demonstrates compile/compile concurrency on the remote backend).

Text encoding is stubbed (fixture embeddings — this measures compile
choreography, not Gemma; the probe logs per-phase walls so the compile
waits are attributable). Shape defaults to 121f@768x512 (AV int4 params +
VAE decode co-resident fit one chip without host-tree phase staging,
which device-built fixtures cannot do).

Run: python scripts/warm_probe.py [--warm 1|0] [--frames 121]
"""

import argparse
import json
import logging
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
    print(f"[warm_probe] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--frames", type=int, default=121)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--height", type=int, default=512)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s",
                        stream=sys.stderr)

    from scripts.contract_bench import build_av_params_int4
    from ltx_tpu.core.config import (GenerationConfig, MemoryConfig,
                                     TransformerConfig)
    from ltx_tpu.models import audio_vae as av_mod
    from ltx_tpu.models import upscaler as up_mod
    from ltx_tpu.models import vae
    from ltx_tpu.pipeline.generate import LTXPipeline

    tcfg = TransformerConfig()
    vcfg = vae.VAEConfig()
    t0 = time.time()
    av_params = build_av_params_int4(tcfg)
    sync(av_params["scale_shift_table"])
    vparams = vae.init_decoder_params(jax.random.key(8), vcfg,
                                      dtype=jnp.bfloat16)
    sync(vparams["conv_in"]["b"])
    ucfg = up_mod.UpscalerConfig()
    uparams = up_mod.init_params(jax.random.key(4), ucfg,
                                 dtype=jnp.bfloat16)
    avcfg = av_mod.AudioVAEConfig()
    voccfg = av_mod.VocoderConfig()
    avp = av_mod.init_audio_vae_params(jax.random.key(9), avcfg)
    vocp = av_mod.init_vocoder_params(jax.random.key(10), voccfg)
    log(f"fixtures: {time.time() - t0:.1f} s")

    pipe = LTXPipeline(
        transformer_params=None, transformer_config=tcfg,
        vae_decoder_params=vparams, vae_config=vcfg,
        upscaler_params=uparams, upscaler_config=ucfg,
        av_transformer_params=av_params,
        audio_vae_params=avp, audio_vae_config=avcfg,
        vocoder_params=vocp, vocoder_config=voccfg,
        memory=MemoryConfig(vae_tile_size=8, vae_tile_overlap=1),
        is_distilled=True,
    )
    # the pipeline owns the only refs now — decode_after_free's attribute
    # clearing must actually free the 11.45 GiB AV tree (a lingering
    # local here pinned it through three OOM'd attempts)
    del av_params, vparams, uparams, avp, vocp

    # stub the text phase: fixture embeddings (compile choreography is
    # the measurement target, not Gemma)
    emb = jnp.asarray(
        jax.random.normal(jax.random.key(9),
                          (1, 1024, tcfg.caption_channels),
                          jnp.bfloat16) * 0.2)
    mask = jnp.ones((1, 1024), jnp.float32)
    pipe.encode_prompt = lambda p: {"video": emb, "audio": emb,
                                    "mask": mask}
    if args.warm:
        pipe._should_warm = lambda c: True

    # emulate phase staging's decode choreography for device-built
    # fixtures: the AV transformer + upscaler leave HBM before the conv
    # stack's activations (both runs RESOURCE_EXHAUSTED without this —
    # production host-loaded trees release via _release_to_host instead)
    import gc

    orig_decode = pipe._decode_frames

    def decode_after_free(latent, key, timings):
        pipe.av_transformer_params = None
        pipe.upscaler_params = None
        gc.collect()
        return orig_decode(latent, key, timings)

    pipe._decode_frames = decode_after_free

    cfg = GenerationConfig(width=args.width, height=args.height,
                           num_frames=args.frames, num_steps=8, seed=0)
    t0 = time.time()
    result = pipe.generate_video_with_audio_two_stage("probe", cfg)
    wall = time.time() - t0
    t = result.timings
    out = {
        "warm": bool(args.warm),
        "shape": f"{args.frames}f@{args.width}x{args.height} "
                 "two-stage+audio",
        "cold_e2e_s": round(wall, 1),
        "denoise_steps_s": [round(d, 2) for d in t.denoise_steps],
        "vae_decode_s": round(t.vae_decode, 2),
        "warm_compile_window_s": round(t.warm_compile, 1),
    }
    frames = np.asarray(result.frames[:2], np.float32)
    out["finite"] = bool(np.isfinite(frames).all())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
