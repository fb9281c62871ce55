"""REAL-chip probe: flow-matching LoRA train step at the production shape.

Measures one-chip QLoRA fine-tuning cost on the video DiT — full 48-layer
config, W8A8 frozen base (per-channel int8, the fastest stable-in-scan
quantized path; BENCH_NOTES §5), rank-16 f32 LoRA side-paths, remat over
the block scan, bf16 compute — at the 25f@768x512 denoise token count
(1536 tokens). The backward runs the straight-through VJPs
(kernels/quantization.py): int8 bwd = (g*sw) @ w8^T on the MXU.

Fixtures build ON DEVICE (one layer uploads, the stack tiles on device —
tunnel uploads run 10-30 MB/s). Timing: steps chain (params/opt_state feed
back), so the backend cannot memoize; each step syncs via the loss
readback. Step 1 is the compile; steps 2..N are the measurement.

Run: python scripts/train_probe.py [--steps 6] [--tokens 1536] [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[train_probe] {msg}", file=sys.stderr, flush=True)


def build_w8a8_linear(layers, d_in, d_out, bias=True):
    """Device-tiled stacked W8A8 leaf (values irrelevant to speed)."""
    host = np.empty((d_in, d_out), np.int8)
    host[:] = 37
    w8 = jax.jit(lambda a: jnp.tile(a[None], (layers, 1, 1)))(
        jnp.asarray(host))
    p = {"w8": w8, "sw": jnp.full((layers, d_out), 2e-3, jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((layers, d_out), jnp.bfloat16)
    return p


def build_int4_linear(layers, d_in, d_out, bias=True):
    """Device-tiled stacked int4 leaf (block-plane packed, values
    irrelevant to speed)."""
    host = np.empty((d_in // 2, d_out), np.uint8)
    host[:] = 137
    wq = jax.jit(lambda a: jnp.tile(a[None], (layers, 1, 1)))(
        jnp.asarray(host))
    p = {"w_q4": wq,
         "scale": jnp.full((layers, d_in // 64, d_out), 2e-3, jnp.float32),
         "bias": jnp.full((layers, d_in // 64, d_out), -0.25, jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((layers, d_out), jnp.bfloat16)
    return p


def build_w8a8_dit(cfg, quant_linear=build_w8a8_linear):
    d, nl = cfg.inner_dim, cfg.num_layers
    key = jax.random.key(0)

    def dense(k, i, o, scale=0.02):
        return {"w": jax.random.normal(k, (i, o), jnp.bfloat16) * scale,
                "b": jnp.zeros((o,), jnp.bfloat16)}

    ks = iter(jax.random.split(key, 32))

    def attn():
        return {
            "to_q": quant_linear(nl, d, d),
            "to_k": quant_linear(nl, d, d),
            "to_v": quant_linear(nl, d, d),
            "to_out": quant_linear(nl, d, d),
            "q_norm": {"w": jnp.ones((nl, d), jnp.bfloat16)},
            "k_norm": {"w": jnp.ones((nl, d), jnp.bfloat16)},
        }

    return {
        "patchify_proj": dense(next(ks), cfg.in_channels, d),
        "adaln_single": {
            "emb": {"linear_1": dense(next(ks), 256, d),
                    "linear_2": dense(next(ks), d, d)},
            "linear": dense(next(ks), d, 6 * d),
        },
        "caption_projection": {
            "linear_1": dense(next(ks), cfg.caption_channels, d),
            "linear_2": dense(next(ks), d, d),
        },
        "blocks": {
            "attn1": attn(),
            "attn2": attn(),
            "ff": {
                "project_in": quant_linear(nl, d, cfg.ffn_dim),
                "project_out": quant_linear(nl, cfg.ffn_dim, d),
            },
            "scale_shift_table": jnp.zeros((nl, 6, d), jnp.float32),
        },
        "proj_out": dense(next(ks), d, cfg.out_channels),
        "scale_shift_table": jnp.zeros((2, d), jnp.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--tokens", type=int, default=1536,
                    help="1536 = 25f@768x512; 6144 = 121f@768x512")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=256,
                    help="caption token count (training captions are short; "
                    "1024 is the inference worst case)")
    ap.add_argument("--remat-segments", type=int, default=0,
                    help="segmented (sqrt) remat: checkpoint groups of "
                         "48/S blocks; peak scan residuals S + 48/S "
                         "instead of 48 (models/dit.py)")
    ap.add_argument("--sdpa", choices=("xla", "pallas"), default="xla",
                    help="pallas = Pallas flash fwd+bwd kernels (no "
                    "(T,T) logits remat buffer — longer seqs fit)")
    ap.add_argument("--base", choices=("w8a8", "int4", "bf16"),
                    default="w8a8",
                    help="int4 (6.5 GB frozen base) is what lets T=6144 "
                         "(121f) training fit ONE chip: w8a8's 12.9 GB + "
                         "the 2.25 GB per-layer scan residuals exceed HBM "
                         "even with the flash backward")
    args = ap.parse_args()

    from ltx_tpu.core.config import TransformerConfig
    from ltx_tpu.ops import rope as rope_ops
    from ltx_tpu.train import TrainConfig, add_lora
    from ltx_tpu.train.step import init_train_state, make_train_step

    cfg = TransformerConfig()
    # latent grid for the requested token count (f*h*w == tokens)
    grids = {1536: (4, 16, 24), 3072: (8, 16, 24), 6144: (16, 16, 24)}
    if args.tokens not in grids:
        raise SystemExit(f"--tokens must be one of {sorted(grids)}")
    f, h, w = grids[args.tokens]

    t0 = time.time()
    if args.base == "bf16":
        raise SystemExit("bf16 full base exceeds one chip; use w8a8/int4 "
                         "(38 GB bf16 vs 15.5 GB HBM — bf16 training is "
                         "the dp+tp mesh path, see dryrun_multichip)")
    params = build_w8a8_dit(
        cfg, quant_linear=(build_int4_linear if args.base == "int4"
                           else build_w8a8_linear))
    params = add_lora(params, jax.random.key(1), rank=args.rank)
    qk = "w8" if args.base == "w8a8" else "w_q4"
    float(params["blocks"]["attn1"]["to_q"][qk].astype(jnp.float32)[0, 0]
          .sum())  # sync fixture build
    log(f"{args.base} DiT + rank-{args.rank} LoRA fixtures: "
        f"{time.time()-t0:.1f} s")

    b = args.batch
    tokens = jax.random.normal(jax.random.key(2),
                               (b, args.tokens, cfg.in_channels), jnp.float32)
    context = jax.random.normal(jax.random.key(3),
                                (b, args.ctx, cfg.caption_channels),
                                jnp.bfloat16)
    cos, sin = rope_ops.video_rope(f, h, w, cfg.inner_dim, cfg.num_heads)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    tc = TrainConfig(learning_rate=1e-4, lora_only=True, remat=True,
                     compute_dtype=jnp.bfloat16, sdpa_impl=args.sdpa,
                     remat_segments=args.remat_segments)
    # donate trainable+opt_state: the step's outputs alias them (~1 GB at
    # rank 16 — without donation the step does not fit next to the 12.9 GB
    # frozen base)
    trainable, frozen, opt_state = init_train_state(params, tc)
    step = make_train_step(cfg, tc, donate=True)

    t0 = time.time()
    trainable, opt_state, aux = step(trainable, frozen, opt_state, tokens,
                                     context, rope, jax.random.key(10))
    l0 = float(aux["loss"])  # readback = sync; includes compile
    log(f"step 1 (compile+run): {time.time()-t0:.1f} s, loss={l0:.4f}")

    times, losses = [], []
    for i in range(args.steps):
        t1 = time.time()
        trainable, opt_state, aux = step(trainable, frozen, opt_state,
                                         tokens, context, rope,
                                         jax.random.key(11 + i))
        losses.append(float(aux["loss"]))  # sync
        times.append(time.time() - t1)
    med = float(np.median(times))
    log(f"steps 2..{args.steps+1}: {['%.3f' % t for t in times]} s")
    log(f"losses: {['%.4f' % l for l in losses]}")
    assert np.isfinite(losses).all()
    print(f"TRAIN PROBE OK: base={args.base} sdpa={args.sdpa} "
          f"rank={args.rank} B={b} T={args.tokens}: {med:.3f} s/step "
          f"({b*args.tokens/med:.0f} tok/s), grad_norm="
          f"{float(aux['grad_norm']):.3f}")


if __name__ == "__main__":
    main()
