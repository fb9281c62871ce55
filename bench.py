"""Benchmark: DiT denoise step at the reference's detailed-benchmark config.

Measures seconds per denoise step for the REAL LTX-2 DiT architecture
(48 blocks, 32 heads x 128, FFN 16384) at 121 frames @ 768x512 (6144 latent
tokens), distilled single-guidance, int4 weight-only quantized so the 19B
transformer fits one v5e chip's 16 GB HBM (bf16 requires TP over a mesh —
multi-chip hardware is not available to this bench).

Baseline: the reference's qint8 distilled step time at the same config is
30.9 s/step on M3 Max 96GB (BASELINE.md, beaver-dam/README.md §8; bf16 is
39.8 s/step). vs_baseline = baseline / ours (higher is better).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ltx_tpu.core.config import TransformerConfig
from ltx_tpu.ops.latents import VideoLatentShape
from ltx_tpu.pipeline.denoise import GuidanceSpec, make_denoise_step

BASELINE_S_PER_STEP = 30.9  # reference distilled qint8, 121f@768x512


def random_quantized_linear(key, layers, d_in, d_out, bits=4, group=64,
                            bias=True):
    """STACKED quantized weights built host-side (device RNG stages 4x uint32
    transients which OOM during construction; values are irrelevant to a
    speed benchmark)."""
    del key
    p = {}
    if bits == 4:
        host = np.empty((layers, d_in // 2, d_out), np.uint8)
        host[:] = 137  # arbitrary non-zero pattern
        p["w_q4"] = jnp.asarray(host)
    else:
        host = np.empty((layers, d_in, d_out), np.uint8)
        host[:] = 137
        p["w_q"] = jnp.asarray(host)
    p["scale"] = jnp.full((layers, d_in // group, d_out), 2e-3, jnp.float32)
    p["bias"] = jnp.full((layers, d_in // group, d_out), -0.25, jnp.float32)
    if bias:
        p["b"] = jnp.zeros((layers, d_out), jnp.bfloat16)
    return p


def build_params(cfg: TransformerConfig, bits=4):
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
            "to_q": random_quantized_linear(next(ks), nl, d, d, bits),
            "to_k": random_quantized_linear(next(ks), nl, d, d, bits),
            "to_v": random_quantized_linear(next(ks), nl, d, d, bits),
            "to_out": random_quantized_linear(next(ks), nl, d, d, bits),
            "q_norm": {"w": jnp.ones((nl, d), jnp.bfloat16)},
            "k_norm": {"w": jnp.ones((nl, d), jnp.bfloat16)},
        }

    blocks = {
        "attn1": attn(),
        "attn2": attn(),
        "ff": {
            "project_in": random_quantized_linear(next(ks), nl, d,
                                                  cfg.ffn_dim, bits),
            "project_out": random_quantized_linear(next(ks), nl, cfg.ffn_dim,
                                                   d, bits),
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


def main():
    cfg = TransformerConfig()
    shape = VideoLatentShape.from_pixels(1, 121, 512, 768)  # (16, 16, 24)
    assert shape.token_count == 6144

    params = build_params(cfg, bits=4)
    guidance = GuidanceSpec(
        use_cfg=False, cfg_scale=1.0, guidance_rescale=0.0, stg_scale=0.0,
        stg_blocks=(29,), ge_gamma=0.0, cross_attention_scale=1.0,
    )
    context = jax.random.normal(
        jax.random.key(1), (1, 1024, cfg.caption_channels), jnp.bfloat16
    )
    step = make_denoise_step(params, cfg, guidance, shape, context, None)

    latent = jax.random.normal(jax.random.key(2), shape.shape)
    vel = jnp.zeros_like(latent)
    key = jax.random.key(3)

    # warmup / compile; a host readback is the only reliable sync under the
    # axon tunnel (block_until_ready can return before execution finishes)
    latent, vel = step(latent, 0.99, 0.9, vel, jnp.asarray(False), key)
    _ = float(latent.sum())

    n_steps = 4
    t0 = time.time()
    for _ in range(n_steps):
        latent, vel = step(latent, 0.9, 0.7, vel, jnp.asarray(True), key)
    _ = float(latent.sum())  # sync
    s_per_step = (time.time() - t0) / n_steps

    print(json.dumps({
        "metric": "DiT denoise s/step, 121f@768x512 distilled int4 "
                  "(ref qint8 M3Max: 30.9 s/step)",
        "value": round(s_per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(BASELINE_S_PER_STEP / s_per_step, 2),
    }))


if __name__ == "__main__":
    main()
