"""Flash-attention block-size sweep at the long-sequence shapes.

The (512, 2048) default was tuned at 6144 tokens (kernels/
flash_attention.py). Stage-2 runs 19840 tokens where attention is
~310 TFLOP/step (48 layers x 6.45 TFLOP) — at the kernel's measured
~90 TF/s that is half the step. Sweep (block_q, block_k) at T=19840,
H=32, D=128, bf16, n-scaled chained calls.

Usage: python scripts/flash_block_probe.py [T ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def sweep(t):
    from ltx_tpu.kernels.flash_attention import flash_attention

    b, h, d = 1, 32, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b, h, t, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, t, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, t, d), jnp.bfloat16)
    flops = 4 * b * h * t * t * d

    combos = [(256, 1024), (256, 2048), (512, 1024), (512, 2048),
              (512, 4096), (1024, 1024), (1024, 2048), (2048, 512)]
    reps = 4
    for bq, bk in combos:
        try:
            @jax.jit
            def chain(qq, kk, vv):
                out = qq
                for _ in range(reps):
                    out = flash_attention(out, kk, vv, block_q=bq,
                                          block_k=bk)
                return out

            r = chain(q, k, v)
            sync(r)
            t0 = time.time()
            r = chain(q, k, v)
            sync(r)
            per = (time.time() - t0) / reps
            print(f"T={t} bq={bq:5d} bk={bk:5d}: {per * 1e3:7.2f} ms  "
                  f"({flops / per / 1e12:5.1f} TF/s)")
        except Exception as e:  # Mosaic compile failures at big blocks
            print(f"T={t} bq={bq:5d} bk={bk:5d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:80]})")


if __name__ == "__main__":
    print("devices:", jax.devices())
    ts = [int(a) for a in sys.argv[1:]] or [19840]
    for t in ts:
        sweep(t)
