"""Speculative-decoding probe at the real Gemma-12B shapes on one chip.

Measures three marginal per-token rates by max_new n-scaling (two lengths,
difference quotient — the only reliable timing through the axon tunnel,
memory/axon-tpu-benchmarking.md):

  1. sequential  — spec_k=0 baseline (expect ~22 ms/token under w8a8)
  2. full-accept — zero weights make every logit row identical, so greedy
     emits token 0 forever; the prompt-lookup then drafts all-zero spans
     that always accept: every (spec_k+1)-wide bundle commits spec_k+1
     tokens. This is the UPPER BOUND speedup (acceptance = 1).
  3. zero-accept — temperature 0.7 over uniform logits samples ~uniformly
     from 64 candidates, so the lookup almost never matches and accepted
     drafts are ~0: the FLOOR (bundle latency with nothing to show).

Real-weight acceptance sits between 2 and 3 and is checkpoint-dependent
(unmeasurable offline — zero egress); prompt-enhancement rewrites reuse
long prompt spans, the regime prompt-lookup was designed for.

Run: python scripts/spec_probe.py [--spec-k 8] [--w8a8|--int4]
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
    ap.add_argument("--spec-k", type=int, default=8)
    ap.add_argument("--mode", choices=("w8a8", "int4"), default="w8a8")
    ap.add_argument("--n1", type=int, default=32)
    ap.add_argument("--n2", type=int, default=160)
    args = ap.parse_args()

    from e2e_bench import build_gemma_int4, sync
    from ltx_tpu.models import gemma3

    cfg = gemma3.Gemma3Config()
    params = build_gemma_int4(cfg, mode=args.mode)
    sync(params["norm"]["w"])
    prompt = np.full((500,), 7, np.int32)  # t_pad 512, the bench prompt size

    def spike_embeddings(p):
        """Rank-1 embedding table whose row 42 dominates: logits[42] >> all
        others, so temperature-0.7 top-p sampling emits 42 with p ~= 1 —
        full acceptance through the PRODUCTION sampled program."""
        d = cfg.hidden_size

        def build():
            c = jnp.full((cfg.vocab_size,), 0.01, jnp.float32)
            c = c.at[42].set(10.0)
            return (c[:, None] * jnp.ones((1, d), jnp.float32)
                    ).astype(jnp.bfloat16)

        return {**p, "embed_tokens": {"w": jax.jit(build)()}}

    def rate(label, temperature, spec_k, params=params):
        ts = {}
        for n in (args.n1, args.n2):
            kw = dict(max_new_tokens=n, temperature=temperature,
                      stop_tokens=(), spec_k=spec_k)
            t0 = time.time()
            out = gemma3.generate_tokens(params, prompt, cfg,
                                         jax.random.key(0), **kw)
            compile_s = time.time() - t0
            assert len(out) == n, (label, n, len(out))
            t0 = time.time()
            gemma3.generate_tokens(params, prompt, cfg,
                                   jax.random.key(1), **kw)
            ts[n] = time.time() - t0
            print(f"  [{label}] n={n}: {ts[n]:.2f} s "
                  f"(compile+run {compile_s:.1f} s)", flush=True)
        ms = (ts[args.n2] - ts[args.n1]) / (args.n2 - args.n1) * 1e3
        print(f"  [{label}] marginal: {ms:.1f} ms/token", flush=True)
        return ms

    print(f"mode={args.mode} spec_k={args.spec_k}", flush=True)
    spiked = spike_embeddings(params)
    seqs = rate("sequential sampled", 0.7, 0, params=spiked)
    seq = rate("sequential greedy", 0.0, 0)
    full = rate(f"spec full-accept greedy k={args.spec_k}", 0.0, args.spec_k)
    fulls = rate(f"spec full-accept sampled k={args.spec_k}", 0.7,
                 args.spec_k, params=spiked)
    floor = rate(f"spec zero-accept sampled k={args.spec_k}", 0.7,
                 args.spec_k)
    print(f"\nsampled: sequential {seqs:.1f} ms/tok | full-accept "
          f"{fulls:.1f} ({seqs / fulls:.2f}x upper bound) | zero-accept "
          f"{floor:.1f} ({seqs / floor:.2f}x floor)\n"
          f"greedy:  sequential {seq:.1f} | full-accept {full:.1f} "
          f"({seq / full:.2f}x)")


if __name__ == "__main__":
    main()
