"""Batched Gemma decode throughput at the real 12B shapes on one chip.

Decode is dependent-chain latency bound (docs/BENCH_NOTES.md §3-4): each
token streams the full weight set from HBM whether 1 or B rows ride the
matvecs. generate_tokens_batched therefore multiplies serving throughput
~B× at near-constant latency — this probe measures the actual scaling
(marginal ms/step by max_new n-scaling, then tokens/s = B / step).

HBM bound: w8a8 weights ~12.7 GB + KV cache ~0.4 GB/row at the 1024-slot
enhancement shape -> B<=6 fits one v5e chip; int4 (6 GB) fits B=16+.

Run: python scripts/batch_probe.py [--mode w8a8] [--batches 1 2 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("w8a8", "int4"), default="w8a8")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--n1", type=int, default=32)
    ap.add_argument("--n2", type=int, default=160)
    ap.add_argument("--spec-k", type=int, default=0,
                    help="also measure the batched speculative path: "
                         "full-accept ceiling (spiked embeddings) and "
                         "zero-accept floor (random weights), at each B")
    ap.add_argument("--kv-quant", choices=("bf16", "int8"), default="bf16",
                    help="int8 KV cache: halves cache HBM per row "
                         "(serving capacity; BENCH_NOTES \u00a718)")
    ap.add_argument("--embed-int8", action="store_true",
                    help="int8 embedding table (replaces the 2 GB bf16 "
                         "table; frees ~1 GB for batch rows)")
    args = ap.parse_args()
    if args.embed_int8 and args.spec_k:
        raise SystemExit("--embed-int8 + --spec-k: the spiked-embedding "
                         "ceiling fixture rebuilds the bf16 table; probe "
                         "them separately")

    from e2e_bench import build_gemma_int4, sync
    from ltx_tpu.models import gemma3

    cfg = gemma3.Gemma3Config()
    params = build_gemma_int4(cfg, mode=args.mode)
    if args.embed_int8:
        import jax.numpy as jnp
        params["embed_tokens"] = {
            "w8r": jnp.zeros((cfg.vocab_size, cfg.hidden_size), jnp.int8),
            "sr": jnp.ones((cfg.vocab_size,), jnp.float32),
        }
    sync(params["norm"]["w"])
    base = np.full((500,), 7, np.int32)  # t_pad 512, the bench prompt size

    def set_embed(spiked: bool):
        """Swap the 2 GB embedding table IN PLACE (the fixture's embed is
        zeros, so it can be rebuilt device-side for free): holding the
        zeros AND the spiked table at B=4 (w8a8 12.8 GB + 2x2 GB embeds +
        1.1 GB KV) would cross the 15.5 GB HBM edge.

        Spiked = rank-1 embeddings whose row 42 dominates: sampling emits
        42 with p ~= 1, so prompt-lookup drafts always accept (ceiling) —
        same construction as scripts/spec_probe.py."""
        import jax.numpy as jnp
        d = cfg.hidden_size

        def build():
            if not spiked:
                return jnp.zeros((cfg.vocab_size, d), jnp.bfloat16)
            c = jnp.full((cfg.vocab_size,), 0.01, jnp.float32)
            c = c.at[42].set(10.0)
            return (c[:, None] * jnp.ones((1, d), jnp.float32)
                    ).astype(jnp.bfloat16)

        params["embed_tokens"]["w"] = None  # free before the new table
        params["embed_tokens"]["w"] = jax.jit(build)()
        sync(params["embed_tokens"]["w"][0])

    def rate(b, label, spec_k, params=params, key0=0):
        prompts = [base[: 500 - 13 * i] for i in range(b)]
        ts = {}
        for n in (args.n1, args.n2):
            kw = dict(max_new_tokens=n, temperature=0.7, stop_tokens=(),
                      spec_k=spec_k, kv_quant=args.kv_quant)
            t0 = time.time()
            out = gemma3.generate_tokens_batched(
                params, prompts, cfg, jax.random.key(key0), **kw)
            compile_s = time.time() - t0
            assert all(len(r) == n for r in out), (b, n)
            t0 = time.time()
            gemma3.generate_tokens_batched(
                params, prompts, cfg, jax.random.key(key0 + 1), **kw)
            ts[n] = time.time() - t0
            print(f"  [B={b} {label}] n={n}: {ts[n]:.2f} s "
                  f"(compile+run {compile_s:.1f} s)", flush=True)
        ms = (ts[args.n2] - ts[args.n1]) / (args.n2 - args.n1) * 1e3
        print(f"  [B={b} {label}] marginal: {ms:.1f} ms/step "
              f"= {b / ms * 1e3:.0f} tokens/s", flush=True)
        return ms

    results = {}
    for b in args.batches:
        # vary lengths so per-row pads/positions are exercised
        results[b] = rate(b, "seq", 0)
        if args.spec_k:
            floor = rate(b, f"spec k={args.spec_k} zero-accept",
                         args.spec_k)
            set_embed(True)
            full = rate(b, f"spec k={args.spec_k} full-accept",
                        args.spec_k)
            set_embed(False)
            print(f"  [B={b}] spec bounds: ceiling "
                  f"{b / full * 1e3:.0f} tok/s "
                  f"({results[b] / full:.2f}x), floor "
                  f"{b / floor * 1e3:.0f} tok/s "
                  f"({results[b] / floor:.2f}x)", flush=True)

    base_ms = results[args.batches[0]]
    print(f"\nmode={args.mode}: " + " | ".join(
        f"B={b}: {ms:.1f} ms/step, {b / ms * 1e3:.0f} tok/s "
        f"({b * base_ms / ms / args.batches[0]:.2f}x throughput)"
        for b, ms in results.items()))


if __name__ == "__main__":
    main()
