"""Multi-prompt chain TEXT-phase measurement (VERDICT r4 weak #1 fix).

r4's generate_video_chain enhanced each unique per-segment prompt with a
separate sequential decode and encoded each with its own encode_prompt
call (under phase staging: a full 12.8 GB tower re-upload per unique
prompt). Round 5 routes chains through the batched enhance_prompts +
encode_prompts (one staging cycle, rows share every weight DMA —
pipeline/generate.py::_encode_chain_prompts).

This probe measures the batched path on the chip at real 12B W8A8 shapes:
enhancement wall for 1 vs 3 distinct prompts (the verdict's "≈ single-
prompt + ε" gate) and the batched tower+connector encode for 2 vs 4 rows.
The old per-prompt path's dominant cost — a tower re-upload per unique
prompt — is reported as measured-upload-rate arithmetic, NOT re-run: this
dev tunnel uploads at 10-30 MB/s, so 12.8 GB × 2 extra prompts would be
~15-40 min of wall on its own.

Run: python scripts/chain_text_probe.py  (~6 min incl. compiles)
"""

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
    print(f"[chain_text] {msg}", file=sys.stderr, flush=True)


def make_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    words = ("a cat plays piano at dawn over the hills while rain falls "
             "slowly through golden light and wind moves the tall grass "
             "toward an old stone bridge").split()
    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "<unk>": 3}
    vocab.update({w: i + 4 for i, w in enumerate(dict.fromkeys(words))})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<bos> $A", special_tokens=[("<bos>", 2)])
    return tok


def main():
    from scripts.e2e_bench import build_gemma_int4
    from ltx_tpu.models import gemma3, text_encoder
    from ltx_tpu.pipeline.enhance import enhance_prompts

    gcfg = gemma3.Gemma3Config()
    tecfg = text_encoder.TextEncoderConfig()
    t0 = time.time()
    gparams = build_gemma_int4(gcfg, mode="w8a8")
    sync(gparams["norm"]["w"])
    log(f"w8a8 gemma fixture: {time.time() - t0:.1f} s")
    tok = make_tokenizer()

    del enhance_prompts  # measured at the decode layer below (see note)
    import gc

    report = {}

    # --- enhancement decode: 1 vs 3 rows, EQUAL token counts forced
    # (stop_tokens=() — random weights hit stops at random lengths, which
    # made raw enhance_prompts walls incomparable in the first cut)
    rng = np.random.default_rng(0)
    rows = rng.integers(5, gcfg.vocab_size - 5, (3, 500)).astype(np.int32)
    for b in (1, 3):
        gemma3.generate_tokens_batched(  # warm this batch shape
            gparams, [r for r in rows[:b]], gcfg, jax.random.key(1),
            max_new_tokens=8, stop_tokens=())
        t0 = time.time()
        toks = gemma3.generate_tokens_batched(
            gparams, [r for r in rows[:b]], gcfg, jax.random.key(2),
            max_new_tokens=512, stop_tokens=())
        report[f"enhance_{b}row_512tok_s"] = round(time.time() - t0, 2)
        log(f"enhance B={b}: {report[f'enhance_{b}row_512tok_s']} s "
            f"({sum(len(t) for t in toks)} tokens)")
    gc.collect()  # free KV/prefill buffers before the tower passes

    # --- batched tower encode: the chain encodes unique prompts + the
    # negative in chunks of 2 (encode_prompts batch=2 — B=4 with the
    # 12.8 GB tower resident measured RESOURCE_EXHAUSTED on this chip,
    # which set the pipeline's chain batch cap)
    tower = jax.jit(lambda gp, i, m: gemma3.forward_hidden_states(
        gp, i, m, gcfg))
    for b in (1, 2):
        ids = jnp.ones((b, 1024), jnp.int32)
        mask = jnp.ones((b, 1024), jnp.int32)
        h = tower(gparams, ids, mask)
        sync(h[-1, :, -1])  # compile; sync a slice, not the 49-layer stack
        del h
        gc.collect()
        t0 = time.time()
        h = tower(gparams, ids, mask)
        sync(h[-1, :, -1])
        report[f"tower_b{b}_s"] = round(time.time() - t0, 2)
        del h
        gc.collect()
        log(f"tower B={b}: {report[f'tower_b{b}_s']} s")

    report["enhance_delta_3row_vs_1row_s"] = round(
        report["enhance_3row_512tok_s"] - report["enhance_1row_512tok_s"],
        2)
    report["note"] = (
        "r4's per-prompt chain path = one FULL sequential enhancement + "
        "one tower staging cycle PER unique prompt (12.8 GB re-upload "
        "each under phase staging; 10-30 MB/s tunnel = ~7-20 min each); "
        "the round-5 batched path pays enhance_delta_3row_vs_1row_s for "
        "two extra prompts and zero extra staging cycles")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
