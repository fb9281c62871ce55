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

    prompts3 = ["a cat plays piano at dawn",
                "rain falls through golden light",
                "wind moves the tall grass"]
    report = {}

    # --- enhancement: 1 vs 3 distinct prompts through the BATCHED path
    for label, ps in (("enhance_1", prompts3[:1]),
                      ("enhance_3", prompts3)):
        enhance_prompts(gparams, gcfg, tok, ps, max_tokens=64,
                        spec_k=0)  # warm compile for this batch shape
        t0 = time.time()
        out = enhance_prompts(gparams, gcfg, tok, ps, max_tokens=512,
                              spec_k=0)
        report[label] = round(time.time() - t0, 2)
        log(f"{label}: {report[label]} s ({len(out)} prompts)")

    # --- batched tower encode: the chain encodes unique prompts + the
    # negative in ONE chunk (encode_prompts); 2 rows vs 4 rows
    tower = jax.jit(lambda gp, i, m: gemma3.forward_hidden_states(
        gp, i, m, gcfg))
    for b in (2, 4):
        ids = jnp.ones((b, 1024), jnp.int32)
        mask = jnp.ones((b, 1024), jnp.int32)
        sync(tower(gparams, ids, mask))  # compile
        t0 = time.time()
        sync(tower(gparams, ids, mask))
        report[f"tower_b{b}"] = round(time.time() - t0, 2)
        log(f"tower B={b}: {report[f'tower_b{b}']} s")

    report["delta_3_vs_1_s"] = round(
        report["enhance_3"] - report["enhance_1"], 2)
    report["note"] = (
        "r4's per-prompt path would add a 12.8 GB tower re-upload per "
        "extra unique prompt under phase staging (10-30 MB/s tunnel = "
        "~7-20 min each) plus a full sequential enhancement per prompt; "
        "the batched path pays delta_3_vs_1_s")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
