"""Serving smoke ON THE CHIP: real-shape w8a8 Gemma behind the HTTP stack.

The serving subsystem's tests run the tiny pipeline on CPU; this probe
stands the production stack (build_app: MicroBatcher + JobQueue + HTTP
server) on the real device with the 12B w8a8 fixture and fires CONCURRENT
/v1/enhance requests — validating request coalescing (N callers -> ONE
compiled batched-decode program) and the /metrics exposition under load.

Usage: python scripts/serve_probe.py [--concurrent 4] [--max-tokens 32]
       [--kv-quant int8] [--embed-int8]
"""

import argparse
import json
import os
import sys
import threading
import time
import types
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    words = ["a", "cat", "dog", "sunset", "rides", "over", "the", "beach",
             "mountain", "storm", "user", "model"]
    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "<end_of_turn>": 3}
    vocab.update({w: i + 10 for i, w in enumerate(words)})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<eos>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<bos> $A", special_tokens=[("<bos>", 2)])
    return tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrent", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--kv-quant", choices=("bf16", "int8"), default="bf16")
    ap.add_argument("--embed-int8", action="store_true")
    ap.add_argument("--port", type=int, default=8719)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from e2e_bench import build_gemma_int4, sync
    from ltx_tpu.models import gemma3
    from ltx_tpu.serve.app import build_app
    from ltx_tpu.serve.server import serve_forever_threaded

    cfg = gemma3.Gemma3Config()
    params = build_gemma_int4(cfg, mode="w8a8")
    if args.embed_int8:
        params["embed_tokens"] = {
            "w8r": jnp.zeros((cfg.vocab_size, cfg.hidden_size), jnp.int8),
            "sr": jnp.ones((cfg.vocab_size,), jnp.float32),
        }
    sync(params["norm"]["w"])
    print("fixture on device", flush=True)

    pipe = types.SimpleNamespace(
        gemma_params=params, gcfg=cfg, tokenizer=build_tokenizer(),
        vision_params=None, vision_config=None)
    app = build_app(pipe, output_dir="/tmp/serve_probe_out",
                    port=args.port, max_batch=args.concurrent,
                    spec_k=0, batch_window_s=0.25,
                    kv_quant=args.kv_quant)
    serve_forever_threaded(app.server)
    base = f"http://127.0.0.1:{args.port}"

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=900) as r:
            return json.loads(r.read())

    # health first
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"

    prompts = ["a cat rides the storm", "a dog over the beach",
               "sunset over the mountain", "a cat and a dog"]
    results = [None] * args.concurrent
    errors = []

    def call(i):
        try:
            results[i] = post("/v1/enhance", {
                "prompts": [prompts[i % len(prompts)]],
                "max_tokens": args.max_tokens, "seed": 7})
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    # warm the compiled program once (random weights sample junk; fine)
    t0 = time.time()
    post("/v1/enhance", {"prompts": [prompts[0]],
                         "max_tokens": args.max_tokens, "seed": 7})
    print(f"warm single request: {time.time() - t0:.1f} s "
          f"(includes compile)", flush=True)

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(args.concurrent)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    assert not errors, errors
    assert all(r is not None and "prompts" in r for r in results), results

    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        metrics = r.read().decode()
    batch_lines = [ln for ln in metrics.splitlines()
                   if "enhance_batch" in ln and not ln.startswith("#")]
    print(f"{args.concurrent} concurrent requests: {wall:.1f} s wall "
          f"(kv={args.kv_quant}, embed_int8={args.embed_int8})", flush=True)
    print("metrics (enhance batches):", flush=True)
    for ln in batch_lines[:12]:
        print(" ", ln, flush=True)
    app.close()
    print("SERVE PROBE OK", flush=True)


if __name__ == "__main__":
    main()
