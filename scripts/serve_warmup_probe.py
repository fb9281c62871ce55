"""serve --warmup ON THE CHIP (VERDICT r4 weak #6 follow-through).

Stands the production serving stack (build_app + HTTP) on the real device
with int4 DiT + VAE fixtures, pre-compiling ONE shape via
warmup_shapes=[(W, H, F)], then measures:

  * job A at the WARMED shape — must run at steady-state (no compile
    inside the job);
  * job B at a different, UN-warmed frame count — pays its denoise+VAE
    compiles inside the job (the r4 behavior for every first job).

The A/B wall gap is the first-job latency the flag removes.

Run: python scripts/serve_warmup_probe.py
"""

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def log(msg):
    print(f"[serve_warmup] {msg}", file=sys.stderr, flush=True)


def main():
    from bench import build_params as build_dit_int4
    from ltx_tpu.core.config import MemoryConfig, TransformerConfig
    from ltx_tpu.models import vae
    from ltx_tpu.pipeline.generate import LTXPipeline
    from ltx_tpu.serve.app import build_app
    from ltx_tpu.serve.server import serve_forever_threaded

    tcfg = TransformerConfig()
    vcfg = vae.VAEConfig()
    t0 = time.time()
    dit_params = build_dit_int4(tcfg, bits=4)
    sync(dit_params["scale_shift_table"])
    vparams = vae.init_decoder_params(jax.random.key(6), vcfg,
                                      dtype=jnp.bfloat16)
    sync(vparams["conv_in"]["b"])
    log(f"fixtures: {time.time() - t0:.1f} s")

    pipe = LTXPipeline(
        transformer_params=dit_params, transformer_config=tcfg,
        vae_decoder_params=vparams, vae_config=vcfg,
        memory=MemoryConfig(vae_tile_size=8, vae_tile_overlap=1),
        is_distilled=True,
    )
    # stub the text phase (no Gemma fixture — the denoise/VAE compile
    # choreography is the measurement target)
    emb = jnp.asarray(jax.random.normal(
        jax.random.key(9), (1, 1024, tcfg.caption_channels),
        jnp.bfloat16) * 0.2)
    mask = jnp.ones((1, 1024), jnp.float32)
    pipe.encode_prompt = lambda p: {"video": emb, "mask": mask}

    out_dir = tempfile.mkdtemp()
    t0 = time.time()
    app = build_app(pipe, output_dir=out_dir, port=0,
                    warmup_shapes=[(768, 512, 25)])
    warmup_s = time.time() - t0
    log(f"warmup (768x512x25 denoise+vae): {warmup_s:.1f} s")
    serve_forever_threaded(app.server)
    base = "http://%s:%d" % app.server.server_address[:2]

    def run_job(num_frames):
        body = {"prompt": "serve warmup probe", "width": 768,
                "height": 512, "num_frames": num_frames, "num_steps": 8,
                "seed": 3}
        req = urllib.request.Request(
            base + "/v1/generate", json.dumps(body).encode(),
            {"Content-Type": "application/json"})
        t0 = time.time()
        job_id = json.loads(urllib.request.urlopen(req).read())["job_id"]
        rec = app.jobs.wait(job_id, timeout=1200)
        wall = time.time() - t0
        assert rec["state"] == "done", rec
        return round(wall, 1)

    try:
        a = run_job(25)   # warmed shape: steady-state from job 1
        b = run_job(33)   # un-warmed frame count: compiles inside the job
        out = {
            "warmup_s": round(warmup_s, 1),
            "first_job_warmed_shape_s": a,
            "first_job_unwarmed_shape_s": b,
            "first_job_latency_removed_s": round(b - a, 1),
            "note": ("job A runs the pre-compiled 25f programs at "
                     "steady-state; job B pays its denoise+VAE compiles "
                     "inside the job — the r4 cold-start every first "
                     "request used to see"),
        }
        print(json.dumps(out, indent=1))
    finally:
        app.close()


if __name__ == "__main__":
    main()
