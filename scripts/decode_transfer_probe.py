"""Tiled VAE decode wire-format comparison ON the chip (round 4).

The flagship 241f@1024x640 decode is device->host transfer bound
(BENCH_NOTES §16: ~60 s of the 107 s e2e at 10-30 MB/s tunnel throughput;
real PCIe pays per byte too). Measures the same tiled decode back-to-back
in ONE session (tunnel throughput varies across sessions — §16) with:

    uint8  — RGB bytes on the wire (3 B/px, the round-3 default)
    yuv420 — BT.601 4:2:0 planes (1.5 B/px; the codec's own chroma
             subsample moved before the wire)

Run: python scripts/decode_transfer_probe.py [--frames 241 --width 1024
     --height 640] [--reps 2]
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
    ap.add_argument("--frames", type=int, default=241)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from ltx_tpu.models import vae
    from ltx_tpu.ops.latents import VideoLatentShape

    vcfg = vae.VAEConfig()
    params = vae.init_decoder_params(jax.random.key(0), vcfg,
                                     dtype=jnp.bfloat16)
    float(jnp.asarray(params["conv_in"]["w"]).astype(jnp.float32).sum())

    shape = VideoLatentShape.from_pixels(1, args.frames, args.height,
                                         args.width,
                                         channels=vcfg.latent_channels)
    latent = jax.random.normal(jax.random.key(1), shape.shape,
                               jnp.bfloat16)

    modes = (True, "yuv420")  # uint8 RGB vs yuv420 planes
    # warm both compiled programs first so timing excludes compiles
    for m in modes:
        t0 = time.time()
        fr = vae.decode_video(params, latent, vcfg, timestep=0.05,
                              noise_key=jax.random.key(2),
                              tile_size=args.tile, tile_overlap=1,
                              transfer_uint8=m)
        print(f"warm {m}: {time.time() - t0:.1f} s (incl. compile), "
              f"frames {np.asarray(fr).shape}", flush=True)

    results = {}
    for rep in range(args.reps):
        # interleave the modes within each rep so tunnel drift averages out
        for m in modes:
            t0 = time.time()
            fr = vae.decode_video(params, latent, vcfg, timestep=0.05,
                                  noise_key=jax.random.key(2),
                                  tile_size=args.tile, tile_overlap=1,
                                  transfer_uint8=m)
            dt = time.time() - t0
            np.asarray(fr)
            results.setdefault(str(m), []).append(dt)
            print(f"rep {rep} {m}: {dt:.1f} s", flush=True)

    import json

    f, h, w = args.frames, args.height, args.width
    print(json.dumps({
        "shape": f"{f}f@{w}x{h}",
        "uint8_s": [round(x, 1) for x in results["True"]],
        "yuv420_s": [round(x, 1) for x in results["yuv420"]],
        "uint8_wire_mb": round(f * h * w * 3 / 1e6, 1),
        "yuv420_wire_mb": round(f * h * w * 1.5 / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
