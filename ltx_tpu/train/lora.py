"""Trainable LoRA adapters over the stacked-block DiT param tree.

The reference only FUSES externally-trained LoRAs (LoRAAdapter.swift:64-166
— permanent W' = W + delta, with a dequantize->merge->requantize dance for
quantized bases); this module makes LoRA a TRAINABLE side-path:

* add_lora inserts {"lora_a" (L, in, r), "lora_b" (L, r, out), "lora_s" (L,)}
  beside the base weight of each targeted linear leaf. lora_b starts at
  zero so the adapted model is exactly the base model at step 0.
* kernels/quantization.py::linear_any reads the side-path transparently —
  it composes with bf16, int8, W8A8 AND the fused Pallas int4 base paths,
  i.e. QLoRA-style training on a quantized frozen base works with no
  requantization round-trip.
* the leaves ride the existing lax.scan over stacked blocks (leading L
  axis) and the existing TP partition specs (parallel/sharding.py shards
  lora_b's out dim column-parallel / lora_a's in dim row-parallel).

merge_lora folds a trained adapter into the base weights for inference
export — numerically the same W + s*(A@B) the fusion path applies.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# Default targets: every linear the distilled-LoRA checkpoint itself
# targets (lora/fuse.py::map_lora_key surface — attention projections and
# both FFN linears inside the blocks).
DEFAULT_TARGETS = (
    "to_q", "to_k", "to_v", "to_out", "project_in", "project_out",
)

_LORA_KEYS = ("lora_a", "lora_b", "lora_s")


def _linear_dims(leaf: dict) -> Optional[Tuple[int, int]]:
    """(d_in, d_out) of a (possibly quantized, possibly stacked) linear."""
    if "w" in leaf:
        s = leaf["w"].shape
        return (s[-2], s[-1]) if len(s) >= 2 else None
    if "w_q" in leaf:
        s = leaf["w_q"].shape
        return s[-2], s[-1]
    if "w8" in leaf:
        s = leaf["w8"].shape
        return s[-2], s[-1]
    if "w_q4" in leaf:
        s = leaf["w_q4"].shape
        return 2 * s[-2], s[-1]  # int4 packs two input rows per byte
    return None


def add_lora(params: dict, key, rank: int = 16, alpha: Optional[float] = None,
             targets: Sequence[str] = DEFAULT_TARGETS,
             dtype=jnp.float32) -> dict:
    """Insert zero-initialised LoRA side-paths into targeted linear leaves.

    Walks the whole tree; a dict containing a weight key whose parent key
    is in `targets` gets the side-path. Stacked leaves (leading layer axis,
    ndim 3+) get per-layer adapters stacked on the same axis so they scan
    with the blocks. lora_a ~ N(0, 1/in), lora_b = 0, lora_s = alpha/rank
    (alpha defaults to rank, i.e. scale 1 — the common LoRA convention).
    """
    if alpha is None:
        alpha = float(rank)
    scale = alpha / rank
    keys = iter(jax.random.split(key, 4096))

    def walk(tree: dict) -> dict:
        out = {}
        for name, v in tree.items():
            if not isinstance(v, dict):
                out[name] = v
                continue
            dims = _linear_dims(v) if name in targets else None
            if dims is None:
                out[name] = walk(v)
                continue
            d_in, d_out = dims
            wk = next(k for k in ("w", "w_q", "w8", "w_q4") if k in v)
            stacked = v[wk].ndim >= 3
            lead = (v[wk].shape[0],) if stacked else ()
            a = (jax.random.normal(next(keys), lead + (d_in, rank),
                                   jnp.float32) * d_in ** -0.5).astype(dtype)
            leaf = dict(v)
            leaf["lora_a"] = a
            leaf["lora_b"] = jnp.zeros(lead + (rank, d_out), dtype)
            leaf["lora_s"] = jnp.full(lead if lead else (), scale, dtype)
            out[name] = leaf
        return out

    return walk(params)


def lora_param_mask(params: dict):
    """Boolean pytree: True on LoRA leaves (for optax.masked and for the
    stop-gradient freeze of the base in LoRA-only training)."""
    def walk(tree):
        return {
            k: (walk(v) if isinstance(v, dict) else k in _LORA_KEYS)
            for k, v in tree.items()
        }
    return walk(params)


def strip_lora(params: dict) -> dict:
    """Remove all LoRA leaves (recover the frozen base tree)."""
    def walk(tree):
        return {
            k: (walk(v) if isinstance(v, dict) else v)
            for k, v in tree.items() if k not in _LORA_KEYS
        }
    return walk(params)


def merge_lora(params: dict) -> dict:
    """Fold trained adapters into base weights: W' = W + s * (A @ B).

    Only bf16/f32 bases merge (quantized bases keep the side-path at
    inference — linear_any applies it — because requantization would
    quantize the learned delta away; the reference's requantize path
    exists only because its runtime cannot express a side-path).
    """
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if not isinstance(v, dict):
                out[k] = v
                continue
            if "lora_a" in v and "w" in v:
                leaf = {kk: vv for kk, vv in v.items()
                        if kk not in _LORA_KEYS}
                a = v["lora_a"].astype(jnp.float32)
                b = v["lora_b"].astype(jnp.float32)
                s = v["lora_s"].astype(jnp.float32)
                if a.ndim == 3:  # stacked: (L, in, r) @ (L, r, out)
                    delta = jnp.einsum("lir,lro->lio", a, b)
                    delta = delta * s[:, None, None]
                else:
                    delta = (a @ b) * s
                leaf["w"] = (v["w"].astype(jnp.float32)
                             + delta).astype(v["w"].dtype)
                out[k] = leaf
            else:
                out[k] = walk(v)
        return out

    return walk(params)
