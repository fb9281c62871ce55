"""Weight-only group-wise affine quantization (int8 / int4).

TPU-native equivalent of MLX's `quantize/QuantizedLinear` (Metal) used by the
reference for `--transformer-quant qint8|int4`
(reference: Sources/LTXVideo/Configuration/LTXQuantizationConfig.swift:19-115,
LTXPipeline.swift:323-333). Same scheme: groups of `group_size` along the
INPUT dimension, asymmetric affine (scale + bias per group):

    w ~= w_q * scale[g] + bias[g],   w_q in [0, 2^bits - 1]

Storage is a pytree of arrays only (jit-friendly): int8 uses key "w_q"
(uint8, (in, out)); int4 uses key "w_q4" (uint8, (in/2, out), two nibbles
per byte along the input axis). Group size is derived from the scale shape,
so everything is static at trace time. Matmuls dequantize inside the jitted
step — XLA fuses the dequant into the dot's operand load, so HBM traffic is
the quantized bytes (the op is bandwidth-bound, which is the whole point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, bits: int = 8, group_size: int = 64):
    """Quantize (in, out) float weight -> {"w_q"|"w_q4", "scale", "bias"}."""
    d_in, d_out = w.shape
    assert d_in % group_size == 0, f"{d_in} % {group_size} != 0"
    levels = (1 << bits) - 1
    wf = w.astype(jnp.float32).reshape(d_in // group_size, group_size, d_out)
    w_min = wf.min(axis=1, keepdims=True)
    w_max = wf.max(axis=1, keepdims=True)
    scale = (w_max - w_min) / levels
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round((wf - w_min) / scale), 0, levels)
    out = {
        "scale": scale[:, 0].astype(jnp.float32),
        "bias": w_min[:, 0].astype(jnp.float32),
    }
    q8 = q.reshape(d_in, d_out).astype(jnp.uint8)
    if bits == 8:
        out["w_q"] = q8
    elif bits == 4:
        out["w_q4"] = (q8[0::2] | (q8[1::2] << 4)).astype(jnp.uint8)
    else:
        raise ValueError(f"unsupported bits: {bits}")
    return out


def _unpack(qp):
    """-> (q float32 (in, out), group_size)."""
    if "w_q" in qp:
        q = qp["w_q"].astype(jnp.float32)
    else:
        packed = qp["w_q4"]
        lo = (packed & 0x0F).astype(jnp.float32)
        hi = (packed >> 4).astype(jnp.float32)
        d2, d_out = packed.shape
        q = jnp.stack([lo, hi], axis=1).reshape(d2 * 2, d_out)
    group = q.shape[0] // qp["scale"].shape[0]
    return q, group


def dequantize_weight(qp, dtype=jnp.bfloat16):
    """Inverse of quantize_weight -> (in, out) dtype weight."""
    q, group = _unpack(qp)
    d_in, d_out = q.shape
    qg = q.reshape(d_in // group, group, d_out)
    w = qg * qp["scale"][:, None] + qp["bias"][:, None]
    return w.reshape(d_in, d_out).astype(dtype)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and ("w_q" in p or "w_q4" in p)


def linear_any(p, x):
    """Apply a linear that may be quantized ({"w_q"|"w_q4", scale, bias, b?})
    or plain ({"w", b?}); f32 accumulation either way.

    Stacked-block params carry a leading layer axis; under lax.scan the body
    sees the per-layer slice, so shapes here are always 2D.
    """
    if is_quantized(p):
        w = dequantize_weight(p, jnp.bfloat16).astype(x.dtype)
        if "w_q" in p:
            # int8 only: without the barrier XLA fuses the dequant into the
            # dot's operand load and RE-DEQUANTIZES the full weight per
            # output tile (508 ms vs 9 ms for a 4096x16384 matmul at 6144
            # tokens on v5e). The int4 unpack fuses WELL — barrier there
            # costs ~15% by forcing an HBM round-trip of the bf16 weight.
            w = jax.lax.optimization_barrier(w)
    else:
        w = p["w"]
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def quantize_linear_params(p, bits: int, group_size: int = 64):
    """{"w": (in,out), "b"?} -> quantized linear params (bias kept as-is)."""
    out = quantize_weight(p["w"], bits, group_size)
    if "b" in p:
        out["b"] = p["b"]
    return out


_MIN_QUANT_SIZE = 1 << 16  # only quantize big matmuls (projections, FFN)


def quantize_dit_params(params, bits: int, group_size: int = 64):
    """Quantize every large linear in the stacked-block DiT pytree.

    Stacked blocks have (L, in, out) weights — quantized per layer slice via
    vmap so group stats don't mix across layers. Norm weights, tables and
    small layers stay in bf16 (the reference likewise only quantizes Linear
    modules above a size threshold).
    """

    def quant_stacked(p):
        out = jax.vmap(lambda w: quantize_weight(w, bits, group_size))(p["w"])
        if "b" in p:
            out["b"] = p["b"]
        return out

    def maybe_quant(p):
        if not (isinstance(p, dict) and "w" in p):
            return p
        w = p["w"]
        if (w.ndim == 3 and w.shape[1] * w.shape[2] >= _MIN_QUANT_SIZE
                and w.shape[1] % group_size == 0):
            return quant_stacked(p)
        return p

    blocks = params["blocks"]
    new_blocks = {}
    for attn_key in ("attn1", "attn2"):
        new_blocks[attn_key] = {
            k: (maybe_quant(v) if k in ("to_q", "to_k", "to_v", "to_out")
                else v)
            for k, v in blocks[attn_key].items()
        }
    new_blocks["ff"] = {k: maybe_quant(v) for k, v in blocks["ff"].items()}
    new_blocks["scale_shift_table"] = blocks["scale_shift_table"]
    return {**params, "blocks": new_blocks}
