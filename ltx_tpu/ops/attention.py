"""Scaled-dot-product attention dispatch.

One op signature, multiple backends:
  * "xla"    — dot_general + softmax with float32 logits/probs accumulation.
               Always available (CPU tests, fallback); XLA fuses it well.
  * "pallas" — fused flash-attention kernel (ltx_tpu.kernels.flash_attention),
               used on TPU for the long-sequence self-attention where the
               materialized (B, H, T, T) logits would blow HBM.
  * "auto"   — pallas on TPU when shapes qualify, else xla.

This replaces the reference's dependency on MLXFast.scaledDotProductAttention
(Metal) — reference use sites: LTXAttention.swift:209, LTXTextEncoder.swift:260,
Gemma3Model.swift:99 (GQA).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_PALLAS_MIN_SEQ = 1024  # below this, XLA's fused softmax-attention is fine

# Sequence-parallel context: set by the pipeline when a mesh is active so
# sdpa(impl="ring") can route self-attention through ring attention without
# threading the mesh through every model signature.
_SP_CONTEXT = {"mesh": None, "axis": "model"}


def set_sequence_parallel(mesh, axis: str = "model"):
    """Enable (mesh) or disable (None) ring-attention dispatch for
    sdpa(impl='ring'). Self-attention shards the token axis; cross-attention
    (tq != tk) keeps replicated text keys and falls back to XLA."""
    _SP_CONTEXT["mesh"] = mesh
    _SP_CONTEXT["axis"] = axis


def _xla_sdpa(q, k, v, bias=None, scale=None):
    """(B, H, Tq, D) x (B, H, Tk, D) attention with f32 softmax."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _gqa_sdpa(q, k, v, bias=None, scale=None):
    """Grouped-query attention WITHOUT materializing repeated K/V.

    q: (B, H, Tq, D); k, v: (B, Hkv, Tk, D), H = G * Hkv. jnp.repeat of the
    KV tensors costs two (B, H, Tk, D) copies per call — ~25 MB/layer in the
    Gemma decode loop — where a grouped einsum reads the (B, Hkv, Tk, D)
    cache directly. bias broadcasts over heads ((B, 1, Tq, Tk) or
    (B, 1, 1, Tk))."""
    b, h, tq, d = q.shape
    hkv = k.shape[1]
    g = h // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    qg = q.reshape(b, hkv, g, tq, d)
    logits = jnp.einsum(
        "bkgqd,bksd->bkgqs", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if bias is not None:
        if bias.shape[1] not in (1, h):
            raise ValueError(f"bias heads {bias.shape[1]} != 1 or {h}")
        bias5 = (bias.reshape(b, hkv, g, *bias.shape[2:])
                 if bias.shape[1] == h else bias[:, :, None])
        logits = logits + bias5.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgqs,bksd->bkgqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, tq, d).astype(q.dtype)


def sdpa(q, k, v, bias=None, scale: Optional[float] = None, impl: str = "auto"):
    """Scaled dot-product attention.

    q: (B, H, Tq, D); k, v: (B, Hkv, Tk, D) with Hkv == H or H % Hkv == 0
    (GQA: kv heads are repeated). bias: additive float mask broadcastable to
    (B, H, Tq, Tk) — the reference's (1-m) * -10000 convention arrives here
    already additive.
    """
    if k.shape[1] != q.shape[1]:
        # GQA: the XLA path computes grouped attention directly from the
        # (B, Hkv, Tk, D) cache; pallas/ring paths still expand KV.
        if impl in ("xla", "auto"):
            return _gqa_sdpa(q, k, v, bias=bias, scale=scale)
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    if impl == "xla":
        return _xla_sdpa(q, k, v, bias=bias, scale=scale)

    if impl == "ring":
        mesh = _SP_CONTEXT["mesh"]
        # ring applies to self-attention (Tq == Tk) with no bias or a KEY
        # bias (which rotates with k/v around the ring). Non-divisible
        # sequences pad to the ring (-1e30 bias on pad keys; padded q rows
        # are sliced off). Full (Tq, Tk) biases can't ring -> XLA.
        if mesh is not None and q.shape[2] == k.shape[2]:
            n = mesh.shape[_SP_CONTEXT["axis"]]
            key_bias = None
            ringable = n > 1
            if bias is not None:
                if bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
                    key_bias = bias[:, 0, 0].astype(jnp.float32)
                elif bias.ndim == 2:
                    key_bias = bias.astype(jnp.float32)
                else:
                    ringable = False
            if ringable:
                from ltx_tpu.parallel.ring_attention import (
                    sequence_parallel_sdpa,
                )

                t = q.shape[2]
                pad = (-t) % n
                if pad:
                    widths = [(0, 0), (0, 0), (0, pad), (0, 0)]
                    q_p = jnp.pad(q, widths)
                    k_p = jnp.pad(k, widths)
                    v_p = jnp.pad(v, widths)
                    if key_bias is None:
                        key_bias = jnp.zeros((q.shape[0], t), jnp.float32)
                    key_bias = jnp.pad(key_bias, [(0, 0), (0, pad)],
                                       constant_values=-1e30)
                else:
                    q_p, k_p, v_p = q, k, v
                out = sequence_parallel_sdpa(
                    q_p, k_p, v_p, mesh, bias=key_bias, scale=scale,
                    seq_axis=_SP_CONTEXT["axis"])
                return out[:, :, :t] if pad else out
        return _xla_sdpa(q, k, v, bias=bias, scale=scale)

    if impl in ("pallas", "auto"):
        on_tpu = jax.default_backend() == "tpu"
        tq, tk = q.shape[2], k.shape[2]
        want_pallas = impl == "pallas" or (
            on_tpu and tq >= _PALLAS_MIN_SEQ and tk >= _PALLAS_MIN_SEQ
        )
        if want_pallas and on_tpu:
            from ltx_tpu.kernels.flash_attention import (
                DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, flash_attention_vjp,
            )

            try:
                # the vjp wrapper's primal IS flash_attention; routing
                # through it makes the pallas path differentiable
                # (FA-2 backward kernels — no (Tq, Tk) remat buffer)
                return flash_attention_vjp(q, k, v, bias, scale,
                                           DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                           False)
            except NotImplementedError:
                pass
        return _xla_sdpa(q, k, v, bias=bias, scale=scale)

    raise ValueError(f"unknown sdpa impl: {impl}")


def prepare_additive_mask(mask, dtype=jnp.float32):
    """(B, S) {0,1} validity mask -> (B, 1, 1, S) additive bias with
    0 = attend, -10000 = pad (reference: LTXTransformer.swift:141-156)."""
    if mask is None:
        return None
    if jnp.issubdtype(mask.dtype, jnp.floating):
        return mask
    bias = (1 - mask.astype(jnp.float32)) * -10000.0
    return bias.reshape(mask.shape[0], 1, 1, mask.shape[-1]).astype(dtype)
