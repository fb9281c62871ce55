"""Pallas TPU flash-attention kernel (forward, inference).

The DiT's self-attention runs over 1.5k-20k video tokens where materializing
the (B, H, Tq, Tk) logits costs up to ~4 bytes * 32 * 20k^2 = 51 GB — the
reference leans on MLXFast's Metal flash attention for the same reason
(reference: Sources/LTXVideo/Models/Transformer/LTXAttention.swift:209).

Design (flash-attention-2 style, online softmax):
  grid = (B*H, num_q_blocks, num_k_blocks), k innermost. VMEM scratch
  carries the running row-max m, normalizer l, and f32 accumulator across
  the sequential k iterations; the output block is written on the last k
  step. Logits and accumulation are f32 on the MXU; p is cast to the value
  dtype for the second matmul (same numerics as XLA SDPA here).

Mask support: an optional additive KEY bias (B, Tk) — the only mask the
video pipeline needs (text key-padding for cross-attention; self-attention
is full bidirectional). Full (Tq, Tk) biases (Gemma causal) stay on the XLA
path, whose 1k sequence makes flash unnecessary.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e at 6144 tokens x 32 heads: (512, 2048) runs 6.9 ms vs 24.4 ms
# for (256, 256) — the tall k block amortizes the (m, l) rescale work and
# keeps the MXU fed; VMEM stays under ~6 MB.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 2048
_NEG_INF = -1e30  # avoid actual -inf: exp(-inf - -inf) = nan on padded rows


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, sm_scale, num_k_blocks):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * sm_scale     # (bq, d)
    k = k_ref[0]                                    # (bk, d)
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (bq, bk)
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :].astype(jnp.float32)

    m_prev = m_ref[:, 0]                            # (bq,)
    l_prev = l_ref[:, 0]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])
    l_new = l_prev * alpha + jnp.sum(p, axis=-1)

    v = v_ref[0]                                    # (bk, d)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha[:, None] + pv
    m_ref[:] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        l = l_ref[:, 0]
        safe_l = jnp.where(l == 0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe_l[:, None]).astype(o_ref.dtype)


def _stats_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, mo_ref, lo_ref,
                  m_ref, l_ref, acc_ref, *, sm_scale, num_k_blocks):
    """Flash kernel that additionally emits the per-row softmax statistics
    (running max m, normalizer l) — the carry ring attention needs to merge
    partial attentions across K/V shards."""
    _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref,
                  sm_scale=sm_scale, num_k_blocks=num_k_blocks)
    ik = pl.program_id(2)

    @pl.when(ik == num_k_blocks - 1)
    def _write_stats():
        # stats carry a broadcast 128-lane axis: Mosaic requires the last
        # two block dims to tile (8, 128) or equal the array dims, so a
        # (1, block_q) stat block lowers on the interpreter but NOT on a
        # real TPU (found by the round-3 chip probe). (block_q, 128) is
        # legal; callers read lane 0.
        mo_ref[0] = m_ref[:]
        lo_ref[0] = l_ref[:]


def _stats_kernel_bias_free(q_ref, k_ref, v_ref, o_ref, mo_ref, lo_ref,
                            m_ref, l_ref, acc_ref, *, sm_scale, num_k_blocks):
    _stats_kernel(q_ref, k_ref, v_ref, None, o_ref, mo_ref, lo_ref,
                  m_ref, l_ref, acc_ref, sm_scale=sm_scale,
                  num_k_blocks=num_k_blocks)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret",
                              "return_stats")
)
def flash_attention(
    q, k, v,
    bias=None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    return_stats: bool = False,
):
    """q: (B, H, Tq, D); k, v: (B, H, Tk, D); bias: None, (B, Tk) additive
    key bias, or (B, 1, 1, Tk) (squeezed automatically). Returns (B, H, Tq, D).

    interpret=True runs the kernel in the Pallas interpreter (CPU) so the
    CPU test suite exercises the REAL kernel logic, not the XLA fallback.

    return_stats=True additionally returns the f32 softmax statistics
    (m, l) of shape (B, H, Tq) — out is still NORMALIZED (acc / l); a caller
    merging partial attentions (ring attention) un-normalizes with l.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = d**-0.5

    if bias is not None:
        if bias.ndim == 4:
            if bias.shape[1] != 1 or bias.shape[2] != 1:
                raise NotImplementedError(
                    "flash_attention supports key-bias masks only"
                )
            bias = bias[:, 0, 0]
        bias = bias.astype(jnp.float32)

    block_q = min(block_q, max(tq, 8))
    block_k = min(block_k, max(tk, 8))

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    tq_p, tk_p = qp.shape[2], kp.shape[2]
    if tk_p != tk:
        # padded keys must not contribute: force a key bias
        if bias is None:
            bias = jnp.zeros((b, tk), jnp.float32)
        bias = _pad_to(bias, 1, block_k, value=_NEG_INF)
    elif bias is not None:
        bias = _pad_to(bias, 1, block_k)

    bh = b * h
    q3 = qp.reshape(bh, tq_p, d)
    k3 = kp.reshape(bh, tk_p, d)
    v3 = vp.reshape(bh, tk_p, d)

    num_q = tq_p // block_q
    num_k = tk_p // block_k

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh_i, iq, ik: (bh_i, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh_i, iq, ik: (bh_i, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh_i, iq, ik: (bh_i, ik, 0)),
    ]
    inputs = [q3, k3, v3]
    if bias is not None:
        # bias is per batch (not per head): index map folds bh -> b. The
        # singleton middle axis makes the block's trailing dims (1, block_k),
        # which satisfies the TPU (8, 128) tiling rule for ANY batch size —
        # a 2D (B, Tk) bias block of (1, block_k) is only legal when B == 1
        # (bug found by the dev-CFG contract bench: guidance rows batch on B).
        in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda bh_i, iq, ik: (bh_i // h, 0, ik))
        )
        inputs.append(bias[:, None, :])
        base_kernel = _stats_kernel if return_stats else _flash_kernel
    else:
        base_kernel = (_stats_kernel_bias_free if return_stats
                       else _bias_free_kernel)
    kernel = functools.partial(base_kernel, sm_scale=scale, num_k_blocks=num_k)

    o_spec = pl.BlockSpec((1, block_q, d), lambda bh_i, iq, ik: (bh_i, iq, 0))
    o_shape = jax.ShapeDtypeStruct((bh, tq_p, d), q.dtype)
    if return_stats:
        stat_spec = pl.BlockSpec((1, block_q, 128),
                                 lambda bh_i, iq, ik: (bh_i, iq, 0))
        stat_shape = jax.ShapeDtypeStruct((bh, tq_p, 128), jnp.float32)
        out_specs = [o_spec, stat_spec, stat_spec]
        out_shape = [o_shape, stat_shape, stat_shape]
    else:
        out_specs, out_shape = o_spec, o_shape

    out = pl.pallas_call(
        kernel,
        grid=(bh, num_q, num_k),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),    # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    if return_stats:
        o, m, l = out
        return (o.reshape(b, h, tq_p, d)[:, :, :tq],
                m[:, :, 0].reshape(b, h, tq_p)[:, :, :tq],
                l[:, :, 0].reshape(b, h, tq_p)[:, :, :tq])
    return out.reshape(b, h, tq_p, d)[:, :, :tq]


def _bias_free_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                      *, sm_scale, num_k_blocks):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref,
                  sm_scale=sm_scale, num_k_blocks=num_k_blocks)


# ---------------------------------------------------------------------------
# Backward (training): FA-2 style two-kernel backward. Never materializes
# the (Tq, Tk) logits in HBM — each kernel rebuilds p = exp(s - lse) one
# (block_q, block_k) tile at a time in VMEM. This is what removes the XLA
# SDPA backward's f32[H, T, T] remat buffer (288 MB/layer at T=1536,
# 4.6 GB at T=6144 — docs/BENCH_NOTES.md §11).
#
#   delta = rowsum(dO * O)                 (precomputed, O(T*D))
#   p     = exp(scale * q k^T + bias - lse)
#   dv    = p^T dO
#   ds    = p * (dO v^T - delta) * scale
#   dq    = ds k        (k-innermost grid, dq accumulates in VMEM)
#   dk    = ds^T q      (q-innermost grid, dk/dv accumulate in VMEM)
# ---------------------------------------------------------------------------

DEFAULT_BWD_BLOCK_Q = 256
DEFAULT_BWD_BLOCK_K = 512


def _bwd_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
              sm_scale):
    """Shared tile math: returns (p, ds) f32 for the current block pair."""
    q = q_ref[0].astype(jnp.float32)                # (bq, d)
    k = k_ref[0].astype(jnp.float32)                # (bk, d)
    s = jax.lax.dot_general(
        q * sm_scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (bq, bk)
    if bias_ref is not None:
        s = s + bias_ref[0, 0][None, :].astype(jnp.float32)
    # lse/delta blocks are (1, 8, bq): per-row stats broadcast over 8
    # sublanes so the block tiles legally on TPU (see _write_stats note)
    p = jnp.exp(s - lse_ref[0, 0][:, None])         # (bq, bk)
    do = do_ref[0].astype(jnp.float32)              # (bq, d)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (bq, bk)
    ds = p * (dp - delta_ref[0, 0][:, None]) * sm_scale
    return p, ds, do


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                   dq_ref, acc_ref, *, sm_scale, num_k_blocks):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, ds, _ = _bwd_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         bias_ref, sm_scale)
    acc_ref[:] += jax.lax.dot_general(
        ds, k_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dq_kernel_bias_free(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                             dq_ref, acc_ref, *, sm_scale, num_k_blocks):
    _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None,
                   dq_ref, acc_ref, sm_scale=sm_scale,
                   num_k_blocks=num_k_blocks)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale,
                    num_q_blocks):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    p, ds, do = _bwd_tile(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          bias_ref, sm_scale)
    # dv += p^T do ; dk += ds^T q — contract the q (row) axis
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_acc[:] += jax.lax.dot_general(
        ds, q_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dkv_kernel_bias_free(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                              dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale,
                              num_q_blocks):
    _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None,
                    dk_ref, dv_ref, dk_acc, dv_acc, sm_scale=sm_scale,
                    num_q_blocks=num_q_blocks)


def _flash_backward(q, k, v, bias, o, lse, g, scale,
                    block_q: int, block_k: int, interpret: bool):
    """dq, dk, dv via the two Pallas kernels. Shapes as flash_attention."""
    b, h, tq, d = q.shape
    tk = k.shape[2]

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                          # (B, H, Tq)

    block_q = min(block_q, max(tq, 8))
    block_k = min(block_k, max(tk, 8))
    qp = _pad_to(q, 2, block_q)
    dop = _pad_to(g, 2, block_q)
    lsep = _pad_to(lse, 2, block_q)
    deltap = _pad_to(delta, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    tq_p, tk_p = qp.shape[2], kp.shape[2]
    if tk_p != tk:
        if bias is None:
            bias = jnp.zeros((b, tk), jnp.float32)
        bias = _pad_to(bias, 1, block_k, value=_NEG_INF)
    elif bias is not None:
        bias = _pad_to(bias, 1, block_k)

    bh = b * h
    q3 = qp.reshape(bh, tq_p, d)
    k3 = kp.reshape(bh, tk_p, d)
    v3 = vp.reshape(bh, tk_p, d)
    do3 = dop.reshape(bh, tq_p, d)
    # 8-sublane broadcast: a (1, block_q) row block does not tile on TPU
    lse3 = jnp.broadcast_to(lsep.reshape(bh, 1, tq_p), (bh, 8, tq_p))
    delta3 = jnp.broadcast_to(deltap.reshape(bh, 1, tq_p), (bh, 8, tq_p))
    num_q = tq_p // block_q
    num_k = tk_p // block_k

    def qspec(fn):
        return pl.BlockSpec((1, block_q, d), fn)

    def kspec(fn):
        return pl.BlockSpec((1, block_k, d), fn)

    def rowspec(fn):
        return pl.BlockSpec((1, 8, block_q), fn)

    # --- dq: grid (bh, iq, ik), k innermost
    dq_in_specs = [
        qspec(lambda bh_i, iq, ik: (bh_i, iq, 0)),
        kspec(lambda bh_i, iq, ik: (bh_i, ik, 0)),
        kspec(lambda bh_i, iq, ik: (bh_i, ik, 0)),
        qspec(lambda bh_i, iq, ik: (bh_i, iq, 0)),
        rowspec(lambda bh_i, iq, ik: (bh_i, 0, iq)),
        rowspec(lambda bh_i, iq, ik: (bh_i, 0, iq)),
    ]
    dq_inputs = [q3, k3, v3, do3, lse3, delta3]
    if bias is not None:
        dq_in_specs.append(pl.BlockSpec(
            (1, 1, block_k), lambda bh_i, iq, ik: (bh_i // h, 0, ik)))
        dq_inputs.append(bias[:, None, :])
        dq_kernel = _bwd_dq_kernel
    else:
        dq_kernel = _bwd_dq_kernel_bias_free

    dq = pl.pallas_call(
        functools.partial(dq_kernel, sm_scale=scale, num_k_blocks=num_k),
        grid=(bh, num_q, num_k),
        in_specs=dq_in_specs,
        out_specs=qspec(lambda bh_i, iq, ik: (bh_i, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*dq_inputs)

    # --- dk/dv: grid (bh, ik, iq), q innermost
    dkv_in_specs = [
        qspec(lambda bh_i, ik, iq: (bh_i, iq, 0)),
        kspec(lambda bh_i, ik, iq: (bh_i, ik, 0)),
        kspec(lambda bh_i, ik, iq: (bh_i, ik, 0)),
        qspec(lambda bh_i, ik, iq: (bh_i, iq, 0)),
        rowspec(lambda bh_i, ik, iq: (bh_i, 0, iq)),
        rowspec(lambda bh_i, ik, iq: (bh_i, 0, iq)),
    ]
    dkv_inputs = [q3, k3, v3, do3, lse3, delta3]
    if bias is not None:
        dkv_in_specs.append(pl.BlockSpec(
            (1, 1, block_k), lambda bh_i, ik, iq: (bh_i // h, 0, ik)))
        dkv_inputs.append(bias[:, None, :])
        dkv_kernel = _bwd_dkv_kernel
    else:
        dkv_kernel = _bwd_dkv_kernel_bias_free

    dk, dv = pl.pallas_call(
        functools.partial(dkv_kernel, sm_scale=scale, num_q_blocks=num_q),
        grid=(bh, num_k, num_q),
        in_specs=dkv_in_specs,
        out_specs=[kspec(lambda bh_i, ik, iq: (bh_i, ik, 0)),
                   kspec(lambda bh_i, ik, iq: (bh_i, ik, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, tk_p, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, tk_p, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*dkv_inputs)

    return (dq.reshape(b, h, tq_p, d)[:, :, :tq],
            dk.reshape(b, h, tk_p, d)[:, :, :tk],
            dv.reshape(b, h, tk_p, d)[:, :, :tk])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention_vjp(q, k, v, bias, scale, block_q, block_k, interpret):
    """Differentiable flash attention (same primal as flash_attention).

    bias is a (B, Tk) / (B, 1, 1, Tk) additive KEY mask — an input, not a
    parameter: its cotangent is zeros. scale/blocks/interpret are static.
    """
    return flash_attention(q, k, v, bias=bias, scale=scale, block_q=block_q,
                           block_k=block_k, interpret=interpret)


def _flash_vjp_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    o, m, l = flash_attention(q, k, v, bias=bias, scale=scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret, return_stats=True)
    lse = m + jnp.log(jnp.where(l == 0, 1.0, l))
    return o, (q, k, v, bias, o, lse)


def _flash_vjp_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, bias, o, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    bias2 = bias
    if bias2 is not None and bias2.ndim == 4:
        bias2 = bias2[:, 0, 0]
    if bias2 is not None:
        bias2 = bias2.astype(jnp.float32)
    dq, dk, dv = _flash_backward(
        q, k, v, bias2, o, lse, g, scale,
        block_q=min(block_q, DEFAULT_BWD_BLOCK_Q),
        block_k=min(block_k, DEFAULT_BWD_BLOCK_K),
        interpret=interpret)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


flash_attention_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
