"""Weight-only group-wise affine quantization (int8 / int4).

TPU-native equivalent of MLX's `quantize/QuantizedLinear` (Metal) used by the
reference for `--transformer-quant qint8|int4`
(reference: Sources/LTXVideo/Configuration/LTXQuantizationConfig.swift:19-115,
LTXPipeline.swift:323-333). Same scheme: groups of `group_size` along the
INPUT dimension, asymmetric affine (scale + bias per group):

    w ~= w_q * scale[g] + bias[g],   w_q in [0, 2^bits - 1]

Storage is a pytree of arrays only (jit-friendly): int8 uses key "w_q"
(uint8, (in, out)); int4 uses key "w_q4" (uint8, (in/2, out)) with
BLOCK-PLANE packing: within each PACK_BLOCK=256 input rows, byte row r holds
q[r] in the low nibble and q[r + 128] in the high nibble. The unpack is then
a sublane CONCAT (fast on TPU) instead of a row interleave (slow), both in
XLA and inside the Pallas matmul kernel. Group size derives from the scale
shape, so everything is static at trace time.

int4 matmuls route through a fused Pallas kernel on TPU (dequant per weight
tile in VMEM): 7.3 ms vs 10.1 ms XLA-dequant and 7.9 ms plain bf16 for a
6144x4096 @ 4096x16384 — the kernel reads 4x less weight HBM. Above
BIG_M_DEQUANT_THRESHOLD tokens the strategy flips to dequant-ONCE
(dequant_int4_pallas) + plain bf16 MXU dot — the fused kernel re-
dequantizes per m-tile, which costs 10% of the 19840-token AV stage-2
step (measured; docs/BENCH_NOTES.md §17).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK_BLOCK = 256  # divides every DiT (4096/16384) and Gemma (3840/15360) dim


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
        out["w_q4"] = pack_int4(q8)
    else:
        raise ValueError(f"unsupported bits: {bits}")
    return out


def _effective_pack_block(d_in: int) -> int:
    """PACK_BLOCK when it divides d_in; else the whole dim (single plane).
    Both pack and unpack apply the same rule, so the format is self-
    describing from shapes alone."""
    return PACK_BLOCK if d_in % PACK_BLOCK == 0 else d_in


def pack_int4(q8):
    """(in, out) uint8 values [0,15] -> (in/2, out) block-plane packed."""
    d_in, d_out = q8.shape
    blk = _effective_pack_block(d_in)
    half = blk // 2
    qb = q8.reshape(d_in // blk, blk, d_out)
    return (qb[:, :half] | (qb[:, half:] << 4)).reshape(d_in // 2, d_out)


def unpack_int4(packed, dtype=jnp.float32):
    """Inverse of pack_int4 -> (in, out) values."""
    d2, d_out = packed.shape
    half = _effective_pack_block(d2 * 2) // 2
    pb = packed.reshape(d2 // half, half, d_out)
    lo = (pb & 0x0F).astype(dtype)
    hi = (pb >> 4).astype(dtype)
    return jnp.concatenate([lo, hi], axis=1).reshape(d2 * 2, d_out)


def _unpack(qp):
    """-> (q float32 (in, out), group_size)."""
    if "w_q" in qp:
        q = qp["w_q"].astype(jnp.float32)
    else:
        q = unpack_int4(qp["w_q4"], jnp.float32)
    group = q.shape[0] // qp["scale"].shape[0]
    return q, group


def dequantize_weight(qp, dtype=jnp.bfloat16):
    """Inverse of quantize_weight -> (in, out) dtype weight."""
    q, group = _unpack(qp)
    d_in, d_out = q.shape
    qg = q.reshape(d_in // group, group, d_out)
    w = qg * qp["scale"][:, None] + qp["bias"][:, None]
    return w.reshape(d_in, d_out).astype(dtype)


def dequantize_weight_np(qp):
    """Host (numpy) twin of dequantize_weight -> (in, out) float32."""
    import numpy as np

    if "w_q" in qp:
        q = np.asarray(qp["w_q"], np.float32)
    else:
        packed = np.asarray(qp["w_q4"])
        d2, d_out = packed.shape
        half = _effective_pack_block(d2 * 2) // 2
        pb = packed.reshape(d2 // half, half, d_out)
        q = np.concatenate([pb & 0x0F, pb >> 4], axis=1) \
            .reshape(d2 * 2, d_out).astype(np.float32)
    group = q.shape[0] // qp["scale"].shape[0]
    d_in, d_out = q.shape
    qg = q.reshape(d_in // group, group, d_out)
    w = (qg * np.asarray(qp["scale"], np.float32)[:, None]
         + np.asarray(qp["bias"], np.float32)[:, None])
    return w.reshape(d_in, d_out)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and ("w_q" in p or "w_q4" in p or "w8" in p)


# ---------------------------------------------------------------------------
# W8A8: per-channel int8 weights, dynamic per-row int8 activations.
#
# Built for the Gemma DECODE loop: the fused int4 path dequantizes every
# weight element on the VPU (~0.69 ms/layer measured — the dominant cost of
# the 40 ms/token enhancement decode), while an int8 weight feeds the MXU
# int8 systolic path DIRECTLY with no unpack at all. Measured on v5e: the
# 7-matvec decode chain drops from 0.686 ms/layer (int4 Pallas) to ~0.1
# ms/layer (docs/BENCH_NOTES.md §4). Costs 2x the HBM of int4 (int8 Gemma
# ~11.5 GB — fits one chip with the bf16 embedding table under staging).
# ---------------------------------------------------------------------------


def requant_int8_channel_np(qp_or_w):
    """int4-group-quantized leaf (or raw (in, out) weight) -> per-output-
    channel int8 {"w8": (in, out) int8, "sw": (out,) f32}, host-side.

    Requantizing the int4-QAT values adds at most one int8 step of noise per
    element (the int4 grid is not a subgrid of the per-channel int8 grid),
    bounded by max|w_channel|/127 — far below the int4 group step itself.

    Routes through the native C++ kernels (ltx_tpu.native) when available —
    the numpy path is scalar-loop slow on ml_dtypes bf16 (~9 s per 67M-
    element layer measured; docs/BENCH_NOTES.md §13). Bit-exact either way.
    """
    import numpy as np

    from ltx_tpu import native

    if isinstance(qp_or_w, dict) and "w_q4" in qp_or_w:
        out = native.requant_int8_from_int4(qp_or_w)
        if out is not None:
            return out
    elif not isinstance(qp_or_w, dict):
        a = np.asarray(qp_or_w)
        if a.ndim == 2:
            out = native.quant_int8_channel(a)
            if out is not None:
                return out
    return _requant_int8_channel_np_numpy(qp_or_w)


def _requant_int8_channel_np_numpy(qp_or_w):
    """Pure-numpy twin of requant_int8_channel_np (fallback + the exactness
    oracle for tests/test_native.py and the native self-test)."""
    import numpy as np

    if isinstance(qp_or_w, dict) and ("w_q4" in qp_or_w or "w_q" in qp_or_w):
        w = dequantize_weight_np(qp_or_w)
    else:
        w = np.asarray(qp_or_w, np.float32)
    w = np.asarray(w, np.float32)
    sw = np.abs(w).max(axis=0) / 127.0
    sw = np.where(sw == 0, 1.0, sw).astype(np.float32)
    w8 = np.clip(np.rint(w / sw), -127, 127).astype(np.int8)
    return {"w8": w8, "sw": sw}


def quantize_act_int8(x):
    """Per-row dynamic activation quant: (..., K) -> (int8 same shape,
    f32 scale (..., 1))."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.where(sx == 0, 1.0, sx)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def _int8_dot(p, x8, sx, out_dtype):
    acc = jax.lax.dot_general(
        x8, p["w8"], (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * p["sw"])).astype(out_dtype)


def _float0_zeros(a):
    """Symbolic-zero cotangent for an integer primal (custom_vjp contract)."""
    import numpy as np

    return np.zeros(a.shape, jax.dtypes.float0)


@jax.custom_vjp
def _int8_mm_ste(w8, sw, x):
    x8, sx = quantize_act_int8(x)
    return _int8_dot({"w8": w8, "sw": sw}, x8, sx, x.dtype)


def _int8_mm_fwd(w8, sw, x):
    return _int8_mm_ste(w8, sw, x), (w8, sw)


def _int8_mm_bwd(res, g):
    # Straight-through: the activation round/clip is treated as identity, so
    # d/dx (x @ W_deq) = g @ W_deq^T, computed on the MXU without
    # materializing the dequantized weight. The frozen int weights get
    # symbolic-zero cotangents (QLoRA trains only the side-path).
    #
    # Formulated as (w8 @ gw^T)^T — w8 as the LHS contracting its OUTPUT
    # dim. NOTE the one-chip 48-layer QLoRA OOM investigated in
    # docs/BENCH_NOTES.md §11 was NOT this dot: XLA hoists a full-leaf
    # relayout copy of a stacked to_v weight whenever the v activation
    # flows straight from the matmul into the SDPA head-split transpose —
    # fixed by an optimization_barrier on v in the models (dit.py), after
    # which no weight leaf is ever copied in either formulation.
    w8, sw = res
    gw = (g.astype(jnp.float32) * sw).astype(jnp.bfloat16)
    gb = gw.reshape((-1, gw.shape[-1]))  # (B*, N)
    gxt = jax.lax.dot_general(
        w8.astype(jnp.bfloat16), gb,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, B*)
    gx = gxt.T.reshape(g.shape[:-1] + (w8.shape[0],))
    # out dtype == x dtype (forward contract), so g.dtype is x's dtype
    return _float0_zeros(w8), jnp.zeros_like(sw), gx.astype(g.dtype)


_int8_mm_ste.defvjp(_int8_mm_fwd, _int8_mm_bwd)


def int8_matmul(p, x):
    """x (..., K) bf16 @ {"w8" (K, N), "sw" (N,)} -> (..., N) in x.dtype.

    Activations quantize dynamically per ROW (absmax/127) so the int8 MXU
    dot needs no unpack and no barrier; the result rescales by sx * sw. Pure
    XLA — stable inside scan/while (unlike the XLA int4-dequant path, which
    crashes the TPU worker there). Differentiable wrt x via a straight-
    through estimator (train/: QLoRA over a frozen W8A8 base)."""
    return _int8_mm_ste(p["w8"], p["sw"], x)


def linear_many(ps, x):
    """Apply several linears that SHARE the input x (qkv; gate/up).

    When all are W8A8 the activation quantizes ONCE — in the T=1 decode
    chain each extra quantize is a serialized VPU dependency (~tens of us),
    so sharing it trims per-layer latency. Falls back to per-leaf
    linear_any otherwise."""
    if all(isinstance(p, dict) and "w8" in p for p in ps):
        x8, sx = quantize_act_int8(x)
        outs = []
        for p in ps:
            out = _int8_dot(p, x8, sx, x.dtype)
            if "b" in p:
                out = out + p["b"].astype(x.dtype)
            outs.append(out)
        return tuple(outs)
    return tuple(linear_any(p, x) for p in ps)


# ---------------------------------------------------------------------------
# Fused Pallas int4 matmul (dequant per weight tile in VMEM)
# ---------------------------------------------------------------------------


def _int4_matmul_kernel(x_ref, wq_ref, scale_ref, bias_ref, o_ref, acc_ref,
                        *, nk, group):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = wq_ref[:].astype(jnp.int32)      # (bk/2, bn)
    half = PACK_BLOCK // 2
    d2, bn = packed.shape
    pb = packed.reshape(d2 // half, half, bn)
    lo = (pb & 0x0F).astype(jnp.float32)
    hi = (pb >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=1).reshape(d2 * 2, bn)

    bk = d2 * 2
    # scale/bias arrive pre-reshaped to (nk, groups_per_block, N) so the
    # block covers the full sublane dim (arbitrary gpb like 12 can't be
    # dynamically sliced with sublane alignment).
    s = scale_ref[0]
    b = bias_ref[0]
    qg = q.reshape(bk // group, group, bn)
    w = (qg * s[:, None] + b[:, None]).reshape(bk, bn).astype(jnp.bfloat16)

    acc_ref[:] += jax.lax.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


@functools.partial(jax.jit,
                   static_argnames=("bm", "bk", "bn", "interpret"))
def _int4_matmul_2d(x, wq, scale, bias, bm: int, bk: int, bn: int,
                    interpret: bool = False):
    m, k = x.shape
    n = wq.shape[1]
    group = k // scale.shape[0]
    nk = k // bk
    gpb = bk // group
    scale3 = scale.reshape(nk, gpb, n)
    bias3 = bias.reshape(nk, gpb, n)
    return pl.pallas_call(
        functools.partial(_int4_matmul_kernel, nk=nk, group=group),
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, gpb, bn), lambda i, j, kk: (kk, 0, j)),
            pl.BlockSpec((1, gpb, bn), lambda i, j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wq, scale3, bias3)


def _dequant_int4_kernel(wq_ref, scale_ref, bias_ref, o_ref, *, group):
    packed = wq_ref[:].astype(jnp.int32)      # (bk/2, bn)
    half = PACK_BLOCK // 2
    d2, bn = packed.shape
    pb = packed.reshape(d2 // half, half, bn)
    lo = (pb & 0x0F).astype(jnp.float32)
    hi = (pb >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=1).reshape(d2 * 2, bn)
    bk = d2 * 2
    s = scale_ref[0]
    b = bias_ref[0]
    qg = q.reshape(bk // group, group, bn)
    o_ref[:] = (qg * s[:, None] + b[:, None]).reshape(bk, bn) \
        .astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequant_int4_pallas(w_q4, scale, bias, interpret: bool = False):
    """Block-plane-packed int4 -> dense (K, N) bf16, one pass.

    The unpack+affine math is byte-for-byte the fused matmul kernel's
    (_int4_matmul_kernel); this kernel exists for the BIG-M matmul strategy
    below, and deliberately avoids the XLA int4-dequant lowering (which
    reproducibly crashes the axon TPU worker inside scan/while loops —
    CLAUDE.md gotchas)."""
    k2, n = w_q4.shape
    k = k2 * 2
    group = k // scale.shape[0]
    # the kernel's f32 intermediates cost ~10 bytes/element of block —
    # (512, 1024) stays ~5 MB of the 16 MB scoped VMEM (2048-wide blocks
    # OOM the vmem stack at compile, measured)
    bk = _pick_block(k, (512, 256))
    bn = _pick_block(n, (1024, 768, 512, 256))
    if not (bk and bn):
        raise ValueError(f"dequant_int4_pallas cannot tile K={k} N={n}")
    nk = k // bk
    gpb = bk // group
    scale3 = scale.reshape(nk, gpb, n)
    bias3 = bias.reshape(nk, gpb, n)
    return pl.pallas_call(
        functools.partial(_dequant_int4_kernel, group=group),
        grid=(nk, n // bn),
        in_specs=[
            pl.BlockSpec((bk // 2, bn), lambda kk, j: (kk, j)),
            pl.BlockSpec((1, gpb, bn), lambda kk, j: (kk, 0, j)),
            pl.BlockSpec((1, gpb, bn), lambda kk, j: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((bk, bn), lambda kk, j: (kk, j)),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.bfloat16),
        interpret=interpret,
    )(w_q4, scale3, bias3)


# Token count above which int4 matmuls dequantize ONCE to a bf16 scratch and
# run a plain MXU dot instead of the fused kernel. The fused kernel re-
# dequantizes every weight tile per m-tile (grid m-outermost), so its VPU
# dequant cost grows with m/bm — at parity with bf16 at m=6144 (12 tiles,
# BENCH_NOTES §5) but ~4x the dequant work at the 19840-token stage-2 shape
# where divisibility also forces bm=128 (155 tiles). The scratch write+read
# (~3 bytes/weight) is ~1 ms/layer against a 47 ms/layer matmul at that m.
# Threshold picked by on-chip measurement (scripts/int4_bigm_probe.py).
BIG_M_DEQUANT_THRESHOLD = 8192


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _int4_mm_ste(interpret, w_q4, scale, bias, x):
    return _int4_mm_impl(interpret, w_q4, scale, bias, x)


def _int4_mm_ste_fwd(interpret, w_q4, scale, bias, x):
    out = _int4_mm_impl(interpret, w_q4, scale, bias, x)
    return out, (w_q4, scale, bias)


def _int4_mm_ste_bwd(interpret, res, g):
    # The Pallas kernel has no AD rule; the backward dequantizes via the XLA
    # path (one-shot — no scan, so the known scan/while int4-dequant crash
    # does not apply) and runs g @ W^T. Frozen int4 weights get symbolic-
    # zero cotangents — training touches only LoRA side-paths over this base.
    w_q4, scale, bias = res
    w = dequantize_weight({"w_q4": w_q4, "scale": scale, "bias": bias},
                          jnp.bfloat16)
    gx = jax.lax.dot_general(
        g.astype(jnp.bfloat16), w,
        (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # kernel output (and thus g) is bf16; x may be bf16 too — bf16 cotangent
    # is the right precision either way
    return (_float0_zeros(w_q4), jnp.zeros_like(scale), jnp.zeros_like(bias),
            gx.astype(g.dtype))


_int4_mm_ste.defvjp(_int4_mm_ste_fwd, _int4_mm_ste_bwd)


def int4_matmul(qp, x, interpret: bool = False):
    """x (..., K) @ int4 weights -> (..., N) via the fused Pallas kernel.

    Pads the token dim to the block size; requires K and N to tile by the
    PACK_BLOCK-aligned block candidates (all LTX/Gemma dims do).
    interpret=True runs in the Pallas interpreter for CPU CI coverage.
    Differentiable wrt x (custom VJP — backward dequantizes via XLA).
    """
    return _int4_mm_ste(interpret, qp["w_q4"], qp["scale"], qp["bias"], x)


def _int4_mm_impl(interpret, w_q4, scale, bias, x):
    qp = {"w_q4": w_q4, "scale": scale, "bias": bias}
    k = x.shape[-1]
    n = qp["w_q4"].shape[1]
    # tuned on v5e at 6144 tokens: bk=1024, bn=2048 (4096x4096: 3.96 ms vs
    # 5.17 ms at bn=1024; 4096x16384: 7.41 ms)
    bk = _pick_block(k, (1024, 768, 512, 256))
    bn = _pick_block(n, (2048, 1024, 768, 512, 256))
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    if m >= BIG_M_DEQUANT_THRESHOLD:
        w = dequant_int4_pallas(qp["w_q4"], qp["scale"], qp["bias"],
                                interpret=interpret)
        out = jax.lax.dot_general(
            x2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return out.reshape(*lead, n)
    bm = _pick_block(m, (512, 256, 128))
    if not (bk and bn):
        raise ValueError(f"int4_matmul cannot tile K={k} N={n}")
    if not bm:
        pad = (-m) % 128
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        bm = _pick_block(m + pad, (512, 256, 128))
    out = _int4_matmul_2d(x2, qp["w_q4"], qp["scale"], qp["bias"], bm, bk, bn,
                          interpret=interpret)
    out = out[:m].reshape(*lead, n)
    return out


# When params are TP-sharded over a mesh, GSPMD cannot partition a custom
# Pallas call — the XLA dequant path (which partitions fine and fuses the
# int4 unpack into the dot) is used instead. Toggled by
# parallel.sharding.shard_transformer_params / LTXPipeline.shard.
_TENSOR_PARALLEL = False


def set_tensor_parallel(enabled: bool) -> None:
    global _TENSOR_PARALLEL
    _TENSOR_PARALLEL = bool(enabled)


# Measured at decode shapes ((128, 3840)x(3840, 15360), v5e): the fused
# kernel is VPU-dequant-bound at small m (129 us vs XLA dequant+dot 86 us),
# while at 6144 rows it wins 7.3 ms vs 10.1 ms. Routing small-m matmuls to
# the XLA path is NOT done despite the per-op win: the XLA dequant inside
# the token-generation program (48-layer scan in a while_loop) reproducibly
# crashes the axon TPU worker ("TPU worker process crashed or restarted"),
# while the Pallas path is stable. Revisit if the backend gets fixed.


def _use_pallas_int4(p, x) -> bool:
    if "w_q4" not in p or jax.default_backend() != "tpu":
        return False
    if _TENSOR_PARALLEL:
        return False
    k = x.shape[-1]
    n = p["w_q4"].shape[1]
    return bool(_pick_block(k, (1024, 768, 512, 256))
                and _pick_block(n, (1024, 768, 512, 256))
                and k % PACK_BLOCK == 0)


def _lora_delta(p, x):
    """Trainable LoRA side-path: scale * (x @ A) @ B in float32.

    Present when ltx_tpu.train.lora.add_lora inserted {"lora_a" (in, r),
    "lora_b" (r, out), "lora_s" ()} into the leaf. Composes with every base
    path — bf16, int8, W8A8, fused int4 — without the reference's
    dequantize->merge->requantize round-trip (LoRAAdapter.swift:104-133):
    the low-rank product is added AFTER the (possibly quantized) base
    matmul, so the base weights never change.
    """
    d = jnp.dot(x.astype(jnp.float32), p["lora_a"].astype(jnp.float32))
    d = jnp.dot(d, p["lora_b"].astype(jnp.float32))
    return (d * p["lora_s"].astype(jnp.float32)).astype(x.dtype)


def linear_any(p, x):
    """Apply a linear that may be quantized ({"w_q"|"w_q4", scale, bias, b?})
    or plain ({"w", b?}); f32 accumulation either way. A trainable LoRA
    side-path ({"lora_a", "lora_b", "lora_s"}) adds after the base matmul.

    Stacked-block params carry a leading layer axis; under lax.scan the body
    sees the per-layer slice, so shapes here are always 2D.
    """
    lora = _lora_delta(p, x) if "lora_a" in p else None
    if is_quantized(p):
        if "w8" in p:
            out = int8_matmul(p, x)
            if lora is not None:
                out = out + lora
            if "b" in p:
                out = out + p["b"].astype(x.dtype)
            return out
        if _use_pallas_int4(p, x):
            out = int4_matmul(p, x).astype(x.dtype)
            if lora is not None:
                out = out + lora
            if "b" in p:
                out = out + p["b"].astype(x.dtype)
            return out
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
    if lora is not None:
        out = out + lora.astype(jnp.float32)
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

# Linear leaf names that carry the bulk of transformer weights. Covers the
# video DiT (attn1/attn2/ff), the dual AV transformer's 6 attentions + 2
# FFNs per block (models/dit_av.py::_block_init), and Gemma's projections.
QUANTIZABLE_LEAVES = frozenset({
    "to_q", "to_k", "to_v", "to_out", "project_in", "project_out",
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
})


def _quantize_weight_np(w, bits: int, group_size: int):
    """Host twin of quantize_weight — loading real 19B bf16 weights must
    not stage the unquantized tree through device HBM. Routes through the
    native C++ kernel (ltx_tpu.native) when available: the numpy path was
    measured at 19-38 s for ONE 4096x16384 bf16 layer (~an hour for the
    full DiT); native runs at memory bandwidth. Bit-exact either way."""
    from ltx_tpu import native

    out = native.quant_group(w, bits, group_size, PACK_BLOCK)
    if out is not None:
        return out
    return _quantize_weight_np_numpy(w, bits, group_size)


def _quantize_weight_np_numpy(w, bits: int, group_size: int):
    """Pure-numpy twin (fallback + exactness oracle for test_native.py)."""
    import numpy as np

    d_in, d_out = w.shape
    levels = (1 << bits) - 1
    wf = np.asarray(w, np.float32).reshape(d_in // group_size, group_size,
                                           d_out)
    w_min = wf.min(axis=1)
    w_max = wf.max(axis=1)
    scale = (w_max - w_min) / levels
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint((wf - w_min[:, None]) / scale[:, None]), 0, levels)
    out = {"scale": scale, "bias": w_min.astype(np.float32)}
    q8 = q.reshape(d_in, d_out).astype(np.uint8)
    if bits == 8:
        out["w_q"] = q8
    elif bits == 4:
        out["w_q4"] = pack_int4(q8)  # pure reshape/bit-ops: stays numpy
    else:
        raise ValueError(f"unsupported bits: {bits}")
    return out


def quantize_transformer_params(params, bits: int, group_size: int = 64,
                                w8a8: bool = False):
    """Quantize every large linear under `params["blocks"]` (any transformer
    pytree: video DiT, dual AV transformer).

    Stacked blocks have (L, in, out) weights — quantized per layer slice via
    vmap so group stats don't mix across layers. Norm weights, tables and
    small layers stay in bf16 (the reference likewise only quantizes Linear
    modules above a size threshold). Host (numpy) inputs quantize layer-by-
    layer on the host and stay there — see _quantize_weight_np.

    w8a8=True emits per-channel int8 leaves instead ({"w8","sw"}): the int8
    MXU dot runs the 6144-token denoise matmuls at 2.28 ms vs 4.6 ms for
    bf16/int4 (measured; docs/BENCH_NOTES.md §5) at 1 byte/weight and
    dynamically int8-quantized activations.
    """
    import numpy as np

    def quant_stacked(p):
        if w8a8:
            if isinstance(p["w"], np.ndarray):
                per_layer = [requant_int8_channel_np(w) for w in p["w"]]
                out = {k: np.stack([pl[k] for pl in per_layer])
                       for k in per_layer[0]}
            else:
                per_layer = [requant_int8_channel_np(np.asarray(w))
                             for w in np.asarray(p["w"])]
                out = {k: jnp.stack([jnp.asarray(pl[k]) for pl in per_layer])
                       for k in per_layer[0]}
        elif isinstance(p["w"], np.ndarray):
            per_layer = [_quantize_weight_np(w, bits, group_size)
                         for w in p["w"]]
            out = {k: np.stack([pl[k] for pl in per_layer])
                   for k in per_layer[0]}
        else:
            out = jax.vmap(lambda w: quantize_weight(w, bits, group_size))(
                p["w"])
        if "b" in p:
            out["b"] = p["b"]
        return out

    def maybe_quant(p):
        w = p["w"]
        if (w.ndim == 3 and w.shape[1] * w.shape[2] >= _MIN_QUANT_SIZE
                and w.shape[1] % group_size == 0):
            return quant_stacked(p)
        return p

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if (k in QUANTIZABLE_LEAVES and isinstance(v, dict) and "w" in v):
                out[k] = maybe_quant(v)
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return {**params, "blocks": walk(params["blocks"])}


# Backwards-compatible name (round-1 API; the walker now covers dit_av too).
quantize_dit_params = quantize_transformer_params
