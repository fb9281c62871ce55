"""Pallas TPU fused RMSNorm (weightless + weighted variants).

The reference leans on MLXFast.rmsNorm's fused Metal kernel for every norm
(reference: Sources/LTXVideo/Models/Transformer/LTXAttention.swift:22-33);
the TPU equivalent is normally XLA's own fusion of the f32 cast -> square ->
mean -> rsqrt -> scale chain (ops/normalization.py). This kernel exists to
CLOSE that question with a measurement rather than a claim: one VMEM pass
per row block, f32 statistics, result cast back to the input dtype — the
same f32 expression as ops.normalization.rms_norm (equal up to reduction
order of the mean; pinned by tests/test_pallas_kernels.py in interpret
mode).

Use `ops.normalization.set_rms_impl("pallas")` to route the model norms here
(inference only — no custom VJP is defined; training keeps the XLA path,
whose backward XLA fuses just as well).

Shape contract: normalizes over the LAST axis, which must be a multiple of
128 lanes (all model widths are: 4096 DiT, 3840 connector/Gemma, 2048 audio,
256 Gemma heads). Leading axes flatten to rows; rows pad to the block size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_ROWS = 256


def _rms_kernel(x_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    o_ref[...] = (xf * inv).astype(o_ref.dtype)


def _rms_kernel_weighted(x_ref, w_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = (xf * inv) * w_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows",
                                             "interpret"))
def rms_norm_pallas(x, weight=None, eps: float = 1e-6,
                    block_rows: int = DEFAULT_BLOCK_ROWS,
                    interpret: bool = False):
    """Fused RMSNorm over the last axis. Drop-in for normalization.rms_norm.

    weight=None is the weightless (identity-scale) variant the DiT's adaln
    uses; a 1-D weight multiplies the normalized value (DiT q/k norms).
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    if d % 128 != 0:
        raise ValueError(f"rms_norm_pallas: last dim {d} not lane-aligned")
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    br = min(block_rows, max(8, rows))
    pad = (-rows) % br
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // br,)

    if weight is None:
        out = pl.pallas_call(
            functools.partial(_rms_kernel, eps=eps),
            grid=grid,
            in_specs=[pl.BlockSpec((br, d), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            interpret=interpret,
        )(x2)
    else:
        w2 = weight.reshape(1, d)
        out = pl.pallas_call(
            functools.partial(_rms_kernel_weighted, eps=eps),
            grid=grid,
            in_specs=[
                pl.BlockSpec((br, d), lambda i: (i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            interpret=interpret,
        )(x2, w2)

    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)
