"""GPipe-style pipeline parallelism over the stacked DiT block axis.

The reference runs its 48 transformer blocks strictly sequentially in one
process (LTXTransformer.swift:446-465) and has no parallelism of any kind
(SURVEY.md §2.9); like TP/SP this module is new TPU-first capability, not a
port. The design exploits the repo's params invariant directly: all blocks
are STACKED along a leading (L, ...) axis, so pipeline parallelism is just a
sharding of that axis —

* a ("data", "pipe") mesh: batch rows ride "data" (guidance branches at
  inference, sample rows in training), contiguous groups of L/S blocks live
  on each of the S "pipe" stages;
* inside `shard_map`, each stage runs its local sub-stack as the SAME
  `lax.scan` block body as the single-device forward (models/dit.py), so
  numerics are identical by construction;
* activations hop stage-to-stage with `lax.ppermute` over ICI. M microbatches
  keep stages busy; the classic GPipe fill/drain bubble is (S-1)/(M+S-1) of
  the steady-state time;
* the schedule is a `lax.scan` over M+S-1 ticks. Ticks where a stage has no
  real microbatch compute on garbage and are masked at collection — the
  standard TPU-friendly formulation (static shapes, no host control flow);
* everything is differentiable (ppermute/dynamic-slice/scan all have
  transposes), so the same forward drops into the flow-matching training
  step for pipeline-parallel training.

When to use which axis on real hardware: TP (parallel/sharding.py) is the
default for the 19B DiT on one v5e-8 slice — it shards *within* every matmul
and needs no bubble. PP becomes useful when the model axis is exhausted
(num_heads=32 caps TP) or across slower links: per-hop traffic here is one
(mb, T, C) activation per tick versus TP's two all-reduces per block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
    _CHECK_KW = {"check_vma": False}
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
    _CHECK_KW = {"check_rep": False}

from ltx_tpu.core.config import TransformerConfig
from ltx_tpu.core.errors import InvalidConfigurationError
from ltx_tpu.models import dit
from ltx_tpu.models.common import linear


def make_pp_mesh(data: int = 1, pipe: Optional[int] = None,
                 devices=None) -> Mesh:
    """A ("data", "pipe") mesh. Default: all devices on the pipe axis."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if pipe is None:
        pipe = n // data
    if data * pipe > n:
        raise InvalidConfigurationError(
            f"mesh {data}x{pipe} needs {data * pipe} devices, have {n}")
    arr = np.asarray(devices[: data * pipe]).reshape(data, pipe)
    return Mesh(arr, ("data", "pipe"))


def pp_param_specs(params) -> dict:
    """PartitionSpecs: the stacked block axis shards over "pipe"; the small
    non-block params (patchify/adaln/caption/head) replicate."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["blocks"] = jax.tree.map(lambda _: P("pipe"), params["blocks"])
    return specs


def shard_pp_params(params, mesh: Mesh):
    """Place a DiT pytree on a ("data", "pipe") mesh, block-stack sharded."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, pp_param_specs(params))


def dit_forward_pp(
    params,
    latent,          # (B, T, C) patchified tokens
    context,         # (B, S_ctx, caption_channels)
    timesteps,       # (B,) or (B, T) sigma values
    rope,            # (cos, sin) — replicated
    cfg: TransformerConfig,
    mesh: Mesh,
    context_bias=None,       # (B or 1, 1, 1, S_ctx) additive mask or None
    skip_self_attn=None,     # (L, B) bool — STG per-(block, sample)
    skip_ff=None,            # (L, B) bool
    cross_attn_scale=None,   # scalar or (L,)
    n_microbatches: Optional[int] = None,
    sdpa_impl: str = "auto",
    remat: bool = False,
):
    """Pipeline-parallel velocity prediction, numerically identical to
    `dit.dit_forward` (same block body, same order). `mesh` must carry
    ("data", "pipe") axes; the batch must divide data*n_microbatches."""
    n_data = mesh.shape["data"]
    n_stage = mesh.shape["pipe"]
    n_layers = cfg.num_layers
    batch = latent.shape[0]
    if n_layers % n_stage:
        raise InvalidConfigurationError(
            f"num_layers={n_layers} not divisible by pipe={n_stage}")
    if batch % n_data:
        raise InvalidConfigurationError(
            f"batch={batch} not divisible by data={n_data}")
    b_local = batch // n_data
    n_mb = n_microbatches or b_local
    if b_local % n_mb:
        raise InvalidConfigurationError(
            f"local batch={b_local} not divisible by microbatches={n_mb}")
    mb = b_local // n_mb

    # Normalize optional inputs to dense arrays so the shard_map signature
    # is static (same trick as dit_forward's defaults).
    if skip_self_attn is None:
        skip_self_attn = jnp.zeros((n_layers, batch), bool)
    if skip_ff is None:
        skip_ff = jnp.zeros((n_layers, batch), bool)
    if cross_attn_scale is None:
        cas = jnp.ones((n_layers,), jnp.float32)
    else:
        cas = jnp.broadcast_to(
            jnp.asarray(cross_attn_scale, jnp.float32), (n_layers,))
    if context_bias is None:
        bias = jnp.zeros((batch, 1, 1, context.shape[1]), jnp.float32)
    else:
        bias = jnp.broadcast_to(
            context_bias,
            (batch,) + tuple(context_bias.shape[1:])).astype(jnp.float32)
    if timesteps.ndim == 1:
        timesteps = timesteps[:, None]  # (B, 1) — slices like (B, T)

    bspec = P("data")
    in_specs = (
        pp_param_specs(params),
        bspec,                      # latent
        bspec,                      # context
        bspec,                      # timesteps
        P(),                        # rope
        bspec,                      # bias
        P("pipe", "data"),          # skip_self_attn
        P("pipe", "data"),          # skip_ff
        P("pipe"),                  # cas
    )

    def body(p, lat, ctx_raw, ts, pe, bias_b, skip_sa, skip_f, cas_l):
        dtype = lat.dtype
        # Replicated (cheap) pre/post compute — identical on every stage.
        x = linear(p["patchify_proj"], lat)
        ts_emb, embedded_ts = dit.prepare_timestep(
            p, ts.reshape(b_local, -1)[:, 0] if ts.shape[1] == 1 else ts,
            b_local, cfg, dtype)
        ctx = dit.caption_projection(
            p["caption_projection"], ctx_raw.astype(dtype))
        ctx = ctx.reshape(b_local, -1, cfg.inner_dim)

        # Microbatch-major stacking: (M, mb, ...)
        def split(a):
            return a.reshape((n_mb, mb) + a.shape[1:])

        xs = split(x)
        ts_mb = split(ts_emb)
        ctx_mb = split(ctx)
        bias_mb = split(bias_b)

        stage = lax.axis_index("pipe")

        def stage_fn(x_in, ctx_m, ts_m, bias_m, sa_m, ff_m):
            def blk(carry, scanned):
                bp, s_sa, s_ff, s_cas = scanned
                out = dit.block_forward(
                    bp, carry, ctx_m, ts_m, pe, bias_m, cfg,
                    skip_self_attn=s_sa, skip_ff=s_ff,
                    cross_attn_scale=s_cas, sdpa_impl=sdpa_impl)
                return out, None

            if remat:
                blk = jax.checkpoint(blk)
            y, _ = lax.scan(blk, x_in, (p["blocks"], sa_m, ff_m, cas_l))
            return y

        def tick(carry, t):
            buf, outs = carry
            m_here = t - stage                     # microbatch at this stage
            m_idx = jnp.clip(m_here, 0, n_mb - 1)
            x_in = jnp.where(
                stage == 0,
                lax.dynamic_index_in_dim(xs, m_idx, 0, keepdims=False),
                buf)
            ctx_m = lax.dynamic_index_in_dim(ctx_mb, m_idx, 0, keepdims=False)
            ts_m = lax.dynamic_index_in_dim(ts_mb, m_idx, 0, keepdims=False)
            bias_m = lax.dynamic_index_in_dim(
                bias_mb, m_idx, 0, keepdims=False)
            col = m_idx * mb
            sa_m = lax.dynamic_slice_in_dim(skip_sa, col, mb, axis=1)
            ff_m = lax.dynamic_slice_in_dim(skip_f, col, mb, axis=1)

            y = stage_fn(x_in, ctx_m, ts_m, bias_m, sa_m, ff_m)

            valid = (stage == n_stage - 1) & (m_here >= 0) & (m_here < n_mb)
            cur = lax.dynamic_index_in_dim(outs, m_idx, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), m_idx, 0)
            buf = lax.ppermute(
                y, "pipe", [(i, (i + 1) % n_stage) for i in range(n_stage)])
            return (buf, outs), None

        buf0 = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)
        (_, outs), _ = lax.scan(
            tick, (buf0, outs0), jnp.arange(n_mb + n_stage - 1))
        # Only the last stage wrote non-zeros; psum broadcasts to all stages
        # (one non-zero contributor -> exact).
        outs = lax.psum(outs, "pipe")
        x_full = outs.reshape(b_local, *outs.shape[2:])
        return dit.output_head(p, x_full, embedded_ts, cfg)

    fn = shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=bspec, **_CHECK_KW)
    return fn(params, latent, context, timesteps, rope, bias,
              skip_self_attn, skip_ff, cas)
