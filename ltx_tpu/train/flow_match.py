"""Rectified-flow (flow-matching) training objective for the LTX-2 DiT.

Uses the inference scheduler's exact conventions so a trained model plugs
straight into the denoise loop:

* forward process  x_t = (1 - t) x_0 + t * noise
  (ops/schedule.py::add_noise — reference LTXScheduler.swift:334-341);
* velocity target  v* = noise - x_0
  (ops/schedule.py::velocity_target; consistent with euler_step's
  `denoised = x - sigma * v`: substituting v* recovers x_0 exactly).

The model forward is the SAME dit_forward the denoise loop jits — stacked
blocks under lax.scan, remat-able — so everything measured about the
inference step (MXU utilisation, TP shardings) transfers to training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ltx_tpu.core.config import TransformerConfig
from ltx_tpu.models import dit
from ltx_tpu.ops.schedule import add_noise, velocity_target


def sample_sigmas(key, batch: int, scheme: str = "logit_normal",
                  mean: float = 0.0, std: float = 1.0):
    """Draw per-sample noise levels t in (0, 1).

    "uniform": t ~ U(0, 1); "logit_normal": sigmoid(N(mean, std)) — the
    SD3/rectified-flow density that concentrates samples at mid noise
    levels where the velocity is hardest to predict.
    """
    if scheme == "uniform":
        return jax.random.uniform(key, (batch,), jnp.float32,
                                  minval=1e-5, maxval=1.0 - 1e-5)
    if scheme == "logit_normal":
        z = jax.random.normal(key, (batch,), jnp.float32) * std + mean
        return jax.nn.sigmoid(z)
    raise ValueError(f"unknown sigma sampling scheme: {scheme}")


def flow_match_loss(
    params,
    tokens,            # (B, T, C) patchified clean latents, float32
    context,           # (B, S, caption_channels)
    rope,              # (cos, sin) from ops.rope for the latent grid
    key,
    cfg: TransformerConfig,
    context_bias=None,       # (B, 1, 1, S) additive text mask or None
    sigma_scheme: str = "logit_normal",
    sdpa_impl: str = "auto",
    remat: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Mean-squared velocity-matching loss. Returns (loss, aux dict).

    Noise levels and noise are drawn from `key` (threaded per step by the
    caller); the loss reduces in float32.
    """
    b = tokens.shape[0]
    k_sigma, k_noise = jax.random.split(key)
    sigma = sample_sigmas(k_sigma, b, sigma_scheme)        # (B,)
    noise = jax.random.normal(k_noise, tokens.shape, jnp.float32)

    x0 = tokens.astype(jnp.float32)
    x_t = add_noise(x0, noise, sigma[:, None, None])
    target = velocity_target(x0, noise)

    v_pred = dit.dit_forward(
        params, x_t.astype(compute_dtype), context, sigma, rope, cfg,
        context_bias=context_bias, sdpa_impl=sdpa_impl, remat=remat,
    ).astype(jnp.float32)

    err = v_pred - target
    loss = jnp.mean(jnp.square(err))
    return loss, {"loss": loss, "sigma_mean": jnp.mean(sigma)}
