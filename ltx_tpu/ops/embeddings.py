"""Timestep sinusoidal embeddings.

Reference: Sources/LTXVideo/Models/Transformer/LTXTimestepEmbedding.swift:17-54.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_timestep_embedding(timesteps, embedding_dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding: freq_k = exp(-log(P) * k / half) for
    k = arange(half) (NOT linspace — reference: LTXTimestepEmbedding.swift:24),
    output = concat(cos, sin) in float32.

    timesteps: (...,) any shape; output (..., embedding_dim) float32.
    """
    half = embedding_dim // 2
    freq_idx = jnp.arange(half, dtype=jnp.float32) / np.float32(half)
    freqs = jnp.exp(-np.log(max_period).astype(np.float32) * freq_idx)

    shape = timesteps.shape
    args = timesteps.astype(jnp.float32).reshape(-1, 1) * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros((emb.shape[0], 1), emb.dtype)], axis=-1)
    return emb.reshape(*shape, embedding_dim)
