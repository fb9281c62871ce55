"""Quantized Gemma: MLX 4-bit repack exactness + quantized forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_tpu.kernels.quantization import dequantize_weight
from ltx_tpu.models import gemma3
from ltx_tpu.weights import keymaps


def _mlx_pack(q_vals, scales, biases):
    """Pack (out, in) 4-bit values into MLX uint32 format."""
    o, i = q_vals.shape
    packed = np.zeros((o, i // 8), np.uint32)
    for n in range(8):
        packed |= q_vals[:, n::8].astype(np.uint32) << (4 * n)
    return {"weight": packed, "scales": scales, "biases": biases}


def test_repack_is_exact():
    rng = np.random.default_rng(0)
    o, i, g = 16, 128, 64
    q_vals = rng.integers(0, 16, (o, i)).astype(np.uint8)
    scales = rng.uniform(0.01, 0.1, (o, i // g)).astype(np.float32)
    biases = rng.uniform(-1, 0, (o, i // g)).astype(np.float32)
    mlx = _mlx_pack(q_vals, scales, biases)
    tensors = {f"x.{k}": v for k, v in mlx.items()}

    # MLX semantics: w[o, i] = q * scales[o, i//g] + biases[o, i//g]
    w_mlx = (q_vals.astype(np.float32)
             * np.repeat(scales, g, axis=1)
             + np.repeat(biases, g, axis=1))

    ours = keymaps._repack_mlx_4bit(tensors, "x")
    w_ours = np.asarray(dequantize_weight(ours, jnp.float32))
    np.testing.assert_allclose(w_ours, w_mlx.T, atol=1e-6)


def test_gemma_forward_with_quantized_layers():
    """Quantized projections must run and approximate the bf16 forward."""
    cfg = gemma3.Gemma3Config().tiny()
    params = gemma3.init_params(jax.random.key(0), cfg, jnp.float32)

    from ltx_tpu.kernels.quantization import quantize_linear_params

    qlayers = dict(params["layers"])
    for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        stacked = params["layers"][name]["w"]  # (L, in, out)
        per = [quantize_linear_params({"w": stacked[i]}, bits=8)
               for i in range(cfg.hidden_layers)]
        qlayers[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    qparams = {**params, "layers": qlayers}

    ids = jnp.asarray([[3, 5, 7, 9]])
    mask = jnp.ones((1, 4), jnp.int32)
    base = gemma3.forward_hidden_states(params, ids, mask, cfg)
    quant = gemma3.forward_hidden_states(qparams, ids, mask, cfg)
    assert np.isfinite(np.asarray(quant)).all()
    # final states should be close (int8 error accumulates over 7 layers)
    corr = np.corrcoef(np.asarray(base[-1]).ravel(),
                       np.asarray(quant[-1]).ravel())[0, 1]
    assert corr > 0.99, f"quantized gemma diverged: corr={corr}"