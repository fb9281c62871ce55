"""int8 KV cache (serving capacity: halves cache HBM -> ~2x max batch).

Opt-in numerics change (per-position int8 K/V with f32 scales), so tests
pin closeness to the bf16 cache at the attention level and exercise every
generation variant (sequential, speculative, batched, batched+spec) with
the quantized cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_tpu.models import gemma3


CFG = gemma3.Gemma3Config().tiny()


@pytest.fixture(scope="module")
def params():
    return gemma3.init_params(jax.random.key(0), CFG, jnp.float32)


def test_attention_int8_cache_close_to_bf16(params):
    p = jax.tree.map(lambda x: x[0], params["layers"])
    b, t, d = 1, 6, CFG.hidden_size
    x = jax.random.normal(jax.random.key(1), (b, t, d), jnp.float32)
    cos, sin = gemma3.rope_tables(16, CFG.head_dim, CFG.rope_theta)
    cos, sin = jnp.asarray(cos[:t]), jnp.asarray(sin[:t])
    bias = jnp.zeros((1, 1, t, 16), jnp.float32).at[..., t:].set(-1e9)

    nkv, hd = CFG.kv_heads, CFG.head_dim
    base = (jnp.zeros((b, nkv, 16, hd), jnp.float32),
            jnp.zeros((b, nkv, 16, hd), jnp.float32))
    out_base, _ = gemma3._attention(p, x, bias, cos, sin, CFG, base, 0)

    q8 = tuple(gemma3._kv_cache_init("int8", (b, nkv, 16, hd), jnp.float32)
               for _ in range(2))
    out_q, new_cache = gemma3._attention(p, x, bias, cos, sin, CFG, q8, 0)

    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_base),
                               rtol=5e-2, atol=5e-2)
    ck, cv = new_cache
    assert ck["q"].dtype == jnp.int8 and ck["s"].dtype == jnp.float32
    assert cv["q"].shape == (b, nkv, 16, hd)


def test_attention_int8_per_row_offsets(params):
    # batched-spec write path: (B,) per-row cache offsets
    p = jax.tree.map(lambda x: x[0], params["layers"])
    b, t, d = 2, 3, CFG.hidden_size
    x = jax.random.normal(jax.random.key(2), (b, t, d), jnp.float32)
    cos, sin = gemma3.rope_tables(12, CFG.head_dim, CFG.rope_theta)
    cos, sin = jnp.asarray(cos[:t]), jnp.asarray(sin[:t])
    bias = jnp.zeros((b, 1, t, 12), jnp.float32)

    nkv, hd = CFG.kv_heads, CFG.head_dim
    cache = tuple(gemma3._kv_cache_init("int8", (b, nkv, 12, hd),
                                        jnp.float32) for _ in range(2))
    offs = jnp.asarray([0, 4], jnp.int32)
    out, (ck, cv) = gemma3._attention(p, x, bias, cos, sin, CFG, cache, offs)
    assert np.isfinite(np.asarray(out)).all()
    # row 0 wrote slots 0..2, row 1 wrote slots 4..6
    s = np.asarray(ck["s"])
    assert (s[0, :, :3] != 1.0).any() and (s[0, :, 3:] == 1.0).all()
    assert (s[1, :, 4:7] != 1.0).any() and (s[1, :, :4] == 1.0).all()


@pytest.mark.parametrize("spec_k", [0, 4])
def test_generate_int8_kv(params, spec_k):
    ids = np.arange(5, 20)[None].astype(np.int32)
    toks = gemma3.generate_tokens(
        params, ids, CFG, jax.random.key(3), max_new_tokens=8,
        stop_tokens=(), bucket=16, spec_k=spec_k, kv_quant="int8")
    assert len(toks) == 8
    assert all(isinstance(t, int) and 0 <= t < CFG.vocab_size for t in toks)


@pytest.mark.parametrize("spec_k", [0, 4])
def test_generate_batched_int8_kv(params, spec_k):
    prompts = [list(range(5, 12)), list(range(30, 34))]
    outs = gemma3.generate_tokens_batched(
        params, prompts, CFG, jax.random.key(4), max_new_tokens=6,
        stop_tokens=(), bucket=16, spec_k=spec_k, kv_quant="int8")
    assert len(outs) == 2
    assert all(len(o) == 6 for o in outs)


def test_int8_roundtrip_exact_when_representable():
    """Values that ARE multiples of max/127 survive the int8 cache
    bit-exactly — pins the quantize/dequantize pair."""
    x = jnp.asarray(np.array([[1.0, -127.0, 64.0, 0.0]], np.float32) / 127.0)
    q, s = gemma3._quantize_kv(x)
    np.testing.assert_array_equal(
        np.asarray(q, np.float32) * np.asarray(s)[..., None],
        np.asarray(x))
