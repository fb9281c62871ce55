"""Ring attention vs single-device SDPA on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_tpu.ops.attention import _xla_sdpa
from ltx_tpu.parallel.ring_attention import sequence_parallel_sdpa
from ltx_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=1, model=8)


def _qkv(key, b=1, h=4, t=256, d=32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, t, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, t, d), jnp.float32)
    return q, k, v


def test_ring_matches_sdpa(mesh):
    q, k, v = _qkv(jax.random.key(0))
    ref = _xla_sdpa(q, k, v)
    out = sequence_parallel_sdpa(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_with_key_bias(mesh):
    q, k, v = _qkv(jax.random.key(1))
    t = q.shape[2]
    bias = jnp.where(jnp.arange(t)[None] < t - 64, 0.0, -1e9
                     ).astype(jnp.float32)  # mask last 64 keys
    ref = _xla_sdpa(q, k, v, bias=bias[:, None, None, :])
    out = sequence_parallel_sdpa(q, k, v, mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_output_stays_sequence_sharded(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(jax.random.key(2))
    sharding = NamedSharding(mesh, P(None, None, "model", None))
    q = jax.device_put(q, sharding)
    k = jax.device_put(k, sharding)
    v = jax.device_put(v, sharding)
    out = sequence_parallel_sdpa(q, k, v, mesh)
    assert out.sharding.spec == P(None, None, "model", None)