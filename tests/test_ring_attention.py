"""Ring attention (sequence parallel) vs single-device SDPA."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from bindyouravatar_tpu.ops.attention import sdpa
from bindyouravatar_tpu.ops.ring_attention import ring_attention


def _mesh():
    import numpy as onp

    return Mesh(onp.asarray(jax.devices()).reshape(8), ("sp",))


def test_ring_attention_matches_sdpa():
    mesh = _mesh()
    q = jax.random.normal(jax.random.key(0), (2, 4, 256, 32))
    k = jax.random.normal(jax.random.key(1), (2, 4, 256, 32))
    v = jax.random.normal(jax.random.key(2), (2, 4, 256, 32))
    out = ring_attention(q, k, v, mesh)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_valid_len_mask():
    mesh = _mesh()
    s, valid = 256, 200
    q = jax.random.normal(jax.random.key(0), (1, 2, s, 32))
    k = jax.random.normal(jax.random.key(1), (1, 2, s, 32))
    v = jax.random.normal(jax.random.key(2), (1, 2, s, 32))
    out = ring_attention(q, k, v, mesh, valid_len=valid)
    ref = sdpa(q, k[:, :, :valid], v[:, :, :valid])
    np.testing.assert_allclose(np.asarray(out[:, :, :valid]),
                               np.asarray(ref[:, :, :valid]), atol=2e-5)
