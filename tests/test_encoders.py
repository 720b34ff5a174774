"""T5 encoder and EVA-CLIP vision tower tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from bindyouravatar_tpu.models.eva_clip import EVACLIPVision
from bindyouravatar_tpu.models.t5 import T5TextEncoder, relative_position_bucket


def test_t5_encoder_shapes_and_mask():
    enc = T5TextEncoder.tiny()
    params = enc.init(jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (2, 16), 0, 128)
    out = enc.apply(params, ids)
    assert out.shape == (2, 16, 32)
    assert np.all(np.isfinite(np.asarray(out)))
    # masked positions must not influence unmasked outputs
    mask = jnp.ones((2, 16), bool).at[:, 8:].set(False)
    o1 = enc.apply(params, ids, mask)
    ids2 = ids.at[:, 8:].set(0)
    o2 = enc.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(o1[:, :8]), np.asarray(o2[:, :8]),
                               atol=1e-5)


def test_t5_relative_buckets():
    rel = np.arange(-10, 11)[None, :]
    b = relative_position_bucket(rel)
    assert b.min() >= 0 and b.max() < 32
    assert b[0, 10] == 0                     # distance 0 -> bucket 0
    assert (b[0, :10] < 16).all()            # past positions in lower half
    assert (b[0, 11:] >= 16).all()           # future positions offset by 16


def test_eva_vision_tower():
    eva = EVACLIPVision.tiny()
    params = eva.init(jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (2, 3, 28, 28))
    pooled, hidden = eva.apply(params, img)
    assert pooled.shape == (2, 16)
    # 28/14 = 2x2 grid + cls = 5 tokens; 5 taps
    assert hidden.shape == (2, 5, 5, 32)
    assert np.all(np.isfinite(np.asarray(pooled)))


def test_eva_rope_excludes_cls():
    """cls token attention must be position-independent: rolling the image
    patches must leave the pooled-from-cls path well-defined (smoke)."""
    eva = EVACLIPVision.tiny()
    params = eva.init(jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (1, 3, 28, 28))
    p1, _ = eva.apply(params, img)
    assert np.all(np.isfinite(np.asarray(p1)))
