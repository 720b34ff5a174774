"""Block-wise 8-bit AdamW (TPU-native equivalent of bnb's AdamW8bit).

Reference surface: `train.py:244-279` gates `--use_8bit_adam` into
`bitsandbytes.optim.AdamW8bit` / `Adam8bit` — 8-bit optimizer state with
block-wise quantization (Dettmers et al., "8-bit Optimizers via Block-wise
Quantization").  This is the last reference optimizer flag without a repo
counterpart (VERDICT r4 missing #4).

TPU-first design (not a port of the CUDA kernels):

- Both Adam moments are stored as param-shaped int8 tensors plus fp32
  per-block scales (block = `block_size` contiguous elements of the
  flattened leaf; bnb default 2048, same here).  Param-shaped storage (via
  `zeros_like`) matters for ZeRO: the int8 state inherits the param's
  NamedSharding exactly like the fp32 moments do (trainer.init_state), so
  FSDP still shards it; the [nblocks] scales are replicated (tiny).
- bnb quantizes through a static nonlinear "dynamic map" lookup table —
  a gather per element, which is the wrong shape for the VPU.  Here the
  first moment is linear absmax int8 (symmetric, -127..127) and the second
  moment is quantized in the SQRT domain (uint8 0..255 of sqrt(v)/absmax):
  sqrt compresses v's intra-block dynamic range by half its decades, which
  recovers most of what the nonlinear map buys at zero gather cost — and
  the dequantized v enters the update only through sqrt(v) anyway, so the
  stored domain IS the consumed domain.  Deliberate divergence, documented
  here and in PARITY.md.
- The whole update is elementwise over param-shaped tensors + two tiny
  per-block reductions: XLA fuses it into the update step; no host round
  trips, no scalar loops.

State per leaf: (qm int8 like p, qv uint8 like p, sm fp32 [nb], sv fp32
[nb]) -> 2 bytes/param + 8/block vs Adam's 8 bytes/param: a 4x optimizer
state cut (the reference's motivation for the flag at 5.6 GB of trainable
Stage-3 state).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def _nblocks(size: int, block: int) -> int:
    return max(1, -(-size // block))


def _quant_m(x: jnp.ndarray, block: int):
    """Signed linear absmax int8 over flattened blocks; returns (q, scales)."""
    shape = x.shape
    n = x.size
    nb = _nblocks(n, block)
    xf = jnp.reshape(x.astype(jnp.float32), (-1,))
    xf = jnp.pad(xf, (0, nb * block - n)).reshape(nb, block)
    s = jnp.max(jnp.abs(xf), axis=1) / 127.0                    # [nb]
    q = jnp.round(xf / jnp.maximum(s, 1e-30)[:, None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q.reshape(-1)[:n].reshape(shape), s


def _dequant_m(q: jnp.ndarray, s: jnp.ndarray, block: int) -> jnp.ndarray:
    shape = q.shape
    n = q.size
    nb = s.shape[0]
    qf = jnp.pad(jnp.reshape(q, (-1,)), (0, nb * block - n))
    x = qf.reshape(nb, block).astype(jnp.float32) * s[:, None]
    return x.reshape(-1)[:n].reshape(shape)


def _quant_v(x: jnp.ndarray, block: int):
    """Second moment: uint8 linear absmax in the sqrt domain (x >= 0)."""
    shape = x.shape
    n = x.size
    nb = _nblocks(n, block)
    xf = jnp.sqrt(jnp.reshape(x.astype(jnp.float32), (-1,)))
    xf = jnp.pad(xf, (0, nb * block - n)).reshape(nb, block)
    s = jnp.max(xf, axis=1) / 255.0                             # [nb]
    q = jnp.round(xf / jnp.maximum(s, 1e-30)[:, None])
    q = jnp.clip(q, 0, 255).astype(jnp.uint8)
    return q.reshape(-1)[:n].reshape(shape), s


def _dequant_v(q: jnp.ndarray, s: jnp.ndarray, block: int) -> jnp.ndarray:
    shape = q.shape
    n = q.size
    nb = s.shape[0]
    qf = jnp.pad(jnp.reshape(q, (-1,)), (0, nb * block - n))
    r = qf.reshape(nb, block).astype(jnp.float32) * s[:, None]
    return jnp.square(r).reshape(-1)[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    qm: Any      # int8, param-shaped (inherits the param's sharding)
    qv: Any      # uint8, param-shaped
    sm: Any      # fp32 [nblocks] per leaf (replicated, tiny)
    sv: Any      # fp32 [nblocks] per leaf


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8,
                      block_size: int = 2048) -> optax.GradientTransformation:
    """Adam moment tracking with block-wise 8-bit state (see module doc)."""

    def init(params):
        qm = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.int8), params)
        qv = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.uint8), params)
        sm = jax.tree.map(
            lambda p: jnp.zeros((_nblocks(p.size, block_size),), jnp.float32),
            params)
        sv = jax.tree.map(
            lambda p: jnp.zeros((_nblocks(p.size, block_size),), jnp.float32),
            params)
        return Adam8bitState(count=jnp.zeros((), jnp.int32),
                             qm=qm, qv=qv, sm=sm, sv=sv)

    def update(grads, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, qm, qv, sm, sv):
            g32 = g.astype(jnp.float32)
            m = b1 * _dequant_m(qm, sm, block_size) + (1.0 - b1) * g32
            v = b2 * _dequant_v(qv, sv, block_size) + (1.0 - b2) * g32 * g32
            upd = ((m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(g.dtype)
            nqm, nsm = _quant_m(m, block_size)
            nqv, nsv = _quant_v(v, block_size)
            return upd, nqm, nqv, nsm, nsv

        out = jax.tree.map(leaf, grads, state.qm, state.qv, state.sm,
                           state.sv)
        pick = lambda i: jax.tree.map(
            lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple))
        updates = pick(0)
        return updates, Adam8bitState(count=count, qm=pick(1), qv=pick(2),
                                      sm=pick(3), sv=pick(4))

    return optax.GradientTransformation(init, update)


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 1e-4,
              block_size: int = 2048,
              mask: Optional[Any] = None) -> optax.GradientTransformation:
    """AdamW with block-wise 8-bit optimizer state (bnb AdamW8bit
    counterpart, reference `train.py:262`): decoupled weight decay applied
    after the quantized Adam step, then the (sign-flipped) LR scaling."""
    tx = [scale_by_adam8bit(b1=b1, b2=b2, eps=eps, block_size=block_size)]
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay, mask=mask))
    tx.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*tx)
