"""Pallas kernel micro-bench on the real chip.

Sweeps (block_q, block_k) for the fused-rope flash forward at the flagship
shape (S=18432 padded joint sequence, H=48, D=64) and reports TF/s, then
times the conditioning-path kernels (packed-head STAB attention, short-KV
cross-attention) at their in-model shapes.  Pass "cond" as argv[2] to run
only the conditioning kernels.
"""

import itertools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bindyouravatar_tpu.ops.flash_attention import _flash
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, h, s, d = (int(sys.argv[1]) if len(sys.argv) > 1 else 1), 48, 18432, 64
    kv_len = 17776
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)

    cos_v, sin_v = get_3d_rotary_pos_embed(d, ((0, 0), (30, 45)), (30, 45), 13)
    pad = s - 226 - cos_v.shape[0]
    cos = jnp.concatenate([jnp.ones((226, d)), cos_v, jnp.ones((pad, d))])
    sin = jnp.concatenate([jnp.zeros((226, d)), sin_v, jnp.zeros((pad, d))])

    flops = 4 * b * h * kv_len * kv_len * d  # QK^T + PV

    results = []
    for bq, bk in itertools.product((512, 1024, 1536, 2048), repeat=2):
        if s % bq or s % bk or bq % bk:
            continue
        for use_rope in (True, False):
            c, si = (cos, sin) if use_rope else (None, None)
            try:
                f = jax.jit(lambda q, k, v, c=c, si=si, bq=bq, bk=bk: _flash(
                    q, k, v, c, si, d ** -0.5, kv_len, bq, bk, False))
                out = f(q, k, v)
                float(out[0, 0, 0, 0])
                t0 = time.perf_counter()
                n = 8
                for _ in range(n):
                    out = f(q, k, out)   # dependency chain
                float(out[0, 0, 0, 0])
                dt = (time.perf_counter() - t0) / n
                tfs = flops / dt / 1e12
                results.append(dict(bq=bq, bk=bk, rope=use_rope,
                                    ms=round(dt * 1e3, 1), tf_s=round(tfs, 1)))
                print(results[-1], flush=True)
            except Exception as e:
                print(dict(bq=bq, bk=bk, rope=use_rope,
                           error=str(e).split(chr(10))[0][:100]), flush=True)
    best = max((r for r in results if r["rope"]), key=lambda r: r["tf_s"],
               default=None)
    print(json.dumps({"best_rope": best}))


def cond_kernels():
    """Time the conditioning-path kernels at their in-model shapes."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bindyouravatar_tpu.ops.packed_attention import packed_head_attention
    from bindyouravatar_tpu.ops.short_kv_attention import (
        short_kv_attention, short_kv_attention_combined)

    def timeit(f, *a, n=20):
        o = f(*a)
        float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*a)
        float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0].astype(jnp.float32))
        return (time.perf_counter() - t0) / n

    out = []
    for label, m, sh, heads in (("stab_temporal", 2700, 13 * 8, 8),
                                ("stab_multi_id", 17550, 2 * 8, 8)):
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (jax.random.normal(kk, (m, sh, 64), jnp.bfloat16)
                   for kk in ks)
        f = jax.jit(lambda q, k, v: packed_head_attention(q, k, v, heads,
                                                          64 ** -0.5))
        out.append((label, timeit(f, q, k, v) * 1e3))
    ks = jax.random.split(jax.random.key(1), 4)
    q = jax.random.normal(ks[0], (13, 48, 1350, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (13, 2, 48, 32, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (13, 2, 48, 32, 64), jnp.bfloat16)
    w = jax.random.uniform(ks[3], (13, 1350, 2)).astype(jnp.bfloat16)
    f = jax.jit(lambda q, k, v, w: short_kv_attention_combined(
        q, k, v, w, 64 ** -0.5))
    out.append(("audio_short_kv_combined", timeit(f, q, k, v, w) * 1e3))
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (1, 16, 17550, 128), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 2, 16, 32, 128), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 2, 16, 32, 128), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: short_kv_attention(q, k, v, 128 ** -0.5))
    out.append(("perceiver_short_kv", timeit(f, q, k, v) * 1e3))
    for label, ms in out:
        print(json.dumps({"kernel": label, "ms": round(ms, 2)}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "cond":
        cond_kernels()
    else:
        main()
        cond_kernels()

