"""Flash-attention kernel micro-bench on the real chip.

Sweeps (block_q, block_k) for the fused-rope forward at the flagship shape
(S=18432 padded joint sequence, H=48, D=64) and reports TF/s.  Drives
kernel tuning without full-model compiles (each config compiles in ~30 s).
"""

import itertools
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
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


if __name__ == "__main__":
    main()
