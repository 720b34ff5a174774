"""Flash BACKWARD micro-bench on the real chip at the joint training shape.

Times fwd+bwd (jax.vjp, recomputing the residual-saving forward inside the
jit) for the bhsd layout (the production training layout) with fused rope at S=18432/H=48/D=64, comparing the
two-kernel backward (dkv + dq pallas calls) against the combined flat
single-pass kernel (`_bwd_flat_impl`).  Dependency-chained timing (the axon
relay's dispatch floor lies for single calls — CLAUDE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bindyouravatar_tpu.ops import flash_attention as fa
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, h, s, d = 1, 48, 18432, 64
    kv_len = 17776
    bq = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    bk = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    # bhsd — the layout the production training path feeds the kernel
    # (flash_attention transposes bshd -> bhsd behind a barrier on TPU)
    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)
    do = jax.random.normal(jax.random.key(3), (b, h, s, d), jnp.bfloat16)

    cos_v, sin_v = get_3d_rotary_pos_embed(d, ((0, 0), (30, 45)), (30, 45), 13)
    pad = s - 226 - cos_v.shape[0]
    cos = jnp.concatenate([jnp.ones((226, d)), cos_v, jnp.ones((pad, d))])
    sin = jnp.concatenate([jnp.zeros((226, d)), sin_v, jnp.zeros((pad, d))])

    # fwd QK+PV, bwd 5 recompute/grad matmuls
    flops = (2 + 5) * 2 * b * h * kv_len * kv_len * d

    def grad_fn(q, k, v, do):
        f = lambda a, bb, c: fa._flash(a, bb, c, cos, sin, d ** -0.5,
                                       kv_len, bq, bk, False, False)
        _, vjp = jax.vjp(f, q, k, v)
        return vjp(do)[:3]

    out = {}
    variants = () if "--flat_only" in sys.argv else (False, True)
    for combined in variants:
        fa.COMBINED_BWD = combined
        gf = jax.jit(grad_fn)
        try:
            dq, dk, dv = gf(q, k, v, do)
            float(dq[0, 0, 0, 0])
            n = 6
            t0 = time.perf_counter()
            for _ in range(n):
                dq, dk, dv = gf(q, k, dv.astype(v.dtype), dq.astype(do.dtype))
            float(dq[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / n
            out["combined" if combined else "two_kernel"] = dict(
                ms=round(dt * 1e3, 1), tf_s=round(flops / dt / 1e12, 1))
            print(out["combined" if combined else "two_kernel"], flush=True)
        except Exception as e:
            out["combined" if combined else "two_kernel"] = dict(
                error=str(e).split(chr(10))[0][:160])
            print(out["combined" if combined else "two_kernel"], flush=True)
        finally:
            gf.clear_cache()
    fa.COMBINED_BWD = True

    # FLAT training layout (round 5: the production path keeps q/k/v
    # [B, S, H*D] end to end — per-block bwd IO, no bhsd residual copies)
    qf = q.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    kf = k.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    vf = v.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    dof = do.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    def grad_fn_flat(q_, k_, v_, do_):
        f = lambda a, bb, c: fa._flash_flat(a, bb, c, cos, sin, h,
                                            d ** -0.5, kv_len, bq, bk, False)
        _, vjp = jax.vjp(f, q_, k_, v_)
        return vjp(do_)[:3]

    gff = jax.jit(grad_fn_flat)
    try:
        dq, dk, dv = gff(qf, kf, vf, dof)
        float(dq[0, 0, 0])
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            dq, dk, dv = gff(qf, kf, dv.astype(vf.dtype),
                             dq.astype(dof.dtype))
        float(dq[0, 0, 0])
        dt = (time.perf_counter() - t0) / n
        out["flat"] = dict(ms=round(dt * 1e3, 1),
                           tf_s=round(flops / dt / 1e12, 1))
    except Exception as e:
        out["flat"] = dict(error=str(e).split(chr(10))[0][:160])
    print(out["flat"], flush=True)
    print(json.dumps({"bq": bq, "bk": bk, **out}))


if __name__ == "__main__":
    main()
