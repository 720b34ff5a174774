"""Chip A/B: regular flat flash forward vs transposed-PV flat forward.

In-model joint shape (S=18432 padded, kv_len=17776, H=48, D=64) with fused
QK-LN + RoPE, sweeping block sizes.  Numerics cross-checked on-chip.
"""

import itertools
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from bindyouravatar_tpu.ops.flash_attention import (
        _fwd_flat_impl, _fwd_flat_t_impl)
    from bindyouravatar_tpu.ops.rope import get_3d_rotary_pos_embed

    b, h, s, d = 1, 48, 18432, 64
    kv_len = 17776
    ks = jax.random.split(jax.random.key(0), 8)
    q = jax.random.normal(ks[0], (b, s, h * d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h * d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h * d), jnp.bfloat16)
    vt = jnp.swapaxes(v, 1, 2)

    cos_v, sin_v = get_3d_rotary_pos_embed(d, ((0, 0), (30, 45)), (30, 45), 13)
    pad = s - 226 - cos_v.shape[0]
    cos = jnp.concatenate([jnp.ones((226, d)), cos_v.astype(jnp.float32),
                           jnp.ones((pad, d))])
    sin = jnp.concatenate([jnp.zeros((226, d)), sin_v.astype(jnp.float32),
                           jnp.zeros((pad, d))])
    qk_norm = tuple(1.0 + 0.1 * jax.random.normal(kk, (d,), jnp.float32)
                    for kk in ks[3:7])

    flops = 4 * b * h * kv_len * kv_len * d

    def timeit(f, *args, n=8):
        out = f(*args)
        _ = float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _i in range(n):
            out = f(*args)
        _ = float(out[0, 0, 0])
        return (time.perf_counter() - t0) / n, out

    if "--chunk_sweep" in sys.argv:
        # pipelined-schedule sweep: flat_t only, chunks x a small block grid
        ref = None
        results = []
        # nc=1 at these blocks already measured (runs/chip_r5/flat_t_chunks
        # .log: 42.8-43.5 ms); remote compiles are ~6 min each, so sweep
        # only the pipelined schedules at the two best block configs
        for nc in (2, 3, 4):
            for bq, bk in ((1536, 1536), (1536, 3072)):
                if bq % nc or (bq // nc) % 128:
                    continue
                f = jax.jit(lambda q, k, vt, bq=bq, bk=bk, nc=nc:
                            _fwd_flat_t_impl(
                                q, k, vt, h, (cos, sin), d ** -0.5,
                                kv_len, bq, bk, False, qk_norm=qk_norm,
                                pipeline_chunks=nc))
                try:
                    dt, out = timeit(f, q, k, vt)
                except Exception as e:
                    print(dict(nc=nc, bq=bq, bk=bk,
                               error=str(e).split(chr(10))[0][:120]),
                          flush=True)
                    continue
                if ref is None:
                    ref = out
                    err = 0.0
                else:
                    err = float(jnp.max(jnp.abs(
                        out[:, :kv_len].astype(jnp.float32)
                        - ref[:, :kv_len].astype(jnp.float32))))
                r = dict(nc=nc, bq=bq, bk=bk, ms=round(dt * 1e3, 1),
                         tf_s=round(flops / dt / 1e12, 1), maxdiff=err)
                results.append(r)
                print(r, flush=True)
        best = min(results, key=lambda r: r["ms"])
        print(json.dumps({"best": best}))
        return

    results = []
    ref_out = None
    for bq, bk in itertools.product((1024, 1536, 2048, 3072), repeat=2):
        if s % bq or s % bk:
            continue
        # the flat (rotated-store) kernel is only kept as the numerics
        # reference — sweep it at the small configs, flat_t everywhere
        kinds = ("flat", "flat_t") if max(bq, bk) <= 1536 else ("flat_t",)
        for kind in kinds:
            try:
                if kind == "flat":
                    f = jax.jit(lambda q, k, v, bq=bq, bk=bk: _fwd_flat_impl(
                        q, k, v, h, (cos, sin), d ** -0.5, kv_len, bq, bk,
                        False, qk_norm=qk_norm))
                    dt, out = timeit(f, q, k, v)
                else:
                    f = jax.jit(lambda q, k, vt, bq=bq, bk=bk:
                                _fwd_flat_t_impl(
                                    q, k, vt, h, (cos, sin), d ** -0.5,
                                    kv_len, bq, bk, False, qk_norm=qk_norm))
                    dt, out = timeit(f, q, k, vt)
                if ref_out is None:
                    ref_out = out
                    err = 0.0
                else:
                    err = float(jnp.max(jnp.abs(
                        out[:, :kv_len].astype(jnp.float32)
                        - ref_out[:, :kv_len].astype(jnp.float32))))
                r = dict(kind=kind, bq=bq, bk=bk, ms=round(dt * 1e3, 1),
                         tf_s=round(flops / dt / 1e12, 1), maxdiff=err)
                results.append(r)
                print(r, flush=True)
            except Exception as e:
                print(dict(kind=kind, bq=bq, bk=bk,
                           error=str(e).split(chr(10))[0][:120]), flush=True)
    best = {}
    for r in results:
        if r["kind"] not in best or r["ms"] < best[r["kind"]]["ms"]:
            best[r["kind"]] = r
    print(json.dumps(best))


if __name__ == "__main__":
    main()
