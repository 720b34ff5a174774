"""int8 MXU rate at the flash kernel's exact tile shapes (VMEM-chained).

The flat_t flash forward is capped by its QK^T matmul: contraction d=64
uses half the MXU's 128-deep systolic contraction, so bf16 QK tops out at
~98 TF/s while the transposed PV runs full-rate.  The v5e MXU's int8 path
has 2x the bf16 peak (394 TOP/s), so IF an int8 d=64 dot runs at ~197
TOP/s, quantizing q/k tiles per-row to int8 (noise comparable to the bf16
mantissa rounding already present) would halve the QK cost — worth ~880
ms/step on the conditioned flagship.

tools/int8_mxu.log measured single HBM-fed dots (bandwidth-bound, 15-35
TF/s — useless for rate).  This bench chains R dots inside ONE kernel on
VMEM-resident tiles (the mxu_orient_bench harness) so the number is the
true MXU issue rate.  Also times the per-row quantize pass (absmax +
scale + round) to include in the budget.

Run on the real chip:  python tools/int8_flash_bench.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ, BK, D = 1536, 1536, 64


def _loop_kernel(a_ref, b_ref, o_ref, *, dims, r, out_shape, acc_dtype):
    a = a_ref[...]
    b = b_ref[...]

    def body(i, acc):
        # nudge `a` by the iteration index so Mosaic cannot hoist the dot
        # (zero-multiply / zero-add keeps numerics identical)
        if a.dtype == jnp.int8:
            aa = (a.astype(jnp.int32) | (i * 0)).astype(jnp.int8)
        else:
            aa = a + (i * 0.0).astype(a.dtype)
        return acc + jax.lax.dot_general(
            aa, b, (dims, ((), ())), preferred_element_type=acc_dtype)

    acc = jnp.zeros(out_shape, acc_dtype)
    o_ref[...] = jax.lax.fori_loop(0, r, body, acc)


def bench_case(name, a_shape, b_shape, dims, out_shape, dtype, acc_dtype,
               r=4000):
    a = jnp.ones(a_shape, dtype)
    b = jnp.ones(b_shape, dtype)
    kern = functools.partial(_loop_kernel, dims=dims, r=r,
                             out_shape=out_shape, acc_dtype=acc_dtype)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, acc_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    f = jax.jit(call)
    kdim = a_shape[dims[0][0]]
    m = a_shape[1 - dims[0][0]]
    n = b_shape[1 - dims[1][0]]
    flops = 2.0 * m * n * kdim * r
    out = f(a, b)
    _ = float(out[0, 0])                       # compile+sync (relay-safe)
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = f(a, b)
        _ = float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    tf = flops / best / 1e12
    print(f"{name:30s} {m:4d}x{kdim:3d} . {kdim:3d}x{n:4d}"
          f"  {best * 1e3:8.2f} ms  {tf:7.1f} T/s", flush=True)
    return tf


def _quant_kernel(x_ref, o_ref, s_ref, *, r):
    x = x_ref[...]

    def body(i, carry):
        acc, sacc = carry
        xx = x + (i * 0.0).astype(x.dtype)
        amax = jnp.max(jnp.abs(xx), axis=1, keepdims=True)      # [bq,1]
        scale = jnp.where(amax == 0, 1.0, amax * (1.0 / 127.0))
        qi = jnp.round(xx / scale).astype(jnp.int8)
        return acc + qi.astype(jnp.int32), sacc + scale

    acc = jnp.zeros(x.shape, jnp.int32)
    sacc = jnp.zeros((x.shape[0], 1), jnp.float32)
    acc, sacc = jax.lax.fori_loop(0, r, body, (acc, sacc))
    o_ref[...] = acc
    s_ref[...] = sacc


def bench_quant(r=4000):
    x = jnp.ones((BQ, D), jnp.float32)
    kern = functools.partial(_quant_kernel, r=r)
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((BQ, D), jnp.int32),
                   jax.ShapeDtypeStruct((BQ, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    f = jax.jit(call)
    out, _s = f(x)
    _ = float(out[0, 0])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out, _s = f(x)
        _ = float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    us = best / r * 1e6
    print(f"{'quantize [bq,64] per-row':30s} {us:8.3f} us/tile", flush=True)
    return us


def main():
    print(jax.devices(), flush=True)
    res = {}
    nt = (((1,), (1,)))
    nn = (((1,), (0,)))
    # current QK orientation: st = k [bk,64] . q [bq,64]^T  -> [bk,bq]
    res["st_bf16_d64"] = bench_case(
        "st NT bf16 d=64 (current)", (BK, D), (BQ, D), nt, (BK, BQ),
        jnp.bfloat16, jnp.float32)
    res["st_int8_d64"] = bench_case(
        "st NT int8 d=64", (BK, D), (BQ, D), nt, (BK, BQ),
        jnp.int8, jnp.int32)
    # calibration at full contraction depth
    res["st_bf16_d128"] = bench_case(
        "st NT bf16 d=128 (calib)", (BK, 2 * D), (BQ, 2 * D), nt, (BK, BQ),
        jnp.bfloat16, jnp.float32)
    res["st_int8_d128"] = bench_case(
        "st NT int8 d=128", (BK, 2 * D), (BQ, 2 * D), nt, (BK, BQ),
        jnp.int8, jnp.int32)
    res["st_int8_d256"] = bench_case(
        "st NT int8 d=256", (BK, 4 * D), (BQ, 4 * D), nt, (BK, BQ),
        jnp.int8, jnp.int32)
    # current PV (transposed, vt cached): vt [65,bk] . p_t [bk,bq] NN
    res["pvt_bf16"] = bench_case(
        "pv_t NN bf16 (current)", (D + 1, BK), (BK, BQ), nn, (D + 1, BQ),
        jnp.bfloat16, jnp.float32)
    res["pvt_int8"] = bench_case(
        "pv_t NN int8", (D + 1, BK), (BK, BQ), nn, (D + 1, BQ),
        jnp.int8, jnp.int32)
    res["quant_us_per_tile"] = bench_quant()
    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
