"""MXU dot-orientation microbench (flash-kernel layout study).

The joint flash forward runs ~82 TF/s against a ~98 TF/s ceiling.  Theory:
BOTH its matmuls are half-rate — QK^T contracts over d=64 (half the MXU's
128-deep systolic contraction) and PV emits only dh+1=65 output lanes (half
the 128-wide output tile).  A transposed-PV layout

    acc_t[d, q] += sum_k v[k, d] * p_t[k, q]        # N = block_q = 512

would lift PV to full width.  This tool measures the candidate orientations
as standalone Pallas kernels at the exact flash tile shapes so the rewrite
decision is data-driven (reference hot path being optimized:
/root/reference/models/attention.py joint attention; our kernel
bindyouravatar_tpu/ops/flash_attention.py:_fwd_flat_kernel).

Each case loops the dot R times inside one kernel (fori_loop, accumulator
dependency only) and reports achieved TF/s.  Run on the real chip.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ, BK, D = 512, 512, 64


def _loop_kernel(a_ref, b_ref, o_ref, *, dims, r, out_shape):
    a = a_ref[...]
    b = b_ref[...]

    def body(i, acc):
        # nudge `a` by the iteration index so XLA cannot hoist the dot out
        # of the loop (zero-multiply keeps the numerics identical)
        aa = a + (i * 0.0).astype(a.dtype)
        return acc + jax.lax.dot_general(
            aa, b, (dims, ((), ())), preferred_element_type=jnp.float32)

    acc = jnp.zeros(out_shape, jnp.float32)
    o_ref[...] = jax.lax.fori_loop(0, r, body, acc)


def bench_case(name, a_shape, b_shape, dims, out_shape, r=20000):
    a = jnp.ones(a_shape, jnp.bfloat16)
    b = jnp.ones(b_shape, jnp.bfloat16)
    kern = functools.partial(_loop_kernel, dims=dims, r=r,
                             out_shape=out_shape)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    f = jax.jit(call)
    # contraction size = the contracted dim of a
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
    print(f"{name:28s} {m:4d}x{kdim:3d} . {kdim:3d}x{n:4d}"
          f"  {best * 1e3:8.2f} ms  {tf:7.1f} TF/s", flush=True)
    return tf


def main():
    print(jax.devices(), flush=True)
    res = {}
    # current QK: q [bq,64] . k [bk,64]^T (NT, contraction 64)
    res["qk_nt_d64"] = bench_case(
        "qk NT d=64 (current)", (BQ, D), (BK, D), (((1,), (1,))), (BQ, BK))
    # calibration: same NT at contraction 128 (full MXU depth)
    res["qk_nt_d128"] = bench_case(
        "qk NT d=128 (calib)", (BQ, 2 * D), (BK, 2 * D), (((1,), (1,))),
        (BQ, BK))
    # current PV: p [bq,bk] . v [bk,65] (NN, N=65 -> half-width output)
    res["pv_nn_n65"] = bench_case(
        "pv NN n=65 (current)", (BQ, BK), (BK, D + 1), (((1,), (0,))),
        (BQ, D + 1))
    # calibration: NN with N=128 (full-width output)
    res["pv_nn_n128"] = bench_case(
        "pv NN n=128 (calib)", (BQ, BK), (BK, 2 * D), (((1,), (0,))),
        (BQ, 2 * D))
    # transposed PV: v [bk,65] . p_t [bk,bq] contracting dim0/dim0 (TN)
    res["pvt_tn"] = bench_case(
        "pv_t TN m=65 n=512", (BK, D + 1), (BK, BQ), (((0,), (0,))),
        (D + 1, BQ))
    # transposed PV, v pre-transposed (vt [65,bk] NN): is TN free or not?
    res["pvt_nn_pre_t"] = bench_case(
        "pv_t NN (vt cached)", (D + 1, BK), (BK, BQ), (((1,), (0,))),
        (D + 1, BQ))
    # transposed scores: st = k [bk,64] . q [bq,64]^T (NT) -- same as qk by
    # symmetry, listed for completeness of the transposed-kernel plan
    res["st_nt_d64"] = bench_case(
        "st NT d=64 (transposed)", (BK, D), (BQ, D), (((1,), (1,))),
        (BK, BQ))
    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
