"""int8 MXU rate probe at flash-kernel tile shapes.

Question this answers (data for the quantized-QK decision, VERDICT r5
perf item): v5e lists 394 TOPS int8 vs 197 TF/s bf16 — but if the 2x
comes from doubled systolic contraction DEPTH (256 vs 128), a d=64
contraction (the flash QK^T, already at half the bf16 depth) may gain
NOTHING from int8.  Measure, don't guess.

Cases (all at the flash tile geometry bq=bk=1536, d=64):
  - bf16 NT d=64   (current QK)            ~98 TF/s ceiling expected
  - int8 NT d=64   (quantized QK)          2x only if rate, not depth
  - bf16 NT d=128  (calibration full depth)
  - int8 NT d=128
  - int8 NN pv     (quantized PV, full width)

Run on the real chip: `python tools/int8_mxu_bench.py`.
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
        # nudge `a` by the iteration index so XLA cannot hoist the dot out
        # of the loop (zero add keeps numerics identical; int-safe)
        aa = a + (i * 0).astype(a.dtype)
        return acc + jax.lax.dot_general(
            aa, b, (dims, ((), ())), preferred_element_type=acc_dtype)

    acc = jnp.zeros(out_shape, acc_dtype)
    o_ref[...] = jax.lax.fori_loop(0, r, body, acc)


def bench_case(name, a_shape, b_shape, dims, out_shape, dtype, r=2000):
    acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    a = jnp.ones(a_shape, dtype)
    b = jnp.ones(b_shape, dtype)
    kern = functools.partial(_loop_kernel, dims=dims, r=r,
                             out_shape=out_shape, acc_dtype=acc_dtype)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, acc_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )
    f = jax.jit(call)
    kdim = a_shape[dims[0][0]]
    m = a_shape[1 - dims[0][0]]
    n = b_shape[1 - dims[1][0]]
    flops = 2.0 * m * n * kdim * r
    try:
        out = f(a, b)
        _ = float(out[0, 0])                   # compile+sync (relay-safe)
    except Exception as e:  # noqa: BLE001 — probe must report, not crash
        print(f"{name:28s} UNSUPPORTED: {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return None
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = f(a, b)
        _ = float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    tf = flops / best / 1e12
    print(f"{name:28s} {m:5d}x{kdim:3d} . {kdim:3d}x{n:5d}"
          f"  {best * 1e3:8.2f} ms  {tf:7.1f} T{'OP' if dtype == jnp.int8 else 'F'}/s",
          flush=True)
    return tf


def main():
    print(jax.devices(), flush=True)
    res = {}
    nt = ((1,), (1,))
    nn = ((1,), (0,))
    res["qk_bf16_d64"] = bench_case(
        "qk NT bf16 d=64 (current)", (BK, D), (BQ, D), nt, (BK, BQ),
        jnp.bfloat16)
    res["qk_int8_d64"] = bench_case(
        "qk NT int8 d=64", (BK, D), (BQ, D), nt, (BK, BQ), jnp.int8)
    res["qk_bf16_d128"] = bench_case(
        "qk NT bf16 d=128 (calib)", (BK, 2 * D), (BQ, 2 * D), nt, (BK, BQ),
        jnp.bfloat16)
    res["qk_int8_d128"] = bench_case(
        "qk NT int8 d=128", (BK, 2 * D), (BQ, 2 * D), nt, (BK, BQ),
        jnp.int8)
    res["qk_int8_d256"] = bench_case(
        "qk NT int8 d=256", (BK, 4 * D), (BQ, 4 * D), nt, (BK, BQ),
        jnp.int8)
    # transposed-PV orientation, int8 p_t (vt cached [d, bk] @ p_t [bk, bq])
    res["pvt_int8"] = bench_case(
        "pv_t NN int8 (vt cached)", (D + 1, BK), (BK, BQ), nn,
        (D + 1, BQ), jnp.int8)
    res["pvt_bf16"] = bench_case(
        "pv_t NN bf16 (vt cached)", (D + 1, BK), (BK, BQ), nn,
        (D + 1, BQ), jnp.bfloat16)
    print(json.dumps({k: v for k, v in res.items() if v is not None}))


if __name__ == "__main__":
    sys.exit(main())
