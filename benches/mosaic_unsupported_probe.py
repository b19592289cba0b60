"""Runnable repros for the 'unavailable primitive' claims in
docs/SPEED_OF_LIGHT.md §3 — committed so the ceiling argument is
checkable, not asserted (round-4 verdict item 1b).

Claims probed on the real chip:
  1. wide multiply via int64 inside a Mosaic kernel
     (32x32 -> 64 would cut the 4x4-limb MAC to 2x2): compile error OR,
     if it lowers, its measured op rate vs the int32 baseline;
  2. 32x32 -> hi-32 multiply extracted from an int64 product in-kernel;
  3. XLA-level (outside Pallas) int64 elementwise multiply rate — XLA
     emulates 64-bit lanes with int32 pairs; if that emulation beat
     ~4x the int32 rate the limb MAC should use it instead;
  4. in-kernel batched dot_general (the MAC-offload shape) — expected
     Mosaic lowering failure (also probed by mac_probe.py).

Every attempt prints one JSON line: either a measured rate or the
compile/lowering error (the error IS the result).

Usage: python benches/mosaic_unsupported_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attempt(label, build, args, work=None, unit="gops", reps=5):
    try:
        fn = build()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    except Exception as e:
        print(json.dumps({"variant": label, "supported": False,
                          "error": repr(e)[:300]}), flush=True)
        return
    if work is None:
        print(json.dumps({"variant": label, "supported": True}), flush=True)
        return
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({"variant": label, "supported": True,
                      unit: round(work / best / 1e9, 1),
                      "ms": round(best * 1e3, 3)}), flush=True)


SHAPE = (64, 512)
ITERS = 4096
STREAMS = 4


def chain_kernel(mul_fn, dtype):
    """Mutual-recurrence chain (same structure as vpu_peak_probe)."""

    def kernel(x_ref, y_ref, o_ref):
        def body(i, state):
            out = []
            for (a, b) in state:
                a2 = mul_fn(a, b)
                b2 = b + a2
                out.append((a2, b2))
            return tuple(out)

        st0 = tuple(
            (x_ref[:] + dtype(s), y_ref[:] + dtype(s))
            for s in range(STREAMS)
        )
        st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(ITERS), body, st0)
        acc = st[0][0]
        for (a, b) in st:
            acc = acc + b
        o_ref[:] = acc

    return kernel


def main():
    rng = np.random.default_rng(0)
    print(json.dumps({"device": str(jax.devices()[0]),
                      "x64": bool(jax.config.jax_enable_x64)}), flush=True)
    elems = SHAPE[0] * SHAPE[1]
    ops = 2 * ITERS * STREAMS * elems

    x32 = jnp.asarray(rng.integers(1, 1 << 20, SHAPE).astype(np.int32))
    y32 = jnp.asarray(rng.integers(1, 1 << 10, SHAPE).astype(np.int32))
    x64 = x32.astype(jnp.int64)
    y64 = y32.astype(jnp.int64)

    # baseline: int32 multiply chain in-kernel
    def build_i32():
        k = chain_kernel(lambda a, b: a * b, jnp.int32)
        return jax.jit(lambda x, y: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
        )(x, y))

    attempt("mosaic_i32_mul_chain", build_i32, (x32, y32), work=ops)

    # 1. int64 multiply chain in-kernel
    def build_i64():
        k = chain_kernel(lambda a, b: a * b, jnp.int64)
        return jax.jit(lambda x, y: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int64),
        )(x, y))

    attempt("mosaic_i64_mul_chain", build_i64, (x64, y64), work=ops)

    # 2. 32x32 -> hi-32 inside the kernel (widen, multiply, shift, narrow)
    def build_mulhi():
        def mul_hi(a, b):
            p = a.astype(jnp.int64) * b.astype(jnp.int64)
            return (p >> 32).astype(jnp.int32)

        k = chain_kernel(mul_hi, jnp.int32)
        return jax.jit(lambda x, y: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
        )(x, y))

    attempt("mosaic_mulhi_via_i64", build_mulhi, (x32, y32), work=ops)

    # 3. XLA-level int64 multiply chain (outside Pallas)
    def build_xla64():
        def call(x, y):
            def body(i, state):
                out = []
                for (a, b) in state:
                    a2 = a * b
                    b2 = b + a2
                    out.append((a2, b2))
                return tuple(out)

            st0 = tuple((x + jnp.int64(s), y + jnp.int64(s))
                        for s in range(STREAMS))
            st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(ITERS), body, st0)
            acc = st[0][0]
            for (a, b) in st:
                acc = acc + b
            return acc

        return jax.jit(call)

    attempt("xla_i64_mul_chain", build_xla64, (x64, y64), work=ops)

    # 4. in-kernel batched int8 dot at the MAC-offload shape
    def build_bdot():
        g, m, kk, nn = 2048, 48, 12, 128

        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )

        a = jnp.asarray(rng.integers(-64, 64, (g, m, kk), dtype=np.int8))
        b = jnp.asarray(rng.integers(-64, 64, (g, kk, nn), dtype=np.int8))
        fn = jax.jit(lambda a, b: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((g, m, nn), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(a, b))
        return lambda: fn(a, b)

    attempt("mosaic_batched_i8_dot", build_bdot, (), work=None)


if __name__ == "__main__":
    main()
