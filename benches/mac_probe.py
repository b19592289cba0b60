"""Probe the MXU/VPU options for offloading the L2 MAC (round 4).

The L2 blind-rotation MAC is the single largest consumer in the pipeline
(~1.8 of 4.2 ms/msg) and sits at its exact int32 VPU op-count floor
(docs/PERF_NOTES.md round-2 audit). Its structure is a per-ring-index (n)
contraction over 12 digit columns — i.e. a BATCHED matmul with batch = n,
M = (plane, row, output) and K = digit columns, which only beats the VPU if
some unit runs it faster than 0.77 T int32 op/s. This probe measures the
candidates on the real chip:

  1. in-kernel (Mosaic) dot_general WITH batch dims, int8, at the
     block-diag-grouped shapes the restructured MAC would use;
  2. the same shapes as XLA-level batched dots outside Pallas;
  3. f32 FMA chain rate on the VPU (if fused mul-add retires 1/cycle the
     float path could halve mul+add pairs — only exact for <=12-bit limbs);
  4. int8 2D dots at batched-equivalent block-diag shapes (loop-free
     lower bound for the grouped formulation).

Usage: python benches/mac_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, args, label, work, unit="gmac", reps=5):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        # force real completion on the tunneled backend
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    except Exception as e:  # lowering/compile failure is a RESULT here
        print(json.dumps({"variant": label, "error": repr(e)[:200]}),
              flush=True)
        return
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "variant": label,
                unit + "/s": round(work / best / 1e9, 1),
                "ms": round(best * 1e3, 3),
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------- 1: Mosaic
def kernel_batched_dot(g, m, k, n, rounds):
    """In-kernel batched dot: (g, m, k) @ (g, k, n), int8 -> int32."""

    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            p = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            return acc + p

        o_ref[:] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(rounds), body,
            jnp.zeros((g, m, n), jnp.int32),
        )

    def call(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g, m, n), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(a, b)

    return jax.jit(call)


# ------------------------------------------------------------------ 2: XLA
def xla_batched_dot(rounds):
    def call(a, b):
        def body(i, acc):
            p = jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            return acc + p

        g, m, _ = a.shape
        n = b.shape[2]
        return jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(rounds), body,
            jnp.zeros((g, m, n), jnp.int32),
        )

    return jax.jit(call)


# ------------------------------------------------------------- 3: f32 FMA
def f32_fma_probe(shape, iters, streams):
    def kernel(x_ref, y_ref, o_ref):
        def body(i, state):
            out = []
            for (a, b) in state:
                a2 = a * b + jnp.float32(1.5)   # fma
                b2 = b * a2 + jnp.float32(0.5)  # fma
                out.append((a2, b2))
            return tuple(out)

        st0 = tuple(
            (x_ref[:] + jnp.float32(s), y_ref[:] * jnp.float32(1 + 0.01 * s))
            for s in range(streams)
        )
        st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(iters), body, st0)
        acc = st[0][0]
        for (a, b) in st:
            acc = acc + b
        o_ref[:] = acc

    def call(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, y)

    # 2 FMAs = 4 flop-equivalents per elem per iter per stream; report FMA ops
    return jax.jit(call), 2 * iters * streams


# ----------------------------------------------------------- 4: 2D blockdiag
def kernel_dot2d(m, k, n, rounds):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            p = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc + p

        o_ref[:] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(rounds), body,
            jnp.zeros((m, n), jnp.int32),
        )

    def call(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(a, b)

    return jax.jit(call)


def main():
    rng = np.random.default_rng(0)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    # --- f32 FMA vs int32 baseline (VPU)
    shape = (256, 1024)
    xf = jnp.asarray(rng.uniform(0.5, 1.0, size=shape).astype(np.float32))
    yf = jnp.asarray(rng.uniform(0.9, 1.1, size=shape).astype(np.float32))
    for streams in (1, 4):
        fn, fmas = f32_fma_probe(shape, 8192, streams)
        bench(fn, (xf, yf), f"f32_fma_s{streams}",
              shape[0] * shape[1] * fmas, unit="gfma")

    # --- batched int8 dots: the MAC-offload candidate shapes
    # (a) raw per-n: batch 2048, M=48 (plane,row,out), K=12 (digit cols)
    # (b) block-diag g=8: batch 256, M=384, K=96
    # (c) block-diag g=16: batch 128, M=768, K=192
    shapes = [
        (2048, 48, 12, 128, 512),
        (256, 384, 96, 128, 512),
        (128, 768, 192, 128, 512),
    ]
    for (g, m, k, n, rounds) in shapes:
        a = jnp.asarray(rng.integers(-64, 64, size=(g, m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-64, 64, size=(g, k, n), dtype=np.int8))
        work = 1e0 * g * m * k * n * rounds
        bench(kernel_batched_dot(g, m, k, n, rounds), (a, b),
              f"mosaic_bdot_{g}x{m}x{k}x{n}", work)
        bench(xla_batched_dot(rounds), (a, b),
              f"xla_bdot_{g}x{m}x{k}x{n}", work)

    # --- 2D dots at the same block-diag sizes (no batch dim: upper bound)
    for (m, k, n, rounds) in ((384, 96, 128, 32768), (768, 192, 128, 16384),
                              (384, 768, 128, 8192)):
        a = jnp.asarray(rng.integers(-64, 64, size=(m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-64, 64, size=(k, n), dtype=np.int8))
        bench(kernel_dot2d(m, k, n, rounds), (a, b),
              f"mosaic_dot2d_{m}x{k}x{n}", 1e0 * m * k * n * rounds)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
