"""VPU / MXU op-rate probe for the fused-kernel cost model.

Measures sustained elementwise int32 throughput (mul / add / shift / mixed)
and int8 MXU dot rates at the blind-rotation kernel's shapes. Chains are
mutual recurrences (a = op(a,b); b = op2(b,a)) so the compiler cannot
strength-reduce or fold them; `streams` independent chains expose ILP.

PERF_NOTES.md round-1 fitted ~1 int32 op/lane/cycle counting mul and add
equally; round-2 restructures (Karatsuba limb products, add-heavy Horner,
MXU MAC offload) hinge on the REAL relative rates.

Usage: python benches/vpu_probe.py
Prints one JSON line per variant: {"variant": ..., "gops": ...}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (name, op_a, op_b): the two halves of the mutual recurrence; each is one
# VPU op, so ops/elem/iter = 2.
VARIANTS = {
    "add": (lambda a, b: a + b, lambda b, a: b + a),
    "mul": (lambda a, b: a * b, lambda b, a: b * a),
    "mul_add": (lambda a, b: a * b, lambda b, a: b + a),
    "sub_add": (lambda a, b: a - b, lambda b, a: b + a),
    "shift_add": (lambda a, b: (a >> 1), lambda b, a: b + a),
    "mask_add": (lambda a, b: (a & b), lambda b, a: b + a),
    "sel_add": (
        lambda a, b: jnp.where(a > b, a - b, a),
        lambda b, a: b + a,
    ),
}


def make_probe(op: str, shape, iters: int, streams: int):
    fa, fb = VARIANTS[op]

    def kernel(x_ref, y_ref, o_ref):
        def body(i, state):
            out = []
            for (a, b) in state:
                a2 = fa(a, b)
                b2 = fb(b, a2)
                out.append((a2, b2))
            return tuple(out)

        st0 = tuple(
            (x_ref[:] + jnp.int32(s), y_ref[:] + jnp.int32(s))
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
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, y)

    return jax.jit(call), 2 * iters * streams


def make_dot_probe(m: int, k: int, n: int, rounds: int):
    """int8 MXU dot rate at (m,k)@(k,n), `rounds` sequential dots."""

    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            p = jax.lax.dot_general(
                a_ref[:],
                b_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc + p

        acc0 = jnp.zeros((m, n), jnp.int32)
        o_ref[:] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(rounds), body, acc0
        )

    def call(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(a, b)

    return jax.jit(call)


def bench(fn, args, total_ops, label, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "variant": label,
                "gops": round(total_ops / best / 1e9, 1),
                "ms": round(best * 1e3, 3),
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)  # rows of (size, 1024)
    ap.add_argument("--iters", type=int, default=512)
    args = ap.parse_args()

    shape = (args.size, 1024)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 1 << 20, size=shape, dtype=np.int32))
    y = jnp.asarray(rng.integers(1, 1 << 10, size=shape, dtype=np.int32))
    elems = shape[0] * shape[1]

    for op in VARIANTS:
        for streams in (1, 4):
            fn, ope = make_probe(op, shape, args.iters, streams)
            bench(fn, (x, y), elems * ope, f"i32_{op}_s{streams}")

    # MXU: the L2 kernel's NTT dot shape (contraction 2048, int8) and the
    # candidate MAC-offload shape (contraction 12)
    for (m, k, n, r) in ((2048, 2048, 256, 8), (128, 12, 256, 64),
                         (128, 128, 256, 64)):
        a = jnp.asarray(rng.integers(-64, 64, size=(m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-64, 64, size=(k, n), dtype=np.int8))
        fn = make_dot_probe(m, k, n, r)
        bench(fn, (a, b), 2 * m * k * n * r, f"i8dot_{m}x{k}x{n}")


if __name__ == "__main__":
    main()
