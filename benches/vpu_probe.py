"""VPU / MXU op-rate probe for the fused-kernel cost model.

Measures sustained elementwise int32 throughput (mul / add / shift / mixed,
with independent streams to expose ILP and co-issue) and int8 MXU dot rates
at the blind-rotation kernel's shapes. PERF_NOTES.md round-1 fitted a model
of ~1 int32 op/lane/cycle counting mul and add equally; round-2 restructures
(Karatsuba limb products, add-heavy Horner, MXU MAC offload) hinge on the
REAL relative rates, so measure them.

Usage: python benches/vpu_probe.py [--size 256] [--rounds 64] [--unroll 16]
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


def make_probe(op: str, shape, rounds: int, unroll: int, streams: int = 4):
    """Kernel: `streams` independent op chains, `rounds*unroll` deep each."""

    def kernel(x_ref, y_ref, o_ref):
        ys = y_ref[:]

        def body(i, xs):
            del i
            out = []
            for s, xv in enumerate(xs):
                v = xv
                for u in range(unroll):
                    if op == "mul":
                        v = v * ys
                    elif op == "add":
                        v = v + ys
                    elif op == "sub":
                        v = v - ys
                    elif op == "shift":
                        v = v >> 1
                    elif op == "mask":
                        v = v & ys
                    elif op == "mulladd":  # alternating mul / add
                        v = v * ys if u % 2 == 0 else v + ys
                    elif op == "muladd2":  # v*y + y (mul feeding add)
                        v = v * ys + ys
                    elif op == "select":
                        v = jnp.where(v > ys, v - ys, v)
                    else:
                        raise ValueError(op)
                out.append(v)
            return tuple(out)

        xs0 = tuple(x_ref[:] + jnp.int32(s) for s in range(streams))
        xs = jax.lax.fori_loop(jnp.int32(0), jnp.int32(rounds), body, xs0)
        acc = xs[0]
        for v in xs[1:]:
            acc = acc + v
        o_ref[:] = acc

    def call(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )(x, y)

    ops_per_elem = rounds * unroll * streams
    if op == "muladd2":
        ops_per_elem *= 2
    return jax.jit(call), ops_per_elem


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
        o_ref[:] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(rounds), body, acc0)

    def call(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
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
    ap.add_argument("--size", type=int, default=512)  # rows of (size, 1024)
    ap.add_argument("--rounds", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=16)
    args = ap.parse_args()

    shape = (args.size, 1024)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 1 << 20, size=shape, dtype=np.int32))
    y = jnp.asarray(rng.integers(1, 1 << 10, size=shape, dtype=np.int32))
    elems = shape[0] * shape[1]

    for op in ("add", "mul", "sub", "shift", "mask", "mulladd", "muladd2",
               "select"):
        for streams in (1, 4):
            fn, ope = make_probe(op, shape, args.rounds, args.unroll, streams)
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
