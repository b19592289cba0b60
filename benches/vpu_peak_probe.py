"""Find the TRUE sustained VPU int32 ALU rate — the spec reconciliation
demanded by the round-4 verdict.

The round-4 `vpu_probe.py` measured 0.75-0.78 T int32 op/s at shape
(256, 1024): 256 vregs per operand array, so with 2 arrays per stream the
working set spills far past the vector register file and every op is a
VMEM load-op-store round trip — that probe measures VMEM-streaming
throughput, not the ALU issue rate. Here the recurrence state is
REGISTER-RESIDENT (shape sweep from 1 vreg = (8, 128) upward) and the
stream count sweeps ILP, so the peak over the sweep is the part's real
sustained ALU rate. A MAC-shaped variant (acc += v * k, 2 ops with only
the accumulator loop-carried) models the L2 kernel's inner loop.

v5e spec context: 8x128 lanes x 4 ALUs x ~1.5 GHz would be ~6.1 T simple
int32 op/s if every ALU issues one op per cycle; 1 op/lane/cycle would be
~1.54 T. Where the measured peak lands between these decides whether the
4.10 ms/msg floor of docs/SPEED_OF_LIGHT.md has headroom.

Usage: python benches/vpu_peak_probe.py [--quick]
Prints one JSON line per point and a summary max.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_chain_probe(op: str, shape, iters: int, streams: int):
    """Mutual-recurrence chains (same structure as vpu_probe.py) but with
    a register-resident working set."""

    def fa(a, b):
        if op == "mul":
            return a * b
        if op == "add":
            return a + b
        raise ValueError(op)

    def kernel(x_ref, y_ref, o_ref):
        def body(i, state):
            out = []
            for (a, b) in state:
                a2 = fa(a, b)
                b2 = b + a2
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


def make_mac_probe(shape, iters: int, streams: int):
    """acc_s += v_s * k_s: the L2 MAC's data-flow shape — only the
    accumulator is loop-carried; multiplicand/multiplier are loop-invariant
    registers. 2 ops per stream per iter."""

    def kernel(x_ref, y_ref, o_ref):
        vs = tuple(x_ref[:] + jnp.int32(s) for s in range(streams))
        ks = tuple(y_ref[:] - jnp.int32(s) for s in range(streams))

        def body(i, accs):
            # i-dependent twiddle of one operand per iter prevents
            # strength reduction of the whole loop to acc += iters*v*k
            return tuple(
                acc + (v + i) * k for acc, v, k in zip(accs, vs, ks)
            )

        accs = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(iters), body,
            tuple(jnp.zeros(shape, jnp.int32) for _ in range(streams)),
        )
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:] = acc

    def call(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, y)

    # count add + mul only (the +i twiddle is 1 extra add per iter: 3 ops;
    # report both raw-2 and honest-3 rates)
    return jax.jit(call), 3 * iters * streams


def bench(fn, args, total_ops, label, reps=5, inner=4):
    """Times `inner` back-to-back dispatches and pins TRUE completion with
    a tiny device->host fetch (the tunneled backend acks block_until_ready
    early — docs/PERF_NOTES.md); per-call overhead (~30 ms) is reported
    separately via an empty-work calibration the caller does once."""
    out = fn(*args)
    np.asarray(out.ravel()[:8])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(out.ravel()[:8])
        times.append((time.perf_counter() - t0) / inner)
    best = min(times)
    gops = total_ops / best / 1e9
    print(json.dumps({"variant": label, "gops": round(gops, 1),
                      "ms": round(best * 1e3, 3)}), flush=True)
    return gops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--target-ops", type=float, default=4e10,
                    help="per-dispatch op count; at ~1 T op/s this is "
                         "~40 ms of compute, x8 inner dispatches >> the "
                         "~30 ms tunneled dispatch overhead")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    results = {}
    shapes = [(8, 512), (64, 512), (256, 1024)]
    streams_l = [1, 4, 16]
    if args.quick:
        shapes = [(64, 512), (256, 1024)]
        streams_l = [4, 16]

    for shape in shapes:
        elems = shape[0] * shape[1]
        x = jnp.asarray(rng.integers(1, 1 << 20, size=shape, dtype=np.int32))
        y = jnp.asarray(rng.integers(1, 1 << 10, size=shape, dtype=np.int32))
        for streams in streams_l:
            # keep per-call work near target_ops so dispatch overhead
            # (~30 ms tunneled) stays <5%
            iters = max(256, int(args.target_ops / (2 * streams * elems)))
            for op in ("mul", "add"):
                fn, ope = make_chain_probe(op, shape, iters, streams)
                g = bench(fn, (x, y), elems * ope,
                          f"chain_{op}_{shape[0]}x{shape[1]}_s{streams}")
                results[f"chain_{op}_{shape}_{streams}"] = g
            fn, ope = make_mac_probe(shape, iters, streams)
            g = bench(fn, (x, y), elems * ope,
                      f"mac_{shape[0]}x{shape[1]}_s{streams}")
            results[f"mac_{shape}_{streams}"] = g

    peak = max(results.values())
    print(json.dumps({"peak_gops": round(peak, 1),
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
