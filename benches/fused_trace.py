"""Fused trace kernel vs the XLA path, on the live device.

Synthetic trace key (uniform field elements), real shapes. Checks exact
equality of the two paths and reports per-pass times.

Usage: python benches/fused_trace.py [--batch 128] [--reps 3] [--skip-xla]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.core.context import OmrContext
    from tfhe_omr_tpu.ops.bootstrap import make_fused_trace, make_trace
    from tfhe_omr_tpu.ops.pallas_fused import (
        make_auto_compact,
        make_trace_balanced,
    )

    params = OmrParameters.default()
    ctx = OmrContext(params)
    f, ntt, g = ctx.f2, ctx.ntt2, ctx.gadget_trace
    n, d = params.n2, g.d
    B = args.batch
    rng = np.random.default_rng(0)
    rounds = len(ctx.trace_autos)

    acc = jnp.asarray(rng.integers(0, f.q, size=(n, 2, B), dtype=np.int64))
    tk_np = rng.integers(0, f.q, size=(rounds, n, d, 2), dtype=np.int64)
    tk = jnp.asarray(tk_np)
    tk_sh = jnp.asarray(f.shoup(tk_np))
    oh = jnp.asarray(make_auto_compact(ctx.trace_autos, n))
    tk_bal = jnp.asarray(make_trace_balanced(tk_np, f.q))

    def bench(fn, label):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        # the tunneled backend can ack block_until_ready before the device
        # has actually run the program; fetching a tiny slice forces real
        # completion (costs one small RTT, measured separately below)
        fetch = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:8])
        fetch(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            fetch(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            json.dumps(
                {
                    "path": label,
                    "pass_ms": round(1e3 * best, 2),
                    "ms_per_message": round(1e3 * best / B, 3),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )
        return np.asarray(out), best

    tr_fused = jax.jit(make_fused_trace(f, ntt, g))
    out_f, t_f = bench(lambda: tr_fused(acc, oh, tk_bal), "fused")

    if not args.skip_xla:
        tr_ref = jax.jit(make_trace(f, ntt, g, ctx.trace_autos))
        out_r, t_r = bench(lambda: tr_ref(acc, tk, tk_sh), "xla")
        print(
            json.dumps(
                {
                    "exact_match": bool(np.array_equal(out_f, out_r)),
                    "speedup": round(t_r / t_f, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
