"""Fused L2 (paired, dual-limb) blind rotation vs the XLA path, on device.

Usage: python benches/fused_l2.py [--batch 128] [--steps 335] [--reps 3]
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
    ap.add_argument("--steps", type=int, default=335)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--single-dot", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.core.context import OmrContext
    from tfhe_omr_tpu.ops.bootstrap import (
        make_blind_rotate,
        make_fused_blind_rotate2,
    )
    from tfhe_omr_tpu.ops.pallas_fused import make_bsk2_balanced

    params = OmrParameters.default()
    ctx = OmrContext(params)
    f, ntt, g = ctx.f2, ctx.ntt2, ctx.gadget_br2
    n, d = params.n2, g.d
    B, steps = args.batch, args.steps
    n_lwe = 2 * steps
    rng = np.random.default_rng(0)

    acc0 = jnp.asarray(rng.integers(0, f.q, size=(n, 2, B), dtype=np.int64))
    amounts = jnp.asarray(
        rng.integers(0, 2 * n, size=(n_lwe, B), dtype=np.int64)
    )
    bsk_np = rng.integers(
        0, f.q, size=(3 * steps, n, d, 2, 2), dtype=np.int64
    )
    bsk = jnp.asarray(bsk_np)
    bsk_sh = jnp.asarray(f.shoup(bsk_np))
    bsk_bal = jnp.asarray(make_bsk2_balanced(bsk_np, f.q))

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
                    "us_per_step": round(1e6 * best / steps, 1),
                    "ms_per_message": round(1e3 * best / B, 3),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )
        return np.asarray(out), best

    br_fused = jax.jit(make_fused_blind_rotate2(f, ntt, g, single_dot=args.single_dot))
    out_f, t_f = bench(lambda: br_fused(acc0, amounts, bsk_bal), "fused")

    if not args.skip_xla:
        br_ref = jax.jit(make_blind_rotate(f, ntt, g, paired=True))
        out_r, t_r = bench(lambda: br_ref(acc0, amounts, bsk, bsk_sh), "xla")
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
