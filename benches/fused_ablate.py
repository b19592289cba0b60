"""Phase ablation of the fused L1 kernel: time with each phase skipped."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.core.context import OmrContext
    from tfhe_omr_tpu.ops.bootstrap import make_mono_powers
    from tfhe_omr_tpu.ops.pallas_fused import (
        FusedBlindRotateL1,
        make_bsk_balanced,
        make_bsk_balanced_paired,
    )

    params = OmrParameters.default()
    ctx = OmrContext(params)
    f, ntt, g = ctx.f1, ctx.ntt1, ctx.gadget_br1
    n, d = params.n1, g.d
    B = int(os.environ.get("AB_BATCH", "896"))
    steps = int(os.environ.get("AB_STEPS", "512"))
    tile = int(os.environ.get("AB_TILE", "128"))
    paired = os.environ.get("AB_PAIRED", "1") == "1"
    single_dot = os.environ.get("AB_SINGLEDOT", "1") == "1"
    rows = 3 if paired else 1
    rng = np.random.default_rng(0)

    acc0 = jnp.asarray(
        rng.integers(0, f.q, size=(n, 2, B), dtype=np.int64).astype(np.int32)
    )
    amounts = jnp.asarray(
        rng.integers(0, 2 * n, size=(rows * steps, B), dtype=np.int64)
    )
    bsk_np = rng.integers(
        0, f.q, size=(rows * steps, n, d, 2, 2), dtype=np.int64
    )
    bsk_bal = jnp.asarray(
        make_bsk_balanced_paired(bsk_np, f.q)
        if paired
        else make_bsk_balanced(bsk_np, f.q)
    )
    from tfhe_omr_tpu.ops.bootstrap import make_x_power

    build_x = make_x_power(f, ntt)
    x = jax.jit(build_x)(amounts).astype(jnp.int32)
    xpow = x.reshape(steps, 3, B) if paired else x
    jax.block_until_ready(xpow)

    variants = os.environ.get(
        "AB_VARIANTS", "none,dec,fwd,mono,mac,intt"
    ).split(",")
    for v in variants:
        skip = frozenset() if v == "none" else frozenset(v.split("+"))
        fused = FusedBlindRotateL1(
            f, ntt, g.d, g.log_b, tile=tile, skip=skip, rows=rows,
            single_dot=single_dot,
        )
        fn = jax.jit(lambda a, xp, k: fused(a, xp, k))
        # the tunneled backend can ack block_until_ready before the device
        # has run the program — a tiny device->host fetch pins completion
        fetch = lambda o: np.asarray(o.ravel()[:8])
        t0 = time.perf_counter()
        out = fn(acc0, xpow, bsk_bal)
        jax.block_until_ready(out)
        fetch(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(acc0, xpow, bsk_bal)
            fetch(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            json.dumps(
                {
                    "skip": v,
                    "pass_ms": round(1e3 * best, 2),
                    "us_per_step": round(1e6 * best / steps, 1),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
