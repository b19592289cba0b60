"""Phase ablation of the fused L2 kernel: time with each phase skipped."""

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
        FusedBlindRotateL2,
        make_bsk2_balanced,
    )

    params = OmrParameters.default()
    ctx = OmrContext(params)
    f, ntt, g = ctx.f2, ctx.ntt2, ctx.gadget_br2
    n, d = params.n2, g.d
    B = int(os.environ.get("AB_BATCH", "128"))
    steps = int(os.environ.get("AB_STEPS", "335"))
    tile = int(os.environ.get("AB_TILE", "128"))
    rng = np.random.default_rng(0)
    two_n = 2 * n
    m25 = jnp.int64((1 << 25) - 1)

    acc0 = jnp.asarray(rng.integers(0, f.q, size=(n, 2, B), dtype=np.int64))
    amounts = jnp.asarray(
        rng.integers(0, two_n, size=(3 * steps, B), dtype=np.int64)
    )
    bsk_np = rng.integers(0, f.q, size=(3 * steps, n, d, 2, 2), dtype=np.int64)
    bsk_bal = jnp.asarray(make_bsk2_balanced(bsk_np, f.q))
    build_tables, _ = make_mono_powers(f, ntt)
    p1, p2 = jax.jit(build_tables)(amounts)

    def to_limbs6(p):
        n_e, rows, b = p.shape
        pt = p.transpose(1, 0, 2).reshape(rows // 3, 3, n_e, b)
        lo = (pt & m25).astype(jnp.int32)
        hi = (pt >> 25).astype(jnp.int32)
        return jnp.stack([lo, hi], axis=2).reshape(rows // 3, 6, n_e, b)

    p1l = jax.jit(to_limbs6)(p1)
    p2l = jax.jit(to_limbs6)(p2)
    acc = acc0.transpose(1, 0, 2)
    acc_l = jnp.stack(
        [(acc & m25).astype(jnp.int32), (acc >> 25).astype(jnp.int32)]
    )
    jax.block_until_ready((p1l, p2l, acc_l))

    variants = os.environ.get(
        "AB_VARIANTS", "none,dec,fwd,mono,mac,intt"
    ).split(",")
    for v in variants:
        skip = frozenset() if v == "none" else frozenset(v.split("+"))
        fused = FusedBlindRotateL2(f, ntt, g.d, g.log_b, tile=tile, skip=skip)
        # pass the big tensors as ARGUMENTS: closed-over constants ship
        # with the remote-compile request and blow its body limit
        fn = jax.jit(lambda a, q1, q2, k: fused(a, q1, q2, k))
        t0 = time.perf_counter()
        out = fn(acc_l, p1l, p2l, bsk_bal)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(acc_l, p1l, p2l, bsk_bal)
            jax.block_until_ready(out)
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
