"""Isolate the L1/L2 CMUX-step stage costs on the live device.

Times, per CMUX step at the real hot-loop shapes: gadget decomposition,
forward NTT, the RGSW MAC, the monomial multiply, and the inverse NTT —
each wrapped in a 64-iteration fori_loop so per-dispatch overhead is
amortised the same way the real blind-rotation loop amortises it.

Usage: python benches/probe_step.py [--batch 896] [--level 1|2] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, reps=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


LOOP = int(os.environ.get("PROBE_LOOP", "16"))


def looped(fn, x, *consts):
    import jax

    @jax.jit
    def run(x, *consts):
        def body(i, v):
            return fn(v, *consts)

        return jax.lax.fori_loop(0, LOOP, body, x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=896)
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.core.context import OmrContext

    params = OmrParameters.default()
    ctx = OmrContext(params)
    rng = np.random.default_rng(0)
    B = args.batch
    results = {"batch": B, "level": args.level}

    if args.level == 1:
        field, ntt, gadget = ctx.f1, ctx.ntt1, ctx.gadget_br1
        n = params.n1
        rows = 1
    else:
        field, ntt, gadget = ctx.f2, ctx.ntt2, ctx.gadget_br2
        n = params.n2
        rows = 3

    d = gadget.d
    sd = field.storage_dtype
    np_dt = np.int32 if sd == jnp.int32 else np.int64

    acc = jnp.asarray(rng.integers(0, field.q, size=(n, 2, B), dtype=np.int64).astype(np_dt))
    k_i = jnp.asarray(rng.integers(0, field.q, size=(rows, n, d, 2, 2), dtype=np.int64).astype(np_dt))
    k_sh = jnp.asarray(
        field.shoup(np.asarray(k_i).astype(np.int64)).astype(np_dt)
    )
    dn0 = jnp.asarray(rng.integers(0, field.q, size=(n, d, 2, B), dtype=np.int64).astype(np_dt))
    mono0 = jnp.asarray(rng.integers(0, field.q, size=(rows, n, B), dtype=np.int64).astype(np_dt))

    # ---- decompose (digits folded back via a mod-sum to keep the loop
    # shape-stable; the fold is small next to the decomposition itself)
    @jax.jit
    def dec_run(a):
        def body(i, v):
            digs = gadget.decompose_to_field(v, axis=1)  # (n, d, 2, B)
            return field.mod_sum(digs, axis=1)
        return jax.lax.fori_loop(0, LOOP, body, a)

    t = bench(lambda: dec_run(acc), args.reps)
    results["decompose_us_per_step"] = 1e6 * t / LOOP

    # ---- forward NTT at hot shape (n, d*2*B cols)
    x_f = dn0.reshape(n, d * 2 * B)

    @jax.jit
    def ntt_run(x):
        def body(i, v):
            return ntt.fwd(v)
        return jax.lax.fori_loop(0, LOOP, body, x)

    t = bench(lambda: ntt_run(x_f), args.reps)
    results["fwd_ntt_us_per_step"] = 1e6 * t / LOOP

    # ---- inverse NTT at hot shape (n, 2*B)
    x_i = acc.reshape(n, 2 * B)
    @jax.jit
    def intt_run(x):
        def body(i, v):
            return ntt.inv(v)
        return jax.lax.fori_loop(0, LOOP, body, x)

    t = bench(lambda: intt_run(x_i), args.reps)
    results["inv_ntt_us_per_step"] = 1e6 * t / LOOP

    # ---- MAC: P[t,n,o,b] = sum_{j,c} dn[n,j,c,b]*K[t,n,j,c,o]
    @jax.jit
    def mac_run(dn):
        def body(i, v):
            prod = field.mul_shoup(
                v[None, :, :, :, None, :], k_i[..., None], k_sh[..., None]
            )
            p = field.reduce(
                field._up(prod).sum(axis=(2, 3)),
                field.bits + (2 * d).bit_length() + 1,
            )  # (rows, n, 2, B)
            # fold back into dn's shape to keep the loop shape-stable
            upd = p[0][:, None, :, :]  # (n,1,2,B)
            return field.add(v, jnp.broadcast_to(upd, v.shape).astype(sd))
        return jax.lax.fori_loop(0, LOOP, body, dn)

    t = bench(lambda: mac_run(dn0), args.reps)
    results["mac_us_per_step"] = 1e6 * t / LOOP

    # ---- mono multiply p * mono
    p0 = jnp.asarray(rng.integers(0, field.q, size=(rows, n, 2, B), dtype=np.int64).astype(np_dt))

    @jax.jit
    def mono_run(p):
        def body(i, v):
            v = field.mul(v, mono0[:, :, None, :])
            if rows == 3:
                v = jnp.broadcast_to(field.mod_sum(v, axis=0)[None], v.shape).astype(sd)
            return v
        return jax.lax.fori_loop(0, LOOP, body, p)

    t = bench(lambda: mono_run(p0), args.reps)
    results["mono_mul_us_per_step"] = 1e6 * t / LOOP

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
