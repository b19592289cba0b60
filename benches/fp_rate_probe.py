"""Measure the protocol false-positive rate at 10^7..10^8-message scale.

The detector flags a message iff ALL clue_count of its clues decrypt to 0
under the recipient key (LUT1 accept value, reference
``detector.rs:457-503``); the INDEPENDENCE model puts the rate at
t^-clue_count = 8^-7 ~= 4.768e-7 per message. This probe runs the REAL
clue generator (``tfhe_omr_tpu.core.sender.clue_chunk_body`` — the exact
program the pipeline's device clue path executes) under a wrong key,
extracts + decrypts all clue_count LWE samples per message ON DEVICE
(extraction folded into one signed matrix W so decrypt is one int8-plane
MXU dot), applies the LUT1 accept criterion, and counts:

* per-clue accept fraction      (expect 1/t = 0.125 each)
* all-clues accept count        (the FP events)
* SHUFFLED all-clues count      (same accept bits recombined across
  different messages — the independence control: clue columns rolled by
  131*i rows)

Round-5 result (artifacts/fp_rate_r05_combined.json): 85 FP events
across 2.01e8 messages / 5 key-pair streams vs 96 expected — the joint
rate is statistically CONSISTENT with the 8^-7 independence model
(p~0.14), per-clue marginals exactly 1/8, shuffled control matching. An
initial 1e8 run observed a 31-vs-48 deficit (p=0.006) suggesting
negative correlation from the shared compact-ciphertext mask u
(``clue.rs:26-34`` packing); it did not replicate and is recorded as a
tail draw. The shuffle control and multi-pair sweep stay in place so any
real correlation would show against the in/cross-message contrast.

A small own-key sanity lane asserts the criterion wiring: clues under the
recipient's own key must accept with rate ~1.

Writes artifacts/fp_rate_r05.json. ~6-10 min for 1e8 messages on one v5e.

Usage: python benches/fp_rate_probe.py [--messages 100000000] [--pairs 4]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def extraction_weights(skp) -> np.ndarray:
    """W (n, clue_count) with phase_i = b_i - a . W[:, i] mod q0.

    Folds ``CmLweCiphertext::extract_all``'s signed index map
    (``detector.rs:505-531``) and the LWE decrypt into one signed
    permutation of the clue secret: W[idx[i,j], i] = (-1)^neg[i,j] * s[j].
    """
    idx, neg = skp.ctx.clue_extract_tables
    s = np.asarray(skp.clue_sk, dtype=np.int64)
    c, n = idx.shape
    w = np.zeros((n, c), dtype=np.int64)
    for i in range(c):
        sign = np.where(neg[i] == 1, -1, 1)
        w[idx[i], i] = sign * s
    return w


def build_step(n: int, c: int, noise_std: float, q0: int, t: int,
               chunk: int, inner: int):
    """One jitted call: generate+test `inner` chunks of `chunk` messages.

    Key material (pk planes + extraction weights) rides as ARGUMENTS so
    one compiled program serves every (recipient, sender) key pair.
    """
    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.core.sender import clue_chunk_body

    @jax.jit
    def step(key, lo, hi, w):
        def body(carry, i):
            per_clue, fp, fp_shuf = carry
            clues = clue_chunk_body(
                jax.random.fold_in(key, i), lo, hi, cnt=chunk, n=n,
                clue_count=c, noise_std=noise_std, q0=q0,
            )
            v = clues.astype(jnp.int32)
            a, b7 = v[:, :n], v[:, n:]
            # a < 2**11 rides two int8 planes into the extraction dot
            alo = (a & 127).astype(jnp.int8)
            ahi = (a >> 7).astype(jnp.int8)
            dots = [
                jax.lax.dot_general(
                    p, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                for p in (alo, ahi)
            ]
            phase = jnp.mod(b7 - (dots[0] + (dots[1] << 7)), q0)
            # round-half-up to Z_t (same convention as decrypt_clue)
            m = ((phase * (2 * t) + q0) // (2 * q0)) % t
            accept = m == 0
            per_clue = per_clue + accept.sum(axis=0, dtype=jnp.int64)
            fp = fp + jnp.all(accept, axis=1).sum(dtype=jnp.int64)
            # independence control: decorrelate clue columns across rows
            shuf = jnp.stack(
                [jnp.roll(accept[:, j], 131 * j) for j in range(c)],
                axis=1,
            )
            fp_shuf = fp_shuf + jnp.all(shuf, axis=1).sum(dtype=jnp.int64)
            return (per_clue, fp, fp_shuf), None

        init = (jnp.zeros((c,), jnp.int64), jnp.zeros((), jnp.int64),
                jnp.zeros((), jnp.int64))
        (per_clue, fp, fp_shuf), _ = jax.lax.scan(
            body, init, jnp.arange(inner, dtype=jnp.int32)
        )
        return per_clue, fp, fp_shuf

    return step


def key_args(clue_key, w):
    import jax

    mat = np.concatenate([clue_key.mat_a, clue_key.mat_b7], axis=1)
    return (
        jax.device_put((mat & 127).astype(np.int8)),
        jax.device_put((mat >> 7).astype(np.int8)),
        # signed extraction weights ride the MXU as one int8 plane
        jax.device_put(w.astype(np.int8)),
    )


def pois_tails(k: int, lam: float):
    """(P[X<=k], P[X>=k]) for X~Poisson(lam), log-space (no underflow at
    large lam — exp(-lam) alone vanishes past lam ~ 745)."""

    def cdf(kk):
        if kk < 0:
            return 0.0
        acc = 0.0
        for j in range(kk + 1):
            acc += math.exp(j * math.log(lam) - lam - math.lgamma(j + 1))
        return min(acc, 1.0)

    return cdf(k), 1.0 - cdf(k - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--messages", type=int, default=100_000_000,
                    help="total across all key pairs")
    ap.add_argument("--pairs", type=int, default=4,
                    help="distinct (recipient, sender) key pairs")
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    from tfhe_omr_tpu.core.keygen import SecretKeyPack
    from tfhe_omr_tpu.core.params import OmrParameters

    params = OmrParameters.default()
    cp = params.clue_params
    q0, t, c = cp.cipher_modulus, cp.plain_modulus, params.clue_count
    n = cp.dimension

    step = build_step(n, c, float(cp.noise_std), q0, t, args.chunk,
                      args.inner)
    step1 = build_step(n, c, float(cp.noise_std), q0, t, args.chunk, 1)

    # sanity lane: own-key clues must accept with rate ~1
    skp0 = SecretKeyPack(params, rng=args.seed)
    w0 = extraction_weights(skp0)
    own_args = key_args(skp0.generate_sender().clue_key, w0)
    _, fp_own, _ = jax.block_until_ready(
        step1(jax.random.PRNGKey(args.seed + 100), *own_args)
    )
    own_rate = float(fp_own) / args.chunk
    print(json.dumps({"own_key_accept_rate": own_rate,
                      "own_key_messages": args.chunk}), flush=True)
    assert own_rate > 0.999, own_rate

    per_call = args.chunk * args.inner
    per_pair_msgs = args.messages // args.pairs
    calls = -(-per_pair_msgs // per_call)
    expected_rate = t ** (-c)

    pair_results = []
    tot_fp = tot_shuf = tot_msgs = 0
    tot_per_clue = np.zeros((c,), dtype=np.int64)
    t_all = time.perf_counter()
    for pair in range(args.pairs):
        skp_r = SecretKeyPack(params, rng=args.seed + 10 * pair)
        skp_s = SecretKeyPack(params, rng=args.seed + 10 * pair + 1)
        ka = key_args(skp_s.generate_sender().clue_key,
                      extraction_weights(skp_r))
        per_clue = np.zeros((c,), dtype=np.int64)
        fp_count = shuf_count = 0
        key = jax.random.PRNGKey(args.seed + 1000 + pair)
        for i in range(calls):
            pc, fp, fps = step(jax.random.fold_in(key, i), *ka)
            per_clue += np.asarray(pc)
            fp_count += int(fp)
            shuf_count += int(fps)
        msgs = calls * per_call
        lam = msgs * expected_rate
        p_le, p_ge = pois_tails(fp_count, lam)
        rec = {
            "pair": pair,
            "messages": msgs,
            "fp_count": fp_count,
            "fp_rate": fp_count / msgs,
            "shuffled_fp_count": shuf_count,
            "shuffled_fp_rate": shuf_count / msgs,
            "expected_count_independence": lam,
            "poisson_p_le": p_le,
            "per_clue_accept_rate": [round(float(x) / msgs, 6)
                                     for x in per_clue],
        }
        print(json.dumps(rec), flush=True)
        pair_results.append(rec)
        tot_fp += fp_count
        tot_shuf += shuf_count
        tot_msgs += msgs
        tot_per_clue += per_clue
    wall = time.perf_counter() - t_all

    lam = tot_msgs * expected_rate
    p_le, p_ge = pois_tails(tot_fp, lam)
    sp_le, sp_ge = pois_tails(tot_shuf, lam)
    result = {
        "messages": tot_msgs,
        "key_pairs": args.pairs,
        "fp_count": tot_fp,
        "observed_rate": tot_fp / tot_msgs,
        "independence_model_rate": expected_rate,
        "expected_count_independence": lam,
        "poisson_p_le": p_le,
        "poisson_p_ge": p_ge,
        "shuffled_fp_count": tot_shuf,
        "shuffled_rate": tot_shuf / tot_msgs,
        "shuffled_poisson_p_le": sp_le,
        "shuffled_poisson_p_ge": sp_ge,
        "per_clue_accept_rate": [round(float(x) / tot_msgs, 6)
                                 for x in tot_per_clue],
        "per_clue_design_rate": 1.0 / t,
        "own_key_accept_rate": own_rate,
        "pairs": pair_results,
        "generator": "tfhe_omr_tpu.core.sender.clue_chunk_body "
                     "(the pipeline's device clue program)",
        "wall_s": round(wall, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "fp_rate_r05.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
