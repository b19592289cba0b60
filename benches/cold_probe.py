"""Cold-start breakdown probe: keygen / executable load / first execution.

Measures, in a fresh process on the real chip, where the first-detect time
goes: key generation, per-stage AOT compile (persistent-cache load +
executable deserialization on the backend), first execution (key upload +
run), and steady-state execution. Run twice back-to-back (fresh processes)
to separate compile-cache misses from load costs.

Usage: python benches/cold_probe.py [--batch 1024]
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
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    def note(k, v):
        t[k] = v
        print(f"# {k}: {v}", file=sys.stderr, flush=True)

    t = {}
    t_start = time.perf_counter()
    t0 = t_start
    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.core.keygen import SecretKeyPack
    from tfhe_omr_tpu.core.params import OmrParameters

    note("import_s", round(time.perf_counter() - t0, 2))

    t0 = time.perf_counter()
    params = OmrParameters.default()
    skp = SecretKeyPack(params, rng=0)
    note("keygen_dispatch_s", round(time.perf_counter() - t0, 2))

    t0 = time.perf_counter()
    detector = skp.generate_detector()
    note("detector_build_s", round(time.perf_counter() - t0, 2))

    # force keygen device programs + transfers to finish
    t0 = time.perf_counter()
    key = detector.key
    jax.block_until_ready([a for a in key if a is not None])
    note("keygen_sync_s", round(time.perf_counter() - t0, 2))
    key_bytes = detector.detect_key_size()
    note("key_bytes_mb", round(key_bytes / 1e6, 1))

    sender = skp.generate_sender()
    rng = np.random.default_rng(1)
    clues = sender.gen_clues(args.batch, rng)

    # ---- per-stage AOT: lower / compile(cache load) / first run
    a_j = jnp.asarray(clues.a)
    b_j = jnp.asarray(clues.b7)

    def aot(name, jitted, *sargs):
        t0 = time.perf_counter()
        lowered = jitted.lower(*sargs)
        note(f"{name}_lower_s", round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        compiled = lowered.compile()
        note(f"{name}_compile_or_load_s", round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        out = compiled(*sargs)
        jax.block_until_ready(out)
        note(f"{name}_first_run_s", round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        out = compiled(*sargs)
        jax.block_until_ready(out)
        note(f"{name}_second_run_s", round(time.perf_counter() - t0, 2))
        return out

    tbl = detector.tables
    ms = aot(
        "stage1", detector._stage1_jit, a_j, b_j, key.bsk1, key.bsk1_sh,
        key.ksk_limbs, key.bsk1_bal, tbl,
    )
    acc2 = aot(
        "stage2", detector._stage2_jit, ms[0], ms[1], key.bsk2, key.bsk2_sh,
        key.bsk2_bal, tbl,
    )
    aot(
        "stage3", detector._stage3_jit, acc2, key.trace_k, key.trace_k_sh,
        key.trace_auto, key.trace_bal, tbl,
    )

    t["total_s"] = round(time.perf_counter() - t_start, 2)
    print(json.dumps(t))


if __name__ == "__main__":
    main()
