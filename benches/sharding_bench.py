"""Sharding-overhead measurements (VERDICT round-2 item 5).

Two measurements quantifying what the multi-chip projection rests on:

(a) ``--tpu``: sharded-vs-unsharded detect on the ONE real chip — a
    1-device mesh routed through ``shard_map`` measures the pure
    shard_map/psum/dispatch overhead against the plain jitted path
    (mirror of the reduce at reference ``detector.rs:333-336``).

(b) ``--cpu-scaling``: 1 -> 2 (-> 4) OS-process throughput of the FULL
    sharded pipeline (detect + both digest encoders) on the CPU backend,
    one virtual device and one pinned core per process. The host has 2
    cores, so 1 -> 2 is the honest scaling point; 4 is an
    oversubscription data point.

Usage: python benches/sharding_bench.py --tpu | --cpu-scaling
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def run_tpu(batch: int, reps: int):
    import jax

    from tfhe_omr_tpu.core.keygen import SecretKeyPack
    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.parallel import ShardedDetector, make_data_mesh

    params = OmrParameters.default()
    skp = SecretKeyPack(params, rng=0)
    detector = skp.generate_detector()
    sender = skp.generate_sender()
    rng = np.random.default_rng(1)
    clues = sender.gen_clues(batch, rng)

    # plain path (warm: 2 runs + fetch pin so leftover executable load
    # cannot bleed into the timed region)
    detector.warm(batch)
    for _ in range(2):
        out = detector.detect(clues)
        jax.block_until_ready(out)
        np.asarray(out[:1, :1, :8])
    t0 = time.perf_counter()
    outs = [detector.detect(clues) for _ in range(reps)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1][:1, :1, :8])
    plain_s = (time.perf_counter() - t0) / reps

    # sharded path on a 1-device mesh (warm)
    mesh = make_data_mesh()
    sd = ShardedDetector(detector, mesh)
    for _ in range(2):
        out_s = sd.detect(clues)
        jax.block_until_ready(out_s)
        np.asarray(out_s[:1, :1, :8])
    t0 = time.perf_counter()
    outs = [sd.detect(clues) for _ in range(reps)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1][:1, :1, :8])
    shard_s = (time.perf_counter() - t0) / reps

    bitexact = bool(np.array_equal(np.asarray(out), np.asarray(out_s)))
    print(json.dumps({
        "mode": "tpu_1dev_mesh",
        "batch": batch,
        "plain_s_per_batch": round(plain_s, 3),
        "sharded_s_per_batch": round(shard_s, 3),
        "overhead_pct": round(100.0 * (shard_s / plain_s - 1.0), 2),
        "bit_exact": bitexact,
        "device": str(jax.devices()[0]),
    }))


def run_cpu_scaling(batch: int, procs_list):
    results = []
    env_base = {
        k: v for k, v in os.environ.items() if not k.startswith("JAX_PLAT")
    }
    env_base["SHARD_BENCH_BATCH"] = str(batch)
    worker = os.path.join(HERE, "sharding_worker.py")
    ncores = os.cpu_count() or 1
    for n in procs_list:
        out_path = tempfile.mktemp(suffix=".json")
        port = 12421 + n
        handles = []
        for pid in range(n):
            cmd = [
                "taskset", "-c", str(pid % ncores),
                sys.executable, worker,
                f"127.0.0.1:{port}", str(n), str(pid), out_path,
            ]
            handles.append(subprocess.Popen(
                cmd, env=env_base,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ))
        rc = [h.wait(timeout=1800) for h in handles]
        assert all(r == 0 for r in rc), rc
        with open(out_path) as f:
            results.append(json.load(f))
        os.unlink(out_path)
    base = results[0]
    for r in results:
        # strong scaling: fixed total batch sharded over n single-core
        # processes; speedup = T1/Tn, efficiency = speedup / n
        speedup = (base["detect_s"] + base["encode_s"]) / (
            r["detect_s"] + r["encode_s"]
        )
        r["speedup_vs_1proc"] = round(speedup, 3)
        r["scaling_efficiency"] = round(speedup / r["num_procs"], 3)
    print(json.dumps({"mode": "cpu_process_scaling", "runs": results}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--cpu-scaling", action="store_true")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--procs", type=str, default="1,2,4")
    args = ap.parse_args()
    if args.tpu:
        run_tpu(args.batch or 1024, args.reps)
    if args.cpu_scaling:
        run_cpu_scaling(
            args.batch or 256, [int(x) for x in args.procs.split(",")]
        )


if __name__ == "__main__":
    main()
