"""Worker for the multi-process sharding-throughput bench.

Each process owns ONE virtual CPU device (and is pinned to one core by the
parent via taskset), so 1 -> 2 process scaling measures the real
per-process efficiency of the sharded pipeline: detect under shard_map +
both digest encoders with their psum reduces. Same-seed keygen on every
process (replicated key), sharded clues, tiny parameters.

Usage: sharding_worker.py <coordinator> <num_procs> <pid> <out.json>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coordinator, num_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    batch = int(os.environ.get("SHARD_BENCH_BATCH", "256"))
    reps = int(os.environ.get("SHARD_BENCH_REPS", "3"))

    if num_procs > 1:
        from tfhe_omr_tpu.parallel import distributed

        n_global = distributed.init(
            coordinator_address=coordinator,
            num_processes=num_procs,
            process_id=pid,
        )
        assert n_global == num_procs, n_global

    from tfhe_omr_tpu.core.keygen import SecretKeyPack
    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.core.payload import random_payloads
    from tfhe_omr_tpu.parallel import ShardedDetector, make_data_mesh

    params = OmrParameters.tiny()
    skp = SecretKeyPack(params, rng=21)
    detector = skp.generate_detector()
    sender = skp.generate_sender()
    rng = np.random.default_rng(5)
    clues = sender.gen_clues(batch, rng)

    mesh = make_data_mesh()
    sd = ShardedDetector(detector, mesh)

    rp = skp.generate_retriever(batch, 8).params
    payloads = random_payloads(rng, batch, params.payload_length)

    # warm/compile
    pert = sd.detect(clues)
    enc_rng = np.random.default_rng(9)
    ct = sd.encode_pertinent_indices(rp, pert, enc_rng)
    pay = sd.encode_pertinent_payloads(rp, pert, payloads, 3)
    jax.block_until_ready((pert, ct, pay))

    t0 = time.perf_counter()
    for _ in range(reps):
        pert = sd.detect(clues)
    jax.block_until_ready(pert)
    detect_s = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(reps):
        ct = sd.encode_pertinent_indices(rp, pert, enc_rng)
        pay = sd.encode_pertinent_payloads(rp, pert, payloads, 3)
    jax.block_until_ready((ct, pay))
    encode_s = (time.perf_counter() - t0) / reps

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "num_procs": num_procs,
                    "batch": batch,
                    "detect_s": round(detect_s, 3),
                    "encode_s": round(encode_s, 3),
                    "detect_msgs_per_s": round(batch / detect_s, 2),
                },
                f,
            )


if __name__ == "__main__":
    main()
