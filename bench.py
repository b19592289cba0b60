"""Benchmark: batched detect throughput on one chip at reference parameters.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's single-core detect throughput, 4.27 msg/s
(234.073 ms/msg at D=65536, reference README.md:120-121; BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    # 1024 fully amortizes the tunneled backend's ~30 ms/dispatch across
    # the 3 stage calls (~218 vs 215.6 msg/s at 512 vs 195.5 at 128);
    # D=65536 in the production setting makes large batches the natural
    # operating point, and at 1024 the three stage times approximately sum
    # to the whole batch time (stage glue hidden; timers overlap by ~0.5%).
    # Downsize via OMR_BENCH_BATCH=512 on smaller/shared slices.
    batch = int(os.environ.get("OMR_BENCH_BATCH", "1024"))
    reps = int(os.environ.get("OMR_BENCH_REPS", "3"))

    import jax

    from tfhe_omr_tpu.core.keygen import SecretKeyPack
    from tfhe_omr_tpu.core.params import OmrParameters

    t0 = time.perf_counter()
    params = OmrParameters.default()
    skp = SecretKeyPack(params, rng=0)
    detector = skp.generate_detector()
    sender = skp.generate_sender()
    rng = np.random.default_rng(1)
    clues = sender.gen_clues(batch, rng)
    keygen_s = time.perf_counter() - t0

    # AOT-prepare the stage programs from the lowered-program disk cache
    # (skips ~250 s of host-side tracing per fresh process; cold cache pays
    # it once and records "miss")
    t0 = time.perf_counter()
    aot_status = detector.warm(batch)
    warm_s = time.perf_counter() - t0

    # compile + warm up (executable load + first batch)
    t0 = time.perf_counter()
    out = detector.detect(clues)
    jax.block_until_ready(out)
    np.asarray(out[:1, :1, :8])  # pin true completion (tunneled backend)
    compile_s = time.perf_counter() - t0

    # OMR_BENCH_FETCH=1 forces a tiny device->host fetch inside the timed
    # region: on tunneled backends block_until_ready can ack before the
    # device has actually executed (PERF_NOTES.md); the fetch pins the true
    # completion at the cost of one small RTT.
    fetch = os.environ.get("OMR_BENCH_FETCH") == "1"
    # Throughput: `reps` plain detect batches dispatched back-to-back with
    # one sync at the end — the steady-state streaming shape (production
    # feeds the next batch while the current one runs). detect_with_time_info
    # serializes the three stage programs on host stamps; measured cost of
    # that on the tunneled backend is ~0.1% (4.703 vs 4.708 s/batch,
    # docs/PERF_NOTES.md round-2 close-out), i.e. the backend already
    # pipelines the stage dispatches.
    t0 = time.perf_counter()
    outs = [detector.detect(clues) for _ in range(reps)]
    jax.block_until_ready(outs)
    if fetch:
        np.asarray(outs[-1][:1, :1, :8])
    # Mean over reps of the streaming batch time. NOTE: round-1 artifacts
    # recorded "best_batch_seconds" (min-of-N of stage-stamped runs), which
    # is not directly comparable to this steady-state mean.
    per_batch_s = (time.perf_counter() - t0) / reps
    msgs_per_sec = batch / per_batch_s
    # Stage split from one separately-timed run (blocks between stages).
    out, stages = detector.detect_with_time_info(clues)
    if fetch:
        np.asarray(out[:1, :1, :8])

    # ---- digest encoders + client decode at D-scale (synthetic pertinency
    # stack: timing only needs the shapes; reference baselines at D=65536:
    # encode indices 3.482 s / 5 cts, encode payloads 24.26 s, decode
    # 305.53 ms — reference README.md:122-125)
    enc = {}
    d_scale = int(os.environ.get("OMR_BENCH_D", "65536"))
    if d_scale:
        import jax.numpy as jnp

        rp = skp.generate_retriever(d_scale, 50).params
        n2 = rp.polynomial_size
        q2 = skp.ctx.f2.q
        hi = jax.random.randint(
            jax.random.PRNGKey(0), (d_scale, 2, n2), 0, 1 << 31,
            dtype=jnp.int64,
        )
        pert = jax.block_until_ready(hi % q2)  # synthetic NTT-domain cts
        enc_rng = np.random.default_rng(7)
        # AOT-restore the encoder scan programs (one-time export on cache
        # miss; the payload scan alone traces+compiles for minutes cold)
        detector.warm_encoders(rp, d_scale)
        # warm (executable load) then measure the PRODUCTION shape: all 5
        # redundant index cts dispatched back-to-back with one sync — the
        # same streaming shape examples/omr.py runs (round-4 probe: a
        # single ct costs 0.19 s dispatched alone vs 0.10 s streamed)
        ct = detector.encode_pertinent_indices(rp, pert, enc_rng)
        jax.block_until_ready(ct)
        np.asarray(ct[:1, :8])
        n_idx = rp.max_encode_indices_cipher_count
        t0 = time.perf_counter()
        cts = [
            detector.encode_pertinent_indices(rp, pert, enc_rng)
            for _ in range(n_idx)
        ]
        jax.block_until_ready(cts)
        ct = cts[-1]
        np.asarray(ct[:1, :8])
        idx_total_s = time.perf_counter() - t0
        idx_s = idx_total_s / n_idx
        # payload encoder: report the full call (host prep + upload +
        # scan) as the headline, median of 3, PLUS the device-compute and
        # upload split — the upload rides the tunneled link whose
        # throughput swings ~20-70 MB/s between runs, which is exactly the
        # BENCH_r03-vs-e2e 13.4 s/4.6 s discrepancy (benches/
        # encoder_probe.py: compute 2.78 s, upload 110 MB at 2-5 s)
        payloads = enc_rng.integers(0, 256, size=(d_scale, rp.payload_length))
        pay_cts = detector.encode_pertinent_payloads(rp, pert, payloads, 9)
        jax.block_until_ready(pay_cts)
        np.asarray(pay_cts[:1, :1, :8])
        pay_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            pay_cts = detector.encode_pertinent_payloads(rp, pert, payloads, 9)
            np.asarray(pay_cts[:1, :1, :8])
            pay_runs.append(time.perf_counter() - t0)
        pay_s = sorted(pay_runs)[1]  # median of 3
        # split: device-resident-arg scan (pure compute) vs upload
        from tfhe_omr_tpu.core.detector import sample_weights

        import jax.numpy as _jnp

        w_all = sample_weights(rp, 9).reshape(
            rp.cmb_cipher_count, rp.cmb_count_per_cipher, -1
        )
        p16 = np.asarray(payloads, dtype=np.int16)
        t0 = time.perf_counter()
        p16_d = jax.block_until_ready(_jnp.asarray(p16))
        w_d = jax.block_until_ready(
            _jnp.asarray(np.asarray(w_all, dtype=np.int16))
        )
        pay_upload_s = time.perf_counter() - t0
        accs0 = _jnp.zeros((rp.cmb_cipher_count, 2, rp.polynomial_size),
                           dtype=_jnp.int64)
        t0 = time.perf_counter()
        out_scan = detector._encode_pay_scan_jit(
            pert, p16_d, w_d, accs0, rp.payload_length, 2048,
            detector.tables,
        )
        np.asarray(out_scan[:1, :1, :8])
        pay_compute_s = time.perf_counter() - t0
        # client decode (host/C++): one index-ct scan attempt + all payload
        # ct decrypts + one k x k payload solve (synthetic data never
        # decodes, the per-stage work is identical). warm() precompiles the
        # decrypt programs and builds the C++ library first — one-time
        # setup, excluded exactly as the reference's AOT-compiled client
        # excludes codegen from its decode timings.
        retr = skp.generate_retriever(d_scale, 50).warm()
        from tfhe_omr_tpu.core.matrix import solve_matrix

        rp_r = retr.params
        sm = enc_rng.integers(
            0, rp_r.index_modulus,
            size=(rp_r.combination_count, rp_r.pertinent_count),
        )
        srhs = enc_rng.integers(
            0, rp_r.index_modulus,
            size=(rp_r.combination_count, rp_r.payload_length),
        )
        t0 = time.perf_counter()
        retr.decode_pertinent_indices(ct)
        idx_dec_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        retr.decode_combined_payloads(pay_cts)
        solve_matrix(sm, srhs, int(rp_r.index_modulus))
        pay_dec_s = time.perf_counter() - t0
        enc = {
            "digest_d": d_scale,
            "encode_indices_s_per_ct": round(idx_s, 3),
            "encode_indices_total_s_5ct": round(idx_total_s, 3),
            "encode_payloads_s": round(pay_s, 3),
            "encode_payloads_runs_s": [round(t, 3) for t in pay_runs],
            "encode_payloads_device_compute_s": round(pay_compute_s, 3),
            "encode_payloads_upload_s": round(pay_upload_s, 3),
            "decode_s": round(idx_dec_s + pay_dec_s, 3),
            "ref_baseline_s": {
                "encode_indices_total": 3.482,
                "encode_payloads": 24.26,
                "decode": 0.30553,
            },
        }

    baseline_msgs_per_sec = 4.27  # reference single-core (BASELINE.md)
    result = {
        "metric": "detect_throughput_per_chip",
        "value": round(msgs_per_sec, 3),
        "unit": "msg/s",
        "vs_baseline": round(msgs_per_sec / baseline_msgs_per_sec, 3),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "batch": batch,
                    "batch_seconds_streaming": round(per_batch_s, 3),
                    "ms_per_message": round(1000.0 * per_batch_s / batch, 3),
                    "stage_ms_per_message": {
                        "first_level": round(
                            1e3 * stages.first_level_bootstrapping_time / batch, 2
                        ),
                        "second_level": round(
                            1e3 * stages.second_level_bootstrapping_time / batch,
                            2,
                        ),
                        "trace": round(1e3 * stages.trace_time / batch, 2),
                    },
                    "keygen_seconds": round(keygen_s, 1),
                    "aot_warm_seconds": round(warm_s, 1),
                    "aot_status": aot_status,
                    "compile_seconds": round(compile_s, 1),
                    "cold_start_seconds": round(
                        keygen_s + warm_s + compile_s, 1
                    ),
                    # keygen + first-batch load ride the tunneled device
                    # link (10-70 MB/s run-to-run swing, ~0.7 GB key
                    # upload + executable deserialization), so the cold
                    # start is a single-shot draw from a wide distribution
                    # - committed artifacts and fresh-process confirmation
                    # runs of IDENTICAL code have recorded 42.6-88.4 s
                    # (docs/PERF_NOTES.md round-4 close-out). The range is
                    # the number of record; one draw is not.
                    "cold_start_observed_range_s": [42.6, 88.4],
                    "cold_start_variance_cause": (
                        "tunneled-link transfer rate swing (10-70 MB/s) "
                        "during key upload + executable load; see "
                        "docs/PERF_NOTES.md"
                    ),
                    "digest": enc,
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
