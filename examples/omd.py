"""Oblivious message detection correctness check.

Counterpart of reference ``omr_core/examples/omd.rs``: detect one pertinent
and one non-pertinent clue, decrypt, assert [1,0,...,0] vs all zeros.

Usage: python examples/omd.py [--tiny] [--cpu]
"""

import argparse
import logging
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

log = logging.getLogger("omd")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.DEBUG,
                        format="%(asctime)s %(levelname)s %(message)s")

    import jax

    # the axon TPU plugin re-asserts its platform during import, so the
    # JAX_PLATFORMS env var alone does not stick — honor it here
    import os as _os

    env_plat = _os.environ.get("JAX_PLATFORMS")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif env_plat and "axon" not in env_plat:
        jax.config.update("jax_platforms", env_plat)

    from tfhe_omr_tpu.core.keygen import SecretKeyPack
    from tfhe_omr_tpu.core.params import OmrParameters
    from tfhe_omr_tpu.core.sender import ClueBatch

    params = OmrParameters.tiny() if args.tiny else OmrParameters.default()
    rng = np.random.default_rng()

    log.debug("generating secret key packs...")
    skp = SecretKeyPack(params, rng=np.random.default_rng())
    skp2 = SecretKeyPack(params, rng=np.random.default_rng())

    log.debug("generating sender and detector...")
    sender = skp.generate_sender()
    sender2 = skp2.generate_sender()
    detector = skp.generate_detector()

    log.debug("generating clues...")
    clues = sender.gen_clues(1, rng)
    clues2 = sender2.gen_clues(1, rng)

    log.debug("detecting...")
    t0 = time.perf_counter()
    result = detector.detect(ClueBatch.concat([clues, clues2]))
    jax.block_until_ready(result)
    log.debug("detect done in %.2fs (includes compile)", time.perf_counter() - t0)

    dec = skp.decrypt_rlwe2_ntt(result)
    q, t = params.q2, params.output_plain_modulus
    decoded = np.mod((dec * (2 * t) + q) // (2 * q), t)

    assert decoded[0, 0] == 1, decoded[0, :8]
    assert not decoded[0, 1:].any()
    assert not decoded[1].any()
    log.info("omd check passed: [1,0,...,0] for pertinent, zeros otherwise")


if __name__ == "__main__":
    main()
