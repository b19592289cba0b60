"""Sharded detection/digest must be bit-identical to single-device results.

The digest reduction is exact modular addition, so sharding can change
nothing (SURVEY.md §4 test plan). Runs on the 8 virtual CPU devices forced
by conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_omr_tpu.core.keygen import SecretKeyPack
from tfhe_omr_tpu.core.params import OmrParameters
from tfhe_omr_tpu.core.sender import ClueBatch
from tfhe_omr_tpu.parallel import ShardedDetector, make_data_mesh


@pytest.fixture(scope="module")
def setup():
    params = OmrParameters.tiny()
    skp = SecretKeyPack(params, rng=21)
    rng = np.random.default_rng(22)
    sender = skp.generate_sender()
    detector = skp.generate_detector()
    clues = sender.gen_clues(16, rng)
    return params, skp, detector, clues


def test_mesh_has_devices():
    assert len(jax.devices()) == 8


def test_sharded_detect_matches_single(setup):
    params, skp, detector, clues = setup
    mesh = make_data_mesh()
    sharded = ShardedDetector(detector, mesh)

    single = np.asarray(detector.detect(clues))
    multi = np.asarray(sharded.detect(clues))
    np.testing.assert_array_equal(single, multi)


def test_sharded_encode_matches_single(setup):
    params, skp, detector, clues = setup
    mesh = make_data_mesh()
    sharded = ShardedDetector(detector, mesh)

    pv = detector.detect(clues)
    retr = skp.generate_retriever(16, 4)
    rp = retr.params
    rng = np.random.default_rng(5)
    plain = detector.build_index_plaintexts(rp, 16, rng)

    single = np.asarray(
        detector._encode_chunk_jit(
            pv, jnp.asarray(plain), jnp.zeros((2, params.n2), dtype=jnp.int64)
        )
    )
    multi = np.asarray(sharded.encode_chunk(pv, plain))
    np.testing.assert_array_equal(single, multi)
