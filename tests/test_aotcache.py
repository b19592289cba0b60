"""AOT lowered-program cache: bit-exactness, fallback, and cache hits.

``Detector.warm`` exports the three stage programs through
:mod:`tfhe_omr_tpu.utils.aotcache` so fresh processes skip the expensive
host-side tracing (docs/PERF_NOTES.md round-3 cold start). The exported
path must be bit-identical to the plain jit path and transparently fall
back for batch sizes it was not prepared for.
"""

import os
import tempfile

import numpy as np
import pytest

from tfhe_omr_tpu.core.keygen import SecretKeyPack
from tfhe_omr_tpu.core.params import OmrParameters


@pytest.fixture(scope="module")
def det_and_clues():
    params = OmrParameters.tiny()
    skp = SecretKeyPack(params, rng=3)
    det = skp.generate_detector()
    sender = skp.generate_sender()
    rng = np.random.default_rng(5)
    return det, sender.gen_clues(16, rng), sender.gen_clues(8, rng)


def test_warm_bit_exact_and_fallback(det_and_clues, tmp_path, monkeypatch):
    monkeypatch.setenv("TFHE_OMR_AOT_CACHE", str(tmp_path))
    det, clues16, clues8 = det_and_clues
    base = np.asarray(det.detect(clues16))
    status = det.warm(16)
    assert set(status.values()) == {"miss"}
    aot = np.asarray(det.detect(clues16))
    np.testing.assert_array_equal(base, aot)
    # un-prepared batch size routes through the original jit path
    out8 = np.asarray(det.detect(clues8))
    assert out8.shape[0] == 8
    # second warm (same code, same shapes) hits the disk cache
    assert set(det.warm(16).values()) == {"hit"}


def test_extra_key_separates_baked_constants(tmp_path, monkeypatch):
    """Two programs with IDENTICAL input avals but different baked-in
    constants must not share cache entries (advisor round-3 medium: two
    parameter sets with the same shapes/dtypes silently sharing cached
    executables would produce wrong ciphertexts with no error)."""
    import jax
    import jax.numpy as jnp

    from tfhe_omr_tpu.utils.aotcache import cached_export

    monkeypatch.setenv("TFHE_OMR_AOT_CACHE", str(tmp_path))
    sample = (jax.ShapeDtypeStruct((4,), jnp.int64),)

    def make(c):
        return jax.jit(lambda x: x * c)

    call_a, st_a = cached_export("t", make(3), sample, extra="q=3")
    call_b, st_b = cached_export("t", make(5), sample, extra="q=5")
    assert (st_a, st_b) == ("miss", "miss")
    x = jnp.arange(4, dtype=jnp.int64)
    np.testing.assert_array_equal(np.asarray(call_a(x)), [0, 3, 6, 9])
    np.testing.assert_array_equal(np.asarray(call_b(x)), [0, 5, 10, 15])
    # same extra -> disk hit restores the matching program
    call_a2, st = cached_export("t", make(3), sample, extra="q=3")
    assert st == "hit"
    np.testing.assert_array_equal(np.asarray(call_a2(x)), [0, 3, 6, 9])


def test_fingerprint_covers_package_sources():
    from tfhe_omr_tpu.utils import aotcache

    fp = aotcache.code_fingerprint()
    assert isinstance(fp, str) and len(fp) == 16
    # stable within a process
    assert aotcache.code_fingerprint() == fp
