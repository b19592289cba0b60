"""Pallas NTT kernels (interpret mode) vs their jnp twins — bit-exact."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_omr_tpu.ops.modmath import PrimeField

Q1 = 134215681
Q2 = 1125899906826241


@pytest.fixture(scope="module")
def pallas27():
    from tfhe_omr_tpu.ops.pallas_ntt import PallasNtt

    return PallasNtt(PrimeField(Q1), 1024, tile=8, interpret=True)


@pytest.fixture(scope="module")
def pallas50():
    from tfhe_omr_tpu.ops.pallas_ntt import PallasNtt50

    return PallasNtt50(
        PrimeField(Q2), 2048, tile=2, x_chunk=256, interpret=True
    )


def test_pallas27_matches_jnp(pallas27, rng):
    pn = pallas27
    x = jnp.asarray(rng.integers(0, Q1, size=(1024, 8), dtype=np.int64))
    np.testing.assert_array_equal(
        np.asarray(pn._fwd_call(x.astype(jnp.int32), *pn.fwd_tables)),
        np.asarray(pn.ref.fwd(x)),
    )
    np.testing.assert_array_equal(
        np.asarray(pn._inv_call(x.astype(jnp.int32), *pn.inv_tables)),
        np.asarray(pn.ref.inv(x)),
    )


def test_pallas50_matches_twin(pallas50, rng):
    pn = pallas50
    x = jnp.asarray(rng.integers(0, Q2, size=(2048, 2), dtype=np.int64))
    perm = jnp.asarray(pn._perm)
    np.testing.assert_array_equal(
        np.asarray(pn._fwd_call(x, *pn.fwd_tables)), np.asarray(pn.ref2.fwd(x)[perm])
    )
    perm_inv = jnp.asarray(pn._perm_inv)
    np.testing.assert_array_equal(
        np.asarray(pn._inv_call(x, *pn.inv_tables)), np.asarray(pn.ref2.inv(x[perm_inv]))
    )


def test_pallas50_roundtrip(pallas50, rng):
    pn = pallas50
    x = rng.integers(0, Q2, size=(2048, 2), dtype=np.int64)
    rt = np.asarray(pn._inv_call(pn._fwd_call(jnp.asarray(x), *pn.fwd_tables), *pn.inv_tables))
    np.testing.assert_array_equal(rt, x)


def test_fallback_path_consistency(pallas27, rng):
    """Off-TPU fwd/inv must route to the jnp twin (same values)."""
    pn = pallas27
    pn_interp = pn
    x = jnp.asarray(rng.integers(0, Q1, size=(1024, 4), dtype=np.int64))
    # interpret=True forces the kernel; ref path must agree
    a = np.asarray(pn_interp.fwd(x))
    b = np.asarray(pn.ref.fwd(x))
    np.testing.assert_array_equal(a, b)
