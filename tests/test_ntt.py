"""NTT correctness: roundtrip, negacyclic convolution, monomial tables."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_omr_tpu.ops.modmath import PrimeField
from tfhe_omr_tpu.ops.ntt import NegacyclicNtt

Q1 = 134215681
Q2 = 1125899906826241


def negacyclic_mul_ref(a, b, q):
    """Schoolbook negacyclic convolution with exact Python ints."""
    n = len(a)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            if k < n:
                out[k] += ai * int(b[j])
            else:
                out[k - n] -= ai * int(b[j])
    return np.mod(out, q).astype(np.int64)


@pytest.mark.parametrize("q,n", [(Q1, 1024), (Q2, 2048), (Q1, 64)])
def test_roundtrip(q, n, rng):
    f = PrimeField(q)
    ntt = NegacyclicNtt(f, n)
    x = rng.integers(0, q, size=(n, 5), dtype=np.int64)
    y = np.asarray(ntt.inv(ntt.fwd(jnp.asarray(x))))
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("q,n", [(Q1, 64), (Q2, 128)])
def test_convolution(q, n, rng):
    f = PrimeField(q)
    ntt = NegacyclicNtt(f, n)
    a = rng.integers(0, q, size=n, dtype=np.int64)
    b = rng.integers(0, q, size=n, dtype=np.int64)
    an = ntt.fwd(jnp.asarray(a)[:, None])
    bn = ntt.fwd(jnp.asarray(b)[:, None])
    prod = np.asarray(ntt.inv(f.mul(an, bn)))[:, 0]
    np.testing.assert_array_equal(prod, negacyclic_mul_ref(a, b, q))


@pytest.mark.parametrize("q,n", [(Q1, 64), (Q2, 128)])
def test_monomial_tables(q, n, rng):
    """NTT(X^a - 1)[k] == tab[(orders[k] * a) % 2n] for every a."""
    f = PrimeField(q)
    ntt = NegacyclicNtt(f, n)
    tab, _ = ntt.monomial_minus_one_tables()
    tab = np.asarray(tab)
    for a in [0, 1, 2, n - 1, n, n + 3, 2 * n - 1]:
        poly = np.zeros(n, dtype=np.int64)
        poly[0] = q - 1
        if a < n:
            poly[a] = (poly[a] + 1) % q
        else:
            poly[a - n] = (poly[a - n] - 1) % q
        want = np.asarray(ntt.fwd(jnp.asarray(poly)[:, None]))[:, 0]
        e = (ntt.orders * a) % (2 * n)
        np.testing.assert_array_equal(tab[e], want)


def test_fwd_last_matches_axis0(rng):
    f = PrimeField(Q1)
    ntt = NegacyclicNtt(f, 64)
    x = rng.integers(0, Q1, size=(3, 64), dtype=np.int64)
    a = np.asarray(ntt.fwd_last(jnp.asarray(x)))
    b = np.asarray(ntt.fwd(jnp.asarray(x.T))).T
    np.testing.assert_array_equal(a, b)
