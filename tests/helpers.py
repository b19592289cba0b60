"""Shared test helpers: direct encrypt/decrypt against pack secrets."""

import numpy as np
import jax.numpy as jnp


def rlwe_encrypt_coeff(ctx, level, z_ntt, mu, rng):
    """Noise-free RLWE encryption of coefficient-domain poly mu.

    Returns coefficient-domain ct (N, 2) stacked as [a, b] columns? No —
    returns (a, b) coefficient-domain arrays of shape (N,).
    """
    f = ctx.f1 if level == 1 else ctx.f2
    ntt = ctx.ntt1 if level == 1 else ctx.ntt2
    n = ntt.n
    a = rng.integers(0, f.q, size=n, dtype=np.int64)
    an = ntt.fwd(jnp.asarray(a)[:, None])
    bn = f.add(f.mul(an, z_ntt[:, None]), ntt.fwd(jnp.asarray(mu)[:, None]))
    b = np.asarray(ntt.inv(bn))[:, 0]
    return a, b


def rlwe_decrypt_coeff(ctx, level, z_ntt, a, b):
    f = ctx.f1 if level == 1 else ctx.f2
    ntt = ctx.ntt1 if level == 1 else ctx.ntt2
    an = ntt.fwd(jnp.asarray(a)[:, None])
    bn = ntt.fwd(jnp.asarray(b)[:, None])
    phase = f.sub(bn, f.mul(an, z_ntt[:, None]))
    return np.asarray(ntt.inv(phase))[:, 0]


def lwe_encrypt(sk, q, delta, m, rng, noise=0):
    """(a, b) LWE ciphertext of message m with scale delta, modulus q."""
    n = len(sk)
    a = rng.integers(0, q, size=n, dtype=np.int64)
    b = np.mod(a @ sk + delta * m + noise, q)
    return a, b


def centered(x, q):
    x = np.mod(x, q)
    return np.where(x > q // 2, x - q, x)
