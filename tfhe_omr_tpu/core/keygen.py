"""Key generation: secrets, clue (public) key, detection key, trace key.

Counterpart of reference ``omr_core/src/key_gen/`` (``SecretKeyPack`` at
``secret.rs:23-209``, ``ClueKey`` at ``clue.rs``, ``DetectionKey`` at
``detection.rs``). Differences by design:

* fully seeded & optionally noise-free (deterministic test mode) — the
  reference uses ``thread_rng`` with no deterministic mode (SURVEY.md §4);
* all heavy polynomial math (RGSW encryptions for the bootstrapping keys)
  runs batched through the same jnp NTT kernels used by the detector, so key
  generation itself is device-accelerated;
* keys are stored in the layouts the TPU detector kernels consume directly:
  NTT domain, poly axis major, with Shoup companions precomputed.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tfhe_omr_tpu.core.context import OmrContext
from tfhe_omr_tpu.core.params import OmrParameters
from tfhe_omr_tpu.ops.modmath import PrimeField
from tfhe_omr_tpu.ops.ntt import NegacyclicNtt
from tfhe_omr_tpu.utils.devices import host_math, to_accelerator


class DetectionKey(NamedTuple):
    """Device arrays for the detector (counterpart of ``DetectionKey``,
    reference ``key_gen/detection.rs:9-16``). All NTT-domain, poly-major."""

    bsk1: jnp.ndarray  # (3*n0/2, N1, d1, 2, 2) int32 paired (small field)
    bsk1_sh: jnp.ndarray
    ksk_limbs: jnp.ndarray  # (limbs, N1*ks_digits, n_int+1) int8
    bsk2: jnp.ndarray  # (3*n_int/2, N2, d2, 2, 2) int64 paired
    bsk2_sh: jnp.ndarray
    trace_k: jnp.ndarray  # (rounds, N2, d_tr, 2) int64
    trace_k_sh: jnp.ndarray
    bsk1_bal: jnp.ndarray | None = None  # (n0/2, N1, 128) int16 balanced
    bsk2_bal: jnp.ndarray | None = None  # (n_int/2, 2*d2, N2, 32) int16
    trace_bal: jnp.ndarray | None = None  # (rounds, d_tr+pad, N2, 16) int16
    trace_auto: jnp.ndarray | None = None  # (rounds, N2, 2) int32 (idx, sign)


class ClueKey(NamedTuple):
    """Sender-facing LWE public key in RLWE mode (counterpart of
    ``LwePublicKeyRlweMode``; reference ``key_gen/clue.rs``).

    ``mat_a[i, k]`` is coefficient k of ``X^i * pk_a`` (negacyclic), so clue
    encryption is a single (B, n) x (n, n) integer matmul; ``mat_b7`` keeps
    only the ``clue_count`` output coefficients that form the compact
    ciphertext.
    """

    mat_a: np.ndarray  # (n0, n0) int64 mod q0
    mat_b7: np.ndarray  # (n0, clue_count) int64 mod q0
    q0: int
    noise_std: float
    clue_count: int


def _gen_secret(rng: np.random.Generator, kind: str, n: int) -> np.ndarray:
    if kind == "binary":
        return rng.integers(0, 2, size=n, dtype=np.int64)
    if kind == "ternary":
        return rng.integers(-1, 2, size=n, dtype=np.int64)
    raise ValueError(kind)


def _rlwe_encrypt_ntt(
    field: PrimeField,
    ntt: NegacyclicNtt,
    z_ntt: jnp.ndarray,
    mu: jnp.ndarray,
    noise_std: float,
    rng: np.random.Generator,
):
    """Batch-encrypt plaintext polys ``mu`` (..., N) under ring key z.

    Returns NTT-domain (A, B) with B = A*z + NTT(e + mu). Sampling A directly
    in the NTT domain is equivalent to sampling it in coefficient domain
    (NTT of a uniform poly is uniform).
    """
    a = jnp.asarray(field.rand(rng, mu.shape))
    e = jnp.asarray(field.gaussian(rng, noise_std, mu.shape))
    payload = ntt.fwd_last(field.add(jnp.asarray(mu), e))
    b = field.add(field.mul(a, z_ntt), payload)
    return a, b


class SecretKeyPack:
    """All four secrets plus derivation of every public/evaluation key.

    Counterpart of ``SecretKeyPack`` (reference ``key_gen/secret.rs:23-209``).
    """

    def __init__(
        self,
        params: OmrParameters,
        rng: np.random.Generator | int | None = None,
        ctx: OmrContext | None = None,
    ):
        if rng is None or isinstance(rng, (int, np.integer)):
            rng = np.random.default_rng(rng)
        self.rng = rng
        self.params = params
        self.ctx = ctx if ctx is not None else OmrContext(params)
        c = self.ctx

        p = params
        # clue LWE secret s (binary, n=512) — ``secret.rs:50``
        self.clue_sk = _gen_secret(rng, p.clue_params.secret_type, p.clue_params.dimension)
        # intermediate LWE secret s2 (binary, 670) — ``secret.rs:51-52``
        self.inter_sk = _gen_secret(
            rng, p.intermediate_lwe.secret_type, p.intermediate_lwe.dimension
        )
        # ring secrets z1 (ternary, N1) and z2 (ternary, N2) — ``secret.rs:55-82``
        self.z1 = _gen_secret(rng, p.first_level_br.secret_type, p.n1)
        self.z2 = _gen_secret(rng, p.second_level_br.secret_type, p.n2)
        self.z1_f = np.mod(self.z1, c.f1.q).astype(np.int64)
        self.z2_f = np.mod(self.z2, c.f2.q).astype(np.int64)
        with host_math():
            self.z1_ntt = c.ntt1.fwd_last(jnp.asarray(self.z1_f))
            self.z2_ntt = c.ntt2.fwd_last(jnp.asarray(self.z2_f))

    # ------------------------------------------------------------- clue key
    def generate_clue_key(self) -> ClueKey:
        """LWE public key in RLWE mode (``secret.rs:98-106``)."""
        p = self.params.clue_params
        n, q0 = p.dimension, p.cipher_modulus
        rng = self.rng
        pk_a = rng.integers(0, q0, size=n, dtype=np.int64)
        e = np.rint(rng.normal(0, p.noise_std, size=n)).astype(np.int64)
        s = self.clue_sk
        # b(X) = a(X) * s(X) + e(X) in Z_q0[X]/(X^n + 1)
        conv = _negacyclic_matrix(pk_a, q0)
        pk_b = np.mod(s @ conv + e, q0)
        mat_a = _negacyclic_matrix(pk_a, q0)
        mat_b = _negacyclic_matrix(pk_b, q0)
        return ClueKey(
            mat_a=mat_a,
            mat_b7=mat_b[:, : self.params.clue_count].copy(),
            q0=q0,
            noise_std=p.noise_std,
            clue_count=self.params.clue_count,
        )

    # -------------------------------------------------------- detection key
    def generate_detection_key(self) -> DetectionKey:
        """BSK1, KSK, BSK2 and trace key (``secret.rs:118-178``)."""
        c = self.ctx
        p = self.params
        rng = self.rng

        with host_math():
            bsk1, bsk1_sh = self._gen_bsk(
                self._pair_bits(self.clue_sk),
                self.z1_f,
                self.z1_ntt,
                c.f1,
                c.ntt1,
                c.gadget_br1,
                p.first_level_br.noise_std,
                rng,
            )
            ksk_limbs = self._gen_ksk(rng)
            bsk2, bsk2_sh = self._gen_bsk(
                self._pair_bits(self.inter_sk),
                self.z2_f,
                self.z2_ntt,
                c.f2,
                c.ntt2,
                c.gadget_br2,
                p.second_level_br.noise_std,
                rng,
            )
            trace_k, trace_k_sh = self._gen_trace_key(rng)
            # balanced-signed planes of BSK1/BSK2 for the fused Pallas kernels
            bsk1_bal = None
            if c.f1.bits <= 27:
                from tfhe_omr_tpu.ops.pallas_fused import (
                    make_bsk_balanced_paired,
                )

                bsk1_bal = jnp.asarray(
                    make_bsk_balanced_paired(np.asarray(bsk1), c.f1.q)
                )
            bsk2_bal = None
            trace_bal = None
            trace_auto = None
            if c.f2.bits == 50:
                from tfhe_omr_tpu.ops.pallas_fused import (
                    make_auto_compact,
                    make_bsk2_balanced,
                    make_trace_balanced,
                )

                bsk2_bal = jnp.asarray(
                    make_bsk2_balanced(np.asarray(bsk2), c.f2.q)
                )
                trace_bal = jnp.asarray(
                    make_trace_balanced(np.asarray(trace_k), c.f2.q)
                )
                trace_auto = jnp.asarray(make_auto_compact(c.trace_autos, p.n2))
        return to_accelerator(DetectionKey(
            bsk1=bsk1,
            bsk1_sh=bsk1_sh,
            ksk_limbs=ksk_limbs,
            bsk2=bsk2,
            bsk2_sh=bsk2_sh,
            trace_k=trace_k,
            trace_k_sh=trace_k_sh,
            bsk1_bal=bsk1_bal,
            bsk2_bal=bsk2_bal,
            trace_bal=trace_bal,
            trace_auto=trace_auto,
        ))

    def _gen_bsk(self, lwe_sk, z_f, z_ntt, field, ntt, gadget, noise_std, rng):
        """RGSW encryptions of each LWE secret bit under the ring key.

        Counterpart of ``BlindRotationKey::generate``
        (``secret.rs:124-131,149-156``), with the pairwise (BMMP16) layout:
        for each secret-bit pair (s0, s1) THREE messages are encrypted —
        m10 = s0(1-s1), m01 = s1(1-s0), m11 = s0*s1 — so one CMUX step
        handles two LWE coefficients with a single decomposition+NTT:

          X^(a0 s0 + a1 s1) = 1 + (X^a0 - 1) m10 + (X^a1 - 1) m01
                                + (X^(a0+a1) - 1) m11.

        The "lwe_sk" passed here is therefore the derived 3-message vector
        (length 3*n/2) built by ``_pair_bits``. RGSW(m) components:
        c=0 rows encrypt -h_j * z * m (paired with a-part digits),
        c=1 rows encrypt  h_j * m      (paired with b-part digits).
        Output layout (n, N, d, c, o) for the detector MAC.
        """
        n = len(lwe_sk)
        big_n = ntt.n
        d = gadget.d
        q = field.q
        h = gadget.gadget_values()  # (d,)
        s = np.asarray(lwe_sk, dtype=np.int64)  # values in {0,1}

        mu = np.zeros((n, 2, d, big_n), dtype=np.int64)
        hs = np.mod(h[None, :] * s[:, None], q)  # (n, d)
        # c=0: mu = (-h_j s_i) * z   (poly)
        neg_hs = np.mod(-hs, q)
        mu_c0 = np.asarray(
            field.mul(jnp.asarray(neg_hs)[:, :, None], jnp.asarray(z_f)[None, None, :])
        )
        mu[:, 0, :, :] = mu_c0
        # c=1: mu = h_j s_i (constant coefficient only)
        mu[:, 1, :, 0] = hs

        a, b = _rlwe_encrypt_ntt(field, ntt, z_ntt, jnp.asarray(mu), noise_std, rng)
        # (n, c, d, N, o) -> (n, N, d, c, o)
        key = jnp.stack([a, b], axis=-1).transpose(0, 3, 2, 1, 4)
        key_np = np.asarray(key)
        sd = field.storage_dtype
        return (
            jnp.asarray(key_np, dtype=sd),
            jnp.asarray(field.shoup(key_np), dtype=sd),
        )

    @staticmethod
    def _pair_bits(sk: np.ndarray) -> np.ndarray:
        """(n,) binary secret -> (3*n/2,) pair messages [m10, m01, m11]."""
        assert len(sk) % 2 == 0
        s0 = sk[0::2]
        s1 = sk[1::2]
        return np.stack(
            [s0 * (1 - s1), s1 * (1 - s0), s0 * s1], axis=1
        ).reshape(-1)

    def _gen_ksk(self, rng):
        """LWE key switch z1 (as 1024-dim LWE secret) -> s2, binary digits.

        Counterpart of ``NonPowOf2LweKeySwitchingKey::generate``
        (``secret.rs:133-147``): input secret is the RLWE key z1 reinterpreted
        for constant-coefficient extraction, i.e. exactly the coefficient
        vector of z1 under this framework's extraction convention
        (see OmrContext.clue_extract_tables docstring).
        Output: int8 limb planes of the combined (in*digits, out+1) matrix
        whose last column is the b-row, ready for MXU int8 matmuls.
        """
        c = self.ctx
        p = self.params
        ks = p.first_level_ks
        f = c.f1
        q = f.q
        n_in, n_out, digits = ks.in_dimension, ks.out_dimension, ks.digits
        assert ks.log_basis == 1, "key switch uses binary digits"
        s_in = np.mod(self.z1, q).astype(np.int64)  # (n_in,)
        s_out = np.asarray(self.inter_sk, dtype=np.int64)  # (n_out,)

        a = rng.integers(0, q, size=(n_in, digits, n_out), dtype=np.int64)
        e = f.gaussian(rng, ks.noise_std, (n_in, digits))
        h = (np.int64(1) << np.arange(digits, dtype=np.int64)) % q
        # b[i,j] = <a[i,j], s2> + e + h_j * s_in[i]
        asum = np.mod(a.reshape(-1, n_out) @ s_out, q).reshape(n_in, digits)
        b = np.mod(asum + e + np.mod(h[None, :] * s_in[:, None], q), q)
        # DIGIT-MAJOR row order (j*n_in + i), matching the key switch's
        # cheap (B, digits, n_in) bit-expansion layout
        mat = np.concatenate(
            [
                a.transpose(1, 0, 2).reshape(digits * n_in, n_out),
                b.T.reshape(digits * n_in, 1),
            ],
            axis=1,
        )
        limbs = -(-f.bits // 7)
        planes = np.stack(
            [((mat >> (7 * k)) & 127).astype(np.int8) for k in range(limbs)]
        )
        return jnp.asarray(planes)

    def _gen_trace_key(self, rng):
        """Automorphism key-switch keys for EvalTr (``secret.rs:158-165``).

        For each round's Galois element g: gadget RLWE encryptions of
        h_j * sigma_g(z2) under z2. Layout (rounds, N, d, o).
        """
        c = self.ctx
        f = c.f2
        ntt = c.ntt2
        gadget = c.gadget_trace
        q = f.q
        noise_std = self.params.trace.noise_std
        h = gadget.gadget_values()
        d = gadget.d
        n = self.params.n2

        mus = []
        for g, gidx, gsign in c.trace_autos:
            # sigma_g(z2) via the same static gather convention as the kernel
            sig_z = np.mod(gsign * self.z2_f[gidx], q).astype(np.int64)
            mus.append(
                np.asarray(
                    f.mul(jnp.asarray(h)[:, None], jnp.asarray(sig_z)[None, :])
                )
            )
        mu = np.stack(mus)  # (rounds, d, N)
        a, b = _rlwe_encrypt_ntt(f, ntt, self.z2_ntt, jnp.asarray(mu), noise_std, rng)
        key = jnp.stack([a, b], axis=-1).transpose(0, 2, 1, 3)  # (rounds, N, d, o)
        key_np = np.asarray(key)
        return jnp.asarray(key_np), jnp.asarray(f.shoup(key_np))

    # ------------------------------------------------------------ factories
    def generate_sender(self):
        from tfhe_omr_tpu.core.sender import Sender

        return Sender(self.generate_clue_key(), self.params)

    def generate_detector(self):
        from tfhe_omr_tpu.core.detector import Detector

        return Detector(self.generate_detection_key(), self.ctx)

    def generate_retriever(self, all_payloads_count: int, pertinent_count: int):
        from tfhe_omr_tpu.core.params import RetrievalParams
        from tfhe_omr_tpu.core.retriever import Retriever

        rp = RetrievalParams.for_params(
            self.params, all_payloads_count, pertinent_count
        )
        return Retriever(rp, self.ctx, self.z2_ntt)

    # ---------------------------------------------------------- decryption
    def size_bytes(self) -> int:
        """Secret material byte count (counterpart of the ``Size`` impl,
        reference ``key_gen/secret.rs:279-289``: clue + z1 + s2 + z2)."""
        p = self.params
        return (
            p.clue_params.dimension * 2
            + p.n1 * 4
            + p.intermediate_lwe.dimension * 2
            + p.n2 * 8
        )

    def z2_size(self) -> int:
        """z2 key size in bytes (``secret.rs`` ``z2_size``)."""
        return self.params.n2 * 8

    def decrypt_clue(self, a_vec: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Decrypt extracted clue LWE ciphertext(s) to Z_t (tests only)."""
        p = self.params.clue_params
        q0, t = p.cipher_modulus, p.plain_modulus
        phase = np.mod(b - a_vec @ self.clue_sk, q0)
        return np.mod((phase * t * 2 + q0) // (2 * q0), t)

    def decrypt_rlwe2_ntt(self, ct) -> np.ndarray:
        """Decrypt an NTT-domain second-level RLWE ct (B, 2, N2) -> plaintext
        coefficients mod q2 (message*Delta + noise). Tests/retriever helper."""
        c = self.ctx
        with host_math():
            ct = jnp.asarray(np.asarray(ct))
            z2 = jnp.asarray(np.asarray(self.z2_ntt))
            phase = c.f2.sub(ct[..., 1, :], c.f2.mul(ct[..., 0, :], z2))
            return np.asarray(c.ntt2.inv_last(phase))


def _negacyclic_matrix(poly: np.ndarray, q: int) -> np.ndarray:
    """M[i, k] = coefficient k of X^i * poly mod (X^n + 1, q)."""
    n = len(poly)
    m = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        m[i, i:] = poly[: n - i]
        if i:
            m[i, :i] = np.mod(-poly[n - i :], q)
    return m


class KeyGen:
    """Entry point (counterpart of ``KeyGen``, reference ``key_gen/mod.rs``)."""

    @staticmethod
    def generate_secret_key(
        params: OmrParameters, rng=None, ctx: OmrContext | None = None
    ) -> SecretKeyPack:
        return SecretKeyPack(params, rng, ctx)
