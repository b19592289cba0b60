"""Runtime context: fields, NTT tables, gadgets and LUTs for a parameter set.

Rough counterpart of the table/basis state the reference threads through
``OmrParameters`` accessors (``generate_first_level_ntt_table`` etc.,
reference ``omr_core/src/parameters/mod.rs:174-181,238-245``) and the LUT
precomputation in ``Detector::new`` (``detector.rs:82-110``).
"""

from __future__ import annotations

from functools import cached_property

import numpy as np
import jax.numpy as jnp

from tfhe_omr_tpu.core.lut import first_level_lut, second_level_lut
from tfhe_omr_tpu.core.params import OmrParameters
from tfhe_omr_tpu.ops.decompose import SignedGadget
from tfhe_omr_tpu.ops.modmath import PrimeField
from tfhe_omr_tpu.ops.ntt import NegacyclicNtt
from tfhe_omr_tpu.ops.ntt_smallfield import SmallFieldNtt


def make_ntt(field: PrimeField, n: int):
    """Pick the fastest exact NTT implementation for the field width.

    Fields below 2^27 with a square-factorable ring use the fused Pallas
    digit-matmul kernel on TPU (with an identical-ordering jnp fallback off
    TPU); other small fields use the mixed-radix jnp path; wide fields use
    the radix-2 path.
    """
    import os

    if (
        field.bits <= 27
        and n >= 1024
        and n % 32 == 0
        and os.environ.get("TFHE_OMR_NO_PALLAS") != "1"
    ):
        from tfhe_omr_tpu.ops.pallas_ntt import PallasNtt

        return PallasNtt(field, n)
    if (
        field.bits == 50
        and n >= 1024
        and n % 32 == 0
        and os.environ.get("TFHE_OMR_NO_PALLAS") != "1"
    ):
        from tfhe_omr_tpu.ops.pallas_ntt import PallasNtt50

        return PallasNtt50(field, n)
    if 2 * field.bits + 4 <= 62 and n >= 32:
        return SmallFieldNtt(field, n)
    return NegacyclicNtt(field, n)


class OmrContext:
    """Derived (non-secret) state for one parameter set."""

    def __init__(self, params: OmrParameters):
        self.params = params
        self.f1 = PrimeField(params.q1)
        self.f2 = PrimeField(params.q2)

    @cached_property
    def ntt1(self):
        return make_ntt(self.f1, self.params.n1)

    @cached_property
    def ntt2(self):
        return make_ntt(self.f2, self.params.n2)

    @cached_property
    def gadget_br1(self) -> SignedGadget:
        br = self.params.first_level_br
        return SignedGadget(self.f1, br.log_basis, br.basis_len)

    @cached_property
    def gadget_br2(self) -> SignedGadget:
        br = self.params.second_level_br
        return SignedGadget(self.f2, br.log_basis, br.basis_len)

    @cached_property
    def gadget_ks(self) -> SignedGadget:
        ks = self.params.first_level_ks
        return SignedGadget(self.f1, ks.log_basis, ks.digits)

    @cached_property
    def gadget_trace(self) -> SignedGadget:
        tr = self.params.trace
        return SignedGadget(self.f2, tr.log_basis, tr.basis_len)

    # ------------------------------------------------------------------ LUTs
    @cached_property
    def lut1_ext(self) -> np.ndarray:
        """[LUT1, -LUT1] length 2*N1 — X^-b init by small-table lookup."""
        lut = first_level_lut(self.params)
        return np.concatenate([lut, (self.f1.q - lut) % self.f1.q])

    @cached_property
    def lut2_ext(self) -> np.ndarray:
        lut = second_level_lut(self.params)
        return np.concatenate([lut, (self.f2.q - lut) % self.f2.q])

    # -------------------------------------------------- clue sample extraction
    @cached_property
    def clue_extract_tables(self):
        """Static index/sign tables for ``CmLweCiphertext::extract_all``.

        Extraction at coefficient position i of a ring ciphertext (a(X), b(X))
        of dimension n yields the LWE ciphertext with
        ``a_vec[j] = a[i-j]`` for j <= i and ``-a[n+i-j]`` for j > i
        (counterpart of ``detector.rs:505-531`` / primus-fhe extract_all).
        Returns (idx, neg) of shape (clue_count, n).
        """
        n = self.params.clue_params.dimension
        c = self.params.clue_count
        idx = np.zeros((c, n), dtype=np.int64)
        neg = np.zeros((c, n), dtype=np.int64)
        for i in range(c):
            for j in range(n):
                if j <= i:
                    idx[i, j] = i - j
                    neg[i, j] = 0
                else:
                    idx[i, j] = n + i - j
                    neg[i, j] = 1
        return idx, neg

    # ------------------------------------------------------ trace automorphisms
    @cached_property
    def trace_autos(self):
        """Galois elements and gather permutations for the trace rounds.

        EvalTr over log2(N) rounds with g_r = N / 2**r + 1
        (counterpart of primus-fhe ``TraceKey::trace``,
        used at reference ``detector.rs:626-639``). For each round,
        ``sigma_g(c)[k] = gsign[k] * c[gidx[k]]`` with static tables.
        """
        n = self.params.n2
        autos = []
        r = n
        while r >= 2:
            g = r + 1
            # forward map: coeff j -> position (g*j mod 2n) with negacyclic sign
            dest = np.zeros(n, dtype=np.int64)
            sgn = np.zeros(n, dtype=np.int64)
            for j in range(n):
                p = (g * j) % (2 * n)
                if p < n:
                    dest[j] = p
                    sgn[j] = 1
                else:
                    dest[j] = p - n
                    sgn[j] = -1
            gidx = np.zeros(n, dtype=np.int64)
            gsign = np.zeros(n, dtype=np.int64)
            gidx[dest] = np.arange(n)
            gsign[dest] = sgn
            autos.append((g, gidx, gsign))
            r //= 2
        return autos
