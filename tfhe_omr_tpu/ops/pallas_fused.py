"""Fully-fused Pallas blind rotation, v2 (27-bit field, first level).

One kernel runs the ENTIRE CMUX chain (counterpart of primus-fhe's
``BlindRotationKey::blind_rotate`` hot loop, reference
``omr_core/src/detector.rs:553-557``): grid = (batch_tiles, n_steps), the
accumulator lives in VMEM scratch across the sequential step dimension, and
per-step HBM traffic is only the streamed step constants (BSK balanced
planes 128 KB, mono power-table slices 48 KB).

Differences from the retired v1 kernel (removed; lessons recorded in
docs/PERF_NOTES.md), which compiled but spilled 170-214 MB of intermediates:

* the RGSW MAC uses **balanced signed two-plane products** (13/14-bit limbs
  in int32) instead of 4x4 unsigned 7-bit plane products — 4x fewer VPU
  multiplies and 3 small accumulator groups instead of 7;
* the monomial multiplier ``NTT(X^a) - 1 = psi^(a*o_k) - 1`` is two static
  one-hot int8 MXU dots over streamed power-table slices (see
  ``ops.bootstrap.make_mono_powers``) instead of an 11-deep square-multiply
  ladder of (N, B) modmuls;
* the gadget decomposition computes the Solinas correction **exactly** in
  int32 limbs, so the kernel is bit-identical to the XLA path
  (``SignedGadget.decompose`` + ``make_blind_rotate``);
* large cross-phase arrays (digits, NTT outputs, INTT staging) live in
  explicit VMEM scratch written block-by-block, never assembled with
  ``jnp.stack``/``concatenate`` across a loop.

Layouts (all Mosaic-friendly: minor dims multiples of 128 where they carry
lanes; BSK minor dim 32 rides VMEM tile padding only, HBM stays compact):

* acc in/out: (N, 2, Bt) int32 — columns (o, b);
* BSK: (n_steps, N, 32) int32, column index ((p*d + j)*2 + c)*2 + o with
  p in {lo, hi} the balanced planes; sliced as (N, 1) columns in the MAC;
* P1/P2 mono tables: (n_lo, n_steps, B), streamed (n_lo, 1, Bt).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_omr_tpu.ops.modmath import PrimeField

DIGIT_BITS = 7
DIGIT_MASK = 127


def make_bsk_balanced(bsk_int: np.ndarray, q: int) -> np.ndarray:
    """Host prep: (n_rows, N, d, 2, 2) int BSK in [0, q) with q < 2**27
    -> (n_rows, N, 2*d*2*2) int32 balanced planes.

    k' = k - q*(k > q/2) in (-q/2, q/2]; hi = (k' + 2**13) >> 14,
    lo = k' - (hi << 14); |lo| <= 2**13, |hi| <= 2**12. Column layout
    ((p*d + j)*2 + c)*2 + o for p in {0: lo, 1: hi}.
    """
    n_rows, n, d, c2, o2 = bsk_int.shape
    kb = bsk_int.astype(np.int64)
    kb = kb - q * (kb > q // 2)
    hi = (kb + (1 << 13)) >> 14
    lo = kb - (hi << 14)
    planes = np.stack([lo, hi], axis=2)  # (n_rows, N, 2, d, 2, 2)
    return (
        planes.reshape(n_rows, n, 2 * d * c2 * o2).astype(np.int32)
    )


def make_bsk_balanced_paired(bsk_int: np.ndarray, q: int) -> np.ndarray:
    """Host prep for the PAIRED first-level kernel: (3*n_steps, N, d, 2, 2)
    int BSK in [0, q), q < 2**27 -> (n_steps, N, 128) int16 balanced planes.

    Same balanced split as :func:`make_bsk_balanced`; column layout
    ``t*32 + ((p*d + j)*2 + c)*2 + o`` for RGSW row t in {m10, m01, m11},
    96 used columns zero-padded to 128 (int16 VMEM lane tile).
    """
    rows, n, d, c2, o2 = bsk_int.shape
    assert rows % 3 == 0
    n_steps = rows // 3
    kb = bsk_int.astype(np.int64)
    kb = kb - q * (kb > q // 2)
    hi = (kb + (1 << 13)) >> 14
    lo = kb - (hi << 14)
    planes = np.stack([lo, hi], axis=2)  # (3*n_steps, N, 2, d, 2, 2)
    tstr = 2 * d * c2 * o2  # per-RGSW-row column stride
    planes = planes.reshape(n_steps, 3, n, tstr)
    planes = planes.transpose(0, 2, 1, 3).reshape(n_steps, n, 3 * tstr)
    width = -(-(3 * tstr) // 128) * 128
    out = np.zeros((n_steps, n, width), dtype=np.int16)
    out[..., : 3 * tstr] = planes
    return out


def make_bsk_balanced_paired_jnp(kst, q: int):
    """In-graph (jnp) twin of :func:`make_bsk_balanced_paired` — same values,
    runs on the keygen device program instead of host numpy."""
    rows, n, d, c2, o2 = kst.shape
    assert rows % 3 == 0
    n_steps = rows // 3
    kb = kst.astype(jnp.int64)
    kb = kb - q * (kb > q // 2)
    hi = (kb + (1 << 13)) >> 14
    lo = kb - (hi << 14)
    planes = jnp.stack([lo, hi], axis=2)  # (3*n_steps, N, 2, d, 2, 2)
    tstr = 2 * d * c2 * o2
    planes = planes.reshape(n_steps, 3, n, tstr)
    planes = planes.transpose(0, 2, 1, 3).reshape(n_steps, n, 3 * tstr)
    width = -(-(3 * tstr) // 128) * 128
    out = jnp.zeros((n_steps, n, width), dtype=jnp.int16)
    return out.at[..., : 3 * tstr].set(planes.astype(jnp.int16))


def make_bsk2_balanced_jnp(kst, q: int):
    """In-graph twin of :func:`make_bsk2_balanced` (same values)."""
    rows, n, d, c2, o2 = kst.shape
    assert rows % 3 == 0
    n_steps = rows // 3
    kb = kst.astype(jnp.int64)
    kb = kb - q * (kb > q // 2)
    planes = []
    r = kb
    for _ in range(3):
        v = ((r + (1 << 12)) & 8191) - (1 << 12)
        planes.append(v)
        r = (r - v) >> 13
    planes.append(r)
    p = jnp.stack(planes, axis=0)  # (4, 3*n_steps, N, d, 2, 2)
    p = p.reshape(4, n_steps, 3, n, d, 2, 2)
    p = p.transpose(1, 4, 5, 3, 0, 2, 6).reshape(n_steps, 2 * d, n, 24)
    out = jnp.zeros((n_steps, 2 * d, n, 32), dtype=jnp.int16)
    return out.at[..., :24].set(p.astype(jnp.int16))


def make_trace_balanced_jnp(tk, q: int):
    """In-graph twin of :func:`make_trace_balanced` (same values)."""
    rounds, n, d, o2 = tk.shape
    kb = tk.astype(jnp.int64)
    kb = kb - q * (kb > q // 2)
    planes = []
    r = kb
    for _ in range(3):
        v = ((r + (1 << 12)) & 8191) - (1 << 12)
        planes.append(v)
        r = (r - v) >> 13
    planes.append(r)
    p = jnp.stack(planes, axis=0)  # (4, rounds, N, d, 2)
    p = p.transpose(1, 3, 2, 0, 4).reshape(rounds, d, n, 8)
    d_pad = d + (d % 2)
    out = jnp.zeros((rounds, d_pad, n, 16), dtype=jnp.int16)
    return out.at[:, :d, :, :8].set(p.astype(jnp.int16))


class FusedBlindRotateL1:
    """blind_rotate(acc, p1, p2, bsk_bal) as one Pallas kernel (q < 2**27).

    ``ntt`` must be a PallasNtt (its digit-plane weight matrices and
    mixed-radix plan are reused verbatim, so values and orderings are
    bit-identical to the XLA path built on the same instance).
    """

    def __init__(
        self,
        field: PrimeField,
        ntt,
        d: int,
        log_b: int,
        tile: int = 128,
        interpret: bool = False,
        skip: frozenset = frozenset(),
        batched_dot: bool = False,
        rows: int = 1,
        single_dot: bool = False,
        mac_rc: int | None = None,
    ):
        assert field.bits <= 27
        #: row-chunked register-blocked MAC (same mechanics as
        #: FusedBlindRotateL2.mac_rc) — measured SLOWER here (1.69-1.75 vs
        #: 1.58 ms/msg at B=896): the L1 MAC's 3-group 14-bit-limb DAG is
        #: small enough that Mosaic already schedules the unrolled form
        #: register-resident, and the explicit chunk loop + mono staging
        #: only add overhead. Default OFF (TFHE_OMR_MAC_RC1 to enable).
        if mac_rc is None:
            import os as _os

            mac_rc = int(_os.environ.get("TFHE_OMR_MAC_RC1", "0"))
        while mac_rc > 8 and ntt.n % mac_rc:
            mac_rc //= 2
        if mac_rc and ntt.n % mac_rc:
            mac_rc = 0
        self.mac_rc = mac_rc
        #: mixed NTT mode (default ON): forward as the single (L*N, N)
        #: dot, inverse via the two-level factorisation — the single-dot
        #: INVERSE pays 4 full-range planes x N-deep dots + an 11-group
        #: radix-7 Horner; the two-level inverse halves that VPU fold
        #: work. Measured 1.577 -> 1.451 ms/msg for the full L1 pass at
        #: B=896 (benches/fused_l1.py, r5). TFHE_OMR_L1_INTT2=0 restores
        #: the pure single-dot inverse.
        import os as _os2

        self.intt_two_level = (
            _os2.environ.get("TFHE_OMR_L1_INTT2", "1") == "1"
        )
        assert rows in (1, 3)
        #: run the forward/inverse NTTs as ONE full (L*N, N) int8 MXU dot
        #: (plus Horner) instead of the two-level factorisation — trades
        #: N/r times more (cheap, underutilised) MXU MACs for the mid-level
        #: plane extraction + Horner VPU work
        self.single_dot = single_dot
        if single_dot:
            assert hasattr(ntt, "_wf_full")
        #: 1 = one RGSW row per step; 3 = pairwise (BMMP) CMUX — each step
        #: handles TWO LWE coefficients with rows [m10, m01, m11] and
        #: rotations [a0, a1, a0+a1] sharing one decomposition + forward NTT
        self.rows = rows
        self.skip = skip  # timing ablations: {"dec","fwd","mono","mac","intt"}
        #: lower the per-k0 level-1 NTT dots as ONE batched dot_general over
        #: the k0 axis instead of r unrolled small matmuls
        self.batched_dot = batched_dot
        self.field = field
        self.ntt = ntt
        self.d = d
        self.log_b = log_b
        self.tile = tile
        self.interpret = interpret
        self.n = ntt.n
        self.r = ntt.r
        self.c = ntt.c
        self.levels = ntt.levels  # unsigned 7-bit planes per full-range value
        two_n = 2 * ntt.n
        self.log2n = two_n.bit_length() - 1
        lo_bits = self.log2n // 2
        self.n_lo = 1 << lo_bits
        self.n_hi = two_n >> lo_bits
        orders_np = np.asarray(ntt.orders)
        oh_lo = np.zeros((self.n, self.n_lo), dtype=np.int8)
        oh_lo[np.arange(self.n), orders_np % self.n_lo] = 1
        oh_hi = np.zeros((self.n, self.n_hi), dtype=np.int8)
        oh_hi[np.arange(self.n), orders_np >> lo_bits] = 1
        # HOST numpy (device-array closures stall tracing on tunneled
        # backends — docs/PERF_NOTES.md round-3); device copies ride args
        self._oh_lo = oh_lo
        self._oh_hi = oh_hi
        self._call = self._make_call()

    # --------------------------------------------------- in-kernel arithmetic
    def _fold(self, v):
        f = self.field
        return (v >> f.bits) * jnp.int32(f.eps) + (
            v & jnp.int32((1 << f.bits) - 1)
        )

    def _norm(self, v):
        q = jnp.int32(self.field.q)
        v = v + q * (v < 0)
        v = v - q * (v >= q)
        return v - q * (v >= q)

    def _horner7(self, groups, pair: bool = True):
        """Recombine 2**7-spaced int32 groups (possibly signed) mod q.

        With ``pair`` (valid when groups stay below 2**23, e.g. 32-deep
        int8 dots), adjacent groups are pre-merged (``g_lo + 2**7 g_hi``)
        and the fold chain runs at radix 2**14 — half the mod-q folds.
        """
        f = self.field
        qbits = f.bits
        if pair:
            paired = [
                groups[s] + (groups[s + 1] << DIGIT_BITS)
                if s + 1 < len(groups)
                else groups[s]
                for s in range(0, len(groups), 2)
            ]
            radix = 2 * DIGIT_BITS
        else:
            paired = list(groups)
            radix = DIGIT_BITS
        acc = paired[-1]
        for s in range(len(paired) - 2, -1, -1):
            acc = self._norm(self._fold(acc))
            hi = acc >> (qbits - radix)
            lo = acc & jnp.int32((1 << (qbits - radix)) - 1)
            acc = hi * jnp.int32(f.eps) + (lo << radix) + paired[s]
            acc = self._fold(acc)
        return self._norm(self._fold(acc))

    def _balance(self, x):
        """x in [0, q) -> (lo, hi) with x = lo + 2**14 hi (mod nothing),
        |lo| <= 2**13, |hi| <= 2**12."""
        q = jnp.int32(self.field.q)
        xb = x - q * (x > (q >> 1))
        hi = (xb + jnp.int32(1 << 13)) >> 14
        lo = xb - (hi << 14)
        return lo, hi

    def _mul_balanced(self, a, b):
        """Elementwise a*b mod q for a, b in [0, q), via balanced limbs."""
        a0, a1 = self._balance(a)
        b0, b1 = self._balance(b)
        g0 = a0 * b0
        g1 = a0 * b1 + a1 * b0
        g2 = a1 * b1
        return self._recombine14(g0, g1, g2)

    def _recombine14(self, g0, g1, g2):
        """g0 + 2**14 g1 + 2**28 g2 mod q, |g_i| < 2**30, int32-only."""
        eps = jnp.int32(self.field.eps)
        acc = self._fold(g2)
        for g in (g1, g0):
            hi = acc >> 13
            lo = acc & jnp.int32((1 << 13) - 1)
            acc = hi * eps + (lo << 14) + g
            acc = self._fold(acc)
        return self._norm(self._fold(acc))

    def _planes7(self, x):
        """Unsigned 7-bit int8 planes of x in [0, q)."""
        return [
            ((x >> jnp.int32(DIGIT_BITS * a)) & jnp.int32(DIGIT_MASK)).astype(
                jnp.int8
            )
            for a in range(self.levels)
        ]

    def _level_dot(self, x_planes, w_planes, out_rows, pair: bool = True):
        """Digit-matmul NTT level: x_planes list of int8 (rows, X).

        ``pair`` must be False when the contraction is deep enough that
        groups can exceed 2**23 (the 1024-deep full-matrix dots with
        full-range inputs)."""
        L = self.levels
        in_levels = len(x_planes)
        groups = [None] * (in_levels + L - 1)
        for a in range(in_levels):
            p = jax.lax.dot_general(
                w_planes,
                x_planes[a],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for b in range(L):
                s = a + b
                blk = p[b * out_rows : (b + 1) * out_rows]
                groups[s] = blk if groups[s] is None else groups[s] + blk
        return self._horner7(groups, pair)

    def _level1_batched(self, x3, w1k):
        """Per-k0 twiddle-folded level as ONE batched dot_general.

        x3 (r, c, M) int32 in [0, q); w1k (r, L*c, c) int8.
        Returns (r, c, M) int32 in [0, q)."""
        L = self.levels
        c = self.c
        groups = [None] * (2 * L - 1)
        for a in range(L):
            pa = (
                (x3 >> jnp.int32(DIGIT_BITS * a)) & jnp.int32(DIGIT_MASK)
            ).astype(jnp.int8)
            p = jax.lax.dot_general(
                w1k,
                pa,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (r, L*c, M)
            for b in range(L):
                s = a + b
                blk = p[:, b * c : (b + 1) * c, :]
                groups[s] = blk if groups[s] is None else groups[s] + blk
        return self._horner7(groups)

    def _decompose_digits(self, x):
        """Exact balanced signed base-2**log_b digits of x in [0, q).

        u = round(x * B**d / q) with the Solinas correction computed
        EXACTLY in int32 limbs (bit-identical to SignedGadget.decompose).
        """
        f = self.field
        d, log_b = self.d, self.log_b
        shift = f.bits - d * log_b
        eps = jnp.int32(f.eps)
        x0 = x & jnp.int32((1 << 16) - 1)
        x1 = x >> 16
        corr = (x1 * eps + ((x0 * eps) >> 16)) >> (f.bits - 16)
        u = (x + corr + jnp.int32(1 << (shift - 1))) >> shift
        bmask = jnp.int32((1 << log_b) - 1)
        half_b = jnp.int32(1 << (log_b - 1))
        digs = []
        r = u
        for _ in range(d):
            dj = r & bmask
            r = r >> log_b
            carry = (dj >= half_b).astype(jnp.int32)
            digs.append(dj - (carry << log_b))
            r = r + carry
        return digs

    def _onehot_mono(self, oh, tab):
        """tab (n_e, Bt) int32 in [0, q) -> exact selected values (N, Bt)."""
        L = self.levels
        n_e, bt = tab.shape
        planes = [
            ((tab >> jnp.int32(DIGIT_BITS * a)) & jnp.int32(DIGIT_MASK)).astype(
                jnp.int8
            )
            for a in range(L)
        ]
        x = jnp.concatenate(planes, axis=1)  # (n_e, L*Bt)
        sel = jax.lax.dot_general(
            oh,
            x,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (N, L*Bt)
        out = sel[:, 0:bt]
        for a in range(1, L):
            out = out + (sel[:, a * bt : (a + 1) * bt] << (DIGIT_BITS * a))
        return out

    # --------------------------------------------------------------- kernel
    @property
    def host_tables(self):
        """(w0f, w1f, w0i, w1i, oh_lo, oh_hi) as host numpy — device_put
        once and pass via ``__call__(..., tables=...)`` in hot programs."""
        pn = self.ntt
        if self.single_dot:
            w0f, w1f = pn._wf_full, pn._w1_f
            if self.intt_two_level:
                w0i, w1i = pn._w0_i, pn._w1_i
            else:
                w0i, w1i = pn._wi_full, pn._w1_i
        else:
            w0f, w1f = pn._w0_f, pn._w1_f
            w0i, w1i = pn._w0_i, pn._w1_i
        return (w0f, w1f, w0i, w1i, self._oh_lo, self._oh_hi)

    def _make_call(self):
        n, r, c, d = self.n, self.r, self.c, self.d
        shapes = [a.shape for a in self.host_tables]
        jc = 2 * d  # digit columns per batch element
        lvl0_chunk = 8192
        full_chunk = 512  # single-dot column chunk (bounds the (L*N, X) temp)

        def kernel(
            w0f_ref, w1f_ref, w0i_ref, w1i_ref, ohlo_ref, ohhi_ref,
            acc_ref, xp_ref, bsk_ref,
            o_ref,
            acc_s, dig_s, a_s, p_s, y_s, pgm_s,
        ):
            step = pl.program_id(1)
            n_steps = pl.num_programs(1)
            bt = acc_ref.shape[2]
            assert acc_ref.shape[0] == 2
            q32 = jnp.int32(self.field.q)

            @pl.when(step == 0)
            def _():
                acc_s[:] = acc_ref[:]

            skip = self.skip
            # ---- 1. gadget decomposition -> dig_s (N, jc*Bt), cols (j,c,b)
            if "dec" not in skip:
                for cc in range(2):
                    digs = self._decompose_digits(acc_s[cc])
                    for j in range(d):
                        dig_s[:, (j * 2 + cc) * bt : (j * 2 + cc + 1) * bt] = (
                            digs[j]
                        )

            # ---- 2. forward NTT of signed digits -> dn in dig_s (reused)
            # (single-dot mode: dn lands in a_s viewed as (N, jc*Bt))
            if "fwd" not in skip and self.single_dot:
                xw = jc * bt
                for s0 in range(0, xw, full_chunk):
                    e0 = min(xw, s0 + full_chunk)
                    a_s[:, s0:e0] = self._level_dot(
                        [dig_s[:, s0:e0].astype(jnp.int8)], w0f_ref[:], n
                    )
            elif "fwd" not in skip:
                # level 0: single signed int8 data plane
                xv = dig_s[:].reshape(r, c * jc * bt)
                for s0 in range(0, c * jc * bt, lvl0_chunk):
                    e0 = min(c * jc * bt, s0 + lvl0_chunk)
                    a_s[:, s0:e0] = self._level_dot(
                        [xv[:, s0:e0].astype(jnp.int8)], w0f_ref[:], r
                    )
                # level 1: per-k0 twiddle-folded matrices, full-range input;
                # an in-kernel fori_loop (an unrolled body this size spills
                # vregs and compiles for minutes)
                if self.batched_dot:
                    av = a_s[:].reshape(r, c, jc * bt)
                    dig_s[:] = self._level1_batched(av, w1f_ref[:]).reshape(
                        n, jc * bt
                    )
                else:

                    def fwd_k0(k0, _):
                        k0 = k0.astype(jnp.int32)
                        avk = a_s[pl.ds(k0, 1), :].reshape(c, jc * bt)
                        w1k = w1f_ref[pl.ds(k0, 1), :, :].reshape(
                            self.levels * c, c
                        )
                        dig_s[pl.ds(k0 * jnp.int32(c), c), :] = (
                            self._level_dot(self._planes7(avk), w1k, c)
                        )
                        return jnp.int32(0)

                    jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(r), fwd_k0, jnp.int32(0)
                    )

            # ---- 3+4. per-RGSW-row mono + MAC + mono multiply -> p_s
            # (N, 2*Bt), cols (o, b); paired mode accumulates the three
            # row contributions mod q (matches the XLA paired path's
            # mod_sum over rows)
            if "mac" not in skip:
                if not self.mac_rc:  # legacy reads the full planes up front
                    dn = a_s[:] if self.single_dot else dig_s[:]
                    kb = bsk_ref[0]  # rows=1: (N,32) i32; rows=3: (N,128) i16
                if "mono" not in skip:
                    # power tables P1[t] = x^t (t < n_lo) and
                    # P2[u] = (x^n_lo)^u (u < n_hi) from x = psi^a, built
                    # IN-KERNEL by log-depth doubling (exact balanced-limb
                    # muls). Materializing these 96 planes in HBM outside
                    # the kernel cost 0.27 ms/msg — ~25x their op floor
                    # (PERF_NOTES round-3 mono-ladder finding).
                    rb = self.rows * bt
                    xf = xp_ref[0].reshape(1, rb)
                    one_r = jnp.ones((1, rb), jnp.int32)
                    blk1 = jnp.concatenate([one_r, xf], axis=0)
                    xj = self._mul_balanced(xf, xf)  # x^2
                    while blk1.shape[0] < self.n_lo:
                        blk1 = jnp.concatenate(
                            [blk1, self._mul_balanced(blk1, xj)], axis=0
                        )
                        xj = self._mul_balanced(xj, xj)
                    # loop invariant leaves xj == x^{n_lo}
                    blk2 = jnp.concatenate([one_r, xj], axis=0)
                    yj = self._mul_balanced(xj, xj)
                    while blk2.shape[0] < self.n_hi:
                        blk2 = jnp.concatenate(
                            [blk2, self._mul_balanced(blk2, yj)], axis=0
                        )
                        yj = self._mul_balanced(yj, yj)
                def make_mono(t):
                    if "mono" not in skip:
                        p1t = blk1[:, t * bt : (t + 1) * bt]
                        p2t = blk2[:, t * bt : (t + 1) * bt]
                        sel1 = self._onehot_mono(ohlo_ref[:], p1t)
                        sel2 = self._onehot_mono(ohhi_ref[:], p2t)
                        mono = self._mul_balanced(sel1, sel2) - 1
                        return mono + q32 * (mono < 0)
                    xrow = xp_ref[0, t] if self.rows == 3 else xp_ref[0]
                    return xrow[None, :] + jnp.zeros((n, bt), jnp.int32)

                if self.mac_rc:
                    # v2: stage balanced mono planes, then row-chunk the
                    # MAC with all accumulators register-resident (see
                    # __init__ note)
                    for t in range(self.rows):
                        m_lo, m_hi = self._balance(make_mono(t))
                        pgm_s[2 * t] = m_lo
                        pgm_s[2 * t + 1] = m_hi
                    dn_ref = a_s if self.single_dot else dig_s
                    rc_sz = self.mac_rc
                    rows_n = self.rows

                    def mac_rc_body(rci, _):
                        row0 = rci.astype(jnp.int32) * jnp.int32(rc_sz)
                        rsl = pl.ds(row0, rc_sz)
                        # ONE balance per digit column, hoisted out of the
                        # RGSW-row loop (legacy recomputes it per row)
                        bal = {}
                        for j in range(d):
                            for cc in range(2):
                                col = (j * 2 + cc) * bt
                                bal[(j, cc)] = self._balance(
                                    dn_ref[rsl, col : col + bt]
                                )
                        pgacc = [[None] * 3 for _ in range(2)]
                        for t in range(rows_n):
                            g = [[None] * 3 for _ in range(2)]
                            for j in range(d):
                                for cc in range(2):
                                    vl, vh = bal[(j, cc)]
                                    for o in range(2):
                                        base = (
                                            t * 8 * d + (j * 2 + cc) * 2 + o
                                        )
                                        hb = 4 * d + base
                                        k_lo = bsk_ref[
                                            0, rsl, base : base + 1
                                        ].astype(jnp.int32)
                                        k_hi = bsk_ref[
                                            0, rsl, hb : hb + 1
                                        ].astype(jnp.int32)
                                        t0_ = vl * k_lo
                                        t1_ = vl * k_hi + vh * k_lo
                                        t2_ = vh * k_hi
                                        if g[o][0] is None:
                                            g[o] = [t0_, t1_, t2_]
                                        else:
                                            g[o][0] = g[o][0] + t0_
                                            g[o][1] = g[o][1] + t1_
                                            g[o][2] = g[o][2] + t2_
                            m_lo = pgm_s[2 * t, rsl, :]
                            m_hi = pgm_s[2 * t + 1, rsl, :]
                            for o in range(2):
                                p = self._recombine14(*g[o])
                                p_lo, p_hi = self._balance(p)
                                pg = (
                                    p_lo * m_lo,
                                    p_lo * m_hi + p_hi * m_lo,
                                    p_hi * m_hi,
                                )
                                for s_ in range(3):
                                    pgacc[o][s_] = (
                                        pg[s_] if pgacc[o][s_] is None
                                        else pgacc[o][s_] + pg[s_]
                                    )
                        for o in range(2):
                            p_s[rsl, o * bt : (o + 1) * bt] = (
                                self._recombine14(*pgacc[o])
                            )
                        return jnp.int32(0)

                    jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(n // rc_sz), mac_rc_body,
                        jnp.int32(0),
                    )
                else:
                    for t in range(self.rows):
                        mono = make_mono(t)
                        m_lo, m_hi = self._balance(mono)
                        g = [
                            [
                                jnp.zeros((n, bt), dtype=jnp.int32)
                                for _ in range(3)
                            ]
                            for _ in range(2)
                        ]
                        for j in range(d):
                            for cc in range(2):
                                col = (j * 2 + cc) * bt
                                # ONE balance per digit column, shared by
                                # both output components
                                vl, vh = self._balance(dn[:, col : col + bt])
                                for o in range(2):
                                    base = t * 8 * d + (j * 2 + cc) * 2 + o
                                    k_lo = kb[:, base : base + 1].astype(
                                        jnp.int32
                                    )
                                    hb = 4 * d + base  # hi-plane column
                                    k_hi = kb[:, hb : hb + 1].astype(
                                        jnp.int32
                                    )
                                    g[o][0] = g[o][0] + vl * k_lo
                                    g[o][1] = g[o][1] + vl * k_hi + vh * k_lo
                                    g[o][2] = g[o][2] + vh * k_hi
                        for o in range(2):
                            p = self._recombine14(*g[o])  # (N, Bt) in [0, q)
                            # multiply by mono (both balanced; exact) and
                            # accumulate the product GROUPS across RGSW rows
                            # (|group| < 2**27, <= 3 rows < 2**29): one
                            # final recombine per output instead of one
                            # per row
                            p_lo, p_hi = self._balance(p)
                            pg = (
                                p_lo * m_lo,
                                p_lo * m_hi + p_hi * m_lo,
                                p_hi * m_hi,
                            )
                            for s_ in range(3):
                                if t == 0:
                                    pgm_s[o, s_] = pg[s_]
                                else:
                                    pgm_s[o, s_] = pgm_s[o, s_] + pg[s_]
                    for o in range(2):
                        sl = slice(o * bt, (o + 1) * bt)
                        p_s[:, sl] = self._recombine14(
                            pgm_s[o, 0], pgm_s[o, 1], pgm_s[o, 2]
                        )

            # ---- 5. inverse NTT of p_s -> delta, accumulate into acc_s
            if "intt" not in skip:
                if self.single_dot and not self.intt_two_level:
                    # 1024-deep full-range dots: groups reach 2**26, so the
                    # Horner runs unpaired (radix 2**7)
                    z = self._level_dot(
                        self._planes7(p_s[:]), w0i_ref[:], n, pair=False
                    )
                elif self.batched_dot:
                    pv = p_s[:].reshape(r, c, 2 * bt)
                    y3 = self._level1_batched(pv, w1i_ref[:])
                    z = self._level_dot(
                        self._planes7(y3.reshape(r, c * 2 * bt)),
                        w0i_ref[:],
                        r,
                    )
                else:

                    def intt_k0(k0, _):
                        k0 = k0.astype(jnp.int32)
                        pvk = p_s[pl.ds(k0 * jnp.int32(c), c), :]
                        w1k = w1i_ref[pl.ds(k0, 1), :, :].reshape(
                            self.levels * c, c
                        )
                        y_s[pl.ds(k0, 1), :] = self._level_dot(
                            self._planes7(pvk), w1k, c
                        ).reshape(1, c * 2 * bt)
                        return jnp.int32(0)

                    jax.lax.fori_loop(jnp.int32(0), jnp.int32(r), intt_k0, jnp.int32(0))
                    z = self._level_dot(
                        self._planes7(y_s[:]), w0i_ref[:], r
                    )
                delta = z.reshape(n, 2, bt).transpose(1, 0, 2)
            else:
                delta = p_s[:].reshape(n, 2, bt).transpose(1, 0, 2)
            new_acc = acc_s[:] + delta
            new_acc = new_acc - q32 * (new_acc >= q32)
            acc_s[:] = new_acc

            @pl.when(step == n_steps - 1)
            def _():
                o_ref[:] = new_acc

        def call(acc, xpow, bsk_bal, tables):
            """acc (N, 2, B) int32; tables = (w0f, w1f, w0i, w1i, oh_lo,
            oh_hi) matching :attr:`host_tables` shapes.

            rows=1: xpow (n_steps, B) int32 — x = psi^a per step in [0, q).
            rows=3: xpow (n_steps, 3, B) int32, step-major rows
            [x^{a0}, x^{a1}, x^{a0+a1}]; bsk_bal (n_steps, N, 128) int16.
            -> (N, 2, B) int32. Power TABLES are built in-kernel."""
            w0f, w1f, w0i, w1i, oh_lo, oh_hi = tables
            n_, _, b = acc.shape
            acc = acc.transpose(1, 0, 2)  # (2, N, B)
            n_steps = bsk_bal.shape[0]
            tile = min(self.tile, b)
            assert b % tile == 0, (b, tile)
            i32 = jnp.int32
            grid = (b // tile, n_steps)
            const_spec = lambda arr: pl.BlockSpec(
                arr.shape,
                lambda i, s, _nd=arr.ndim: (i32(0),) * _nd,
                memory_space=pltpu.VMEM,
            )
            bw = bsk_bal.shape[-1]
            if self.rows == 3:
                xp_spec = pl.BlockSpec(
                    (1, 3, tile),
                    lambda i, s: (s.astype(i32), i32(0), i.astype(i32)),
                    memory_space=pltpu.VMEM,
                )
            else:
                xp_spec = pl.BlockSpec(
                    (1, tile),
                    lambda i, s: (s.astype(i32), i.astype(i32)),
                    memory_space=pltpu.VMEM,
                )
            bsk_spec = pl.BlockSpec(
                (1, n_, bw),
                lambda i, s: (s.astype(i32), i32(0), i32(0)),
                memory_space=pltpu.VMEM,
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, n_, b), jnp.int32),
                grid=grid,
                in_specs=[
                    const_spec(w0f),
                    const_spec(w1f),
                    const_spec(w0i),
                    const_spec(w1i),
                    const_spec(oh_lo),
                    const_spec(oh_hi),
                    pl.BlockSpec(
                        (2, n_, tile),
                        lambda i, s: (i32(0), i32(0), i.astype(i32)),
                        memory_space=pltpu.VMEM,
                    ),
                    xp_spec,
                    bsk_spec,
                ],
                out_specs=pl.BlockSpec(
                    (2, n_, tile),
                    lambda i, s: (i32(0), i32(0), i.astype(i32)),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, n_, tile), jnp.int32),       # acc_s
                    pltpu.VMEM((n_, jc * tile), jnp.int32),     # dig_s / dn
                    # a_s: level-0 staging (two-level) or the dn buffer of
                    # the single-dot forward transform
                    pltpu.VMEM(
                        (n_, jc * tile)
                        if self.single_dot
                        else (r, c * jc * tile),
                        jnp.int32,
                    ),
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),      # p_s
                    pltpu.VMEM((r, c * 2 * tile), jnp.int32),   # y_s
                    # v2 stages the balanced mono planes (2 per RGSW row);
                    # legacy holds the 2x3 product groups
                    pltpu.VMEM(
                        (2 * self.rows, n_, tile) if self.mac_rc
                        else (2, 3, n_, tile),
                        jnp.int32,
                    ),                                          # pgm_s
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=123 * 1024 * 1024,
                ),
                interpret=self.interpret,
            )(w0f, w1f, w0i, w1i, oh_lo, oh_hi, acc, xpow, bsk_bal)
            return out.transpose(1, 0, 2)

        return call

    def __call__(self, acc, xpow, bsk_bal, tables=None):
        if tables is None:
            tables = self.host_tables
        return self._call(acc, xpow, bsk_bal, tables)


# ---------------------------------------------------------------------------
# Second level: dual-limb (q < 2**50), paired CMUX (3 RGSW rows per step)
# ---------------------------------------------------------------------------


def make_bsk2_balanced(bsk_int, q: int):
    """Host prep: (3*n_steps, N, d, 2, 2) int64 BSK in [0, q), q < 2**50
    -> (n_steps, 2*d, N, 32) int16 balanced 13-bit planes.

    k' = k - q*(k > q/2) in (-q/2, q/2]; signed base-2**13 digits v0..v3 with
    |v_a| <= 2**12. Dim 1 is the digit column jj = j*2 + cc (the kernel's
    dynamic fori index — it must ride an untiled leading dim, Mosaic only
    lane-slices at 128 granularity); the minor dim holds the 24 static
    columns (a*3 + t)*2 + o, zero-padded to 32.
    """
    rows, n, d, c2, o2 = bsk_int.shape
    assert rows % 3 == 0
    n_steps = rows // 3
    kb = bsk_int.astype(np.int64)
    kb = kb - q * (kb > q // 2)
    planes = []
    r = kb
    for _ in range(3):
        v = ((r + (1 << 12)) & 8191) - (1 << 12)
        planes.append(v)
        r = (r - v) >> 13
    planes.append(r)  # |v3| small
    p = np.stack(planes, axis=0)  # (4, 3*n_steps, N, d, 2, 2)
    p = p.reshape(4, n_steps, 3, n, d, 2, 2)
    # -> (n_steps, d, cc, N, a, t, o) -> (n_steps, 2d, N, 24) -> pad 32
    p = p.transpose(1, 4, 5, 3, 0, 2, 6).reshape(n_steps, 2 * d, n, 24)
    out = np.zeros((n_steps, 2 * d, n, 32), dtype=np.int16)
    out[..., :24] = p
    return out


class FusedBlindRotateL2:
    """Paired blind rotation for the 50-bit field as one Pallas kernel.

    All in-kernel arithmetic is int32 on 25-bit limb pairs (Mosaic has no
    int64); the gadget rounding replicates ``SignedGadget.decompose``'s
    ``((x >> 2) * eps) >> 48`` correction EXACTLY in 13-bit limbs, so the
    kernel is bit-identical to the XLA ``make_blind_rotate(paired=True)``
    path built on the same PallasNtt50 instance.
    """

    def __init__(
        self,
        field: PrimeField,
        ntt,
        d: int,
        log_b: int,
        tile: int = 128,
        interpret: bool = False,
        skip: frozenset = frozenset(),
        single_dot: bool = False,
        mac_rc: int | None = None,
    ):
        assert field.bits == 50
        #: forward NTT as ONE full (8N, N) int8 MXU dot (digits are a
        #: single signed plane); the inverse stays two-level (8 full-range
        #: input planes would octuple the dot cost there)
        self.single_dot = single_dot
        if single_dot:
            assert hasattr(ntt, "_wf_full")
        #: MAC v2: row-chunked register-blocked MAC (TFHE_OMR_MAC_RC=<rows>,
        #: 0 = legacy). The legacy jj-outer loop carries its 7 group
        #: accumulators through VMEM — 14 (N, tile) loads+stores per digit
        #: column x 6 (t, o) passes, which pins the phase at the VMEM-
        #: streaming rate (~1.0 T int32 op/s, benches/vpu_peak_probe.py)
        #: instead of the register-resident ALU rate (~2.3-2.7 T). v2 makes
        #: the row chunk the outer loop, unrolls the digit columns inside
        #: it with all 42 group accumulators register-resident, shares one
        #: digit-plane read across ALL SIX (t, o) passes, and Horner-folds
        #: per chunk — cutting VMEM traffic per MAC op ~6x.
        if mac_rc is None:
            import os as _os

            # default ON at 64 rows: measured 2.755 -> 1.847 ms/msg for
            # the full L2 pass at B=1024 (benches/fused_l2.py, r5)
            mac_rc = int(_os.environ.get("TFHE_OMR_MAC_RC", "64"))
        # shrink to a divisor of the ring dim (small test rings)
        while mac_rc > 8 and ntt.n % mac_rc:
            mac_rc //= 2
        if mac_rc and ntt.n % mac_rc:
            mac_rc = 0
        self.mac_rc = mac_rc
        # single_dot only fits v5e's 128 MB VMEM because the v2 MAC's
        # packed mono staging freed the legacy (2,12,N,tile) product-group
        # scratch; refuse the oversubscribed combination up front instead
        # of an opaque Mosaic OOM
        assert not (single_dot and not mac_rc and ntt.n >= 2048), (
            "single_dot + legacy MAC exceeds the 128 MB VMEM at the "
            "reference ring; set TFHE_OMR_MAC_RC>0 or single_dot=False"
        )
        self.field = field
        self.ntt = ntt
        self.d = d
        self.log_b = log_b
        self.tile = tile
        self.interpret = interpret
        self.skip = skip
        self.n = ntt.n
        self.r = ntt.r
        self.c = ntt.c
        self.levels = ntt.levels  # 8 unsigned 7-bit planes
        two_n = 2 * ntt.n
        self.log2n = two_n.bit_length() - 1
        lo_bits = self.log2n // 2
        self.n_lo = 1 << lo_bits
        self.n_hi = two_n >> lo_bits
        orders_np = np.asarray(ntt.orders)
        oh_lo = np.zeros((self.n, self.n_lo), dtype=np.int8)
        oh_lo[np.arange(self.n), orders_np % self.n_lo] = 1
        oh_hi = np.zeros((self.n, self.n_hi), dtype=np.int8)
        oh_hi[np.arange(self.n), orders_np >> lo_bits] = 1
        self._oh_lo = oh_lo
        self._oh_hi = oh_hi
        q = field.q
        self._q_lo = q & ((1 << 25) - 1)
        self._q_hi = q >> 25
        qh = q // 2
        self._qh_lo = qh & ((1 << 25) - 1)
        self._qh_hi = qh >> 25
        self._call = self._make_call()

    # ------------------------------------------------------ limb arithmetic
    def _bal13(self, lo, hi):
        """Canonical (lo, hi) in [0, q) -> 4 signed 13-bit planes of the
        centered representative in (-q/2, q/2]."""
        gt = (hi > self._qh_hi) | (
            (hi == self._qh_hi) & (lo > self._qh_lo)
        )
        gi = gt.astype(jnp.int32)
        s_lo = lo - gi * jnp.int32(self._q_lo)
        s_hi = hi - gi * jnp.int32(self._q_hi)
        m13 = jnp.int32(8191)
        h12 = jnp.int32(1 << 12)
        d0 = ((s_lo + h12) & m13) - h12
        u0 = s_hi & m13
        u1 = s_hi >> 13
        t1 = ((s_lo - d0) >> 13) + (u0 << 12)
        d1 = ((t1 + h12) & m13) - h12
        t2 = ((t1 - d1) >> 13) + (u1 << 12)
        d2 = ((t2 + h12) & m13) - h12
        d3 = (t2 - d2) >> 13
        return [d0, d1, d2, d3]

    def _horner_dual(self, groups, radix: int, canonical: bool = True):
        """Recombine radix-2**radix-spaced signed int32 groups mod q.

        Returns canonical (lo, hi) 25-bit limbs; with ``canonical=False``
        the final subtract-q rounds are skipped and the value is only
        normalized (lo in [0, 2**25), hi in [0, 2**26); below 4q) — valid
        whenever the consumer is ``_digit_planes8`` (NTT level inputs),
        which only needs nonnegative limbs. |group| must be < 2**30.
        """
        eps = jnp.int32(self.field.eps)
        m25 = jnp.int32((1 << 25) - 1)
        sh = 25 - radix
        msh = jnp.int32((1 << sh) - 1)
        alo = groups[-1]
        ahi = jnp.zeros_like(alo)
        for s in range(len(groups) - 2, -1, -1):
            lo2 = ((alo & msh) << radix) + (ahi >> sh) * eps + groups[s]
            hi2 = ((ahi & msh) << radix) + (alo >> sh)
            cr = lo2 >> 25
            alo = lo2 - (cr << 25)
            ahi = hi2 + cr
        # normalize: add 2q so both limbs are nonnegative
        alo = alo + jnp.int32((2 * self.field.q) & ((1 << 25) - 1))
        ahi = ahi + jnp.int32((2 * self.field.q) >> 25)
        cr = alo >> 25
        alo = alo - (cr << 25)
        ahi = ahi + cr
        if not canonical:
            return alo, ahi
        q_lo = jnp.int32(self._q_lo)
        q_hi = jnp.int32(self._q_hi)
        for _ in range(3):
            ge = (ahi > q_hi) | ((ahi == q_hi) & (alo >= q_lo))
            gi = ge.astype(jnp.int32)
            lo2 = alo - gi * q_lo
            neg = (lo2 < 0).astype(jnp.int32)
            alo = lo2 + (neg << 25)
            ahi = ahi - gi * q_hi - neg
        return alo, ahi

    def _prod_groups(self, ap, bp):
        """13-bit-grid product groups of two balanced-plane sets
        (|group| < 2**26; up to 3 such sets may be summed in int32)."""
        groups = [None] * 7
        for a in range(4):
            for b in range(4):
                s = a + b
                t = ap[a] * bp[b]
                groups[s] = t if groups[s] is None else groups[s] + t
        return groups

    def _norm_groups13(self, groups):
        """Signed 13-bit-grid groups (|g| < 2**30) -> centered digit groups
        (|d| <= 2**12), same represented integer; the final carry is split
        into two extra digits, so 7 groups become 9."""
        h12 = jnp.int32(1 << 12)
        m13 = jnp.int32(8191)
        out = []
        carry = None
        for g in groups:
            if carry is not None:
                g = g + carry
            d = ((g + h12) & m13) - h12
            carry = (g - d) >> 13
            out.append(d)
        d = ((carry + h12) & m13) - h12
        out.append(d)
        out.append((carry - d) >> 13)
        return out

    def _conv_groups(self, digs, planes):
        """13-bit-grid convolution of digit groups with balanced planes:
        len(digs)+len(planes)-1 groups, |group| <= 4 * 2**24."""
        n_out = len(digs) + len(planes) - 1
        out = [None] * n_out
        for a, p in enumerate(planes):
            for b, dg in enumerate(digs):
                s = a + b
                t = p * dg
                out[s] = t if out[s] is None else out[s] + t
        return out

    def _mul_bal(self, ap, bp):
        """Product of two balanced-plane sets -> canonical limbs."""
        return self._horner_dual(self._prod_groups(ap, bp), 13)

    def _digit_planes8(self, lo, hi):
        """8 unsigned 7-bit int8 planes of canonical limbs (PallasNtt50)."""
        m21 = jnp.int32((1 << 21) - 1)
        lo21 = lo & m21
        hi21 = (hi << 4) | (lo >> 21)
        planes = []
        for a in range(3):
            planes.append(
                ((lo21 >> (7 * a)) & jnp.int32(127)).astype(jnp.int8)
            )
        for a in range(5):
            planes.append(
                ((hi21 >> (7 * a)) & jnp.int32(127)).astype(jnp.int8)
            )
        return planes

    def _corr50(self, lo, hi):
        """EXACT ((x >> 2) * eps) >> 48 in int32 (x = lo + 2**25 hi)."""
        eps = jnp.int32(self.field.eps)
        y_lo = (lo >> 2) | ((hi & 3) << 23)
        y_hi = hi >> 2
        m13 = jnp.int32(8191)
        t0 = y_lo & m13
        t1 = (y_lo >> 13) | ((y_hi & 1) << 12)
        t2 = (y_hi >> 1) & m13
        t3 = y_hi >> 14
        s0 = t0 * eps
        s1 = t1 * eps + (s0 >> 13)
        s2 = t2 * eps + (s1 >> 13)
        s3 = t3 * eps + (s2 >> 13)
        return s3 >> 9

    def _decompose_dual(self, lo, hi):
        """Balanced signed base-2**7 digits (d of them), bit-identical to
        SignedGadget.decompose for the 50-bit field."""
        shift = self.field.bits - self.d * self.log_b  # 8
        corr = self._corr50(lo, hi)
        m25 = jnp.int32((1 << 25) - 1)
        t = lo + corr + jnp.int32(1 << (shift - 1))
        c0 = t >> 25
        t = t & m25
        h = hi + c0
        u_lo = (t >> shift) + (
            (h & jnp.int32((1 << shift) - 1)) << (25 - shift)
        )
        u_hi = h >> shift
        bmask = jnp.int32((1 << self.log_b) - 1)
        half_b = jnp.int32(1 << (self.log_b - 1))
        digs = []
        for _ in range(self.d):
            dj = u_lo & bmask
            u_lo = (u_lo >> self.log_b) + (
                (u_hi & bmask) << (25 - self.log_b)
            )
            u_hi = u_hi >> self.log_b
            carry = (dj >= half_b).astype(jnp.int32)
            digs.append(dj - (carry << self.log_b))
            u_lo = u_lo + carry
        return digs

    def _level_dot_dual(
        self, x_planes, w_planes, out_rows, pair=True, canonical=True
    ):
        """NTT level: x_planes (list of int8 (rows, X)), dual-limb output.

        ``pair`` must be False when groups can exceed 2**23 (the
        2048-deep single-dot forward). ``canonical=False`` skips the final
        subtract-q rounds — only valid when the output feeds
        ``_digit_planes8`` (the next NTT level)."""
        L = self.levels
        in_levels = len(x_planes)
        groups = [None] * (in_levels + L - 1)
        for a in range(in_levels):
            p = jax.lax.dot_general(
                w_planes,
                x_planes[a],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for b in range(L):
                s = a + b
                blk = p[b * out_rows : (b + 1) * out_rows]
                groups[s] = blk if groups[s] is None else groups[s] + blk
        if not pair:
            return self._horner_dual(groups, 7, canonical)
        # pairwise pre-merge (groups < 2**22, pairs < 2**29): halves the
        # dual-limb fold chain by running it at radix 2**14
        paired = [
            groups[s] + (groups[s + 1] << 7)
            if s + 1 < len(groups)
            else groups[s]
            for s in range(0, len(groups), 2)
        ]
        return self._horner_dual(paired, 14, canonical)

    def _onehot_dual(self, oh, tab_lo, tab_hi):
        """Select (N,) rows: tab limbs (n_e, Bt) -> limbs (N, Bt), exact."""
        n, bt = self.n, tab_lo.shape[1]
        outs = []
        for tab in (tab_lo, tab_hi):
            planes = [
                ((tab >> jnp.int32(7 * a)) & jnp.int32(127)).astype(jnp.int8)
                for a in range(4)
            ]
            x = jnp.concatenate(planes, axis=1)  # (n_e, 4*Bt)
            sel = jax.lax.dot_general(
                oh, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            v = sel[:, 0:bt]
            for a in range(1, 4):
                v = v + (sel[:, a * bt : (a + 1) * bt] << (7 * a))
            outs.append(v)
        return outs[0], outs[1]

    def _sub_one(self, lo, hi):
        """(lo, hi) - 1 mod q."""
        lo2 = lo - 1
        neg = (lo2 < 0).astype(jnp.int32)
        lo2 = lo2 + (neg << 25)
        hi2 = hi - neg
        under = (hi2 < 0).astype(jnp.int32)
        lo3 = lo2 + under * jnp.int32(self._q_lo)
        cr = lo3 >> 25
        lo3 = lo3 - (cr << 25)
        hi3 = hi2 + under * jnp.int32(self._q_hi) + cr
        return lo3, hi3

    def _add_canonical(self, alo, ahi, blo, bhi):
        """Exact (a + b) mod q on canonical 25-bit limb pairs."""
        s_lo = alo + blo
        s_hi = ahi + bhi + (s_lo >> 25)
        s_lo = s_lo & jnp.int32((1 << 25) - 1)
        q_lo = jnp.int32(self._q_lo)
        q_hi = jnp.int32(self._q_hi)
        ge = (s_hi > q_hi) | ((s_hi == q_hi) & (s_lo >= q_lo))
        gi = ge.astype(jnp.int32)
        lo2 = s_lo - gi * q_lo
        neg = (lo2 < 0).astype(jnp.int32)
        return lo2 + (neg << 25), s_hi - gi * q_hi - neg

    # ---------------------------------------------------------------- kernel
    @property
    def host_tables(self):
        """(w0f, w1f, w0i, w1i, oh_lo, oh_hi), host numpy (see L1)."""
        pn = self.ntt
        if self.single_dot:
            # BALANCED planes (|w| <= 64): groups of the 2048-deep dot
            # against |digit| <= 64 data stay under 2**23, so the Horner
            # can run paired (radix 14) — 4 folds and 4 live groups
            # instead of 15 (which spilled past v5e's VMEM).
            # w1f is unused in single-dot forward mode; keep a tiny
            # placeholder so the kernel signature stays fixed
            w0f, w1f = pn._wf_full_bal, pn._w1_f[:1]
        else:
            w0f, w1f = pn._w0_f, pn._w1_f
        return (w0f, w1f, pn._w0_i, pn._w1_i, self._oh_lo, self._oh_hi)

    def _make_call(self):
        n, r, c, d = self.n, self.r, self.c, self.d
        jc = 2 * d
        lvl0_chunk = 8192

        def kernel(
            w0f_ref, w1f_ref, w0i_ref, w1i_ref, ohlo_ref, ohhi_ref,
            acc_ref, p1_ref, p2_ref, bsk_ref,
            o_ref,
            acc_s, dig_s, dnhi_s, slo_s, shi_s, plo_s, phi_s, pgm_s,
        ):
            step = pl.program_id(1)
            n_steps = pl.num_programs(1)
            bt = acc_ref.shape[3]
            skip = self.skip
            # column chunk of the (j, cc, b) axis processed per fused
            # level0+level1 pass; also sized so the same staging buffers
            # hold the INTT's (r, c*2*bt) y intermediate
            ch_w = 2 * bt

            @pl.when(step == 0)
            def _():
                acc_s[:] = acc_ref[:]

            # ---- 1. decompose both polys -> dig_s (N, jc*Bt) signed digits
            if "dec" not in skip:
                for cc in range(2):
                    digs = self._decompose_dual(
                        acc_s[0, cc], acc_s[1, cc]
                    )
                    for j in range(d):
                        dig_s[
                            :, (j * 2 + cc) * bt : (j * 2 + cc + 1) * bt
                        ] = digs[j]

            # ---- 2. forward NTT (signed single plane -> dual-limb out),
            # both levels fused per ch_w-column chunk; the level-1 low limb
            # overwrites the (consumed) digit columns in dig_s. All loops
            # are in-kernel fori_loops with dynamic ref slices — a fully
            # unrolled body spills hundreds of MB of vregs (PERF_NOTES.md).
            if "fwd" not in skip and self.single_dot:
                # one (8N, N) int8 dot per column chunk; 2048-deep groups
                # exceed the pairing bound, so the Horner runs at radix 7.
                # Chunk = one lane tile and the loop is an in-kernel fori
                # (dynamic slices are bt=128-aligned): a Python-unrolled
                # loop kept several chunks' dot output + Horner groups live
                # at once and blew v5e's VMEM (162 MB resp. 136 MB > 128 MB
                # in the round-4 compile probes).
                def sd_chunk(ci, _):
                    cs = pl.ds(ci.astype(jnp.int32) * jnp.int32(bt), bt)
                    x_chunk = dig_s[:, cs].astype(jnp.int8)
                    # balanced weights x balanced digits: |group| <= 2048 *
                    # 64 * 64 = 2**23, paired |group| <= 129 * 2**23 < 2**31
                    lo_o, hi_o = self._level_dot_dual(
                        [x_chunk], w0f_ref[:], n, pair=True
                    )
                    dig_s[:, cs] = lo_o
                    dnhi_s[:, cs] = hi_o
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(jc), sd_chunk, jnp.int32(0)
                )
            elif "fwd" not in skip:

                def fwd_chunk(ci, _):
                    s0 = ci.astype(jnp.int32) * jnp.int32(ch_w)
                    x = dig_s[:, pl.ds(s0, ch_w)].reshape(r, c * ch_w)
                    # lazy level-0 output: feeds _digit_planes8 only
                    lo0, hi0 = self._level_dot_dual(
                        [x.astype(jnp.int8)], w0f_ref[:], r, canonical=False
                    )
                    slo_s[:] = lo0
                    shi_s[:] = hi0

                    def fwd_k0(k0, _):
                        k0 = k0.astype(jnp.int32)
                        sv_lo = slo_s[pl.ds(k0, 1), :].reshape(c, ch_w)
                        sv_hi = shi_s[pl.ds(k0, 1), :].reshape(c, ch_w)
                        w1k = w1f_ref[pl.ds(k0, 1), :, :].reshape(
                            self.levels * c, c
                        )
                        lo_o, hi_o = self._level_dot_dual(
                            self._digit_planes8(sv_lo, sv_hi), w1k, c
                        )
                        rr = pl.ds(k0 * jnp.int32(c), c)
                        dig_s[rr, pl.ds(s0, ch_w)] = lo_o
                        dnhi_s[rr, pl.ds(s0, ch_w)] = hi_o
                        return jnp.int32(0)

                    jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(r), fwd_k0, jnp.int32(0)
                    )
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32((jc * bt) // ch_w), fwd_chunk, jnp.int32(0)
                )

            # ---- 3+4. MAC with per-row mono; per-(row, o) results are
            # dual-limb-accumulated straight into the plo/phi scratch so no
            # accumulator value stays live across the big unrolled sections
            if "mac" not in skip and self.mac_rc:
                # v2: row-chunked register-blocked MAC (see __init__ note).
                m16 = jnp.int32(0xFFFF)

                def pack_jj(jj, _):
                    jj = jj.astype(jnp.int32)
                    cs = pl.ds(jj * jnp.int32(bt), bt)
                    vp = self._bal13(dig_s[:, cs], dnhi_s[:, cs])
                    dig_s[:, cs] = (vp[0] & m16) | (vp[1] << 16)
                    dnhi_s[:, cs] = (vp[2] & m16) | (vp[3] << 16)
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(jc), pack_jj, jnp.int32(0)
                )
                # mono planes for all 3 t once, staged in pgm_s (12, N, bt)
                for t in range(3):
                    if "mono" not in skip:
                        s1l, s1h = self._onehot_dual(
                            ohlo_ref[:], p1_ref[0, 2 * t],
                            p1_ref[0, 2 * t + 1],
                        )
                        s2l, s2h = self._onehot_dual(
                            ohhi_ref[:], p2_ref[0, 2 * t],
                            p2_ref[0, 2 * t + 1],
                        )
                        mlo, mhi = self._mul_bal(
                            self._bal13(s1l, s1h), self._bal13(s2l, s2h)
                        )
                        mlo, mhi = self._sub_one(mlo, mhi)
                    else:
                        mlo = p1_ref[0, 2 * t, 0:1, :] + jnp.zeros(
                            (n, bt), jnp.int32
                        )
                        mhi = jnp.zeros((n, bt), jnp.int32)
                    mt = self._bal13(mlo, mhi)
                    # packed 2-per-int32 (signed 13-bit planes fit 16 bits)
                    pgm_s[t * 2] = (mt[0] & m16) | (mt[1] << 16)
                    pgm_s[t * 2 + 1] = (mt[2] & m16) | (mt[3] << 16)

                rc_sz = self.mac_rc
                n_rc = n // rc_sz

                def mac_rc_body(rci, _):
                    row0 = rci.astype(jnp.int32) * jnp.int32(rc_sz)
                    rows = pl.ds(row0, rc_sz)
                    # one digit-plane read per jj feeds all 6 (t, o)
                    # passes; 42 group accumulators stay in registers
                    groups = [
                        [[None] * 7 for _ in range(2)] for _ in range(3)
                    ]
                    for jj in range(jc):
                        c0 = jj * bt
                        w01 = dig_s[rows, c0 : c0 + bt]
                        w23 = dnhi_s[rows, c0 : c0 + bt]
                        vp = [
                            (w01 << 16) >> 16,
                            w01 >> 16,
                            (w23 << 16) >> 16,
                            w23 >> 16,
                        ]
                        kj = bsk_ref[0, jj, rows, :]
                        for t in range(3):
                            for o in range(2):
                                for a in range(4):
                                    col = (a * 3 + t) * 2 + o
                                    kcol = kj[:, col : col + 1].astype(
                                        jnp.int32
                                    )
                                    for b in range(4):
                                        s_ = a + b
                                        term = vp[b] * kcol
                                        cur = groups[t][o][s_]
                                        groups[t][o][s_] = (
                                            term if cur is None
                                            else cur + term
                                        )
                    for o in range(2):
                        out12 = [None] * 12
                        for t in range(3):
                            digs = self._norm_groups13(groups[t][o])
                            mw0 = pgm_s[t * 2, rows, :]
                            mw1 = pgm_s[t * 2 + 1, rows, :]
                            mono_t = [
                                (mw0 << 16) >> 16,
                                mw0 >> 16,
                                (mw1 << 16) >> 16,
                                mw1 >> 16,
                            ]
                            pg = self._conv_groups(digs, mono_t)
                            for s_ in range(12):
                                out12[s_] = (
                                    pg[s_] if out12[s_] is None
                                    else out12[s_] + pg[s_]
                                )
                        rlo, rhi = self._horner_dual(out12, 13)
                        plo_s[rows, o * bt : (o + 1) * bt] = rlo
                        phi_s[rows, o * bt : (o + 1) * bt] = rhi
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(n_rc), mac_rc_body,
                    jnp.int32(0),
                )
            elif "mac" not in skip:
                # pack the balanced 13-bit digit planes of dn ONCE (shared
                # by all six (t, o) MAC passes): dig_s <- d0 | d1<<16,
                # dnhi_s <- d2 | d3<<16 (sign-extending unpack in mac_jj)
                m16 = jnp.int32(0xFFFF)

                def pack_jj(jj, _):
                    jj = jj.astype(jnp.int32)
                    cs = pl.ds(jj * jnp.int32(bt), bt)
                    vp = self._bal13(dig_s[:, cs], dnhi_s[:, cs])
                    dig_s[:, cs] = (vp[0] & m16) | (vp[1] << 16)
                    dnhi_s[:, cs] = (vp[2] & m16) | (vp[3] << 16)
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(jc), pack_jj, jnp.int32(0)
                )
                zero = jnp.zeros((n, bt), jnp.int32)
                for t in range(3):
                    if "mono" not in skip:
                        s1l, s1h = self._onehot_dual(
                            ohlo_ref[:], p1_ref[0, 2 * t], p1_ref[0, 2 * t + 1]
                        )
                        s2l, s2h = self._onehot_dual(
                            ohhi_ref[:], p2_ref[0, 2 * t], p2_ref[0, 2 * t + 1]
                        )
                        mlo, mhi = self._mul_bal(
                            self._bal13(s1l, s1h), self._bal13(s2l, s2h)
                        )
                        mlo, mhi = self._sub_one(mlo, mhi)
                    else:
                        mlo = p1_ref[0, 2 * t, 0:1, :] + jnp.zeros(
                            (n, bt), jnp.int32
                        )
                        mhi = jnp.zeros((n, bt), jnp.int32)
                    mono_t = self._bal13(mlo, mhi)
                    for o in range(2):

                        def mac_jj(jj, groups, _t=t, _o=o):
                            jj = jj.astype(jnp.int32)
                            cs = pl.ds(jj * jnp.int32(bt), bt)
                            w01 = dig_s[:, cs]
                            w23 = dnhi_s[:, cs]
                            vp = [
                                (w01 << 16) >> 16,
                                w01 >> 16,
                                (w23 << 16) >> 16,
                                w23 >> 16,
                            ]
                            kj = bsk_ref[0, pl.ds(jj, 1), :, :].reshape(
                                n, 32
                            )
                            new = list(groups)
                            for a in range(4):
                                col = (a * 3 + _t) * 2 + _o
                                kcol = kj[:, col : col + 1].astype(jnp.int32)
                                for b in range(4):
                                    s_ = a + b
                                    new[s_] = new[s_] + vp[b] * kcol
                            return tuple(new)

                        groups = jax.lax.fori_loop(
                            jnp.int32(0), jnp.int32(jc), mac_jj, (zero,) * 7
                        )
                        # carry-normalize the MAC groups to centered digits
                        # (exact, same integer) and convolve DIRECTLY with
                        # the mono planes — no per-(row, o) Horner/balance.
                        # Product groups (<= 2**26, 3 rows < 2**28) are
                        # accumulated across the RGSW rows; ONE Horner per
                        # output component reduces everything mod q.
                        pg = self._conv_groups(
                            self._norm_groups13(groups), mono_t
                        )
                        for s_ in range(12):
                            if t == 0:
                                pgm_s[o, s_] = pg[s_]
                            else:
                                pgm_s[o, s_] = pgm_s[o, s_] + pg[s_]
                for o in range(2):
                    rlo, rhi = self._horner_dual(
                        [pgm_s[o, s_] for s_ in range(12)], 13
                    )
                    sl = slice(o * bt, (o + 1) * bt)
                    plo_s[:, sl] = rlo
                    phi_s[:, sl] = rhi

            # ---- 5. inverse NTT + accumulate (y staging reuses slo/shi:
            # (r, c*2*bt) == their (r, c*ch_w) shape)
            if "intt" not in skip:

                def intt_k0(k0, _):
                    k0 = k0.astype(jnp.int32)
                    rr = pl.ds(k0 * jnp.int32(c), c)
                    pvl = plo_s[rr, :]
                    pvh = phi_s[rr, :]
                    w1k = w1i_ref[pl.ds(k0, 1), :, :].reshape(
                        self.levels * c, c
                    )
                    # lazy level-1 output: feeds _digit_planes8 only
                    lo_o, hi_o = self._level_dot_dual(
                        self._digit_planes8(pvl, pvh), w1k, c,
                        canonical=False,
                    )
                    slo_s[pl.ds(k0, 1), :] = lo_o.reshape(1, c * 2 * bt)
                    shi_s[pl.ds(k0, 1), :] = hi_o.reshape(1, c * 2 * bt)
                    return jnp.int32(0)

                jax.lax.fori_loop(jnp.int32(0), jnp.int32(r), intt_k0, jnp.int32(0))
                zlo_parts = []
                zhi_parts = []
                for s0 in range(0, c * 2 * bt, lvl0_chunk):
                    e0 = min(c * 2 * bt, s0 + lvl0_chunk)
                    lo_o, hi_o = self._level_dot_dual(
                        self._digit_planes8(
                            slo_s[:, s0:e0], shi_s[:, s0:e0]
                        ),
                        w0i_ref[:],
                        r,
                    )
                    zlo_parts.append(lo_o)
                    zhi_parts.append(hi_o)
                zlo = jnp.concatenate(zlo_parts, axis=1).reshape(n, 2, bt)
                zhi = jnp.concatenate(zhi_parts, axis=1).reshape(n, 2, bt)
                d_lo = zlo.transpose(1, 0, 2)
                d_hi = zhi.transpose(1, 0, 2)
            else:
                d_lo = plo_s[:].reshape(n, 2, bt).transpose(1, 0, 2)
                d_hi = phi_s[:].reshape(n, 2, bt).transpose(1, 0, 2)

            new_lo, new_hi = self._add_canonical(
                acc_s[0], acc_s[1], d_lo, d_hi
            )
            acc_s[0] = new_lo
            acc_s[1] = new_hi

            @pl.when(step == n_steps - 1)
            def _():
                o_ref[0] = new_lo
                o_ref[1] = new_hi

        def call(acc_limbs, p1l, p2l, bsk_bal, tables):
            """acc_limbs (2, 2, N, B) int32 [limb, o, n, b];
            p1l/p2l (n_steps, 6, n_e, B) int32 [(t, limb) rows];
            bsk_bal (n_steps, 2d, N, 32) int16 -> (2, 2, N, B) int32."""
            w0f, w1f, w0i, w1i, oh_lo, oh_hi = tables
            _, _, n_, b = acc_limbs.shape
            n_steps = bsk_bal.shape[0]
            tile = min(self.tile, b)
            assert b % tile == 0, (b, tile)
            i32 = jnp.int32
            grid = (b // tile, n_steps)
            const_spec = lambda arr: pl.BlockSpec(
                arr.shape,
                lambda i, s, _nd=arr.ndim: (i32(0),) * _nd,
                memory_space=pltpu.VMEM,
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, 2, n_, b), jnp.int32),
                grid=grid,
                in_specs=[
                    const_spec(w0f),
                    const_spec(w1f),
                    const_spec(w0i),
                    const_spec(w1i),
                    const_spec(oh_lo),
                    const_spec(oh_hi),
                    pl.BlockSpec(
                        (2, 2, n_, tile),
                        lambda i, s: (i32(0), i32(0), i32(0), i.astype(i32)),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 6, self.n_lo, tile),
                        lambda i, s: (
                            s.astype(i32), i32(0), i32(0), i.astype(i32)
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 6, self.n_hi, tile),
                        lambda i, s: (
                            s.astype(i32), i32(0), i32(0), i.astype(i32)
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, jc, n_, 32),
                        lambda i, s: (s.astype(i32), i32(0), i32(0), i32(0)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (2, 2, n_, tile),
                    lambda i, s: (i32(0), i32(0), i32(0), i.astype(i32)),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 2, n_, tile), jnp.int32),       # acc_s
                    pltpu.VMEM((n_, jc * tile), jnp.int32),        # dig_s / dn lo
                    pltpu.VMEM((n_, jc * tile), jnp.int32),        # dnhi_s
                    pltpu.VMEM((r, c * 2 * tile), jnp.int32),      # slo_s
                    pltpu.VMEM((r, c * 2 * tile), jnp.int32),      # shi_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),         # plo_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),         # phi_s
                    # v2 stages the 3x4 mono planes packed 2-per-int32
                    # (6 MB at tile=128); legacy holds the 2x12 product
                    # groups
                    pltpu.VMEM(
                        (6, n_, tile) if self.mac_rc
                        else (2, 12, n_, tile),
                        jnp.int32,
                    ),                                              # pgm_s
                ],
                compiler_params=pltpu.CompilerParams(
                    # single_dot needs 125.5 MB (the (8N, N) int8 DFT
                    # matrix coexists with the kernel scratch now that the
                    # v2 MAC freed pgm_s's other 12 MB); v5e has 128 MB
                    vmem_limit_bytes=(127 if self.single_dot else 123)
                    * 1024 * 1024,
                ),
                interpret=self.interpret,
            )(w0f, w1f, w0i, w1i, oh_lo, oh_hi, acc_limbs, p1l, p2l, bsk_bal)
            return out

        return call

    def __call__(self, acc_limbs, p1l, p2l, bsk_bal, tables=None):
        if tables is None:
            tables = self.host_tables
        return self._call(acc_limbs, p1l, p2l, bsk_bal, tables)


# ---------------------------------------------------------------------------
# Fused homomorphic trace (second-level field): 11 sequential rounds of
# automorphism + gadget key switch in ONE kernel (counterpart of
# ``TraceKey::trace``, reference ``omr_core/src/detector.rs:626-639``).
# ---------------------------------------------------------------------------


def make_trace_balanced(tk_int: np.ndarray, q: int) -> np.ndarray:
    """Host prep: (rounds, N, d, 2) int64 NTT-domain trace key in [0, q),
    q < 2**50 -> (rounds, d_pad, N, 16) int16 balanced 13-bit planes.

    Minor-dim column layout a*2 + o (4 planes x 2 output components),
    zero-padded to 16; the digit axis is padded to even so the kernel's
    forward-NTT chunking (2 columns per pass) divides it.
    """
    rounds, n, d, o2 = tk_int.shape
    kb = tk_int.astype(np.int64)
    kb = kb - q * (kb > q // 2)
    planes = []
    r = kb
    for _ in range(3):
        v = ((r + (1 << 12)) & 8191) - (1 << 12)
        planes.append(v)
        r = (r - v) >> 13
    planes.append(r)
    p = np.stack(planes, axis=0)  # (4, rounds, N, d, 2)
    p = p.transpose(1, 3, 2, 0, 4).reshape(rounds, d, n, 8)
    d_pad = d + (d % 2)
    out = np.zeros((rounds, d_pad, n, 16), dtype=np.int16)
    out[:, :d, :, :8] = p
    return out


def make_auto_compact(autos, n: int) -> np.ndarray:
    """Host prep: per-round automorphism (index, sign) pairs (rounds, N, 2)
    int32 — sigma_g(acc)[i] = sign[i] * acc[idx[i]]. The signed one-hot
    matrix P[i, idx[i]] = sign[i] the trace kernel dots against (an int8 MXU
    dot instead of an element-serial gather) is built IN-KERNEL by an iota
    compare, so only ~180 KB ships to HBM instead of the (rounds, N, N)
    int8 ≈ 46 MB one-hot stack."""
    rounds = len(autos)
    out = np.zeros((rounds, n, 2), dtype=np.int32)
    for r_i, (_g, gidx, gsign) in enumerate(autos):
        out[r_i, :, 0] = np.asarray(gidx)
        out[r_i, :, 1] = np.asarray(gsign)
    return out


class FusedTrace(FusedBlindRotateL2):
    """EvalTr as one Pallas kernel: grid = (batch_tiles, rounds); the
    accumulator lives in VMEM scratch across the sequential round axis.

    Per round (bit-exact counterpart of ``make_trace``'s XLA ops):
      1. automorphism of both components as signed one-hot int8 MXU dots
         over 7-bit limb planes;
      2. exact base-4 digits of the automorphed a-part (the trace gadget
         is exact: d*log_b == qbits, digits in [0, 4));
      3. two-level forward NTT of the 25 (padded 26) digit polys;
      4. per-component MAC against the balanced trace-key planes;
      5. inverse NTT; acc_a -= pc_a, acc_b += auto_b - pc_b (mod q).
    """

    def __init__(
        self,
        field: PrimeField,
        ntt,
        d: int,
        tile: int = 128,
        interpret: bool = False,
    ):
        assert field.bits == 50
        self.field = field
        self.ntt = ntt
        self.d = d
        self.log_b = 2
        self.tile = tile
        self.interpret = interpret
        self.skip = frozenset()
        self.single_dot = False
        self.n = ntt.n
        self.r = ntt.r
        self.c = ntt.c
        self.levels = ntt.levels
        q = field.q
        self._q_lo = q & ((1 << 25) - 1)
        self._q_hi = q >> 25
        qh = q // 2
        self._qh_lo = qh & ((1 << 25) - 1)
        self._qh_hi = qh >> 25
        self._call = self._make_trace_call()

    def _sub_canonical(self, alo, ahi, blo, bhi):
        """Exact (a - b) mod q on canonical 25-bit limb pairs."""
        lo = alo - blo
        bor = (lo < 0).astype(jnp.int32)
        lo = lo + (bor << 25)
        hi = ahi - bhi - bor
        neg = (hi < 0).astype(jnp.int32)
        lo2 = lo + neg * jnp.int32(self._q_lo)
        cr = lo2 >> 25
        return lo2 - (cr << 25), hi + neg * jnp.int32(self._q_hi) + cr

    @property
    def host_tables(self):
        """(w0f, w1f, w0i, w1i), host numpy (see FusedBlindRotateL1)."""
        pn = self.ntt
        return (pn._w0_f, pn._w1_f, pn._w0_i, pn._w1_i)

    def _make_trace_call(self):
        n, r, c, d = self.n, self.r, self.c, self.d
        jc = d + (d % 2)  # padded digit columns
        assert 2 * d >= 50, "trace gadget must be exact (d*log_b >= bits)"

        def kernel(
            w0f_ref, w1f_ref, w0i_ref, w1i_ref,
            acc_ref, auto_ref, tk_ref,
            o_ref,
            acc_s, dig8_s, dnlo_s, dnhi_s, slo_s, shi_s, plo_s, phi_s,
            ab_s, g_s,
        ):
            step = pl.program_id(1)
            n_steps = pl.num_programs(1)
            bt = acc_ref.shape[3]
            ch_w = 2 * bt

            @pl.when(step == 0)
            def _():
                acc_s[:] = acc_ref[:]

            # (N, N) int8 signed one-hot, built in-kernel from the compact
            # (index, sign) pairs: P[i, gidx[i]] = gsign[i]
            av = auto_ref[0]  # (N, 2) int32
            colj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            pmat = jnp.where(
                colj == av[:, 0:1], av[:, 1:2], jnp.int32(0)
            ).astype(jnp.int8)
            # ---- 1. automorphism of both components via plane dots
            auto = []
            for o in range(2):
                lo = acc_s[0, o]
                hi = acc_s[1, o]
                planes = [
                    ((lo >> jnp.int32(7 * a)) & jnp.int32(127)).astype(
                        jnp.int8
                    )
                    for a in range(4)
                ] + [
                    ((hi >> jnp.int32(7 * a)) & jnp.int32(127)).astype(
                        jnp.int8
                    )
                    for a in range(4)
                ]
                x = jnp.concatenate(planes, axis=1)  # (N, 8*bt)
                sel = jax.lax.dot_general(
                    pmat, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # +-plane values of the source row
                lo2 = sel[:, 0:bt]
                for a in range(1, 4):
                    lo2 = lo2 + (sel[:, a * bt : (a + 1) * bt] << (7 * a))
                hi2 = sel[:, 4 * bt : 5 * bt]
                for a in range(1, 4):
                    hi2 = hi2 + (
                        sel[:, (4 + a) * bt : (5 + a) * bt] << (7 * a)
                    )
                # negative rows (gsign = -1) -> add q, fix borrow
                neg = (hi2 < 0) | ((hi2 == 0) & (lo2 < 0))
                ni = neg.astype(jnp.int32)
                lo3 = lo2 + ni * jnp.int32(self._q_lo)
                cr = lo3 >> 25
                lo3 = lo3 - (cr << 25)
                hi3 = hi2 + ni * jnp.int32(self._q_hi) + cr
                auto.append((lo3, hi3))
            a_lo, a_hi = auto[0]
            ab_s[0] = auto[1][0]
            ab_s[1] = auto[1][1]

            # ---- 2. exact base-4 digits of the a-part -> dig8_s (int8)
            for j in range(d):
                bitpos = 2 * j
                if bitpos + 2 <= 25:
                    dj = (a_lo >> bitpos) & jnp.int32(3)
                elif bitpos < 25:  # straddles the limb boundary
                    dj = ((a_lo >> 24) & jnp.int32(1)) | (
                        (a_hi & jnp.int32(1)) << 1
                    )
                else:
                    dj = (a_hi >> (bitpos - 25)) & jnp.int32(3)
                dig8_s[:, j * bt : (j + 1) * bt] = dj.astype(jnp.int8)
            for j in range(d, jc):
                dig8_s[:, j * bt : (j + 1) * bt] = jnp.zeros(
                    (n, bt), jnp.int8
                )

            # ---- 3+4. forward NTT + MAC fused per 2-digit-column chunk:
            # the dual-limb dn exists only chunk-wide (VMEM: the full-width
            # dn buffers put the kernel 7MB over v5e's 128MB capacity); MAC
            # groups accumulate in g_s scratch across chunks
            for o in range(2):
                for s_ in range(7):
                    g_s[o, s_] = jnp.zeros((n, bt), jnp.int32)

            def chunk_body(ci, _):
                ci = ci.astype(jnp.int32)
                s0 = ci * jnp.int32(ch_w)
                x = dig8_s[:, pl.ds(s0, ch_w)].reshape(r, c * ch_w)
                lo0, hi0 = self._level_dot_dual(
                    [x], w0f_ref[:], r, canonical=False
                )
                slo_s[:] = lo0
                shi_s[:] = hi0

                def fwd_k0(k0, _):
                    k0 = k0.astype(jnp.int32)
                    sv_lo = slo_s[pl.ds(k0, 1), :].reshape(c, ch_w)
                    sv_hi = shi_s[pl.ds(k0, 1), :].reshape(c, ch_w)
                    w1k = w1f_ref[pl.ds(k0, 1), :, :].reshape(
                        self.levels * c, c
                    )
                    lo_o, hi_o = self._level_dot_dual(
                        self._digit_planes8(sv_lo, sv_hi), w1k, c
                    )
                    rr = pl.ds(k0 * jnp.int32(c), c)
                    dnlo_s[rr, :] = lo_o
                    dnhi_s[rr, :] = hi_o
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(r), fwd_k0, jnp.int32(0)
                )
                for jl in range(2):
                    sl_ = slice(jl * bt, (jl + 1) * bt)
                    vp = self._bal13(dnlo_s[:, sl_], dnhi_s[:, sl_])
                    jj = ci * 2 + jl
                    kj = tk_ref[0, pl.ds(jj, 1), :, :].reshape(n, 16)
                    for o in range(2):
                        for a in range(4):
                            col = a * 2 + o
                            kcol = kj[:, col : col + 1].astype(jnp.int32)
                            for b in range(4):
                                s_ = a + b
                                g_s[o, s_] = g_s[o, s_] + vp[b] * kcol
                return jnp.int32(0)

            jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(jc // 2), chunk_body, jnp.int32(0)
            )
            for o in range(2):
                plo, phi = self._horner_dual(
                    [g_s[o, s_] for s_ in range(7)], 13
                )
                sl = slice(o * bt, (o + 1) * bt)
                plo_s[:, sl] = plo
                phi_s[:, sl] = phi

            # ---- 5. inverse NTT + update
            def intt_k0(k0, _):
                k0 = k0.astype(jnp.int32)
                rr = pl.ds(k0 * jnp.int32(c), c)
                w1k = w1i_ref[pl.ds(k0, 1), :, :].reshape(
                    self.levels * c, c
                )
                lo_o, hi_o = self._level_dot_dual(
                    self._digit_planes8(plo_s[rr, :], phi_s[rr, :]), w1k, c,
                    canonical=False,
                )
                slo_s[pl.ds(k0, 1), :] = lo_o.reshape(1, c * 2 * bt)
                shi_s[pl.ds(k0, 1), :] = hi_o.reshape(1, c * 2 * bt)
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(r), intt_k0, jnp.int32(0))
            zlo_parts, zhi_parts = [], []
            for s0 in range(0, c * 2 * bt, 8192):
                e0 = min(c * 2 * bt, s0 + 8192)
                lo_o, hi_o = self._level_dot_dual(
                    self._digit_planes8(slo_s[:, s0:e0], shi_s[:, s0:e0]),
                    w0i_ref[:],
                    r,
                )
                zlo_parts.append(lo_o)
                zhi_parts.append(hi_o)
            zlo = jnp.concatenate(zlo_parts, axis=1).reshape(n, 2, bt)
            zhi = jnp.concatenate(zhi_parts, axis=1).reshape(n, 2, bt)
            # acc_a -= pc_a; acc_b += auto_b - pc_b  (exact mod q)
            na_lo, na_hi = self._sub_canonical(
                acc_s[0, 0], acc_s[1, 0], zlo[:, 0], zhi[:, 0]
            )
            tb_lo, tb_hi = self._add_canonical(
                acc_s[0, 1], acc_s[1, 1], ab_s[0], ab_s[1]
            )
            nb_lo, nb_hi = self._sub_canonical(
                tb_lo, tb_hi, zlo[:, 1], zhi[:, 1]
            )
            acc_s[0, 0] = na_lo
            acc_s[1, 0] = na_hi
            acc_s[0, 1] = nb_lo
            acc_s[1, 1] = nb_hi

            @pl.when(step == n_steps - 1)
            def _():
                o_ref[0, 0] = na_lo
                o_ref[1, 0] = na_hi
                o_ref[0, 1] = nb_lo
                o_ref[1, 1] = nb_hi

        def call(acc_limbs, auto, tk_bal, tables):
            """acc_limbs (2, 2, N, B) int32 [limb, o, n, b]; auto
            (rounds, N, 2) int32 (make_auto_compact); tk_bal
            (rounds, jc, N, 16) int16 -> (2, 2, N, B) int32."""
            w0f, w1f, w0i, w1i = tables
            _, _, n_, b = acc_limbs.shape
            rounds = auto.shape[0]
            tile = min(self.tile, b)
            assert b % tile == 0, (b, tile)
            i32 = jnp.int32
            grid = (b // tile, rounds)
            const_spec = lambda arr: pl.BlockSpec(
                arr.shape,
                lambda i, s, _nd=arr.ndim: (i32(0),) * _nd,
                memory_space=pltpu.VMEM,
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, 2, n_, b), jnp.int32),
                grid=grid,
                in_specs=[
                    const_spec(w0f),
                    const_spec(w1f),
                    const_spec(w0i),
                    const_spec(w1i),
                    pl.BlockSpec(
                        (2, 2, n_, tile),
                        lambda i, s: (i32(0), i32(0), i32(0), i.astype(i32)),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, n_, 2),
                        lambda i, s: (s.astype(i32), i32(0), i32(0)),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, jc, n_, 16),
                        lambda i, s: (s.astype(i32), i32(0), i32(0), i32(0)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (2, 2, n_, tile),
                    lambda i, s: (i32(0), i32(0), i32(0), i.astype(i32)),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 2, n_, tile), jnp.int32),    # acc_s
                    pltpu.VMEM((n_, jc * tile), jnp.int8),      # dig8_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),      # dnlo_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),      # dnhi_s
                    pltpu.VMEM((r, c * 2 * tile), jnp.int32),   # slo_s
                    pltpu.VMEM((r, c * 2 * tile), jnp.int32),   # shi_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),      # plo_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),      # phi_s
                    pltpu.VMEM((2, n_, tile), jnp.int32),       # ab_s
                    pltpu.VMEM((2, 7, n_, tile), jnp.int32),    # g_s
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=127 * 1024 * 1024,
                ),
                interpret=self.interpret,
            )(w0f, w1f, w0i, w1i, acc_limbs, auto, tk_bal)
            return out

        return call

    def __call__(self, acc_limbs, auto, tk_bal, tables=None):
        if tables is None:
            tables = self.host_tables
        return self._call(acc_limbs, auto, tk_bal, tables)
