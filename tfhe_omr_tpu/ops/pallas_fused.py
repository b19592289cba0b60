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
    ):
        assert field.bits <= 27
        self.skip = skip  # timing ablations: {"dec","fwd","mono","mac","intt"}
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
        self._oh_lo = jnp.asarray(oh_lo)
        self._oh_hi = jnp.asarray(oh_hi)
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

    def _horner7(self, groups):
        """Recombine 2**7-spaced int32 groups (possibly signed) mod q."""
        f = self.field
        qbits = f.bits
        acc = groups[-1]
        for s in range(len(groups) - 2, -1, -1):
            acc = self._norm(self._fold(acc))
            hi = acc >> (qbits - DIGIT_BITS)
            lo = acc & jnp.int32((1 << (qbits - DIGIT_BITS)) - 1)
            acc = hi * jnp.int32(f.eps) + (lo << DIGIT_BITS) + groups[s]
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

    def _level_dot(self, x_planes, w_planes, out_rows):
        """Digit-matmul NTT level: x_planes list of int8 (rows, X)."""
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
    def _make_call(self):
        n, r, c, d = self.n, self.r, self.c, self.d
        pn = self.ntt
        w0f, w1f = pn._w0_f, pn._w1_f
        w0i, w1i = pn._w0_i, pn._w1_i
        oh_lo, oh_hi = self._oh_lo, self._oh_hi
        jc = 2 * d  # digit columns per batch element
        lvl0_chunk = 8192

        def kernel(
            w0f_ref, w1f_ref, w0i_ref, w1i_ref, ohlo_ref, ohhi_ref,
            acc_ref, p1_ref, p2_ref, bsk_ref,
            o_ref,
            acc_s, dig_s, a_s, p_s, y_s,
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
            if "fwd" not in skip:
                # level 0: single signed int8 data plane
                xv = dig_s[:].reshape(r, c * jc * bt)
                for s0 in range(0, c * jc * bt, lvl0_chunk):
                    e0 = min(c * jc * bt, s0 + lvl0_chunk)
                    a_s[:, s0:e0] = self._level_dot(
                        [xv[:, s0:e0].astype(jnp.int8)], w0f_ref[:], r
                    )
                # level 1: per-k0 twiddle-folded matrices, full-range input
                av = a_s[:].reshape(r, c, jc * bt)
                for k0 in range(r):
                    dig_s[k0 * c : (k0 + 1) * c, :] = self._level_dot(
                        self._planes7(av[k0]), w1f_ref[k0], c
                    )

            # ---- 3. mono multiplier values (N, Bt)
            if "mono" not in skip:
                sel1 = self._onehot_mono(ohlo_ref[:], p1_ref[0])
                sel2 = self._onehot_mono(ohhi_ref[:], p2_ref[0])
                mono = self._mul_balanced(sel1, sel2) - 1
                mono = mono + q32 * (mono < 0)
            else:
                mono = p1_ref[0, 0:1, :] + jnp.zeros((n, bt), jnp.int32)
            m_lo, m_hi = self._balance(mono)

            # ---- 4. MAC + mono multiply -> p_s (N, 2*Bt), cols (o, b)
            if "mac" not in skip:
                dn = dig_s[:]  # (N, jc*Bt)
                kb = bsk_ref[0]  # (N, 32) balanced plane columns
                for o in range(2):
                    g0 = jnp.zeros((n, bt), dtype=jnp.int32)
                    g1 = jnp.zeros((n, bt), dtype=jnp.int32)
                    g2 = jnp.zeros((n, bt), dtype=jnp.int32)
                    for j in range(d):
                        for cc in range(2):
                            col = (j * 2 + cc) * bt
                            base = ((0 * d + j) * 2 + cc) * 2 + o
                            k_lo = kb[:, base : base + 1]
                            k_hi = kb[:, 16 + base : 16 + base + 1]
                            vl, vh = self._balance(
                                dn[:, col : col + bt]
                            )
                            g0 = g0 + vl * k_lo
                            g1 = g1 + vl * k_hi + vh * k_lo
                            g2 = g2 + vh * k_hi
                    p = self._recombine14(g0, g1, g2)  # (N, Bt) in [0, q)
                    # multiply by mono (both balanced; exact)
                    p_lo, p_hi = self._balance(p)
                    p_s[:, o * bt : (o + 1) * bt] = self._recombine14(
                        p_lo * m_lo, p_lo * m_hi + p_hi * m_lo, p_hi * m_hi
                    )

            # ---- 5. inverse NTT of p_s -> delta, accumulate into acc_s
            if "intt" not in skip:
                pv = p_s[:].reshape(r, c, 2 * bt)
                for k0 in range(r):
                    y_s[k0 : k0 + 1, :] = self._level_dot(
                        self._planes7(pv[k0]), w1i_ref[k0], c
                    ).reshape(1, c * 2 * bt)
                z = self._level_dot(self._planes7(y_s[:]), w0i_ref[:], r)
                delta = z.reshape(n, 2, bt).transpose(1, 0, 2)
            else:
                delta = p_s[:].reshape(n, 2, bt).transpose(1, 0, 2)
            new_acc = acc_s[:] + delta
            new_acc = new_acc - q32 * (new_acc >= q32)
            acc_s[:] = new_acc

            @pl.when(step == n_steps - 1)
            def _():
                o_ref[:] = new_acc

        def call(acc, p1, p2, bsk_bal):
            """acc (N, 2, B) int32; p1 (n_lo, n_steps, B) int32;
            p2 (n_hi, n_steps, B); bsk_bal (n_steps, N, 32) int32
            -> (N, 2, B) int32."""
            p1 = p1.transpose(1, 0, 2)  # (n_steps, n_lo, B)
            p2 = p2.transpose(1, 0, 2)
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
                    pl.BlockSpec(
                        (1, self.n_lo, tile),
                        lambda i, s: (s.astype(i32), i32(0), i.astype(i32)),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, self.n_hi, tile),
                        lambda i, s: (s.astype(i32), i32(0), i.astype(i32)),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, n_, 32),
                        lambda i, s: (s.astype(i32), i32(0), i32(0)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (2, n_, tile),
                    lambda i, s: (i32(0), i32(0), i.astype(i32)),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, n_, tile), jnp.int32),       # acc_s
                    pltpu.VMEM((n_, jc * tile), jnp.int32),     # dig_s / dn
                    pltpu.VMEM((r, c * jc * tile), jnp.int32),  # a_s
                    pltpu.VMEM((n_, 2 * tile), jnp.int32),      # p_s
                    pltpu.VMEM((r, c * 2 * tile), jnp.int32),   # y_s
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
                interpret=self.interpret,
            )(w0f, w1f, w0i, w1i, oh_lo, oh_hi, acc, p1, p2, bsk_bal)
            return out.transpose(1, 0, 2)

        return call

    def __call__(self, acc, p1, p2, bsk_bal):
        return self._call(acc, p1, p2, bsk_bal)
