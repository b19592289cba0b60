"""Fully-fused Pallas blind rotation for the 27-bit field.

One kernel runs the ENTIRE CMUX chain: grid = (batch_tiles, n_steps) with the
accumulator living in VMEM scratch across the sequential step dimension, so
per-step HBM traffic is just the BSK digit planes (int8) and the per-step
square-chain row — versus the XLA path which materialises digits, NTT stages,
MAC products and INTT temporaries in HBM every step.

In-kernel arithmetic is int32/int8 only (Mosaic has no int64):

* gadget decomposition: balanced signed 5-bit digits (int32 shifts; the
  Solinas correction term is approximated as ((x>>11)*eps)>>16, identical
  noise class);
* forward NTT of digits: the signed digit IS the single data plane (values
  in [-16,16]), so level-0 needs only L_w dots; level-1 and the inverse use
  the 4-plane unsigned path (shared Horner recombination with PallasNtt);
* MAC and the monomial multiply use plane-product elementwise modmuls
  (split both operands into 7-bit planes, int32 products, grouped Horner).

The BSK is consumed as int8 digit planes (L, N, d, 2, 2) — 4x smaller than
the int32+Shoup pair the XLA path reads.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_omr_tpu.ops.modmath import PrimeField
from tfhe_omr_tpu.ops.pallas_ntt import DIGIT_BITS, DIGIT_MASK, PallasNtt


def bsk_digit_planes(bsk_int: np.ndarray, levels: int) -> np.ndarray:
    """(L, n, N, d, 2, 2) int8 planes of an NTT-domain BSK (values < q)."""
    return np.stack(
        [
            ((bsk_int >> (DIGIT_BITS * k)) & DIGIT_MASK).astype(np.int8)
            for k in range(levels)
        ]
    )


class FusedBlindRotate:
    """blind_rotate(acc, amounts->sq_all, bsk_planes) as one Pallas kernel."""

    def __init__(
        self,
        field: PrimeField,
        ntt: PallasNtt,
        d: int,
        log_b: int,
        tile: int = 128,
        interpret: bool = False,
    ):
        assert field.bits <= 27
        self.field = field
        self.ntt = ntt
        self.d = d
        self.log_b = log_b
        self.tile = tile
        self.interpret = interpret
        self.levels = ntt.levels  # 7-bit planes per full-range operand
        self.n = ntt.n
        self.r = ntt.r
        self.c = ntt.c
        self.log2n = (2 * ntt.n).bit_length() - 1
        # order bit masks as an int32 (log2n, N) 0/1 device array
        ob = np.stack(
            [
                ((np.asarray(ntt.orders) >> j) & 1).astype(np.int32)
                for j in range(self.log2n)
            ]
        )
        self._order_bits = jnp.asarray(ob)
        self._call = self._make_call()

    # ------------------------------------------------- in-kernel primitives
    def _fold(self, v):
        f = self.field
        return (v >> f.bits) * jnp.int32(f.eps) + (
            v & jnp.int32((1 << f.bits) - 1)
        )

    def _norm(self, v):
        """Map a fold-reduced (possibly slightly negative) value into [0,q)."""
        q = jnp.int32(self.field.q)
        v = v + q * (v < 0)
        v = v - q * (v >= q)
        return v - q * (v >= q)

    def _planes(self, x):
        return [
            ((x >> jnp.int32(DIGIT_BITS * a)) & jnp.int32(DIGIT_MASK)).astype(
                jnp.int8
            )
            for a in range(self.levels)
        ]

    def _horner(self, s_groups):
        """Weighted recombination of 2^7-spaced groups, int32 Solinas."""
        f = self.field
        qbits = f.bits
        acc = s_groups[-1]
        for s in range(len(s_groups) - 2, -1, -1):
            acc = self._norm(self._fold(acc))
            hi = acc >> (qbits - DIGIT_BITS)
            lo = acc & jnp.int32((1 << (qbits - DIGIT_BITS)) - 1)
            acc = hi * jnp.int32(f.eps) + (lo << DIGIT_BITS) + s_groups[s]
            acc = self._fold(acc)
        return self._norm(self._fold(acc))

    def _elem_mul(self, x, y):
        """Elementwise x*y mod q via plane products (both in [0, q))."""
        xp = self._planes(x)
        yp = self._planes(y)
        L = self.levels
        groups = [None] * (2 * L - 1)
        for a in range(L):
            xa = xp[a].astype(jnp.int32)
            for b in range(L):
                s = a + b
                p = xa * yp[b].astype(jnp.int32)
                groups[s] = p if groups[s] is None else groups[s] + p
        return self._horner(groups)

    def _level_dot(self, x_planes, w_planes, out_rows, in_levels):
        """Matmul-NTT level: x_planes list of int8 (rows, X)."""
        L = self.levels
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
        return self._horner(groups)

    def _ntt_fwd_digits(self, digs, w0, w1, x_chunk=4096):
        """Forward NTT of signed digit polys.

        digs: (N, M) int32 signed in [-B/2, B/2); returns (N, M) in [0, q).
        Level 0 uses the single signed plane directly (L_in = 1).
        """
        n, r, c = self.n, self.r, self.c
        m = digs.shape[1]
        xv = digs.reshape(r, c * m)
        outs = []
        for s in range(0, c * m, x_chunk):
            e = min(c * m, s + x_chunk)
            outs.append(
                self._level_dot(
                    [xv[:, s:e].astype(jnp.int8)], w0, r, in_levels=1
                )
            )
        a_out = jnp.concatenate(outs, axis=1).reshape(r, c, m)
        out = []
        for k0 in range(r):
            out.append(
                self._level_dot(
                    self._planes(a_out[k0]), w1[k0], c, in_levels=self.levels
                )
            )
        return jnp.stack(out, axis=0).reshape(n, m)

    def _ntt_inv(self, x, w0i, w1i, x_chunk=4096):
        """Inverse NTT (full-range input), mirroring PallasNtt ordering."""
        n, r, c = self.n, self.r, self.c
        m = x.shape[1]
        xv = x.reshape(r, c, m)
        outs = []
        for k0 in range(r):
            outs.append(
                self._level_dot(
                    self._planes(xv[k0]), w1i[k0], c, in_levels=self.levels
                )
            )
        y = jnp.stack(outs, axis=0).reshape(r, c * m)
        zs = []
        for s in range(0, c * m, x_chunk):
            e = min(c * m, s + x_chunk)
            zs.append(
                self._level_dot(
                    self._planes(y[:, s:e]), w0i, r, in_levels=self.levels
                )
            )
        return jnp.concatenate(zs, axis=1).reshape(n, m)

    def _decompose(self, x):
        """Balanced signed 5-bit digits of x in [0, q), int32-only.

        u = round(x * B^d / q) via the shifted Solinas series; digits
        LSB-first with carry, final carry drops mod q.
        """
        f = self.field
        d, log_b = self.d, self.log_b
        shift = f.bits - d * log_b
        corr = ((x >> 11) * jnp.int32(f.eps)) >> (f.bits - 11)
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
        return digs  # list of (..., ) int32 signed

    # ------------------------------------------------------------ the kernel
    def _make_call(self):
        n, r, c, d = self.n, self.r, self.c, self.d
        L = self.levels
        log2n = self.log2n
        pn = self.ntt
        w0f, w1f = pn._w0_f, pn._w1_f
        w0i, w1i = pn._w0_i, pn._w1_i
        order_bits = self._order_bits

        def kernel(
            w0f_ref, w1f_ref, w0i_ref, w1i_ref, ob_ref,
            acc_ref, sq_ref, bsk_ref, o_ref, acc_scratch,
        ):
            step = pl.program_id(1)
            n_steps = pl.num_programs(1)
            bt = acc_ref.shape[2]

            @pl.when(step == 0)
            def _():
                acc_scratch[:] = acc_ref[:]

            acc = acc_scratch[:]  # (2, N, Bt) int32
            # --- decompose both polys -> d x (2, N, Bt) signed digits
            flat = acc.transpose(1, 0, 2).reshape(n, 2 * bt)
            digs = self._decompose(flat)  # d x (N, 2*Bt)
            # --- NTT the digit polys in two halves to halve liveness, and
            # accumulate the MAC groups per half
            bskp = bsk_ref[0]  # (L, d*2*2, N) int8
            groups = [None] * (2 * L - 1)
            half = d // 2 if d % 2 == 0 else d
            for h0 in range(0, d, half):
                h1 = min(d, h0 + half)
                dstack = jnp.concatenate(digs[h0:h1], axis=1)
                dn = self._ntt_fwd_digits(dstack, w0f_ref[:], w1f_ref[:])
                dn = dn.reshape(n, (h1 - h0), 2, bt)
                dnp = self._planes(dn)  # L x (N, hd, 2, Bt) int8
                for a in range(L):
                    for b in range(L):
                        s_ = a + b
                        outs_o = []
                        for o in range(2):
                            acc_o = None
                            for j in range(h0, h1):
                                for cc in range(2):
                                    row = bskp[b, (j * 2 + cc) * 2 + o]
                                    t = dnp[a][:, j - h0, cc, :].astype(
                                        jnp.int32
                                    ) * row.astype(jnp.int32)[:, None]
                                    acc_o = t if acc_o is None else acc_o + t
                            outs_o.append(acc_o)
                        pprod = jnp.stack(outs_o, axis=0)  # (2, N, Bt)
                        groups[s_] = (
                            pprod if groups[s_] is None else groups[s_] + pprod
                        )
            p = self._horner(groups)  # (2, N, Bt)
            # --- monomial multiply
            sq_i = sq_ref[0]  # (log2n, Bt) int32
            ob = ob_ref[:]  # (log2n, N) int32 0/1
            mono = None
            one = jnp.ones((n, bt), dtype=jnp.int32)
            for j in range(log2n):
                sel = ob[j][:, None]  # (N, 1)
                term = sel * sq_i[j][None, :] + (1 - sel) * one  # (N, Bt)
                mono = term if mono is None else self._elem_mul(mono, term)
            q32 = jnp.int32(self.field.q)
            mono = mono - 1
            mono = mono + q32 * (mono < 0)
            p = self._elem_mul(
                p.transpose(1, 0, 2).reshape(n, 2 * bt),
                jnp.broadcast_to(mono[:, None, :], (n, 2, bt)).reshape(
                    n, 2 * bt
                ),
            )
            # --- inverse NTT and accumulate
            delta = (
                self._ntt_inv(p, w0i_ref[:], w1i_ref[:])
                .reshape(n, 2, bt)
                .transpose(1, 0, 2)
            )
            new_acc = acc + delta
            new_acc = new_acc - q32 * (new_acc >= q32)
            acc_scratch[:] = new_acc

            @pl.when(step == n_steps - 1)
            def _():
                o_ref[:] = new_acc

        def call(acc, sq_all, bsk_planes):
            """acc (N, 2, B) int32; sq_all (log2n, n_steps, B) int32;
            bsk_planes (n_steps, L, N, d, 2, 2) int8 -> (N, 2, B) int32."""
            n_, _, b = acc.shape
            n_steps = sq_all.shape[1]
            # layouts chosen for Mosaic: trailing dims must tile (8, 128)
            acc_t = acc.transpose(1, 0, 2)  # (2, N, B)
            sq_all = sq_all.transpose(1, 0, 2)  # (n_steps, log2n, B)
            # (n_steps, L, N, d, 2, 2) -> (n_steps, L, d*2*2, N)
            bskp = bsk_planes.transpose(0, 1, 3, 4, 5, 2).reshape(
                n_steps, self.levels, d * 4, n_
            )
            tile = min(self.tile, b)
            assert b % tile == 0, (b, tile)
            i32 = jnp.int32
            grid = (b // tile, n_steps)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, n_, b), jnp.int32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        w0f.shape, lambda i, s: (i32(0),) * w0f.ndim,
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        w1f.shape, lambda i, s: (i32(0),) * w1f.ndim,
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        w0i.shape, lambda i, s: (i32(0),) * w0i.ndim,
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        w1i.shape, lambda i, s: (i32(0),) * w1i.ndim,
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        order_bits.shape,
                        lambda i, s: (i32(0), i32(0)),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (2, n_, tile),
                        lambda i, s: (i32(0), i32(0), i.astype(jnp.int32)),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, self.log2n, tile),
                        lambda i, s: (
                            s.astype(jnp.int32), i32(0), i.astype(jnp.int32)
                        ),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, self.levels, d * 4, n_),
                        lambda i, s: (
                            s.astype(jnp.int32), i32(0), i32(0), i32(0)
                        ),
                        memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (2, n_, tile),
                    lambda i, s: (i32(0), i32(0), i.astype(jnp.int32)),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.VMEM((2, n_, tile), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(w0f, w1f, w0i, w1i, order_bits, acc_t, sq_all, bskp)
            return out.transpose(1, 0, 2)

        return call

    def __call__(self, acc, sq_all, bsk_planes):
        return self._call(acc, sq_all, bsk_planes)


class PallasMono:
    """Standalone Pallas kernel for the monomial multiplier product.

    Computes ``mono[k, m] = prod_j sq[j, m]^(order_bit_j(k)) - 1`` — i.e.
    ``NTT(X^a - 1)`` — for one CMUX step, with the same int32 plane-product
    Horner arithmetic as FusedBlindRotate. The XLA ladder materialises ~11
    (N, B) intermediates per step; in-kernel it is one write.
    """

    def __init__(self, field, ntt, tile: int = 128, interpret: bool = False):
        assert field.bits <= 27
        self.field = field
        self.n = ntt.n
        self.tile = tile
        self.interpret = interpret
        self.levels = -(-field.bits // DIGIT_BITS)
        self.log2n = (2 * ntt.n).bit_length() - 1
        ob = np.stack(
            [
                ((np.asarray(ntt.orders) >> j) & 1).astype(np.int32)
                for j in range(self.log2n)
            ]
        )
        self._order_bits = jnp.asarray(ob)
        # borrow the arithmetic helpers
        self._fb = FusedBlindRotate.__new__(FusedBlindRotate)
        self._fb.field = field
        self._fb.levels = self.levels
        self._call = self._make_call()

    def _make_call(self):
        n = self.n
        log2n = self.log2n
        ob_arr = self._order_bits
        fb = self._fb
        q_int = int(self.field.q)

        def kernel(ob_ref, sq_ref, o_ref):
            q32 = jnp.int32(q_int)
            bt = sq_ref.shape[1]
            sq = sq_ref[:]  # (log2n, Bt) int32
            ob = ob_ref[:]  # (log2n, N)
            one = jnp.ones((n, bt), dtype=jnp.int32)
            mono = None
            for j in range(log2n):
                sel = ob[j][:, None]
                term = sel * sq[j][None, :] + (1 - sel) * one
                mono = term if mono is None else fb._elem_mul(mono, term)
            mono = mono - 1
            o_ref[:] = mono + q32 * (mono < 0)

        def call(sq_i):
            """sq_i (log2n, B) int32 -> (N, B) int32 mono values."""
            b = sq_i.shape[1]
            tile = min(self.tile, b)
            pad = (-b) % tile
            if pad:
                sq_i = jnp.concatenate(
                    [sq_i, jnp.ones((log2n, pad), sq_i.dtype)], axis=1
                )
            i32 = jnp.int32
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, sq_i.shape[1]), jnp.int32),
                grid=(sq_i.shape[1] // tile,),
                in_specs=[
                    pl.BlockSpec(
                        ob_arr.shape,
                        lambda i: (i32(0), i32(0)),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (log2n, tile),
                        lambda i: (i32(0), i.astype(jnp.int32)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (n, tile),
                    lambda i: (i32(0), i.astype(jnp.int32)),
                    memory_space=pltpu.VMEM,
                ),
                interpret=self.interpret,
            )(ob_arr, sq_i.astype(jnp.int32))
            return out[:, :b] if pad else out

        return call

    def __call__(self, sq_i):
        return self._call(sq_i)
