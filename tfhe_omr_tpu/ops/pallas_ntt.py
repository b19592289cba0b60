"""Pallas TPU NTT: two-level digit-matmul transform for the 27-bit field.

Mosaic (the Pallas TPU compiler) has no 64-bit integer support, so this
kernel computes the negacyclic NTT with int8 MXU dots + int32 VPU Solinas
arithmetic only:

* the transform is the two-level factorisation N = R * C of
  :class:`tfhe_omr_tpu.ops.ntt_smallfield.SmallFieldNtt` (psi-twist folded
  into the constant matrices, the inter-level twiddle folded into per-k0
  level-1 matrices), so orderings and values are bit-identical to the jnp
  implementation this class wraps;
* every constant matrix is pre-split into ``L = ceil(bits/7)`` unsigned
  7-bit digit planes (int8); data is digit-split in-kernel;
* a level is: for each data plane ``a``: one MXU dot against the stacked
  matrix planes, accumulated into weight groups ``S_s`` (s = a+b), then a
  Horner recombination ``acc = acc*2^7 + S_s`` with int32 Solinas folds —
  exact because q < 2^27 and all group sums stay below 2^31.

The whole transform runs in VMEM: one HBM read + one write per tile, versus
one per butterfly stage for the XLA paths.

``PallasNtt`` exposes the same interface as SmallFieldNtt; on non-TPU
backends (tests, keygen) it transparently falls back to the wrapped jnp
implementation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_omr_tpu.ops.modmath import PrimeField
from tfhe_omr_tpu.ops.ntt_smallfield import SmallFieldNtt

DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def _digit_plane_stack(mat: np.ndarray, levels: int) -> np.ndarray:
    """Stack L unsigned-7-bit planes of ``mat`` along axis 0 (rows)."""
    planes = [
        ((mat >> (DIGIT_BITS * k)) & DIGIT_MASK).astype(np.int8)
        for k in range(levels)
    ]
    return np.concatenate(planes, axis=0)


def _digit_plane_stack_balanced(
    mat: np.ndarray, levels: int, q: int
) -> np.ndarray:
    """Stack L BALANCED signed-7-bit planes (values in [-64, 64)) of the
    centered representative of ``mat`` mod q. Same represented values as
    :func:`_digit_plane_stack` mod q, but halved plane magnitude: dot-
    product groups against |x| <= 64 data stay below 2**23 even at
    2048-deep contractions, which keeps the radix-14 paired Horner legal
    in the fused kernels' single-dot mode (unpaired 15-group recombination
    blew v5e's VMEM with register spills — round-4 probes)."""
    v = mat.astype(np.int64)
    v = v - q * (v > q // 2)
    planes = []
    r = v
    for _ in range(levels):
        d = ((r + 64) & 127) - 64
        planes.append(d.astype(np.int8))
        r = (r - d) >> DIGIT_BITS
    assert not r.any(), "levels too small for balanced planes"
    return np.concatenate(planes, axis=0)


class PallasNtt:
    """SmallFieldNtt-compatible NTT that runs as a fused Pallas kernel."""

    def __init__(
        self,
        field: PrimeField,
        n: int,
        r: int = 32,
        tile: int = 256,
        interpret: bool = False,
    ):
        assert field.bits <= 27, "int32 Horner recombination needs q < 2^27"
        c = n // r
        assert r * c == n and c > 1
        self.field = field
        self.n = n
        self.r = r
        self.c = c
        self.tile = tile
        self.interpret = interpret
        self.levels = -(-field.bits // DIGIT_BITS)
        # the jnp reference carrying plan, orders, psi, host helpers
        self.ref = SmallFieldNtt(field, n, radices=[r, c])
        self.psi = self.ref.psi
        self.n_inv = self.ref.n_inv
        self.orders = self.ref.orders
        self._psi_pow_2n = self.ref._psi_pow_2n

        q = field.q
        # ---- forward constants
        mat0_f, tw0_f, _, _, _ = self.ref._fwd_plan[0]
        mat1_f, _, _, _, _ = self.ref._fwd_plan[1]
        w1k_f = np.stack(
            [mat1_f * tw0_f[k0][None, :] % q for k0 in range(r)]
        )  # (r, c, c)
        # tables stay HOST-side numpy: a device-array closure constant
        # forces a device->host fetch at trace time (catastrophically slow
        # on tunneled backends, see docs/PERF_NOTES.md round-3 cold start);
        # hot programs receive the device copies as jit ARGUMENTS instead
        self._w0_f = _digit_plane_stack(mat0_f, self.levels)
        self._w1_f = np.stack(
            [_digit_plane_stack(w1k_f[k0], self.levels) for k0 in range(r)]
        )  # (r, L*c, c)
        # ---- inverse constants (levels run 1 then 0; tw0^-1 folded into the
        # level-1 inverse matrices' output rows)
        mat0_i, tw0_i, _, _, _ = self.ref._inv_plan[0]
        mat1_i, _, _, _, _ = self.ref._inv_plan[1]
        w1k_i = np.stack(
            [mat1_i * tw0_i[k0][:, None] % q for k0 in range(r)]
        )
        self._w0_i = _digit_plane_stack(mat0_i, self.levels)
        self._w1_i = np.stack(
            [_digit_plane_stack(w1k_i[k0], self.levels) for k0 in range(r)]
        )
        # single-stage full DFT matrices (used by the fused kernel's
        # single-dot mode): M_f[k, j] = psi^(o_k * j),
        # M_i[j, k] = n_inv * psi^(-o_k * j) — mathematically identical to
        # the two-level plan (same orders), so results stay bit-exact
        pow2n = self.ref._psi_pow_2n
        two_n = 2 * n
        oj = (np.asarray(self.orders)[:, None] * np.arange(n)[None, :]) % two_n
        mf = pow2n[oj]
        mi = (pow2n[(-oj) % two_n] * self.n_inv) % q
        self._wf_full = _digit_plane_stack(mf, self.levels)
        self._wi_full = _digit_plane_stack(mi.T, self.levels)
        self._wf_full_bal = _digit_plane_stack_balanced(mf, self.levels, q)

        self._fwd_call = self._make_call(inverse=False)
        self._inv_call = self._make_call(inverse=True)

    # ---------------------------------------------------------------- kernel
    def _level_dot(self, x_val, w_planes, out_rows):
        """x_val (rows, X) int32 mod q; w_planes (L*out_rows, rows) int8."""
        f = self.field
        qbits, eps, q = f.bits, f.eps, f.q
        levels = self.levels
        n_groups = 2 * levels - 1
        s_groups = [None] * n_groups
        for a in range(levels):
            da = (
                (x_val >> jnp.int32(DIGIT_BITS * a)) & jnp.int32(DIGIT_MASK)
            ).astype(jnp.int8)
            p = jax.lax.dot_general(
                w_planes,
                da,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (L*out_rows, X)
            for b in range(levels):
                s = a + b
                blk = p[b * out_rows : (b + 1) * out_rows]
                s_groups[s] = blk if s_groups[s] is None else s_groups[s] + blk
        # pairwise pre-merge (groups < 2**22, pairs < 2**29): halves the
        # per-element mod-q fold chain by running it at radix 2**14
        paired = [
            s_groups[s] + (s_groups[s + 1] << DIGIT_BITS)
            if s + 1 < n_groups
            else s_groups[s]
            for s in range(0, n_groups, 2)
        ]
        radix = 2 * DIGIT_BITS
        acc = paired[-1]
        for s in range(len(paired) - 2, -1, -1):
            # acc*2^14 mod q in int32: acc = hi*2^(qbits-14) + lo
            acc = acc - jnp.int32(q) * (acc >= jnp.int32(q))
            hi = acc >> (qbits - radix)
            lo = acc & jnp.int32((1 << (qbits - radix)) - 1)
            acc = hi * jnp.int32(eps) + (lo << radix) + paired[s]
            acc = (acc >> qbits) * jnp.int32(eps) + (
                acc & jnp.int32((1 << qbits) - 1)
            )
        acc = (acc >> qbits) * jnp.int32(eps) + (
            acc & jnp.int32((1 << qbits) - 1)
        )
        acc = acc - jnp.int32(q) * (acc >= jnp.int32(q))
        return acc - jnp.int32(q) * (acc >= jnp.int32(q))

    def _make_call(self, inverse: bool):
        n, r, c = self.n, self.r, self.c
        w0_shape = (self._w0_i if inverse else self._w0_f).shape
        w1_shape = (self._w1_i if inverse else self._w1_f).shape

        def kernel(w0_ref, w1_ref, x_ref, o_ref):
            bt = x_ref.shape[1]
            x = x_ref[:]
            w0k = w0_ref[:]
            w1k = w1_ref[:]
            if inverse:
                xv = x.reshape(r, c, bt)
                outs = [
                    self._level_dot(xv[k0], w1k[k0], c) for k0 in range(r)
                ]
                y = jnp.stack(outs, axis=0).reshape(r, c * bt)
                z = self._level_dot(y, w0k, r)
                o_ref[:] = z.reshape(n, bt)
            else:
                a_out = self._level_dot(x.reshape(r, c * bt), w0k, r)
                av = a_out.reshape(r, c, bt)
                outs = [
                    self._level_dot(av[k0], w1k[k0], c) for k0 in range(r)
                ]
                o_ref[:] = jnp.stack(outs, axis=0).reshape(n, bt)

        def call(x, w0, w1):
            n_, b = x.shape
            tile = min(self.tile, b)
            pad = (-b) % tile
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((n_, pad), x.dtype)], axis=1
                )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
                grid=(x.shape[1] // tile,),
                # index maps cast to int32: Mosaic rejects the i64 indices
                # produced under jax_enable_x64
                in_specs=[
                    pl.BlockSpec(
                        w0_shape,
                        lambda i: (jnp.int32(0),) * len(w0_shape),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        w1_shape,
                        lambda i: (jnp.int32(0),) * len(w1_shape),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (n_, tile),
                        lambda i: (jnp.int32(0), i.astype(jnp.int32)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (n_, tile),
                    lambda i: (jnp.int32(0), i.astype(jnp.int32)),
                    memory_space=pltpu.VMEM,
                ),
                interpret=self.interpret,
            )(w0, w1, x.astype(jnp.int32))
            return out[:, :b] if pad else out

        return call

    # ------------------------------------------------------------- interface
    @property
    def fwd_tables(self):
        """Host numpy (w0, w1) of the forward transform — device_put once
        and pass back via ``fwd(x, tables=...)`` in hot jitted programs."""
        return (self._w0_f, self._w1_f)

    @property
    def inv_tables(self):
        return (self._w0_i, self._w1_i)

    def _pallas_ok(self) -> bool:
        """Use the kernel only when dispatching to a non-CPU backend (the
        eager keygen path is pinned to CPU via utils.devices.host_math)."""
        if self.interpret:
            return True
        dev = jax.config.jax_default_device
        if dev is None:
            dev = jax.devices()[0]
        return getattr(dev, "platform", "cpu") != "cpu"

    def _flat_batch(self, x):
        flat = 1
        for s in x.shape[1:]:
            flat *= s
        return flat

    def fwd(self, x, tables=None):
        # Mosaic lane tiles need >=128 columns; tiny batches (e.g. the
        # client-side decrypt of a handful of ciphertexts) use the jnp twin
        if not self._pallas_ok() or self._flat_batch(x) < 128:
            return self.ref.fwd(x)
        w0, w1 = tables if tables is not None else self.fwd_tables
        batch = x.shape[1:]
        out = self._fwd_call(x.reshape(self.n, self._flat_batch(x)), w0, w1)
        return out.reshape((self.n,) + batch)

    def inv(self, x, tables=None):
        if not self._pallas_ok() or self._flat_batch(x) < 128:
            return self.ref.inv(x)
        w0, w1 = tables if tables is not None else self.inv_tables
        batch = x.shape[1:]
        out = self._inv_call(x.reshape(self.n, self._flat_batch(x)), w0, w1)
        return out.reshape((self.n,) + batch)

    def fwd_last(self, x, tables=None):
        return jnp.moveaxis(self.fwd(jnp.moveaxis(x, -1, 0), tables), 0, -1)

    def inv_last(self, x, tables=None):
        return jnp.moveaxis(self.inv(jnp.moveaxis(x, -1, 0), tables), 0, -1)

    def monomial_minus_one_tables(self):
        return self.ref.monomial_minus_one_tables()

    def monomial_exponents(self, a):
        return self.ref.monomial_exponents(a)


class PallasNtt50:
    """Two-level digit-matmul NTT for wide fields (q up to 2^50), Pallas TPU.

    Mosaic has no int64, so field elements cross the kernel boundary as two
    int32 limbs (lo = x & (2^25-1), hi = x >> 25) and the in-kernel Horner
    recombination runs on (lo, hi) pairs in radix 2^25 with Solinas folds
    (2^50 == eps mod q). Data digit planes: 3 x 7-bit from bits 0..20 plus
    5 x 7-bit from bits 21.. — a uniform 2^7 weight grid with 15 groups.

    Ordering equals the shared mixed-radix plan; off TPU the class falls back
    to a radix-2 NegacyclicNtt composed with the static permutation that maps
    between the two evaluation orders (bit-identical values).
    """

    def __init__(
        self,
        field: PrimeField,
        n: int,
        r: int = 32,
        tile: int = 128,
        x_chunk: int = 1024,
        interpret: bool = False,
    ):
        assert field.bits == 50, "dual-limb Solinas folds assume q = 2^50 - eps"
        from tfhe_omr_tpu.ops.ntt import NegacyclicNtt
        from tfhe_omr_tpu.ops.ntt_smallfield import build_mixed_radix_plan

        c = n // r
        self.field = field
        self.n = n
        self.r = r
        self.c = c
        self.tile = tile
        self.x_chunk = x_chunk
        self.interpret = interpret
        self.levels = 8  # data/matrix digit planes (7-bit)
        self.ref2 = NegacyclicNtt(field, n)
        self.psi = self.ref2.psi
        self.n_inv = self.ref2.n_inv
        self._psi_pow_2n = self.ref2._psi_pow_2n
        q = field.q

        fwd_plan = build_mixed_radix_plan(field, n, [r, c], self.psi, False)
        inv_plan = build_mixed_radix_plan(field, n, [r, c], self.psi, True)
        mat0_f, tw0_f = fwd_plan[0][0], fwd_plan[0][1]
        mat1_f = fwd_plan[1][0]
        mat0_i, tw0_i = inv_plan[0][0], inv_plan[0][1]
        mat1_i = inv_plan[1][0]

        def fold_obj(m1, tw, by_rows):
            m1o = m1.astype(object)
            out = []
            for k0 in range(r):
                t = tw[k0].astype(object)
                out.append(
                    (m1o * (t[:, None] if by_rows else t[None, :])) % q
                )
            return np.stack([o.astype(np.int64) for o in out])

        w1k_f = fold_obj(mat1_f, tw0_f, by_rows=False)
        w1k_i = fold_obj(mat1_i, tw0_i, by_rows=True)
        # HOST-side numpy (see PallasNtt note): device copies ride jit args
        self._w0_f = _digit_plane_stack(mat0_f, self.levels)
        self._w1_f = np.stack(
            [_digit_plane_stack(w1k_f[k0], self.levels) for k0 in range(r)]
        )
        self._w0_i = _digit_plane_stack(mat0_i, self.levels)
        self._w1_i = np.stack(
            [_digit_plane_stack(w1k_i[k0], self.levels) for k0 in range(r)]
        )

        # two-level evaluation orders via exact host evaluation of delta_1,
        # and the permutation to/from the radix-2 reference ordering
        delta = np.zeros(n, dtype=object)
        delta[1] = 1
        col = self._host_apply(delta, fwd_plan)
        dlog = {int(self._psi_pow_2n[i]): i for i in range(2 * n)}
        self.orders = np.array([dlog[int(v)] for v in col], dtype=np.int64)
        ref_pos = {int(o): i for i, o in enumerate(self.ref2.orders)}
        self._perm = np.array(
            [ref_pos[int(o)] for o in self.orders], dtype=np.int64
        )
        self._perm_inv = np.argsort(self._perm)

        # full forward DFT matrix (fused kernel's single-dot forward mode):
        # M_f[k, j] = psi^(o_k * j) — same orders, bit-exact; pure table
        # lookup, no modular multiplies needed
        two_n = 2 * n
        oj = (self.orders[:, None] * np.arange(n, dtype=np.int64)[None, :]) % two_n
        self._wf_full = _digit_plane_stack(
            np.asarray(self._psi_pow_2n)[oj], self.levels
        )
        self._wf_full_bal = _digit_plane_stack_balanced(
            np.asarray(self._psi_pow_2n)[oj], self.levels, self.field.q
        )

        self._fwd_call = self._make_call(inverse=False)
        self._inv_call = self._make_call(inverse=True)

    # ------------------------------------------------------------------ host
    def _host_apply(self, x_obj, plan):
        """Exact object-int application of the two-level plan to one column."""
        q = self.field.q
        r, c = self.r, self.c
        mat0, tw0 = plan[0][0], plan[0][1]
        mat1 = plan[1][0]
        xv = x_obj.reshape(r, c)
        a = (mat0.astype(object) @ xv) % q  # (r, c)
        a = (a * tw0.astype(object)) % q
        out = np.empty((r, c), dtype=object)
        for k0 in range(r):
            out[k0] = (mat1.astype(object) @ a[k0]) % q
        return out.reshape(r * c)

    # ---------------------------------------------------------------- kernel
    def _digit_planes(self, lo, hi):
        """8 int8 planes from 25-bit limbs (21-bit digit alignment)."""
        lo21 = lo & jnp.int32((1 << 21) - 1)
        hi21 = (hi << 4) | (lo >> 21)  # bits 21.. (< 2^29)
        planes = []
        for a in range(3):
            planes.append(
                ((lo21 >> (7 * a)) & jnp.int32(DIGIT_MASK)).astype(jnp.int8)
            )
        for a in range(5):
            planes.append(
                ((hi21 >> (7 * a)) & jnp.int32(DIGIT_MASK)).astype(jnp.int8)
            )
        return planes

    def _level_dot50(self, lo, hi, w_planes, out_rows):
        """(lo, hi) (rows, X) int32 -> (lo, hi) (out_rows, X) mod q."""
        f = self.field
        q = f.q
        eps = f.eps
        m25 = jnp.int32((1 << 25) - 1)
        m18 = jnp.int32((1 << 18) - 1)
        levels = self.levels
        n_groups = 2 * levels - 1
        planes = self._digit_planes(lo, hi)
        s_groups = [None] * n_groups
        for a in range(levels):
            p = jax.lax.dot_general(
                w_planes,
                planes[a],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for b in range(levels):
                s = a + b
                blk = p[b * out_rows : (b + 1) * out_rows]
                s_groups[s] = blk if s_groups[s] is None else s_groups[s] + blk
        # dual-word Horner in radix 2^25: value = ahi*2^25 + alo
        alo = s_groups[n_groups - 1]
        ahi = jnp.zeros_like(alo)
        for s in range(n_groups - 2, -1, -1):
            lo2 = ((alo & m18) << 7) + (ahi >> 18) * jnp.int32(eps)
            hi2 = ((ahi & m18) << 7) + (alo >> 18)
            lo2 = lo2 + s_groups[s]
            carry = lo2 >> 25
            alo = lo2 & m25
            ahi = hi2 + carry
            over = ahi >> 25
            ahi = ahi & m25
            alo = alo + over * jnp.int32(eps)
        # normalise and reduce below q
        ahi = ahi + (alo >> 25)
        alo = alo & m25
        alo = alo + (ahi >> 25) * jnp.int32(eps)
        ahi = ahi & m25
        ahi = ahi + (alo >> 25)
        alo = alo & m25
        q_lo = jnp.int32(q & ((1 << 25) - 1))
        q_hi = jnp.int32(q >> 25)
        for _ in range(2):
            ge = (ahi > q_hi) | ((ahi == q_hi) & (alo >= q_lo))
            borrow = ((alo < q_lo) & ge).astype(jnp.int32)
            gei = ge.astype(jnp.int32)
            alo = alo - gei * q_lo + (borrow << 25)
            ahi = ahi - gei * q_hi - borrow
        return alo, ahi

    def _make_call(self, inverse: bool):
        n, r, c = self.n, self.r, self.c
        w0_shape = (self._w0_i if inverse else self._w0_f).shape
        w1_shape = (self._w1_i if inverse else self._w1_f).shape
        xc = self.x_chunk

        def level0(lo, hi, w0k, X):
            """chunked over the X axis to bound VMEM."""
            outs = []
            for s in range(0, X, xc):
                e = min(X, s + xc)
                outs.append(
                    self._level_dot50(lo[:, s:e], hi[:, s:e], w0k, r)
                )
            alo = jnp.concatenate([o[0] for o in outs], axis=1)
            ahi = jnp.concatenate([o[1] for o in outs], axis=1)
            return alo, ahi

        def kernel(w0_ref, w1_ref, x_ref, o_ref):
            bt = x_ref.shape[2]
            lo = x_ref[0]
            hi = x_ref[1]
            w0k = w0_ref[:]
            w1k = w1_ref[:]
            if inverse:
                lo_v = lo.reshape(r, c, bt)
                hi_v = hi.reshape(r, c, bt)
                lo_o, hi_o = [], []
                for k0 in range(r):
                    a, b = self._level_dot50(lo_v[k0], hi_v[k0], w1k[k0], c)
                    lo_o.append(a)
                    hi_o.append(b)
                lo1 = jnp.stack(lo_o, axis=0).reshape(r, c * bt)
                hi1 = jnp.stack(hi_o, axis=0).reshape(r, c * bt)
                zlo, zhi = level0(lo1, hi1, w0k, c * bt)
                o_ref[0] = zlo.reshape(n, bt)
                o_ref[1] = zhi.reshape(n, bt)
            else:
                alo, ahi = level0(
                    lo.reshape(r, c * bt), hi.reshape(r, c * bt), w0k, c * bt
                )
                lo_v = alo.reshape(r, c, bt)
                hi_v = ahi.reshape(r, c, bt)
                lo_o, hi_o = [], []
                for k0 in range(r):
                    a, b = self._level_dot50(lo_v[k0], hi_v[k0], w1k[k0], c)
                    lo_o.append(a)
                    hi_o.append(b)
                o_ref[0] = jnp.stack(lo_o, axis=0).reshape(n, bt)
                o_ref[1] = jnp.stack(hi_o, axis=0).reshape(n, bt)

        def call(x, w0, w1):
            n_, b = x.shape
            tile = min(self.tile, b)
            pad = (-b) % tile
            if pad:
                x = jnp.concatenate([x, jnp.zeros((n_, pad), x.dtype)], axis=1)
            limbs = jnp.stack(
                [
                    (x & jnp.int64((1 << 25) - 1)).astype(jnp.int32),
                    (x >> 25).astype(jnp.int32),
                ]
            )  # (2, N, B)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(limbs.shape, jnp.int32),
                grid=(limbs.shape[2] // tile,),
                in_specs=[
                    pl.BlockSpec(
                        w0_shape,
                        lambda i: (jnp.int32(0),) * len(w0_shape),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        w1_shape,
                        lambda i: (jnp.int32(0),) * len(w1_shape),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (2, n_, tile),
                        lambda i: (jnp.int32(0), jnp.int32(0), i.astype(jnp.int32)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (2, n_, tile),
                    lambda i: (jnp.int32(0), jnp.int32(0), i.astype(jnp.int32)),
                    memory_space=pltpu.VMEM,
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(w0, w1, limbs)
            val = out[0].astype(jnp.int64) + (out[1].astype(jnp.int64) << 25)
            return val[:, :b] if pad else val

        return call

    # ------------------------------------------------------------- interface
    @property
    def fwd_tables(self):
        """Host numpy (w0, w1) of the forward transform (see PallasNtt)."""
        return (self._w0_f, self._w1_f)

    @property
    def inv_tables(self):
        return (self._w0_i, self._w1_i)

    def _pallas_ok(self) -> bool:
        if self.interpret:
            return True
        dev = jax.config.jax_default_device
        if dev is None:
            dev = jax.devices()[0]
        return getattr(dev, "platform", "cpu") != "cpu"

    def _flat(self, x):
        batch = x.shape[1:]
        flat = 1
        for s in batch:
            flat *= s
        return x.reshape(self.n, flat), batch

    def fwd(self, x, tables=None):
        xf, batch = self._flat(x)
        if not self._pallas_ok() or xf.shape[1] < 128:
            perm = jnp.asarray(self._perm)
            return self.ref2.fwd(x)[perm]
        w0, w1 = tables if tables is not None else self.fwd_tables
        return self._fwd_call(xf, w0, w1).reshape((self.n,) + batch)

    def inv(self, x, tables=None):
        xf, batch = self._flat(x)
        if not self._pallas_ok() or xf.shape[1] < 128:
            perm_inv = jnp.asarray(self._perm_inv)
            return self.ref2.inv(x[perm_inv])
        w0, w1 = tables if tables is not None else self.inv_tables
        return self._inv_call(xf, w0, w1).reshape((self.n,) + batch)

    def fwd_last(self, x, tables=None):
        return jnp.moveaxis(self.fwd(jnp.moveaxis(x, -1, 0), tables), 0, -1)

    def inv_last(self, x, tables=None):
        return jnp.moveaxis(self.inv(jnp.moveaxis(x, -1, 0), tables), 0, -1)

    def monomial_minus_one_tables(self):
        q = self.field.q
        sd = self.field.storage_dtype
        vals = (self._psi_pow_2n - 1) % q
        return (
            jnp.asarray(vals, dtype=sd),
            jnp.asarray(self.field.shoup(vals), dtype=sd),
        )

    def monomial_exponents(self, a):
        orders = jnp.asarray(self.orders).reshape((self.n,) + (1,) * a.ndim)
        return (orders * a[None]) % (2 * self.n)
