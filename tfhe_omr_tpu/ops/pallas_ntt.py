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


class PallasNtt:
    """SmallFieldNtt-compatible NTT that runs as a fused Pallas kernel."""

    def __init__(
        self,
        field: PrimeField,
        n: int,
        r: int = 32,
        tile: int = 512,
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
        self._w0_f = jnp.asarray(_digit_plane_stack(mat0_f, self.levels))
        self._w1_f = jnp.asarray(
            np.stack(
                [_digit_plane_stack(w1k_f[k0], self.levels) for k0 in range(r)]
            )
        )  # (r, L*c, c)
        # ---- inverse constants (levels run 1 then 0; tw0^-1 folded into the
        # level-1 inverse matrices' output rows)
        mat0_i, tw0_i, _, _, _ = self.ref._inv_plan[0]
        mat1_i, _, _, _, _ = self.ref._inv_plan[1]
        w1k_i = np.stack(
            [mat1_i * tw0_i[k0][:, None] % q for k0 in range(r)]
        )
        self._w0_i = jnp.asarray(_digit_plane_stack(mat0_i, self.levels))
        self._w1_i = jnp.asarray(
            np.stack(
                [_digit_plane_stack(w1k_i[k0], self.levels) for k0 in range(r)]
            )
        )
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
        acc = s_groups[n_groups - 1]
        for s in range(n_groups - 2, -1, -1):
            # acc*2^7 mod q in int32: acc = hi*2^(qbits-7) + lo
            acc = acc - jnp.int32(q) * (acc >= jnp.int32(q))
            hi = acc >> (qbits - DIGIT_BITS)
            lo = acc & jnp.int32((1 << (qbits - DIGIT_BITS)) - 1)
            acc = hi * jnp.int32(eps) + (lo << DIGIT_BITS) + s_groups[s]
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
        w0 = self._w0_i if inverse else self._w0_f
        w1 = self._w1_i if inverse else self._w1_f

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

        def call(x):
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
                in_specs=[
                    pl.BlockSpec(
                        w0.shape, lambda i: (0,) * w0.ndim,
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        w1.shape, lambda i: (0,) * w1.ndim,
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (n_, tile),
                        lambda i: (0, i),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (n_, tile), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                interpret=self.interpret,
            )(w0, w1, x.astype(jnp.int32))
            return out[:, :b] if pad else out

        return call

    # ------------------------------------------------------------- interface
    def fwd(self, x):
        batch = x.shape[1:]
        flat = 1
        for s in batch:
            flat *= s
        out = self._fwd_call(x.reshape(self.n, flat))
        return out.reshape((self.n,) + batch)

    def inv(self, x):
        batch = x.shape[1:]
        flat = 1
        for s in batch:
            flat *= s
        out = self._inv_call(x.reshape(self.n, flat))
        return out.reshape((self.n,) + batch)

    def fwd_last(self, x):
        return jnp.moveaxis(self.fwd(jnp.moveaxis(x, -1, 0)), 0, -1)

    def inv_last(self, x):
        return jnp.moveaxis(self.inv(jnp.moveaxis(x, -1, 0)), 0, -1)

    def monomial_minus_one_tables(self):
        return self.ref.monomial_minus_one_tables()

    def monomial_exponents(self, a):
        return self.ref.monomial_exponents(a)
