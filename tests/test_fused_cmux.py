"""Fused Pallas blind rotation (interpret) vs the XLA path — same decrypts.

Uses a reduced LWE dimension (32 CMUX steps) against the full-size first
level ring so the interpret-mode kernel run stays fast.
"""

from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from tests.helpers import centered, lwe_encrypt, rlwe_decrypt_coeff

from tfhe_omr_tpu.core.keygen import SecretKeyPack
from tfhe_omr_tpu.core.params import KeySwitchParams, LweParams, OmrParameters
from tfhe_omr_tpu.ops.bootstrap import init_accumulator, make_blind_rotate
from tfhe_omr_tpu.utils.devices import host_math


@pytest.fixture(scope="module")
def small_lwe_pack():
    base = OmrParameters.default()
    params = replace(
        base,
        clue_params=LweParams(32, 8, 2048, "binary", 0.5),
        first_level_ks=KeySwitchParams(1024, 32, 27, 1, 10.0),
    )
    skp = SecretKeyPack(params, rng=3)
    ctx = skp.ctx
    with host_math():
        bsk1, bsk1_sh = skp._gen_bsk(
            skp.clue_sk, skp.z1_f, skp.z1_ntt, ctx.f1, ctx.ntt1,
            ctx.gadget_br1, params.first_level_br.noise_std, skp.rng,
        )
    return skp, bsk1, bsk1_sh


def test_fused_matches_lut(small_lwe_pack, rng):
    from tfhe_omr_tpu.ops.pallas_cmux import FusedBlindRotate, bsk_digit_planes

    skp, bsk1, bsk1_sh = small_lwe_pack
    ctx = skp.ctx
    params = skp.params
    f, ntt, g = ctx.f1, ctx.ntt1, ctx.gadget_br1
    q0, t0v = 2048, 8
    msgs = [0, 4, 2, 0, 1, 4, 3, 0]
    avecs, bs = [], []
    for m in msgs:
        a, b = lwe_encrypt(skp.clue_sk, q0, q0 // t0v, m, rng)
        avecs.append(a)
        bs.append(b)
    avecs = np.stack(avecs)
    bs = np.asarray(bs)
    lut1 = jnp.asarray(ctx.lut1_ext, dtype=f.storage_dtype)
    acc0 = init_accumulator(f, lut1, jnp.asarray(bs), params.n1)

    fused = FusedBlindRotate(f, ntt, g.d, g.log_b, tile=8, interpret=True)

    # square chains, same construction as ops.bootstrap
    two_n = 2 * ntt.n
    log2n = two_n.bit_length() - 1
    q = f.q
    pp = [pow(ntt.psi, 1 << j, q) for j in range(log2n)]
    ppsh = [int(f.shoup(w)) for w in pp]
    am = jnp.asarray(avecs.T)
    base = jnp.ones(am.shape, dtype=f.storage_dtype)
    for j in range(log2n):
        bit = ((am >> j) & 1).astype(bool)
        base = jnp.where(
            bit, f.mul_shoup(base, jnp.int64(pp[j]), jnp.int64(ppsh[j])), base
        )
    sqs = [base]
    for j in range(1, log2n):
        sqs.append(f.mul(sqs[-1], sqs[-1]))
    sq_all = jnp.stack(sqs).astype(jnp.int32)

    bskp = jnp.asarray(
        bsk_digit_planes(np.asarray(bsk1), fused.levels).transpose(
            1, 0, 2, 3, 4, 5
        )
    )
    out = np.asarray(fused(acc0.astype(jnp.int32), sq_all, bskp))

    t_out = 32
    delta1 = ((q >> (t_out.bit_length() - 2)) + 1) >> 1
    expected = {0: delta1, 4: q - delta1}
    for i, m in enumerate(msgs):
        dec = rlwe_decrypt_coeff(
            ctx, 1, skp.z1_ntt, out[:, 0, i], out[:, 1, i]
        )
        err = centered(int(dec[0]) - expected.get(m, 0), q)
        assert abs(err) < q // 256, (i, m, err)
