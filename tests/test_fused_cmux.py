"""Fused Pallas blind rotation (interpret mode) vs the XLA path.

The v2 fused kernel (ops/pallas_fused.py) is designed to be BIT-IDENTICAL
to ``make_blind_rotate``: same exact gadget rounding, same NTT plan and
orderings, same mono power tables. Uses a reduced LWE dimension (32 CMUX
steps) against the full-size first-level ring so the interpret-mode kernel
run stays fast.
"""

from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from tests.helpers import centered, lwe_encrypt, rlwe_decrypt_coeff

from tfhe_omr_tpu.core.keygen import SecretKeyPack
from tfhe_omr_tpu.core.params import KeySwitchParams, LweParams, OmrParameters
from tfhe_omr_tpu.ops.bootstrap import (
    init_accumulator,
    make_blind_rotate,
    make_fused_blind_rotate,
)
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


def test_fused_bit_identical_and_decrypts(small_lwe_pack, rng):
    from tfhe_omr_tpu.ops.pallas_fused import make_bsk_balanced

    skp, bsk1, bsk1_sh = small_lwe_pack
    ctx = skp.ctx
    params = skp.params
    f, ntt, g = ctx.f1, ctx.ntt1, ctx.gadget_br1
    q = f.q
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
    amounts = jnp.asarray(avecs.T)

    # XLA reference path
    br_ref = make_blind_rotate(f, ntt, g, paired=False)
    with host_math():
        out_ref = np.asarray(br_ref(acc0, amounts, bsk1, bsk1_sh))

    # fused kernel, interpret mode
    br_fused = make_fused_blind_rotate(f, ntt, g, interpret=True)
    bsk_bal = jnp.asarray(make_bsk_balanced(np.asarray(bsk1), q))
    out = np.asarray(br_fused(acc0, amounts, bsk_bal))

    assert np.array_equal(out, out_ref), (
        np.abs(out.astype(np.int64) - out_ref.astype(np.int64)).max()
    )

    # and the result decrypts to the LUT values
    t_out = 32
    delta1 = ((q >> (t_out.bit_length() - 2)) + 1) >> 1
    expected = {0: delta1, 4: q - delta1}
    for i, m in enumerate(msgs):
        dec = rlwe_decrypt_coeff(
            ctx, 1, skp.z1_ntt, out[:, 0, i], out[:, 1, i]
        )
        err = centered(int(dec[0]) - expected.get(m, 0), q)
        assert abs(err) < q // 256, (i, m, err)


def test_fused_paired_bit_identical(small_lwe_pack, rng):
    """Paired (BMMP) fused L1 kernel vs the paired XLA path — the layout
    the production detector uses (keygen pairs bsk1)."""
    from tfhe_omr_tpu.ops.pallas_fused import make_bsk_balanced_paired
    from tfhe_omr_tpu.utils.devices import host_math as hm

    skp, _, _ = small_lwe_pack
    ctx = skp.ctx
    params = skp.params
    f, ntt, g = ctx.f1, ctx.ntt1, ctx.gadget_br1
    q = f.q
    with hm():
        bsk1p, bsk1p_sh = skp._gen_bsk(
            skp._pair_bits(skp.clue_sk), skp.z1_f, skp.z1_ntt, ctx.f1,
            ctx.ntt1, ctx.gadget_br1, params.first_level_br.noise_std,
            np.random.default_rng(11),
        )
    q0, t0v = 2048, 8
    B = 8
    avecs = rng.integers(0, q0, size=(len(skp.clue_sk), B), dtype=np.int64)
    bs = rng.integers(0, q0, size=(B,), dtype=np.int64)
    lut1 = jnp.asarray(ctx.lut1_ext, dtype=f.storage_dtype)
    acc0 = init_accumulator(f, lut1, jnp.asarray(bs), params.n1)
    amounts = jnp.asarray(avecs)

    br_ref = make_blind_rotate(f, ntt, g, paired=True)
    with host_math():
        out_ref = np.asarray(br_ref(acc0, amounts, bsk1p, bsk1p_sh))

    br_fused = make_fused_blind_rotate(f, ntt, g, interpret=True, paired=True)
    bsk_bal = jnp.asarray(make_bsk_balanced_paired(np.asarray(bsk1p), q))
    out = np.asarray(br_fused(acc0, amounts, bsk_bal))

    assert np.array_equal(out, out_ref), (
        int(np.abs(out.astype(np.int64) - out_ref.astype(np.int64)).max()),
        int((out != out_ref).sum()),
    )


@pytest.fixture(scope="module")
def small_l2_pack():
    base = OmrParameters.default()
    params = replace(
        base,
        intermediate_lwe=LweParams(16, 32, 4096, "binary", 0.5),
    )
    skp = SecretKeyPack(params, rng=5)
    ctx = skp.ctx
    with host_math():
        bsk2, bsk2_sh = skp._gen_bsk(
            skp._pair_bits(skp.inter_sk), skp.z2_f, skp.z2_ntt, ctx.f2,
            ctx.ntt2, ctx.gadget_br2, params.second_level_br.noise_std,
            skp.rng,
        )
    return skp, bsk2, bsk2_sh


def test_fused_l2_bit_identical(small_l2_pack, rng):
    from tfhe_omr_tpu.ops.bootstrap import make_fused_blind_rotate2
    from tfhe_omr_tpu.ops.pallas_fused import make_bsk2_balanced

    skp, bsk2, bsk2_sh = small_l2_pack
    ctx = skp.ctx
    params = skp.params
    f, ntt, g = ctx.f2, ctx.ntt2, ctx.gadget_br2
    q = f.q
    n_int = params.intermediate_lwe.dimension
    qi = params.intermediate_lwe.cipher_modulus
    B = 8
    avecs = rng.integers(0, qi, size=(n_int, B), dtype=np.int64)
    bs = rng.integers(0, qi, size=(B,), dtype=np.int64)
    lut2 = jnp.asarray(ctx.lut2_ext, dtype=f.storage_dtype)
    acc0 = init_accumulator(f, lut2, jnp.asarray(bs), params.n2)
    amounts = jnp.asarray(avecs)

    br_ref = make_blind_rotate(f, ntt, g, paired=True)
    with host_math():
        out_ref = np.asarray(br_ref(acc0, amounts, bsk2, bsk2_sh))

    br_fused = make_fused_blind_rotate2(f, ntt, g, interpret=True)
    bsk_bal = jnp.asarray(make_bsk2_balanced(np.asarray(bsk2), q))
    out = np.asarray(br_fused(acc0, amounts, bsk_bal))

    assert np.array_equal(out, out_ref), (
        int(np.abs(out.astype(np.int64) - out_ref.astype(np.int64)).max()),
        int((out != out_ref).sum()),
    )


def test_fused_trace_bit_identical(rng):
    """Fused trace kernel (interpret) vs the XLA make_trace path."""
    from tfhe_omr_tpu.ops.bootstrap import make_fused_trace, make_trace
    from tfhe_omr_tpu.ops.pallas_fused import (
        make_auto_compact,
        make_trace_balanced,
    )
    from tfhe_omr_tpu.utils.devices import host_math as hm

    params = OmrParameters.default()
    skp = SecretKeyPack(params, rng=9)
    ctx = skp.ctx
    f, ntt, g = ctx.f2, ctx.ntt2, ctx.gadget_trace
    with hm():
        trace_k, trace_k_sh = skp._gen_trace_key(np.random.default_rng(13))[:2]
    B = 8
    acc = jnp.asarray(
        rng.integers(0, f.q, size=(params.n2, 2, B), dtype=np.int64)
    )

    tr_ref = make_trace(f, ntt, g, ctx.trace_autos)
    with host_math():
        out_ref = np.asarray(tr_ref(acc, trace_k, trace_k_sh))

    tr_fused = make_fused_trace(f, ntt, g, interpret=True)
    oh = jnp.asarray(make_auto_compact(ctx.trace_autos, params.n2))
    tk_bal = jnp.asarray(make_trace_balanced(np.asarray(trace_k), f.q))
    out = np.asarray(tr_fused(acc, oh, tk_bal))

    assert np.array_equal(out, out_ref), (
        int(np.abs(out.astype(np.int64) - out_ref.astype(np.int64)).max()),
        int((out != out_ref).sum()),
    )


def test_fused_paired_bit_identical_mac_rc(small_lwe_pack, rng, monkeypatch):
    """Opt-in row-chunked (register-blocked) L1 MAC == XLA path."""
    monkeypatch.setenv("TFHE_OMR_MAC_RC1", "32")
    test_fused_paired_bit_identical(small_lwe_pack, rng)


def test_fused_l2_bit_identical_legacy_mac(small_l2_pack, rng, monkeypatch):
    """The legacy (pre-register-blocking) L2 MAC stays bit-exact too."""
    monkeypatch.setenv("TFHE_OMR_MAC_RC", "0")
    test_fused_l2_bit_identical(small_l2_pack, rng)
