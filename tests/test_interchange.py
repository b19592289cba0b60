"""The interchange-kit fixtures verify against their DOCUMENTED invariants.

docs/INTERCHANGE.md hands these files to someone with a Rust toolchain as
the bit-exactness contract (reference conventions at
``omr_core/src/parameters/mod.rs:39-105`` and primus-fhe call sites cited
there). This test re-derives every invariant with pure-Python big-int math,
independent of the package's own field/NTT code — if a refactor changes a
convention, the committed fixtures stop matching the documentation and this
fails before a Rust user ever sees a bogus kit.
"""

import json
import os

import numpy as np
import pytest

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "interchange",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="fixtures not generated"
)


def load(name):
    with open(os.path.join(FIXDIR, name)) as fp:
        return json.load(fp)


def test_ntt_fixture_is_pointwise_evaluation():
    fix = load("ntt.json")
    for lvl in ("l1", "l2"):
        f = fix[lvl]
        q, psi = f["q"], f["psi"]
        poly = f["poly"]
        n = f["n"]
        assert pow(psi, 2 * n, q) == 1 and pow(psi, n, q) == q - 1
        # spot-check 8 slots with Horner evaluation in pure ints
        rng = np.random.default_rng(0)
        for i in rng.integers(0, n, size=8):
            x = pow(psi, f["orders"][int(i)], q)
            acc = 0
            for c in reversed(poly):
                acc = (acc * x + c) % q
            assert acc == f["ntt_out"][int(i)], (lvl, int(i))


def test_gadget_fixture_matches_documented_rounding():
    fix = load("gadget.json")
    for name, g in fix.items():
        q, B, d = g["q"], 1 << g["log_b"], g["digits"]
        exact = g["max_abs_error_bound"] == 0
        for j, h in enumerate(g["gadget_values"]):
            if exact:  # exact basis: plain base-B positional values
                assert h == B**j % q, (name, j)
            else:  # approx: h_j = round(q * B**j / B**d), half-up
                assert h == (2 * q * B**j + B**d) // (2 * B**d), (name, j)
        for i, x in enumerate(g["inputs"]):
            if exact:  # unsigned base-B digits of x itself
                u = x
            else:
                u = (2 * x * B**d + q) // (2 * q)  # round half-up
            # digits LSB-first with carry (balanced signed in approx mode)
            r = u
            for j in range(d):
                dj = g["digit_rows"][j][i]
                if exact:
                    assert 0 <= dj < B, (name, i, j)
                else:
                    assert -(B // 2) <= dj < B // 2, (name, i, j)
                assert (r - dj) % B == 0, (name, i, j)
                r = (r - dj) // B
            recon = sum(
                g["digit_rows"][j][i] * g["gadget_values"][j]
                for j in range(d)
            ) % q
            assert recon == g["reconstruction_mod_q"][i]
            if g["max_abs_error_bound"]:
                err = (x - recon) % q
                err = min(err, q - err)
                assert err <= g["max_abs_error_bound"], (name, i, err)
            else:  # exact basis
                assert recon == x % q


def test_mod_switch_fixture_is_round_half_up():
    fix = load("mod_switch.json")
    qf, qt = fix["q_from"], fix["q_to"]
    for x, y in zip(fix["inputs"], fix["outputs"]):
        assert y == ((2 * x * qt + qf) // (2 * qf)) % qt


def test_extract_map_is_negacyclic_sample_extraction():
    fix = load("extract_map.json")
    n, c = fix["n0"], fix["clue_count"]
    for i in range(c):
        for j in range(n):
            # a_vec[j] = a[i-j] for j <= i else -a[n+i-j]
            if j <= i:
                assert fix["index"][i][j] == i - j
                assert fix["negate"][i][j] == 0
            else:
                assert fix["index"][i][j] == n + i - j
                assert fix["negate"][i][j] == 1


def test_trace_autos_are_galois_maps():
    fix = load("trace_autos.json")
    n = fix["n2"]
    rounds = fix["rounds"]
    assert len(rounds) == n.bit_length() - 1
    r = n
    for rd in rounds:
        g = rd["g"]
        assert g == r + 1
        r //= 2
        gidx, gsign = rd["gidx"], rd["gsign"]
        # forward map j -> (g*j mod 2n); gather tables must invert it
        for j in range(0, n, max(1, n // 64)):  # spot-check 64 slots
            p = (g * j) % (2 * n)
            dest, sgn = (p, 1) if p < n else (p - n, -1)
            assert gidx[dest] == j
            assert gsign[dest] == sgn
