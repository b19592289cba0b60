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


# --------------------------------------------------------------------------
# Pipeline-level fixtures (round 5): the noise-free single-message detect
# transcript and the standalone key switch. Every arrow of reference
# ``detector.rs:505-639`` is re-verified with pure big-int math, using the
# recorded secrets — independent of the package's field/NTT/kernel code.
# --------------------------------------------------------------------------

def _nega_mul_sparse(dense, sparse, q):
    """dense(X) * sparse(X) mod (X^n + 1, q), exact big-int; iterates the
    (ternary) sparse operand."""
    n = len(dense)
    d = np.array([int(v) for v in dense], dtype=object)
    res = np.zeros(n, dtype=object)
    for j, s in enumerate(sparse):
        s = int(s)
        if s == 0:
            continue
        if j:
            shifted = np.concatenate([-d[n - j:], d[: n - j]])
        else:
            shifted = d
        res = res + s * shifted
    return np.mod(res, q)


def _centered_max(a, b, q):
    """max_i |a_i - b_i| centered mod q."""
    worst = 0
    for x, y in zip(a, b):
        e = (int(x) - int(y)) % q
        worst = max(worst, min(e, q - e))
    return worst


def _neg_rot(poly, k, q):
    """X^k * poly mod (X^n + 1, q), k in [0, 2n)."""
    n = len(poly)
    p = np.array([int(v) for v in poly], dtype=object)
    k %= 2 * n
    if k >= n:
        p = -p
        k -= n
    if k:
        p = np.concatenate([-p[n - k:], p[:k]])
    return np.mod(p, q)


_TRANSCRIPT = os.path.join(FIXDIR, "transcript.json")


@pytest.mark.skipif(not os.path.isfile(_TRANSCRIPT),
                    reason="transcript fixture not generated")
class TestTranscript:
    @pytest.fixture(scope="class")
    def tr(self):
        return load("transcript.json")

    @pytest.fixture(scope="class")
    def luts(self):
        return load("lut.json")

    def test_clue_phases_are_zero(self, tr):
        """Extraction + decrypt: every clue of the (noise-free, pertinent)
        message has phase exactly 0 (``detector.rs:505-531``)."""
        em = load("extract_map.json")
        q0 = tr["clue"]["q0"]
        a = tr["clue"]["a"]
        s = tr["secrets"]["clue_sk"]
        for i, b in enumerate(tr["clue"]["b7"]):
            a_ext = [
                (-1 if em["negate"][i][j] else 1) * a[em["index"][i][j]]
                for j in range(len(a))
            ]
            assert [v % q0 for v in a_ext] == tr["extracted"]["a_ext"][i]
            phase = (b - sum(x * y for x, y in zip(a_ext, s))) % q0
            assert phase == 0, (i, phase)

    def test_l1_blind_rotations_decrypt_to_lut1(self, tr, luts):
        """Each per-clue L1 accumulator decrypts (b - a*z1 under the
        recorded z1) to LUT1 within half the plaintext window — phase 0
        selects the unrotated LUT (``detector.rs:533-557``)."""
        q1 = 134215681
        z1 = tr["secrets"]["z1"]
        lut1 = luts["first_level_lut"]
        bound = q1 // 64  # Delta1/2 = q1/(2*32): the decode-correct margin
        for i, ct in enumerate(tr["l1_acc_per_clue"]):
            az = _nega_mul_sparse(ct["a"], z1, q1)
            m = [(b - int(x)) % q1 for b, x in zip(ct["b"], az)]
            err = _centered_max(m, lut1, q1)
            assert err < bound, (i, err)

    def test_l1_sum_and_sample_extraction(self, tr):
        """l1_sum == elementwise sum of the per-clue cts; the extracted
        LWE is the constant-coefficient sample extraction
        (``detector.rs:556-561``)."""
        q1 = 134215681
        n = len(tr["l1_sum"]["a"])
        for comp in ("a", "b"):
            for k in range(n):
                s = sum(ct[comp][k] for ct in tr["l1_acc_per_clue"]) % q1
                assert s == tr["l1_sum"][comp][k]
        a = tr["l1_sum"]["a"]
        ext = tr["extracted_lwe"]
        assert ext["b"] == tr["l1_sum"]["b"][0]
        assert ext["a"][0] == a[0]
        for j in range(1, n):
            assert ext["a"][j] == (q1 - a[n - j]) % q1

    def test_key_switch_preserves_phase_exactly(self, tr):
        """b - a.s is invariant under the (noise-free, exact-basis) LWE
        key switch z1 -> s2 (``detector.rs:560-563``)."""
        q1 = 134215681
        z1, s2 = tr["secrets"]["z1"], tr["secrets"]["s2"]
        pin = (tr["extracted_lwe"]["b"] - sum(
            x * y for x, y in zip(tr["extracted_lwe"]["a"], z1)
        )) % q1
        pout = (tr["key_switched"]["b"] - sum(
            x * y for x, y in zip(tr["key_switched"]["a"], s2)
        )) % q1
        assert pin == pout

    def test_mod_switch_and_offset(self, tr):
        """Round-half-up q1 -> 4096 on every component, then
        b += clue_count * Delta (``detector.rs:571-594``)."""
        q1 = 134215681
        ms = tr["mod_switched"]
        qi = ms["q"]
        ks = tr["key_switched"]
        for j, x in enumerate(ks["a"]):
            assert ms["a"][j] == ((2 * x * qi + q1) // (2 * q1)) % qi
        b = ((2 * ks["b"] * qi + q1) // (2 * q1)) % qi
        assert ms["b"] == (b + ms["b_offset"]) % qi

    def test_l2_blind_rotation_decrypts_to_rotated_lut2(self, tr, luts):
        """The L2 accumulator decrypts to X^{-phase2} * LUT2 within half
        the output window, phase2 = ms_b - ms_a.s2 mod 2N2
        (``detector.rs:599-624``)."""
        q2 = 1125899906826241
        z2 = tr["secrets"]["z2"]
        s2 = tr["secrets"]["s2"]
        ms = tr["mod_switched"]
        phase2 = (ms["b"] - sum(
            x * y for x, y in zip(ms["a"], s2)
        )) % ms["q"]
        lut2_rot = _neg_rot(luts["second_level_lut"], -phase2 % ms["q"], q2)
        az = _nega_mul_sparse(tr["l2_acc"]["a"], z2, q2)
        m = [(b - int(x)) % q2 for b, x in zip(tr["l2_acc"]["b"], az)]
        # Delta2/2 = q2/(2*257)
        assert _centered_max(m, lut2_rot, q2) < q2 // (2 * 257)
        # and the pertinent message's constant slot decodes to exactly 1
        t = 257
        assert ((2 * int(m[0]) * t + q2) // (2 * q2)) % t == 1

    def test_trace_is_exact_constant_projection(self, tr):
        """decrypt(trace_out) == [decrypt(l2_acc)[0], 0, ..., 0] exactly:
        the trace basis is exact and sigma = 0, so EvalTr * N2^-1 projects
        the constant coefficient with zero error (``detector.rs:626-639``)."""
        q2 = 1125899906826241
        z2 = tr["secrets"]["z2"]
        az = _nega_mul_sparse(tr["l2_acc"]["a"], z2, q2)
        m2_0 = (tr["l2_acc"]["b"][0] - int(az[0])) % q2
        az_t = _nega_mul_sparse(tr["trace_out"]["a"], z2, q2)
        m_tr = [(b - int(x)) % q2
                for b, x in zip(tr["trace_out"]["b"], az_t)]
        assert m_tr[0] == m2_0
        assert not any(m_tr[1:])

    def test_ntt_out_is_pointwise_evaluation(self, tr):
        """The NTT-domain output (``to_ntt_rlwe``) evaluates trace_out at
        psi^orders[i] — spot-checked at 8 slots with big-int Horner."""
        ntt = load("ntt.json")["l2"]
        q, psi = ntt["q"], ntt["psi"]
        rng = np.random.default_rng(1)
        for comp in ("a", "b"):
            poly = tr["trace_out"][comp]
            out = tr["ntt_out"][comp]
            for i in rng.integers(0, len(poly), size=8):
                x = pow(psi, ntt["orders"][int(i)], q)
                acc = 0
                for cf in reversed(poly):
                    acc = (acc * x + cf) % q
                assert acc == out[int(i)], (comp, int(i))

    def test_digest_ciphertext_and_decode(self, tr):
        """The index-digest ct is the NTT-pointwise product of the
        pertinency ct with the bucket plaintext (1 message, index 0,
        digits [0, 0] + flag 1 — ``detector.rs:271-328``), and it decodes
        back to index 0."""
        ntt = load("ntt.json")["l2"]
        q, psi = ntt["q"], ntt["psi"]
        n2 = len(tr["ntt_out"]["a"])
        lay = tr["digest"]["layout"]
        sps, spb = lay["slots_per_segment"], lay["slots_per_bucket"]
        nd = lay["index_slots_per_bucket"]
        plain = [0] * n2
        for s, bucket in enumerate(tr["digest"]["buckets"]):
            base = s * sps + bucket * spb
            # index 0: all nd digits are 0; the flag slot gets 1
            plain[base + nd] = 1
        rng = np.random.default_rng(2)
        for i in rng.integers(0, n2, size=8):
            x = pow(psi, ntt["orders"][int(i)], q)
            ph = 0
            for cf in reversed(plain):
                ph = (ph * x + cf) % q
            for comp, ci in (("a", 0), ("b", 1)):
                want = (tr["ntt_out"][comp][int(i)] * ph) % q
                got = tr["digest"]["index_ct"]["a" if ci == 0 else "b"][
                    int(i)
                ]
                assert got == want, (comp, int(i))
        assert tr["digest"]["decoded_indices"] == [0]


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(FIXDIR, "key_switch.json")),
    reason="key-switch fixture not generated",
)
def test_key_switch_fixture_preserves_phase():
    fix = load("key_switch.json")
    q = fix["q"]
    z1, s2 = fix["secrets"]["z1"], fix["secrets"]["s2"]
    for inp, out in zip(fix["inputs"], fix["outputs"]):
        pin = (inp["b"] - sum(x * y for x, y in zip(inp["a"], z1))) % q
        pout = (out["b"] - sum(x * y for x, y in zip(out["a"], s2))) % q
        assert pin == pout


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
