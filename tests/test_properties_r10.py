"""Hypothesis models for the round-10 theorems, engine-free.

The Spark-vs-DuckDB gate pins the IMPLEMENTATIONS; these pin the
THEOREMS on a pure-Python model, so a future refactor that preserves
cross-engine agreement but breaks the math still fails loudly.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from hypothesis import given, settings, strategies as st


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _deletion_keys(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


def _verified_name_pairs(names: set[str]) -> set[tuple[str, str]]:
    """The engine's candidate generator, modeled: names sharing a
    deletion key with na < nb, verified by levenshtein <= 1."""
    out = set()
    for na, nb in combinations(sorted(names), 2):
        if _deletion_keys(na) & _deletion_keys(nb) and _lev(na, nb) <= 1:
            out.add((na, nb))
    return out


# ids carry names from a tiny alphabet with short lengths, so edit-1
# neighbors and duplicated names are both common in generated corpora
_names = st.text(alphabet="abc", min_size=0, max_size=4)
_corpus = st.lists(_names, min_size=1, max_size=30)


@settings(max_examples=200, deadline=None)
@given(_corpus)
def test_blowup_audit_prediction_equals_brute_force(names):
    """edit1_pair_blowup_audit's theorem: with m(n) the per-name
    multiplicity, the edit-1 id-pair expansion has EXACTLY
    sum over verified name pairs of m(na)*m(nb) pairs at dist 1 and
    sum over names of C(m,2) pairs at dist 0 — the audit can size the
    expansion without running it."""
    corpus = list(enumerate(names))  # (id, name)
    mult = Counter(names)
    vpairs = _verified_name_pairs(set(names))
    predicted_diff = sum(mult[a] * mult[b] for a, b in vpairs)
    predicted_same = sum(m * (m - 1) // 2 for m in mult.values())

    # brute force over id pairs — the expansion the audit predicts
    actual_diff = actual_same = 0
    for (ia, na), (ib, nb) in combinations(corpus, 2):
        if na == nb:
            actual_same += 1
        elif _lev(na, nb) <= 1:
            actual_diff += 1
    assert predicted_same == actual_same
    assert predicted_diff == actual_diff


@settings(max_examples=200, deadline=None)
@given(_names, _names)
def test_deletion_key_blocking_is_complete_at_distance_1(a, b):
    """The audit inherits the expansion's blocking guarantee, so the
    model must too: any two distinct strings within edit distance 1
    share a deletion key (equal/substitution/insert-delete all collide
    on a deletion) — candidates over-generate, never under."""
    if a != b and _lev(a, b) <= 1:
        assert _deletion_keys(a) & _deletion_keys(b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=2, max_size=2),
       st.lists(st.integers(0, 255), min_size=2, max_size=2))
def test_morton_63bit_contract_preserves_order_on_shared_prefix(p, q):
    """The morton_code sign-bit guard's reason, modeled: within the
    allowed width the interleave is a bijection whose shared high-bit
    prefixes bound every dimension (the Z-locality property); past 63
    bits the top positions would land in the long sign bit, which is
    why morton_code asserts instead of clamping."""
    def morton(xs, bits=8):
        z = 0
        n = len(xs)
        for d, x in enumerate(xs):
            for i in range(bits):
                z |= ((x >> i) & 1) << (i * n + d)
        return z

    za, zb = morton(p), morton(q)
    assert (za == zb) == (p == q)          # bijection
    assert za < (1 << 16)                  # 2 dims x 8 bits: fits
