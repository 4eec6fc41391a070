"""Hypothesis property tests for round-9 semantics — pure functions,
no SparkSession (the test_properties_r7 convention):

- the Morton interleave is a bijection whose code-prefix equality
  implies high-bit agreement on EVERY dimension (the property the
  Z-order layout's per-file min/max narrowing rests on),
- the duplication-collapse theorem: for ANY text-determined pair
  score, id-grain scored pairs over a duplicated corpus equal the
  rep-grain pairs expanded through fingerprint groups plus same-text
  pairs at the score's identity — for arbitrary corpora with
  duplicates and empty docs (exact Jaccard as the witness score),
- the edit-1 deletion-neighborhood replan: distinct-name candidate
  generation + verification + expansion emits exactly the id-grain
  SymSpell pair set, on arbitrary strings with heavy duplication.

The Spark implementations' agreement with these models is pinned
separately (tests/test_llm_ops.py synthetic-frame exceptAll,
tests/test_format_ops.py 64x64 grid, and the DuckDB oracle gates);
these tests pin the THEOREMS the replans rely on, over inputs the
fixed datasets cannot reach.
"""

from __future__ import annotations

from fractions import Fraction
from itertools import combinations

from hypothesis import given, settings, strategies as st


# --- Morton interleave ------------------------------------------------------

def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255),
       st.integers(0, 255), st.integers(0, 255),
       st.integers(0, 8))
def test_morton_prefix_equality_bounds_both_dims(x1, y1, x2, y2, k):
    """If two 8-bit points share the top 2k Morton bits, they agree on
    the top k bits of BOTH dimensions — so a file covering a narrow
    Morton range has narrow min/max on every dimension at once, which
    is exactly what lets one layout prune on either axis."""
    z1, z2 = _morton(x1, y1, 8), _morton(x2, y2, 8)
    if z1 >> (2 * k) == z2 >> (2 * k):
        assert x1 >> k == x2 >> k
        assert y1 >> k == y2 >> k
    # bijectivity on equal codes
    if z1 == z2:
        assert (x1, y1) == (x2, y2)


# --- duplication-collapse theorem (exact Jaccard witness) -------------------

def _shingles(text: str, n: int = 3) -> frozenset:
    toks = text.split()
    if not toks:
        return frozenset()
    if len(toks) < n:
        return frozenset({" ".join(toks)})
    return frozenset(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))


def _jaccard(a: frozenset, b: frozenset):
    if not a or not b:
        return None  # no shingle universe -> never scored
    return Fraction(len(a & b), len(a | b))


def _id_grain(docs, thresh):
    out = {}
    for (ia, ta), (ib, tb) in combinations(sorted(docs), 2):
        j = _jaccard(_shingles(ta), _shingles(tb))
        if j is not None and j >= thresh:
            out[(ia, ib)] = j
    return out


def _collapsed(docs, thresh):
    groups: dict[str, list[int]] = {}
    for i, t in docs:
        groups.setdefault(t, []).append(i)
    reps = sorted((min(ids), t) for t, ids in groups.items())
    out = {}
    # rep pairs expanded to member pairs
    for (ra, ta), (rb, tb) in combinations(reps, 2):
        j = _jaccard(_shingles(ta), _shingles(tb))
        if j is not None and j >= thresh:
            for ia in groups[ta]:
                for ib in groups[tb]:
                    out[(min(ia, ib), max(ia, ib))] = j
    # same-text pairs at the identity score (tokenful only)
    for t, ids in groups.items():
        if _shingles(t):
            for ia, ib in combinations(sorted(ids), 2):
                out[(ia, ib)] = Fraction(1)
    return out


_WORDS = st.sampled_from(["a", "b", "c", "d"])
_TEXT = st.lists(_WORDS, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=150, deadline=None)
@given(st.lists(_TEXT, min_size=0, max_size=6),
       st.lists(st.integers(0, 5), min_size=0, max_size=12))
def test_collapse_theorem_exact_jaccard(pool, picks):
    """For any corpus drawn WITH REPLACEMENT from a text pool (so
    verbatim duplication is the norm, including duplicated empties),
    the collapsed construction emits exactly the id-grain scored pair
    set — the invariant dedup_ngram_jaccard's replan swapped plans
    under, with its oracle untouched."""
    if not pool:
        return
    docs = [(i, pool[p % len(pool)]) for i, p in enumerate(picks)]
    for thresh in (Fraction(1, 2), Fraction(4, 5), Fraction(1)):
        assert _collapsed(docs, thresh) == _id_grain(docs, thresh)


# --- edit-1 deletion-neighborhood replan ------------------------------------

def _dels(s: str) -> frozenset:
    return frozenset({s} | {s[:i] + s[i + 1:] for i in range(len(s))})


def _lev_le1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = edits = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        else:
            edits += 1
            if edits > 1:
                return False
            j += 1
    return True


def _edit1_id_grain(rows):
    out = {}
    for (ia, na), (ib, nb) in combinations(sorted(rows), 2):
        if _dels(na) & _dels(nb) and _lev_le1(na, nb):
            out[(ia, ib)] = 0 if na == nb else 1
    return out


def _edit1_collapsed(rows):
    groups: dict[str, list[int]] = {}
    for i, nm in rows:
        groups.setdefault(nm, []).append(i)
    out = {}
    for na, nb in combinations(sorted(groups), 2):
        if _dels(na) & _dels(nb) and _lev_le1(na, nb):
            for ia in groups[na]:
                for ib in groups[nb]:
                    out[(min(ia, ib), max(ia, ib))] = 1
    for nm, ids in groups.items():
        for ia, ib in combinations(sorted(ids), 2):
            out[(ia, ib)] = 0
    return out


_NAME = st.text(alphabet="ab", min_size=0, max_size=5)


@settings(max_examples=150, deadline=None)
@given(st.lists(_NAME, min_size=0, max_size=5),
       st.lists(st.integers(0, 4), min_size=0, max_size=10))
def test_edit1_collapse_matches_id_grain(pool, picks):
    """Distinct-name SymSpell blocking + verification + expansion
    emits exactly the id-grain pair set, on arbitrary strings with
    heavy duplication — including the dist-0 same-name branch and the
    deletion-key candidate gate (a pair is reachable iff it shares a
    deletion key, which over-generates but never under-generates for
    distance <= 1)."""
    if not pool:
        return
    rows = [(i, pool[p % len(pool)]) for i, p in enumerate(picks)]
    assert _edit1_collapsed(rows) == _edit1_id_grain(rows)
    # the SymSpell completeness claim itself: distance <= 1 IMPLIES a
    # shared deletion key (the gate over-generates, never under)
    for na, nb in combinations(sorted(set(pool)), 2):
        if _lev_le1(na, nb):
            assert _dels(na) & _dels(nb), (na, nb)
