"""Hypothesis property tests for round-7 semantics — pure functions,
no SparkSession, so the suite runs in seconds:

- the nearest-asof decision rule (backward/forward candidates,
  tolerance, backward tie-preference) equals pandas.merge_asof
  direction='nearest' on arbitrary inputs,
- RBO's per-depth definition equals the suffix-weight re-association
  the engine computes (the identity the oracle relies on),
- interpolated Kneser-Ney normalizes to exactly 1 over the
  continuation-closed vocabulary for ANY corpus, as exact fractions.
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
from hypothesis import given, settings, strategies as st


# --- nearest as-of vs pandas ------------------------------------------------

def _nearest_replay(purchases, clicks, tol):
    """The query's decision rule: dedup clicks per ts (max id wins,
    irrelevant here — single user, value-free), then nearest click
    within tol, ties backward."""
    out = {}
    cts = sorted(set(clicks))
    for pid, pts in enumerate(purchases):
        best = None
        for ct in cts:
            d = abs(pts - ct)
            if d > tol:
                continue
            side = 0 if ct <= pts else 1
            if best is None or (d, side) < best[0]:
                best = ((d, side), ct)
        if best is not None:
            out[pid] = best[1]
    return out


@settings(max_examples=200, deadline=None)
@given(
    purchases=st.lists(st.integers(0, 1000), min_size=1, max_size=20),
    clicks=st.lists(st.integers(0, 1000), min_size=0, max_size=20),
    tol=st.integers(0, 200),
)
def test_nearest_asof_rule_equals_pandas_merge_asof(purchases, clicks,
                                                    tol):
    got = _nearest_replay(purchases, clicks, tol)
    # merge_asof needs the left frame time-sorted; keep original ids
    order = sorted(range(len(purchases)), key=lambda i: purchases[i])
    left = pd.DataFrame({"t": [purchases[i] for i in order],
                         "pid": order})
    right = pd.DataFrame({"t": pd.array(sorted(set(clicks)),
                                        dtype="int64")})
    right["ct"] = right["t"]
    left["t"] = left["t"].astype("int64")
    merged = pd.merge_asof(left, right, on="t",
                           direction="nearest", tolerance=tol)
    for _, r in merged.iterrows():
        pid = int(r.pid)
        if pd.isna(r.ct):
            assert pid not in got
        else:
            # pandas 'nearest' breaks exact-distance ties BACKWARD,
            # the same preference the engine implements
            assert got[pid] == int(r.ct), (purchases, clicks, tol)


# --- RBO re-association identity --------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    depth=st.integers(1, 20),
)
def test_rbo_suffix_weight_reassociation(data, depth):
    """sum_d w_d * |top_d(X) ∩ top_d(Y)| == sum over shared items of
    suffixW[max(rank_x, rank_y)] — the identity that lets the engine
    compute RBO as one integer sum per shared part."""
    n = data.draw(st.integers(1, 30))
    items = list(range(n))
    x = data.draw(st.permutations(items))
    y = data.draw(st.permutations(items))
    w = [10 ** 12 // (d * 7 + 1) for d in range(1, depth + 1)]
    sfx = [sum(w[k:]) for k in range(depth)]
    lhs = 0
    for d in range(1, depth + 1):
        lhs += w[d - 1] * len(set(x[:d]) & set(y[:d]))
    rx = {v: i + 1 for i, v in enumerate(x[:depth])}
    ry = {v: i + 1 for i, v in enumerate(y[:depth])}
    rhs = sum(sfx[max(rx[v], ry[v]) - 1]
              for v in set(rx) & set(ry))
    assert lhs == rhs


# --- Kneser-Ney exact normalization ------------------------------------------

@settings(max_examples=100, deadline=None)
@given(docs=st.lists(
    st.lists(st.integers(0, 6), min_size=2, max_size=12),
    min_size=1, max_size=8))
def test_kneser_ney_normalizes_for_any_corpus(docs):
    """P_KN(. | w1) sums to exactly 1 over the continuation-closed
    vocabulary for every observed context, on arbitrary corpora —
    checked as exact fractions (D = 3/4)."""
    from collections import Counter
    c2 = Counter()
    for toks in docs:
        c2.update(zip(toks, toks[1:]))
    c1, n1f, nctx = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        nctx[w2] += 1
    T = len(c2)
    vocab = set(nctx)
    for w1 in c1:
        tot = Fraction(0)
        for w2 in vocab:
            seen = c2.get((w1, w2), 0)
            disc = Fraction(max(4 * seen - 3, 0), 4 * c1[w1])
            back = (Fraction(3 * n1f[w1], 4 * c1[w1])
                    * Fraction(nctx[w2], T))
            tot += disc + back
        assert tot == 1
