"""Tests for queries/retrieval_ops.py: BM25 against an independent
numpy/pure-Python recompute, and the distributed BPE learner against a
textbook single-process BPE reference (its exact pytest oracle — the
query is rows-only at the driver because greedy within-word merging has
no SQL twin)."""

import math
from collections import Counter

from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()
SF = "/root/testdata/sf0.001"


def _corpus_tokens(spark):
    pdf = table(spark, SF, "documents").select(
        "doc_id", "text").toPandas().sort_values("doc_id")
    return {int(r.doc_id): r.text.strip().lower().split()
            if r.text.strip() else [] for _, r in pdf.iterrows()}


def test_bm25_matches_pure_python_recompute(spark):
    toks = _corpus_tokens(spark)
    n = len(toks)
    s = sum(len(t) for t in toks.values())
    qdoc = min(toks)
    qterms = set(toks[qdoc])
    df = Counter()
    for t in toks.values():
        df.update(set(t))
    scores = {}
    for d, t in toks.items():
        if d == qdoc:
            continue
        tf = Counter(t)
        per = []
        for term in sorted(qterms & set(tf)):
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1)
            per.append(round(
                idf * (22 * tf[term] * s)
                / (10 * tf[term] * s + 3 * s + 9 * len(t) * n), 9))
        if per:
            acc = 0.0
            for x in per:       # ordered left fold, like both engines
                acc += x
            scores[d] = (round(acc, 6), len(per))
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    out = REG["bm25_more_like_this"].spark_fn(spark, SF).toPandas()
    assert len(out) == min(10, len(expect))
    for i, (_, row) in enumerate(out.iterrows()):
        d, (sc, nt) = expect[i]
        assert (int(row["doc_id"]), float(row["bm25"]),
                int(row["n_terms"]), int(row["rank"])) == (d, sc, nt,
                                                           i + 1)


def _bpe_reference(words: Counter, rounds: int):
    """Textbook BPE (Sennrich et al. 2016 alg. 1): full adjacent-pair
    recount each round, ties to the lexicographically smallest pair,
    greedy left-to-right merge application."""
    seqs = {w: list(w) for w in words}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = Counter()
        for w, sym in seqs.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, cnt))
        for w, sym in seqs.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_learner_matches_reference_exactly(spark):
    toks = _corpus_tokens(spark)
    words = Counter()
    for t in toks.values():
        words.update(t)
    expect = _bpe_reference(words, 8)
    out = REG["bpe_learn_merges"].spark_fn(spark, SF).collect()
    got = [(r.merge_rank, r.left, r.right, r.merged, r.pair_count)
           for r in out]
    assert got == expect
    # merged symbols must actually compress: counts are positive and
    # non-increasing is NOT required (merges create new pairs), but
    # every merge must have been the round's argmax — implied by
    # equality with the reference
    assert all(c > 0 for *_, c in got)


def test_udtf_sentence_spans_edge_cases(spark):
    """Lateral UDTF semantics on awkward inputs: empty docs vanish,
    whitespace-only sentences are dropped, indices count only kept
    sentences, and the plan is Arrow-batched (never row-pickling
    BatchEvalPython)."""
    from big_datatrader_spark.plans.explain import physical_plan
    from big_datatrader_spark.queries.retrieval_ops import (
        udtf_sentence_spans)
    df = udtf_sentence_spans(spark, SF)
    plan = physical_plan(df)
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPython(" not in plan
    out = df.toPandas()
    docs = table(spark, SF, "documents").select(
        "doc_id", "text").toPandas()
    expect = []
    for _, r in docs.sort_values("doc_id").iterrows():
        i = 0
        for raw in r.text.split("."):
            s = raw.strip(" \t\n\r\f\v")
            if s:
                i += 1
                expect.append((r.doc_id, i, len(s)))
    got = list(out.itertuples(index=False, name=None))
    assert got == expect


def test_udaf_median_plan_is_aggregate_in_pandas(spark):
    from big_datatrader_spark.plans.explain import physical_plan
    from big_datatrader_spark.queries.retrieval_ops import (
        udaf_median_cents)
    df = udaf_median_cents(spark, SF)
    plan = physical_plan(df)
    # Spark 4.1 names the grouped-agg pandas node ArrowAggregatePython
    # (older releases: AggregateInPandas) — either is the Arrow path
    assert ("ArrowAggregatePython" in plan
            or "AggregateInPandas" in plan)
    assert "BatchEvalPython(" not in plan
    out = {r.event_type: (r.n_events, r.median_cents)
           for r in df.collect()}
    ev = table(spark, SF, "events").select(
        "event_type", "value").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    for t, g in ev.groupby("event_type"):
        a = sorted(g.cents)
        assert out[t] == (len(a), a[(len(a) - 1) // 2]), t


def test_phrase_search_matches_python_scan(spark):
    out = (REG["phrase_search_positional"].spark_fn(spark, SF)
           .toPandas().set_index("doc_id"))
    docs = table(spark, SF, "documents").toPandas()
    want = {}
    for _, r in docs.iterrows():
        toks = r.text.strip().lower().split()
        hits = [i for i in range(len(toks) - 1)
                if toks[i] == "data" and toks[i + 1] == "stream"]
        if hits:
            want[r.doc_id] = (len(hits), hits[0])
    assert set(out.index) == set(want)
    for did, (n, first) in want.items():
        assert out.loc[did].n_occurrences == n
        assert out.loc[did].first_pos == first
    assert want  # the phrase genuinely occurs in the corpus


def test_hard_negatives_are_not_near_dups(spark):
    out = REG["hard_negative_mining"].spark_fn(spark, SF).toPandas()
    assert len(out) == 10
    assert (out.jaccard_to_q < 0.5).all()
    # ranked by bm25 descending
    assert (out.sort_values("rank").bm25.diff().dropna() <= 1e-12).all()
    # negatives exclude the query doc itself
    qdoc = table(spark, SF, "documents").agg(
        {"doc_id": "min"}).collect()[0][0]
    assert qdoc not in set(out.doc_id)


def test_bpe_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The vocabulary-size gate picks between the driver-side merge
    loop and the distributed one; both must learn IDENTICAL merge
    tables (shared _bpe_merge_word kernel, same (count desc, pair asc)
    argmax). Forcing the threshold to 0 exercises the distributed path
    on the same corpus the driver path handles by default."""
    from big_datatrader_spark.queries import retrieval_ops as RO
    fast = REG["bpe_learn_merges"].spark_fn(spark, SF).collect()
    monkeypatch.setattr(RO, "_BPE_DRIVER_VOCAB_MAX", 0)
    slow = REG["bpe_learn_merges"].spark_fn(spark, SF).collect()
    key = lambda rows: [(r.merge_rank, r.left, r.right, r.merged,
                         r.pair_count) for r in rows]
    assert key(fast) == key(slow)
    assert len(fast) == RO._BPE_ROUNDS
