"""Tests for the training-pipeline / analytics extras
(queries/training_ops.py): semantic golden checks against independent
pandas/numpy reimplementations, plus plan-shape assertions for the
scale-critical queries (oracle parity itself is covered by
tools/check_oracle.py and the driver gate)."""

import os
import math

import numpy as np
import pandas as pd
import pytest

from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()
SF = "/root/testdata/sf0.001"


def test_dataset_split_partitions_everything(spark):
    out = {r.split: r for r in
           REG["dataset_split_assign"].spark_fn(spark, SF).collect()}
    total = table(spark, SF, "documents").count()
    assert set(out) == {"train", "val", "test"}
    assert sum(r.n_docs for r in out.values()) == total
    # hash split: roughly 80/10/10, deterministic across runs
    assert out["train"].n_docs > out["val"].n_docs
    again = {r.split: r.n_docs for r in
             REG["dataset_split_assign"].spark_fn(spark, SF).collect()}
    assert again == {k: v.n_docs for k, v in out.items()}


def test_max_drawdown_matches_pandas(spark):
    ev = (table(spark, SF, "events")
          .select("user_id", "ts", "value").toPandas())
    got = {r.user_id: r.max_drawdown for r in
           REG["max_drawdown"].spark_fn(spark, SF).collect()}
    sym = sorted(ev.user_id.unique())[0]
    g = ev[ev.user_id == sym].sort_values("ts")
    run_max = g.value.cummax()
    dd = ((g.value - run_max) / run_max.replace(0.0, np.nan)).min()
    assert got[sym] == pytest.approx(round(dd, 6), abs=1e-6)


def test_volatility_matches_numpy(spark):
    ev = (table(spark, SF, "events")
          .select("user_id", "ts", "event_id", "value").toPandas())
    rows = {r.user_id: r for r in
            REG["volatility_sharpe"].spark_fn(spark, SF).collect()}
    sym = sorted(rows)[0]
    g = ev[ev.user_id == sym].sort_values(["ts", "event_id"])
    v = g.value.to_numpy()
    prev = np.roll(v, 1)
    prev[0] = np.nan
    mask = (prev > 0) & (v > 0)
    r_mu = np.round(np.log(v[mask] / prev[mask]) * 1e6).astype("int64")
    n, s, ssq = len(r_mu), int(r_mu.sum()), int((r_mu * r_mu).sum())
    mean = s / n / 1e6
    vol = math.sqrt((ssq - s * float(s) / n) / (n - 1)) / 1e6
    assert rows[sym].n_returns == n
    assert rows[sym].mean_ret == pytest.approx(round(mean, 6), abs=1e-9)
    assert rows[sym].volatility == pytest.approx(round(vol, 6), abs=1e-9)


def test_contamination_never_flags_benchmark_docs(spark):
    rows = REG["contamination_check"].spark_fn(spark, SF).collect()
    assert all(r.doc_id % 20 != 0 for r in rows)
    assert all(r.n_shared_ngrams >= 1 for r in rows)


def test_repetition_signals_bounds(spark):
    rows = REG["quality_repetition_signals"].spark_fn(spark, SF).collect()
    assert len(rows) == table(spark, SF, "documents").count()
    for r in rows:
        if r.top_token_frac is not None:
            assert 0.0 < r.top_token_frac <= 1.0
        if r.dup_trigram_frac is not None:
            assert 0.0 <= r.dup_trigram_frac <= 1.0


def test_fuzzy_join_plan_is_blocked(spark):
    plan = (REG["fuzzy_part_pairs"].spark_fn(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_plan_broadcasts_benchmark(spark):
    plan = (REG["contamination_check"].spark_fn(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_ewma_matches_independent_recursion(spark):
    from big_datatrader_spark.operators.indicators import with_ewma
    ev = (table(spark, SF, "events")
          .select("user_id", "ts", "event_id", "value"))
    got = with_ewma(ev, "value", ["user_id"], ["ts", "event_id"],
                    out_col="e", alpha=0.2).toPandas()
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    sym = pdf.user_id.iloc[0]
    g = pdf[pdf.user_id == sym]
    s, expect = None, []
    for x in g.value:
        s = float(x) if s is None else 0.8 * s + 0.2 * float(x)
        expect.append(s)
    got_sym = (got[got.user_id == sym]
               .sort_values(["ts", "event_id"]).e.tolist())
    assert got_sym == expect  # bit-identical recursion


def test_holt_matches_independent_recursion(spark):
    from big_datatrader_spark.operators.indicators import with_holt
    ev = (table(spark, SF, "events")
          .select("user_id", "ts", "event_id", "value"))
    got = with_holt(ev, "value", ["user_id"], ["ts", "event_id"],
                    level_col="l", trend_col="b",
                    alpha=0.2, beta=0.1).toPandas()
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    sym = pdf.user_id.iloc[0]
    g = pdf[pdf.user_id == sym]
    l, t, exp_l, exp_b = None, 0.0, [], []
    for x in g.value:
        if l is None:
            l, t = float(x), 0.0
        else:
            l_new = 0.2 * float(x) + 0.8 * (l + t)
            t = 0.1 * (l_new - l) + 0.9 * t
            l = l_new
        exp_l.append(l)
        exp_b.append(t)
    got_sym = (got[got.user_id == sym]
               .sort_values(["ts", "event_id"]))
    assert got_sym.l.tolist() == exp_l   # bit-identical two-state fold
    assert got_sym.b.tolist() == exp_b


def test_round4_ops_partition_invariant(spark):
    """Round-4 exactness contract: integer-exact pipelines (NB
    nano-nat sums, winnowing packed mins, DSIR bucket sums, RSI/
    Bollinger integer-cent windows) and the per-series Holt fold must
    produce bit-identical results at ANY shuffle-partition count."""
    import os

    def canon(pdf):
        # row order is not part of any query's contract (winnowing has
        # no output sort at all) — compare as canonicalized relations
        return (pdf.sort_values(list(pdf.columns))
                .reset_index(drop=True))

    for name in ("naive_bayes_lang_score", "winnowing_fingerprints",
                 "dsir_importance_weights", "rsi_bollinger_bands",
                 "holt_linear_smoothing"):
        base = canon(REG[name].spark_fn(spark, SF).toPandas())
        for p in (1, 7):
            os.environ["SPARK_GRAFT_CPUS"] = str(p)
            try:
                again = canon(REG[name].spark_fn(spark, SF).toPandas())
            finally:
                os.environ["SPARK_GRAFT_CPUS"] = "32"
                spark.conf.set("spark.sql.shuffle.partitions", "32")
            assert base.equals(again), (name, p)


def test_funnel_stages_shrink(spark):
    rows = sorted(REG["funnel_conversion"].spark_fn(spark, SF).collect(),
                  key=lambda r: r.stage)
    assert [r.event_type for r in rows] == ["view", "click", "purchase"]
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users


def test_retention_cohort_week0_covers_all_users(spark):
    rows = REG["weekly_retention_cohorts"].spark_fn(spark, SF).collect()
    total = (table(spark, SF, "events")
             .select("user_id").distinct().count())
    week0 = sum(r.n_users for r in rows if r.week_offset == 0)
    assert week0 == total  # every user is active in their cohort week


def test_zscore_flags_are_extreme(spark):
    flagged = REG["zscore_anomalies"].spark_fn(spark, SF).collect()
    assert all(abs(r.z) > 3 for r in flagged)


def test_resample_grid_is_dense_and_filled(spark):
    rows = REG["resample_forward_fill"].spark_fn(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in list(by_user.items())[:5]:
        rs.sort(key=lambda r: r.hour)
        assert not rs[0].is_gap          # grid starts at a real tick
        assert all(r.close is not None for r in rs)  # fully filled
        deltas = {(b.hour - a.hour).total_seconds()
                  for a, b in zip(rs, rs[1:])}
        assert deltas <= {3600.0}        # dense hourly grid


def test_autocorr_in_valid_range(spark):
    rows = REG["autocorr_lag1"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r.autocorr is not None:
            assert -1.0 <= r.autocorr <= 1.0


def test_linreg_slope_matches_numpy_polyfit(spark):
    out = REG["linreg_trend_per_user"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").select(
        "user_id", "ts", "value").toPandas()
    ev["t"] = (ev.ts.astype("int64") // 10**9) - 1704067200
    ev["vc"] = (ev.value * 100).round()
    for uid in out.user_id.head(5):
        g = ev[ev.user_id == uid]
        slope_cents_per_sec = np.polyfit(g.t, g.vc, 1)[0]
        expect = slope_cents_per_sec * 864.0  # dollars/day
        got = out[out.user_id == uid].slope_per_day.iloc[0]
        assert abs(got - expect) < 1e-4, (uid, got, expect)


def test_unpivot_is_inverse_of_pivot_shape(spark):
    out = REG["unpivot_event_metrics"].spark_fn(spark, SF).toPandas()
    # every event_type contributes exactly the 3 metrics
    assert (out.groupby("event_type").metric.nunique() == 3).all()
    wide = out.pivot(index="event_type", columns="metric",
                     values="metric_value")
    ev = table(spark, SF, "events").toPandas()
    assert (wide.n_events == ev.groupby("event_type").size()).all()
    assert (wide.n_users
            == ev.groupby("event_type").user_id.nunique()).all()


def test_zorder_layout_narrows_per_file_spans(spark, tmp_path):
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from big_datatrader_spark.queries.training_ops import (_OLS_EPOCH,
                                                           _morton)
    from big_datatrader_spark.sources.sinks import write_clustered

    ev = table(spark, SF, "events").select(
        "user_id",
        F.floor((F.unix_timestamp("ts") - _OLS_EPOCH) / 3600)
        .cast("bigint").alias("hr"))
    z = ev.withColumn("zcode", _morton(F.col("user_id"), F.col("hr")))

    def spans(path):
        # per-file (user_span * hour_span) cell area from footer stats
        areas = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            lo = {c: None for c in ("user_id", "hr")}
            hi = {c: None for c in ("user_id", "hr")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        st = col.statistics
                        lo[name] = (st.min if lo[name] is None
                                    else min(lo[name], st.min))
                        hi[name] = (st.max if hi[name] is None
                                    else max(hi[name], st.max))
            areas.append((hi["user_id"] - lo["user_id"] + 1)
                         * (hi["hr"] - lo["hr"] + 1))
        return areas

    zpath, npath = str(tmp_path / "zorder"), str(tmp_path / "naive")
    write_clustered(z, zpath, "zcode", n_files=8)
    # naive layout: hash-partitioned (what a plain write produces)
    z.repartition(8).write.mode("overwrite").parquet(npath)

    z_area, n_area = sum(spans(zpath)), sum(spans(npath))
    # z-ordered files cover far smaller (user x hour) cells -> a filter
    # on EITHER dimension can skip most files via footer min/max
    assert z_area * 2 < n_area, (z_area, n_area)


def test_full_outer_covers_both_sides(spark):
    out = REG["full_outer_daily_activity"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    c = ev[ev.event_type == "click"].groupby(["user_id", "day"]).size()
    p = ev[ev.event_type == "purchase"].groupby(
        ["user_id", "day"]).size()
    assert len(out) == len(c.index.union(p.index))
    # zero-filled sides really are zero, never null
    assert out.n_clicks.notna().all() and out.n_purchases.notna().all()
    only_p = out[(out.n_clicks == 0)]
    assert (only_p.n_purchases > 0).all()


def test_rank_distribution_window_consistency(spark):
    out = REG["user_spend_rank_distribution"].spark_fn(
        spark, SF).toPandas().sort_values(["spend_cents", "user_id"])
    n = len(out)
    assert out.pct_rank.iloc[0] == 0.0 and out.pct_rank.iloc[-1] == 1.0
    assert out.cume.iloc[-1] == 1.0
    # ntile balance: bucket sizes differ by at most 1, monotone
    sizes = out.decile.value_counts()
    assert sizes.max() - sizes.min() <= 1
    assert (out.decile.to_numpy() == np.sort(out.decile.to_numpy())).all()
    # pct_rank == (rank-1)/(n-1) for the unique ordering
    assert np.allclose(out.pct_rank.to_numpy(),
                       np.arange(n) / (n - 1), atol=1e-6)


def test_hll_merge_equals_direct_and_near_exact(spark):
    from pyspark.sql import functions as F
    out = REG["hll_partial_merge"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events")
    direct = (ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                   .alias("direct"))
              .toPandas().set_index("event_type")["direct"])
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact"))
             .toPandas().set_index("event_type")["exact"])
    for r in out.itertuples():
        # merging daily partials == sketching the whole table: the
        # sketch is deterministic and union-associative
        assert r.est_users == direct[r.event_type], r.event_type
        assert abs(r.est_users - exact[r.event_type]) \
            <= 0.05 * exact[r.event_type]
        assert r.n_partials > 1  # it actually merged partials


def test_snapshot_diff_classifies_consistently(spark):
    out = REG["snapshot_diff"].spark_fn(spark, SF).toPandas()
    assert set(out.change) <= {"added", "changed"}  # v2 is a superset
    added = out[out.change == "added"]
    assert added.n_events_v1.isna().all()
    chg = out[out.change == "changed"]
    # changed rows grew (v2 extends v1's window)
    assert (chg.n_events_v2 >= chg.n_events_v1).all()


def test_fk_integrity_clean_on_generated_data(spark):
    out = REG["fk_integrity_checks"].spark_fn(spark, SF).toPandas()
    assert len(out) == 4
    assert (out.n_orphans == 0).all()  # driver testdata is referential
    assert (out.n_rows > 0).all()


def test_perplexity_matches_independent_recompute(spark):
    import collections
    out = REG["doc_perplexity_bigram"].spark_fn(spark, SF).toPandas()
    docs = table(spark, SF, "documents").select(
        "doc_id", "text").toPandas()
    toks = {r.doc_id: r.text.strip().lower().split()
            for r in docs.itertuples()}
    c2 = collections.Counter()
    for t in toks.values():
        c2.update(zip(t, t[1:]))
    c1 = collections.Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    vocab = len({w for t in toks.values() for w in t})
    assert (out.avg_nll > 0).all()
    for doc_id in out.doc_id.head(5):
        t = toks[doc_id]
        nll = [round(math.log((c2[b] + 1) / (c1[b[0]] + vocab)) * 10000)
               for b in zip(t, t[1:])]
        expect = round(-sum(nll) / len(nll) / 10000, 4)
        got = out[out.doc_id == doc_id].avg_nll.iloc[0]
        assert abs(got - expect) < 1e-9, (doc_id, got, expect)


def test_winsorized_decomposition_equals_np_clip(spark):
    """The one-pass winsorized sum (s_mid + lo*|below| + hi*|above|)
    must equal brute-force clip-then-sum for arbitrary integer data,
    and the Spark query must reproduce numpy's result on the real
    table. Property side is pure python (fast, many shapes)."""
    import numpy as np
    rng = np.random.default_rng(42)
    for n in [1, 2, 3, 19, 20, 21, 100]:
        for _ in range(20):
            x = np.sort(rng.integers(-1000, 1000, size=n))
            rlo = (n * 5 + 99) // 100
            rhi = (n * 95 + 99) // 100
            lo, hi = int(x[rlo - 1]), int(x[rhi - 1])
            s_mid = int(x[rlo - 1:rhi].sum())
            one_pass = s_mid + lo * (rlo - 1) + hi * (n - rhi)
            assert one_pass == int(np.clip(x, lo, hi).sum()), (n, x)

    got = {r.user_id: r for r in
           REG["winsorized_user_stats"].spark_fn(spark, SF).collect()}
    ev = (table(spark, SF, "events")
          .select("user_id", "event_id", "value").toPandas())
    ev["cents"] = (ev.value * 100).round().astype("int64")
    for uid, g in ev.groupby("user_id"):
        x = np.sort(g.cents.to_numpy())
        n = len(x)
        lo = int(x[(n * 5 + 99) // 100 - 1])
        hi = int(x[(n * 95 + 99) // 100 - 1])
        expect = round(float(np.clip(x, lo, hi).sum()) / (100.0 * n), 6)
        r = got[uid]
        assert (r.lo_cents, r.hi_cents) == (lo, hi)
        assert r.winsorized_mean == expect


def test_target_encoding_excludes_own_fold(spark):
    out = REG["target_encoding_oof"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["fold"] = ev.event_id % 5
    for (et, fold), g in out.groupby(["event_type", "fold"]):
        rest = ev[(ev.event_type == et) & (ev.fold != fold)]
        want = rest.cents.sum() / len(rest)
        assert abs(g.te_value.iloc[0] - want) < 1e-4
        # every row of the same (cat, fold) shares the encode value
        assert g.te_value.nunique() == 1


def test_lag_features_match_pandas_shift(spark):
    out = REG["lag_feature_matrix"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.floor("D")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = (ev.groupby(["user_id", "day"]).cents.sum()
            .reset_index(name="y"))
    for uid, g in bars.groupby("user_id"):
        g = g.sort_values("day").reset_index(drop=True)
        g["lag1"] = g.y.shift(1)
        g["lag7"] = g.y.shift(7)
        g["roll"] = g.y.rolling(7, min_periods=1).mean()
        got = out[out.user_id == uid].sort_values("day")
        want = g[g.lag7.notna()]
        assert len(got) == len(want)
        assert (got.lag1.to_numpy() == want.lag1.to_numpy()).all()
        assert (got.lag7.to_numpy() == want.lag7.to_numpy()).all()
        assert np.allclose(got.roll7_mean.to_numpy(),
                           want.roll.to_numpy(), atol=0.01)


def test_feature_hashing_conserves_tokens_and_bounds_buckets(spark):
    out = (REG["feature_hashing_vectors"].spark_fn(spark, SF)
           .toPandas())
    docs = table(spark, SF, "documents").toPandas()
    n_toks = docs.text.str.strip().str.lower().str.split().map(len)
    assert out.cnt.sum() == n_toks.sum()
    assert out.bucket.between(0, 63).all()
    # signed sum can never exceed the raw count
    assert (out.signed_sum.abs() <= out.cnt).all()


def test_window_funnel_deterministic_under_ts_ties(spark, tmp_path):
    """Round-4 advice regression: the funnel's window order is
    (tus, event_id) on BOTH window stages, so same-timestamp events
    cannot make the depth partition-layout-dependent. Synthesizes the
    tie the real testdata lacks: user 1 has click and view at the SAME
    instant, then a purchase inside the window — a depth-3 chain exists
    only if the view (event_id 1, before the click's event_id 2) is
    visible to the click; any tus-only ROWS frame could order the pair
    either way."""
    import pandas as pd

    rows = [
        # user 1: view & click at identical ts (ids pin view first)
        (1, pd.Timestamp("2024-01-01 00:00:00"), 1, "view", 1.0, "{}"),
        (2, pd.Timestamp("2024-01-01 00:00:00"), 1, "click", 1.0, "{}"),
        (3, pd.Timestamp("2024-01-01 00:30:00"), 1, "purchase", 1.0,
         "{}"),
        # user 2: click BEFORE its view at the same instant -> the
        # click has no anchor; depth stops at 1 (view exists)
        (4, pd.Timestamp("2024-01-02 00:00:00"), 2, "click", 1.0, "{}"),
        (5, pd.Timestamp("2024-01-02 00:00:00"), 2, "view", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).repartition(1).write.mode(
        "overwrite").parquet(sf + "/events.parquet")
    # user 1: full chain -> d1 + d1*d2 + d1*d2*d3 = 3; user 2: the
    # click precedes its view in (tus, event_id) order, so no anchor
    expected = {1: 3, 2: 1}
    for p in (1, 5):
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        try:
            got = {r.user_id: r.funnel_depth
                   for r in REG["window_funnel_depth"]
                   .spark_fn(spark, sf).collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert got == expected, (p, got)


def test_tie_sensitive_queries_deterministic_under_ties(spark, tmp_path):
    """The round-5 tie-order sweep: every window that feeds a
    tie-sensitive function (row_number/lag/lead/ROWS frames/folds)
    orders by (ts, event_id) on both engines. On a synthetic events
    table where EVERY user timestamp is duplicated, results must be
    identical across partition layouts."""
    import pandas as pd

    rows = []
    eid = 0
    for u in (1, 2):
        for k in range(6):
            t = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=10 * k)
            for typ in ("view", "click"):   # every ts duplicated
                eid += 1
                rows.append((eid, t, u, typ, float(eid % 7 + 1), "{}"))
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).repartition(3).write.mode(
        "overwrite").parquet(sf + "/events.parquet")

    def canon(df):
        p = df.toPandas()
        return (p.sort_values(list(p.columns))
                .reset_index(drop=True))

    for name in ("running_total_per_user", "sessionize_events",
                 "scd2_user_state", "pit_dimension_lookup",
                 "stride_signals", "rolling_ma", "crossover_signals",
                 "evenly_spaced_backtest", "ma_crossover_backtest"):
        outs = []
        for p in (1, 5):
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            try:
                outs.append(canon(REG[name].spark_fn(spark, sf)))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert outs[0].equals(outs[1]), name
