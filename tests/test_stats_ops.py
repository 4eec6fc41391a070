"""Semantic invariants for the round-4 statistics/drift operators
(ATR, PSI, Spearman, KS, sorted-neighborhood) against independent
scipy-free reimplementations; oracle parity is covered by
tools/check_oracle.py and the driver gate."""

import numpy as np
import pandas as pd

from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()
SF = "/root/testdata/sf0.001"


def test_atr_true_range_matches_pandas(spark):
    out = REG["atr_breakout_signals"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = (ev.sort_values(["ts", "event_id"])
            .groupby(["user_id", "day"])
            .agg(h=("cents", "max"), l=("cents", "min"),
                 c=("cents", "last")).reset_index())
    for uid, g in bars.groupby("user_id"):
        g = g.sort_values("day").reset_index(drop=True)
        pc = g.c.shift(1)
        tr = np.maximum.reduce([
            (g.h - g.l).to_numpy(),
            (g.h - pc.fillna(g.h)).abs().to_numpy(),
            (g.l - pc.fillna(g.l)).abs().to_numpy()]).astype("int64")
        got = out[out.user_id == uid].sort_values("day")
        assert (got.tr.to_numpy() == tr).all()
        # ATR is the mean of up to 14 trailing TRs, within rounding
        atr = pd.Series(tr).rolling(14, min_periods=1).mean() / 100
        assert np.allclose(got.atr14.to_numpy(), atr, atol=1e-6)


def test_psi_terms_partition_probabilities(spark):
    out = REG["psi_feature_drift"].spark_fn(spark, SF).toPandas()
    assert len(out) == 20 and out.bin.is_unique
    # smoothed probabilities sum to 1 on each side
    assert abs(out.p_ref.sum() - 1.0) < 1e-4
    assert abs(out.p_cur.sum() - 1.0) < 1e-4
    # (p-q) and ln(p/q) always share sign, so every term is >= 0
    assert (out.psi_term >= 0).all()
    # independent recomputation from the emitted counts
    p = (out.cnt_ref + 1) / (out.cnt_ref.sum() + 20)
    q = (out.cnt_cur + 1) / (out.cnt_cur.sum() + 20)
    assert np.allclose(out.psi_term, (p - q) * np.log(p / q), atol=1e-6)


def test_spearman_matches_pandas_corr(spark):
    out = REG["spearman_value_k_corr"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    import json
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["k"] = ev.props.map(lambda s: json.loads(s)["k"])
    for et, g in ev.groupby("event_type"):
        rx = (g.sort_values(["cents", "event_id"])
              .reset_index().index.to_numpy() + 1)
        g2 = g.sort_values(["cents", "event_id"]).reset_index(drop=True)
        ry = g2.sort_values(["k", "event_id"]).index.to_numpy() + 1
        # ry maps each row of g2 to its k-rank: invert the permutation
        inv = np.empty_like(ry)
        inv[ry - 1] = np.arange(1, len(ry) + 1)
        d = np.arange(1, len(g2) + 1) - inv
        n = len(g2)
        rho = 1 - 6 * (d.astype(object) ** 2).sum() / (n * (n * n - 1))
        got = out[out.event_type == et].spearman_rho.iloc[0]
        assert abs(got - rho) < 1e-6, et
        assert -1.0 <= got <= 1.0


def test_ks_statistic_matches_numpy(spark):
    out = REG["ks_two_sample_test"].spark_fn(spark, SF).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    a = np.sort(ev[ev.event_type == "click"].cents.to_numpy())
    b = np.sort(ev[ev.event_type == "purchase"].cents.to_numpy())
    assert row.n1 == len(a) and row.n2 == len(b)
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(f1 - f2)
    assert abs(row.ks_d - d.max()) < 1e-6
    # reported argmax value attains the max gap
    at = np.searchsorted(grid, row.ks_at_cents)
    assert abs(d[at] - d.max()) < 1e-9


def test_sorted_neighborhood_candidates_bounded(spark):
    out = REG["sorted_neighborhood_pairs"].spark_fn(spark, SF).toPandas()
    n_docs = table(spark, SF, "documents").count()
    # SNM with w=3 yields at most 3n candidate pairs pre-filter
    assert len(out) <= 3 * n_docs
    assert (out.rank_gap.between(1, 3)).all()
    assert (out.lev40 <= 20).all()
    assert (out.doc_a != out.doc_b).all()


def test_benford_chi2_matches_numpy(spark):
    out = REG["benford_first_digit_audit"].spark_fn(spark, SF).toPandas()
    assert list(out.digit) == list(range(1, 10))
    n = out.cnt.sum()
    obs = out.cnt / n
    exp = np.log10(1 + 1 / out.digit)
    assert np.allclose(out.observed, obs, atol=1e-6)
    assert np.allclose(out.expected, exp, atol=1e-6)
    assert np.allclose(out.chi2_term, (obs - exp) ** 2 * n / exp,
                       atol=1e-5)


def test_welch_t_matches_numpy(spark):
    out = REG["welch_t_test"].spark_fn(spark, SF).toPandas()
    row = out.iloc[0]
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    a = ev[ev.event_type == "click"].cents.to_numpy()
    b = ev[ev.event_type == "purchase"].cents.to_numpy()
    assert row.n1 == len(a) and row.n2 == len(b)
    md = a.mean() - b.mean()
    t = md / np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert abs(row.mean_diff - md / 100) < 1e-6
    assert abs(row.t_stat - t) < 1e-6


def test_chi2_matches_numpy_contingency(spark):
    out = REG["chi2_independence_test"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["hod"] = ev.ts.dt.hour
    tab = ev.groupby(["event_type", "hod"]).size().rename("o")
    n = tab.sum()
    rt = tab.groupby("event_type").sum()
    ct = tab.groupby("hod").sum()
    for _, row in out.iterrows():
        o = tab.loc[(row.event_type, row.hod)]
        e = rt[row.event_type] * ct[row.hod] / n
        assert row.o == o
        assert abs(row.expected - e) < 1e-5
        assert abs(row.chi2_term - (o - e) ** 2 / e) < 1e-5
    # all observed cells accounted for
    assert len(out) == len(tab)


def test_roc_auc_matches_rank_formula(spark):
    """AUC via the tie-corrected Mann-Whitney U must equal the
    pandas average-rank formula (what scipy/sklearn compute)."""
    out = REG["roc_auc_exact"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    cents = (ev.value * 100).round().astype("int64")
    y = (ev.event_type == "purchase").astype(int).to_numpy()
    r = pd.Series(cents.to_numpy()).rank(method="average").to_numpy()
    n1, n0 = int(y.sum()), int((1 - y).sum())
    auc = (r[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    row = out.iloc[0]
    assert (row.n_pos, row.n_neg) == (n1, n0)
    assert abs(row.auc - auc) < 1e-6
    assert 0.0 <= row.auc <= 1.0


def test_precision_recall_thresholds_confusion_algebra(spark):
    out = (REG["precision_recall_thresholds"].spark_fn(spark, SF)
           .toPandas())
    assert list(out.threshold_cents) == [1000, 2500, 5000, 7500, 9000]
    # confusion cells always resolve the same population
    tots = out.tp + out.fp + out.fn + out.tn
    assert tots.nunique() == 1
    # monotone: raising the threshold can only shrink tp and fp
    assert (out.tp.diff().dropna() <= 0).all()
    assert (out.fp.diff().dropna() <= 0).all()
    assert (out.recall6.diff().dropna() <= 1e-12).all()
    # recompute against pandas
    ev = table(spark, SF, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    cents = (ev.value * 100).round().astype("int64")
    pos = ev.event_type == "purchase"
    for _, r in out.iterrows():
        hit = cents >= r.threshold_cents
        assert r.tp == int((hit & pos).sum())
        assert r.fp == int((hit & ~pos).sum())
        if r.tp + r.fp:
            assert abs(r.precision6 - r.tp / (r.tp + r.fp)) < 1e-6


def test_markov_rows_are_conditional_distributions(spark):
    out = (REG["event_markov_transitions"].spark_fn(spark, SF)
           .toPandas())
    # each from_type row of the matrix sums to ~1
    s = out.groupby("from_type").prob.sum()
    assert ((s - 1.0).abs() < 1e-4).all()
    # transition counts conserve: sum n == total events - one per user
    ev = table(spark, SF, "events").toPandas()
    assert out.n.sum() == len(ev) - ev.user_id.nunique()


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    out = REG["theil_sen_slope"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["d"] = ev.ts.values.astype("datetime64[D]").astype("int64")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = (ev.groupby(["user_id", "d"]).cents.sum().reset_index())
    for uid, g in bars.groupby("user_id"):
        d = g.d.to_numpy()
        c = g.cents.to_numpy()
        i, j = np.triu_indices(len(d), k=1)
        slopes = (c[j] - c[i]) / (d[j] - d[i])
        got = out[out.user_id == uid].iloc[0]
        assert got.n_pairs == len(slopes)
        # lower median == numpy sorted middle element
        lower_med = np.sort(slopes)[(len(slopes) + 1) // 2 - 1]
        assert abs(got.sen_slope - lower_med) < 1e-6


def test_quadratic_fit_matches_numpy_lstsq(spark):
    out = REG["quadratic_trend_fit"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["d"] = ev.ts.values.astype("datetime64[D]").astype("int64")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = ev.groupby(["user_id", "d"]).cents.sum().reset_index()
    for uid, g in bars.groupby("user_id"):
        t = (g.d - g.d.min()).to_numpy(dtype=float)
        y = g.cents.to_numpy(dtype=float)
        if len(t) < 3:
            assert uid not in set(out.user_id)
            continue
        coef = np.polyfit(t, y, 2)  # c, b, a (highest power first)
        row = out[out.user_id == uid].iloc[0]
        assert row.n_days == len(t)
        assert abs(row.a_cents - coef[2]) < 1e-3
        assert abs(row.b_cents - coef[1]) < 1e-3
        assert abs(row.c_cents - coef[0]) < 1e-3


def test_lsh_eval_confusion_algebra(spark):
    out = REG["lsh_vs_exact_eval"].spark_fn(spark, SF).toPandas()
    r = out.iloc[0]
    assert r.tp + r.fp == r.n_lsh
    assert r.tp + r.fn == r.n_exact
    assert 0 <= r.precision6 <= 1 and 0 <= r.recall6 <= 1
    # the harness must be comparing non-empty pair sets
    assert r.n_exact > 0 and r.n_lsh > 0


def test_dim_truncation_recall_bounds_and_self_consistency(spark):
    out = (REG["ann_dim_truncation_recall"].spark_fn(spark, SF)
           .toPandas())
    assert list(out.query_id) == [0, 1, 2, 3, 4]
    assert ((out.overlap >= 0) & (out.overlap <= 10)).all()
    assert np.allclose(out.recall6, out.overlap / 10.0, atol=1e-9)


def test_percentile_interpolated_matches_numpy(spark):
    out = (REG["percentile_interpolated_per_type"].spark_fn(spark, SF)
           .toPandas())
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        for pct, q in ((50, 0.5), (90, 0.9), (99, 0.99)):
            want = np.percentile(g.cents.to_numpy(), pct,
                                 method="linear") / 100.0
            got = out[(out.event_type == et)
                      & (out.pct == pct)].value_interp.iloc[0]
            assert abs(got - want) < 1e-9, (et, pct, got, want)


def test_isotonic_calibration_is_pav(spark):
    out = REG["isotonic_calibration"].spark_fn(spark, SF).toPandas()
    assert (out.iso6.diff().dropna() >= -1e-12).all()  # monotone
    # independent PAV (stack-based) over the emitted bin counts
    blocks = []  # (pos, n)
    for _, r in out.sort_values("bin").iterrows():
        blocks.append([r.pos, r.n])
        while (len(blocks) > 1 and
               blocks[-2][0] * blocks[-1][1]
               >= blocks[-1][0] * blocks[-2][1]):
            p, n = blocks.pop()
            blocks[-1][0] += p
            blocks[-1][1] += n
    fit = []
    for p, n in blocks:
        fit.extend([p / n] * 0)  # lengths tracked below
    # expand: replay to know block lengths
    blocks2, lens = [], []
    for _, r in out.sort_values("bin").iterrows():
        blocks2.append([r.pos, r.n, 1])
        while (len(blocks2) > 1 and
               blocks2[-2][0] * blocks2[-1][1]
               >= blocks2[-1][0] * blocks2[-2][1]):
            p, n, c = blocks2.pop()
            blocks2[-1][0] += p
            blocks2[-1][1] += n
            blocks2[-1][2] += c
    expanded = []
    for p, n, c in blocks2:
        expanded.extend([p / n] * c)
    got = out.sort_values("bin").iso6.to_numpy()
    assert np.allclose(got, expanded, atol=1e-6)


def test_k_core_matches_python_peel(spark):
    out = REG["k_core_membership"].spark_fn(spark, SF).toPandas()
    li = table(spark, SF, "lineitem").select("l_orderkey",
                                             "l_partkey").toPandas()
    from collections import defaultdict
    by_order = li.groupby("l_orderkey").l_partkey.apply(set)
    edges = set()
    for parts in by_order:
        ps = sorted(parts)
        for ii in range(len(ps)):
            for jj in range(ii + 1, len(ps)):
                edges.add((ps[ii], ps[jj]))
    # peel to TRUE convergence (not fixed rounds)
    while True:
        deg = defaultdict(int)
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        bad = {n for n, d in deg.items() if d < 3}
        if not bad:
            break
        edges = {(u, v) for u, v in edges
                 if u not in bad and v not in bad}
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    want = sorted(deg.items(), key=lambda t: (-t[1], t[0]))[:50]
    got = list(zip(out.part_key, out.core_degree))
    # fixed 6 rounds must have converged on this data
    assert got == want


def test_trigram_backoff_levels_partition_and_fire(spark):
    out = (REG["doc_perplexity_trigram_backoff"].spark_fn(spark, SF)
           .toPandas())
    # only odd doc_ids are scored
    assert (out.doc_id % 2 == 1).all()
    assert (out.n_tri_hits + out.n_bi_backoffs + out.n_uni_backoffs
            == out.n_trigrams).all()
    # held-out scoring must actually exercise the backoff cascade
    assert out.n_tri_hits.sum() > 0 and out.n_bi_backoffs.sum() > 0
    assert (out.avg_nll > 0).all()


def test_woe_iv_terms_nonnegative_and_match_numpy(spark):
    out = REG["woe_information_value"].spark_fn(spark, SF).toPandas()
    assert (out.iv_term >= -1e-12).all()
    ev = table(spark, SF, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    cents = (ev.value * 100).round().astype("int64").clip(lower=0)
    b = (cents // 1000).clip(upper=9)
    y = (ev.event_type == "purchase").astype(int)
    pos = y.groupby(b.values).sum()
    neg = (1 - y).groupby(b.values).sum()
    tp, tn = y.sum(), (1 - y).sum()
    for _, r in out.iterrows():
        p = (pos.get(r.bin, 0) + 1) / (tp + 10)
        q = (neg.get(r.bin, 0) + 1) / (tn + 10)
        assert abs(r.woe - np.log(p / q)) < 1e-6


def test_equidepth_bins_balanced_and_ordered(spark):
    out = REG["equidepth_histogram"].spark_fn(spark, SF).toPandas()
    assert len(out) == 8
    assert out.n_rows.max() - out.n_rows.min() <= 1
    assert out.n_rows.sum() == table(spark, SF, "events").count()
    # boundaries are non-decreasing across bins
    assert (out.sort_values("bin").hi_cents.to_numpy()[:-1]
            <= out.sort_values("bin").lo_cents.to_numpy()[1:]).all()


def test_window_showcase_consistency(spark):
    out = (REG["window_functions_showcase"].spark_fn(spark, SF)
           .toPandas())
    g = out[out.user_id == out.user_id.iloc[0]].sort_values("rn")
    n = len(g)
    assert np.allclose(g.pct_rank, (g.rn - 1) / (n - 1), atol=1e-6)
    assert np.allclose(g.cume, g.rn / n, atol=1e-6)
    assert (g.lowest == g.lowest.iloc[0]).all()
    assert (g.highest == g.highest.iloc[0]).all()
    assert g.second_low.iloc[0] == g.iloc[1].name * 0 + g.second_low.iloc[0]
    assert (g.prev_cents.iloc[0] == -1) and (g.next_cents.iloc[-1] == -1)


def test_cuped_reduces_to_naive_when_theta_applied(spark):
    out = REG["cuped_adjusted_lift"].spark_fn(spark, SF).toPandas()
    assert list(out.variant) == [0, 1]
    assert out.theta.nunique() == 1  # pooled theta, same both rows
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    cut = pd.Timestamp("2024-01-15")
    pre = (ev[ev.ts < cut].groupby("user_id").cents.sum())
    post = (ev[ev.ts >= cut].groupby("user_id").cents.sum())
    users = ev.user_id.unique()
    x = pre.reindex(users).fillna(0).to_numpy(dtype=float)
    y = post.reindex(users).fillna(0).to_numpy(dtype=float)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(out.theta.iloc[0] - theta) < 1e-4
    for v in (0, 1):
        m = users % 2 == v
        adj = (y[m].mean() - theta * (x[m].mean() - x.mean())) / 100
        got = out[out.variant == v]
        assert abs(got.mean_y_adj.iloc[0] - adj) < 1e-3
        assert abs(got.mean_y.iloc[0] - y[m].mean() / 100) < 1e-3


def test_kaplan_meier_monotone_and_conserves_risk(spark):
    out = REG["kaplan_meier_survival"].spark_fn(spark, SF).toPandas()
    out = out.sort_values("day")
    assert (out.survival.diff().dropna() <= 1e-12).all()
    assert ((out.survival >= 0) & (out.survival <= 1)).all()
    # at-risk counts strictly decrease over event days
    assert (out.n_risk.diff().dropna() < 0).all()
    n_users = table(spark, SF, "events").select("user_id") \
        .distinct().count()
    assert out.n_risk.iloc[0] <= n_users


def test_zipf_fit_matches_numpy_polyfit(spark):
    out = REG["zipf_law_fit"].spark_fn(spark, SF).toPandas()
    docs = table(spark, SF, "documents").toPandas()
    toks = docs.text.str.strip().str.lower().str.split().explode()
    f = toks.value_counts().to_numpy(dtype=float)
    x = np.log(np.arange(1, len(f) + 1))
    y = np.log(f)
    slope, intercept = np.polyfit(x, y, 1)
    r = out.iloc[0]
    assert r.vocab == len(f)
    assert abs(r.zipf_slope - slope) < 1e-3
    assert abs(r.intercept_ln - intercept) < 1e-3
    assert 0 <= r.r2 <= 1


def test_gini_matches_numpy_rank_formula(spark):
    out = (REG["gini_spend_concentration"].spark_fn(spark, SF)
           .toPandas())
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        x = np.sort(g.cents.to_numpy())
        n = len(x)
        i = np.arange(1, n + 1)
        want = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
        got = out[out.event_type == et].gini6.iloc[0]
        assert abs(got - want) < 1e-6
        assert 0 <= got < 1


def test_burstiness_matches_numpy(spark):
    out = (REG["interarrival_burstiness"].spark_fn(spark, SF)
           .toPandas())
    ev = table(spark, SF, "events").toPandas()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        gaps = np.diff(g.ts.values.astype("datetime64[s]")
                       .astype("int64"))
        if len(gaps) < 2:
            continue
        mu, sd = gaps.mean(), gaps.std()  # population std
        want = (sd - mu) / (sd + mu)
        got = out[out.user_id == uid].iloc[0]
        assert got.n == len(gaps)
        assert abs(got.burstiness - want) < 1e-6


def test_rec_hitrate_bounds_and_holdout_excluded(spark):
    out = (REG["rec_hitrate_popularity"].spark_fn(spark, SF)
           .toPandas())
    r = out.iloc[0]
    assert 0 <= r.hits <= r.n_users
    assert abs(r.hitrate6 - r.hits / r.n_users) < 1e-6
    n_cust = (table(spark, SF, "orders").select("o_custkey")
              .distinct().count())
    assert r.n_users <= n_cust


def test_token_drift_movers_are_extreme(spark):
    out = REG["token_drift_movers"].spark_fn(spark, SF).toPandas()
    assert len(out) == 15
    a = out.log_ratio.abs()
    assert (a.diff().dropna() <= 1e-12).all()  # sorted by |ratio| desc


def test_pit_lookup_matches_interval_semantics(spark):
    out = REG["pit_dimension_lookup"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    # rebuild SCD2 + interval semantics in pandas
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        runs = []
        for _, r in g.iterrows():
            if not runs or runs[-1][0] != r.event_type:
                runs.append((r.event_type, r.ts))
        got_u = out[out.user_id == uid]
        for _, p in g[g.event_type == "purchase"].iterrows():
            versions = [i for i, (st, vf) in enumerate(runs, 1)
                        if vf <= p.ts]
            want_v = versions[-1]
            row = got_u[got_u.event_id == p.event_id].iloc[0]
            assert row.version == want_v
            assert row.state == runs[want_v - 1][0]
        if uid >= ev.user_id.unique()[3]:
            break  # a few users suffice; full parity is the oracle's job


def test_pit_plan_is_union_window_not_interval_join(spark):
    from big_datatrader_spark.plans.explain import physical_plan
    df = REG["pit_dimension_lookup"].spark_fn(
        spark, "/root/testdata/sf0.001")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_median_matches_numpy(spark):
    out = REG["weighted_median_price"].spark_fn(spark, SF).toPandas()
    li = table(spark, SF, "lineitem").toPandas()
    li["cents"] = (li.l_extendedprice * 100).round().astype("int64")
    li["wt"] = li.l_quantity.round().astype("int64")
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("cents")
        cw = g.wt.cumsum()
        tw = g.wt.sum()
        want = g.cents[2 * cw >= tw].iloc[0]
        row = out[out.flag == flag].iloc[0]
        assert row.total_weight == tw
        assert row.wmedian_cents == want


def test_haar_coeffs_reconstruct_series(spark):
    out = REG["haar_wavelet_coeffs"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["d"] = ev.ts.values.astype("datetime64[D]").astype("int64")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = ev.groupby(["user_id", "d"]).cents.sum().reset_index()
    for uid, g in bars.groupby("user_id"):
        y = g.sort_values("d").cents.to_numpy()[:8]
        got = out[out.user_id == uid]
        if len(y) < 8:
            assert got.empty
            continue
        l1 = got[got.level == 1].sort_values("j")
        # level-1 invertibility: y = ((a+d)/2, (a-d)/2) pairs
        rec = np.empty(8, dtype="int64")
        rec[0::2] = (l1.approx + l1.detail) // 2
        rec[1::2] = (l1.approx - l1.detail) // 2
        assert (rec == y).all()
        # level-2 approx coefficients are 4-day sums
        l2 = got[got.level == 2].sort_values("j")
        assert (l2.approx.to_numpy()
                == [y[:4].sum(), y[4:].sum()]).all()


def test_rollup_cascade_conserves_totals(spark):
    out = REG["rollup_cascade_reuse"].spark_fn(spark, SF).toPandas()
    day = out[out.grain == "day"]
    week = out[out.grain == "week"]
    assert day.n.sum() == week.n.sum() \
        == table(spark, SF, "events").count()
    assert day.cents.sum() == week.cents.sum()


def test_cohort_ltv_monotone_and_consistent(spark):
    out = REG["cohort_ltv_curves"].spark_fn(spark, SF).toPandas()
    for cohort, g in out.groupby("cohort"):
        g = g.sort_values("age_weeks")
        assert (g.cum_cents.diff().dropna() >= 0).all()
        assert np.allclose(g.ltv_per_user_cents,
                           (g.cum_cents / g.cohort_users).round(2),
                           atol=0.01)


def test_conformal_coverage_near_nominal(spark):
    out = (REG["conformal_interval_coverage"].spark_fn(spark, SF)
           .toPandas())
    r = out.iloc[0]
    # finite-sample guarantee: coverage >= 90% minus small-sample slack
    assert r.coverage6 >= 0.85
    assert r.coverage6 <= 1.0
    assert r.q_hat_cents > 0
    assert abs(r.coverage6 - r.covered / r.n_test) < 1e-6
    # independent q_hat: k-th smallest calibration residual
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["split"] = ev.event_id % 3
    tr = ev[ev.split == 0]
    yhat = ((2 * tr.groupby("user_id").cents.sum()
             + tr.groupby("user_id").size())
            // (2 * tr.groupby("user_id").size()))
    cal = ev[ev.split == 1].copy()
    cal = cal[cal.user_id.isin(yhat.index)]
    res = (cal.cents - cal.user_id.map(yhat)).abs().sort_values()
    kth = -(-(len(res) + 1) * 9 // 10)  # python floor-div ceil trick
    assert r.n_calib == len(res)
    assert r.q_hat_cents == res.iloc[kth - 1]


# ---------------------------------------------------------------------------
# round-4 late wave: indicators, hypothesis tests, sketches, funnel


def _daily_close(spark):
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    return (ev.sort_values(["ts", "event_id"])
            .groupby(["user_id", "day"])
            .agg(close=("value", "last")).reset_index())


def test_macd_matches_pandas_ewm(spark):
    out = REG["macd_histogram"].spark_fn(spark, SF).toPandas()
    bars = _daily_close(spark)
    for uid, g in bars.groupby("user_id"):
        s = g.sort_values("day").close
        f = s.ewm(alpha=2.0 / 13.0, adjust=False).mean()
        sl = s.ewm(alpha=2.0 / 27.0, adjust=False).mean()
        macd = f - sl
        sig = macd.ewm(alpha=2.0 / 10.0, adjust=False).mean()
        got = out[out.user_id == uid].sort_values("day")
        assert np.allclose(got.macd, macd, atol=1e-6)
        assert np.allclose(got.macd_signal, sig, atol=1e-6)
        assert np.allclose(got.histogram, macd - sig, atol=2e-6)


def test_stochastic_bounds_and_pandas(spark):
    out = REG["stochastic_oscillator"].spark_fn(spark, SF).toPandas()
    assert ((out.pct_k >= 0) & (out.pct_k <= 1)).all()
    assert ((out.pct_d >= 0) & (out.pct_d <= 1)).all()
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = (ev.sort_values(["ts", "event_id"])
            .groupby(["user_id", "day"])
            .agg(h=("cents", "max"), l=("cents", "min"),
                 c=("cents", "last")).reset_index())
    for uid, g in bars.groupby("user_id"):
        g = g.sort_values("day").reset_index(drop=True)
        h14 = g.h.rolling(14, min_periods=1).max()
        l14 = g.l.rolling(14, min_periods=1).min()
        keep = h14 > l14
        k = ((g.c - l14) / (h14 - l14))[keep]
        got = out[out.user_id == uid].sort_values("day")
        assert np.allclose(got.pct_k, k, atol=1e-6)


def test_obv_matches_pandas(spark):
    out = REG["obv_indicator"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    bars = (ev.sort_values(["ts", "event_id"])
            .groupby(["user_id", "day"])
            .agg(c=("cents", "last"), n=("cents", "size"))
            .reset_index())
    for uid, g in bars.groupby("user_id"):
        g = g.sort_values("day").reset_index(drop=True)
        d = np.sign(g.c.diff().fillna(0)).astype("int64")
        obv = (d * g.n).cumsum()
        got = out[out.user_id == uid].sort_values("day")
        assert (got.obv.to_numpy() == obv.to_numpy()).all()


def test_sortino_matches_numpy(spark):
    out = REG["sortino_downside_ratio"].spark_fn(spark, SF).toPandas()
    ev = (table(spark, SF, "events").toPandas()
          .sort_values(["user_id", "ts", "event_id"]))
    for uid, g in ev.groupby("user_id"):
        v = g.value.to_numpy()
        r = np.round(np.log(v[1:] / v[:-1]) * 1e6).astype("int64")
        neg = r[r < 0]
        if len(r) < 2 or len(neg) == 0:
            assert uid not in set(out.user_id)
            continue
        dd = np.sqrt((neg.astype(float) ** 2).sum() / len(r)) / 1e6
        got = out[out.user_id == uid].iloc[0]
        assert abs(got.downside_dev - dd) < 1e-5
        mean = r.sum() / len(r) / 1e6
        assert abs(got.sortino - mean / dd) < 1e-4


def test_mann_whitney_matches_numpy(spark):
    got = REG["mann_whitney_u"].spark_fn(spark, SF).toPandas().iloc[0]
    ev = table(spark, SF, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    cents = (ev.value * 100).round().astype("int64")
    y = (ev.event_type == "purchase").astype(int).to_numpy()
    x = cents.to_numpy()
    n1, n0 = int(y.sum()), int((1 - y).sum())
    # tie-averaged ranks via numpy
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j < len(sx) and sx[j] == sx[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r1 = ranks[y == 1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert got.u_x2 == round(2 * u1)
    nn = n1 + n0
    _, t = np.unique(x, return_counts=True)
    tie = (t.astype(float) ** 3 - t).sum()
    sigma = np.sqrt(n1 * n0 / 12.0 * ((nn + 1) - tie / (nn * (nn - 1))))
    z = (u1 - n1 * n0 / 2.0) / sigma
    assert abs(got.z6 - z) < 1e-4


def test_kruskal_and_anova_match_numpy(spark):
    ev = table(spark, SF, "events").toPandas()
    x = (ev.value * 100).round().astype("int64").to_numpy()
    gs = ev.event_type.to_numpy()
    # Kruskal-Wallis with tie correction
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j < len(sx) and sx[j] == sx[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    nn = len(x)
    hsum = sum(ranks[gs == g].sum() ** 2 / (gs == g).sum()
               for g in np.unique(gs))
    h = 12.0 * hsum / (nn * (nn + 1)) - 3 * (nn + 1)
    _, t = np.unique(x, return_counts=True)
    c = 1 - ((t.astype(float) ** 3 - t).sum()) / (nn ** 3 - nn)
    kw = REG["kruskal_wallis_h"].spark_fn(spark, SF).toPandas().iloc[0]
    assert abs(kw.h6 - h) < 1e-3
    assert abs(kw.h_tie_adj6 - h / c) < 1e-3
    # one-way ANOVA F
    groups = [x[gs == g].astype(float) for g in np.unique(gs)]
    k = len(groups)
    gm = x.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    av = REG["anova_f_oneway"].spark_fn(spark, SF).toPandas().iloc[0]
    assert av.k == k and av.n_total == nn
    assert abs(av.f6 - f) < 1e-3


def test_cramers_v_consistent_with_chi2_terms(spark):
    v = REG["cramers_v_effect"].spark_fn(spark, SF).toPandas().iloc[0]
    terms = (REG["chi2_independence_test"].spark_fn(spark, SF)
             .toPandas())
    chi2 = terms.chi2_term.sum()
    assert abs(v.chi2_6 - chi2) < 1e-3
    expect = np.sqrt(chi2 / (v.n * (min(v.n_rows_cat,
                                        v.n_cols_cat) - 1)))
    assert abs(v.cramers_v6 - expect) < 1e-4
    assert 0 <= v.cramers_v6 <= 1


def test_kmv_merge_property_and_accuracy(spark):
    import hashlib
    out = REG["kmv_distinct_sketch"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pools = {}
    for et, g in ev.groupby("event_type"):
        hs = sorted(h60(str(c)) for c in g.cents.unique())
        pools[et] = hs[:16]
        row = out[out.scope == et].iloc[0]
        assert row.kth_h60 == hs[15]
        assert row.n_exact == len(g.cents.unique())
    merged = sorted({h for p in pools.values() for h in p})[:16]
    row = out[out.scope == "ALL"].iloc[0]
    assert row.kth_h60 == merged[15]
    # merged kth == global kth (the KMV merge-losslessness property)
    ghs = sorted(h60(str(c)) for c in ev.cents.unique())
    assert merged[15] == ghs[15]
    # estimator sanity: within 60% of truth at k=16
    assert abs(row.kmv_est6 - row.n_exact) / row.n_exact < 0.6


def test_ndcg_bounded_by_hitrate(spark):
    nd = REG["rec_ndcg_popularity"].spark_fn(spark, SF).toPandas()
    hr = REG["rec_hitrate_popularity"].spark_fn(spark, SF).toPandas()
    assert nd.iloc[0].hits == hr.iloc[0].hits
    assert 0 <= nd.iloc[0].ndcg6 <= hr.iloc[0].hitrate6 + 1e-9


def test_rfm_quintiles_balanced(spark):
    q = REG["rfm_segmentation"].spark_fn(spark, SF).toPandas()
    n = q.n_customers.sum()
    for col in ["r_q", "f_q", "m_q"]:
        sizes = q.groupby(col).n_customers.sum()
        assert sorted(sizes.index) == [1, 2, 3, 4, 5]
        assert sizes.max() - sizes.min() <= 1, (col, sizes)
        assert sizes.sum() == n


def test_brier_logloss_match_numpy(spark):
    got = (REG["brier_logloss_calibration"].spark_fn(spark, SF)
           .toPandas().iloc[0])
    ev = table(spark, SF, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])].copy()
    ev["hod"] = ev.ts.dt.hour
    ev["y"] = (ev.event_type == "purchase").astype(int)
    tr = ev[ev.event_id % 2 == 0]
    te = ev[ev.event_id % 2 == 1]
    model = tr.groupby("hod").y.agg(["sum", "size"])
    p_e6 = ((model["sum"] + 1) * 1e6 / (model["size"] + 2)).round()
    te = te.join(p_e6.rename("p"), on="hod", how="inner")
    p = te.p / 1e6
    brier = ((p - te.y) ** 2).mean()
    logloss = (-np.log(np.where(te.y == 1, p, 1 - p))).mean()
    assert got.n_test == len(te)
    assert abs(got.brier6 - brier) < 1e-5
    assert abs(got.logloss6 - logloss) < 1e-5


def test_wasserstein_matches_numpy(spark):
    got = (REG["wasserstein_distance_drift"].spark_fn(spark, SF)
           .toPandas().iloc[0])
    ev = table(spark, SF, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    cents = (ev.value * 100).round().astype("int64")
    a = np.sort(cents[ev.event_type == "purchase"].to_numpy())
    b = np.sort(cents[ev.event_type == "click"].to_numpy())
    # integral of |CDF difference| over the merged support
    xs = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, xs, side="right") / len(a)
    cb = np.searchsorted(b, xs, side="right") / len(b)
    w1 = float((np.abs(ca - cb)[:-1] * np.diff(xs)).sum())
    assert abs(got.w1_cents6 - w1) < 1e-4


def test_jsd_bounds_and_numpy(spark):
    got = (REG["js_divergence_lang_tokens"].spark_fn(spark, SF)
           .toPandas().iloc[0])
    assert 0 <= got.jsd6 <= np.log(2) + 1e-9
    docs = table(spark, SF, "documents").toPandas()
    from collections import Counter
    ca, cb = Counter(), Counter()
    for _, d in docs.iterrows():
        t = d.text.strip().lower()
        toks = t.split() if t else []
        (ca if d.lang == "en" else cb).update(toks)
    ta, tb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for tok in set(ca) | set(cb):
        p, q = ca[tok] / ta, cb[tok] / tb
        m = (p + q) / 2
        if p:
            jsd += p * np.log(p / m)
        if q:
            jsd += q * np.log(q / m)
    assert abs(got.jsd6 - jsd / 2) < 1e-3
    assert got.n_tokens_en == ta and got.n_tokens_rest == tb


def test_bootstrap_ci_brackets_point_estimate(spark):
    got = (REG["poisson_bootstrap_ci"].spark_fn(spark, SF)
           .toPandas().iloc[0])
    assert got.n_replicates == 40
    assert got.ci_lo6 <= got.ci_hi6
    # the CI should bracket the full-sample mean on this data
    assert got.ci_lo6 <= got.mean6 <= got.ci_hi6
    # and be meaningfully tighter than the value range
    assert (got.ci_hi6 - got.ci_lo6) < 30 * 100


def test_window_funnel_matches_bruteforce(spark):
    out = (REG["window_funnel_depth"].spark_fn(spark, SF)
           .toPandas().set_index("user_id"))
    ev = (table(spark, SF, "events").toPandas()
          .sort_values(["ts", "event_id"]))
    W = 3600 * 1_000_000
    for uid, g in ev.groupby("user_id"):
        t = (g.ts.astype("int64") // 1000).to_numpy() \
            if g.ts.dtype.kind == "M" else g.ts.to_numpy()
        t = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        et = g.event_type.to_numpy()
        vs = t[et == "view"]
        cs = t[et == "click"]
        ps = t[et == "purchase"]
        d = 1 if len(vs) else 0
        if d and any((c > v) and (c - v <= W)
                     for v in vs for c in cs):
            d = 2
            if any((p > c > v) and (p - v <= W)
                   for v in vs for c in cs for p in ps):
                d = 3
        assert out.loc[uid].funnel_depth == d, uid


def test_hits_scores_normalized_and_bounded(spark):
    out = REG["hits_hub_authority"].spark_fn(spark, SF).toPandas()
    assert len(out) == 50
    assert ((out.authority_e6 > 0) & (out.authority_e6 <= 1e6)).all()
    assert ((out.hub_e6 >= 0) & (out.hub_e6 <= 1e6)).all()
    # L-inf normalization pins the top authority at exactly 1e6
    assert out.authority_e6.max() == 1_000_000


def test_holt_winters_matches_python_recursion(spark):
    out = REG["holt_winters_seasonal"].spark_fn(spark, SF).toPandas()
    bars = _daily_close(spark)
    a, b, g, m = 0.25, 0.125, 0.25, 7
    for uid, grp in bars.groupby("user_id"):
        xs = grp.sort_values("day").close.to_numpy()
        l, t, ring = float(xs[0]), 0.0, [0.0] * m
        ring = ring[1:] + [g * (xs[0] - l) + (1 - g) * ring[0]]
        lv, tv, sv = [l], [t], [ring[-1]]
        for x in xs[1:]:
            s_old = ring[0]
            l_new = a * (x - s_old) + (1 - a) * (l + t)
            t = b * (l_new - l) + (1 - b) * t
            l = l_new
            s_new = g * (x - l) + (1 - g) * s_old
            ring = ring[1:] + [s_new]
            lv.append(l); tv.append(t); sv.append(s_new)
        got = out[out.user_id == uid].sort_values("day")
        assert np.allclose(got.level, lv, atol=1e-6)
        assert np.allclose(got.trend, tv, atol=1e-6)
        assert np.allclose(got.seasonal, sv, atol=1e-6)


def test_sprt_matches_python_walk(spark):
    out = (REG["sprt_sequential_test"].spark_fn(spark, SF)
           .toPandas().set_index("user_id"))
    ev = (table(spark, SF, "events").toPandas()
          .sort_values(["ts", "event_id"]))
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    c1, c0, up, dn = 336472, -143101, 2944439, -2944439
    for uid, g in ev.groupby("user_id"):
        y = (g.event_type == "purchase").astype(int).to_numpy()
        llr, k, hit = 0, 0, None
        for i, yi in enumerate(y, start=1):
            k += yi
            llr += c1 if yi else c0
            if llr >= up:
                hit = ("accept_h1", i, k); break
            if llr <= dn:
                hit = ("accept_h0", i, k); break
        row = out.loc[uid]
        if hit is None:
            assert row.decision == "continue"
            assert row.n_at_decision == 0 and row.k_at_decision == 0
        else:
            assert (row.decision, row.n_at_decision,
                    row.k_at_decision) == hit
        assert row.n_obs == len(y)


def test_modularity_sums_and_bounds(spark):
    out = (REG["modularity_brand_partition"].spark_fn(spark, SF)
           .toPandas())
    # Q = sum of contributions, bounded in [-1, 1]
    q = out.contrib6.sum()
    assert -1.0 <= q <= 1.0
    # degree totals count every edge endpoint exactly twice
    # (sum d_c = 2m, and m >= sum of within-community edges)
    assert out.d_c.sum() % 2 == 0
    m = out.d_c.sum() // 2
    assert out.m_c.sum() <= m
    # independent recomputation of each contribution
    expect = (4 * m * out.m_c - out.d_c ** 2) / (4 * m * m)
    assert np.allclose(out.contrib6, expect, atol=1e-6)


def test_lcc_matches_bruteforce(spark):
    out = (REG["local_clustering_coefficient"].spark_fn(spark, SF)
           .toPandas())
    li = table(spark, SF, "lineitem").toPandas()
    from collections import defaultdict
    nbrs = defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g.l_partkey.unique())
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                nbrs[x].add(y)
                nbrs[y].add(x)
    for _, row in out.iterrows():
        ns = nbrs[row.part_key]
        assert len(ns) == row.deg
        tri = sum(1 for i in ns for j in ns
                  if i < j and j in nbrs[i])
        assert tri == row.n_tri, row.part_key
        lcc = 2 * tri / (row.deg * (row.deg - 1))
        assert abs(row.lcc6 - lcc) < 1e-6
    # ordering contract: lcc descending
    assert (out.lcc6.diff().dropna() <= 1e-12).all()


def test_time_decay_ewma_matches_python(spark):
    import math
    out = REG["time_decay_ewma"].spark_fn(spark, SF).toPandas()
    ev = (table(spark, SF, "events").toPandas()
          .sort_values(["ts", "event_id"]))
    ev["tus"] = ev.ts.astype("datetime64[us]").astype("int64")
    for uid, g in ev.groupby("user_id"):
        s, last_t, ref = None, None, []
        for _, r in g.iterrows():
            if s is None:
                s = r.value
            else:
                dt = (r.tus - last_t) / 1e6
                w = math.floor(math.exp(-dt / 3600.0) * 1e9 + 0.5) / 1e9
                s = w * s + (1 - w) * r.value
            last_t = r.tus
            ref.append(s)
        got = out[out.user_id == uid].sort_values(["tus", "event_id"])
        assert np.allclose(got.tdewma, ref, atol=1e-6)
        # decay sanity: after a long gap the EMA hugs the new tick
        assert len(got) == len(g)


def test_mad_outliers_match_numpy(spark):
    out = (REG["mad_robust_outliers"].spark_fn(spark, SF)
           .toPandas().set_index("event_type"))
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        x = np.sort(g.cents.to_numpy())
        n = len(x)
        med = x[(n + 1) // 2 - 1]          # lower median
        ad = np.sort(np.abs(x - med))
        mad = ad[(n + 1) // 2 - 1]
        row = out.loc[et]
        assert row.n == n
        assert row.median_cents == med
        assert row.mad_cents == mad
        flag = 10000 * np.abs(x - med) > 44478 * mad
        assert row.n_outliers == int(flag.sum())


def test_correlation_matrix_matches_pandas(spark):
    out = (REG["correlation_matrix_daily"].spark_fn(spark, SF)
           .toPandas())
    ev = table(spark, SF, "events").toPandas()
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    # half-away integer mean, as the query computes it
    daily = (ev.groupby(["event_type", "day"]).cents
             .agg(lambda s: (2 * s.sum() + len(s)) // (2 * len(s)))
             .unstack(0))
    for _, r in out.iterrows():
        pair = daily[[r.type_a, r.type_b]].dropna()
        assert r.type_a < r.type_b
        assert len(pair) == r.n
        c = np.corrcoef(pair[r.type_a], pair[r.type_b])[0, 1]
        assert abs(r.corr6 - c) < 1e-5
        assert -1.0 <= r.corr6 <= 1.0


def test_quantile_normalization_equalizes_and_conserves(spark):
    out = (REG["quantile_normalization"].spark_fn(spark, SF)
           .toPandas())
    # row conservation: every group's mapped counts sum to n_g
    assert (out.n_check == out.n_g).all()
    # the whole point: normalized means coincide across groups up to
    # discreteness (different n_g sample the pooled distribution at
    # slightly different grids)
    assert out.norm_mean6.max() - out.norm_mean6.min() < 2.0
    # and match an independent numpy reference of the same mapping
    ev = table(spark, SF, "events").toPandas()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    pooled = np.sort(ev.cents.to_numpy())
    N = len(pooled)
    for _, r in out.iterrows():
        n_g = int(r.n_g)
        pos = np.ceil(np.arange(1, n_g + 1) * N / n_g).astype(int)
        mapped = pooled[pos - 1]
        ref = ((2 * mapped.sum() + n_g) // (2 * n_g)) / 100
        # mean6 rounds at 1e-6 of dollars; ref reproduces the idiv
        assert abs(r.norm_mean6 - ref) < 5e-3, r.event_type
