"""SharedScope suite measurement (VERDICT r10 ask #7).

Runs the six-member graph family sequentially — each query fully
materialized, caches released per query — then the same suite inside
ONE SharedScope where the directed co-purchase edge list is leased
(built+persisted once, released at scope exit). Values are asserted
identical before any timing counts. Prints one JSON line per mode.

Usage: python tools/measure_shared_scope.py [-n 2] [--family graph|text] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_datatrader_spark.queries import (SharedScope,  # noqa: E402
                                          load_registry)
from big_datatrader_spark.session import get_spark  # noqa: E402

FAMILIES = {
    "graph": ["pagerank_copurchase", "personalized_pagerank",
              "label_propagation_communities", "hits_hub_authority",
              "link_prediction_common_neighbors",
              "gnn_feature_propagation",
              # ordered / renamed consumers deriving from the same
              # lease
              "triangle_count_copurchase",
              "local_clustering_coefficient",
              "modularity_brand_partition", "sssp_copurchase",
              # dated-lease consumers (VERDICT r11 ask #4, r12): both
              # rebuild the dated co-purchase edge list unscoped;
              # inside a scope they share ONE copurchase_edges_dated
              # build
              "temporal_reachability_copurchase",
              "link_prediction_holdout_eval"],
    # doc_tokens lease (VERDICT r12 ask #3): every member re-tokenizes
    # documents.text unscoped; inside a scope they share ONE tokenized
    # (doc_id, n_chars, t) relation
    "text": ["text_token_stats", "token_frequencies",
             "stem_token_frequencies", "tf_idf_top_terms",
             "doc_perplexity_bigram", "kneser_ney_bigram_ppl",
             "doc_perplexity_trigram_backoff"],
}
FAMILY = FAMILIES["graph"]


def run_suite(spark, reg, sf_dir: str) -> dict[str, float]:
    per = {}
    for n in FAMILY:
        t0 = time.perf_counter()
        reg[n].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        per[n] = round(time.perf_counter() - t0, 2)
    return per


def main() -> int:
    global FAMILY
    args = sys.argv[1:]
    n = 2
    fam = "graph"
    while args and args[0] in ("-n", "--family"):
        if args[0] == "-n":
            n = int(args[1])
        else:
            fam = args[1]
        args = args[2:]
    FAMILY = FAMILIES[fam]
    sf_dirs = args or ["/root/testdata/sf0.1"]
    reg = load_registry()
    spark = get_spark()
    for sf_dir in sf_dirs:
        # value identity first — a scope that changed results would
        # make every timing below meaningless
        base = {q: sorted(map(tuple,
                              reg[q].spark_fn(spark, sf_dir).collect()))
                for q in FAMILY}
        spark.catalog.clearCache()
        with SharedScope():
            got = {q: sorted(map(tuple,
                                 reg[q].spark_fn(spark, sf_dir)
                                 .collect()))
                   for q in FAMILY}
        assert got == base, "scoped values differ"
        spark.catalog.clearCache()
        # INTERLEAVED replicates (A,B,A,B — not A,A,B,B): the suite
        # itself drives loadavg past 10, so with grouped replicates
        # the second mode always runs on a hotter box and a -n 1 run
        # systematically biases AGAINST whichever mode is measured
        # last (observed r13: a grouped -n 1 graph run read the scope
        # 7% WORSE under loadavg 12->19 while the recorded -n 2 run
        # had it 14% better). Alternating modes gives both the same
        # load profile; best-of-n then compares like with like.
        best = {m: (None, None, None)
                for m in ("per_query_caches", "shared_scope")}
        for _ in range(n):
            for mode in best:
                # loadavg sampled WITH each timed replicate (ADVICE
                # r13 #2): a single sample at print time reports
                # near-identical post-run load for both modes and
                # says nothing about the load each mode actually ran
                # under — the winning replicate's own sample is the
                # attribution record the interleaving exists for.
                load = round(os.getloadavg()[0], 2)
                if mode == "shared_scope":
                    with SharedScope():
                        per = run_suite(spark, reg, sf_dir)
                else:
                    per = run_suite(spark, reg, sf_dir)
                spark.catalog.clearCache()
                total = round(sum(per.values()), 2)
                if best[mode][0] is None or total < best[mode][0]:
                    best[mode] = (total, per, load)
        for mode, (best_total, best_per, best_load) in best.items():
            print(json.dumps({
                "sf_dir": os.path.basename(sf_dir), "family": fam,
                "mode": mode,
                "suite_total_best": best_total, "per_query": best_per,
                "loadavg_1m_at_best_replicate": best_load}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
