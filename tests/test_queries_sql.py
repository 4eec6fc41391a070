

def test_variant_props_stats_nonobject_payloads(spark, tmp_path):
    """Round-4 advice regression: the OBJECT/OTHER collapse must agree
    cross-engine for NON-object payloads too (the live testdata only
    ever has object props, so the sweep can't exercise this branch).
    Synthesizes array/string/number/null top-level JSON and compares
    the Spark VARIANT path against the DuckDB oracle verbatim."""
    import os
    import sys

    import duckdb
    import pandas as pd

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from check_oracle import canon
    from big_datatrader_spark.queries import load_registry

    rows = []
    payloads = ['{"k": 7}', '{"k": 9}', "[1, 2, 3]", '"plain"',
                "42", "null", '{"k": null}']
    for i, p in enumerate(payloads):
        rows.append((i + 1, pd.Timestamp("2024-01-01") +
                     pd.Timedelta(minutes=i), i % 2, "click",
                     1.0, p))
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        sf + "/events.parquet")

    q = load_registry()["variant_props_stats"]
    s = canon(q.spark_fn(spark, sf).toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet/*.parquet')")
    d = canon(con.execute(q.oracle).fetchdf())
    assert set(s.top_type) == {"OBJECT", "OTHER"}
    assert s.equals(d), "variant OBJECT/OTHER collapse diverged"
