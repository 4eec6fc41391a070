"""big_datatrader_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference trading simulator (liviuxyz-ctrl/BIG_DataTrader, surveyed in
SURVEY.md), built Spark-first: declarative DataFrame/SQL plans, Catalyst
optimization, explicit schemas, no driver-side row loops.

Layout
------
- ``session``    SparkSession construction + runtime conf hygiene
- ``schemas``    explicit StructTypes (OHLCV + star schema)
- ``sources``    scans (CSV w/ declared schema, parquet star schema,
                 file discovery) and sinks (CSV export)
- ``operators``  relational operators: filters (incl. the JSON predicate
                 compiler), window indicators, stride signals, backtests,
                 star-schema analytics, as-of joins
- ``functions``  LLM-data-pipeline operators: text analysis, dedup
                 (exact/minhash/simhash/ngram/embedding), similarity
                 search, multimodal column plumbing
- ``streaming``  Structured Streaming variants of the signal pipeline
- ``plans``      plan-inspection helpers (pushdown / codegen assertions)
"""

__version__ = "0.1.0"
