"""Multimodal-column queries: binary payload + metadata (full oracle)
and the Arrow-batched feature-extraction stub (rows-only; the decode is
stubbed — see functions/multimodal.decode_stub — but the Spark plumbing
is real and the fake features are deterministic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import multimodal as MM
from ..sources.parquet_source import table
from . import query


@query(
    "multimodal_binary_meta",
    oracle="""
    WITH t AS (SELECT doc_id,
                      regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')
                          AS text
               FROM documents)
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'application/octet-stream' AS mime,
           hex(encode(substring(text, 1, 4))) AS magic_hex
    FROM t
    """,
    doc="binary media columns with typed metadata struct (byte length, "
        "mime, magic prefix)",
)
def multimodal_binary_meta(spark, sf_dir):
    media = MM.with_binary_content(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.magic_hex").alias("magic_hex"),
    )


@query(
    "multimodal_feature_extract",
    oracle=None,
    doc="mapInPandas feature extraction over binary payloads (decode "
        "stubbed, deterministic fake features; schema/batching real)",
)
def multimodal_feature_extract(spark, sf_dir):
    media = MM.with_binary_content(table(spark, sf_dir, "documents"))
    feats = MM.extract_features(media)
    return feats.select(
        "doc_id", "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", MM.FEATURE_DIM), 6)
         .alias("f_last"),
        "decode_ok",
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS text
      FROM documents),
    f AS (
      SELECT doc_id, text,
             unnest(generate_series(
                 0, (length(text) - 1) // 16, 4)) AS frame_idx
      FROM t WHERE length(text) > 0)
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(('0x' || substr(md5(
               substr(text, frame_idx * 16 + 1, 16)), 1, 15))
               AS BIGINT) AS frame_hash,
           CAST(length(substr(text, frame_idx * 16 + 1, 16))
               AS BIGINT) AS frame_len
    FROM f ORDER BY doc_id, frame_idx
    """,
    doc="video-style frame sampling over binary payloads: 16-byte "
        "frames, every 4th sampled, each fingerprinted with the 60-bit "
        "md5 (what media dedup/contamination joins on). mapInPandas "
        "fan-out inside the Arrow batch, no shuffle; the payloads are "
        "ASCII so the oracle reproduces the byte slicing with string "
        "ops and hashes the identical frames",
)
def multimodal_frame_sample(spark, sf_dir):
    media = MM.with_binary_content(table(spark, sf_dir, "documents"))
    return (MM.sample_frames(media)
            .orderBy("doc_id", "frame_idx"))


@query(
    "multimodal_ppm_decode",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS text
      FROM documents),
    rep AS (
      SELECT doc_id,
             repeat(text, CAST(ceil(192.0 / length(text)) + 1 AS INT))
                 AS r
      FROM t WHERE length(text) > 0),
    px AS (SELECT doc_id, p,
                  ascii(substr(r, p + 1, 1)) AS byte
           FROM rep, (SELECT unnest(generate_series(0, 191)) AS p)),
    ch AS (SELECT doc_id, p % 3 AS c,
                  CAST(sum(byte) AS BIGINT) AS s
           FROM px GROUP BY 1, 2)
    SELECT doc_id,
           CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
           ROUND(CAST(max(CASE WHEN c = 0 THEN s END) AS DOUBLE) / 64,
                 6) AS mean_r,
           ROUND(CAST(max(CASE WHEN c = 1 THEN s END) AS DOUBLE) / 64,
                 6) AS mean_g,
           ROUND(CAST(max(CASE WHEN c = 2 THEN s END) AS DOUBLE) / 64,
                 6) AS mean_b,
           TRUE AS decode_ok
    FROM ch GROUP BY doc_id ORDER BY doc_id
    """,
    doc="REAL image decode, not a stub: each doc gets a valid 8x8 P6 "
        "PPM payload (header + text bytes as RGB), and the "
        "mapInPandas kernel PARSES the binary format — magic, dims, "
        "maxval, raw pixel grid — with pure numpy, emitting dimensions "
        "and exact per-channel means (integer byte sums / 64). The "
        "oracle recomputes the same means from the source text bytes, "
        "so the whole decode path is value-verified cross-engine. "
        "Codec formats still stub (functions/multimodal.decode_stub); "
        "this proves the decode slot works end to end on a format the "
        "container can actually parse. No shuffle: decode is a narrow "
        "Arrow-batched map",
)
def multimodal_ppm_decode(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = MM.with_ppm_payload(docs)
    return (MM.extract_ppm_features(media)
            .select("doc_id", "width", "height",
                    F.round("mean_r", 6).alias("mean_r"),
                    F.round("mean_g", 6).alias("mean_g"),
                    F.round("mean_b", 6).alias("mean_b"),
                    "decode_ok")
            .orderBy("doc_id"))
