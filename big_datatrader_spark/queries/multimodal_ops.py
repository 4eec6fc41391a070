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
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'application/octet-stream' AS mime,
           hex(encode(substring(text, 1, 4))) AS magic_hex
    FROM documents
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
    WITH f AS (
      SELECT doc_id, text,
             unnest(generate_series(
                 0, (length(text) - 1) // 16, 4)) AS frame_idx
      FROM documents WHERE length(text) > 0)
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
