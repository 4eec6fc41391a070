"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels (north-star extension).

The container has no image/audio codecs, so the actual decode is a
clearly-marked stub (``decode_stub``): it either raises
NotImplementedError (strict mode) or produces a deterministic fake
feature vector derived from the bytes. Everything AROUND the decode —
schema, binary columns, metadata structs, partition-sized Arrow batches,
UDF signatures — is real and tested; swapping in a real codec is a
one-function change.

Scale notes: binary payloads ride in parquet as byte arrays; mapInPandas
streams per-partition Arrow batches (bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``), and feature
extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8

MEDIA_META_COLS = (
    "n_bytes bigint, mime string, magic_hex string")

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, "
    "feature array<double>, decode_ok boolean")


def ascii_text(col):
    """Strip non-ASCII codepoints so character slicing and byte slicing
    agree BY CONSTRUCTION. The payload builders below synthesize bytes
    from document text; their oracles recompute the same bytes with
    per-character string ops, which only coincide when every character
    is one byte. Stripping (applied identically in the oracles) makes
    that hold on any testdata generation instead of silently
    desynchronizing the first time a multi-byte character appears."""
    return F.regexp_replace(col, "[^\\x00-\\x7F]", "")


def with_binary_content(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        mime: str = "application/octet-stream"
                        ) -> DataFrame:
    """Simulate a media table: payload bytes + typed metadata struct.
    (Real pipelines read payloads via ``spark.read.format('binaryFile')``
    — see sources/csv_source.discover_csv_files for the listing path.)"""
    txt = ascii_text(F.col(text_col))
    content = F.encode(txt, "UTF-8")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.lit(mime).alias("mime"),
            F.hex(F.encode(F.substring(txt, 1, 4), "UTF-8"))
             .alias("magic_hex"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes, strict: bool = False) -> np.ndarray:
    """STUB for the real media decode (no codecs in this container).

    strict=True raises NotImplementedError — the behavior a production
    deployment would override. strict=False returns a deterministic fake
    "feature vector": FEATURE_DIM means over the byte stream, so tests
    exercise real numeric plumbing end to end.
    """
    if strict:
        raise NotImplementedError(
            "media decode requires a codec library not present in this "
            "environment; install one and replace decode_stub")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def extract_features(df: DataFrame, *, id_col: str = "doc_id",
                     content_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[content_col].map(len).astype("int64"),
                "byte_mean": [float(np.frombuffer(b, dtype=np.uint8)
                                    .mean()) if len(b) else 0.0
                              for b in pdf[content_col]],
                "feature": [f.tolist() for f in feats],
                "decode_ok": True,
            })

    slim = df.select(F.col(id_col), F.col(content_col))
    return slim.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_BYTES = 16
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_hash long, frame_len long"


def sample_frames(df: DataFrame, *, id_col: str = "doc_id",
                  content_col: str = "content",
                  frame_bytes: int = FRAME_BYTES,
                  stride: int = 4) -> DataFrame:
    """Frame sampling over binary media payloads: the payload is cut
    into fixed-size frames and every ``stride``-th frame is emitted
    with a 60-bit md5 fingerprint — the video-keyframe-sampling shape
    (decode itself stays behind ``decode_stub``; the fingerprint is
    what dedup/contamination over media would join on).

    One mapInPandas pass, no shuffle; the per-row fan-out happens
    inside the Arrow batch.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes, lens = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload)
                if not b:
                    continue
                n_frames = (len(b) - 1) // frame_bytes + 1
                for i in range(0, n_frames, stride):
                    frame = b[i * frame_bytes:(i + 1) * frame_bytes]
                    h = int(hashlib.md5(frame).hexdigest()[:15], 16)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(h)
                    lens.append(len(frame))
            if ids:
                yield pd.DataFrame({
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                })

    slim = df.select(F.col(id_col), F.col(content_col))
    return slim.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decode path: PPM (P6) — a codec-less binary image format, so the
# decoder needs nothing beyond numpy. This replaces the stub for one
# real format and proves the decode slot end to end; codec formats
# (JPEG/PNG/audio) still go through decode_stub.

PPM_W, PPM_H = 8, 8
_PPM_PIXELS = PPM_W * PPM_H * 3


def with_ppm_payload(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Synthesize a valid P6 image per row: the standard header plus
    the first w*h*3 bytes of the (repeated) document text as RGB data.
    Deterministic and byte-reproducible from the text alone, which is
    what lets an engine-independent oracle recompute channel means."""
    base = (df.select(F.col(id_col),
                      ascii_text(F.col(text_col)).alias("__t"))
            .filter(F.length("__t") > 0))
    rep = F.expr(
        f"repeat(__t, CAST(ceil({_PPM_PIXELS} / length(__t))"
        " + 1 AS INT))")
    payload = F.concat(
        F.encode(F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n"), "UTF-8"),
        F.encode(F.substring(rep, 1, _PPM_PIXELS), "UTF-8"))
    return base.select(F.col(id_col), payload.alias("content"))


PPM_FEATURE_SCHEMA = ("doc_id long, width long, height long, "
                      "mean_r double, mean_g double, mean_b double, "
                      "decode_ok boolean")


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL P6 parser: header (magic, dims, maxval) then raw RGB
    bytes -> (h, w, 3) uint8 array. Raises on malformed input."""
    parts = payload.split(b"\n", 3)
    if parts[0] != b"P6" or len(parts) < 4:
        raise ValueError("not a P6 ppm")
    w, h = (int(x) for x in parts[1].split())
    if int(parts[2]) != 255:
        raise ValueError("unsupported maxval")
    data = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return w, h, data.reshape(h, w, 3)


def extract_ppm_features(df: DataFrame, *, id_col: str = "doc_id",
                         content_col: str = "content") -> DataFrame:
    """Arrow-batched REAL image decode: parse every payload as P6,
    emit dimensions + exact per-channel means (integer byte sums over
    w*h pixels divided once — no accumulation-order sensitivity)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                w, h, img = decode_ppm(bytes(b))
                sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
                rows.append((int(doc_id), w, h,
                             sums[0] / (w * h), sums[1] / (w * h),
                             sums[2] / (w * h), True))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "mean_r", "mean_g",
                "mean_b", "decode_ok"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, schema=PPM_FEATURE_SCHEMA)
