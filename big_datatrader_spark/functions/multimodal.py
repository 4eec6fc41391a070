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


# ---------------------------------------------------------------------------
# REAL audio decode path: RIFF/WAVE PCM16 — like P6 PPM, a codec-less
# container format numpy can parse byte-for-byte. Every doc gets a valid
# 44-byte-header WAV whose PCM samples derive from its text bytes, so an
# engine-independent oracle can recompute the decoded features.

WAV_RATE = 8000
WAV_SAMPLES = 64                      # fixed-length clip per doc
_WAV_DATA_BYTES = WAV_SAMPLES * 2     # PCM16 mono

import struct as _struct

_WAV_HEADER = (
    b"RIFF" + _struct.pack("<I", 36 + _WAV_DATA_BYTES) + b"WAVE"
    + b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE,
                             WAV_RATE * 2, 2, 16)
    + b"data" + _struct.pack("<I", _WAV_DATA_BYTES))


def with_wav_payload(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Synthesize a valid PCM16-mono WAV per row: the constant 44-byte
    RIFF header (every clip is the same fixed length, so the length
    fields are compile-time constants emitted via ``unhex`` — UTF-8
    encoding could not produce the 0x80+ header bytes) plus the first
    2*WAV_SAMPLES text bytes as little-endian sample pairs. ASCII bytes
    are 0..127, so sample_j = b[2j] + 256*b[2j+1] is non-negative and
    the oracle recomputes it from per-character codepoints."""
    base = (df.select(F.col(id_col),
                      ascii_text(F.col(text_col)).alias("__t"))
            .filter(F.length("__t") > 0))
    rep = F.expr(
        f"repeat(__t, CAST(ceil({_WAV_DATA_BYTES} / length(__t))"
        " + 1 AS INT))")
    payload = F.concat(
        F.unhex(F.lit(_WAV_HEADER.hex())),
        F.encode(F.substring(rep, 1, _WAV_DATA_BYTES), "UTF-8"))
    return base.select(F.col(id_col), payload.alias("content"))


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL RIFF/WAVE parser: walk the chunk structure (RIFF magic,
    fmt chunk -> PCM/channels/rate/bits, data chunk -> samples) and
    return (rate, n_channels, int16 sample array). Raises on anything
    that isn't canonical PCM16."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = _struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt_code, n_ch, rate, _, _, bits = _struct.unpack_from(
                "<HHIIHH", payload, pos + 8)
            if fmt_code != 1:
                raise ValueError("not PCM")
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None or bits != 16:
        raise ValueError("missing fmt/data chunk or not 16-bit")
    return rate, n_ch, np.frombuffer(data, dtype="<i2")


WAV_FEATURE_SCHEMA = ("doc_id long, sample_rate long, n_samples long, "
                      "peak_amp long, sum_sq long, rms double, "
                      "decode_ok boolean")


def extract_wav_features(df: DataFrame, *, id_col: str = "doc_id",
                         content_col: str = "content") -> DataFrame:
    """Arrow-batched REAL audio decode: parse each payload's RIFF chunk
    structure, emit rate, sample count, peak amplitude, exact integer
    sum of squares, and RMS (one correctly-rounded sqrt of an exact
    power-of-two division — engine-independent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                rate, _, s = decode_wav(bytes(b))
                s64 = s.astype(np.int64)
                ssq = int((s64 * s64).sum())
                rows.append((int(doc_id), rate, len(s),
                             int(s64.max()), ssq,
                             float(np.sqrt(ssq / len(s))), True))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "n_samples", "peak_amp",
                "sum_sq", "rms", "decode_ok"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, schema=WAV_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# ViT-style patchify over the decoded PPM pixel grid: 8x8 RGB -> 2x2
# grid of 4x4 patches, each reduced to exact per-channel means. This is
# the preprocessing shape every vision-transformer ingest pipeline runs
# (image -> patch grid -> per-patch vectors) on real decoded pixels.

PATCH = 4  # patch side; PPM_W/H = 8 -> a 2x2 patch grid

PATCH_SCHEMA = ("doc_id long, patch_row long, patch_col long, "
                "mean_r double, mean_g double, mean_b double")


def patchify_ppm(df: DataFrame, *, id_col: str = "doc_id",
                 content_col: str = "content") -> DataFrame:
    """Decode each P6 payload and emit one row per PATCHxPATCH patch
    with exact per-channel means. The patch reduction is one vectorized
    numpy reshape-sum — integer byte sums divided once, so the means
    are order-insensitive and oracle-reproducible. Narrow op: the
    per-row fan-out (4 patches/doc) happens inside the Arrow batch."""
    g = PPM_W // PATCH

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                w, h, img = decode_ppm(bytes(b))
                sums = (img.astype(np.int64)
                        .reshape(g, PATCH, g, PATCH, 3)
                        .sum(axis=(1, 3)))  # (g, g, 3)
                for pr in range(g):
                    for pc in range(g):
                        m = sums[pr, pc] / (PATCH * PATCH)
                        rows.append((int(doc_id), pr, pc,
                                     m[0], m[1], m[2]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "patch_row", "patch_col",
                "mean_r", "mean_g", "mean_b"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, schema=PATCH_SCHEMA)


# ---------------------------------------------------------------------------
# Frame-level audio features over the decoded PCM stream

WAV_FRAME = 16  # samples per analysis frame -> WAV_SAMPLES/WAV_FRAME frames

FRAME_FEATURE_SCHEMA = ("doc_id long, frame_id long, n long, "
                        "sum_sq long, rms double, zero_crossings long")


def extract_wav_frames(df: DataFrame, *, id_col: str = "doc_id",
                       content_col: str = "content") -> DataFrame:
    """Frame-level DSP over REAL decoded PCM: cut each clip into
    WAV_FRAME-sample frames and emit per-frame energy (exact integer
    sum of squares + RMS) and the zero-crossing count of the
    MEAN-CENTERED frame. Samples here are non-negative byte pairs, so
    raw sign changes would always be zero; centering is done in exact
    integers (sign of n*s_j - frame_sum — no float mean), which keeps
    the crossing count bit-identical on any engine."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                _, _, s = decode_wav(bytes(b))
                s64 = s.astype(np.int64)
                for f in range(len(s64) // WAV_FRAME):
                    fr = s64[f * WAV_FRAME:(f + 1) * WAV_FRAME]
                    ssq = int((fr * fr).sum())
                    cent = WAV_FRAME * fr - int(fr.sum())
                    sgn = np.where(cent >= 0, 1, -1)
                    zc = int((sgn[1:] != sgn[:-1]).sum())
                    rows.append((int(doc_id), f, WAV_FRAME, ssq,
                                 float(np.sqrt(ssq / WAV_FRAME)), zc))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_id", "n", "sum_sq", "rms",
                "zero_crossings"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, schema=FRAME_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Mixed-format media lake + format-dispatching extraction. The generic
# feature-extract slot routes every payload to the REAL decoder its
# magic bytes select (P6 -> decode_ppm, RIFF -> decode_wav);
# decode_stub remains only for formats the container genuinely cannot
# parse (JPEG/PNG/FLAC), reached when no magic matches.

PPM_HEADER_LEN = len(f"P6\n{PPM_W} {PPM_H}\n255\n")
WAV_HEADER_LEN = len(_WAV_HEADER)

MEDIA_FEATURE_SCHEMA = ("doc_id long, mime string, n_bytes long, "
                        "n_units long, feat_sum long, feat6 double, "
                        "decode_ok boolean")


def with_mixed_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One payload per doc, format chosen by doc_id parity (even -> P6
    image, odd -> PCM16 WAV): a mixed-format media lake synthesized in
    ONE scan of documents — the `when()` dispatch keeps it a narrow
    projection, no union of two scans."""
    base = (df.select(F.col(id_col),
                      ascii_text(F.col(text_col)).alias("__t"))
            .filter(F.length("__t") > 0))
    rep_img = F.expr(
        f"repeat(__t, CAST(ceil({_PPM_PIXELS} / length(__t))"
        " + 1 AS INT))")
    rep_wav = F.expr(
        f"repeat(__t, CAST(ceil({_WAV_DATA_BYTES} / length(__t))"
        " + 1 AS INT))")
    ppm = F.concat(
        F.encode(F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n"), "UTF-8"),
        F.encode(F.substring(rep_img, 1, _PPM_PIXELS), "UTF-8"))
    wav = F.concat(
        F.unhex(F.lit(_WAV_HEADER.hex())),
        F.encode(F.substring(rep_wav, 1, _WAV_DATA_BYTES), "UTF-8"))
    payload = F.when(F.col(id_col) % 2 == 0, ppm).otherwise(wav)
    return base.select(F.col(id_col), payload.alias("content"))


def _round6_ratio(num: int, den: int) -> float:
    """Exact half-away 6-dp rounding of num/den (num >= 0) in integer
    arithmetic — literally the oracle's `(2*num*1e6 + den) // (2*den)`
    formula, so the float is engine-independent by construction."""
    return ((2 * num * 1000000 + den) // (2 * den)) / 1e6


def extract_media_features(df: DataFrame, *, id_col: str = "doc_id",
                           content_col: str = "content") -> DataFrame:
    """Format-dispatching Arrow-batched extraction: sniff magic bytes,
    route to the matching REAL decoder, fall back to ``decode_stub``
    for unknown formats (decode_ok=False; dead branch on the
    synthesized table, live in production). Unified feature row:
    detected mime, payload size, primitive count (pixel bytes /
    samples), an exact integer feature sum (byte sum for images,
    energy for audio) and its exact 6-dp mean. Narrow mapInPandas —
    zero shuffle, like every decode path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf[id_col], pdf[content_col]):
                b = bytes(raw)
                if b[:2] == b"P6":
                    _, _, img = decode_ppm(b)
                    fs = int(img.astype(np.int64).sum())
                    n = int(img.size)
                    rows.append((int(doc_id), "image/x-portable-pixmap",
                                 len(b), n, fs, _round6_ratio(fs, n),
                                 True))
                elif b[:4] == b"RIFF":
                    _, _, s = decode_wav(b)
                    s64 = s.astype(np.int64)
                    fs = int((s64 * s64).sum())
                    n = len(s64)
                    rows.append((int(doc_id), "audio/wav", len(b), n,
                                 fs, _round6_ratio(fs, n), True))
                else:
                    feat = decode_stub(b)
                    rows.append((int(doc_id), "application/octet-stream",
                                 len(b), len(feat), 0, 0.0, False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "mime", "n_bytes", "n_units", "feat_sum",
                "feat6", "decode_ok"])

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, schema=MEDIA_FEATURE_SCHEMA)
