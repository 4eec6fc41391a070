"""Hypothesis property tests for round-5-touched exactness primitives.

All pure functions — no SparkSession — so the suite runs in seconds and
pins the invariants the oracle hashes depend on:

- winnowing's pack/unpack bijection (hash*2^20 + (2^20-1-pos)),
- the integer half-away 6-dp ratio against decimal.Decimal,
- the BPE batched-merge kernel against chained single-pair merges,
- the P6/WAV decoders as true inverses of the payload builders.
"""

from __future__ import annotations

import zlib
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from big_datatrader_spark.functions import multimodal as MM

_POS_BITS = 1 << 20


@given(h=st.integers(0, (1 << 40) - 1), p=st.integers(1, _POS_BITS - 1))
def test_winnowing_pack_is_bijective(h, p):
    """fp_hash/fp_pos recovered from the packed BIGINT must be the
    original (hash, position) — and larger position packs SMALLER, the
    rightmost-tie-break the winnowing window min relies on."""
    pack = h * _POS_BITS + (_POS_BITS - 1 - p)
    assert pack // _POS_BITS == h
    assert _POS_BITS - 1 - pack % _POS_BITS == p
    if p + 1 < _POS_BITS:
        assert h * _POS_BITS + (_POS_BITS - 1 - (p + 1)) < pack


@given(num=st.integers(0, 10**15), den=st.integers(1, 10**9))
def test_round6_integer_formula_matches_decimal_half_up(num, den):
    """The exactness contract is the INTEGER formula (both engines
    convert the same integer to double with the same op, so the float
    is shared by construction): (2n*1e6 + d) // (2d) must be exact
    half-up of n/d at 6 dp for any magnitude."""
    got = (2 * num * 1000000 + den) // (2 * den)
    want = int((Decimal(num) * 1000000 / Decimal(den)).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))
    assert got == want


@given(num=st.integers(0, 192 * 255), den=st.sampled_from([192, 64]))
def test_round6_ratio_float_exact_in_operating_range(num, den):
    """Over the media extractor's actual domain (byte sums / 192,
    energies / 64) the float itself is exact too."""
    got = MM._round6_ratio(num, den)
    want = float(
        (Decimal(num) / Decimal(den)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))
    assert got == want


_SYMS = st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=12)


@settings(deadline=None, max_examples=60)
@given(seqs=st.lists(_SYMS, min_size=1, max_size=8),
       merges=st.lists(
           st.tuples(st.sampled_from(list("abcd")),
                     st.sampled_from(list("abcd"))),
           min_size=1, max_size=4))
def test_bpe_batched_kernel_equals_chained_single_merges(spark, seqs,
                                                         merges):
    """One kernel applying the merge list in rank order must equal the
    original chained one-udf-per-merge form (the O(rounds) Arrow
    rewrite must not change a single token). Needs the session only
    because pandas_udf parses its return type via the active context;
    the kernel itself runs driver-side here."""
    from big_datatrader_spark.queries.retrieval_ops import \
        _apply_merges_udf

    def one_pass(sym, left, right):
        out, i, n = [], 0, len(sym)
        while i < n:
            if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return out

    # grow the merge alphabet like training does: later merges may
    # reference earlier merged symbols. The vocab pick must be a
    # STABLE hash — builtin hash() is salted per process, which makes
    # hypothesis shrinking/replay irreproducible across runs.
    grown, vocab = [], list("abcd")
    for li, ri in merges:
        l = vocab[zlib.crc32(li.encode()) % len(vocab)]
        r = vocab[zlib.crc32(ri.encode()) % len(vocab)]
        grown.append((l, r))
        vocab.append(l + r)

    batched = _apply_merges_udf(grown).func(pd.Series(seqs)).tolist()
    chained = []
    for sym in seqs:
        for l, r in grown:
            sym = one_pass(sym, l, r)
        chained.append(sym)
    assert batched == chained


@settings(deadline=None, max_examples=50)
@given(data=st.binary(min_size=MM._PPM_PIXELS,
                      max_size=MM._PPM_PIXELS))
def test_ppm_decoder_inverts_builder_bytes(data):
    payload = (f"P6\n{MM.PPM_W} {MM.PPM_H}\n255\n".encode() + data)
    w, h, img = MM.decode_ppm(payload)
    assert (w, h) == (MM.PPM_W, MM.PPM_H)
    assert img.tobytes() == data


@settings(deadline=None, max_examples=50)
@given(samples=st.lists(
    st.integers(-(1 << 15), (1 << 15) - 1),
    min_size=MM.WAV_SAMPLES, max_size=MM.WAV_SAMPLES))
def test_wav_decoder_inverts_pcm16_payload(samples):
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    rate, n_ch, got = MM.decode_wav(MM._WAV_HEADER + pcm)
    assert rate == MM.WAV_RATE and n_ch == 1
    assert got.tolist() == samples
