"""A/B spec (tools/measure_ab.py): the six r15 persist-before-sort
conversions (VERDICT r14 ask #5). For each converted query the OLD
plan is exactly the builder under the identity cache (plan_fn +
lazy_cache — the pre-conversion lazy tree, sort resamples the
uncached kernel chain), and the NEW plan is the registered spark_fn
(run_scoped: pre-sort relation persisted, result checkpointed, caches
released). One variant pair per query, interleaved by measure_ab.
"""

from big_datatrader_spark.queries import lazy_cache, load_registry

_REG = load_registry()
# The measured run (plans/r15/ab_presort_sf1.json) covered all six
# r14-flagged queries; the two fold members (macd_histogram,
# time_decay_ewma) measured worse/wash and were REVERTED, so this
# spec now lists only the four landed conversions (the reverted two
# have no plan_fn to build the old form from).
_SIX = ["multimodal_feature_extract", "multimodal_frame_sample",
        "multimodal_ppm_decode", "multimodal_wav_decode"]


def _old(name):
    def fn(spark, sf_dir):
        return _REG[name].plan_fn(spark, sf_dir, lazy_cache)
    return fn


def _new(name):
    def fn(spark, sf_dir):
        return _REG[name].spark_fn(spark, sf_dir)
    return fn


VARIANTS = []
for _n in _SIX:
    VARIANTS.append((f"{_n}:old", _old(_n)))
    VARIANTS.append((f"{_n}:new", _new(_n)))
