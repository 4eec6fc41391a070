"""Join strategies for scale: salted joins for skewed keys.

AQE's skew-join handling (on in session.RUNTIME_CONFS) splits oversized
sort-merge partitions automatically; salting is the explicit variant for
the cases AQE can't fix — e.g. a broadcast-ineligible dimension joined
on a power-law key where ONE key holds 10% of a 100 TB fact table.

Mechanics: the fact side gets a deterministic salt in [0, n); the other
side is replicated n times; the join key becomes (key, salt), spreading
each hot key over n shuffle partitions. Results are identical to the
unsalted join (asserted in tests/test_join_strategies.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                *, salt_buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Join ``fact`` with ``dim`` on column ``on`` with key salting.

    ``fact`` rows are salted by a hash of the whole row (deterministic,
    uniform); ``dim`` is exploded ``salt_buckets`` times. Output columns
    match ``fact.join(dim, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]),
                  F.lit(salt_buckets))
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = fact_s.join(dim_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
