"""Skew mitigation for joins and aggregations at cluster scale.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. These helpers cover the
two cases AQE can't:

- ``salted_join``: a *broadcast-ineligible* dimension joined on a key
  where a handful of values dominate (e.g. a null-ish default key owning
  10% of a 100 TB fact table). Salting splits each hot key across
  ``salt`` reducers deterministically — no runtime detection needed when
  the hot keys are known (or everything is salted defensively).
- ``two_phase_agg``: aggregation whose GROUP BY key is so hot that even
  map-side partial aggregation leaves one reducer with most of the data
  (happens when upstream is already partitioned by something else and the
  partials can't combine). Phase 1 aggregates on (key, salt); phase 2
  merges the ≤``salt`` partials per key.

Both preserve exact results for decomposable aggregates (sum/count/min/
max and anything expressible over them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``salt``
    partitions: big rows get a deterministic salt from a sibling column
    hash (falling back to the key itself), the small side is replicated
    ``salt``× via explode, and the join key becomes (key, salt). Shuffle
    load per reducer drops ~salt× for hot keys; replication cost is
    |small|×salt, which is the price of not being broadcast-able.

    ``how`` is restricted to ``inner``/``left`` (left = big-side
    preserving): under salting the small side exists ``salt`` times, so a
    right/full join would emit each unmatched small-side row once per salt
    replica — wrong multiplicity. For small-side-preserving semantics,
    swap the arguments or post-aggregate.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated small side would emit unmatched rows salt× under "
            "right/full joins"
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return big_salted.join(small_salted, on=[on, "_salt"], how=how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, Column]],
    salt: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation: ``aggs`` maps output name →
    (merge function name: 'sum'|'min'|'max'|'count', phase-1 expression).
    'count' merges partial counts with sum.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    phase1 = salted.groupBy(key, "_salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(expr)).alias(out)
            for out, (fn, expr) in aggs.items()
        ]
    )
    merge = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(key).agg(
        *[
            getattr(F, merge[fn])(F.col(out)).alias(out)
            for out, (fn, _expr) in aggs.items()
        ]
    )
