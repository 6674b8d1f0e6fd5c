"""Skew handling: deterministic salting + AQE configuration.

The clips table is deliberately skewed (codec 70/15/10/5, sr_hz 80/10/7/3 —
FIXTURES.md), mirroring production hot partitions. Two mechanisms:

1. **AQE** (configured in engine/session.py): skew-join splitting and
   partition coalescing handle *shuffle* skew at runtime — free, always on.

2. **Deterministic salting** (this module) for aggregations whose per-key
   state doesn't shrink map-side (collect_list/set, exact distinct): spread a
   hot group over S sub-groups with ``pmod(xxhash64(fine_grain_col), S)``,
   aggregate partially per (key, salt), then merge per key. The salt comes
   from a *hash of data*, never ``rand()`` — the engine's determinism rule
   (verdicts must be identical across partition counts and resume boundaries,
   SURVEY.md §7 hard-part 3; reference analog: seed pinning,
   models/utils.py:158-165).

Plain sum/count/min/max do NOT need salting: Spark's partial aggregation
already combines map-side, which is equivalent to salting by input partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AQE_SKEW_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128m",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def salt_col(fine_grain_col: str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of a fine-grained column
    (e.g. clip_id) so rows of a hot key spread evenly but reproducibly."""
    return F.pmod(F.xxhash64(F.col(fine_grain_col)), F.lit(n_salts)).cast("int")


def salted_distinct_count(
    df: DataFrame, group_cols: list[str], distinct_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per hot group without one giant per-key state:
    phase 1 dedups (group, salt, x) — the skew spreads over n_salts reducers —
    phase 2 merges per group. Result column: ``ndv``."""
    salted = df.select(*group_cols, F.col(distinct_col), salt_col(distinct_col, n_salts).alias("__salt"))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        F.countDistinct(distinct_col).alias("__partial")
    )
    # distinct values hash to exactly one salt -> partials are disjoint: sum is exact
    return phase1.groupBy(*group_cols).agg(F.sum("__partial").cast("long").alias("ndv"))


def salted_collect_set(
    df: DataFrame, group_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """collect_set per hot group via two-phase union of salted partial sets.
    Result column: ``values``."""
    salted = df.select(*group_cols, F.col(value_col), salt_col(value_col, n_salts).alias("__salt"))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        F.collect_set(value_col).alias("__vals")
    )
    return phase1.groupBy(*group_cols).agg(
        F.array_distinct(F.flatten(F.collect_list("__vals"))).alias("values")
    )
