"""Single-pass per-column statistics.

The reference re-scans its arrays once per metric (MAE/RMSE/R2 at
``anomaly_detection.py:446-448``, histogram at ``:347-350``, min/max at
``:347,377``, mean/std at ``rnn_old.py:252-253``). At 10^12 rows every scan is
the dominant cost, so this module fuses ALL per-column statistics into one
``groupBy(bucket).agg(*exprs)`` pass whose per-bucket partials are **mergeable**:

  count / null_count / min / max / sum / sum_sq  -> algebraic merges
  ndv                                            -> HLL sketch (hll_sketch_agg,
                                                    merged with hll_union_agg)

so per-partition lineage stats and the global stats come from the SAME scan —
partial aggregation map-side, final merge reduce-side, exactly Spark's
partial+final agg model. Quantiles ride the t-digest path (engine/sketch.py).

mean = sum/count and var = sum_sq/count - mean^2 are derived at finalize time;
the two-pass-free formula trades a little numerical headroom for mergeability
(acceptable for drift/validation; values are doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

#: metrics emitted for every column / numeric-only
BASE_METRICS = ("count", "null_count", "null_rate", "approx_ndv")
NUMERIC_METRICS = ("min", "max", "mean", "stddev")


def numeric_columns(df: DataFrame, columns: list[str]) -> list[str]:
    by_name = {f.name: f.dataType for f in df.schema.fields}
    return [c for c in columns if isinstance(by_name[c], _NUMERIC)]


def bucket_stat_exprs(df: DataFrame, columns: list[str]) -> list[Column]:
    """Mergeable per-bucket partial-stat expressions, aliased ``{col}__{stat}``."""
    nums = set(numeric_columns(df, columns))
    exprs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        col = F.col(c)
        exprs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        exprs.append(F.hll_sketch_agg(col.cast("string")).alias(f"{c}__hll"))
        if c in nums:
            d = col.cast("double")
            exprs += [
                F.min(d).alias(f"{c}__min"),
                F.max(d).alias(f"{c}__max"),
                F.sum(d).alias(f"{c}__sum"),
                F.sum(d * d).alias(f"{c}__sumsq"),
            ]
    return exprs


def merge_bucket_stats(bucket_stats: DataFrame, columns: list[str], numeric: list[str]) -> DataFrame:
    """Merge per-bucket partials into global partials (one row)."""
    exprs: list[Column] = [F.sum("__rows").alias("__rows")]
    for c in columns:
        exprs.append(F.sum(f"{c}__nulls").alias(f"{c}__nulls"))
        exprs.append(F.hll_union_agg(f"{c}__hll").alias(f"{c}__hll"))
        if c in numeric:
            exprs += [
                F.min(f"{c}__min").alias(f"{c}__min"),
                F.max(f"{c}__max").alias(f"{c}__max"),
                F.sum(f"{c}__sum").alias(f"{c}__sum"),
                F.sum(f"{c}__sumsq").alias(f"{c}__sumsq"),
            ]
    return bucket_stats.agg(*exprs)


def finalize_stats(global_stats: DataFrame, columns: list[str], numeric: list[str]) -> DataFrame:
    """Unpivot the one-row wide partials into ``(column_name, metric, value)``."""
    structs: list[Column] = []

    def metric(c: str, m: str, v: Column) -> Column:
        return F.struct(
            F.lit(c).alias("column_name"), F.lit(m).alias("metric"),
            v.cast("double").alias("value"),
        )

    rows = F.col("__rows").cast("double")
    for c in columns:
        nulls = F.col(f"{c}__nulls").cast("double")
        structs += [
            metric(c, "count", rows),
            metric(c, "null_count", nulls),
            metric(c, "null_rate", nulls / rows),
            metric(c, "approx_ndv", F.hll_sketch_estimate(F.col(f"{c}__hll"))),
        ]
        if c in numeric:
            n = rows - nulls
            mean = F.col(f"{c}__sum") / n
            var = F.greatest(F.col(f"{c}__sumsq") / n - mean * mean, F.lit(0.0))
            structs += [
                metric(c, "min", F.col(f"{c}__min")),
                metric(c, "max", F.col(f"{c}__max")),
                metric(c, "mean", mean),
                metric(c, "stddev", F.sqrt(var)),
            ]
    return (
        global_stats.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.column_name", "s.metric", "s.value")
    )


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-scan per-column stats: ``(column_name, metric, value)``.

    Convenience wrapper when per-bucket lineage isn't needed — single global
    agg (Spark still does partial+final under the hood).
    """
    columns = columns or df.columns
    numeric = numeric_columns(df, columns)
    one = df.agg(*bucket_stat_exprs(df, columns))
    return finalize_stats(one, columns, numeric)
