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
    """Mergeable per-bucket partial-stat expressions, aliased ``{col}__{stat}``.

    Built as SQL strings (one py4j call per expression) rather than nested
    Column objects — identical Catalyst expressions, a fraction of the
    driver-side construction chatter (guide §7.3: planning/analysis is
    single-threaded driver work paid inside every validate() call)."""
    nums = set(numeric_columns(df, columns))
    exprs: list[Column] = [F.expr("count(1) AS __rows")]
    for c in columns:
        exprs.append(F.expr(
            f"sum(CASE WHEN `{c}` IS NULL THEN 1 ELSE 0 END) AS `{c}__nulls`"
        ))
        exprs.append(F.expr(
            f"hll_sketch_agg(CAST(`{c}` AS STRING)) AS `{c}__hll`"
        ))
        if c in nums:
            d = f"CAST(`{c}` AS DOUBLE)"
            exprs += [
                F.expr(f"min({d}) AS `{c}__min`"),
                F.expr(f"max({d}) AS `{c}__max`"),
                F.expr(f"sum({d}) AS `{c}__sum`"),
                F.expr(f"sum({d} * {d}) AS `{c}__sumsq`"),
            ]
    return exprs


def merge_bucket_stats(bucket_stats: DataFrame, columns: list[str], numeric: list[str]) -> DataFrame:
    """Merge per-bucket partials into global partials (one row)."""
    exprs: list[Column] = [F.expr("sum(`__rows`) AS `__rows`")]
    for c in columns:
        exprs.append(F.expr(f"sum(`{c}__nulls`) AS `{c}__nulls`"))
        exprs.append(F.expr(f"hll_union_agg(`{c}__hll`) AS `{c}__hll`"))
        if c in numeric:
            exprs += [
                F.expr(f"min(`{c}__min`) AS `{c}__min`"),
                F.expr(f"max(`{c}__max`) AS `{c}__max`"),
                F.expr(f"sum(`{c}__sum`) AS `{c}__sum`"),
                F.expr(f"sum(`{c}__sumsq`) AS `{c}__sumsq`"),
            ]
    return bucket_stats.agg(*exprs)


def finalize_stats(global_stats: DataFrame, columns: list[str], numeric: list[str]) -> DataFrame:
    """Unpivot the one-row wide partials into ``(column_name, metric, value)``.

    One ``F.expr`` string for the whole explode(array(named_struct...)) —
    the same Catalyst tree the old per-struct Column building produced, in
    one py4j call instead of ~170 (see bucket_stat_exprs)."""
    structs: list[str] = []

    def metric(c: str, m: str, v: str) -> str:
        return (
            f"named_struct('column_name', '{c}', 'metric', '{m}', "
            f"'value', CAST({v} AS DOUBLE))"
        )

    rows = "CAST(`__rows` AS DOUBLE)"
    for c in columns:
        nulls = f"CAST(`{c}__nulls` AS DOUBLE)"
        structs += [
            metric(c, "count", rows),
            metric(c, "null_count", nulls),
            metric(c, "null_rate", f"{nulls} / {rows}"),
            metric(c, "approx_ndv", f"hll_sketch_estimate(`{c}__hll`)"),
        ]
        if c in numeric:
            n = f"({rows} - {nulls})"
            mean = f"(`{c}__sum` / {n})"
            var = f"greatest(`{c}__sumsq` / {n} - {mean} * {mean}, 0.0D)"
            structs += [
                metric(c, "min", f"`{c}__min`"),
                metric(c, "max", f"`{c}__max`"),
                metric(c, "mean", mean),
                metric(c, "stddev", f"sqrt({var})"),
            ]
    return (
        global_stats.select(
            F.expr(f"explode(array({', '.join(structs)})) AS s")
        ).select("s.column_name", "s.metric", "s.value")
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
