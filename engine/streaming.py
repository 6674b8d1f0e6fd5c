"""Structured Streaming front-end for the validation suite.

The reference's streaming story is an unbounded regenerated source with state
carried across batches (``infinite_dataset.py:55-76``). The engine's primary
answer is batch-incremental checkpointing (engine/checkpoint.py — SURVEY.md
§2.10 records why: resumable shards beat long-lived streaming state at 10^12
rows). This module adds the true-streaming variant for pipelines that ARE
streams (e.g. clips landing continuously): the same row-local constraint
expressions evaluated per micro-batch via ``foreachBatch``, verdicts appended
to a checkpoint-style sink — state lives in the sink, not the stream.

Row-local checks need no watermark (stateless per row). Windowed drift over
event time (count/mean per tumbling window) is included as the stateful demo
with a watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine import checks as checks_mod
from engine.suite import ConstraintSuite


def stream_validate(
    stream_df: DataFrame,
    suite: ConstraintSuite,
    key_cols: list[str],
    out_path: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
):
    """Attach the suite's row-local checks to a streaming DataFrame.

    Each micro-batch runs the SAME fused conditional-aggregation pass as the
    batch engine (one scan of the batch) and appends per-bucket verdict rows
    (+ batch_id) to ``out_path``. Returns the StreamingQuery. Cumulative
    verdicts = groupBy(constraint).sum over the sink — exactly the
    checkpoint-table merge semantics.
    """
    row_local = suite.row_local()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fact = batch_df.withColumn(
            checks_mod.BUCKET, checks_mod.bucket_expr(key_cols, n_buckets)
        )
        exprs = [F.count(F.lit(1)).cast("long").alias("rows_scanned")] + [
            F.sum(F.when(checks_mod._violation_expr(c, fact), 1).otherwise(0))
            .cast("long")
            .alias(f"__v__{i}")
            for i, c in enumerate(row_local)
        ]
        wide = fact.groupBy(checks_mod.BUCKET).agg(*exprs)
        structs = [
            F.struct(
                F.lit(c.name).alias("constraint"),
                F.col(f"__v__{i}").alias("violation_count"),
            )
            for i, c in enumerate(row_local)
        ]
        long = wide.select(
            F.lit(batch_id).alias("batch_id"),
            F.col(checks_mod.BUCKET),
            "rows_scanned",
            F.explode(F.array(*structs)).alias("v"),
        ).select("batch_id", checks_mod.BUCKET, "v.constraint",
                 "v.violation_count", "rows_scanned")
        # idempotent sink: a retried micro-batch overwrites ITS OWN batch_id
        # partition instead of appending a second copy (dynamic partition
        # overwrite touches only partitions present in this write)
        long.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def cumulative_verdicts(spark, out_path: str) -> DataFrame:
    """Merge streamed per-batch verdict rows into global verdicts.

    (batch_id, bucket_id, constraint) is unique per successful batch write, so
    the dropDuplicates is a no-op on clean runs and absorbs duplicate rows if
    a sink without partition-overwrite semantics ever double-appends."""
    df = spark.read.parquet(out_path).dropDuplicates(
        ["batch_id", checks_mod.BUCKET, "constraint"]
    )
    return (
        df.groupBy("constraint")
        .agg(
            F.sum("violation_count").cast("long").alias("violation_count"),
            F.sum("rows_scanned").cast("long").alias("rows_scanned"),
        )
        .withColumn("passed", F.col("violation_count") == 0)
    )


def windowed_value_drift(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling-window stats with a watermark for late data —
    the streaming analog of the per-bucket stats pass (mergeable partials
    per window). Feed to ``writeStream`` in append mode."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("mean"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
        )
    )
