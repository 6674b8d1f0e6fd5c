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
    transcripts: DataFrame | None = None,
    check_audio: bool = False,
):
    """Attach the suite's row-local checks to a streaming DataFrame.

    Each micro-batch runs the SAME fused conditional-aggregation pass as the
    batch engine (one scan of the batch) and appends per-bucket verdict rows
    (+ batch_id) to ``out_path``. Returns the StreamingQuery. Cumulative
    verdicts = groupBy(constraint).sum over the sink — exactly the
    checkpoint-table merge semantics.

    ``check_audio=True`` (r4) additionally runs the full audio/transcript
    invariant pass (audio.audio_invariants — real PCM decode + SNR,
    container-sr cross-field, transcript equality against the STATIC
    ``transcripts`` dim; stream-static join semantics) per micro-batch and
    appends its per-bucket verdicts to the same sink: streaming ingest of a
    clip table gets the identical 10-constraint validation as a batch run,
    and cumulative verdicts still merge by groupBy(constraint).sum because
    micro-batches partition the rows."""
    if check_audio and transcripts is None:
        # silently skipping the requested audio pass would report clean
        # verdicts the caller never computed (ADVICE r4)
        raise ValueError("check_audio=True requires a transcripts DataFrame")
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
        if check_audio and transcripts is not None:
            from engine import audio as audio_mod

            inv = audio_mod.audio_invariants(batch_df, transcripts)
            flags = [
                ("pcm_ok", "pcm_snr_invariant"),
                ("transcript_ok", "transcript_equality"),
                ("meta_sr_ok", "container_sr_consistency"),
            ]
            au_wide = inv.groupBy("bucket_id").agg(
                F.count(F.lit(1)).cast("long").alias("rows_scanned"),
                *[
                    F.sum(F.when(~F.col(flag), 1).otherwise(0))
                    .cast("long")
                    .alias(f"__a__{i}")
                    for i, (flag, _) in enumerate(flags)
                ],
            )
            au_structs = [
                F.struct(
                    F.lit(name).alias("constraint"),
                    F.col(f"__a__{i}").alias("violation_count"),
                )
                for i, (_, name) in enumerate(flags)
            ]
            au_long = au_wide.select(
                F.lit(batch_id).alias("batch_id"),
                F.col("bucket_id").alias(checks_mod.BUCKET),
                "rows_scanned",
                F.explode(F.array(*au_structs)).alias("v"),
            ).select("batch_id", checks_mod.BUCKET, "v.constraint",
                     "v.violation_count", "rows_scanned")
            long = long.unionByName(au_long)
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


def stateful_ewma_stream(
    stream_df: DataFrame,
    value_col: str,
    order_col: str,
    series_col: str,
    alpha: float = 0.1,
):
    """Custom stateful streaming operator: per-series EWMA forecast +
    residual with state CARRIED ACROSS micro-batches via
    ``applyInPandasWithState`` — the true-streaming analog of the reference's
    carried-state-across-batches semantics (infinite_dataset.py:70-76) and of
    the batch ``scoring.ewma_residual``.

    State per series is two scalars (the adjust=True recursion
    ``num_t = (1-a) num_{t-1} + x_t``, ``den_t = (1-a) den_{t-1} + 1``;
    forecast_t = num_{t-1}/den_{t-1}), so state size is O(n_series) — bounded
    at any stream length. The in-batch scan is VECTORIZED via the recursion's
    closed form (no per-row Python): num_t = r^t num_0 + r^t Σ x_j r^{-j},
    evaluated in overflow-safe chunks (r^{-j} grows as e^{j|ln r|}).
    Rows inside a batch are processed in ``order_col`` order; batches must
    arrive in order per series (true for replayed/landing files;
    out-of-order streams need watermarked reordering upstream). 0 < alpha < 1.
    """
    import numpy as np
    import pandas as pd

    r = 1.0 - alpha
    # keep r^{-chunk} below e^300 (double max ~e^709, with headroom)
    chunk = max(1, min(4096, int(300.0 / max(-np.log(r), 1e-12))))

    def scan(x: np.ndarray, num: float, den: float):
        """Forecasts (state BEFORE each x) + final (num, den), vectorized."""
        fc = np.empty(len(x))
        for i in range(0, len(x), chunk):
            c = x[i : i + chunk]
            m = len(c)
            p = r ** np.arange(1, m + 1)             # r^t, t = 1..m
            rinv_j = r ** -np.arange(1, m + 1)       # r^{-j}, j = 1..m
            num_t = p * (num + np.cumsum(c * rinv_j))
            den_t = p * den + (1.0 - p) / alpha
            prev_num = np.concatenate(([num], num_t[:-1]))
            prev_den = np.concatenate(([den], den_t[:-1]))
            fc[i : i + m] = np.where(prev_den > 0, prev_num / np.where(prev_den > 0, prev_den, 1.0), np.nan)
            num, den = float(num_t[-1]), float(den_t[-1])
        return fc, num, den

    out_schema = (
        f"{series_col} string, {order_col} long, {value_col} double, "
        "ewma double, residual double"
    )
    state_schema = "num double, den double"

    def update(key, pdfs, state):
        num, den = state.get if state.exists else (0.0, 0.0)
        # a LARGE group arrives as multiple pdf chunks whose row ranges can
        # interleave arbitrarily — sorting each chunk alone would scramble the
        # recursion order (caught by the 50%-skew parity test). Concatenate
        # the batch's group rows, then ONE global sort. Memory is bounded by
        # the per-micro-batch group size, not the stream length — for a group
        # too big for that, shrink the micro-batch (maxFilesPerTrigger /
        # maxOffsetsPerTrigger), which is the knob this operator documents.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(order_col)
            x = pdf[value_col].to_numpy(dtype=np.float64)
            fc, num, den = scan(x, num, den)
            yield pd.DataFrame(
                {
                    series_col: pdf[series_col].to_numpy(),
                    order_col: pdf[order_col].to_numpy(),
                    value_col: x,
                    "ewma": fc,
                    "residual": x - fc,
                }
            )
        state.update((num, den))

    return stream_df.groupBy(series_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
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
