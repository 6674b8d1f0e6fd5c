"""Streaming front-end: micro-batch validation produces the same cumulative
verdicts as the batch engine on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import checks, streaming, synth
from engine.suite import audio_clip_suite

N = 2000


@pytest.mark.slow
def test_stream_validate_matches_batch(spark, tmp_path):
    clips = synth.gen_clips(spark, N, partitions=4).cache()
    clips.count()
    src_dir = str(tmp_path / "landing")
    # write in two chunks to get multiple micro-batches
    a, b = clips.randomSplit([0.5, 0.5], seed=1)
    a.write.mode("overwrite").parquet(src_dir)

    suite = audio_clip_suite()
    # row-local subset only (streaming front-end scope)
    stream = (
        spark.readStream.schema(clips.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src_dir)
    )
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    q = streaming.stream_validate(stream, suite, ["clip_id"], out, ckpt, n_buckets=8)
    q.processAllAvailable()
    b.write.mode("append").parquet(src_dir)
    q.processAllAvailable()
    q.stop()

    got = {
        r["constraint"]: (r["violation_count"], r["rows_scanned"])
        for r in streaming.cumulative_verdicts(spark, out).collect()
    }

    from engine.suite import ConstraintSuite

    rl_suite = ConstraintSuite(list(suite.row_local()))
    batch = checks.run_suite(clips, rl_suite, ["clip_id"], refs={}, n_buckets=8,
                             stat_columns=[])
    # compare only row-local constraints (Unique/RI need refs / global state)
    row_local_names = {c.name for c in suite.row_local()}
    exp = {
        r["constraint"]: (r["violation_count"], r["rows_scanned"])
        for r in batch.verdicts.collect()
        if r["constraint"] in row_local_names
    }
    assert got == exp


def test_windowed_drift_schema(spark):
    # static-frame check of the streaming aggregation expression shape
    df = spark.createDataFrame(
        [("2024-01-01 00:01:00", 1.0), ("2024-01-01 00:02:00", 3.0)],
        "ts string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    agg = (
        df.groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean"),
             F.min("value").alias("min"), F.max("value").alias("max"))
    ).collect()
    assert agg[0]["n"] == 2 and agg[0]["mean"] == 2.0
