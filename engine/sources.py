"""Sources (SURVEY.md §2.1): the reference's scans re-expressed as Spark reads.

S1  delimited-text series scan     models/utils.py:47-48
S2  CSV scan with header           models/utils.py:117-120
S4  directory listing as source    models/utils.py:25-31
S5  filename-encoded metadata      models/utils.py:34-39 (hexagon labels)
S6  sine bank generator            models/utils.py:64-76
S7  noisy 2-harmonic sine          models/utils.py:123-138
S8  linear ramp w/ hourly stamps   models/utils.py:141-155

All generators are expression-only (spark.range + F.sin/F.rand(seed)) —
distributed, deterministic, no driver materialization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_line_series(spark: SparkSession, path: str) -> DataFrame:
    """S1: one float per line -> (idx, value) with an explicit order column —
    row order is time order in the reference; Spark needs it materialized."""
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("__file_order"),
        F.col("value").cast("double").alias("value"),
    )
    # monotonically_increasing_id is ordered within/across file splits of a
    # single text file read; re-rank to a dense idx
    from pyspark.sql import Window

    return raw.select(
        (F.row_number().over(Window.orderBy("__file_order")) - 1).alias("idx"), "value"
    )


def read_csv_series(spark: SparkSession, path: str, value_col: str) -> DataFrame:
    """S2: CSV with header -> (idx, value)."""
    from pyspark.sql import Window

    df = spark.read.csv(path, header=True, inferSchema=True)
    return df.select(
        (F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1).alias("idx"),
        F.col(value_col).cast("double").alias("value"),
    )


def filename_metadata(df: DataFrame, pattern: str, fields: list[str]) -> DataFrame:
    """S4/S5: attach filename-encoded metadata (the hexagon dataset encodes
    ``(split, anomaly_start, anomaly_stop)`` in ``_``-separated fields,
    models/utils.py:34-39). ``pattern`` is a regex with one group per field."""
    fn = F.input_file_name()
    out = df
    for i, name in enumerate(fields, start=1):
        out = out.withColumn(name, F.regexp_extract(fn, pattern, i))
    return out


def sine_bank(spark: SparkSession, n_series: int, length: int, period: float) -> DataFrame:
    """S6: N phase-shifted sine series (gen_sine_wave, models/utils.py:64-76):
    value = sin((x + shift_s) / T)."""
    return (
        spark.range(0, n_series * length, 1)
        .select(
            (F.col("id") / length).cast("long").alias("series_id"),
            (F.col("id") % length).alias("idx"),
        )
        .withColumn(
            "value",
            F.sin((F.col("idx") - F.col("series_id") * F.lit(float(period) / n_series))
                  / F.lit(float(period))),
        )
    )


def noisy_two_harmonic(
    spark: SparkSession, n: int, freq: float = 0.7, noise: float = 0.05, seed: int = 42
) -> DataFrame:
    """S7: sin(2πft) + 0.3 sin(4πft) + U(-noise, noise) (models/utils.py:123-138)."""
    t = F.col("id") / 50.0
    return spark.range(0, n).select(
        F.col("id").alias("idx"),
        (
            F.sin(2 * math.pi * freq * t)
            + 0.3 * F.sin(4 * math.pi * freq * t)
            + (F.rand(seed) * 2 - 1) * noise
        ).alias("value"),
    )


def linear_ramp_hourly(
    spark: SparkSession, n: int, start: str = "2020-01-01 00:00:00"
) -> DataFrame:
    """S8: y = 3x + 1 with an hourly timestamp index (models/utils.py:141-155)."""
    return spark.range(0, n).select(
        F.col("id").alias("idx"),
        (F.to_timestamp(F.lit(start)) + F.make_interval(hours=F.col("id"))).alias("ts"),
        (3 * F.col("id") + 1).cast("double").alias("value"),
    )
