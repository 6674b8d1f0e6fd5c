"""SparkSession factory tuned for the validation engine.

Local-mode settings mirror what a 1000-executor deployment would set per
executor: AQE on (runtime partition coalescing + skew-join splitting), Arrow
enabled for the pandas-UDF invariant path, shuffle partitions sized to cores
(overridden to ~2-3x total cores on a real cluster), UTC session timezone so
results compare bit-for-bit against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tsad-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); defaults to the
    ``SPARK_GRAFT_CPUS`` env var, falling back to ``local[*]``. On a real
    cluster this function is a no-op passthrough to the cluster-provided
    session (``spark-submit`` sets master).
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (int(cores) if cores else os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches: rows carry ~30KB binary payloads; 10k-row
        # batches (300MB+ pandas frames per worker) thrash memory — 2048 keeps
        # the Python workers streaming (measured 4.5x faster on the audio
        # pass). Parameterized (r7) so deployments with more RAM per worker
        # can trade batch amortization against transient pool size.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("TSAD_ARROW_BATCH", "2048"),
        )
        .config("spark.driver.memory", os.environ.get("TSAD_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fat-binary scan sizing (r5 spill probe): the vectorized parquet
        # reader buffers columnarReaderBatchSize ROWS per task — at the
        # default 4096 that is ~90 MB per task for ~22 KB audio payload rows,
        # and 32 concurrent scan tasks OOM any executor heap under ~12 GB
        # BEFORE any operator runs. 1024 caps per-task scan buffers at
        # ~22 MB (negligible for narrow tables, which batch by row count
        # anyway) so heap sizing is governed by the ENGINE's state, not the
        # reader. This is the knob a 100 TB deployment must ship with.
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
