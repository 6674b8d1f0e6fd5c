"""Distribution-drift checks against a baseline snapshot.

Mechanizes the reference's train-fitted threshold state
(``anomaly_detection.py:453-456``: fit on train only, apply to test — §3.1
invariant a): ``fit_baseline`` sketches the *clean/baseline* table once
(numeric t-digests + categorical counts) into a snapshot that persists as a
parquet/Iceberg table; ``drift_check`` sketches the current table once and
compares — KS statistic and PSI for numeric columns, categorical PSI for
domains. Two scans total (one per table), each column-pruned, sketches merged
per partition. No raw data crosses the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.sketch import TDigest, build_digests, categorical_psi, ks_statistic, psi

SNAPSHOT_SCHEMA = (
    "snapshot_id string, column_name string, kind string, tdigest binary, "
    "categories array<string>, category_counts array<long>, n_rows long"
)


@dataclass
class Baseline:
    snapshot_id: str
    digests: dict[str, TDigest]
    cat_counts: dict[str, dict[str, int]]
    n_rows: int

    def to_rows(self) -> list[dict]:
        rows = []
        for c, d in self.digests.items():
            rows.append(
                dict(snapshot_id=self.snapshot_id, column_name=c, kind="numeric",
                     tdigest=d.to_bytes(), categories=None, category_counts=None,
                     n_rows=self.n_rows)
            )
        for c, counts in self.cat_counts.items():
            ks = sorted(counts)
            rows.append(
                dict(snapshot_id=self.snapshot_id, column_name=c, kind="categorical",
                     tdigest=None, categories=ks,
                     category_counts=[counts[k] for k in ks], n_rows=self.n_rows)
            )
        return rows


def _cat_counts(df: DataFrame, columns: list[str]) -> dict[str, dict[str, int]]:
    """All categorical counts in ONE scan: explode (col, value) pairs, one
    groupBy. Domains are low-cardinality by definition — result is tiny."""
    if not columns:
        return {}
    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("c"), F.col(c).cast("string").alias("v"))
                for c in columns
            ])
        ).alias("p")
    ).select("p.c", "p.v")
    rows = pairs.groupBy("c", "v").count().collect()
    out: dict[str, dict[str, int]] = {c: {} for c in columns}
    for r in rows:
        if r["v"] is not None:
            out[r["c"]][r["v"]] = r["count"]
    return out


def fit_baseline(
    df: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str] | None = None,
    snapshot_id: str = "baseline_v1",
    compression: int = 200,
) -> Baseline:
    digests = build_digests(df, numeric_cols, compression) if numeric_cols else {}
    cats = _cat_counts(df, categorical_cols or [])
    n = df.count()
    return Baseline(snapshot_id, digests, cats, n)


def save_baseline(spark: SparkSession, b: Baseline, path: str) -> None:
    spark.createDataFrame(pd.DataFrame(b.to_rows()), schema=SNAPSHOT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(path)


def load_baseline(spark: SparkSession, path: str, snapshot_id: str | None = None) -> Baseline:
    df = spark.read.parquet(path)
    if snapshot_id:
        df = df.filter(F.col("snapshot_id") == snapshot_id)
    rows = df.collect()
    digests, cats, sid, n = {}, {}, "baseline_v1", 0
    for r in rows:
        sid, n = r["snapshot_id"], r["n_rows"]
        if r["kind"] == "numeric":
            digests[r["column_name"]] = TDigest.from_bytes(bytes(r["tdigest"]))
        else:
            cats[r["column_name"]] = dict(zip(r["categories"], r["category_counts"]))
    return Baseline(sid, digests, cats, n)


def drift_check(
    current: DataFrame,
    baseline: Baseline,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.1,
    compression: int = 200,
) -> pd.DataFrame:
    """Returns one row per (column, metric): value + pass/fail. Current-table
    sketches are built in one scan over the pruned columns."""
    num_cols = list(baseline.digests)
    cat_cols = list(baseline.cat_counts)
    cur_digests = build_digests(current, num_cols, compression) if num_cols else {}
    cur_cats = _cat_counts(current, cat_cols)

    rows = []
    for c in num_cols:
        k = ks_statistic(baseline.digests[c], cur_digests[c])
        p = psi(baseline.digests[c], cur_digests[c])
        rows.append(dict(column_name=c, metric="ks", value=k, passed=k <= ks_threshold))
        rows.append(dict(column_name=c, metric="psi", value=p, passed=p <= psi_threshold))
    for c in cat_cols:
        p = categorical_psi(baseline.cat_counts[c], cur_cats.get(c, {}))
        rows.append(dict(column_name=c, metric="psi_categorical", value=p,
                         passed=p <= psi_threshold))
    return pd.DataFrame(rows)
