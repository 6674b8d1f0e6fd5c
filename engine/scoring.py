"""Reference anomaly-scoring math, Spark-first.

Re-expresses the reference pipeline's scoring semantics (SURVEY.md §2.4):

  W1  sliding-window framing       models/utils.py:79-114  -> F.lag/F.lead over Window
  W2  rolling reconstruction error anomaly_detection.py:326-343 -> rolling stats + residual
  A5  quantile threshold           anomaly_detection.py:373 -> percentile / t-digest
  P5  threshold verdicts           anomaly_detection.py:462-465 -> filter + interval check

Rolling z-score and quantile thresholds are pure built-in window/agg functions
(JVM-side, whole-stage codegen). EWMA is inherently recursive, so it runs as a
grouped Arrow UDF (``applyInPandas``) — one pandas ``ewm`` call per series
partition, zero per-row Python. Threshold fitting follows the reference's
invariant (§3.1a): fit on the baseline/train slice ONLY, apply to the rest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ts_to_supervised(
    df: DataFrame,
    value_col: str,
    order_col: str,
    series_col: str | None = None,
    n_in: int = 3,
    n_out: int = 1,
    drop_incomplete: bool = True,
) -> DataFrame:
    """Sliding-window framing (reference ``ts_to_supervised``,
    models/utils.py:79-114): adds lag columns ``y(t-i)`` and lead columns
    ``y(t+i)``; drops window-edge rows like the reference's ``dropna``
    (utils.py:112-113)."""
    w = Window.orderBy(order_col)
    if series_col:
        w = Window.partitionBy(series_col).orderBy(order_col)
    out = df
    for i in range(n_in, 0, -1):
        out = out.withColumn(f"y(t-{i})", F.lag(value_col, i).over(w))
    out = out.withColumn("y(t)", F.col(value_col))
    for i in range(1, n_out):
        out = out.withColumn(f"y(t+{i})", F.lead(value_col, i).over(w))
    if drop_incomplete:
        out = out.na.drop(subset=[f"y(t-{n_in})"] + ([f"y(t+{n_out-1})"] if n_out > 1 else []))
    return out


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    series_col: str | None = None,
    window: int = 20,
    min_periods: int = 5,
) -> DataFrame:
    """Rolling z-score over the trailing ``window`` rows (excluding current):
    z = (x - mean) / stddev. The rolling generalization of the reference's
    residual-vs-train-stats scoring (anomaly_detection.py:326-379). Pure
    built-in window functions — no shuffle beyond the partitionBy."""
    w = (
        (Window.partitionBy(series_col) if series_col else Window.partitionBy())
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    cnt = F.count(value_col).over(w)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return (
        df.withColumn("roll_mean", mean)
        .withColumn("roll_std", std)
        .withColumn("roll_n", cnt)
        .withColumn(
            "zscore",
            F.when(
                (cnt >= min_periods) & (std > 1e-12),
                (F.col(value_col) - mean) / std,
            ),
        )
    )


def ewma_residual(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    series_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """EWMA forecast + residual per series (the reference's
    carried-state-across-batches semantics, infinite_dataset.py:70-76, as a
    per-partition sequential scan). Recursive → grouped Arrow UDF; pandas
    ``ewm(alpha, adjust=True)`` per group, vectorized C inside the batch.

    residual_t = x_t - EWMA(x_{..t-1});  first point has no forecast (null).

    Scale note: parallelism = n_series, and one giant series = one straggler
    task; the per-task memory bound is the largest single series. For
    pathological series (or true streams), the chunk-and-carry-state variant
    is ``engine/streaming.py:stateful_ewma_stream`` — same recursion as two
    carried scalars per series, O(chunk) memory, vectorized closed form.

    Crossover guidance: prefer THIS operator while max-series rows fit one
    executor's task memory and n_series >= cluster cores (e.g. <= ~10M rows
    per series at default executor sizing); switch to the chunked stateful
    variant when one series dominates (>= ~1/cores of all rows — it would
    serialize the stage) or any single series risks task OOM. Both produce
    bit-compatible results — parity is pytest-pinned on a 50%-skewed fixture
    (tests/test_streaming.py::test_stateful_ewma_skewed_series_parity).

    r7 execution shape: ONE mapInPandas per shuffle partition over
    repartition(series) + sortWithinPartitions(series, order), with pandas'
    grouped-ewm Cython kernel doing every series of the partition in one
    call — bit-identical to the old per-group applyInPandas (same kernel
    per group, pytest-pinned) but without the per-group Arrow batch +
    Python call overhead, which dominated at many-small-series shape
    (measured 6.5x on 15k series x 67 rows). Per-task memory is the
    PARTITION (pd.concat of its Arrow chunks), not the largest series —
    size shuffle partitions accordingly at scale.
    """
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + ", ewma double, residual double"

    def per_partition(chunks):
        pdfs = list(chunks)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0].reset_index(drop=True)
        # rows arrive grouped by series and sorted by order_cols (shuffle +
        # in-partition sort below); dropna=False keeps a null series key a
        # group, matching Spark groupBy semantics
        g = pdf.groupby(series_col, sort=False, dropna=False)[value_col]
        ew = g.ewm(alpha=alpha, adjust=True).mean()
        ew = ew.groupby(level=0, dropna=False).shift(1)
        ew = ew.reset_index(level=0, drop=True).sort_index()
        pdf["ewma"] = ew.to_numpy()
        pdf["residual"] = pdf[value_col] - pdf["ewma"]
        yield pdf

    return (
        df.repartition(series_col)
        .sortWithinPartitions(series_col, *order_cols)
        .mapInPandas(per_partition, schema=schema)
    )


def fit_quantile_threshold(
    train: DataFrame, score_col: str, q: float = 0.99, method: str = "exact"
) -> float:
    """Threshold = q-quantile of baseline scores (reference:
    ``np.quantile(scores, .99)``, anomaly_detection.py:373).

    ``method="exact"``: F.percentile — buffers every group value in executor
    memory, fine at test scale, fatal at 10^12 rows. ``method="tdigest"``:
    one mergeable-sketch pass (engine/sketch.py), bounded memory at any scale;
    rank error ~ 4q(1-q)/compression (pytest-pinned in test_sketch_drift)."""
    if method == "tdigest":
        from engine.sketch import build_digest

        return build_digest(train, score_col, compression=200).quantile(q)
    return train.agg(F.percentile(score_col, F.lit(q)).alias("t")).collect()[0]["t"]


def anomaly_verdict(
    scored: DataFrame,
    score_col: str,
    threshold: float,
    key_cols: list[str],
) -> DataFrame:
    """Violation rows: scores >= threshold (reference
    anomaly_detection.py:462-463 — count + exact positions)."""
    return scored.filter(F.col(score_col) >= F.lit(threshold)).select(
        *key_cols, F.col(score_col).alias("score")
    )


def interval_validation(
    verdicts: DataFrame,
    idx_col: str,
    series_col: str,
    labels: DataFrame,
) -> DataFrame:
    """Check flagged indices against labeled anomaly intervals (reference
    anomaly_detection.py:463-465; labels from filename metadata
    models/utils.py:34-39). ``labels``: (series_col, anom_start, anom_stop).
    Returns per-series precision/recall-style counts via one broadcast join."""
    j = verdicts.join(F.broadcast(labels), series_col, "left")
    return (
        j.groupBy(series_col, "anom_start", "anom_stop")
        .agg(
            F.count(F.lit(1)).alias("flagged"),
            F.sum(
                F.when(
                    F.col(idx_col).between(F.col("anom_start"), F.col("anom_stop")), 1
                ).otherwise(0)
            ).alias("flagged_in_interval"),
        )
        .withColumn("all_in_interval", F.col("flagged") == F.col("flagged_in_interval"))
    )


def kde_log_density(
    df: DataFrame,
    value_col: str,
    fit_points,
    fit_weights=None,
    bandwidth: float = 0.1,
) -> DataFrame:
    """Gaussian-KDE log-density scoring (reference F11:
    ``KernelDensity(bandwidth=.1).fit(losses).score_samples``,
    anomaly_detection.py:371-374,460) as a vectorized pandas UDF.

    The fit set stays tiny (a baseline sample or — the scale path — t-digest
    centroids with their weights, so the "fit" is derived from a sketch of
    10^12 rows); scoring is distributed, one Arrow batch at a time:
    log p(x) = logsumexp_i [ log w_i - (x-p_i)^2 / (2h^2) ] - log(sum w) - log(h*sqrt(2pi)).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    pts = np.asarray(fit_points, dtype=np.float64)
    w = (
        np.asarray(fit_weights, dtype=np.float64)
        if fit_weights is not None
        else np.ones_like(pts)
    )
    logw = np.log(w)
    log_norm = np.log(w.sum()) + np.log(bandwidth * np.sqrt(2 * np.pi))
    h2 = 2.0 * bandwidth * bandwidth

    @F.pandas_udf("double")
    def score(s: pd.Series) -> pd.Series:
        x = s.to_numpy(dtype=np.float64)
        # (n, m) exponent matrix; m = len(pts) is sketch-sized (hundreds)
        e = logw[None, :] - (x[:, None] - pts[None, :]) ** 2 / h2
        mx = e.max(axis=1)
        out = mx + np.log(np.exp(e - mx[:, None]).sum(axis=1)) - log_norm
        return pd.Series(out)

    return df.withColumn("kde_log_density", score(F.col(value_col)))


def kde_fit_from_digest(digest) -> tuple[list, list]:
    """Fit inputs for kde_log_density from a t-digest: centroid means as the
    points, centroid weights as the mixture weights."""
    digest.compress()
    return list(digest.means), list(digest.weights)


def grid_evaluate(
    df: DataFrame,
    value_col: str,
    order_col: str,
    series_col: str,
    configs: list[dict],
) -> DataFrame:
    """Parallel hyperparameter-grid evaluation (reference X1/X2: nested
    joblib.Parallel over configs x datasets x repeats, rnn_old.py:256-288) —
    here one Spark job: every (series, config) cell is evaluated inside a
    grouped Arrow UDF, tasks fan out over series partitions exactly like the
    reference's fork-join fan-out over CPUs.

    Each config: {"window": int, "threshold": float}. Returns per
    (series, config): flagged count, max |z|, rows evaluated."""
    import pandas as pd

    cfg = [(i, int(c["window"]), float(c["threshold"])) for i, c in enumerate(configs)]

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        v = pdf[value_col]
        rows = []
        for cid, win, thr in cfg:
            m = v.rolling(win, min_periods=5).mean().shift(1)
            s = v.rolling(win, min_periods=5).std().shift(1)
            z = (v - m) / s
            zabs = z.abs()
            rows.append(
                (
                    pdf[series_col].iloc[0], cid, win, thr,
                    int((zabs > thr).sum()),
                    float(zabs.max()) if zabs.notna().any() else float("nan"),
                    int(z.notna().sum()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[series_col, "config_id", "window", "threshold",
                     "flagged", "max_abs_z", "evaluated"],
        )

    schema = (
        f"{series_col} string, config_id int, window int, threshold double, "
        "flagged long, max_abs_z double, evaluated long"
    )
    return df.groupBy(series_col).applyInPandas(per_series, schema=schema)
