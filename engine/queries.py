"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL.

Each entry maps one operator family from SURVEY.md §2 (or a training-data
pipeline op) onto the driver's TPC-H-ish testdata. Cross-engine float
determinism rules used throughout:

  * sums/averages go through DECIMAL(38,n) partial sums (exact, order-free),
    then a double cast — bit-identical in Spark and DuckDB;
  * outputs that involve engine-internal float algorithms (stddev over a
    window, interpolated quantiles) are rounded explicitly IN BOTH dialects;
  * every computed column is aliased identically on both sides;
  * ties are always broken by a key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine import ann, dedup, scoring, text
from engine.suite import ConstraintSuite, Domain, NotNull, Range, RefIntegrity, Unique
from engine import checks

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a small scan across the cluster before expression-heavy
    per-row work (guide §2.4/§6): a single-row-group parquet file scans as
    ONE task no matter how small maxPartitionBytes is, so every md5/HOF
    stage above it runs on one core of N. A round-robin repartition of the
    raw rows (a few MB here) buys full parallelism for the compute stage.
    Scale-adaptive: derived from defaultParallelism vs the scan's real split
    count — a no-op on inputs that already carry enough splits, so at
    production scale (thousands of files) no extra exchange appears."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register(name: str, sql: str | None = None):
    def deco(fn):
        Q[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# flagship: the validation suite itself, oracle-checked constraint by constraint
# ---------------------------------------------------------------------------

def lineitem_suite() -> ConstraintSuite:
    s = ConstraintSuite()
    s.add(NotNull("l_orderkey_not_null", column="l_orderkey"))
    s.add(Range("l_quantity_range", column="l_quantity", lo=1, hi=50))
    s.add(Domain("l_returnflag_domain", column="l_returnflag", allowed=("A", "N", "R")))
    s.add(Unique("lineitem_pk_unique", columns=("l_orderkey", "l_linenumber")))
    s.add(
        RefIntegrity(
            "l_partkey_ref_part", columns=("l_partkey",), ref_name="part",
            ref_columns=("p_partkey",),
        )
    )
    return s


@register(
    "suite_verdicts_lineitem",
    """
    WITH rows_tot AS (SELECT count(*) AS n FROM lineitem)
    SELECT c.constraint_name, c.violation_count,
           (SELECT n FROM rows_tot) AS rows_scanned,
           c.violation_count = 0 AS passed
    FROM (
      SELECT 'l_orderkey_not_null' AS constraint_name,
             (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS violation_count
      UNION ALL
      SELECT 'l_quantity_range',
             (SELECT count(*) FROM lineitem
              WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50))
      UNION ALL
      SELECT 'l_returnflag_domain',
             (SELECT count(*) FROM lineitem
              WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R'))
      UNION ALL
      SELECT 'lineitem_pk_unique',
             -- CAST: DuckDB sums to HUGEINT; the driver's value hash is
             -- type-sensitive, Spark returns BIGINT
             (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
                SELECT count(*) AS c FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
      UNION ALL
      SELECT 'l_partkey_ref_part',
             (SELECT count(*) FROM lineitem
              WHERE l_partkey IS NOT NULL
                AND l_partkey NOT IN (SELECT p_partkey FROM part))
    ) c
    """,
)
def suite_verdicts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    res = checks.run_suite(
        li, lineitem_suite(), key_cols=["l_orderkey", "l_linenumber"],
        refs={"part": part}, n_buckets=32, stat_columns=[],
    )
    return res.verdicts.select(
        F.col("constraint").alias("constraint_name"),
        "violation_count", "rows_scanned", "passed",
    )


# ---------------------------------------------------------------------------
# aggregation / TPC-H Q1 flagship analytics (A1-A8, decimal-exact)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec4 = lambda c: F.col(c).cast("decimal(38,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec4("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec4("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("sum_disc_price"),
            (F.sum(dec4("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "stats_lineitem",
    """
    WITH base AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE l_quantity IS NULL) AS q_nulls,
             min(l_quantity) AS q_min, max(l_quantity) AS q_max,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS q_sum,
             count(*) FILTER (WHERE l_extendedprice IS NULL) AS p_nulls,
             min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS p_sum,
             count(*) FILTER (WHERE l_discount IS NULL) AS d_nulls,
             min(l_discount) AS d_min, max(l_discount) AS d_max,
             CAST(sum(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) AS d_sum
      FROM lineitem)
    SELECT u.column_name, u.metric, u.value FROM base, LATERAL (VALUES
      ('l_quantity','count', CAST(n AS DOUBLE)),
      ('l_quantity','null_count', CAST(q_nulls AS DOUBLE)),
      ('l_quantity','min', q_min), ('l_quantity','max', q_max),
      ('l_quantity','sum', q_sum),
      ('l_extendedprice','count', CAST(n AS DOUBLE)),
      ('l_extendedprice','null_count', CAST(p_nulls AS DOUBLE)),
      ('l_extendedprice','min', p_min), ('l_extendedprice','max', p_max),
      ('l_extendedprice','sum', p_sum),
      ('l_discount','count', CAST(n AS DOUBLE)),
      ('l_discount','null_count', CAST(d_nulls AS DOUBLE)),
      ('l_discount','min', d_min), ('l_discount','max', d_max),
      ('l_discount','sum', d_sum)
    ) AS u(column_name, metric, value)
    """,
)
def stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).cast("decimal(38,4)")).cast("double").alias(f"{c}__sum"),
        ]
    one = li.agg(*aggs)
    structs = []
    for c in cols:
        for m, v in [
            ("count", F.col("n").cast("double")),
            ("null_count", F.col(f"{c}__nulls").cast("double")),
            ("min", F.col(f"{c}__min").cast("double")),
            ("max", F.col(f"{c}__max").cast("double")),
            ("sum", F.col(f"{c}__sum")),
        ]:
            structs.append(
                F.struct(F.lit(c).alias("column_name"), F.lit(m).alias("metric"),
                         v.alias("value"))
            )
    return one.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.column_name", "s.metric", "s.value"
    )


# ---------------------------------------------------------------------------
# dedup / RI / domain / range operators (§2.2-2.3 + north_star checks)
# ---------------------------------------------------------------------------

@register(
    "dup_keys_lineitem",
    """
    SELECT l_orderkey AS key, count(*) AS key_count
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
)
def dup_keys_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("key_count"))
        .filter(F.col("key_count") > 1)
    )


@register(
    "ri_orders_customer",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
    """,
)
def ri_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(c.select(F.col("c_custkey").alias("o_custkey")).dropna()),
              "o_custkey", "left_anti")
        .select("o_orderkey", "o_custkey")
    )


# NOT @register-ed since r4: near-duplicate driver evidence of
# ri_orders_customer (same anti-join code path, also 0 rows at sf0.01);
# retired to hold the registry at the driver's 50-slot CORRECTNESS window
# while the r4 queries (skew, two-phase CC) stay driver-visible.
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")).dropna(),
        "c_custkey", "left_anti",
    ).select("c_custkey", "c_mktsegment")


@register(
    "domain_violations_events",
    """
    SELECT event_id, event_type FROM events
    WHERE event_type IS NOT NULL
      AND event_type NOT IN ('click','view','purchase','signup')
    """,
)
def domain_violations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = Domain("t", column="event_type", allowed=("click", "view", "purchase", "signup"))
    return ev.filter(d.violation_expr()).select("event_id", "event_type")


@register(
    "range_violations_events",
    """
    SELECT event_id, value FROM events
    WHERE value IS NOT NULL AND (value < 1.0 OR value > 450.0)
    """,
)
def range_violations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    r = Range("r", column="value", lo=1.0, hi=450.0)
    return ev.filter(r.violation_expr()).select("event_id", "value")


# ---------------------------------------------------------------------------
# threshold / quantile / histogram (A5-A7, P5)
# ---------------------------------------------------------------------------

@register(
    "row_invariant_purchase_value",
    """
    WITH rows_tot AS (SELECT count(*) AS n FROM events)
    SELECT 'purchase_value_positive' AS constraint_name,
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE event_type = 'purchase' AND value < 1.0) AS violation_count,
           (SELECT n FROM rows_tot) AS rows_scanned,
           (SELECT count(*) FROM events
            WHERE event_type = 'purchase' AND value < 1.0) = 0 AS passed
    """,
)
def row_invariant_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RowInvariant (U-row custom predicate) through the same fused-scan
    compiler as the built-in constraints: an arbitrary cross-column business
    rule ('purchase events carry a positive value') fuses into the one-scan
    conditional aggregation like NotNull/Range/Domain do."""
    from engine.suite import RowInvariant

    ev = _t(spark, sf_dir, "events")
    inv = RowInvariant(
        "purchase_value_positive",
        make_violation=lambda df: (F.col("event_type") == "purchase")
        & F.col("value").isNotNull() & (F.col("value") < 1.0),
    )
    s = ConstraintSuite().add(inv)
    res = checks.run_suite(ev, s, key_cols=["event_id"], n_buckets=16, stat_columns=[])
    return res.verdicts.select(
        F.col("constraint").alias("constraint_name"),
        "violation_count", "rows_scanned", "passed",
    )


@register(
    "quantile_threshold_events",
    """
    WITH t AS (SELECT quantile_cont(value, 0.99) AS thr FROM events)
    SELECT round(thr, 6) AS threshold,
           (SELECT count(*) FROM events WHERE value >= (SELECT thr FROM t)) AS n_above
    FROM t
    """,
)
def quantile_threshold_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    thr = ev.agg(F.percentile("value", F.lit(0.99)).alias("thr"))
    # explicit broadcast of the 1-row aggregate: Catalyst would usually pick
    # BroadcastNestedLoopJoin on its own, but the hint pins the plan (no
    # cartesian fallback if stats estimation ever changes)
    return (
        ev.crossJoin(F.broadcast(thr))
        .agg(
            F.round(F.first("thr"), 6).alias("threshold"),
            F.sum(F.when(F.col("value") >= F.col("thr"), 1).otherwise(0)).alias("n_above"),
        )
    )


@register(
    "tdigest_quantile_accuracy",
    """
    SELECT * FROM (VALUES (0.25, true), (0.5, true), (0.75, true), (0.99, true))
    t(q, rank_error_ok)
    """,
)
def tdigest_quantile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 at 10^12-row scale: quantiles from ONE mergeable t-digest pass
    (exact F.percentile buffers all values per group — fine at sf0.1, fatal
    at 10^12 rows). The oracle-checkable claim is the sketch's rank-error
    bound: for each q, the fraction of values <= q_sketch must be within
    0.01 of q (t-digest k1 bound is ~4q(1-q)/compression = 0.005 at the
    median for compression=200). Exact |q_sketch - q_exact| is additionally
    pytest-pinned (tests/test_sketch_drift.py)."""
    from engine.sketch import build_digest

    ev = _t(spark, sf_dir, "events")
    qs = [0.25, 0.5, 0.75, 0.99]
    digest = build_digest(ev, "value", compression=200)
    thr = {q: digest.quantile(q) for q in qs}
    agg = ev.agg(
        F.count("value").alias("n"),
        *[
            F.sum(F.when(F.col("value") <= F.lit(thr[q]), 1).otherwise(0)).alias(f"le_{i}")
            for i, q in enumerate(qs)
        ],
    )
    rows = [
        F.struct(
            F.lit(q).alias("q"),
            (F.abs(F.col(f"le_{i}") / F.col("n") - F.lit(q)) <= 0.01).alias("rank_error_ok"),
        )
        for i, q in enumerate(qs)
    ]
    return agg.select(F.explode(F.array(*rows)).alias("s")).select("s.q", "s.rank_error_ok")


@register(
    "histogram_events_value",
    """
    WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
    SELECT CAST(least(floor((value - mn) / ((mx - mn) / 50.0)), 49) AS INT) AS bucket,
           count(*) AS n
    FROM events, b GROUP BY 1
    """,
)
def histogram_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    return (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 50.0)),
                F.lit(49),
            ).cast("int").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# window / order operators (W1-W4, O1-O5)
# ---------------------------------------------------------------------------

@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_epoch FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id", "event_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_epoch"),
        )
    )


@register(
    "window_lag_delta",
    """
    SELECT event_id, value, prev_value, value - prev_value AS delta FROM (
      SELECT event_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM events) WHERE prev_value IS NOT NULL
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .filter(F.col("prev_value").isNotNull())
        .select("event_id", "value", "prev_value",
                (F.col("value") - F.col("prev_value")).alias("delta"))
    )


@register(
    "train_split_stats",
    """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (ORDER BY ts, event_id) AS rn,
             count(*) OVER () AS n
      FROM events)
    SELECT event_type, count(*) AS n_train,
           CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM ranked WHERE rn <= floor(0.75 * n) GROUP BY event_type
    """,
)
def train_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O5 ordered 75% split, 100x-scale plan (the sole registered variant
    since r3 — the driver checks 50 queries, so the single-task global-sort
    twin was retired; the oracle's row_number() IS that exact variant, so
    parity with it is still what this row proves). The global rank is
    assembled from range buckets — two passes, all parallel:

      1. bucket rows by ts range (bucket id monotone in ts, so ties never
         straddle a boundary), count rows per bucket;
      2. cumulative bucket offsets (a window over B tiny rows) are broadcast
         back; global rank = offset + per-bucket row_number — B parallel
         sorts instead of one global one."""
    ev = _t(spark, sf_dir, "events")
    B = 64
    mm = ev.agg(
        F.unix_millis(F.min("ts").cast("timestamp")).alias("mn"),
        F.unix_millis(F.max("ts").cast("timestamp")).alias("mx"),
    )
    t = F.unix_millis(F.col("ts").cast("timestamp"))
    bucket = F.least(
        F.floor((t - F.col("mn")) / ((F.col("mx") - F.col("mn") + 1) / F.lit(float(B)))),
        F.lit(B - 1),
    ).cast("int")
    bucketed = ev.crossJoin(F.broadcast(mm)).withColumn("__b", bucket).drop("mn", "mx")
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("offset"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    wl = Window.partitionBy("__b").orderBy("ts", "event_id")
    ranked = bucketed.join(F.broadcast(offsets), "__b").withColumn(
        "rn", F.col("offset") + F.row_number().over(wl)
    )
    return (
        ranked.filter(F.col("rn") <= F.floor(0.75 * F.col("n")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "topk_users_by_value",
    """
    SELECT user_id, CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total
    FROM events GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10
    """,
)
def topk_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("total"))
        .orderBy(F.desc("total"), "user_id")
        .limit(10)
    )


@register(
    "error_metrics_lag_predictor",
    """
    WITH d AS (
      SELECT value, value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS err
      FROM events),
    dd AS (SELECT value, err FROM d WHERE err IS NOT NULL),
    m AS (SELECT CAST(sum(CAST(abs(err) AS DECIMAL(38,10))) AS DOUBLE) AS sae,
                 CAST(sum(CAST(err * err AS DECIMAL(38,10))) AS DOUBLE) AS sse,
                 CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sv,
                 CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS svv,
                 count(*) AS n
          FROM dd)
    SELECT round(sae / n, 6) AS mae,
           round(sqrt(sse / n), 6) AS rmse,
           round(1 - sse / (svv - sv * sv / n), 6) AS r2
    FROM m
    """,
)
def error_metrics_lag_predictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 MAE/RMSE/R² in ONE aggregation pass, zero collects: the total sum of
    squares is sst = svv - sv²/n, so the extra sum(value²) partial replaces
    the second full scan of the round-1 version."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.withColumn("err", F.col("value") - F.lag("value").over(w))
        .filter(F.col("err").isNotNull())
        .select("value", "err")
    )
    dec10 = lambda c: c.cast("decimal(38,10)")
    m = d.agg(
        F.sum(dec10(F.abs(F.col("err")))).cast("double").alias("sae"),
        F.sum(dec10(F.col("err") * F.col("err"))).cast("double").alias("sse"),
        F.sum(dec10(F.col("value"))).cast("double").alias("sv"),
        F.sum(dec10(F.col("value") * F.col("value"))).cast("double").alias("svv"),
        F.count(F.lit(1)).alias("n"),
    )
    sst = F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")
    return m.select(
        F.round(F.col("sae") / F.col("n"), 6).alias("mae"),
        F.round(F.sqrt(F.col("sse") / F.col("n")), 6).alias("rmse"),
        F.round(F.lit(1.0) - F.col("sse") / sst, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# scaling operators (F4/F5) — two-pass stats -> broadcast scalars -> map
# ---------------------------------------------------------------------------

@register(
    "minmax_zscore_scale_events",
    """
    WITH m AS (
      SELECT min(value) AS mn, max(value) AS mx,
             CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sv,
             CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS svv,
             count(value) AS n
      FROM events),
    p AS (SELECT mn, mx, sv / n AS mean,
                 sqrt((svv - sv * sv / n) / (n - 1)) AS std FROM m)
    SELECT event_id, round((value - mn) / (mx - mn), 6) AS mm_scaled,
           round((value - mean) / std, 6) AS z
    FROM events, p
    """,
)
def minmax_zscore_scale_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + F5(std): minmax and z-score scaling share ONE stats pass (min,
    max, decimal-exact sum/sumsq partials in the same aggregation) and one
    broadcast-map pass — the production shape for fitting k scalers over a
    10^12-row table. Registered as one query since r3 (driver 50-slot
    window); each scaler stays independently value-checked via its column."""
    ev = _t(spark, sf_dir, "events")
    dec10 = lambda c: c.cast("decimal(38,10)")
    m = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.sum(dec10(F.col("value"))).cast("double").alias("sv"),
        F.sum(dec10(F.col("value") * F.col("value"))).cast("double").alias("svv"),
        F.count("value").alias("n"),
    ).select(
        "mn", "mx",
        (F.col("sv") / F.col("n")).alias("mean"),
        F.sqrt((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1)).alias("std"),
    )
    return ev.crossJoin(F.broadcast(m)).select(
        "event_id",
        F.round((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")), 6).alias("mm_scaled"),
        F.round((F.col("value") - F.col("mean")) / F.col("std"), 6).alias("z"),
    )


@register(
    "rolling_zscore_events",
    """
    WITH r AS (
      SELECT event_id, value,
             avg(value) OVER w AS m,
             stddev_samp(value) OVER w AS s,
             count(value) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_id, round((value - m) / s, 4) AS z
    FROM r WHERE c >= 5 AND s > 1e-9
    """,
)
def rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine.scoring import rolling_zscore

    ev = _t(spark, sf_dir, "events")
    r = rolling_zscore(ev, "value", ["ts", "event_id"], series_col="user_id",
                       window=20, min_periods=5)
    return r.filter((F.col("roll_n") >= 5) & (F.col("roll_std") > 1e-9)).select(
        "event_id", F.round("zscore", 4).alias("z")
    )


# ---------------------------------------------------------------------------
# training-data pipeline: dedup family (documents)
# ---------------------------------------------------------------------------

# NOT @register-ed since r4 (50-slot window, see customers_without_orders):
# 0 rows at sf0.01 made this the weakest dedup evidence; the exact-dedup op
# stays driver-verified via dedup_keep_first_documents (500 rows, same md5
# grouping) and pytest (test_exact_dedup_keeps_min_id).
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs, "text", "doc_id")


_SHINGLE_SQL = """
      SELECT doc_id, unnest(CASE WHEN len(ws) >= 3 THEN list_distinct(
               list_transform(range(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             ELSE [text] END) AS shingle
      FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
"""

@register(
    "minhash_lsh_pairs",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    mh AS (
      SELECT doc_id, b.band,
             min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS minhash
      FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
      GROUP BY doc_id, b.band),
    buckets AS (
      SELECT band, minhash FROM mh GROUP BY band, minhash
      HAVING count(*) > 1 AND count(*) <= 1000)
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
    FROM mh a JOIN buckets USING (band, minhash)
              JOIN mh c ON a.band = c.band AND a.minhash = c.minhash
                        AND a.doc_id < c.doc_id
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered with the REAL anti-blowup guard (max_bucket_size=1000, the
    standard LSH defense against hot boilerplate buckets at web scale); the
    oracle applies the same bucket-size filter."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", n_bands=8, k=3)
    return dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=1000)


@register(
    "jaccard_pairs_lsh",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    mh AS (
      SELECT doc_id, b.band,
             min(md5(CAST(b.band AS VARCHAR) || '|' || shingle)) AS minhash
      FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
      GROUP BY doc_id, b.band),
    buckets AS (
      SELECT band, minhash FROM mh GROUP BY band, minhash
      HAVING count(*) > 1 AND count(*) <= 1000),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM mh a JOIN buckets USING (band, minhash)
                JOIN mh c ON a.band = c.band AND a.minhash = c.minhash
                          AND a.doc_id < c.doc_id),
    sets AS (SELECT doc_id, list_distinct(list(shingle)) AS sh FROM sh GROUP BY doc_id)
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
    FROM pairs JOIN sets sa ON pairs.id_a = sa.doc_id
               JOIN sets sb ON pairs.id_b = sb.doc_id
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.1
    """,
)
def jaccard_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", n_bands=8, k=3)
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=1000)
    j = dedup.ngram_jaccard_pairs(docs, pairs, "text", "doc_id", k=3, threshold=0.1)
    return j.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _simhash_oracle_sql() -> str:
    bit_terms = []
    for j in range(64):
        c, s = 16 - j // 4, j % 4
        bit = (f"((strpos('0123456789abcdef', substr(hx, {c}, 1)) - 1) // {1 << s}) % 2")
        bit_terms.append(
            f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS b{j}"
        )
    concat = " || ".join(
        f"(CASE WHEN b{j} > 0 THEN '1' ELSE '0' END)" for j in range(63, -1, -1)
    )
    return f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    h AS (SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w),
    agg AS (SELECT doc_id, {', '.join(bit_terms)} FROM h GROUP BY doc_id)
    SELECT doc_id, {concat} AS simhash FROM agg
    """


# NOTE (r6): simhash_documents gave up its driver slot to
# resample_clips_16k (the driver window holds exactly 50 queries) — its
# signature table is strictly contained in simhash_near_dup_pairs_documents'
# oracle (the pair query recomputes every signature via the same
# _simhash_oracle_sql CTE), so driver-visible semantics are unchanged; the
# bare signature op stays pytest-pinned (tests/test_operators.py).
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return dedup.simhash64(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# training-data pipeline: text analysis (documents)
# ---------------------------------------------------------------------------

_STOP_SQL = "['the','a','of','to','and','in','is','it','for','on']"

@register(
    "text_features_documents",
    rf"""
    WITH q AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens,
             length(text) AS n_chars
      FROM documents)
    SELECT doc_id,
           CASE WHEN stop > 0.05 THEN 'en' ELSE 'und' END AS lang_pred,
           round(
        (CASE WHEN n_chars_d >= 100 AND n_chars_d <= 20000 THEN 1.0 ELSE 0.0 END) * 0.4
      + (CASE WHEN (n_chars_d - (n_words - 1)) / n_words >= 2.0
              AND (n_chars_d - (n_words - 1)) / n_words <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3
      + (CASE WHEN stop >= 0.01 AND stop <= 0.6 THEN 1.0 ELSE 0.0 END) * 0.3, 6)
      AS quality,
           ws_tokens, re_tokens, n_chars
    FROM q
    """,
)
def text_features_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis family in ONE expression-only scan: language ID (n-gram
    stopword heuristic), quality score (length / chars-per-word / stopword
    ratios), token counting (whitespace + BPE-ish regex). Previously three
    registered queries; merged in r3 to fit the driver's 50-query window —
    all three ops remain independently value-checked via their columns, and
    one scan per document batch is the production shape anyway."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    tc = text.token_counts("text")
    return docs.select(
        "doc_id",
        text.lang_id("text").alias("lang_pred"),
        F.round(text.quality_score("text"), 6).alias("quality"),
        tc["ws_tokens"].cast("long").alias("ws_tokens"),
        tc["re_tokens"].cast("long").alias("re_tokens"),
        tc["n_chars"].cast("long").alias("n_chars"),
    )


@register(
    "winnow_fingerprints_documents",
    """
    WITH g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                    i -> {'pos': i, 'gh': md5(substr(text, i, 8))})) AS u
      FROM documents),
    flat AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM g),
    wm AS (SELECT doc_id, pos,
                  min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
           FROM flat)
    SELECT doc_id, min(pos) AS pos, fingerprint FROM wm GROUP BY doc_id, fingerprint
    """,
)
def winnow_fingerprints_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    fp = text.winnow_fingerprints(docs, "text", "doc_id", k=8, w=4)
    return fp.select("doc_id", (F.col("pos") + 1).alias("pos"), "fingerprint")


# ---------------------------------------------------------------------------
# training-data pipeline: similarity search (embeddings)
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i])) / "
    "(sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i] * {a}[i]))) * "
    "sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i] * {b}[i]))))"
)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = _t(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]


@register(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
          FROM embeddings),
    s AS (SELECT vec_id, {_COS_SQL.format(a='ev', b='qv')} AS cos_exact FROM e, q)
    SELECT vec_id, round(cos_exact, 6) AS cos_sim
    FROM s ORDER BY cos_exact DESC, vec_id LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    qv = _query_vec(spark, sf_dir)
    top = ann.brute_force_topk(emb, "embedding", "vec_id", qv, k=10)
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


# NOTE (r3): the literal-centroid IVF variant (ann.ivf_topk, centroids
# collected to the driver) is no longer REGISTERED — the zero-collect
# distributed path below is the production shape and the driver window is 50
# queries. The literal variant stays cross-validated against the distributed
# one in tests/test_operators.py::test_ivf_distributed_assign_matches_literal.


def _bucket_bits_sql(n_planes: int, seed: int, dim: int, col: str = "embedding") -> str:
    """Seeded-hyperplane bucket bits as SQL: plane values inlined as double
    literals; the sum chain is left-associated exactly like Spark's
    F.aggregate fold, so the sign bits (and therefore the buckets) are
    IEEE-bit-identical across engines."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))

    def dot(p) -> str:
        return " + ".join(f"({col}[{i + 1}] * {x!r})" for i, x in enumerate(p))

    return " || ".join(
        f"(CASE WHEN ({dot(p)}) >= 0 THEN '1' ELSE '0' END)" for p in planes
    )


def _hyperplane_oracle_sql(n_planes: int = 12, seed: int = 42, dim: int = 64) -> str:
    bits = _bucket_bits_sql(n_planes, seed, dim)
    return (
        f"SELECT bucket, count(*) AS n FROM "
        f"(SELECT {bits} AS bucket FROM embeddings) GROUP BY bucket"
    )


def _cosine_near_dup_oracle_sql(
    threshold: float = 0.2, n_planes: int = 8, seed: int = 42
) -> str:
    bits = _bucket_bits_sql(n_planes, seed, 64, col="embedding")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev,
             {bits} AS bucket
      FROM embeddings),
    buckets AS (
      SELECT bucket FROM e GROUP BY bucket
      HAVING count(*) > 1 AND count(*) <= 1000),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_COS_SQL.format(a='a.ev', b='b.ev')}, 6) AS cos_sim
      FROM e a JOIN buckets USING (bucket)
               JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= {threshold!r}
    """


@register("embedding_near_dup_pairs", _cosine_near_dup_oracle_sql())
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: hyperplane-LSH bucket candidates (equi-join,
    never all-pairs) + exact-cosine verification — the embedding-space member
    of the dedup family (exact / MinHash / SimHash / Jaccard / cosine)."""
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    return ann.cosine_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.2, n_planes=8, seed=42, dim=64
    )


@register(
    "ann_ivf_topk_distributed",
    f"""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
          FROM embeddings),
    c AS (SELECT vec_id AS cid, ev AS cvec FROM e
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
    probe AS (
      SELECT cid FROM (
        SELECT c.cid,
               row_number() OVER (ORDER BY {_COS_SQL.format(a='c.cvec', b='qv')} DESC,
                                  c.cid) AS rn
        FROM c, q) WHERE rn <= 2),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_COS_SQL.format(a='e.ev', b='c.cvec')} DESC,
                                  c.cid DESC) AS rn
        FROM e, c) WHERE rn = 1),
    cand AS (
      SELECT e.vec_id, {_COS_SQL.format(a='e.ev', b='qv')} AS cos_exact
      FROM e JOIN assign USING (vec_id) JOIN probe ON assign.cid = probe.cid
      CROSS JOIN q)
    SELECT vec_id, round(cos_exact, 6) AS cos_sim
    FROM cand ORDER BY cos_exact DESC, vec_id LIMIT 10
    """,
)
def ann_ivf_topk_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with ZERO driver-side vector state: centroid init is a
    deterministic md5-ranked sample (TakeOrderedAndProject), probe selection
    and assignment are broadcast joins + max-of-struct argmax — the 10^12-row
    variant of ann_ivf_topk (whose centroid collect is demo-only)."""
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    qv = _query_vec(spark, sf_dir)
    top = ann.ivf_topk_distributed(
        emb, "embedding", "vec_id", qv, k=10, n_centroids=32, n_probe=2
    )
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


# ---------------------------------------------------------------------------
# rows-only entries (non-SQL-expressible: recursive EWMA, Arrow-UDF audio,
# seeded hyperplanes, synthetic-fixture suites)
# ---------------------------------------------------------------------------

@register(
    "ewma_residual_events",
    """
    WITH ord AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    -- pandas ewm(alpha=0.1, adjust=True).mean().shift(1) closed form:
    -- ewma_t = sum_{i<t} x_i (1-a)^(t-1-i) / sum_{i<t} (1-a)^(t-1-i).
    -- O(n^2) per series is fine at oracle scale; round(...,4) absorbs the
    -- summation-order difference vs pandas' recursive update.
    e AS (
      SELECT a.event_id, a.value,
             sum(b.value * pow(0.9, a.rn - 1 - b.rn))
               / sum(pow(0.9, a.rn - 1 - b.rn)) AS ewma
      FROM ord a JOIN ord b ON a.user_id = b.user_id AND b.rn < a.rn
      GROUP BY a.event_id, a.value)
    SELECT event_id, round(ewma, 4) AS ewma, round(value - ewma, 4) AS residual
    FROM e
    """,
)
def ewma_residual_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine.scoring import ewma_residual

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    r = ewma_residual(ev, "value", ["ts", "event_id"], "user_id", alpha=0.1)
    return r.filter(F.col("residual").isNotNull()).select(
        "event_id", F.round("ewma", 4).alias("ewma"), F.round("residual", 4).alias("residual")
    )


@register("hyperplane_lsh_bucket_sizes", _hyperplane_oracle_sql())
def hyperplane_lsh_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    b = ann.hyperplane_lsh_buckets(emb, "embedding", "vec_id", n_planes=12, seed=42, dim=64)
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


def _series_sql(n_series: int = 8, n_points: int = 1000) -> str:
    """The gen_series fixture reproduced in pure SQL: 2-harmonic sine +
    md5-derived noise + planted level shift (engine/synth.py gen_series) —
    hex digits decoded with plain int arithmetic like the simhash oracle."""
    pows = [16 ** (8 - k) for k in range(1, 9)]
    hexval = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('42|' || s || '|' || i), {k}, 1)) - 1) * {p}"
        for k, p in zip(range(1, 9), pows)
    )
    return f"""
      SELECT s, i, 's' || lpad(CAST(s AS VARCHAR), 3, '0') AS series_id,
             (200 + (61 * s) % {n_points - 120}) AS lo,
             sin(2 * pi() * 0.7 * (i / 50.0))
               + 0.3 * sin(4 * pi() * 0.7 * (i / 50.0))
               + ((({hexval}) / 4294967296.0) - 0.5) * 0.1
               + CASE WHEN i BETWEEN (200 + (61 * s) % {n_points - 120})
                               AND (200 + (61 * s) % {n_points - 120}) + 40
                      THEN 5.0 ELSE 0.0 END AS value
      FROM (SELECT a.s, b.i
            FROM (SELECT unnest(range(0, {n_series})) AS s) a,
                 (SELECT unnest(range(0, {n_points})) AS i) b)
    """


@register(
    "series_interval_validation",
    f"""
    WITH pts AS ({_series_sql()}),
    z AS (
      SELECT series_id, i, lo,
             (value - avg(value) OVER w) / stddev_samp(value) OVER w AS zval,
             count(value) OVER w AS c, stddev_samp(value) OVER w AS sd
      FROM pts
      WINDOW w AS (PARTITION BY s ORDER BY i
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)),
    fl AS (SELECT series_id, i, lo FROM z
           WHERE c >= 10 AND sd > 1e-12 AND abs(zval) > 3.0)
    SELECT series_id,
           CAST(lo AS BIGINT) AS anom_start,
           CAST(lo + 40 AS BIGINT) AS anom_stop,
           CAST(count(*) AS BIGINT) AS flagged,
           CAST(sum(CASE WHEN i BETWEEN lo AND lo + 40 THEN 1 ELSE 0 END)
                AS BIGINT) AS flagged_in_interval,
           count(*) = sum(CASE WHEN i BETWEEN lo AND lo + 40 THEN 1 ELSE 0 END)
             AS all_in_interval
    FROM fl GROUP BY series_id, lo
    """,
)
def series_interval_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine import synth
    from engine.scoring import interval_validation, rolling_zscore

    series = synth.gen_series(spark, n_series=8, n_points=1000)
    scored = rolling_zscore(series, "value", ["idx"], series_col="series_id",
                            window=50, min_periods=10)
    flagged = scored.filter(F.abs(F.col("zscore")) > 3.0).select("series_id", "idx")
    labels = spark.createDataFrame(
        [(f"s{s:03d}", *synth.anomaly_range(s, 1000)) for s in range(8)],
        "series_id string, anom_start long, anom_stop long",
    )
    return interval_validation(flagged, "idx", "series_id", labels)


# ground-truth oracles for the synthetic-fixture queries: the planting rules
# (engine/synth.py RULES) are closed-form modular conditions on the row id, so
# the expected verdicts/violations are INDEPENDENTLY derivable in pure SQL —
# a stronger oracle than recomputation (it checks generator + engine at once).
_FIXTURE_N = 2000

_CLIPS_SUITE_ORACLE = f"""
    WITH ids AS (SELECT unnest(range(0, {_FIXTURE_N})) AS i),
    b AS (SELECT i, CASE WHEN i % 1000 = 7 THEN 2 ELSE 1 END AS w FROM ids),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM b)
    SELECT c.constraint_name, c.violation_count,
           (SELECT n FROM tot) AS rows_scanned,
           c.violation_count = 0 AS passed
    FROM (
      SELECT 'clip_id_not_null' AS constraint_name, CAST(0 AS BIGINT) AS violation_count
      UNION ALL SELECT 'bytes_not_null', CAST(0 AS BIGINT)
      UNION ALL SELECT 'dur_ms_range',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 19 OR i % 4000 = 21
                                       THEN w ELSE 0 END), 0) AS BIGINT) FROM b)
      UNION ALL SELECT 'sr_hz_domain',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 17 THEN w ELSE 0 END), 0)
                AS BIGINT) FROM b)
      UNION ALL SELECT 'codec_domain',
        -- 'wma' plants, minus ids where codec_null / corrupt plants override
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 23 AND i % 500 != 11
                                        AND i % 3000 != 41
                                       THEN w ELSE 0 END), 0) AS BIGINT) FROM b)
      UNION ALL SELECT 'clip_id_unique',
        (SELECT CAST(coalesce(sum(w - 1), 0) AS BIGINT) FROM b WHERE w > 1)
      UNION ALL SELECT 'transcript_ref_integrity',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 1000 = 37 THEN w ELSE 0 END), 0)
                AS BIGINT) FROM b)
    ) c
"""


@register("clips_suite_verdicts", _CLIPS_SUITE_ORACLE)
def clips_suite_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine import synth
    from engine.runner import validate

    clips = synth.gen_clips(spark, _FIXTURE_N, partitions=8)
    transcripts = synth.gen_transcripts(spark, _FIXTURE_N, partitions=4)
    res = validate(clips, transcripts, n_buckets=16)
    return res.verdicts.select(
        F.col("constraint").alias("constraint_name"),
        "violation_count", "rows_scanned", "passed",
    )


def _planted_decode_error_case() -> str:
    """The planting-rule -> decode-error-string mapping as one SQL CASE,
    shared by every oracle that reasons about decode failures (keeping
    RULES / the codec cycles in engine/synth.py single-sourced on the SQL
    side too)."""
    return """CASE WHEN i % 3000 = 41 THEN
          CASE ((i - 41) // 3000) % 3
            WHEN 0 THEN 'bad_flac_header'
            WHEN 1 THEN 'bad_ogg_page'
            ELSE 'bad_mp3_frame' END
        WHEN i % 2000 = 47 THEN 'bad_flac_frame'
        WHEN i % 3000 = 53 THEN
          CASE ((i - 53) // 3000) % 4
            WHEN 0 THEN 'bad_opus_packet'
            WHEN 2 THEN 'bad_ogg_page'
            ELSE 'bad_mp3_frame' END
        WHEN i % 3000 = 71 THEN 'bad_mp3_frame'
        END"""


_AUDIO_INV_ORACLE = f"""
    WITH ids AS (SELECT unnest(range(0, {_FIXTURE_N})) AS i),
    v AS (
      SELECT i,
        NOT (i % 2000 = 13 OR i % 3000 = 41 OR i % 2000 = 47
             OR i % 3000 = 53 OR i % 2000 = 59 OR i % 2000 = 63
             OR i % 3000 = 71) AS pcm_ok,
        NOT (i % 2000 = 29 OR i % 500 = 3 OR i % 1000 = 37) AS transcript_ok,
        NOT (i % 4000 = 43) AS meta_sr_ok,
        {_planted_decode_error_case()} AS decode_error,
        CASE WHEN i % 1000 = 7 THEN 2 ELSE 1 END AS w
      FROM ids)
    SELECT 'clip_' || lpad(CAST(i AS VARCHAR), 10, '0') AS clip_id,
           pcm_ok, transcript_ok, meta_sr_ok, decode_error
    FROM v JOIN (SELECT unnest(range(1, 3)) AS dup) d ON d.dup <= v.w
    WHERE NOT pcm_ok OR NOT transcript_ok OR NOT meta_sr_ok
"""


@register("audio_invariant_violations", _AUDIO_INV_ORACLE)
def audio_invariant_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine import audio as audio_mod
    from engine import synth

    clips = synth.gen_clips(spark, _FIXTURE_N, partitions=8)
    transcripts = synth.gen_transcripts(spark, _FIXTURE_N, partitions=4)
    inv = audio_mod.audio_invariants(clips, transcripts)
    # decode_error is surfaced only when it CAUSED the violation — for
    # passing rows it records incidental facts (e.g. codec_decoder_missing)
    # that depend on the rng-drawn codec and aren't part of the contract
    return inv.filter(
        ~F.col("pcm_ok") | ~F.col("transcript_ok") | ~F.col("meta_sr_ok")
    ).select(
        "clip_id", "pcm_ok", "transcript_ok", "meta_sr_ok",
        F.when(~F.col("pcm_ok"), F.col("decode_error")).alias("decode_error"),
    )


def _grid_oracle_sql() -> str:
    wins = (50, 25, 100)
    win_cols = ", ".join(
        f"avg(value) OVER w{w} AS m{w}, stddev_samp(value) OVER w{w} AS s{w}, "
        f"count(value) OVER w{w} AS c{w}"
        for w in wins
    )
    win_defs = ", ".join(
        f"w{w} AS (PARTITION BY s ORDER BY i ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)"
        for w in wins
    )
    zcase = "CASE win " + " ".join(
        f"WHEN {w} THEN (value - m{w}) / s{w}" for w in wins
    ) + " END"
    ccase = "CASE win " + " ".join(f"WHEN {w} THEN c{w}" for w in wins) + " END"
    return f"""
    WITH pts AS ({_series_sql()}),
    zz AS (SELECT series_id, value, {win_cols} FROM pts WINDOW {win_defs}),
    cfg AS (SELECT * FROM (VALUES
              (0, 50, CAST(3.0 AS DOUBLE)), (1, 50, CAST(5.0 AS DOUBLE)),
              (2, 25, CAST(3.0 AS DOUBLE)), (3, 100, CAST(3.0 AS DOUBLE)))
            t(config_id, win, threshold)),
    z AS (SELECT series_id, config_id, win, threshold,
                 {zcase} AS zval, {ccase} AS c
          FROM zz CROSS JOIN cfg)
    SELECT series_id, config_id, win AS window, threshold,
           CAST(sum(CASE WHEN c >= 5 AND abs(zval) > threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS flagged,
           round(max(CASE WHEN c >= 5 THEN abs(zval) END), 4) AS max_abs_z,
           CAST(sum(CASE WHEN c >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS evaluated
    FROM z GROUP BY series_id, config_id, win, threshold
    """


@register("grid_evaluation_series", _grid_oracle_sql())
def grid_evaluation_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2: hyperparameter-grid fan-out over series (rnn_old.py:256-288).
    Oracle: the same grid re-derived as SQL window specs over the
    SQL-reproduced fixture (md5 noise — see _series_sql)."""
    from engine import synth
    from engine.scoring import grid_evaluate

    series = synth.gen_series(spark, n_series=8, n_points=1000)
    out = grid_evaluate(
        series, "value", "idx", "series_id",
        configs=[
            {"window": 50, "threshold": 3.0},
            {"window": 50, "threshold": 5.0},
            {"window": 25, "threshold": 3.0},
            {"window": 100, "threshold": 3.0},
        ],
    )
    return out.withColumn("max_abs_z", F.round("max_abs_z", 4))


_KDE_M = 32          # fit-grid size
_KDE_BW = 5.0        # bandwidth
_KDE_QS = [(i + 0.5) / _KDE_M for i in range(_KDE_M)]


def _kde_oracle_sql() -> str:
    qs = ", ".join(repr(q) for q in _KDE_QS)
    # log p(x) = mx + ln(sum_i exp(e_i - mx)) - ln(m) - ln(h*sqrt(2*pi)),
    # e_i = -(x - p_i)^2 / (2 h^2) — the numerically-stable logsumexp used by
    # the Spark UDF (engine/scoring.py kde_log_density with unit weights)
    def score(x: str) -> str:
        es = f"list_transform(pts, p -> -(({x} - p) * ({x} - p)) / {2 * _KDE_BW * _KDE_BW!r})"
        return (
            f"(list_max({es}) + ln(list_sum(list_transform({es}, "
            f"v -> exp(v - list_max({es}))))) "
            f"- ln({float(_KDE_M)!r}) - ln({_KDE_BW!r} * sqrt(2 * pi())))"
        )

    return f"""
    WITH train AS (SELECT value FROM events WHERE user_id < 100),
    p AS (SELECT quantile_cont(value, [{qs}]) AS pts FROM train),
    st AS (SELECT {score('t.value')} AS ld FROM train t, p),
    thr AS (SELECT quantile_cont(ld, 0.01) AS thr FROM st),
    sa AS (SELECT e.event_id, {score('e.value')} AS ld FROM events e, p)
    SELECT event_id, round(ld, 6) AS kde_log_density
    FROM sa, thr WHERE ld <= thr
    """


@register("kde_threshold_pipeline", _kde_oracle_sql())
def kde_threshold_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference flagship's scoring tail (anomaly_detection.py:453-465):
    KDE fit on the baseline distribution, log-density scores, threshold =
    q-quantile of baseline scores, verdict rows on the full table. This
    oracle-parity variant fits on an exact-quantile grid (both engines
    compute identical fit points); the 10^12-row path is the t-digest
    variant below (kde_threshold_pipeline_sketch)."""
    from engine.scoring import kde_log_density

    ev = _t(spark, sf_dir, "events")
    train = ev.filter("user_id < 100")  # baseline slice (time-ordered analog)
    pts = train.agg(
        F.percentile("value", F.array(*[F.lit(q) for q in _KDE_QS])).alias("p")
    ).collect()[0]["p"]
    scored_train = kde_log_density(train, "value", list(pts), None, bandwidth=_KDE_BW)
    thr = scored_train.agg(
        F.percentile("kde_log_density", F.lit(0.01)).alias("t")
    ).collect()[0]["t"]
    scored_all = kde_log_density(ev, "value", list(pts), None, bandwidth=_KDE_BW)
    return scored_all.filter(F.col("kde_log_density") <= F.lit(thr)).select(
        "event_id", F.round("kde_log_density", 6).alias("kde_log_density")
    )


# NOTE (r6b): kde_threshold_pipeline_sketch gave up its driver slot to
# segment_clips_1s (the driver window holds exactly 50 queries) — the
# t-digest machinery it exercised stays driver-visible twice over
# (tdigest_quantile_accuracy, drift_sketch_accuracy_clips) and the exact
# KDE pipeline keeps its own slot; the digest-fit KDE path stays
# pytest-pinned (tests/test_sources_kde_grid.py:77
# test_kde_from_digest_close_to_exact_fit).
def kde_threshold_pipeline_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path of the KDE pipeline: fit state derives from ONE t-digest
    sketch pass (centroids+weights), so the 'fit' summarizes 10^12 rows in
    ~200 centroids. Digest centroids are not SQL-expressible, so the oracle
    pins what IS independently derivable (VERDICT r2 #5): the exact
    pipeline's verdict count, plus a boolean asserting the sketch pipeline's
    verdict count sits within 15% (+10) of it — Spark computes both counts,
    DuckDB recomputes n_exact and expects the bound to hold. Per-row sketch
    accuracy is additionally pytest-pinned (test_sketch_drift)."""
    from engine.scoring import kde_fit_from_digest, kde_log_density
    from engine.sketch import build_digest

    ev = _t(spark, sf_dir, "events")
    train = ev.filter("user_id < 100")

    # sketch pipeline
    digest = build_digest(train, "value", compression=100)
    pts_s, w_s = kde_fit_from_digest(digest)
    thr_s = (
        kde_log_density(train, "value", pts_s, w_s, bandwidth=_KDE_BW)
        .agg(F.percentile("kde_log_density", F.lit(0.01)).alias("t"))
        .collect()[0]["t"]
    )
    n_sketch = (
        kde_log_density(ev, "value", pts_s, w_s, bandwidth=_KDE_BW)
        .filter(F.col("kde_log_density") <= F.lit(thr_s))
        .count()
    )

    # exact pipeline (same computation as kde_threshold_pipeline)
    pts_e = train.agg(
        F.percentile("value", F.array(*[F.lit(q) for q in _KDE_QS])).alias("p")
    ).collect()[0]["p"]
    thr_e = (
        kde_log_density(train, "value", list(pts_e), None, bandwidth=_KDE_BW)
        .agg(F.percentile("kde_log_density", F.lit(0.01)).alias("t"))
        .collect()[0]["t"]
    )
    n_exact = (
        kde_log_density(ev, "value", list(pts_e), None, bandwidth=_KDE_BW)
        .filter(F.col("kde_log_density") <= F.lit(thr_e))
        .count()
    )

    bound = max(10.0, 0.15 * n_exact)
    return spark.createDataFrame(
        [(n_exact, abs(n_sketch - n_exact) <= bound)],
        "n_exact long, sketch_count_within_bound boolean",
    )


# ---------------------------------------------------------------------------
# additional relational operators (coverage widening)
# ---------------------------------------------------------------------------

@register(
    "argmax_event",
    """
    SELECT event_id, value FROM events
    WHERE value IS NOT NULL ORDER BY value DESC, event_id LIMIT 1
    """,
)
def argmax_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: position of the max (np.argwhere(losses == losses.max()),
    anomaly_detection.py:454) — TakeOrderedAndProject, no full sort."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .orderBy(F.desc("value"), "event_id")
        .limit(1)
        .select("event_id", "value")
    )


@register(
    "json_props_stats",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(CAST(props->>'k' AS INT) AS DECIMAL(38,4))) AS DOUBLE) AS sum_k,
           min(CAST(props->>'k' AS INT)) AS min_k,
           max(CAST(props->>'k' AS INT)) AS max_k
    FROM events WHERE props IS NOT NULL GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (events.props) + decimal-exact aggregation."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k.cast("decimal(38,4)")).cast("double").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "sessionization_events",
    """
    WITH g AS (
      -- epoch_ms on both sides: DuckDB epoch() yields fractional seconds while
      -- Spark unix_timestamp truncates — a gap within 1s of the boundary would
      -- silently diverge. Milliseconds are exact in both engines.
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id,
             -- CAST: DuckDB's running sum is HUGEINT, Spark's is BIGINT and
             -- the driver's value hash is type-sensitive
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g)
    SELECT user_id, session_id, count(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionization_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30min starts a session (lag + running sum)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts")).over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(prev.cast("timestamp"))) > 1800000),
        1,
    ).otherwise(0)
    g = ev.withColumn("new_s", new_s)
    sess = g.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "rollup_orders",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation (rollup) — subtotals + grand total."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,4)")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total",
        )
    )


@register(
    "pivot_events_by_type",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ("click", "view", "purchase", "signup", "error")],
    )


@register(
    "dedup_keep_first_documents",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1
    """,
)
def dedup_keep_first_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs, "text", "doc_id").select("doc_id", "lang")


@register(
    "drift_report_clips",
    """
    SELECT * FROM (VALUES
      ('dur_ms', 'ks', false, true), ('dur_ms', 'psi', false, true),
      ('sr_hz', 'ks', true, true), ('sr_hz', 'psi', true, true),
      ('codec', 'psi_categorical', true, true)
    ) t(column_name, metric, passed, value_ok)
    """,
)
def drift_report_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full KS/PSI drift report: clean clips vs a +25%-dur generation
    (t-digest sketches, FIXTURES.md §3). The sketch statistic VALUES are not
    SQL-expressible, so the oracle pins everything that IS independently
    known (VERDICT r2 #5): the ground-truth pass/fail pattern (only dur_ms
    is perturbed) AND per-value sanity — value_ok asserts the statistic lies
    in its metric's domain (KS in [0,1], PSI >= 0) and on the correct side of
    the verdict threshold, i.e. the report's value column is consistent with
    its own passed column. Value ACCURACY is pinned by
    drift_sketch_accuracy_clips (within 0.05 of exact two-sample KS)."""
    from engine import drift, synth

    clips = synth.gen_clips(spark, 2000, partitions=8).cache()
    baseline = drift.fit_baseline(clips, ["dur_ms", "sr_hz"], ["codec"])
    drifted = clips.withColumn("dur_ms", (F.col("dur_ms") * 1.25).cast("int"))
    rep = drift.drift_check(drifted, baseline)  # thresholds: ks/psi <= 0.1
    in_domain = F.when(
        F.col("metric") == "ks", (F.col("value") >= 0) & (F.col("value") <= 1)
    ).otherwise(F.col("value") >= 0)
    side_ok = F.col("passed") == (F.col("value") <= 0.1)
    return spark.createDataFrame(rep).select(
        "column_name", "metric", "passed", (in_domain & side_ok).alias("value_ok")
    )


@register(
    "drift_sketch_accuracy_clips",
    """
    SELECT * FROM (VALUES ('dur_ms', true), ('sr_hz', true))
    t(column_name, ks_within_tolerance)
    """,
)
def drift_sketch_accuracy_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy oracle for the drift VALUES: the t-digest KS statistic
    must sit within 0.05 of the exact two-sample KS computed from full ECDFs
    on the same pair of tables (baseline clips vs +25%-dur drifted clips).
    The exact KS is only computable at fixture scale — at 10^12 rows the
    digest IS the product; this query pins its error where exact truth is
    still affordable."""
    from engine import drift, synth

    clips = synth.gen_clips(spark, 2000, partitions=8).cache()
    drifted = clips.withColumn("dur_ms", (F.col("dur_ms") * 1.25).cast("int"))
    baseline = drift.fit_baseline(clips, ["dur_ms", "sr_hz"], [])
    current = drift.fit_baseline(drifted, ["dur_ms", "sr_hz"], [])

    def exact_ks(col: str) -> float:
        a = clips.select(F.col(col).cast("double").alias("v"), F.lit(1).alias("is_a"))
        b = drifted.select(F.col(col).cast("double").alias("v"), F.lit(0).alias("is_a"))
        u = a.unionByName(b)
        n_a = clips.count()
        n_b = n_a
        # aggregate per DISTINCT value before the cumulative step: the ECDF
        # difference is only evaluated after all ties at a value are consumed
        g = u.groupBy("v").agg(
            F.sum("is_a").alias("a_cnt"),
            F.sum(1 - F.col("is_a")).alias("b_cnt"),
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        ecdf = g.select(
            (F.sum("a_cnt").over(w) / n_a - F.sum("b_cnt").over(w) / n_b).alias("d")
        )
        return ecdf.agg(F.max(F.abs(F.col("d")))).collect()[0][0]

    from engine.sketch import ks_statistic

    rows = []
    for col in ("dur_ms", "sr_hz"):
        sketch_ks = ks_statistic(baseline.digests[col], current.digests[col])
        rows.append((col, abs(sketch_ks - exact_ks(col)) <= 0.05))
    return spark.createDataFrame(rows, "column_name string, ks_within_tolerance boolean")


# NOTE (r3): drift_verdicts_clips was retired from the registry — its entire
# oracle (the ground-truth pass/fail pattern) is strictly contained in
# drift_report_clips above, which checks the same pipeline's pattern PLUS
# per-value consistency booleans. Retiring it funded the slot for the
# near-dup clustering query below (driver window = 50 queries).


def _near_dup_clusters_oracle_sql() -> str:
    """Connected components re-derived in pure SQL: transitive closure of the
    (already oracle-checked) cosine near-dup pair graph via a recursive CTE,
    component label = min reachable node."""
    return f"""
    WITH RECURSIVE cc_pairs AS (
      SELECT id_a, id_b FROM ({_cosine_near_dup_oracle_sql()})),
    cc_edges AS (SELECT id_a AS src, id_b AS dst FROM cc_pairs
                 UNION SELECT id_b, id_a FROM cc_pairs),
    cc_nodes AS (SELECT DISTINCT src AS node FROM cc_edges),
    reach(node, label) AS (
      SELECT node, node FROM cc_nodes
      UNION
      SELECT g.src, r.label FROM cc_edges g JOIN reach r ON g.dst = r.node
    )
    SELECT node AS vec_id, CAST(min(label) AS BIGINT) AS cluster_id
    FROM reach GROUP BY node
    """


# NB: the iterative min-label-propagation CC variant
# (dedup.near_dup_clusters) stayed pytest-covered but gave up its driver
# slot in r5 to audio_features_clips — the driver window holds exactly 50
# queries, and the two-phase CC query below shares this oracle, so the
# driver-visible semantics are unchanged (VERDICT r4 #2).


def _clips_2k(spark: SparkSession):
    from engine import synth

    return synth.gen_clips(spark, _FIXTURE_N, partitions=8)


_AUDIO_FEATURES_ORACLE = f"""
    WITH ids AS (SELECT unnest(range(0, {_FIXTURE_N})) AS i),
    v AS (SELECT i,
      {_planted_decode_error_case()} AS derr,
      (i % 2000 = 13) AS garbage,
      CASE WHEN i % 1000 = 7 THEN 2 ELSE 1 END AS w
      FROM ids)
    SELECT 'clip_' || lpad(CAST(r.i AS VARCHAR), 10, '0') AS clip_id, r.reason
    FROM (
      SELECT i, 'decode_violation:' || derr AS reason, w FROM v
      WHERE derr IS NOT NULL
      UNION ALL
      SELECT i, 'zcr_noise', w FROM v WHERE garbage
    ) r JOIN (SELECT unnest(range(1, 3)) AS dup) d ON d.dup <= r.w
"""


@register("audio_features_clips", _AUDIO_FEATURES_ORACLE)
def audio_features_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extraction as a driver-checked operator (VERDICT
    r4 #2): audio_features (engine/features.py — one mapInArrow pass over
    the real decode seam) runs on the planted fixture and the query emits
    one row per FEATURE-LEVEL anomaly:

      * decode_violation:<err> — decode failed with a real error (not the
        documented codec stub): exactly the planted container/body
        corruptions;
      * zcr_noise — zero-crossing rate > 0.2: decodable garbage signals
        (the payload_corrupt plants). Margins measured over the fixture:
        clean 2-harmonic clips max 0.10 (worst case sr=8000, f1 up to
        480 Hz); the mod-wrap garbage plants span 0.34-0.41 across ids —
        0.2 sits >= 2x from both populations;
      * n_samples_mismatch — decoded sample count disagrees with the
        (sr_hz, dur_ms) columns under the engine's 200 ms floor / 200k cap
        policy: planted-empty (every fixture payload is consistent);
      * clipped_clean — clipping in an otherwise-clean signal:
        planted-empty (the generator's 0.9 headroom never clips).

    The planting rules are closed-form in the row id, so the expected rows
    are derivable in pure SQL with no audio code at all. Columns the rng
    draws (sr, dur, codec) never reach the output — rng-dependent facts
    (e.g. which clean clips are opus) are deliberately not part of the
    contract."""
    from engine import features

    clips = _clips_2k(spark)
    feats = features.audio_features(clips)
    dims = clips.select("clip_id", "sr_hz", "dur_ms").dropDuplicates(["clip_id"])
    j = feats.join(F.broadcast(dims), "clip_id")
    expected_n = F.least(
        F.floor(
            F.col("sr_hz").cast("long")
            * F.greatest(F.col("dur_ms").cast("long"), F.lit(200))
            / 1000
        ),
        F.lit(200_000),
    ).cast("long")
    reasons = F.array_compact(
        F.array(
            F.when(
                F.col("decode_error").isNotNull()
                & (F.col("decode_error") != "codec_decoder_missing"),
                F.concat(F.lit("decode_violation:"), F.col("decode_error")),
            ),
            F.when(F.col("zcr") > 0.2, F.lit("zcr_noise")),
            F.when(
                F.col("n_samples").isNotNull() & (F.col("n_samples") != expected_n),
                F.lit("n_samples_mismatch"),
            ),
            F.when(
                (F.col("clipped_frac") > 0.0) & (F.col("zcr") <= 0.2),
                F.lit("clipped_clean"),
            ),
        )
    )
    return j.select("clip_id", F.explode(reasons).alias("reason"))


_RESAMPLE_ORACLE = f"""
    WITH ids AS (SELECT unnest(range(0, {_FIXTURE_N})) AS i)
    SELECT 'clip_' || lpad(CAST(i AS VARCHAR), 10, '0') AS clip_id,
           'resampled_present' AS fact
    FROM ids
    WHERE i % 2000 IN (13, 59, 63) OR i % 4000 = 43 OR i % 500 = 11
"""


@register("resample_clips_16k", _RESAMPLE_ORACLE)
def resample_clips_16k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resample as a driver-checked operator (VERDICT r5 #2):
    features.resample_clips (linear-interp to 16 kHz, one mapInArrow pass
    over the real decode seam) runs on the planted fixture and the query
    emits one row per FACT about the output, each independently derivable
    from the planting rules:

      * resampled_present — clips whose planting rule FORCES a decodable
        codec must appear in the output: payload_corrupt (13: garbage
        signal, but a structurally valid wav/flac payload),
        sr_metadata_mismatch (43: valid flac, lying STREAMINFO),
        flac_warmup_corrupt (59) and flac_stereo_side_corrupt (63: decodes
        via stereo decorrelation + downmix), codec_null (11 mod 500: wav
        path). The EXPECTED rows — everything else is planted-empty:
      * len_mismatch — an output row whose n_samples disagrees with
        round(n_in * 16000 / sr_hz), n_in = least(floor(sr_hz *
        greatest(dur_ms, 200) / 1000), 200000) from the COLUMNS (the
        engine's duration-floor / sample-cap policy);
      * corrupt_produced_rows — planted container/body corruptions
        (41 mod 3000, 47 mod 2000, 53 mod 3000, 71 mod 3000) must
        contribute ZERO rows;
      * identity_broken — a wav clip already at 16 kHz must round-trip
        BYTE-IDENTICALLY (md5 compared on both scans — the binary column
        itself never enters the join, engine-wide rule).

    Clips whose codec the rng drew (wav/flac vs the stubbed opus/mp3)
    deliberately never reach the output contract — rng-dependent facts are
    not derivable in the planting-rule SQL."""
    from engine import features

    clips = _clips_2k(spark)
    res = features.resample_clips(clips, target_sr=16000)
    i = F.substring("clip_id", 6, 10).cast("long")
    dims = clips.select(
        "clip_id",
        F.col("sr_hz").alias("src_sr"),
        F.col("dur_ms").alias("src_dur"),
        F.col("codec").alias("src_codec"),
        F.md5("bytes").alias("src_digest"),
    ).dropDuplicates(["clip_id"])
    j = res.select(
        "clip_id", "n_samples", F.md5("bytes").alias("out_digest")
    ).join(F.broadcast(dims), "clip_id")
    n_in = F.least(
        F.floor(
            F.col("src_sr").cast("long")
            * F.greatest(F.col("src_dur").cast("long"), F.lit(200))
            / 1000
        ),
        F.lit(200_000),
    )
    exp_n = F.round(n_in * 16000 / F.col("src_sr")).cast("long")
    corrupt = (
        (i % 3000 == 41) | (i % 2000 == 47) | (i % 3000 == 53)
        | (i % 3000 == 71)
    )
    present = (
        (i % 2000).isin(13, 59, 63) | (i % 4000 == 43) | (i % 500 == 11)
    )
    facts = F.array_compact(
        F.array(
            F.when(F.col("n_samples") != exp_n, F.lit("len_mismatch")),
            F.when(corrupt, F.lit("corrupt_produced_rows")),
            F.when(
                (F.col("src_sr") == 16000)
                & (F.col("src_codec") == "pcm_s16le")
                & (F.col("out_digest") != F.col("src_digest")),
                F.lit("identity_broken"),
            ),
            F.when(present, F.lit("resampled_present")),
        )
    )
    return j.select("clip_id", F.explode(facts).alias("fact"))


_SEGMENT_ORACLE = f"""
    WITH ids AS (SELECT unnest(range(0, {_FIXTURE_N})) AS i)
    SELECT 'clip_' || lpad(CAST(i AS VARCHAR), 10, '0') AS clip_id,
           'segments_present' AS fact
    FROM ids
    WHERE i % 2000 IN (13, 59, 63) OR i % 4000 = 43 OR i % 500 = 11
"""


@register("segment_clips_1s", _SEGMENT_ORACLE)
def segment_clips_1s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling as a driver-checked operator (VERDICT r5
    #4, the slot funded by retiring kde_threshold_pipeline_sketch):
    features.segment_clips (1 s canonical-WAV segments, one mapInArrow pass
    over the real decode seam, bounded fan-out emission) runs on the
    planted fixture and the query emits one row per FACT, each derivable
    from the planting rules alone:

      * segments_present — clips whose planting rule FORCES a decodable
        codec must contribute segments: payload_corrupt (13: garbage
        signal in a pristine container — segmentation is a PREP step, so
        it DOES segment; the invariant pass is where it's reported),
        flac_warmup_corrupt (59), flac_stereo_side_corrupt (63: stereo
        decorrelation + downmix), sr_metadata_mismatch (43: valid flac
        body behind the lying STREAMINFO), codec_null (11 mod 500: wav
        path). The EXPECTED rows — everything below is planted-empty:
      * seg_count_mismatch — a clip's distinct-segment count disagrees
        with ceil(n_in / sr_hz) where n_in = least(floor(sr_hz *
        greatest(dur_ms, 200) / 1000), 200000) from the COLUMNS (step =
        sr_hz at 1000 ms; partial tail kept);
      * idx_gap — seg_idx is not exactly 0..n_segs-1;
      * coverage_broken — per-segment sample counts, recovered from the
        canonical-WAV container itself ((length(bytes)-44)/2), don't sum
        back to n_in: the segments must tile the decode losslessly;
      * seg_meta_mismatch — a segment's dur_ms column disagrees with
        floor(n_samples*1000/sr), or its sr_hz disagrees with the source
        clip's column;
      * row_multiplicity_broken — every (clip_id, seg_idx) must appear
        exactly w times, w = 2 for the clip_id_duplicate plants (7 mod
        1000: the input row is duplicated, and segmentation is per-row, so
        its whole segment fan-out must double), else 1;
      * corrupt_produced_rows — planted container/body corruptions
        (41 mod 3000, 47 mod 2000, 53 mod 3000, 71 mod 3000) must
        contribute ZERO rows.

    Clips whose codec the rng drew (wav/flac vs the stubbed opus/mp3)
    deliberately never reach the output contract — rng-dependent facts are
    not derivable in the planting-rule SQL. Scale shape: bytes never enters
    a join; both aggregations combine map-side before one exchange keyed on
    clip_id; the dims join is an explicit broadcast. Reference analog:
    fixed-length windowing of each series before scoring
    (/root/reference/models/utils.py:123-138 window framing)."""
    from engine import features

    clips = _clips_2k(spark)
    segs = features.segment_clips(clips, seg_ms=1000)
    i = F.substring("clip_id", 6, 10).cast("long")
    dims = clips.select(
        "clip_id",
        F.col("sr_hz").alias("src_sr"),
        F.col("dur_ms").alias("src_dur"),
    ).dropDuplicates(["clip_id"])
    seg_samp = ((F.length("bytes") - F.lit(44)) / F.lit(2)).cast("long")
    # duplicate input rows (7 mod 1000) are byte-identical, so first() of
    # any per-segment attribute is well-defined; mult carries the row count
    per_seg = segs.groupBy("clip_id", "seg_idx").agg(
        F.count(F.lit(1)).alias("mult"),
        F.first(seg_samp).alias("n_samp"),
        F.first("dur_ms").alias("seg_dur"),
        F.first("sr_hz").alias("seg_sr"),
    )
    per_clip = per_seg.groupBy("clip_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.min("seg_idx").alias("min_idx"),
        F.max("seg_idx").alias("max_idx"),
        F.sum("n_samp").alias("tot_samp"),
        F.min("mult").alias("mult_lo"),
        F.max("mult").alias("mult_hi"),
        F.min("seg_sr").alias("sr_lo"),
        F.max("seg_sr").alias("sr_hi"),
        F.sum(
            F.when(
                F.col("seg_dur")
                != F.floor(F.col("n_samp") * 1000 / F.col("seg_sr")),
                1,
            ).otherwise(0)
        ).alias("n_dur_bad"),
    )
    j = per_clip.join(F.broadcast(dims), "clip_id")
    n_in = F.least(
        F.floor(
            F.col("src_sr").cast("long")
            * F.greatest(F.col("src_dur").cast("long"), F.lit(200))
            / 1000
        ),
        F.lit(200_000),
    )
    exp_segs = F.ceil(n_in / F.col("src_sr"))
    exp_mult = F.when(i % 1000 == 7, F.lit(2)).otherwise(F.lit(1))
    corrupt = (
        (i % 3000 == 41) | (i % 2000 == 47) | (i % 3000 == 53)
        | (i % 3000 == 71)
    )
    present = (
        (i % 2000).isin(13, 59, 63) | (i % 4000 == 43) | (i % 500 == 11)
    )
    facts = F.array_compact(
        F.array(
            F.when(F.col("n_segs") != exp_segs, F.lit("seg_count_mismatch")),
            F.when(
                (F.col("min_idx") != 0)
                | (F.col("max_idx") != F.col("n_segs") - 1),
                F.lit("idx_gap"),
            ),
            F.when(F.col("tot_samp") != n_in, F.lit("coverage_broken")),
            F.when(
                (F.col("n_dur_bad") > 0)
                | (F.col("sr_lo") != F.col("src_sr"))
                | (F.col("sr_hi") != F.col("src_sr")),
                F.lit("seg_meta_mismatch"),
            ),
            F.when(
                (F.col("mult_lo") != exp_mult) | (F.col("mult_hi") != exp_mult),
                F.lit("row_multiplicity_broken"),
            ),
            F.when(corrupt, F.lit("corrupt_produced_rows")),
            F.when(present, F.lit("segments_present")),
        )
    )
    return j.select("clip_id", F.explode(facts).alias("fact"))


# ground truth for the COMPLETE validate(check_audio=True) pass: the 7
# schema/key constraints of _CLIPS_SUITE_ORACLE plus the 3 audio/transcript
# invariants, all derived purely from the planting rules (engine/synth.py)
_CLIPS_FULL_ORACLE = f"""
    WITH ids AS (SELECT unnest(range(0, {_FIXTURE_N})) AS i),
    b AS (SELECT i, CASE WHEN i % 1000 = 7 THEN 2 ELSE 1 END AS w FROM ids),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM b)
    SELECT c.constraint_name, c.violation_count,
           (SELECT n FROM tot) AS rows_scanned,
           c.violation_count = 0 AS passed
    FROM (
      SELECT 'clip_id_not_null' AS constraint_name, CAST(0 AS BIGINT) AS violation_count
      UNION ALL SELECT 'bytes_not_null', CAST(0 AS BIGINT)
      UNION ALL SELECT 'dur_ms_range',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 19 OR i % 4000 = 21
                                       THEN w ELSE 0 END), 0) AS BIGINT) FROM b)
      UNION ALL SELECT 'sr_hz_domain',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 17 THEN w ELSE 0 END), 0)
                AS BIGINT) FROM b)
      UNION ALL SELECT 'codec_domain',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 23 AND i % 500 != 11
                                        AND i % 3000 != 41
                                       THEN w ELSE 0 END), 0) AS BIGINT) FROM b)
      UNION ALL SELECT 'clip_id_unique',
        (SELECT CAST(coalesce(sum(w - 1), 0) AS BIGINT) FROM b WHERE w > 1)
      UNION ALL SELECT 'transcript_ref_integrity',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 1000 = 37 THEN w ELSE 0 END), 0)
                AS BIGINT) FROM b)
      UNION ALL SELECT 'pcm_snr_invariant',
        -- wav PCM corruption + container-header corruption + flac frame-body
        -- corruption (real decode) + opus/mp3 mid-chain corruption (full
        -- page/frame-chain validation) + fixed-predictor warmup corruption
        -- (every CRC valid; only reconstruction + SNR sees it, r5) + stereo
        -- side-subframe warmup corruption (every CRC valid; only stereo
        -- decorrelation R = L - side + SNR sees it, r6)
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 13 OR i % 3000 = 41
                                        OR i % 2000 = 47 OR i % 3000 = 53
                                        OR i % 2000 = 59 OR i % 2000 = 63
                                        OR i % 3000 = 71
                                       THEN w ELSE 0 END), 0) AS BIGINT) FROM b)
      UNION ALL SELECT 'transcript_equality',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 2000 = 29 OR i % 500 = 3
                                        OR i % 1000 = 37
                                       THEN w ELSE 0 END), 0) AS BIGINT) FROM b)
      UNION ALL SELECT 'container_sr_consistency',
        (SELECT CAST(coalesce(sum(CASE WHEN i % 4000 = 43 THEN w ELSE 0 END), 0)
                AS BIGINT) FROM b)
    ) c
"""


@register("clips_full_validate", _CLIPS_FULL_ORACLE)
def clips_full_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule's COMPLETE pipeline as one driver-checked row set:
    runner.validate(check_audio=True) — fused row-local checks + stats,
    uniqueness shuffle agg, RI anti-join, AND the Arrow-UDF audio/transcript
    invariant pass (real WAV + FLAC body decode, SNR>=30dB, transcript
    equality, container-sr cross-field) — all 10 constraint verdicts matched
    against the planting-rule ground truth (VERDICT r2 #6)."""
    from engine import synth
    from engine.runner import validate

    clips = synth.gen_clips(spark, _FIXTURE_N, partitions=8)
    transcripts = synth.gen_transcripts(spark, _FIXTURE_N, partitions=4)
    res = validate(clips, transcripts, check_audio=True, n_buckets=16)
    return res.verdicts.select(
        F.col("constraint").alias("constraint_name"),
        "violation_count", "rows_scanned", "passed",
    )


@register("checkpoint_resume_verdicts", _CLIPS_SUITE_ORACLE)
def checkpoint_resume_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded checkpoint run (engine/checkpoint.py): verdicts merged from
    per-shard lineage rows — must equal an uninterrupted run, so the same
    planting-rule ground-truth oracle applies."""
    import tempfile

    from engine import synth
    from engine.checkpoint import CheckpointedRunner
    from engine.suite import audio_clip_suite

    clips = synth.gen_clips(spark, _FIXTURE_N, partitions=8)
    tr = synth.gen_transcripts(spark, _FIXTURE_N, partitions=4)
    with tempfile.TemporaryDirectory() as d:
        runner = CheckpointedRunner(spark, f"{d}/ckpt")
        v = runner.run(clips, audio_clip_suite(), ["clip_id"],
                       refs={"transcripts": tr}, run_id="driver", n_shards=4)
        v = v.select(
            F.col("constraint").alias("constraint_name"),
            "violation_count", "rows_scanned", "passed",
        ).orderBy("constraint_name")
        rows = v.collect()
    return spark.createDataFrame(rows, v.schema)


@register(
    "robust_maxabs_scale_events",
    """
    WITH q AS (SELECT quantile_cont(value, 0.5) AS med,
                      quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr,
                      max(abs(value)) AS ma
               FROM events)
    SELECT event_id, round((value - med) / iqr, 6) AS robust_scaled,
           round(value / ma, 6) AS maxabs_scaled
    FROM events, q
    """,
)
def robust_maxabs_scale_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 scaler family: robust (median/IQR) + maxabs in ONE stats pass ->
    broadcast scalars -> map (reference registry anomaly_detection.py:267-275;
    merged into one slot in r3 for the driver's 50-query window, each scaler
    still independently value-checked via its own column). Exact percentile
    here is the ORACLE-PARITY variant (buffers per-group values — test scale
    only); the 10^12-row path derives med/IQR from one t-digest pass
    (engine/sketch.py), whose rank error at q=0.25/0.5/0.75 is oracle-checked
    by tdigest_quantile_accuracy and pytest-pinned."""
    ev = _t(spark, sf_dir, "events")
    q = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("med"),
        (F.percentile("value", F.lit(0.75)) - F.percentile("value", F.lit(0.25))).alias("iqr"),
        F.max(F.abs(F.col("value"))).alias("ma"),
    )
    return ev.crossJoin(F.broadcast(q)).select(
        "event_id",
        F.round((F.col("value") - F.col("med")) / F.col("iqr"), 6).alias("robust_scaled"),
        F.round(F.col("value") / F.col("ma"), 6).alias("maxabs_scaled"),
    )


@register(
    "asof_join_error_to_click",
    """
    SELECT e.event_id, CAST(epoch_ms(c.ts) AS BIGINT) AS click_ts_ms
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def asof_join_error_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY.md §4 'common patterns'):
    for each 'error' event, the user's latest 'click' at-or-before it.
    Implemented as tag-union + last_value over an ordered window — one shuffle
    on user_id, no range-join blowup; equivalent to ASOF LEFT JOIN."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.lit(1).alias("is_click"), F.lit(None).cast("long").alias("event_id")
    )
    errors = ev.filter("event_type = 'error'").select(
        "user_id", "ts", F.lit(0).alias("is_click"), "event_id"
    )
    u = clicks.unionByName(errors)
    # order clicks before errors at identical ts (asof uses e.ts >= c.ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_ts = F.last(F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True).over(w)
    return (
        u.withColumn("click_ts", click_ts)
        .filter("is_click = 0")
        .select(
            "event_id",
            F.unix_millis(F.col("click_ts").cast("timestamp")).alias("click_ts_ms"),
        )
    )


def _simhash_pairs_oracle_sql(
    max_hamming: int = 6, n_bands: int = 8, max_bucket_size: int = 1000
) -> str:
    """Band substrings + hamming distance on the (already oracle-checked)
    simhash signature — plain SQL mirror of dedup.simhash_near_dup_pairs."""
    width = 64 // n_bands
    ham = " + ".join(
        f"(CASE WHEN substr(a.simhash, {j + 1}, 1) != substr(c.simhash, {j + 1}, 1) "
        f"THEN 1 ELSE 0 END)"
        for j in range(64)
    )
    return f"""
    WITH sig AS ({_simhash_oracle_sql()}),
    bands AS (
      SELECT doc_id, simhash, b.band,
             substr(simhash, b.band * {width} + 1, {width}) AS bits
      FROM sig CROSS JOIN (SELECT unnest(range(0, {n_bands})) AS band) b),
    buckets AS (
      SELECT band, bits FROM bands GROUP BY band, bits
      HAVING count(*) > 1 AND count(*) <= {max_bucket_size}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             CAST({ham} AS INTEGER) AS hamming_dist
      FROM bands a
      JOIN buckets USING (band, bits)
      JOIN bands c ON a.band = c.band AND a.bits = c.bits AND a.doc_id < c.doc_id)
    SELECT id_a, id_b, hamming_dist FROM cand WHERE hamming_dist <= {max_hamming}
    """


@register("simhash_near_dup_pairs_documents", _simhash_pairs_oracle_sql())
def simhash_near_dup_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pipeline (signature -> pigeonhole band buckets ->
    hamming verify); n_bands=8 > max_hamming=6 keeps candidate generation
    complete, bucket guard at its production value."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return dedup.simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=6, n_bands=8, max_bucket_size=1000
    )


# NOT @register-ed since r4 (50-slot window): the skew A/B (BENCH.md r4)
# showed Spark's distinct-aggregate planning is already self-salting, so the
# collect_set variant below is the one that carries the driver-visible skew
# evidence; this exactness contract stays pytest-covered
# (test_salted_distinct_count_matches_plain).
def skewed_ndv_salted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible skew evidence (VERDICT r3 #5): an exact
    COUNT(DISTINCT) over a deliberately skewed key — HALF of all rows share
    one 'hot' key, the rest spread over per-user cold keys — computed with
    engine/skew.py's salted two-phase aggregation. Phase 1 groups by
    (key, salt-of-distinct-value) so the hot key's state is split across
    n_salts reducers instead of one; distinct values hash to exactly one
    salt, so summing the disjoint partials is exact. At 10^12 rows a naive
    groupBy would put 50% of the table through a single reducer; the salted
    plan bounds every reducer at hot/n_salts. Oracle: plain
    GROUP BY / COUNT(DISTINCT) in DuckDB."""
    from engine.skew import salted_distinct_count

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), F.col("user_id").cast("string")))
        .alias("skew_key"),
        "event_id",
    )
    return salted_distinct_count(ev, ["skew_key"], "event_id", n_salts=16)


def _twophase_cc_oracle_sql() -> str:
    """Same transitive-closure recursive CTE as the min-label clustering
    oracle — both CC variants must produce identical labelings."""
    return _near_dup_clusters_oracle_sql()


@register("near_dup_clusters_twophase_embeddings", _twophase_cc_oracle_sql())
def near_dup_clusters_twophase_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al. 2014) over the same verified near-dup pair graph as
    ``near_dup_clusters_embeddings`` — the O(log n)-round variant that
    replaces min-label's O(diameter) loop when one boilerplate chain can be
    arbitrarily deep (VERDICT r3 #4). Must match the min-label labeling
    exactly (same recursive-CTE oracle)."""
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    pairs = ann.cosine_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.2, n_planes=8, seed=42, dim=64
    )
    return dedup.near_dup_clusters_twophase(pairs).select(
        F.col("node").alias("vec_id"), "cluster_id"
    )


@register(
    "skewed_user_sets_salted_events",
    """
    WITH k AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'hot'
                  ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS skew_key,
             user_id
      FROM events)
    SELECT skew_key,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(user_id) AS min_user,
           max(user_id) AS max_user
    FROM k GROUP BY skew_key
    """,
)
def skewed_user_sets_salted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_collect_set under a hot key (50% of rows): the aggregation
    class where salting genuinely pays — collect_set partials do NOT shrink
    map-side, so the naive plan funnels the hot key's whole state through
    one reducer (measured 1.55x slower at 20M rows; BENCH.md skew note —
    countDistinct, by contrast, is ALREADY self-salting in Spark's distinct-
    aggregate planning, measured and documented there too). The verified
    output reduces each per-key set to (count, min, max) so the oracle
    compares scalars, not array encodings."""
    from engine.skew import salted_collect_set

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), F.col("user_id").cast("string")))
        .alias("skew_key"),
        "user_id",
    )
    sets = salted_collect_set(ev, ["skew_key"], "user_id", n_salts=16)
    return sets.select(
        "skew_key",
        F.size("values").cast("long").alias("n_users"),
        F.array_min("values").alias("min_user"),
        F.array_max("values").alias("max_user"),
    )
