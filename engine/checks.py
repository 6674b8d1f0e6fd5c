"""Constraint -> Spark-job compiler.

Produces the reference's verdict contract — pass/fail + violation count +
exact violating keys (``anomaly_detection.py:462-465``) — per deterministic
partition bucket and globally, in the minimum number of jobs:

  job 1 (ONE scan of the fact table): every row-local constraint as a fused
         conditional aggregation, plus all per-column stats partials
         (engine/stats.py), grouped by a deterministic bucket id.
  job 2 (only if Unique constraints): groupBy on the pruned key columns.
  job 3 (only if RefIntegrity): LEFT ANTI JOIN against the keys table
         (broadcast if small, shuffle-hash otherwise — AQE decides).

The bucket id is ``pmod(xxhash64(key), n_buckets)`` — a *logical* partition
that is stable across cluster sizes, partition counts, and resume boundaries
(unlike ``spark_partition_id()``), so per-partition verdicts compare equal
between a local[8] run, a local[32] run, and a resumed run. This is the
engine's analog of the reference's deterministic seeding
(``models/utils.py:158-165``).

Violation DataFrames are returned lazily (un-materialized plans); callers
decide whether to count, sample, or persist them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine import stats as stats_mod
from engine.suite import (
    ConstraintSuite,
    Domain,
    NotNull,
    Range,
    RefIntegrity,
    RowInvariant,
    Unique,
)

BUCKET = "bucket_id"


class LazyFrames(dict):
    """dict whose values may be zero-arg DataFrame factories, built on first
    access. Per-constraint violation DataFrames are rarely all consumed, but
    each one costs a driver-side plan analysis to construct — at ~40
    DataFrame ops per suite that analysis chatter was a measurable slice of
    every validate() call (guide §7.3: planning is single-threaded driver
    work). Factories keep SuiteResult.violations' dict contract
    (``[key]``, ``items()``, assignment) while deferring construction."""

    def __getitem__(self, k):
        v = super().__getitem__(k)
        if callable(v) and not hasattr(v, "columns"):
            v = v()
            super().__setitem__(k, v)
        return v

    def items(self):  # materializes — prefer iterating keys and indexing
        return [(k, self[k]) for k in list(super().keys())]

    def values(self):
        return [self[k] for k in list(super().keys())]


def bucket_expr(key_cols: list[str], n_buckets: int) -> Column:
    """Deterministic logical-partition id: pmod(xxhash64(keys), n)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


def suite_passed_expr(suite: ConstraintSuite) -> Column:
    """pass/fail from (constraint, violation_count, rows_scanned) columns:
    NotNull honors its max_null_rate tolerance; everything else needs 0
    violations. Shared by the batch runner AND the checkpoint-resume merge so
    a resumed run's flags provably match an uninterrupted run."""
    rate_entries = []
    for c in suite.of_type(NotNull):
        rate_entries += [F.lit(c.name), F.lit(float(c.max_null_rate))]
    allowed_rate = (
        F.coalesce(F.create_map(*rate_entries)[F.col("constraint")], F.lit(0.0))
        if rate_entries
        else F.lit(0.0)
    )
    return (
        F.col("violation_count") / F.greatest(F.col("rows_scanned"), F.lit(1))
    ) <= allowed_rate


def _violation_expr(c, df: DataFrame) -> Column:
    if isinstance(c, RowInvariant):
        return c.violation_expr_for(df)
    return c.violation_expr()


def row_local_violations_union(
    fact: DataFrame, row_local: list, key_cols: list[str]
) -> DataFrame:
    """ALL row-local violation rows in ONE scan: per row, build an array of
    (constraint, value) structs for the constraints it violates, filter out
    nulls, explode. At 10^12 rows this replaces k per-constraint scans with
    one — violations are rare, so the exploded output is tiny."""
    structs = [
        F.when(
            _violation_expr(c, fact),
            F.struct(
                F.lit(c.name).alias("constraint"),
                (
                    F.col(getattr(c, "column", None)).cast("string")
                    if getattr(c, "column", None)
                    else F.lit(None).cast("string")
                ).alias("offending_value"),
            ),
        )
        for c in row_local
    ]
    hits = F.filter(F.array(*structs), lambda s: s.isNotNull())
    return (
        fact.select(*key_cols, F.col(BUCKET), F.explode(hits).alias("v"))
        .select(*key_cols, "v.constraint", "v.offending_value", BUCKET)
    )


@dataclass
class SuiteResult:
    """Outcome of one suite run."""

    verdicts: DataFrame            # (constraint, violation_count, rows_scanned, passed)
    partition_verdicts: DataFrame  # (bucket_id, constraint, violation_count, rows_scanned, passed)
    violations: dict[str, DataFrame] = field(default_factory=LazyFrames)
    stats: DataFrame | None = None           # (column_name, metric, value)
    bucket_stats: DataFrame | None = None    # wide per-bucket partials (lineage)
    violations_union: DataFrame | None = None  # all row-local violations, one scan
    all_violations: DataFrame | None = None    # every violation source unioned

    def quarantine(self, path: str, mode: str = "overwrite") -> str:
        """Write every violating row to a quarantine table PARTITIONED BY
        constraint — the triage output of a validation run: downstream jobs
        read one constraint's rows with a partition-pruned scan instead of
        refiltering the fact table, and the violating keys survive the run
        for exclusion lists / repair queues. One action (the violation
        sources are already unioned into one plan)."""
        if self.all_violations is None:
            raise ValueError("run the full validate() pass first (all_violations unset)")
        self.all_violations.write.mode(mode).partitionBy("constraint").parquet(path)
        return path


def run_suite(
    df: DataFrame,
    suite: ConstraintSuite,
    key_cols: list[str],
    refs: dict[str, DataFrame] | None = None,
    n_buckets: int = 32,
    stat_columns: list[str] | None = None,
    broadcast_refs: bool = True,
) -> SuiteResult:
    refs = refs or {}
    row_local = suite.row_local()
    uniques = suite.of_type(Unique)
    ris = suite.of_type(RefIntegrity)

    fact = df.withColumn(BUCKET, bucket_expr(key_cols, n_buckets))

    # ---- job 1: fused row-local checks + column stats, one scan -------------
    check_exprs = [
        F.sum(F.when(_violation_expr(c, fact), 1).otherwise(0)).alias(f"__v__{i}")
        for i, c in enumerate(row_local)
    ]
    stat_columns = stat_columns if stat_columns is not None else df.columns
    numeric = stats_mod.numeric_columns(df, stat_columns)
    stat_exprs = stats_mod.bucket_stat_exprs(df, stat_columns)
    # persist the per-bucket partials: they are tiny (n_buckets rows) but feed
    # three consumers (partition verdicts, global stats, bucket_rows joins) —
    # without this the full fact-table scan re-runs once per consumer
    bucket_wide = fact.groupBy(BUCKET).agg(*stat_exprs, *check_exprs).persist()

    # long-format per-bucket verdicts for the row-local constraints
    verdict_structs = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col(f"__v__{i}").cast("long").alias("violation_count"),
        )
        for i, c in enumerate(row_local)
    ]
    rl_bucket_verdicts = (
        bucket_wide.select(
            BUCKET,
            F.col("__rows").cast("long").alias("rows_scanned"),
            F.explode(F.array(*verdict_structs)).alias("v"),
        ).select(BUCKET, "v.constraint", "v.violation_count", "rows_scanned")
        if row_local
        else None
    )

    # global stats derived from the SAME scan's partials
    if stat_columns:
        global_wide = stats_mod.merge_bucket_stats(
            bucket_wide.drop(*[f"__v__{i}" for i in range(len(row_local))], BUCKET),
            stat_columns,
            numeric,
        )
        stats_long = stats_mod.finalize_stats(global_wide, stat_columns, numeric)
    else:
        stats_long = None

    bucket_rows = bucket_wide.select(
        BUCKET, F.col("__rows").cast("long").alias("rows_scanned")
    )

    parts: list[DataFrame] = []
    if rl_bucket_verdicts is not None:
        parts.append(rl_bucket_verdicts)

    violations: dict[str, DataFrame] = LazyFrames()

    # violation row DataFrames for row-local constraints — stored as
    # factories (LazyFrames) so their plan analysis only runs if a caller
    # actually asks for that constraint's rows
    for c in row_local:
        def _mk(c=c):
            vexpr = _violation_expr(c, fact)
            cols = [F.col(k) for k in key_cols] + [F.lit(c.name).alias("constraint")]
            col_attr = getattr(c, "column", None)
            if col_attr:
                cols.append(F.col(col_attr).cast("string").alias("offending_value"))
            else:
                cols.append(F.lit(None).cast("string").alias("offending_value"))
            return fact.filter(vexpr).select(*cols, F.col(BUCKET))

        violations[c.name] = _mk

    # ---- job 2: uniqueness (pruned-column shuffle agg) ----------------------
    for c in uniques:
        keys = list(c.columns)
        nn = F.lit(True)
        for k in keys:
            nn = nn & F.col(k).isNotNull()
        dup = (
            fact.filter(nn)
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("key_count"),
                # min, not first: when the Unique columns differ from key_cols
                # a group's rows can carry different bucket_ids and first() is
                # nondeterministic across cluster sizes / resumes
                F.min(BUCKET).alias(BUCKET),
            )
            .filter(F.col("key_count") > 1)
            # tiny output feeding TWO actions (verdicts + violation rows):
            # persist so the second action reuses it instead of re-running
            # the full-table shuffle agg (same pattern as bucket_wide)
            .persist()
        )
        violations[c.name] = dup.select(
            *keys,
            F.lit(c.name).alias("constraint"),
            F.col("key_count").cast("string").alias("offending_value"),
            F.col(BUCKET),
        )
        # violation_count = excess rows (rows that would be dropped by dedup)
        per_bucket = dup.groupBy(BUCKET).agg(
            F.sum(F.col("key_count") - 1).cast("long").alias("violation_count")
        )
        parts.append(
            bucket_rows.join(per_bucket, BUCKET, "left")
            .select(
                BUCKET,
                F.lit(c.name).alias("constraint"),
                F.coalesce("violation_count", F.lit(0)).cast("long").alias("violation_count"),
                "rows_scanned",
            )
        )

    # ---- job 3: referential integrity (anti-join) ---------------------------
    for c in ris:
        ref = refs[c.ref_name]
        ref_keys = ref.select(
            *[F.col(rc).alias(fc) for fc, rc in zip(c.columns, c.ref_columns)]
        ).dropDuplicates(list(c.columns))
        if broadcast_refs:
            ref_keys = F.broadcast(ref_keys)
        nn = F.lit(True)
        for k in c.columns:
            nn = nn & F.col(k).isNotNull()
        # tiny output feeding two actions — persist like `dup` above so the
        # anti-join's full-table probe runs once, not once per action
        dangling = (
            fact.filter(nn)
            .join(ref_keys, on=list(c.columns), how="left_anti")
            .persist()
        )
        violations[c.name] = dangling.select(
            *key_cols,
            F.lit(c.name).alias("constraint"),
            F.col(c.columns[0]).cast("string").alias("offending_value"),
            F.col(BUCKET),
        )
        per_bucket = dangling.groupBy(BUCKET).agg(
            F.count(F.lit(1)).cast("long").alias("violation_count")
        )
        parts.append(
            bucket_rows.join(per_bucket, BUCKET, "left")
            .select(
                BUCKET,
                F.lit(c.name).alias("constraint"),
                F.coalesce("violation_count", F.lit(0)).cast("long").alias("violation_count"),
                "rows_scanned",
            )
        )

    partition_verdicts = parts[0]
    for p in parts[1:]:
        partition_verdicts = partition_verdicts.unionByName(p)

    passed_expr = suite_passed_expr(suite)
    globals_df = (
        partition_verdicts.groupBy("constraint")
        .agg(
            F.sum("violation_count").cast("long").alias("violation_count"),
            F.sum("rows_scanned").cast("long").alias("rows_scanned"),
        )
        .withColumn("passed", passed_expr)
    )
    partition_verdicts = partition_verdicts.withColumn("passed", passed_expr)

    return SuiteResult(
        verdicts=globals_df,
        partition_verdicts=partition_verdicts,
        violations=violations,
        stats=stats_long,
        bucket_stats=bucket_wide,
        violations_union=(
            row_local_violations_union(fact, row_local, key_cols) if row_local else None
        ),
    )
