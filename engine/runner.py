"""validate() orchestration + spark-submit CLI entry.

One call = the full constraint-suite pass over a clips table:

  1. fused row-local checks + column stats (one scan)      engine/checks.py
  2. uniqueness shuffle agg                                engine/checks.py
  3. referential-integrity anti-join                       engine/checks.py
  4. audio/transcript Arrow-UDF invariant pass             engine/audio.py

returning (verdicts, partition_verdicts, violations, stats) — the reference's
pass/fail + violation-positions contract (anomaly_detection.py:462-465)
generalized. Checkpoint-resumable variant lives in engine/checkpoint.py.

CLI:  spark-submit --py-files engine.zip -m engine.runner <clips_path> <transcripts_path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import audio as audio_mod
from engine import checks as checks_mod
from engine.suite import ConstraintSuite, NotNull, audio_clip_suite


def validate(
    clips: DataFrame,
    transcripts: DataFrame | None = None,
    suite: ConstraintSuite | None = None,
    n_buckets: int = 32,
    check_audio: bool = False,
    stat_columns: list[str] | None = None,
) -> checks_mod.SuiteResult:
    if check_audio and transcripts is None:
        # silently skipping the requested audio pass would report clean
        # verdicts the caller never computed — same guard as the streaming
        # entry point (streaming.py; ADVICE r5: fixed in only one of two)
        raise ValueError("check_audio=True requires a transcripts DataFrame")
    suite = suite or audio_clip_suite()
    refs = {"transcripts": transcripts} if transcripts is not None else {}
    stat_columns = stat_columns or [c for c in clips.columns if c != "bytes"]

    # when the audio pass runs, it is the ONLY pass that decompresses the
    # binary column: bytes-null checks are folded into it instead of forcing
    # the fused stats scan to read bytes too
    fused_suite = suite
    bytes_nn = [
        c for c in suite.of_type(NotNull) if getattr(c, "column", None) == "bytes"
    ] if (check_audio and transcripts is not None) else []
    if bytes_nn:
        fused_suite = ConstraintSuite(
            [c for c in suite.constraints if c not in bytes_nn]
        )

    result = checks_mod.run_suite(
        clips,
        fused_suite,
        key_cols=["clip_id"],
        refs=refs,
        n_buckets=n_buckets,
        stat_columns=stat_columns,
    )

    if check_audio and transcripts is not None:
        inv = audio_mod.audio_invariants(clips, transcripts).cache()
        audio_checks = [
            ("pcm_ok", "pcm_snr_invariant"),
            ("transcript_ok", "transcript_equality"),
            ("meta_sr_ok", "container_sr_consistency"),
        ]
        if bytes_nn:
            inv = inv.withColumn("bytes_ok", ~F.col("bytes_null"))
            audio_checks.append(("bytes_ok", bytes_nn[0].name))
        # per-flag violation ROWS stay one lazy filter each; the per-bucket
        # verdict counts for ALL flags come from ONE groupBy over the cached
        # invariant table (r7: was one aggregate job + two union analyses per
        # flag — 4x the scan of the cache and 4x the driver plan work)
        for flag, name in audio_checks:
            bad = inv.filter(~F.col(flag))
            result.violations[name] = bad.select(
                "clip_id",
                F.lit(name).alias("constraint"),
                F.coalesce(F.col("decode_error"), F.col("snr_db").cast("string")).alias(
                    "offending_value"
                ),
                F.col("bucket_id"),
            )
        count_aggs = [
            F.sum(F.when(~F.col(flag), 1).otherwise(0)).cast("long").alias(f"__c_{flag}")
            for flag, _ in audio_checks
        ] + [F.count(F.lit(1)).cast("long").alias("__rows")]
        pb_wide = inv.groupBy("bucket_id").agg(*count_aggs)
        vstructs = [
            F.struct(
                F.lit(name).alias("constraint"),
                F.col(f"__c_{flag}").alias("violation_count"),
            )
            for flag, name in audio_checks
        ]
        per_bucket = pb_wide.select(
            "bucket_id",
            F.col("__rows").alias("rows_scanned"),
            F.explode(F.array(*vstructs)).alias("v"),
        ).select(
            "bucket_id", "v.constraint", "v.violation_count", "rows_scanned"
        ).withColumn("passed", F.col("violation_count") == 0)
        result.partition_verdicts = result.partition_verdicts.unionByName(per_bucket)
        result.verdicts = result.verdicts.unionByName(
            per_bucket.groupBy("constraint").agg(
                F.sum("violation_count").cast("long").alias("violation_count"),
                F.sum("rows_scanned").cast("long").alias("rows_scanned"),
            ).withColumn("passed", F.col("violation_count") == 0)
        )

    # one union of every violation source -> materializing the full violation
    # set is ONE action (vs one job per constraint). Row-local constraints
    # come from the fused violations_union scan; per-constraint DFs for them
    # stay available in result.violations but are excluded here (double count).
    row_local_names = {c.name for c in fused_suite.row_local()}
    union_parts = []
    if result.violations_union is not None:
        union_parts.append(
            result.violations_union.select(
                "clip_id", "constraint", "offending_value", checks_mod.BUCKET
            )
        )
    for name in list(result.violations.keys()):
        if name in row_local_names:
            # row-local rows come from the fused violations_union scan; skip
            # WITHOUT touching the entry so its plan is never even built
            # (checks.LazyFrames defers construction to first access)
            continue
        vdf = result.violations[name]
        union_parts.append(
            vdf.select("clip_id", "constraint", "offending_value", checks_mod.BUCKET)
        )
    if union_parts:
        all_v = union_parts[0]
        for p in union_parts[1:]:
            all_v = all_v.unionByName(p)
        result.all_violations = all_v
    return result


def main() -> None:  # pragma: no cover - CLI shim
    """spark-submit entry.

    Plain run:      -m engine.runner CLIPS.parquet TRANSCRIPTS.parquet
    Resumable run:  ... --checkpoint DIR [--run-id ID] [--shards N]
                        [--shard-storage DIR]   (re-running with the same
                        run-id skips completed shards — Iceberg-shaped
                        snapshot lineage in DIR/metadata/)
    Drift:          ... --drift-fit BASELINE_DIR   (fit + save baseline)
                    ... --drift-check BASELINE_DIR (KS/PSI vs saved baseline)
    """
    import argparse

    from engine.session import get_spark

    ap = argparse.ArgumentParser(prog="engine.runner")
    ap.add_argument("clips")
    ap.add_argument("transcripts")
    ap.add_argument("--checkpoint", help="checkpoint-table dir (resumable shard run)")
    ap.add_argument("--run-id", default="cli")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--shard-storage", help="materialize fact partitioned by shard hash")
    ap.add_argument("--stat-columns",
                    help="comma-separated columns to record as per-shard stat lineage")
    ap.add_argument("--drift-fit", help="fit + save a baseline snapshot to this dir")
    ap.add_argument("--drift-check", help="KS/PSI drift check vs a saved baseline")
    args = ap.parse_args()

    spark = SparkSession.getActiveSession() or get_spark("tsad-validate")
    clips = spark.read.parquet(args.clips)
    transcripts = spark.read.parquet(args.transcripts)

    if args.drift_fit or args.drift_check:
        from engine import drift as drift_mod

        num_cols = ["sr_hz", "dur_ms"]
        if args.drift_fit:
            b = drift_mod.fit_baseline(clips, num_cols, ["codec"])
            drift_mod.save_baseline(spark, b, args.drift_fit)
            print(f"baseline saved: {args.drift_fit} (snapshot {b.snapshot_id})")
        if args.drift_check:
            b = drift_mod.load_baseline(spark, args.drift_check)
            rep = drift_mod.drift_check(clips, b)
            print(rep.to_string(index=False))
        return

    if args.checkpoint:
        from engine.checkpoint import CheckpointedRunner
        from engine.suite import audio_clip_suite

        runner = CheckpointedRunner(spark, args.checkpoint)
        suite = audio_clip_suite()
        stat_cols = args.stat_columns.split(",") if args.stat_columns else None
        v = runner.run(
            clips, suite, ["clip_id"], refs={"transcripts": transcripts},
            run_id=args.run_id, n_shards=args.shards,
            shard_storage_path=args.shard_storage, stat_columns=stat_cols,
        )
        v.orderBy("constraint").show(100, truncate=False)
        runner.lineage(args.run_id).show(100, truncate=False)
        if stat_cols:
            runner.stats(args.run_id).orderBy("column_name", "metric").show(
                100, truncate=False
            )
        return

    res = validate(clips, transcripts, check_audio=True)
    res.verdicts.orderBy("constraint").show(100, truncate=False)


if __name__ == "__main__":  # pragma: no cover
    main()
