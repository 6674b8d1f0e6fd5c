"""Benchmark harness (driver contract).

Headline metric: validated clips/sec for the FULL constraint suite (fused
row-local checks + stats, uniqueness, referential integrity, audio-decode SNR
+ transcript-equality Arrow UDFs) over a deterministic synthetic clips table —
the BASELINE.json north-star metric — plus wall-times of representative
driver-contract queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <suite secs>, "unit": "sec",
   "queries": {name: secs, ...}, "sf": ..., "clips_per_sec": ..., ...}

Honors SPARK_GRAFT_CPUS (local[N]) and SPARK_GRAFT_SF_DIR. The clips fixture
(default 100k rows) is generated once into .bench_cache/ and reused.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 250k x ~24KB clips: large enough that the suite's fixed costs (~18s of
# session/JIT/scheduling) don't dominate the throughput number
N_CLIPS = int(os.environ.get("TSAD_BENCH_CLIPS", "250000"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
# bump when engine/synth.py changes fixture BYTES: cache files are keyed by
# (tag, n) so a stale fixture can never be silently reused across rounds
FIXTURE_TAG = "r6c"

BENCH_QUERIES = [
    "suite_verdicts_lineitem",
    "q1_pricing_summary",
    "stats_lineitem",
    "quantile_threshold_events",
    "rolling_zscore_events",
    "window_lag_delta",
    "topk_users_by_value",
    "minhash_lsh_pairs",
    "simhash_documents",
    "ann_cosine_topk",
    "winnow_fingerprints_documents",
    "ewma_residual_events",
    "train_split_stats",
    "embedding_near_dup_pairs",
    "kde_threshold_pipeline",
]


def ensure_clips(spark):
    from engine import synth

    clips_path = f"{CACHE}/clips_{FIXTURE_TAG}_{N_CLIPS}.parquet"
    tr_path = f"{CACHE}/transcripts_{FIXTURE_TAG}_{N_CLIPS}.parquet"
    if not os.path.exists(clips_path):
        synth.gen_clips(spark, N_CLIPS, partitions=max(CPUS * 4, 32)).write.mode(
            "overwrite"
        ).parquet(clips_path)
    if not os.path.exists(tr_path):
        synth.gen_transcripts(spark, N_CLIPS, partitions=max(CPUS, 8)).write.mode(
            "overwrite"
        ).parquet(tr_path)
    return spark.read.parquet(clips_path), spark.read.parquet(tr_path)


def run_suite_bench(spark) -> tuple[float, int, dict]:
    from pyspark.sql import functions as F

    from engine.runner import validate

    clips, transcripts = ensure_clips(spark)
    n_rows = clips.count()
    # warm the page cache (full read incl. the binary column) so the timed
    # pass measures the engine, not cold-disk variance; cluster-scale cold-read
    # behavior is covered by the scaling protocol instead
    clips.select(F.sum(F.length("bytes"))).collect()
    transcripts.count()
    # warm the Python workers (first UDF stage pays ~1s/worker of imports —
    # irrelevant for long-running cluster jobs, so excluded from the timing)
    from engine import audio as _audio

    def _warm(it):
        _ = _audio.SNR_DB_MIN  # force the engine import in each worker
        for pdf in it:
            yield pdf

    spark.range(0, CPUS * 4, 1, CPUS).mapInPandas(_warm, "id long").count()

    # THREE runs: the first pays JIT/codegen (a long-running cluster job
    # amortizes it — excluded, as pinned in r5), then TWO steady-state
    # samples are BOTH reported (VERDICT r5 #4: on a ±40% shared box a
    # single sample per round misleads; value = best, value_samples = both
    # so the driver artifact carries its own noise band)
    samples: list[float] = []
    for _ in range(3):
        t0 = time.time()
        res = validate(clips, transcripts, check_audio=True, n_buckets=64)
        verdicts = {r["constraint"]: r["violation_count"] for r in res.verdicts.collect()}
        # violation rows are part of the contract: every source unioned = 1 job
        viol_rows = res.all_violations.count()
        stats_rows = res.stats.count()
        samples.append(time.time() - t0)
        spark.catalog.clearCache()  # drop suite caches between runs / timings
    steady = samples[1:]
    return min(steady), n_rows, {
        "suite_constraints": len(verdicts),
        "violation_rows": viol_rows,
        "stats_rows": stats_rows,
        "value_samples": [round(s, 3) for s in steady],
        "value_cold": round(samples[0], 3),
    }


def main() -> None:
    spark = get_spark("tsad-bench", cores=CPUS, shuffle_partitions=CPUS)
    from engine import queries as qmod

    suite_secs, n_rows, extras = run_suite_bench(spark)

    qtimes = {}
    qtimes_cold = {}
    for name in BENCH_QUERIES:
        # simhash_documents gave its driver slot to resample_clips_16k (r6)
        # but stays in the bench list so the per-query time series remains
        # comparable across rounds — fall back to the module function
        fn = qmod.Q[name] if name in qmod.Q else getattr(qmod, name)
        # convention (pinned r5, VERDICT r4 #3): each query runs twice and
        # BOTH numbers are reported — "queries_cold" is the first invocation
        # (pays whole-stage-codegen JIT: measured 2.4x on winnow, 12.6s cold
        # vs 5.1-5.5s warm) and "queries" is the steady-state best-of-2,
        # which a long-running cluster job amortizes to and which matches
        # the r3/r4 headline tables
        best = None
        for rep in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            dt = time.time() - t0
            if rep == 0:
                qtimes_cold[name] = round(dt, 3)
            best = dt if best is None else min(best, dt)
        qtimes[name] = round(best, 3)

    out = {
        "metric": "full_constraint_suite_secs (headline: validated clips/sec below)",
        "value": round(suite_secs, 3),
        "unit": "sec",
        "queries": qtimes,
        "queries_cold": qtimes_cold,
        "sf": SF_DIR,
        "clips": n_rows,
        "clips_per_sec": round(n_rows / suite_secs, 1),
        "cpus": CPUS,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
