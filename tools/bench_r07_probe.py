"""r7 optimization probes — the measurement harness behind OPTIMIZATION_r07.md.

Three sub-commands (run EXCLUSIVELY — concurrent load corrupts numbers;
check /proc/loadavg first, this box carries ±40% co-tenant noise):

  queries [name ...]   3 invocations per query at $SF (default sf1.0),
                       bench-methodology timing (build + count per rep).
  suite                instrumented validate() over the 250k bench fixture:
                       per-action split (build / verdicts / violations /
                       stats), 1 cold + 2 steady reps, load-annotated.
  noop NAME            noop-sink isolation (guide §1.4) for one query.

All timings print the first loadavg field so a contaminated sample is
visible in the artifact instead of silently poisoning an A/B.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _load() -> str:
    return open("/proc/loadavg").read().split()[0]


def time_queries(names: list[str]) -> None:
    from engine import queries as qmod
    from engine.session import get_spark

    spark = get_spark("r7-probe", cores=CPUS, shuffle_partitions=CPUS)
    for name in names:
        fn = qmod.Q.get(name) or getattr(qmod, name)
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF).count()
            ts.append(round(time.time() - t0, 3))
        print(f"{name:45s} {ts} (load {_load()})")
    spark.stop()


def noop(name: str) -> None:
    from engine import queries as qmod
    from engine.session import get_spark

    spark = get_spark("r7-noop", cores=CPUS, shuffle_partitions=CPUS)
    fn = qmod.Q.get(name) or getattr(qmod, name)
    for rep in range(3):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"{name} noop rep{rep}: {time.time() - t0:.3f}s (load {_load()})")
    spark.stop()


def suite() -> None:
    from pyspark.sql import functions as F

    from engine.runner import validate
    from engine.session import get_spark

    spark = get_spark("r7-suite-probe", cores=CPUS, shuffle_partitions=CPUS)
    clips = spark.read.parquet(".bench_cache/clips_r6c_250000.parquet")
    tr = spark.read.parquet(".bench_cache/transcripts_r6c_250000.parquet")
    clips.count()
    clips.select(F.sum(F.length("bytes"))).collect()
    tr.count()
    from engine import audio as _audio

    def _warm(it):
        _ = _audio.SNR_DB_MIN
        for pdf in it:
            yield pdf

    spark.range(0, CPUS * 4, 1, CPUS).mapInPandas(_warm, "id long").count()
    for rep in range(3):
        load = _load()
        t0 = time.time()
        res = validate(clips, tr, check_audio=True, n_buckets=64)
        t1 = time.time()
        _ = {r["constraint"]: r["violation_count"] for r in res.verdicts.collect()}
        t2 = time.time()
        viol = res.all_violations.count()
        t3 = time.time()
        res.stats.count()
        t4 = time.time()
        print(
            f"rep{rep} (load {load}): build={t1 - t0:.2f} verdicts={t2 - t1:.2f} "
            f"violations={t3 - t2:.2f} stats={t4 - t3:.2f} total={t4 - t0:.2f} "
            f"viol_rows={viol}"
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "suite":
        suite()
    elif cmd == "noop":
        noop(sys.argv[2])
    else:
        names = sys.argv[2:] or [
            "winnow_fingerprints_documents", "minhash_lsh_pairs",
            "embedding_near_dup_pairs", "ewma_residual_events",
            "simhash_documents", "jaccard_pairs_lsh",
            "simhash_near_dup_pairs_documents",
            "near_dup_clusters_twophase_embeddings",
        ]
        time_queries(names)
