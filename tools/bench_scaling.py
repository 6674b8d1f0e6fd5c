"""Two-parallelism scaling evidence (BASELINE.md protocol).

Runs the identical full-constraint-suite job at local[8] and local[32] on the
SAME cached clips fixture (fresh JVM per level, page cache + Python workers
warmed, best of ``--reps`` timed runs per level) and reports throughput at
both plus scaling efficiency = (T_8 / T_32) / 4.

Usage: python tools/bench_scaling.py [--clips 50000] [--reps 2]
Appends a Measured section to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from engine.session import get_spark
from pyspark.sql import functions as F
from engine.runner import validate

cores, n_clips, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
from bench import FIXTURE_TAG  # single source of truth for fixture versioning
clips = spark.read.parquet(f"/root/repo/.bench_cache/clips_{FIXTURE_TAG}_{n_clips}.parquet")
tr = spark.read.parquet(f"/root/repo/.bench_cache/transcripts_{FIXTURE_TAG}_{n_clips}.parquet")
n = clips.count()
clips.select(F.sum(F.length("bytes"))).collect()
tr.count()

from engine import audio as _audio
def _warm(it):
    _ = _audio.SNR_DB_MIN
    for pdf in it:
        yield pdf
spark.range(0, cores * 4, 1, cores).mapInPandas(_warm, "id long").count()

best = None
for _ in range(reps):
    t0 = time.time()
    res = validate(clips, tr, check_audio=True, n_buckets=64)
    res.verdicts.collect()
    res.all_violations.count()
    res.stats.count()
    secs = time.time() - t0
    best = secs if best is None else min(best, secs)
    spark.catalog.clearCache()
print(json.dumps({"cores": cores, "secs": best, "rows": n,
                  "clips_per_sec": n / best}))
"""


def run_level(cores: int, n_clips: int, reps: int) -> dict:
    # pin the whole process tree (JVM task threads AND python workers) to
    # `cores` physical cores — without this, local[8]'s python workers spill
    # onto the other 24 cores and the 8-core baseline is inflated
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", CHILD,
           str(cores), str(n_clips), str(reps)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=50000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n", type=int, default=8, help="small level (large = 4x)")
    args = ap.parse_args()

    r8 = run_level(args.n, args.clips, args.reps)
    r32 = run_level(args.n * 4, args.clips, args.reps)
    eff = (r8["secs"] / r32["secs"]) / 4.0
    report = {
        "local8": r8, "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling evidence ({stamp})\n\n"
            f"Full constraint suite (fused checks + stats + dedup + RI + audio\n"
            f"Arrow-UDF invariants), {r8['rows']} clips, identical input/conf, fresh\n"
            f"JVM per level, process tree CPU-pinned to its core count,\n"
            f"caches + Python workers warmed, best of {args.reps} runs:\n\n"
            f"| parallelism | secs | clips/sec |\n|---|---|---|\n"
            f"| local[{args.n}] | {r8['secs']:.1f} | {r8['clips_per_sec']:.0f} |\n"
            f"| local[{args.n * 4}] | {r32['secs']:.1f} | {r32['clips_per_sec']:.0f} |\n\n"
            f"Scaling efficiency (T_N/T_4N)/4 = **{eff:.3f}** (target >= 0.8).\n"
        )


if __name__ == "__main__":
    main()
