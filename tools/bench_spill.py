"""Memory-pressure / spill evidence (VERDICT r4 #5).

Runs the full constraint suite on the large cached fixture TWICE in fresh
JVMs — once at the normal 16g driver heap, once memory-constrained (heap
cut, shuffle partitions at 2x cores) — asserts the verdicts are IDENTICAL,
and records per-stage spill metrics from the Spark status REST API. This is
the 100x-scale failure mode (executors smaller than the data) that the
roomy 128 GiB box never exercises on its own.

Usage: python tools/bench_spill.py [--clips 1000000] [--mem 4g] [--cores 32]
Prints one JSON report to stdout (copy the findings into BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CHILD = r"""
import json, sys, time, urllib.request
sys.path.insert(0, "/root/repo")
mem, cores, n_clips = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
import os
os.environ["TSAD_DRIVER_MEM"] = mem
from engine.session import get_spark
from pyspark.sql import functions as F
from engine.runner import validate

spark = get_spark(
    f"spill-{mem}", cores=cores, shuffle_partitions=cores * 2,
    extra_conf={"spark.ui.enabled": "true"},
)
from bench import FIXTURE_TAG
base = f"/root/repo/.bench_cache"
clips = spark.read.parquet(f"{base}/clips_{FIXTURE_TAG}_{n_clips}.parquet")
tr = spark.read.parquet(f"{base}/transcripts_{FIXTURE_TAG}_{n_clips}.parquet")
n = clips.count()

t0 = time.time()
res = validate(clips, tr, check_audio=True, n_buckets=64)
verdicts = sorted(
    (r["constraint"], int(r["violation_count"]), int(r["rows_scanned"]))
    for r in res.verdicts.collect()
)
viol = res.all_violations.count()
secs = time.time() - t0

ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
spilled = [
    {
        "stage": s["stageId"], "name": s["name"].split("\n")[0][:60],
        "memSpill": s["memoryBytesSpilled"], "diskSpill": s["diskBytesSpilled"],
        "shuffleWrite": s.get("shuffleWriteBytes", 0),
    }
    for s in stages
    if s["memoryBytesSpilled"] or s["diskBytesSpilled"]
]
tot_mem = sum(s["memoryBytesSpilled"] for s in stages)
tot_disk = sum(s["diskBytesSpilled"] for s in stages)
print("RESULT" + json.dumps({
    "mem": mem, "cores": cores, "rows": n, "secs": round(secs, 1),
    "verdicts": verdicts, "violation_rows": viol,
    "mem_spill_bytes": tot_mem, "disk_spill_bytes": tot_disk,
    "spilled_stages": spilled[:10],
}))
"""


def run(mem: str, cores: int, n_clips: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, mem, str(cores), str(n_clips)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise SystemExit(
        f"child failed (mem={mem}):\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=1_000_000)
    ap.add_argument("--mem", default="4g")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    normal = run("16g", args.cores, args.clips)
    tight = run(args.mem, args.cores, args.clips)
    identical = (
        normal["verdicts"] == tight["verdicts"]
        and normal["violation_rows"] == tight["violation_rows"]
    )
    print(json.dumps({
        "identical_verdicts": identical,
        "normal": {k: normal[k] for k in
                   ("mem", "secs", "mem_spill_bytes", "disk_spill_bytes")},
        "constrained": {k: tight[k] for k in
                        ("mem", "secs", "mem_spill_bytes", "disk_spill_bytes")},
        "constrained_spilled_stages": tight["spilled_stages"],
    }, indent=2))
    if not identical:
        raise SystemExit("VERDICT MISMATCH under memory pressure")


if __name__ == "__main__":
    main()
