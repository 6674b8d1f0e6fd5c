"""A/B: naive vs engine/skew.py salted two-phase aggregation on a
deliberately skewed key (one key = 50% of rows, all values distinct — the
worst case for a single per-key reducer). Reproduces BOTH BENCH.md r4 skew
results:

  * collect_set (per-key state does not shrink map-side): salting WINS
    (measured 1.55x at 20M rows).
  * countDistinct: naive WINS — Spark's distinct-aggregate planning already
    shuffles on (key, value) before re-aggregating per key, i.e. it is
    self-salting; manual salting just adds a layer.

Usage: python tools/bench_skew.py [n_rows]   (default 20_000_000)
Prints one JSON line with all four timings.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from engine.session import get_spark  # noqa: E402
from engine.skew import salted_collect_set, salted_distinct_count  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("skew-bench", cores=32, shuffle_partitions=32)
    # hot key on even ids (50% of rows), 1024 cold keys on the rest;
    # md5-string values, all distinct -> per-key distinct state is maximal
    df = spark.range(0, n, 1, 64).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 1024).cast("string")))
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    df = df.persist()
    df.count()

    def timed(fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    naive_cs = timed(
        lambda: df.groupBy("k").agg(F.size(F.collect_set("v")).alias("n")).collect()
    )
    salted_cs = timed(
        lambda: salted_collect_set(df, ["k"], "v", n_salts=16)
        .select("k", F.size("values"))
        .collect()
    )
    naive_ndv = timed(
        lambda: df.groupBy("k").agg(F.countDistinct("v").alias("ndv")).collect()
    )
    salted_ndv = timed(
        lambda: salted_distinct_count(df, ["k"], "v", n_salts=16).collect()
    )
    print(json.dumps({
        "rows": n,
        "collect_set": {"naive_secs": round(naive_cs, 2),
                        "salted_secs": round(salted_cs, 2),
                        "salted_speedup": round(naive_cs / salted_cs, 2)},
        "count_distinct": {"naive_secs": round(naive_ndv, 2),
                           "salted_secs": round(salted_ndv, 2),
                           "salted_speedup": round(naive_ndv / salted_ndv, 2)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
