"""A/B: naive groupBy+countDistinct vs engine/skew.py salted two-phase on a
deliberately skewed key (one key = 50% of rows, all values distinct — the
worst case for a single per-key reducer).

Usage: python tools/bench_skew.py [n_rows]   (default 20_000_000)
Prints one JSON line with both timings; used for the BENCH.md skew note.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from engine.session import get_spark  # noqa: E402
from engine.skew import salted_distinct_count  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("skew-bench", cores=32, shuffle_partitions=32)
    # hot key on even ids (50% of rows), 1024 cold keys on the rest;
    # event ids are all-distinct -> per-key distinct state is maximal
    df = spark.range(0, n, 1, 64).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 1024).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    df = df.persist()
    df.count()

    def timed(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    naive = timed(
        lambda: df.groupBy("k").agg(F.countDistinct("v").alias("ndv")).collect()
    )
    salted = timed(
        lambda: salted_distinct_count(df, ["k"], "v", n_salts=16).collect()
    )
    print(json.dumps({"rows": n, "naive_secs": round(naive, 2),
                      "salted_secs": round(salted, 2),
                      "speedup": round(naive / salted, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
