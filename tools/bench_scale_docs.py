"""Rows-vs-seconds scale sample for the hot text/dedup/ANN queries
(VERDICT r5 #6): run winnowing, MinHash+LSH, and embedding-cosine near-dup
at 1x (sf0.1: 5k docs / 2k vectors) and 10x, and show cost grows ~linearly
in ROWS, not pairs.

The 10x corpus is built so the PAIR structure cannot grow superlinearly by
construction artifacts: copy k of each document suffixes every word with
"~k" (disjoint shingle/vocab spaces across copies -> no cross-copy
candidates), and the 10x embedding table draws fresh seeded unit vectors
(uniform on the sphere -> near-dup pairs stay sparse). A naive union of 10
verbatim copies would instead measure the all-duplicates adversarial case
— real 100 TB corpora are mostly-distinct, which is the regime this
evidences.

Usage: python tools/bench_scale_docs.py [--sf /root/testdata/sf0.1]
Prints one JSON line: {query: {"rows_1x": ..., "secs_1x": ..., ...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache")


def ensure_10x(spark, sf_dir: str):
    docs_path = f"{CACHE}/docs10x.parquet"
    emb_path = f"{CACHE}/emb10x.parquet"
    if not os.path.exists(docs_path):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        copies = spark.range(10).select(F.col("id").alias("k"))
        big = (
            docs.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("k") * (10 * n)).alias("doc_id"),
                # per-copy word suffix => disjoint shingle spaces: pair
                # candidates cannot cross copies
                F.when(F.col("k") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.regexp_replace("text", r"(\S+)", r"$1~"),
                        F.lit(""),
                    )
                ).alias("text0"),
                "lang", "source", "n_chars", "k",
            )
            .withColumn(
                "text",
                F.when(F.col("k") == 0, F.col("text0")).otherwise(
                    F.regexp_replace("text0", "~", F.concat(F.lit("~"), F.col("k")))
                ),
            )
            .drop("text0", "k")
        )
        big.repartition(32).write.mode("overwrite").parquet(docs_path)
    if not os.path.exists(emb_path):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        dim = len(emb.select("embedding").first()[0])
        fresh = (
            spark.range(9 * n)
            .select(
                (F.col("id") + n).alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    # seeded uniform in [-1,1) from (vec_id, j): xxhash64
                    # folded to [0,1) — deterministic, no driver state
                    lambda j: (
                        F.pmod(F.xxhash64(F.col("id"), j), F.lit(1 << 20))
                        / F.lit(float(1 << 19)) - 1.0
                    ).cast("float"),
                ).alias("embedding"),
                F.lit(0).alias("label"),
            )
        )
        emb.select("vec_id", "embedding", "label").unionByName(fresh) \
            .repartition(32).write.mode("overwrite").parquet(emb_path)
    return spark.read.parquet(docs_path), spark.read.parquet(emb_path)


def timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    spark = get_spark("scale-docs", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    from engine import ann, dedup, text

    docs1 = spark.read.parquet(f"{args.sf}/documents.parquet").cache()
    emb1 = spark.read.parquet(f"{args.sf}/embeddings.parquet").cache()
    docs10, emb10 = ensure_10x(spark, args.sf)
    docs10 = docs10.cache()
    emb10 = emb10.cache()
    n_d1, n_d10 = docs1.count(), docs10.count()
    n_e1, n_e10 = emb1.count(), emb10.count()

    runs = {
        "winnow_fingerprints": lambda d: lambda: text.winnow_fingerprints(
            d, "text", "doc_id").count(),
        "minhash_lsh_pairs": lambda d: lambda: dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(d, "text", "doc_id"), "doc_id").count(),
        "embedding_near_dup": None,  # embeddings below
    }
    out = {}
    for name, mk in list(runs.items())[:2]:
        # steady-state best-of-2 per size, mirroring bench.py's convention
        s1 = min(timed(mk(docs1))[0] for _ in range(2))
        s10 = min(timed(mk(docs10))[0] for _ in range(2))
        out[name] = {"rows_1x": n_d1, "secs_1x": round(s1, 2),
                     "rows_10x": n_d10, "secs_10x": round(s10, 2),
                     "ratio": round(s10 / s1, 2)}
    dim = len(emb1.select("embedding").first()[0])
    emb_fn = lambda e: lambda: ann.cosine_near_dup_pairs(  # noqa: E731
        e, "embedding", "vec_id", threshold=0.9, dim=dim).count()
    s1 = min(timed(emb_fn(emb1))[0] for _ in range(2))
    s10 = min(timed(emb_fn(emb10))[0] for _ in range(2))
    out["embedding_near_dup"] = {"rows_1x": n_e1, "secs_1x": round(s1, 2),
                                 "rows_10x": n_e10, "secs_10x": round(s10, 2),
                                 "ratio": round(s10 / s1, 2)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
