"""t-digest correctness (vs exact quantiles), merge invariance, KS/PSI drift
detection on baseline-vs-drifted fixtures (SURVEY.md §7 hard-part 1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import drift, synth
from engine.sketch import TDigest, build_digest, build_digests, categorical_psi, ks_statistic, psi

RNG = np.random.default_rng(42)


def test_tdigest_quantiles_vs_exact():
    x = RNG.lognormal(3.0, 0.8, 200_000)
    d = TDigest(200).add(x)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
        exact = np.quantile(x, q)
        got = d.quantile(q)
        assert abs(got - exact) / exact < 0.02, (q, got, exact)


def test_tdigest_merge_equals_single():
    x = RNG.normal(10, 3, 100_000)
    whole = TDigest(200).add(x)
    parts = [TDigest(200).add(c) for c in np.array_split(x, 13)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    for q in (0.05, 0.5, 0.95, 0.99):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.05
    assert merged.total_weight == pytest.approx(100_000)


def test_tdigest_serialization_roundtrip():
    x = RNG.uniform(0, 1, 10_000)
    d = TDigest(100).add(x)
    d2 = TDigest.from_bytes(d.to_bytes())
    for q in (0.1, 0.5, 0.9):
        assert d2.quantile(q) == d.quantile(q)


def test_build_digest_distributed(spark):
    n = 50_000
    df = spark.range(0, n, 1, 16).select(
        (F.rand(seed=7) * 100).alias("v")
    )
    pdf = df.toPandas()
    d = build_digest(df, "v")
    assert d.total_weight == pytest.approx(n)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert abs(d.quantile(q) - np.quantile(pdf["v"], q)) < 1.0


def test_ks_and_psi_behave():
    a = TDigest(200).add(RNG.normal(0, 1, 50_000))
    b = TDigest(200).add(RNG.normal(0, 1, 50_000))
    c = TDigest(200).add(RNG.normal(1.0, 1, 50_000))
    assert ks_statistic(a, b) < 0.03
    assert ks_statistic(a, c) > 0.3
    assert psi(a, b) < 0.02
    assert psi(a, c) > 0.5


def test_categorical_psi():
    base = {"pcm": 700, "flac": 150, "opus": 100, "mp3": 50}
    same = {"pcm": 1400, "flac": 300, "opus": 200, "mp3": 100}
    shifted = {"pcm": 300, "flac": 150, "opus": 500, "mp3": 50}
    assert categorical_psi(base, same) < 1e-9
    assert categorical_psi(base, shifted) > 0.2


@pytest.mark.slow
def test_drift_check_end_to_end(spark):
    clips = synth.gen_clips(spark, 3000, partitions=8).cache()
    clips.count()
    baseline = drift.fit_baseline(
        clips, numeric_cols=["dur_ms", "sr_hz"], categorical_cols=["codec"],
    )

    # un-drifted: a fresh identical generation must NOT trip (FIXTURES.md §3)
    rep = drift.drift_check(clips, baseline)
    assert rep["passed"].all(), rep

    # drifted: dur_ms +25%, codec mix shifted -> must trip
    drifted = clips.withColumn(
        "dur_ms", (F.col("dur_ms") * 1.25).cast("int")
    ).withColumn(
        "codec",
        F.when(F.pmod(F.xxhash64("clip_id"), F.lit(10)) < 4, F.lit("opus")).otherwise(
            F.col("codec")
        ),
    )
    rep2 = drift.drift_check(drifted, baseline)
    by = {(r.column_name, r.metric): r for r in rep2.itertuples()}
    assert not by[("dur_ms", "ks")].passed
    assert not by[("dur_ms", "psi")].passed
    assert not by[("codec", "psi_categorical")].passed
    # sr_hz untouched -> stays clean
    assert by[("sr_hz", "ks")].passed


def test_baseline_save_load_roundtrip(spark, tmp_path):
    clips = synth.gen_clips(spark, 1000, partitions=4)
    b = drift.fit_baseline(clips, ["dur_ms"], ["codec"], snapshot_id="baseline_v1")
    path = str(tmp_path / "baseline_stats.parquet")
    drift.save_baseline(spark, b, path)
    b2 = drift.load_baseline(spark, path)
    assert b2.snapshot_id == "baseline_v1"
    assert b2.digests["dur_ms"].quantile(0.5) == pytest.approx(
        b.digests["dur_ms"].quantile(0.5)
    )
    assert b2.cat_counts == b.cat_counts


def test_tree_combine_equals_flat(spark):
    from pyspark.sql import functions as F

    from engine.sketch import build_digest

    df = spark.range(0, 40_000, 1, 16).select((F.rand(seed=3) * 50).alias("v"))
    flat = build_digest(df, "v")
    # force real combine levels at test scale: 16 partials -> 4 -> 2 (two
    # intermediate levels, the 10^6-partition shape in miniature)
    tree = build_digest(df, "v", tree_combine=True, max_driver_partials=2)
    assert tree.total_weight == flat.total_weight
    for q in (0.05, 0.5, 0.95, 0.99):
        assert abs(tree.quantile(q) - flat.quantile(q)) < 0.5


def test_tree_combine_deterministic_across_reruns(spark):
    """Digest merging is order-sensitive at the float level; the keyed,
    pid-ordered combine must make tree-combined digests BIT-identical across
    reruns of the same input (the engine-wide determinism rule)."""
    df = spark.range(0, 30_000, 1, 16).select((F.rand(seed=11) * 50).alias("v"))
    a = build_digest(df, "v", tree_combine=True, max_driver_partials=2)
    b = build_digest(df, "v", tree_combine=True, max_driver_partials=2)
    assert a.to_bytes() == b.to_bytes()
    c = build_digest(df, "v")
    d = build_digest(df, "v")
    assert c.to_bytes() == d.to_bytes()


def test_sketch_quantile_threshold_vs_exact_sf001(spark, sf01_dir):
    """|q_sketch - q_exact| bound on the driver's events table: the
    scale-mode threshold (scoring.fit_quantile_threshold method='tdigest')
    stays within 0.5% rank error of the exact percentile."""
    from engine.scoring import fit_quantile_threshold

    ev = spark.read.parquet(f"{sf01_dir}/events.parquet")
    for q in (0.5, 0.9, 0.99):
        exact = fit_quantile_threshold(ev, "value", q=q, method="exact")
        sketch = fit_quantile_threshold(ev, "value", q=q, method="tdigest")
        n = ev.count()
        rank_exact = ev.filter(F.col("value") <= exact).count() / n
        rank_sketch = ev.filter(F.col("value") <= sketch).count() / n
        assert abs(rank_sketch - rank_exact) < 0.005, (q, sketch, exact)
