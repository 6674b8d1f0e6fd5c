"""Resumability contract (FIXTURES.md §4): crash after k of n shards, resume
with the same run_id -> done shards skipped, final verdicts equal an
uninterrupted run."""

from __future__ import annotations

import pytest

from engine import synth
from engine.checkpoint import CheckpointedRunner
from engine.suite import audio_clip_suite

N = 3000
N_SHARDS = 6


@pytest.fixture(scope="module")
def tables(spark):
    clips = synth.gen_clips(spark, N, partitions=8).cache()
    transcripts = synth.gen_transcripts(spark, N, partitions=4).cache()
    clips.count(), transcripts.count()
    return clips, transcripts


def _verdict_map(df):
    return {
        r["constraint"]: (r["violation_count"], r["rows_scanned"], r["passed"])
        for r in df.collect()
    }


def test_crash_resume_equals_fresh(spark, tables, tmp_path):
    clips, transcripts = tables
    suite = audio_clip_suite()
    refs = {"transcripts": transcripts}

    fresh_dir = str(tmp_path / "ckpt_fresh")
    fresh = CheckpointedRunner(spark, fresh_dir).run(
        clips, suite, ["clip_id"], refs=refs, run_id="fresh", n_shards=N_SHARDS
    )
    fresh_v = _verdict_map(fresh)

    crash_dir = str(tmp_path / "ckpt_crash")
    runner = CheckpointedRunner(spark, crash_dir)
    with pytest.raises(RuntimeError, match="simulated crash"):
        runner.run(clips, suite, ["clip_id"], refs=refs, run_id="r1",
                   n_shards=N_SHARDS, fail_after=3)
    assert runner.done_shards("r1") == {0, 1, 2}

    resumed = runner.run(clips, suite, ["clip_id"], refs=refs, run_id="r1",
                         n_shards=N_SHARDS)
    # done shards were skipped: lineage still has exactly N_SHARDS shard rows
    lin = runner.lineage("r1").collect()
    assert [r["shard_id"] for r in lin] == list(range(N_SHARDS))
    assert _verdict_map(resumed) == fresh_v

    # rows_scanned across shards covers the whole table exactly once
    manifest = synth.plant_manifest(N)
    total = N + len(manifest["clip_id_duplicate"])
    assert sum(r["rows_scanned"] for r in lin) == total


def test_shard_counts_match_direct_run(spark, tables, tmp_path):
    """Shard-summed verdicts == single-pass run_suite verdicts."""
    from engine import checks

    clips, transcripts = tables
    suite = audio_clip_suite()
    direct = checks.run_suite(
        clips, suite, ["clip_id"], refs={"transcripts": transcripts},
        n_buckets=4, stat_columns=[],
    )
    runner = CheckpointedRunner(spark, str(tmp_path / "ckpt2"))
    sharded = runner.run(clips, suite, ["clip_id"],
                         refs={"transcripts": transcripts}, run_id="x",
                         n_shards=4)
    assert _verdict_map(sharded) == _verdict_map(direct.verdicts)
