"""Audio feature-extraction / segmentation operators (engine/features.py)
and the cross-modal speech-rate invariant (engine/suite.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import synth
from engine.features import audio_features, pcm_features, segment_clips

N = 400


@pytest.fixture(scope="module")
def clips(spark):
    df = synth.gen_clips(spark, N, partitions=4).cache()
    df.count()
    return df


def test_pcm_features_reference_values():
    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    rms_db, zcr, dom, clipped = pcm_features(tone, sr)
    assert abs(rms_db - 20 * np.log10(0.5 / np.sqrt(2))) < 0.1
    assert abs(dom - 440.0) < 2.0           # rFFT bin resolution at 1s/8kHz
    assert abs(zcr - 2 * 440.0 / sr) < 0.01  # two crossings per period
    assert clipped == 0.0
    # clipping detector
    hot = np.clip(tone * 4.0, -1.0, 32767.0 / 32768.0).astype(np.float32)
    assert pcm_features(hot, sr)[3] > 0.2


def test_audio_features_match_per_clip_reference(spark, clips):
    """The Arrow batch op equals the per-clip numpy reference on decodable
    clips; undecodable/corrupt clips carry the error tag with NULL features."""
    from engine import audio as audio_mod

    got = {r["clip_id"]: r for r in audio_features(clips).collect()}
    rows = clips.select("clip_id", "bytes", "sr_hz", "codec").collect()
    assert len(got) == len({r["clip_id"] for r in rows})
    checked = 0
    for r in rows[:100]:
        g = got[r["clip_id"]]
        try:
            pcm = audio_mod.decode_mono(r["bytes"], r["codec"])
        except NotImplementedError:
            assert g["decode_error"] == "codec_decoder_missing"
            assert g["rms_db"] is None
            continue
        except ValueError as e:
            assert g["decode_error"] == str(e)
            continue
        rms_db, zcr, dom, clipped = pcm_features(pcm, r["sr_hz"])
        assert g["n_samples"] == len(pcm)
        assert abs(g["rms_db"] - rms_db) < 1e-9
        assert abs(g["dominant_hz"] - dom) < 1e-9
        checked += 1
    assert checked > 30  # plenty of decodable wav/flac clips in the sample


def test_segment_clips_roundtrip(spark, clips):
    """Segments re-decode to the original PCM slices: lossless re-framing
    for decodable clips, zero rows for undecodable ones."""
    from engine import audio as audio_mod

    seg_ms = 500
    # dedupe the planted duplicate clip_ids: segmentation is per physical
    # row, so a duplicated clip would (correctly) emit its segments twice
    uniq = clips.dropDuplicates(["clip_id"])
    segs = segment_clips(uniq, seg_ms=seg_ms).collect()
    by_clip: dict[str, list] = {}
    for r in segs:
        by_clip.setdefault(r["clip_id"], []).append(r)
    src = {r["clip_id"]: r for r in clips.select("clip_id", "bytes", "sr_hz", "codec").collect()}

    n_checked = 0
    for cid, rows in list(by_clip.items())[:40]:
        pcm = audio_mod.decode_mono(src[cid]["bytes"], src[cid]["codec"])
        i16 = np.clip(pcm * 32768.0, -32768, 32767).astype(np.int16)
        rows.sort(key=lambda r: r["seg_idx"])
        step = src[cid]["sr_hz"] * seg_ms // 1000
        # contiguous indices, exact coverage
        assert [r["seg_idx"] for r in rows] == list(range(len(rows)))
        assert sum(
            len(audio_mod.decode_wav_pcm16(r["bytes"])) for r in rows
        ) == len(i16)
        # first segment bytes decode to the exact first slice
        first = audio_mod.decode_wav_pcm16(rows[0]["bytes"])
        np.testing.assert_array_equal(
            first, i16[:step].astype(np.float32) / np.float32(32768.0)
        )
        n_checked += 1
    assert n_checked > 10
    # undecodable clips (wma / corrupt) contribute zero rows
    for cid, r in src.items():
        try:
            audio_mod.decode_mono(r["bytes"], r["codec"])
        except (NotImplementedError, ValueError):
            assert cid not in by_clip


def test_speech_rate_invariant_fuses_and_flags(spark):
    """Cross-modal rate check: planted hyper-fast transcript flagged; normal
    rows and NULL/zero-duration rows are not double-counted."""
    from engine.checks import run_suite
    from engine.suite import ConstraintSuite, speech_rate_invariant

    df = spark.createDataFrame(
        [
            ("a", "three words here", 3000),          # 1 w/s -> ok
            ("b", " ".join(["w"] * 50), 2000),        # 25 w/s -> violation
            ("c", None, 1000),                         # NULL -> not this check
            ("d", "words", 0),                         # bad dur -> not this check
        ],
        "clip_id string, transcript string, dur_ms int",
    )
    s = ConstraintSuite().add(speech_rate_invariant(6.0))
    res = run_suite(df, s, key_cols=["clip_id"], n_buckets=4, stat_columns=[])
    v = {r["constraint"]: r["violation_count"] for r in res.verdicts.collect()}
    assert v == {"speech_rate_le_6.0": 1}
    bad = res.violations["speech_rate_le_6.0"].select("clip_id").collect()
    assert {r["clip_id"] for r in bad} == {"b"}


def test_dominant_hz_odd_length_uses_true_sample_count():
    """Bin -> Hz conversion must use the original n, not 2*(rfft_len-1),
    which is off by one for odd n (ADVICE r4)."""
    import numpy as np

    from engine.features import pcm_features

    sr = 8000
    for n in (4001, 4000):
        f = 1000.0
        pcm = np.sin(2 * np.pi * f * np.arange(n) / sr).astype(np.float32)
        _, _, dom, _ = pcm_features(pcm, sr)
        assert abs(dom - f) < sr / n + 1e-9, (n, dom)


def test_resample_pcm_identity_length_and_tone():
    import numpy as np

    from engine.features import pcm_features, resample_pcm

    sr, f = 8000, 440.0
    pcm = np.sin(2 * np.pi * f * np.arange(8000) / sr).astype(np.float32)
    # identity
    assert resample_pcm(pcm, sr, sr) is pcm
    for target in (16000, 22050, 4000):
        out = resample_pcm(pcm, sr, target)
        assert len(out) == round(len(pcm) * target / sr)
        if target >= 2 * f:  # tone below Nyquist must survive the resample
            _, _, dom, _ = pcm_features(out, target)
            assert abs(dom - f) < 2.0, (target, dom)


def test_resample_clips_uniform_rate(spark, clips):
    import numpy as np

    from engine import audio as audio_mod
    from engine.features import resample_clips, resample_pcm

    out = resample_clips(clips, 16000)
    rows = out.limit(200).collect()
    assert len(rows) > 50
    src = {r["clip_id"]: r for r in clips.limit(400).collect()}
    checked = 0
    for r in rows:
        assert r["sr_hz"] == 16000
        assert r["n_samples"] == len(bytes(r["bytes"][44:])) // 2
        s = src.get(r["clip_id"])
        if s is None:
            continue
        try:
            pcm = audio_mod.decode_mono(bytes(s["bytes"]), s["codec"])
        except (NotImplementedError, ValueError):
            continue
        exp = resample_pcm(pcm, s["sr_hz"], 16000)
        got = np.frombuffer(bytes(r["bytes"])[44:], dtype="<i2")
        ref = np.clip(exp * 32768.0, -32768, 32767).astype("<i2")
        assert np.array_equal(got, ref), r["clip_id"]
        checked += 1
    assert checked > 20


def test_segment_and_resample_flush_bounded(spark, clips):
    """The fan-out ops flush a RecordBatch whenever the accumulated payload
    passes emit_bytes (here shrunk to 64 KB — dozens of flushes per task on
    this fixture), and the flushed output is identical to the default-bound
    one: the per-task OUTPUT working set is bounded regardless of clip
    length or Arrow batch size (emit_bytes is a real parameter, captured in
    the pickled closure, so the bound genuinely applies on the workers)."""
    from engine.features import resample_clips

    base_seg = segment_clips(clips, seg_ms=500).orderBy("clip_id", "seg_idx").collect()
    base_res = resample_clips(clips, 16000).orderBy("clip_id").collect()
    small_seg = segment_clips(clips, seg_ms=500, emit_bytes=64 * 1024) \
        .orderBy("clip_id", "seg_idx").collect()
    small_res = resample_clips(clips, 16000, emit_bytes=64 * 1024) \
        .orderBy("clip_id").collect()
    assert small_seg == base_seg
    assert small_res == base_res


def test_segment_clips_1s_driver_query_fact_contract(spark):
    """The registered driver query's full fact contract at the driver
    fixture size: exactly one segments_present row per forced-decodable
    plant, and every violation fact (count/idx/coverage/meta/multiplicity/
    corrupt-rows) planted-empty — the pytest witness of the DuckDB oracle
    in tools/check_oracle.py."""
    from engine import queries as qmod

    rows = qmod.Q["segment_clips_1s"](spark, "unused").collect()
    got = {(r.clip_id, r.fact) for r in rows}
    n = qmod._FIXTURE_N
    present = sorted(
        i for i in range(n)
        if i % 2000 in (13, 59, 63) or i % 4000 == 43 or i % 500 == 11
    )
    expected = {(f"clip_{i:010d}", "segments_present") for i in present}
    assert got == expected, (got - expected, expected - got)
    assert len(rows) == len(expected)  # no duplicate fact rows either
