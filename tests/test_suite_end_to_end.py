"""End-to-end: planted-violation fixture -> suite run -> exact violation keys.

The Spark analog of the reference's labeled-interval oracle check
(anomaly_detection.py:463-465): the engine must report exactly the planted
keys, no more, no less.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import synth
from engine.runner import validate

N = 4000


@pytest.fixture(scope="module")
def fixture_tables(spark):
    clips = synth.gen_clips(spark, N, partitions=8).cache()
    transcripts = synth.gen_transcripts(spark, N, partitions=4).cache()
    clips.count(), transcripts.count()
    return clips, transcripts


@pytest.fixture(scope="module")
def result(fixture_tables):
    clips, transcripts = fixture_tables
    return validate(clips, transcripts, check_audio=True, n_buckets=16)


def _ids(df):
    return sorted(r["clip_id"] for r in df.select("clip_id").collect())


def test_row_counts(fixture_tables):
    clips, transcripts = fixture_tables
    manifest = synth.plant_manifest(N)
    assert clips.count() == N + len(manifest["clip_id_duplicate"])
    assert transcripts.count() == N - len(manifest["dangling_fk"])


def test_range_violations_exact(result):
    manifest = synth.plant_manifest(N)
    expected = sorted(manifest["dur_ms_zero"] + manifest["dur_ms_huge"])
    assert _ids(result.violations["dur_ms_range"]) == expected


def test_domain_violations_exact(result):
    manifest = synth.plant_manifest(N)
    assert _ids(result.violations["sr_hz_domain"]) == manifest["sr_hz_out_of_domain"]
    assert _ids(result.violations["codec_domain"]) == manifest["codec_out_of_domain"]


def test_null_violations_exact(result):
    # transcript nulls: suite has no transcript NotNull by default, but codec
    # nulls aren't in the default suite either — verify via stats instead.
    stats = {
        (r["column_name"], r["metric"]): r["value"] for r in result.stats.collect()
    }
    manifest = synth.plant_manifest(N)
    total = N + len(manifest["clip_id_duplicate"])
    # duplicated rows may also be planted-null rows; recount from rules
    null_transcripts = sum(
        1 for cid in _all_row_ids(manifest) if _is(cid, "transcript_null")
    )
    assert stats[("transcript", "null_count")] == null_transcripts
    assert stats[("clip_id", "count")] == total


def _all_row_ids(manifest):
    ids = list(range(N))
    ids += [int(c.split("_")[1]) for c in manifest["clip_id_duplicate"]]
    return ids


def _is(i, rule):
    mod, off = synth.RULES[rule]
    return i % mod == off


def test_unique_violations_exact(result):
    manifest = synth.plant_manifest(N)
    assert _ids(result.violations["clip_id_unique"]) == manifest["clip_id_duplicate"]
    row = (
        result.verdicts.filter("constraint = 'clip_id_unique'").collect()[0]
    )
    assert row["violation_count"] == len(manifest["clip_id_duplicate"])
    assert not row["passed"]


def test_ref_integrity_exact(result):
    manifest = synth.plant_manifest(N)
    got = _ids(result.violations["transcript_ref_integrity"])
    # duplicated rows that are also dangling appear twice
    expected = []
    for i in _all_row_ids(synth.plant_manifest(N)):
        if _is(i, "dangling_fk"):
            expected.append(f"clip_{i:010d}")
    assert got == sorted(expected)


def test_audio_invariants_exact(result):
    manifest = synth.plant_manifest(N)
    got = set(r["clip_id"] for r in result.violations["pcm_snr_invariant"].collect())
    # PCM-content corruption (wav), container-header corruption (all codecs,
    # magic/CRC/frame-sync), flac FRAME-BODY corruption (only catchable by
    # the real body decode: frame CRC-16 / PCM compare), and opus/mp3
    # MID-CHAIN corruption (only catchable by the full page/frame-chain walk)
    expected = (
        set(manifest["payload_corrupt"])
        | set(manifest["container_header_corrupt"])
        | set(manifest["flac_body_corrupt"])
        | set(manifest["container_body_corrupt"])
        | set(manifest["flac_warmup_corrupt"])
        | set(manifest["flac_stereo_side_corrupt"])
        | set(manifest["mp3_sideinfo_corrupt"])
    )
    assert got == expected


def test_flac_warmup_corruption_caught(result):
    """The planted fixed-predictor clips carry shifted WRITTEN warmup
    samples in a stream where every CRC (header CRC-8, frame CRC-16, Ogg
    page CRC-32) verifies — a pure-structure validator cannot see them.
    They must be flagged by the SNR compare after genuine predictor
    reconstruction, so the offending value is the (failing) SNR, not a
    decode error."""
    manifest = synth.plant_manifest(N)
    assert len(manifest["flac_warmup_corrupt"]) >= 2  # N=4000: ids 59, 2059
    rows = {
        r["clip_id"]: r["offending_value"]
        for r in result.violations["pcm_snr_invariant"].collect()
    }
    for cid in manifest["flac_warmup_corrupt"]:
        assert cid in rows, cid
        snr = float(rows[cid])  # raises if it's a decode-error string
        assert snr < 30.0, (cid, snr)


def test_flac_stereo_side_corruption_caught(result):
    """The planted STEREO clips carry left-side frames whose SIDE subframe
    warmup is shifted — every CRC verifies and both subframes decode, so a
    mono-only or structure-only validator cannot see them. The reconstructed
    RIGHT channel (R = L - side) is offset: the flag must come from genuine
    stereo decorrelation + the SNR compare (offending value = failing SNR,
    not a decode error). The left channel stays bit-exact (checked in
    test_flac.py), so a whole-signal structural check would also miss it."""
    manifest = synth.plant_manifest(N)
    assert len(manifest["flac_stereo_side_corrupt"]) >= 2  # N=4000: 63, 2063
    rows = {
        r["clip_id"]: r["offending_value"]
        for r in result.violations["pcm_snr_invariant"].collect()
    }
    for cid in manifest["flac_stereo_side_corrupt"]:
        assert cid in rows, cid
        snr = float(rows[cid])  # raises if it's a decode-error string
        assert snr < 30.0, (cid, snr)


def test_mp3_sideinfo_corruption_caught(result):
    """The planted mp3 clips carry a side-info section claiming
    main_data_begin=511 with no backing reservoir — every frame header and
    frame length stays valid (2 bytes differ from the clean stream), so the
    r3-r5 header-chain walk provably cannot see it; the Layer III
    side-info/bit-reservoir validation must."""
    manifest = synth.plant_manifest(N)
    assert len(manifest["mp3_sideinfo_corrupt"]) >= 1
    errs = {
        r["clip_id"]: r["offending_value"]
        for r in result.violations["pcm_snr_invariant"].collect()
    }
    for cid in manifest["mp3_sideinfo_corrupt"]:
        assert errs.get(cid) == "bad_mp3_frame", (cid, errs.get(cid))


def test_container_chain_corruption_caught(result):
    """The planted opus/mp3 clips have a valid FIRST page/frame but
    corruption at ~3/4 of the payload — a header-window check cannot see it;
    the full-chain validators (every Ogg page CRC, every MP3 frame sync)
    must."""
    manifest = synth.plant_manifest(N)
    assert len(manifest["container_body_corrupt"]) >= 2
    errs = {
        r["clip_id"]: r["offending_value"]
        for r in result.violations["pcm_snr_invariant"].collect()
    }
    for cid in manifest["container_body_corrupt"]:
        i = int(cid.split("_")[1])
        codec = synth.body_corrupt_codec(i)
        if codec == "opus":
            # r6: opus instances alternate a packet-FRAMING plant (every
            # page CRC valid — only the RFC 6716 walk sees it) with the
            # page-CRC byte flip
            expected_err = ("bad_opus_packet"
                            if synth.opus_body_corrupt_is_framing(i)
                            else "bad_ogg_page")
        else:
            expected_err = "bad_mp3_frame"
        assert errs[cid] == expected_err, (cid, codec, errs.get(cid))


def test_flac_body_corruption_caught(result):
    """The planted flac clips have a VALID container + header but corrupted
    frame bytes — only the real body decode (engine/flac.py CRC-16) catches
    them, with the frame-level error."""
    manifest = synth.plant_manifest(N)
    assert len(manifest["flac_body_corrupt"]) >= 2
    errs = {
        r["clip_id"]: r["offending_value"]
        for r in result.violations["pcm_snr_invariant"].collect()
    }
    for cid in manifest["flac_body_corrupt"]:
        assert errs[cid] == "bad_flac_frame", (cid, errs.get(cid))


def test_flac_roundtrip_snr(fixture_tables):
    """Un-corrupted fixture flac clips decode to the EXACT planted PCM
    (verbatim subframes are lossless) and pass the SNR>=30dB invariant."""
    import numpy as np

    from engine import audio as audio_mod

    clips, _ = fixture_tables
    manifest = synth.plant_manifest(N)
    bad = (
        set(manifest["container_header_corrupt"])
        | set(manifest["flac_body_corrupt"])
        | set(manifest["payload_corrupt"])       # garbage-signal flac plants
        | set(manifest["flac_warmup_corrupt"])   # valid stream, wrong signal
        | set(manifest["flac_stereo_side_corrupt"])  # valid stream, wrong R
    )
    sample = [
        r for r in clips.filter("codec = 'flac'")
        .select("clip_id", "bytes", "sr_hz", "dur_ms").limit(40).collect()
        if r["clip_id"] not in bad
    ]
    assert len(sample) > 0
    n_stereo = 0
    for r in sample:
        i = int(r["clip_id"].split("_")[1])
        actual = audio_mod.decode(bytes(r["bytes"]), "flac")
        sig = synth.clean_pcm(i, r["sr_hz"], max(r["dur_ms"], 200))
        expected_pcm = synth._noisy_pcm16(i, sig)
        if synth.flac_is_stereo(i):
            # channel-interleaved: L is the mono wave, R the phase-offset
            # pair — both must round-trip bit-exactly (24-bit clips decode
            # to the identical float grid: pcm24 = pcm16 << 8)
            n_stereo += 1
            right = synth._noisy_pcm16(
                i, synth.clean_pcm_right(i, r["sr_hz"], max(r["dur_ms"], 200)),
                stream=5,
            )
            inter = np.empty(2 * len(expected_pcm), dtype=np.int16)
            inter[0::2] = expected_pcm
            inter[1::2] = right
            expected_pcm = inter
        assert np.array_equal(
            (actual * np.float32(32768.0)).astype(np.int16), expected_pcm
        ), r["clip_id"]
        exp = audio_mod._default_expected(
            r["clip_id"], r["sr_hz"], r["dur_ms"], "flac"
        )
        assert audio_mod.snr_db(exp, actual) >= audio_mod.SNR_DB_MIN, r["clip_id"]
    assert n_stereo > 0  # the stereo share is genuinely exercised


def test_container_header_validation_by_codec(result):
    """Each corrupted container codec is detected with its own error."""
    manifest = synth.plant_manifest(N)
    errs = {
        r["clip_id"]: r["offending_value"]
        for r in result.violations["pcm_snr_invariant"].collect()
    }
    for cid in manifest["container_header_corrupt"]:
        i = int(cid.split("_")[1])
        codec = synth.header_corrupt_codec(i)
        expected_err = {"flac": "bad_flac_header", "opus": "bad_ogg_page",
                        "mp3": "bad_mp3_frame"}[codec]
        assert errs[cid] == expected_err, (cid, codec, errs[cid])


def test_valid_containers_pass_header_checks(fixture_tables):
    """Un-corrupted containers must not be flagged: opus/mp3 header-validate
    clean (then hit the documented decoder stub); flac decodes to real PCM."""
    import numpy as np

    from engine import audio as audio_mod

    clips, _ = fixture_tables
    sample = (
        clips.filter("codec in ('flac','opus','mp3')")
        .select("clip_id", "bytes", "codec").limit(60).collect()
    )
    assert len(sample) > 0
    manifest = synth.plant_manifest(N)
    bad = (
        set(manifest["container_header_corrupt"])
        | set(manifest["flac_body_corrupt"])
        | set(manifest["container_body_corrupt"])
        | set(manifest["mp3_sideinfo_corrupt"])
    )
    import pytest as _pytest

    for r in (x for x in sample if x["clip_id"] not in bad):
        if r["codec"] == "flac":
            out = audio_mod.decode(bytes(r["bytes"]), "flac")
            assert isinstance(out, np.ndarray) and len(out) > 0
        else:
            with _pytest.raises(NotImplementedError):
                audio_mod.decode(bytes(r["bytes"]), r["codec"])


def test_container_sr_consistency_exact(result):
    """Cross-field metadata invariant: container-declared sample rate must
    equal the sr_hz column; the planted 2x-sr flac clips are caught exactly
    (and nothing else — wav/opus containers carry the true rate)."""
    manifest = synth.plant_manifest(N)
    got = set(
        r["clip_id"] for r in result.violations["container_sr_consistency"].collect()
    )
    assert got == set(manifest["sr_metadata_mismatch"])


def test_transcript_equality_exact(result):
    got = set(r["clip_id"] for r in result.violations["transcript_equality"].collect())
    # mismatch plants + null transcripts + dangling (no gold) all fail equality
    expected = set()
    for i in _all_row_ids(synth.plant_manifest(N)):
        if _is(i, "transcript_mismatch") or _is(i, "transcript_null") or _is(i, "dangling_fk"):
            expected.add(f"clip_{i:010d}")
    assert got == expected


def test_audio_rows_scanned_no_fanout(result, fixture_tables):
    """Duplicated clips must not inflate the audio checks: the pcm x
    transcript join is pre-aggregated per clip_id, so every audio check's
    rows_scanned equals the fused scan's (N + dups, not N + k^2 dups)."""
    clips, _ = fixture_tables
    total = clips.count()
    rows = {
        r["constraint"]: r["rows_scanned"]
        for r in result.verdicts.collect()
    }
    for name in ("pcm_snr_invariant", "transcript_equality", "bytes_not_null",
                 "container_sr_consistency"):
        assert rows[name] == total, (name, rows[name], total)


def test_row_invariant_payload_size(spark, fixture_tables):
    """RowInvariant cross-field check: a PCM clip's payload must be at least
    header + 2 bytes/sample for its declared (sr_hz, dur_ms). The truncated
    half of the planted payload corruptions violates it; exact keys match."""
    from engine import checks
    from engine.suite import ConstraintSuite, RowInvariant

    clips, _ = fixture_tables
    n_samp = F.least(
        F.floor(
            F.col("sr_hz").cast("long")
            * F.greatest(F.col("dur_ms").cast("long"), F.lit(200)) / 1000.0
        ),
        F.lit(200_000),
    )
    inv = RowInvariant(
        "pcm_payload_size",
        make_violation=lambda df: (
            F.coalesce(F.col("codec"), F.lit("pcm_s16le")).isin("pcm_s16le", "wav")
            & (F.length("bytes") < n_samp * 2 + 44)
        ),
    )
    s = ConstraintSuite().add(inv)
    res = checks.run_suite(clips, s, key_cols=["clip_id"], n_buckets=8,
                           stat_columns=[])
    got = sorted(
        r["clip_id"] for r in res.violations["pcm_payload_size"].collect()
    )
    manifest = synth.plant_manifest(N)
    expected = sorted(
        cid for cid in manifest["payload_corrupt"]
        if int(cid.split("_")[1]) % 2 == 0  # even ids = truncation plants
    )
    assert got == expected


def test_quarantine_sink_partition_pruned(result, spark, tmp_path):
    """Quarantine: every violating row lands in a constraint-partitioned
    table; reading one constraint partition-prunes and returns exactly the
    planted keys."""
    path = result.quarantine(str(tmp_path / "quarantine"))
    q = spark.read.parquet(path)
    manifest = synth.plant_manifest(N)

    one = q.filter("constraint = 'sr_hz_domain'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sorted(r["clip_id"] for r in one.collect()) == manifest["sr_hz_out_of_domain"]

    # global totals: quarantined rows == verdict violation counts for
    # row-level constraints; Unique quarantines one row PER DUPLICATE GROUP
    # (key + key_count — the exclusion-list artifact), while its
    # violation_count counts excess rows
    per_c = {r["constraint"]: r["count"] for r in q.groupBy("constraint").count().collect()}
    n_dup_groups = len(synth.plant_manifest(N)["clip_id_duplicate"])
    for r in result.verdicts.collect():
        if r["violation_count"] == 0:
            continue
        if r["constraint"] == "clip_id_unique":
            assert per_c[r["constraint"]] == n_dup_groups
        else:
            assert per_c.get(r["constraint"]) == r["violation_count"], r["constraint"]


def test_partition_verdicts_sum_to_global(result):
    pv = result.partition_verdicts.groupBy("constraint").sum("violation_count").collect()
    by_c = {r["constraint"]: r["sum(violation_count)"] for r in pv}
    for r in result.verdicts.collect():
        assert by_c[r["constraint"]] == r["violation_count"], r["constraint"]


def test_verdicts_invariant_to_bucket_count(fixture_tables):
    """Reference invariant: verdicts identical across partition counts
    (SURVEY.md §5d)."""
    clips, transcripts = fixture_tables
    r2 = validate(clips, transcripts, n_buckets=2)
    r32 = validate(clips, transcripts, n_buckets=32)
    v2 = {(r["constraint"], r["violation_count"], r["passed"]) for r in r2.verdicts.collect()}
    v32 = {(r["constraint"], r["violation_count"], r["passed"]) for r in r32.verdicts.collect()}
    assert v2 == v32


def test_lpc_fixture_clips_decode_losslessly():
    """The 1/32 LPC share of the flac mix (i%32==21): fixture bytes decode
    to EXACTLY the planted PCM through the real LPC inverse filter, in both
    containers, and pass the SNR invariant."""
    import numpy as np

    from engine import audio as audio_mod

    # ids that are multiples of 3 land in the Ogg-FLAC container
    checked = {"native": 0, "ogg": 0}
    for i in (21, 53, 117, 213):  # 21+32k, includes i%3==0 (117, 213)
        rows = synth._gen_rows(np.array([i]))
        if rows["codec"][0] != "flac":
            # codec is rng-drawn for non-planted ids; force the payload
            # family by re-deriving with a flac draw is not possible — use
            # the raw encoder instead for non-flac draws
            sig = synth.clean_pcm(i, 8000, 1000)
            pcm = synth._noisy_pcm16(i, sig)
            from engine import flac as flac_mod

            b = (synth.ogg_flac_bytes(8000, pcm, predictor="lpc")
                 if i % 3 == 0 else
                 flac_mod.encode(pcm, 8000, predictor="lpc"))
            out = audio_mod.decode(b, "flac")
            assert np.array_equal(
                (out * np.float32(32768.0)).astype(np.int16), pcm), i
            checked["ogg" if i % 3 == 0 else "native"] += 1
            continue
        b = rows["bytes"][0]
        sig = synth.clean_pcm(i, rows["sr_hz"][0], max(rows["dur_ms"][0], 200))
        pcm = synth._noisy_pcm16(i, sig)
        out = audio_mod.decode(b, "flac")
        assert np.array_equal(
            (out * np.float32(32768.0)).astype(np.int16), pcm), i
        checked["ogg" if i % 3 == 0 else "native"] += 1
    assert checked["native"] >= 1 and checked["ogg"] >= 1


def test_check_audio_without_transcripts_raises(fixture_tables):
    """BOTH entry points refuse check_audio=True with no transcripts dim:
    silently skipping the requested audio pass would report clean verdicts
    the caller never computed (ADVICE r4/r5 — batch parity with the
    streaming guard)."""
    clips, _ = fixture_tables
    with pytest.raises(ValueError, match="transcripts"):
        validate(clips, None, check_audio=True)
