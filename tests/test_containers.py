"""Ogg page-chain / MP3 frame-chain validators + vectorized CRC-32
(engine/oggcrc.py, engine/audio.py). Pure numpy — no Spark."""

from __future__ import annotations

import numpy as np
import pytest

from engine import audio, synth
from engine.oggcrc import crc32, crc32_many
from engine.synth import mp3_bytes, ogg_opus_bytes


def test_crc32_matches_scalar_ogg_crc():
    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 3, 9, 27, 100, 4001, 9001):
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert crc32(d) == synth.ogg_crc(d), n


def test_crc32_many_batches():
    rng = np.random.default_rng(4)
    chunks = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
              for n in (5, 400, 4001, 64)]
    got = crc32_many(chunks)
    assert [int(c) for c in got] == [synth.ogg_crc(c) for c in chunks]


def test_ogg_stream_valid_chain_passes():
    body = np.random.default_rng(5).integers(0, 256, 9000, dtype=np.uint8).tobytes()
    b = ogg_opus_bytes(16000, body)
    audio.validate_ogg_stream(b)  # no raise
    assert audio.container_sr(b[:256], "opus") == 16000


def test_ogg_stream_any_page_corruption_caught():
    body = np.random.default_rng(6).integers(0, 256, 9000, dtype=np.uint8).tobytes()
    b = bytearray(ogg_opus_bytes(16000, body))
    rng = np.random.default_rng(7)
    for i in rng.choice(np.arange(len(b)), size=60, replace=False):
        orig = b[i]
        b[i] ^= 0xA5
        with pytest.raises(ValueError, match="bad_ogg_page"):
            audio.validate_ogg_stream(bytes(b))
        b[i] = orig


def test_ogg_stream_truncation_and_trailing_garbage_caught():
    body = b"\x01" * 5000
    b = ogg_opus_bytes(8000, body)
    with pytest.raises(ValueError, match="bad_ogg_page"):
        audio.validate_ogg_stream(b[:-100])          # truncated last page
    with pytest.raises(ValueError, match="bad_ogg_page"):
        audio.validate_ogg_stream(b + b"\x00" * 10)  # garbage after EOS page


def test_mp3_chain_valid_passes_and_header_breaks_caught():
    body = np.random.default_rng(8).integers(0, 256, 9000, dtype=np.uint8).tobytes()
    b = mp3_bytes(body)
    audio.validate_mp3_stream(b)  # no raise
    flen = synth.mp3_frame_len(0xFB, 0x90)
    assert len(b) % flen == 0
    # break the sync of a mid-chain frame header
    ba = bytearray(b)
    k = (len(ba) // flen // 2) * flen
    ba[k] ^= 0xA5
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(bytes(ba))
    # truncation mid-frame
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(b[:-7])


def test_validators_accept_arrow_signed_buffers():
    import pyarrow as pa

    body = b"\x02" * 3000
    for maker, codec in ((ogg_opus_bytes, "opus"), (lambda s, x: mp3_bytes(x), "mp3")):
        b = maker(8000, body)
        buf = pa.array([b], type=pa.binary())[0].as_buffer()
        with pytest.raises(NotImplementedError):
            audio.decode(buf, codec)  # structure valid -> packet stub raises


def test_mp3_out_of_subset_shapes_route_to_not_implemented():
    """Valid-but-unsupported MPEG shapes are a plumbing pass (ADVICE r3):
    MPEG-2/2.5 versions, Layer I/II, free-format bitrate. Reserved field
    values stay structural corruption."""
    body = b"\x03" * 2000
    b = bytearray(mp3_bytes(body))
    # MPEG-2 (version bits 10), Layer III: b1 = 0xFF F3
    b2 = bytes([0xFF, 0xF3]) + bytes(b[2:])
    with pytest.raises(NotImplementedError, match="mp3_subset"):
        audio.validate_mp3_stream(b2)
    # MPEG-1 Layer II: b1 = 0xFF FD
    b3 = bytes([0xFF, 0xFD]) + bytes(b[2:])
    with pytest.raises(NotImplementedError, match="mp3_subset"):
        audio.validate_mp3_stream(b3)
    # free-format bitrate (idx 0): b2 high nibble 0
    b4 = bytes(b[:2]) + bytes([b[2] & 0x0F]) + bytes(b[3:])
    with pytest.raises(NotImplementedError, match="mp3_subset"):
        audio.validate_mp3_stream(b4)
    # reserved values are corruption, not a subset gap
    b5 = bytes([0xFF, 0xF9]) + bytes(b[2:])   # version bits 01 = reserved
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(b5)
    b6 = bytes([0xFF, 0xF1]) + bytes(b[2:])   # layer bits 00 = reserved
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(b6)
    b7 = bytes(b[:2]) + bytes([(b[2] & 0x0F) | 0xF0]) + bytes(b[3:])  # bitrate 0xF
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(b7)


def test_ogg_chained_stream_routes_to_not_implemented():
    """A serial/sequence discontinuity that is itself a well-formed BOS page
    (start of a legal chained Ogg stream) is out-of-subset, not corruption
    (ADVICE r3). A discontinuity that is NOT a clean BOS stays a violation."""
    body = b"\x04" * 3000
    link1 = ogg_opus_bytes(8000, body)
    link2 = ogg_opus_bytes(8000, body)
    with pytest.raises(NotImplementedError, match="ogg_chained"):
        audio.validate_ogg_stream(link1 + link2)
    # chained link under a DIFFERENT serial (the spec-typical shape)
    orig = synth.OGG_SERIAL
    try:
        synth.OGG_SERIAL = orig + 1
        link2b = ogg_opus_bytes(8000, body)
    finally:
        synth.OGG_SERIAL = orig
    with pytest.raises(NotImplementedError, match="ogg_chained"):
        audio.validate_ogg_stream(link1 + link2b)
    # a BOS page whose CRC does not verify is corruption, not a chain
    bad = bytearray(link1 + link2b)
    bad[len(link1) + 30] ^= 0xA5  # inside the chained BOS page
    with pytest.raises(ValueError, match="bad_ogg_page"):
        audio.validate_ogg_stream(bytes(bad))


def test_flac_decode_none_is_value_error():
    from engine import flac as flac_mod

    with pytest.raises(ValueError, match="bad_flac_header"):
        flac_mod.decode(None)


def _pcm16(n=9000, seed=11):
    rng = np.random.default_rng(seed)
    sig = 0.5 * np.sin(np.linspace(0, 300, n))
    return np.clip((sig + rng.uniform(-1, 1, n) * 0.003) * 29000, -32768, 32767).astype(np.int16)


def test_ogg_flac_roundtrip_and_container_sr():
    """Ogg-FLAC (xiph mapping): full page walk + packet reassembly + REAL
    frame decode behind the Ogg layer — lossless round trip, STREAMINFO sr
    readable through the BOS page (incl. the mismatch-plant override)."""
    from engine.synth import ogg_flac_bytes

    pcm = _pcm16()
    b = ogg_flac_bytes(16000, pcm)
    out = audio.decode(b, "flac")
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)
    assert audio.container_sr(b[:256], "flac") == 16000
    b2 = ogg_flac_bytes(16000, pcm, streaminfo_sr=32000)
    assert audio.container_sr(b2[:256], "flac") == 32000
    np.testing.assert_array_equal(audio.decode(b2, "flac"), out)


def test_ogg_flac_frame_corruption_caught_behind_valid_pages():
    """corrupt_frames re-pages AFTER corrupting the FLAC frame body, so every
    Ogg page CRC is VALID — only the FLAC frame CRC-16 behind the Ogg layer
    can catch it. This is the plant that proves the body decode is real."""
    from engine.synth import ogg_flac_bytes

    pcm = _pcm16()
    b = ogg_flac_bytes(8000, pcm, corrupt_frames=True)
    # the page chain itself is pristine
    audio.validate_ogg_stream(b)  # no raise
    with pytest.raises(ValueError, match="bad_flac_frame"):
        audio.decode(b, "flac")


def test_ogg_flac_page_corruption_caught():
    from engine.synth import ogg_flac_bytes

    b = bytearray(ogg_flac_bytes(8000, _pcm16()))
    b[len(b) // 2] ^= 0xA5  # inside a data page -> that page's CRC-32 breaks
    with pytest.raises(ValueError, match="bad_ogg_page"):
        audio.decode(bytes(b), "flac")
    # broken leading magic: no longer identifiable as Ogg -> routed to the
    # native-flac parser, whose magic check reports the header violation
    with pytest.raises(ValueError, match="bad_flac_header"):
        audio.decode(b"XXXX" + bytes(b[4:]), "flac")


def test_ogg_flac_garbage_signal_fails_snr_only():
    """A pristine Ogg-FLAC container carrying a garbage SIGNAL passes every
    structural check and fails only the SNR compare — the payload_corrupt
    plant semantics for this container."""
    from engine.synth import ogg_flac_bytes

    pcm = _pcm16()
    garbage = (pcm.astype(np.int32) * 13 % 65536 - 32768).astype(np.int16)
    b = ogg_flac_bytes(8000, garbage)
    out = audio.decode(b, "flac")  # decodes clean
    expected = pcm.astype(np.float32) / 32768.0
    assert audio.snr_db(expected, out) < 5.0


def test_ogg_known_non_flac_mapping_under_flac_codec_is_violation():
    """codec='flac' over a recognizable Ogg-Opus payload is a cross-field
    metadata lie, not an unimplemented shape (ADVICE r4): it must be a
    violation, never a plumbing pass."""
    b = ogg_opus_bytes(8000, b"\x01" * 2000)  # OpusHead mapping, codec says flac
    with pytest.raises(ValueError, match="codec_container_mismatch"):
        audio.decode(b, "flac")


def test_ogg_unknown_mapping_stays_out_of_subset_for_flac_codec():
    from engine.synth import ogg_page

    head = b"MyCodecX" + b"\x00" * 12            # unrecognized mapping magic
    pages = [ogg_page(0, 0, 0x02, head), ogg_page(1, 0, 0x04, b"\x01" * 100)]
    with pytest.raises(NotImplementedError, match="ogg_mapping"):
        audio.decode(b"".join(pages), "flac")


def test_mp3_mid_chain_version_flip_stays_violation():
    """r4 review fix: out-of-subset routing applies to the FIRST frame only.
    A mid-chain header whose sync survives but whose version/layer bits
    changed (single bit flip 0xFB -> 0xF3) is corruption, not a subset gap —
    version/layer are stream-level properties."""
    b = bytearray(mp3_bytes(b"\x05" * 3000))
    flen = synth.mp3_frame_len(0xFB, 0x90)
    k = (len(b) // flen // 2) * flen  # a mid-chain frame header
    b[k + 1] = 0xF3                   # MPEG-2 version bits, sync intact
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(bytes(b))


def test_ogg_corrupt_first_link_then_chain_stays_violation():
    """r4 review fix: a corrupted page in the FIRST link followed by a clean
    chained link must stay a violation — the chained-stream plumbing pass
    only applies when everything walked so far verifies."""
    body = b"\x06" * 3000
    link1 = bytearray(ogg_opus_bytes(8000, body))
    link1[len(link1) // 2] ^= 0xA5  # break a data page CRC in link 1
    link2 = ogg_opus_bytes(8000, body)
    with pytest.raises(ValueError, match="bad_ogg_page"):
        audio.validate_ogg_stream(bytes(link1) + link2)
    # sanity: with an uncorrupted first link the chained route still applies
    with pytest.raises(NotImplementedError, match="ogg_chained"):
        audio.validate_ogg_stream(ogg_opus_bytes(8000, body) + link2)


def test_ogg_granule_regression_is_violation_even_with_valid_crcs():
    """A page whose granule position goes BACKWARD (with its CRC
    recomputed, so every checksum verifies) is an encoder-level
    inconsistency only the cross-field granule check can see (r5)."""
    import struct as _s

    from engine.oggcrc import crc32

    b = bytearray(ogg_opus_bytes(8000, b"\x01" * 9000))
    # find the third data page (granule 960*(j+1)) and rewind its granule
    pos, idx, target = 0, 0, None
    while pos < len(b):
        n_segs = b[pos + 26]
        plen = 27 + n_segs + sum(b[pos + 27 : pos + 27 + n_segs])
        if idx == 4:  # BOS, tags, data0, data1, data2 -> rewind data2
            target = pos
            break
        pos += plen
        idx += 1
    assert target is not None
    b[target + 6 : target + 14] = _s.pack("<q", 1)  # far below data1's granule
    n_segs = b[target + 26]
    plen = 27 + n_segs + sum(b[target + 27 : target + 27 + n_segs])
    b[target + 22 : target + 26] = b"\x00" * 4
    crc = crc32(bytes(b[target : target + plen]))
    b[target + 22 : target + 26] = _s.pack("<I", crc)
    with pytest.raises(ValueError, match="bad_ogg_page"):
        audio.validate_ogg_stream(bytes(b))
    # sanity: the unmodified stream still validates
    audio.validate_ogg_stream(ogg_opus_bytes(8000, b"\x01" * 9000))


# ---------------------------------------------------------------------------
# MP3 Layer III side-info / bit-reservoir validation (r6)
# ---------------------------------------------------------------------------

def _mp3_fixture(n=4000, seed=5):
    import numpy as np

    return synth.mp3_bytes(np.random.default_rng(seed).bytes(n))


def _patch_sideinfo(b: bytes, frame: int, transform) -> bytes:
    """Rewrite one frame's 32-byte side-info int via ``transform(si)``."""
    flen = synth.mp3_frame_len(0xFB, 0x90)
    ba = bytearray(b)
    p = frame * flen + 4
    si = int.from_bytes(bytes(ba[p : p + 32]), "big")
    ba[p : p + 32] = transform(si).to_bytes(32, "big")
    return bytes(ba)


def test_mp3_sideinfo_reservoir_overclaim_caught():
    """main_data_begin pointing past the accumulated reservoir is invisible
    to the header walk (every sync/length valid) but fails the r6
    side-info validation — on the FIRST frame the reservoir is zero, so any
    nonzero claim is corruption."""
    b = _mp3_fixture()
    audio.validate_mp3_stream(b)  # clean chain passes
    bad = _patch_sideinfo(b, 0, lambda si: si | (1 << (256 - 9)))  # md_begin=256
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(bad)


def test_mp3_sideinfo_p23_overflow_caught():
    """part2_3_length sum past the reachable main data (reservoir + own
    main section) is undecodable by construction."""
    b = _mp3_fixture()
    # set granule 0 / channel 0 part2_3_length to 4095 (max 12-bit): total
    # p23 then exceeds 8*(md+main) on frame 0
    off = 256 - (9 + 3 + 8) - 12

    def hot(si):
        return si | (0xFFF << off)

    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(_patch_sideinfo(b, 0, hot))


def test_mp3_sideinfo_big_values_ceiling_caught():
    """big_values > 288 would address spectral lines past 576."""
    b = _mp3_fixture()
    off = 256 - (9 + 3 + 8) - 12 - 9  # big_values of gr0/ch0

    def hot(si):
        return (si & ~(0x1FF << off)) | (300 << off)

    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(_patch_sideinfo(b, 0, hot))


def test_mp3_sideinfo_forbidden_block_type_caught():
    """window_switching_flag=1 with block_type=0 is a forbidden shape."""
    b = _mp3_fixture()
    base = 256 - (9 + 3 + 8)
    wsf_off = base - 34  # bit 33 within the 59-bit block, MSB-first

    def hot(si):
        return si | (1 << (wsf_off - 0))

    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(_patch_sideinfo(b, 0, hot))


def test_mp3_reservoir_plant_invisible_to_header_walk():
    """The planted stream differs from the clean one in exactly the
    side-info bytes of one frame: every header byte and frame length is
    untouched, so catching it REQUIRES the side-info walk."""
    import numpy as np

    body = np.random.default_rng(7).bytes(20000)
    clean = synth.mp3_bytes(body)
    bad = synth.mp3_bytes(body, corrupt_sideinfo=True)
    assert len(clean) == len(bad)
    flen = synth.mp3_frame_len(0xFB, 0x90)
    diffs = [k for k, (x, y) in enumerate(zip(clean, bad)) if x != y]
    assert diffs, "plant must change bytes"
    for k in diffs:
        assert 4 <= (k % flen) < 36, k  # all inside one side-info section
    audio.validate_mp3_stream(clean)
    with pytest.raises(ValueError, match="bad_mp3_frame"):
        audio.validate_mp3_stream(bad)


# ---------------------------------------------------------------------------
# opus packet framing (r6 — RFC 6716 §3.2 walk behind the page CRCs)
# ---------------------------------------------------------------------------

def _opus_fixture(n=40000, seed=3):
    return ogg_opus_bytes(16000, np.random.default_rng(seed).bytes(n))


def test_opus_packets_valid_stream_passes():
    """The synthesized packet stream (all five framing shapes, multi-packet
    pages, cumulative granules) passes both the page and packet walks."""
    b = _opus_fixture()
    audio.validate_opus_stream(b)
    # and exercises every code: collect TOC codes of the audio packets
    from engine.oggcrc import as_u8
    spans = audio._ogg_packet_spans(as_u8(b))
    codes = {int(as_u8(b)[s]) & 0x03 for (s, _e), *_ in
             (pk for pk in spans[2:])}
    assert codes == {0, 1, 2, 3}


def test_opus_framing_plant_invisible_to_page_walk():
    """corrupt_framing rewrites ONE packet's length field and re-CRCs: the
    page walk (every CRC) is clean; only the packet walk raises."""
    body = np.random.default_rng(5).bytes(30000)
    clean = ogg_opus_bytes(16000, body)
    bad = ogg_opus_bytes(16000, body, corrupt_framing=True)
    assert clean != bad
    audio.validate_ogg_stream(bad)  # all CRCs verify
    audio.validate_opus_packets(clean)
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_packets(bad)


def test_opus_packet_spanning_pages_reassembled():
    """A packet larger than one page's lacing budget spans pages via the
    continued-packet flag; the span collector must reassemble it."""
    from engine.synth import ogg_page_multi, OGG_SERIAL  # noqa: F401
    import struct

    # one giant code-0 packet (CELT 20ms, config 31): 9000 bytes
    toc = (31 << 3)
    pkt = bytes([toc]) + b"q" * 1274  # frame <= 1275
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
            + struct.pack("<I", 16000) + struct.pack("<h", 0) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    # split pkt across two pages by hand: first page carries 510 bytes with
    # lacing [255, 255] (packet open), second page continues with the rest
    part1, part2 = pkt[:510], pkt[510:]
    pages = [synth.ogg_page(0, 0, 0x02, head), synth.ogg_page(1, 0, 0x00, tags)]
    hdr = (b"OggS" + bytes([0, 0x00]) + struct.pack("<q", -1)
           + struct.pack("<I", synth.OGG_SERIAL) + struct.pack("<I", 2)
           + b"\x00\x00\x00\x00" + bytes([2, 255, 255]))
    pg = bytearray(hdr + part1)
    pg[22:26] = struct.pack("<I", crc32(bytes(pg)))
    pages.append(bytes(pg))
    pages.append(synth.ogg_page(3, 960, 0x04 | 0x01, part2))
    b = b"".join(pages)
    audio.validate_opus_stream(b)  # reassembles and validates the packet


def test_opus_continuation_flag_mismatch_is_violation():
    """A page claiming continuation with no open packet (or vice versa) is
    a framing violation even when its CRC verifies."""
    b = bytearray(_opus_fixture(5000))
    # find the second data page and set its continued flag
    pos, page_idx = 0, 0
    target = None
    while pos < len(b):
        n_segs = b[pos + 26]
        plen = 27 + n_segs + sum(b[pos + 27 : pos + 27 + n_segs])
        if page_idx == 3:
            target = pos
            break
        pos += plen
        page_idx += 1
    assert target is not None
    b[target + 5] |= 0x01
    pg = bytearray(b[target : target + plen])
    pg[22:26] = b"\x00\x00\x00\x00"
    b[target + 22 : target + 26] = __import__("struct").pack(
        "<I", crc32(bytes(pg)))
    audio.validate_ogg_stream(bytes(b))  # CRCs fine
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_packets(bytes(b))


def test_opus_bad_opushead_is_violation():
    """OpusHead with a family-0 channel count of 3 (or a wrong version) is
    rejected at the packet layer."""
    b = bytearray(_opus_fixture(2000))
    n_segs = b[26]
    payload_at = 27 + n_segs
    for patch_off, val in ((9, 3), (8, 2)):  # channels=3; version=2
        bb = bytearray(b)
        bb[payload_at + patch_off] = val
        pg = bytearray(bb[: payload_at + sum(b[27 : 27 + n_segs])])
        pg[22:26] = b"\x00\x00\x00\x00"
        bb[22:26] = __import__("struct").pack("<I", crc32(bytes(pg)))
        audio.validate_ogg_stream(bytes(bb))
        with pytest.raises(ValueError, match="bad_opus_packet"):
            audio.validate_opus_packets(bytes(bb))


def test_opus_granules_are_cumulative_durations():
    """The generator's page granules equal the running 48 kHz sample count
    of completed packets — the cross-field consistency the monotonicity
    check rides on."""
    from engine.oggcrc import as_u8
    import struct

    b = _opus_fixture(20000)
    mv = as_u8(b)
    spans = audio._ogg_packet_spans(mv)
    # recompute durations per audio packet
    durs = [audio._check_opus_packet(
        mv[s:e] if len(pk) == 1 else np.frombuffer(
            b"".join(bytes(mv[s2:e2]) for s2, e2 in pk), np.uint8))
        for pk in spans[2:] for (s, e) in [pk[0]]]
    # walk pages, collect granules of data pages
    pos, page_i, packets_done, cum = 0, 0, 0, 0
    k = 0
    while pos < len(mv):
        n_segs = mv[pos + 26]
        lac = mv[pos + 27 : pos + 27 + n_segs]
        granule = struct.unpack("<q", bytes(mv[pos + 6 : pos + 14]))[0]
        done_here = int(np.sum(np.asarray(lac) < 255))
        if page_i >= 2:
            for _ in range(done_here):
                cum += durs[k]
                k += 1
            assert granule == cum, (page_i, granule, cum)
        pos += 27 + n_segs + int(np.sum(lac))
        page_i += 1
    assert k == len(durs)


# ---------------------------------------------------------------------------
# opus granule-position arithmetic (r6b — RFC 7845 §4 behind monotonicity)
# ---------------------------------------------------------------------------

def _page_offsets(b):
    """(offset, length) of every Ogg page in ``b``."""
    out, pos = [], 0
    while pos < len(b):
        n_segs = b[pos + 26]
        plen = 27 + n_segs + sum(b[pos + 27 : pos + 27 + n_segs])
        out.append((pos, plen))
        pos += plen
    return out


def _rewrite_granule(b, page_idx, granule):
    """Set one page's granule field and recompute its CRC — every checksum
    in the stream stays valid."""
    import struct

    b = bytearray(b)
    pos, plen = _page_offsets(b)[page_idx]
    b[pos + 6 : pos + 14] = struct.pack("<q", granule)
    pg = bytearray(b[pos : pos + plen])
    pg[22:26] = b"\x00\x00\x00\x00"
    b[pos + 22 : pos + 26] = struct.pack("<I", crc32(bytes(pg)))
    return bytes(b)


def _page_granules(b):
    import struct

    return [struct.unpack("<q", bytes(b[p + 6 : p + 14]))[0]
            for p, _ in _page_offsets(b)]


def test_opus_granule_inflation_caught_only_by_arithmetic():
    """+1 sample on one mid-stream page's granule: still strictly monotone
    (the page walk's check passes), every CRC valid, framing clean — only
    the RFC 7845 §4 cumulative-duration arithmetic can see it."""
    b = _opus_fixture()
    n_pages = len(_page_offsets(b))
    mid = n_pages // 2  # a data page well past the two header pages
    bad = _rewrite_granule(b, mid, _page_granules(b)[mid] + 1)
    audio.validate_ogg_stream(bad)  # CRCs + monotonicity all pass
    audio.validate_opus_stream(b)
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_stream(bad)


def test_opus_header_page_granule_must_be_zero():
    """The OpusTags page carries granule 0 by spec; a nonzero value with a
    valid CRC is a cross-field violation."""
    b = _opus_fixture(6000)
    bad = _rewrite_granule(b, 1, 960)
    audio.validate_ogg_stream(bad)
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_packets(bad)


def test_opus_eos_end_trim_is_legal_but_overclaim_is_not():
    """RFC 7845 lets the EOS page trim samples its own packets supplied
    (granule < cumulative) — that must PASS; claiming MORE audio than the
    packets contain must fail."""
    b = _opus_fixture(9000)
    last = len(_page_offsets(b)) - 1
    g = _page_granules(b)
    trimmed = _rewrite_granule(b, last, g[last] - 60)  # < last page's samples
    audio.validate_opus_stream(trimmed)
    overclaim = _rewrite_granule(b, last, g[last] + 480)
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_stream(overclaim)


def test_opus_eos_cannot_trim_more_than_its_own_page():
    """Trimming below the PREVIOUS page's cumulative position would erase
    samples from pages already granule-stamped — rejected even though the
    value stays non-negative and the walk's monotonicity still holds iff
    equal; use exactly prev granule - 1 to keep CRCs the only other gate."""
    b = _opus_fixture(9000)
    pages = _page_offsets(b)
    g = _page_granules(b)
    last = len(pages) - 1
    bad = _rewrite_granule(b, last, g[last - 1] - 1)
    with pytest.raises(ValueError, match="bad_"):
        audio.validate_opus_stream(bad)  # walk's monotonicity fires first
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_packets(bad)  # arithmetic catches it standalone


def test_opus_open_page_granule_must_be_minus_one():
    """A page that completes no packet must carry granule -1 (RFC 3533 §6);
    re-stamping the spanning fixture's open page with 0 is a violation."""
    import struct

    toc = 31 << 3
    pkt = bytes([toc]) + b"q" * 1274
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
            + struct.pack("<I", 16000) + struct.pack("<h", 0) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    part1, part2 = pkt[:510], pkt[510:]
    pages = [synth.ogg_page(0, 0, 0x02, head), synth.ogg_page(1, 0, 0x00, tags)]
    hdr = (b"OggS" + bytes([0, 0x00]) + struct.pack("<q", -1)
           + struct.pack("<I", synth.OGG_SERIAL) + struct.pack("<I", 2)
           + b"\x00\x00\x00\x00" + bytes([2, 255, 255]))
    pg = bytearray(hdr + part1)
    pg[22:26] = struct.pack("<I", crc32(bytes(pg)))
    pages.append(bytes(pg))
    pages.append(synth.ogg_page(3, 960, 0x04 | 0x01, part2))
    good = b"".join(pages)
    audio.validate_opus_stream(good)
    bad = _rewrite_granule(good, 2, 0)
    with pytest.raises(ValueError, match="bad_opus_packet"):
        audio.validate_opus_stream(bad)
