"""FLAC verbatim-subset codec (engine/flac.py): CRC correctness, lossless
round trip, and corruption detection. No Spark needed — pure numpy."""

from __future__ import annotations

import numpy as np
import pytest

from engine import flac


def _crc16_ref(data: bytes) -> int:
    """Bit-by-bit reference CRC-16 (poly 0x8005, init 0, no reflection)."""
    r = 0
    for b in bytes(data):
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
    return r


def test_crc16_known_vector():
    # CRC-16/BUYPASS check value
    assert flac.crc16(b"123456789") == 0xFEE8


def test_crc16_matches_bitwise_reference():
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 3, 9, 64, 100, 4095, 4096, 4097, 8193):
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert flac.crc16(d) == _crc16_ref(d), n


def test_utf8_frame_number_roundtrip():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1):
        enc = flac.utf8_encode(v)
        dec, pos = flac.utf8_decode(enc, 0)
        assert (dec, pos) == (v, len(enc)), v


def test_encode_decode_lossless():
    rng = np.random.default_rng(0)
    for n in (1, 100, 4096, 4097, 9216, 200_000):
        pcm = rng.integers(-32768, 32767, n).astype(np.int16)
        out = flac.decode(flac.encode(pcm, 16000))
        assert out.dtype == np.float32
        assert np.array_equal((out * np.float32(32768.0)).astype(np.int16), pcm), n


def test_every_body_byte_flip_detected():
    """Any single-byte corruption anywhere past the magic is caught (CRC-8 on
    headers, CRC-16 on frames, STREAMINFO checks on metadata) — never a
    silent wrong decode."""
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32767, 5000).astype(np.int16)
    b = bytearray(flac.encode(pcm, 8000))
    idx = rng.choice(np.arange(4, len(b)), size=200, replace=False)
    for i in idx:
        orig = b[i]
        b[i] ^= 0xA5
        try:
            out = flac.decode(bytes(b))
            # a flip inside STREAMINFO's sr/total-sample fields can still
            # parse; it must then FAIL the sample-count cross-check (already
            # raised) or change nothing we verify — assert no silent PCM diff
            assert np.array_equal(
                (out * np.float32(32768.0)).astype(np.int16), pcm
            ), int(i)
        except (ValueError, NotImplementedError):
            pass
        b[i] = orig


def test_header_corruption_is_header_error():
    pcm = np.zeros(2000, dtype=np.int16)
    b = flac.encode(pcm, 8000)
    with pytest.raises(ValueError, match="bad_flac_header"):
        flac.decode(b"XXXX" + b[4:])


def test_truncated_stream_detected():
    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32767, 9000).astype(np.int16)
    b = flac.encode(pcm, 8000)
    with pytest.raises(ValueError, match="bad_flac_frame"):
        flac.decode(b[: len(b) - 100])


def test_streaminfo_sr_override_keeps_payload():
    """The sr_metadata_mismatch plant: STREAMINFO declares 2x, frames carry
    the true signal — decode succeeds, container_sr reports the declared."""
    from engine import audio

    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, 3000).astype(np.int16)
    b = flac.encode(pcm, 8000, streaminfo_sr=16000)
    out = flac.decode(b)
    assert np.array_equal((out * np.float32(32768.0)).astype(np.int16), pcm)
    assert audio.container_sr(b[:256], "flac") == 16000


def test_signed_buffer_protocol():
    """pa.Buffer exposes format 'b' (signed); decode must normalize."""
    import pyarrow as pa

    pcm = np.arange(-1000, 1000, dtype=np.int16)
    b = flac.encode(pcm, 8000)
    buf = pa.array([b], type=pa.binary())[0].as_buffer()
    out = flac.decode(buf)
    assert np.array_equal((out * np.float32(32768.0)).astype(np.int16), pcm)


def test_wav_container_sr_chunk_walk():
    """container_sr walks RIFF chunks: a JUNK chunk before fmt must not
    break the read (ADVICE round 2: fixed-offset read compared garbage)."""
    import struct

    from engine import audio, synth

    pcm = np.zeros(100, dtype=np.int16)
    canonical = synth.wav_bytes(pcm, 22050)
    assert audio.container_sr(canonical[:256], "wav") == 22050
    # same wav with a junk chunk injected between 'WAVE' and 'fmt '
    junk = b"JUNK" + struct.pack("<I", 10) + b"\x00" * 10
    padded = canonical[:12] + junk + canonical[12:]
    assert audio.container_sr(padded[:256], "wav") == 22050
    assert audio.container_sr(b"\x00" * 64, "wav") is None


def test_truncation_at_frame_number_is_valueerror():
    """Regression (r3 review): truncating right after a multi-byte frame
    number lead byte must raise ValueError, never IndexError — an IndexError
    would escape the audio UDF's per-row exception contract and kill the
    whole Spark task."""
    pcm = np.zeros(2000, dtype=np.int16)
    b = flac.encode(pcm, 8000)
    # cut inside the first frame header (after sync + codes, at the frame
    # number position) and also force a multi-byte-looking lead byte
    for cut in range(43, 52):
        with pytest.raises(ValueError):
            flac.decode(b[:cut])
    ba = bytearray(b[:47])
    ba[46] = 0xC0  # lead byte announcing a continuation that isn't there
    with pytest.raises(ValueError):
        flac.decode(bytes(ba))


def test_variable_blocksize_routes_to_stub():
    """Valid-but-out-of-subset frames (variable-blocksize strategy) must hit
    the documented plumbing-pass path, not be decoded under fixed-blocksize
    assumptions."""
    pcm = np.zeros(2000, dtype=np.int16)
    ba = bytearray(flac.encode(pcm, 8000))
    ba[43] |= 0x01  # blocking-strategy bit of the first frame header
    with pytest.raises(NotImplementedError, match="flac_subset"):
        flac.decode(bytes(ba))
