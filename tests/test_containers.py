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
