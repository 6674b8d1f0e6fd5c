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


# ---------------------------------------------------------------------------
# fixed-predictor / Rice subframes (r5)
# ---------------------------------------------------------------------------

def _i16(out: np.ndarray) -> np.ndarray:
    return (out * np.float32(32768.0)).astype(np.int16)


def _sine(n, f=300, sr=8000, noise=60, seed=3):
    rng = np.random.default_rng(seed)
    return (
        np.sin(2 * np.pi * f * np.arange(n) / sr) * 20000
        + rng.uniform(-noise, noise, n)
    ).astype(np.int16)


def test_fixed_roundtrip_all_orders():
    pcm = _sine(9000)
    for order in range(5):
        b = flac.streaminfo(8000, len(pcm)) + flac.encode_frames(
            pcm, predictor="fixed", fixed_order=order
        )
        out = flac.decode(b)
        assert np.array_equal(_i16(out), pcm), order


def test_fixed_roundtrip_best_order_various_shapes():
    rng = np.random.default_rng(5)
    shapes = [
        rng.integers(-32768, 32767, 4000).astype(np.int16),   # rough -> order 0
        np.full(5000, 1234, np.int16),                         # constant-ish
        (np.arange(5000) % 20000 - 10000).astype(np.int16),    # ramp
        _sine(200_000),                                        # long clip
        _sine(1), _sine(2), _sine(5),                          # tiny tails
    ]
    for i, pcm in enumerate(shapes):
        b = flac.encode(pcm, 16000, predictor="fixed")
        assert np.array_equal(_i16(flac.decode(b)), pcm), i


def test_fixed_every_body_byte_flip_detected():
    """Single-byte corruption anywhere in a fixed-predictor stream is caught
    (CRC-8/CRC-16/structure) or decodes identically — never a silent wrong
    decode. The rice bit parser must never escape with IndexError etc."""
    pcm = _sine(5000)
    b = bytearray(flac.encode(pcm, 8000, predictor="fixed"))
    rng = np.random.default_rng(2)
    idx = rng.choice(np.arange(4, len(b)), size=250, replace=False)
    for i in idx:
        orig = b[i]
        b[i] ^= 0xA5
        try:
            out = flac.decode(bytes(b))
            assert np.array_equal(_i16(out), pcm), int(i)
        except (ValueError, NotImplementedError):
            pass
        b[i] = orig


def test_warmup_corruption_valid_but_wrong():
    """corrupt_warmup emits a VALID stream (all CRCs pass) whose decode
    differs from the source by a constant +4096/32768 offset per frame —
    the plant only reconstruction + SNR compare can catch."""
    pcm = _sine(9000)
    b = flac.encode(pcm, 8000, predictor="fixed", corrupt_warmup=True)
    out = flac.decode(b)  # must NOT raise: stream is structurally valid
    diff = _i16(out).astype(np.int64) - pcm
    assert np.abs(diff).max() == 4096
    assert (diff != 0).mean() > 0.99


def test_fixed_partitioned_and_rice2_and_escape_decode():
    """Hand-built subframes exercising shapes our encoder never emits but
    real encoders do: partition order 2, coding method 1 (rice2), and an
    escape (raw-width) partition."""
    bs = 4080
    pcm = _sine(bs)
    for method, porder, escape_part in [(0, 2, None), (1, 3, None), (0, 2, 1)]:
        order = 2
        resid = flac.fixed_residual(pcm, order)
        u = flac.zigzag(resid)
        part_n = bs >> porder
        pbits = 4 if method == 0 else 5
        head = [0, 1] if method else [0, 0]
        bits = [np.array(head, np.uint8)]
        bits.append(np.array([(porder >> (3 - j)) & 1 for j in range(4)], np.uint8))
        off = 0
        for pi in range(1 << porder):
            cnt = part_n - order if pi == 0 else part_n
            seg = u[off : off + cnt]
            off += cnt
            if escape_part is not None and pi == escape_part:
                nb = 17  # raw 17-bit two's complement
                esc = (1 << pbits) - 1
                bits.append(np.array([(esc >> (pbits - 1 - j)) & 1 for j in range(pbits)], np.uint8))
                bits.append(np.array([(nb >> (4 - j)) & 1 for j in range(5)], np.uint8))
                sv = flac.unzigzag(seg) & ((1 << nb) - 1)
                raw = np.zeros(cnt * nb, np.uint8)
                for j in range(nb):
                    raw[j::nb] = (sv >> (nb - 1 - j)) & 1
                bits.append(raw)
            else:
                k = flac.best_rice_k(seg, max_k=(14 if method == 0 else 30))
                bits.append(np.array([(k >> (pbits - 1 - j)) & 1 for j in range(pbits)], np.uint8))
                bits.append(flac.rice_encode_bits(seg, k))
        tail = np.packbits(np.concatenate(bits))
        sub = (
            bytes([(0x08 + order) << 1])
            + pcm[:order].astype(">i2").tobytes()
            + tail.tobytes()
        )
        import struct as _s

        hdr = bytes([0xFF, 0xF8, 0x70, 0x08]) + flac.utf8_encode(0)
        hdr += _s.pack(">H", bs - 1)
        hdr += bytes([flac.crc8(hdr)])
        frame = hdr + sub
        frame += _s.pack(">H", flac.crc16(frame))
        b = flac.streaminfo(8000, bs) + frame
        out = flac.decode(b)
        assert np.array_equal(_i16(out), pcm), (method, porder, escape_part)


def test_reserved_subframe_type_is_violation_wasted_is_stub():
    pcm = _sine(3000)
    b = bytearray(flac.encode(pcm, 8000, predictor="fixed"))
    # find the subframe header byte: streaminfo(42) + frame header 8 bytes
    sub_at = 42 + 8
    orig = b[sub_at]
    b[sub_at] = 0x03 << 1  # reserved type 3 -> corruption
    with pytest.raises(ValueError, match="bad_flac_frame"):
        flac.decode(bytes(b))
    b[sub_at] = 0x20 << 1  # LPC header over a fixed-frame body (r5b: LPC is
    with pytest.raises(ValueError):  # IN subset now, so this is corruption)
        flac.decode(bytes(b))
    b[sub_at] = orig | 0x01  # wasted-bits flag -> out of subset
    with pytest.raises(NotImplementedError):
        flac.decode(bytes(b))


def test_lpc_roundtrip_and_fuzz():
    """Order-8 LPC subframes (quantized Levinson-Durbin coefficients):
    lossless round trip, and every single-byte corruption is caught or
    decodes identically — never a silent wrong decode or a stray
    exception class."""
    pcm = _sine(9000, f=180, noise=80, seed=9)
    b = flac.encode(pcm, 8000, predictor="lpc")
    assert np.array_equal(_i16(flac.decode(b)), pcm)
    ba = bytearray(b)
    rng = np.random.default_rng(4)
    idx = rng.choice(np.arange(4, len(ba)), size=250, replace=False)
    for i in idx:
        orig = ba[i]
        ba[i] ^= 0xA5
        try:
            out = flac.decode(bytes(ba))
            assert np.array_equal(_i16(out), pcm), int(i)
        except (ValueError, NotImplementedError):
            pass
        ba[i] = orig


def test_lpc_negative_shift_and_forbidden_precision_are_violations():
    import struct as _s

    pcm = _sine(2000)
    b = flac.encode(pcm, 8000, predictor="lpc")
    ba = bytearray(b)
    # locate the precision/shift byte: streaminfo(42) + frame hdr 8 +
    # subframe hdr 1 + warmup 16 = byte 67: [prec-1(4) | shift hi 4]
    at = 42 + 8 + 1 + 16
    orig = ba[at]
    ba[at] = 0xF0 | (orig & 0x0F)  # precision code 0b1111 is forbidden
    with pytest.raises(ValueError, match="bad_flac_frame"):
        flac.decode(bytes(ba))
    ba[at] = (orig & 0xF0) | 0x0F  # shift sign bit set -> negative shift
    ba[at + 1] = ba[at + 1] | 0x80
    with pytest.raises(ValueError, match="bad_flac_frame"):
        flac.decode(bytes(ba))


def test_fixed_constant_subframe_decode():
    """CONSTANT subframes (real encoders emit them for silence)."""
    import struct as _s

    bs, val = 4080, -777
    hdr = bytes([0xFF, 0xF8, 0x70, 0x08]) + flac.utf8_encode(0)
    hdr += _s.pack(">H", bs - 1)
    hdr += bytes([flac.crc8(hdr)])
    frame = hdr + b"\x00" + _s.pack(">h", val)
    frame += _s.pack(">H", flac.crc16(frame))
    b = flac.streaminfo(8000, bs) + frame
    out = _i16(flac.decode(b))
    assert np.array_equal(out, np.full(bs, val, np.int16))
