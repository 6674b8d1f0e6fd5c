"""Deterministic synthetic fixtures (FIXTURES.md schemas).

Seeded, pure-function generation — same (seed, n) => byte-identical tables —
mirroring the reference's reproducibility pinning (``models/utils.py:158-165``,
seed=42 at ``anomaly_detection.py:22``). Audio payloads follow the reference's
noisy 2-harmonic sine generator semantics (``models/utils.py:123-138``):
``a1*sin(wt) + a2*sin(2wt) + U(-eps, eps)``, PCM16 in a canonical WAV wrapper.

Violations are planted at keys derivable from ``id`` alone (modular rules
below), the Spark analog of the reference's filename-encoded labeled anomaly
intervals (``models/utils.py:34-39``) that predictions are checked against
(``anomaly_detection.py:463-465``). ``plant_manifest(n)`` recomputes the
ground truth; tests assert the engine reports exactly those keys.

Generation is DISTRIBUTED: ``spark.range(n)`` + ``mapInPandas`` with a
per-row-id-seeded RNG — no driver-side materialization, so the same generator
scales to the bench fixture sizes (and would scale to 10^12 rows on a real
cluster: the only driver state is the scalar params).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

# ---- planting rules (id-derivable ground truth) -----------------------------
RULES = {
    "clip_id_duplicate": (1000, 7),      # row duplicated (uniqueness violation)
    "payload_corrupt": (2000, 13),       # truncated / wrong-amplitude bytes
    "sr_hz_out_of_domain": (2000, 17),   # 11025
    "dur_ms_zero": (2000, 19),           # 0 (below range)
    "dur_ms_huge": (4000, 21),           # 3_600_000 (above range)
    "codec_out_of_domain": (2000, 23),   # "wma"
    "transcript_mismatch": (2000, 29),   # transcripts.transcript_gold differs
    "transcript_null": (500, 3),
    "codec_null": (500, 11),
    "dangling_fk": (1000, 37),           # clip_id missing from transcripts
    "container_header_corrupt": (3000, 41),  # flac/opus/mp3 with broken header
    "sr_metadata_mismatch": (4000, 43),      # container declares 2x the column sr
    "flac_body_corrupt": (2000, 47),         # valid header, corrupted frame body
    "container_body_corrupt": (3000, 53),    # opus/mp3: corruption PAST the first
                                             # page/frame — only a full chain walk
                                             # sees it. mp3: broken mid-chain sync.
                                             # opus alternates two depths (r6, see
                                             # opus_body_corrupt_is_framing): a
                                             # packet-FRAMING plant with every page
                                             # CRC valid (only the RFC 6716 walk
                                             # sees it) / a page-CRC byte flip
    "flac_warmup_corrupt": (2000, 59),       # fixed-predictor frames whose WRITTEN
                                             # warmup samples are shifted: every CRC
                                             # verifies, only genuine predictor
                                             # reconstruction + SNR sees it (r5)
    "flac_stereo_side_corrupt": (2000, 63),  # STEREO left-side frames whose SIDE
                                             # subframe warmup is shifted: every CRC
                                             # verifies, both subframes decode, but
                                             # R = L - side is offset — only genuine
                                             # stereo decorrelation + SNR sees it
                                             # (63%8==7 -> in the stereo share;
                                             # 63%16==15 -> 24-bit; 63%3==0 -> the
                                             # Ogg-FLAC container: the deepest
                                             # reconstruction plant in the mix, r6)
    "mp3_sideinfo_corrupt": (3000, 71),      # mp3 frames whose side info claims
                                             # main_data_begin=511 with no backing
                                             # reservoir: every header and frame
                                             # length stays valid — only the Layer
                                             # III side-info/bit-reservoir walk
                                             # sees it (r6)
}

#: stereo / 24-bit shares of the flac mix (r6). Residues chosen so every
#: flac-forcing plant keeps its r5 shape unless stated: mod-2000/1000/500
#: rules have a FIXED residue mod 8/16 (8 | 2000), so 13,17,41,43,47,59...
#: stay mono EXCEPT flac_body_corrupt (47%16==15: 24-bit stereo — its CRC-16
#: violation is shape-independent) and the new stereo plant (63). i%8==2 is
#: even -> verbatim-coded stereo; i%8==7 is odd -> fixed-predictor stereo;
#: LPC ids (21 mod 32 -> 5 mod 8) stay mono so the bounded LPC cost is
#: unchanged. 24-bit: i%16==6 -> mono verbatim, i%16==15 -> stereo fixed.


def flac_is_stereo(i: int) -> bool:
    return i % 8 in (2, 7)


def flac_is_24bit(i: int) -> bool:
    return i % 16 in (6, 15)


#: phase offset of the RIGHT channel's wave vs the left (same f1): full
#: stereo image, no harmonic cancellation in the downmix (cos(0.5)=0.88,
#: cos(1.0)=0.54 keep both harmonics present in (L+R)/2)
STEREO_PHASE_OFFSET = 1.0

#: codec cycle for container_body_corrupt plants (same pattern as the header
#: cycle): alternates the two chain-validated stub codecs
BODY_CORRUPT_CYCLE = ("opus", "mp3")


def body_corrupt_codec(i: int) -> str:
    mod, off = RULES["container_body_corrupt"]
    return BODY_CORRUPT_CYCLE[((i - off) // mod) % 2]


def opus_body_corrupt_is_framing(i: int) -> bool:
    """The opus instances of container_body_corrupt (k even) alternate two
    corruption depths: k%4==0 -> a FRAMING plant (one packet's length field
    over-claims; every page CRC recomputed and valid — only the RFC 6716
    packet walk sees it, r6), k%4==2 -> a raw byte flip (breaks that
    page's CRC-32 — the mid-chain page-CRC catch). At n=2000 the single
    opus plant (id 53) is the deeper framing flavor."""
    mod, off = RULES["container_body_corrupt"]
    return ((i - off) // mod) % 4 == 0

#: codec cycle for container_header_corrupt plants: the k-th planted id
#: (k = (i - off) // mod) gets cycle[k % 3] — varies the codec across plants
#: even though the rule's modulus is a multiple of 3
HEADER_CORRUPT_CYCLE = ("flac", "opus", "mp3")


def header_corrupt_codec(i: int) -> str:
    mod, off = RULES["container_header_corrupt"]
    return HEADER_CORRUPT_CYCLE[((i - off) // mod) % 3]

SR_DOMAIN = np.array([8000, 16000, 22050, 44100])
SR_WEIGHTS = np.array([0.80, 0.10, 0.07, 0.03])
CODEC_DOMAIN = np.array(["pcm_s16le", "flac", "opus", "mp3"])
CODEC_WEIGHTS = np.array([0.70, 0.15, 0.10, 0.05])
VOCAB = [f"word{i:04d}" for i in range(1000)]

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def _hit(ids: np.ndarray, rule: str) -> np.ndarray:
    mod, off = RULES[rule]
    return ids % mod == off


def planted_ids(n: int, rule: str) -> list[int]:
    mod, off = RULES[rule]
    return list(range(off, n, mod))


def plant_manifest(n: int) -> dict[str, list[str]]:
    """Ground truth: constraint -> sorted clip_ids planted as violations."""
    m = {rule: [f"clip_{i:010d}" for i in planted_ids(n, rule)] for rule in RULES}
    return m


def _rng(i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([SEED, int(i)]))


def wav_header(sr: int, data_len: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for a PCM16 mono payload of
    ``data_len`` bytes — the single source of the header layout (the
    segmenter in engine/features.py emits the same bytes)."""
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_len, b"WAVE",
        b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16,
        b"data", data_len,
    )


def wav_bytes(pcm: np.ndarray, sr: int) -> bytes:
    """Canonical WAV: header + PCM16 mono payload."""
    data = pcm.astype("<i2").tobytes()
    return wav_header(sr, len(data)) + data


def _ogg_crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


OGG_CRC_TABLE = _ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection, no final xor."""
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ byte]
    return crc


OGG_SERIAL = 0x5EED
OGG_PAGE_DATA = 4000  # bytes of packet data per page; keeps a page's word
                      # count under the CRC tree's next power-of-two boundary


def ogg_page(seq: int, granule: int, header_type: int, packet: bytes) -> bytes:
    """One complete Ogg page (correct lacing + CRC) carrying ``packet``."""
    return ogg_page_multi(seq, granule, header_type, [packet])


def ogg_page_multi(
    seq: int, granule: int, header_type: int, packets: list[bytes]
) -> bytes:
    """One complete Ogg page carrying several whole packets — each gets its
    own lacing run ([255]*k + rem), so the packet boundaries survive
    reassembly (the opus framing walk depends on them)."""
    lacing = b"".join(
        bytes([255] * k + [rem])
        for k, rem in (divmod(len(p), 255) for p in packets)
    )
    assert len(lacing) <= 255, "too many lacing values for one page"
    packet = b"".join(packets)
    header = (
        b"OggS" + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", OGG_SERIAL)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"                         # crc placeholder
        + bytes([len(lacing)]) + lacing
    )
    from engine.oggcrc import crc32  # vectorized; == scalar ogg_crc (tested)

    page = bytearray(header + packet)
    page[22:26] = struct.pack("<I", crc32(bytes(page)))
    return bytes(page)


#: 20 ms TOC configs cycled across synthesized opus packets — one from each
#: operating mode/bandwidth family (SILK NB/MB/WB, hybrid, CELT NB-FB), so
#: the framing walk sees every mode class while M*960 <= 5760 stays legal
#: for every code-3 packet (RFC 6716 Table 2)
OPUS_CFGS = (1, 5, 9, 15, 19, 23, 27, 31)

#: bytes of body consumed per synthesized packet (every frame stays under
#: the 1275-byte R2 ceiling in every code below)
OPUS_CHUNK = 1200


def _opus_len_bytes(length: int) -> bytes:
    """RFC 6716 §3.2.1 frame-length encoding (1 byte < 252, else 2)."""
    if length < 252:
        return bytes([length])
    b0 = 252 + (length - 252) % 4
    return bytes([b0, (length - b0) // 4])


def opus_packets_from_body(body: bytes) -> list[tuple[bytes, int]]:
    """Frame ``body`` into VALID RFC 6716 packets, cycling the five framing
    shapes (code 0; code 1 CBR pair; code 2 explicit-length pair; code 3
    CBR x3; code 3 VBR+padding) and the 20 ms config table. Returns
    [(packet_bytes, samples_48k)] — deterministic in ``body`` alone. A few
    body bytes may be dropped per packet to satisfy CBR divisibility; the
    bytes are opaque (the packet DECODE is stubbed), only framing counts."""
    out = []
    pos, j, n = 0, 0, len(body)
    while pos < n or j == 0:
        d = body[pos : pos + OPUS_CHUNK]
        pos += len(d)
        toc = (OPUS_CFGS[j % 8] << 3) | (((j >> 1) & 1) << 2)
        mode = j % 5
        if mode == 0:        # code 0: single frame
            pkt, m = bytes([toc]) + d, 1
        elif mode == 1:      # code 1: two equal-size CBR frames
            half = len(d) // 2
            pkt, m = bytes([toc | 1]) + d[: 2 * half], 2
        elif mode == 2:      # code 2: explicit first length, VBR pair
            l1 = len(d) // 3
            pkt, m = bytes([toc | 2]) + _opus_len_bytes(l1) + d, 2
        elif mode == 3:      # code 3 CBR, M=3 (frame-count byte 0x03)
            third = len(d) // 3
            pkt, m = bytes([toc | 3, 0x03]) + d[: 3 * third], 3
        else:                # code 3 VBR, M=2, padded by 2 zero bytes
            l1 = len(d) // 2
            pkt = (bytes([toc | 3, 0b11000010, 2])
                   + _opus_len_bytes(l1) + d + b"\x00\x00")
            m = 2
        out.append((pkt, m * 960))
        j += 1
    return out


def ogg_opus_bytes(sr: int, body: bytes, corrupt_framing: bool = False) -> bytes:
    """Structurally COMPLETE Ogg/Opus container: BOS page with a valid
    RFC 7845 OpusHead, an OpusTags page, then the body framed as a chain of
    VALID RFC 6716 packets (r6: all five framing shapes, two packets per
    data page, granule = cumulative 48 kHz samples) — every page with a
    correct CRC, contiguous sequence numbers, EOS on the last. The decode
    seam walks the pages, CRC-checks the chain AND validates every
    packet's framing (packet BODY decode stays stubbed — no codec libs).

    ``corrupt_framing`` rewrites one mid-stream packet's first frame-length
    field to over-claim the packet size, THEN pages and CRCs normally —
    every checksum verifies, the page walk is clean, and only the
    packet-framing walk (audio.validate_opus_packets) can see it: the opus
    analog of the flac warmup / mp3 side-info plants."""
    opus_head = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
        + struct.pack("<I", sr) + struct.pack("<h", 0) + bytes([0])
    )
    opus_tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    pkts = opus_packets_from_body(body)
    if corrupt_framing:
        k = 3 * len(pkts) // 4  # past the first pages, mid-chain
        pkt, samp = pkts[k]
        toc = pkt[0] & 0xF4  # keep config/stereo, force code 2
        bad = bytes([toc | 2]) + _opus_len_bytes(1275) + pkt[1:]
        pkts[k] = (bad, samp)
    pages = [ogg_page(0, 0, 0x02, opus_head), ogg_page(1, 0, 0x00, opus_tags)]
    granule = 0
    for j in range(0, len(pkts), 2):
        group = pkts[j : j + 2]
        granule += sum(s for _, s in group)
        last = j + 2 >= len(pkts)
        pages.append(ogg_page_multi(
            2 + j // 2, granule, 0x04 if last else 0x00, [p for p, _ in group]
        ))
    return b"".join(pages)


def ogg_flac_bytes(
    sr: int,
    pcm: np.ndarray,
    streaminfo_sr: int | None = None,
    corrupt_frames: bool = False,
    predictor: str = "verbatim",
    corrupt_warmup: bool = False,
    channels: int = 1,
    bps: int = 16,
    corrupt_side_warmup: bool = False,
    mode_seed: int = 0,
) -> bytes:
    """Ogg-encapsulated FLAC (the xiph 'FLAC-to-Ogg mapping', public spec):
    BOS page carries one packet [0x7F 'FLAC' major=1 minor=0 n_header(2 BE)
    + 'fLaC' + STREAMINFO(not-last)]; page 1 carries a VORBIS_COMMENT block
    (last); data pages carry the same verbatim-subset frame stream as the
    native container, every page CRC-32'd with contiguous sequence numbers
    and EOS on the last.

    ``corrupt_frames`` flips bytes INSIDE a frame body BEFORE paging, so the
    page chain stays fully valid and only the FLAC frame CRC-16 *behind* the
    Ogg layer can catch it — the flac_body_corrupt plant for this container
    (proves the engine genuinely decodes the FLAC stream through Ogg, not
    just the page CRCs)."""
    from engine import flac as flac_mod

    si = flac_mod.streaminfo(
        streaminfo_sr or sr, len(pcm) // channels, channels=channels, bps=bps
    )
    # clear the last-metadata-block flag: a VORBIS_COMMENT block follows
    hdr_packet = (
        b"\x7fFLAC\x01\x00" + struct.pack(">H", 1)
        + si[:4] + bytes([si[4] & 0x7F]) + si[5:]
    )
    vc = struct.pack("<I", 0) + struct.pack("<I", 0)  # empty vendor, 0 tags
    vc_packet = bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
    frames = flac_mod.encode_frames(
        pcm, predictor=predictor, corrupt_warmup=corrupt_warmup,
        channels=channels, bps=bps, corrupt_side_warmup=corrupt_side_warmup,
        mode_seed=mode_seed,
    )
    if corrupt_frames:
        ba = bytearray(frames)
        for k in range(18, min(34, len(ba))):  # inside the first frame body
            ba[k] ^= 0xA5
        frames = bytes(ba)
    pages = [ogg_page(0, 0, 0x02, hdr_packet), ogg_page(1, 0, 0x00, vc_packet)]
    chunks = [
        frames[i : i + OGG_PAGE_DATA]
        for i in range(0, max(len(frames), 1), OGG_PAGE_DATA)
    ]
    for j, ch in enumerate(chunks):
        last = j == len(chunks) - 1
        pages.append(
            ogg_page(2 + j, flac_mod.BLOCKSIZE * (j + 1), 0x04 if last else 0x00, ch)
        )
    return b"".join(pages)


#: MPEG-1 Layer III bitrate (kbps) and sample-rate tables (public header spec)
MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
MP3_RATES = (44100, 48000, 32000)


def mp3_frame_len(b1: int, b2: int) -> int:
    """Frame length in bytes from header bytes 2-3 (MPEG-1 Layer III)."""
    bitrate = MP3_BITRATES[(b2 >> 4) & 0x0F] * 1000
    sr = MP3_RATES[(b2 >> 2) & 0x03]
    padding = (b2 >> 1) & 0x01
    return 144 * bitrate // sr + padding


#: MPEG-1 side-info length by channel count (Layer III, no CRC)
MP3_SIDE_LEN = {1: 17, 2: 32}


def _mp3_side_info(md_begin: int, p23s: list[int], channels: int = 2) -> bytes:
    """Layer III side info (MPEG-1): main_data_begin + one 59-bit block per
    granule x channel with part2_3_length set; the remaining fields carry
    fixed in-range values (big_values=100, long-block window). Built as one
    big int, bit layout per the public ISO 11172-3 table."""
    nblk = 2 * channels
    total = MP3_SIDE_LEN[channels] * 8
    si = 0
    pos = 0

    def put(v: int, nb: int) -> None:
        nonlocal si, pos
        si |= (v & ((1 << nb) - 1)) << (total - pos - nb)
        pos += nb

    put(md_begin, 9)
    put(0, 5 if channels == 1 else 3)      # private bits
    put(0, 4 * channels)                   # scfsi
    for p23 in p23s[:nblk]:
        put(p23, 12)
        put(100, 9)                        # big_values <= 288
        put(120, 8)                        # global_gain
        put(0, 4)                          # scalefac_compress
        put(0, 1)                          # window_switching = 0 (long block)
        put(0, 15)                         # table_select x3
        put(0, 4)                          # region0_count
        put(0, 3)                          # region1_count
        put(0, 3)                          # preflag, scalefac_scale, count1table
    assert pos == total
    return si.to_bytes(total // 8, "big")


def mp3_bytes(body: bytes, corrupt_sideinfo: bool = False) -> bytes:
    """Structurally COMPLETE MP3: a chain of MPEG-1 Layer III frames (sync +
    valid bitrate/samplerate indices, correct frame lengths, zero-padded
    tail) covering the whole body — and, since r6, each frame carries a
    CONSISTENT side-info section: part2_3_length values that fit the frame's
    main data plus the accumulated bit reservoir, with main_data_begin
    chained across frames (the leftover cycles 4/104/204 bytes so the
    reservoir is genuinely exercised). The decode seam walks every header
    AND re-runs this reservoir arithmetic.

    ``corrupt_sideinfo`` plants main_data_begin=511 at ~3/4 of the chain —
    every header stays valid and every frame length correct, so the header
    walk alone provably cannot see it; only the side-info/reservoir
    validation can (the r6 mp3 analog of the flac warmup plants)."""
    # 0xFF 0xFB: sync, MPEG-1, Layer III, no CRC; 0x90: 128kbps, 44100, no pad
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    flen = mp3_frame_len(0xFB, 0x90)                  # 417 incl. header
    side_len = MP3_SIDE_LEN[2]
    main_per_frame = flen - 4 - side_len
    nframes = max(1, -(-max(len(body), 1) // main_per_frame))
    bad_at = (3 * nframes) // 4 if corrupt_sideinfo else -1
    out = []
    reservoir = 0
    for fi in range(nframes):
        ch = body[fi * main_per_frame : (fi + 1) * main_per_frame]
        ch = ch + b"\x00" * (main_per_frame - len(ch))
        md_begin = min(reservoir, 255)
        avail_bits = 8 * (md_begin + main_per_frame)
        # leftover cycles so later frames genuinely draw on the reservoir
        spend = avail_bits - 32 - 800 * (fi % 3)
        p23s = [spend // 4] * 3 + [spend - 3 * (spend // 4)]
        if fi == bad_at:
            # reservoir claim no prior frame backs: headers/lengths all
            # stay valid, only the side-info walk sees it
            out.append(hdr + _mp3_side_info(511, p23s) + ch)
        else:
            out.append(hdr + _mp3_side_info(md_begin, p23s) + ch)
        consumed = (sum(p23s) + 7) // 8
        # FIFO model: the new reservoir is whatever of [md_begin bytes of
        # old reservoir + this frame's main section] the frame left behind
        reservoir = min(511, main_per_frame + md_begin - consumed)
    return b"".join(out)


def container_bytes(
    codec: str, i: int, sr: int, n_samples: int,
    corrupt_sideinfo: bool = False,
    corrupt_framing: bool = False,
) -> bytes:
    """Payload for a non-PCM codec. flac: REAL verbatim-subset frames
    (engine/flac.py) carrying the clip's noisy PCM — fully decodable and
    CRC-verified by the validation engine. opus/mp3: valid container
    structure + deterministic opaque frame BODIES inside genuinely valid
    framing (r6: opus packets carry real RFC 6716 length coding; no
    decoder libs in this image, so chain + framing + side-info/reservoir
    validation at the decode seam, packet body decode stubbed)."""
    assert codec != "flac", "flac payloads are built in _gen_rows (need the pcm)"
    rng = np.random.default_rng(np.random.SeedSequence([SEED, int(i), 4]))
    body = rng.bytes(max(n_samples, 64))
    if codec == "opus":
        return ogg_opus_bytes(sr, body, corrupt_framing=corrupt_framing)
    return mp3_bytes(body, corrupt_sideinfo=corrupt_sideinfo)


def clip_params_batch(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(f1, phase) for a VECTOR of clip ids — bit-exact with
    ``_rng(i).random()`` x2 (engine/fastrng.py replays SeedSequence+PCG64 in
    batched numpy; pinned by test). The validation UDF's per-clip Generator
    construction was its single largest profile line (~50 us/clip); this is
    ~2.6 us/clip."""
    from engine.fastrng import first_doubles

    d1, d2 = first_doubles(SEED, ids, 2)
    return 80.0 + 400.0 * d1, 2 * np.pi * d2


_RAMP32 = np.arange(200_000, dtype=np.float32)  # == the generator's sample cap


def wave32(f1: float, phase: float, sr: int, n_samp: int) -> np.ndarray:
    """float32 2-harmonic wave given pre-drawn params (clean_pcm32 body)."""
    if n_samp <= len(_RAMP32):
        a = _RAMP32[:n_samp] * np.float32((2 * np.pi * f1) / sr)
    else:
        a = np.arange(n_samp, dtype=np.float32)
        a *= np.float32((2 * np.pi * f1) / sr)
    b = a * np.float32(2.0)
    a += np.float32(phase)
    np.sin(a, out=a)
    np.sin(b, out=b)
    a *= np.float32(0.6)
    b *= np.float32(0.25)
    a += b
    return a


def clean_pcm32(i: int, sr: int, dur_ms: int, max_samples: int = 200_000) -> np.ndarray:
    """float32 variant of clean_pcm for the VALIDATION side (engine/audio.py):
    same seeded params, half the memory traffic and SIMD-friendlier sin — the
    synthesis is the hottest function in the invariant UDF and the 16-32-core
    legs are memory-bandwidth-bound (BENCH.md). Differs from the float64
    generator signal by ~1e-7 relative (~-140 dB), far below the 30 dB SNR
    threshold and the -50 dB planted noise floor. Payload GENERATION keeps
    the float64 path so fixtures are unchanged."""
    rng = _rng(i)
    n_samp = min(int(sr * dur_ms / 1000), max_samples)
    f1 = 80.0 + 400.0 * rng.random()
    phase = 2 * np.pi * rng.random()
    return wave32(f1, phase, sr, n_samp)


def clean_pcm(i: int, sr: int, dur_ms: int, max_samples: int = 200_000) -> np.ndarray:
    """Deterministic noiseless 2-harmonic sine for clip ``i`` — the 'expected
    decode' oracle the SNR invariant compares against (reference formula,
    models/utils.py:123-125)."""
    rng = _rng(i)
    n_samp = min(int(sr * dur_ms / 1000), max_samples)
    f1 = 80.0 + 400.0 * rng.random()
    phase = 2 * np.pi * rng.random()
    # in-place evaluation of 0.6*sin(2pi f1 t + phase) + 0.25*sin(4pi f1 t);
    # this runs once per clip in the validation UDF's hot path
    a = np.arange(n_samp, dtype=np.float64)
    a *= (2 * np.pi * f1) / sr
    b = a * 2.0
    a += phase
    np.sin(a, out=a)
    np.sin(b, out=b)
    a *= 0.6
    b *= 0.25
    a += b
    return a


def clean_pcm_right(
    i: int, sr: int, dur_ms: int, max_samples: int = 200_000
) -> np.ndarray:
    """RIGHT channel of a stereo fixture clip: the SAME drawn (f1, phase)
    as clean_pcm, phase-offset by STEREO_PHASE_OFFSET (float64 generator
    path — the validation side re-synthesizes it via wave32)."""
    rng = _rng(i)
    n_samp = min(int(sr * dur_ms / 1000), max_samples)
    f1 = 80.0 + 400.0 * rng.random()
    phase = 2 * np.pi * rng.random() + STEREO_PHASE_OFFSET
    a = np.arange(n_samp, dtype=np.float64)
    a *= (2 * np.pi * f1) / sr
    b = a * 2.0
    a += phase
    np.sin(a, out=a)
    np.sin(b, out=b)
    a *= 0.6
    b *= 0.25
    a += b
    return a


def _noisy_pcm16(i: int, sig: np.ndarray, stream: int = 1) -> np.ndarray:
    # fresh child stream so noise doesn't perturb the clean-signal params;
    # the RIGHT channel of stereo clips draws stream 5 so its noise is
    # independent of the left's
    rng = np.random.default_rng(np.random.SeedSequence([SEED, int(i), stream]))
    noise = rng.uniform(-1.0, 1.0, sig.shape) * 0.003  # ~ -50 dB, passes SNR>=30
    return np.clip((sig + noise) * 32000 * 0.9, -32768, 32767).astype(np.int16)


def _transcript(i: int) -> str:
    rng = np.random.default_rng(np.random.SeedSequence([SEED, int(i), 2]))
    n_words = int(rng.integers(3, 41))
    idx = rng.integers(0, len(VOCAB), n_words)
    return " ".join(VOCAB[j] for j in idx)


def _gen_rows(ids: np.ndarray) -> pd.DataFrame:
    out = {"clip_id": [], "bytes": [], "sr_hz": [], "dur_ms": [], "codec": [], "transcript": []}
    for i in ids:
        i = int(i)
        rng = _rng(i)
        sr = int(SR_DOMAIN[rng.choice(4, p=SR_WEIGHTS)])
        dur = int(np.exp(rng.normal(6.9, 0.55)))  # lognormal ~ 1000ms median
        dur = int(np.clip(dur, 200, 30_000))
        codec = str(CODEC_DOMAIN[rng.choice(4, p=CODEC_WEIGHTS)])
        if _hit(np.array([i]), "sr_hz_out_of_domain")[0]:
            sr = 11025
        if _hit(np.array([i]), "dur_ms_zero")[0]:
            dur = 0
        if _hit(np.array([i]), "dur_ms_huge")[0]:
            dur = 3_600_000
        if _hit(np.array([i]), "codec_out_of_domain")[0]:
            codec = "wma"

        corrupt_payload = _hit(np.array([i]), "payload_corrupt")[0]
        corrupt_header = _hit(np.array([i]), "container_header_corrupt")[0]
        if corrupt_payload:
            # PCM-content corruption is planted on the DECODABLE codecs:
            # wav, and (since r4) every third plant lands on Ogg-FLAC —
            # a fully VALID container (every page CRC good, every frame
            # CRC good) whose samples are garbage, catchable only by the
            # complete Ogg -> FLAC -> PCM decode + SNR compare
            codec = "flac" if i % 3 == 0 else "pcm_s16le"
        if corrupt_header:
            # container-header corruption IS detectable on the stubbed
            # codecs (magic / CRC / frame-sync validation at the decode seam)
            codec = header_corrupt_codec(i)
        # codec_null BEFORE payload build: a null-codec clip decodes via the
        # WAV path, so its payload must be WAV regardless of the rng draw
        if _hit(np.array([i]), "codec_null")[0]:
            codec = None

        sr_mismatch = _hit(np.array([i]), "sr_metadata_mismatch")[0]
        if sr_mismatch:
            # container metadata declares twice the column's sample rate —
            # planted on flac (valid header, opaque body) so it is caught by
            # the cross-field invariant alone, not by decode/SNR
            codec = "flac"

        chain_corrupt = _hit(np.array([i]), "container_body_corrupt")[0]
        if chain_corrupt:
            # valid first page/frame, corruption deep in the chain: proves the
            # decode seam validates the WHOLE container structure, not a
            # fixed-size header window
            codec = body_corrupt_codec(i)

        body_corrupt = _hit(np.array([i]), "flac_body_corrupt")[0]
        if body_corrupt:
            # valid container + header, corrupted FRAME body: only a real
            # body decode (frame CRC-16 / PCM compare) can catch it — the
            # plant that proves the flac decode seam is genuinely exercised
            codec = "flac"

        warmup_corrupt = _hit(np.array([i]), "flac_warmup_corrupt")[0]
        if warmup_corrupt:
            # fixed-predictor stream with shifted WRITTEN warmup samples:
            # every CRC (page + frame + header) verifies, so only genuine
            # predictor reconstruction + the SNR compare can catch it (r5)
            codec = "flac"

        sideinfo_corrupt = _hit(np.array([i]), "mp3_sideinfo_corrupt")[0]
        if sideinfo_corrupt:
            # valid header chain, poisoned SIDE INFO (reservoir claim with
            # no backing): only the Layer III side-info walk sees it (r6)
            codec = "mp3"

        side_corrupt = _hit(np.array([i]), "flac_stereo_side_corrupt")[0]
        if side_corrupt:
            # stereo left-side frames with a shifted SIDE-subframe warmup:
            # every CRC verifies, both subframes decode — only genuine
            # stereo decorrelation (R = L - side) + SNR sees the offset (r6)
            codec = "flac"

        if codec == "flac":
            from engine import flac as flac_mod

            # half the flac mix ships REAL-WORLD-SHAPED streams: fixed
            # predictors (orders 0-4, best-order) with Rice-coded residuals
            # (r5), and 1/32 carries order-8 LPC subframes (quantized
            # Levinson-Durbin coefficients — the coding real encoders
            # actually prefer; decode is an exact integer inverse filter,
            # inherently per-sample, so the share is bounded and the cost
            # documented in BENCH.md); the rest stays verbatim — every
            # family decodes losslessly. i%32==21 is odd, so LPC ids are a
            # subset of the coded half, and no flac-forcing planting rule
            # lands on residue 21 mod 32.
            if i % 32 == 21:
                predictor = "lpc"
            elif i % 2 == 1:
                predictor = "fixed"
            else:
                predictor = "verbatim"
            stereo = flac_is_stereo(i)
            bps = 24 if flac_is_24bit(i) else 16
            sig = clean_pcm(i, sr, max(dur, 200))
            pcm = _noisy_pcm16(i, sig)
            if stereo:
                # channel-interleaved L/R: same f1, phase-offset right wave,
                # independent noise stream — decode must reproduce BOTH
                pcm_r = _noisy_pcm16(i, clean_pcm_right(i, sr, max(dur, 200)),
                                     stream=5)
                inter = np.empty(2 * len(pcm), dtype=np.int64)
                inter[0::2] = pcm
                inter[1::2] = pcm_r
                pcm = inter
            if corrupt_payload:
                # garbage SIGNAL in a pristine container: only decode+SNR sees it
                pcm = (pcm.astype(np.int64) * 13 % 65536 - 32768)
            if bps == 24:
                pcm = pcm.astype(np.int64) << 8  # same float32 decode target
            enc_kwargs = dict(
                streaminfo_sr=sr * 2 if sr_mismatch else None,
                predictor=predictor,
                corrupt_warmup=bool(warmup_corrupt),
                channels=2 if stereo else 1,
                bps=bps,
                corrupt_side_warmup=bool(side_corrupt),
                mode_seed=i % 4,
            )
            if i % 3 == 0:
                # every third flac clip ships in the Ogg-FLAC container
                # (public xiph mapping) — the Ogg slot with a REAL body
                # decode behind the page walk. NB the container_header_corrupt
                # flac plants (i = 41 + 9000m, always i%3==2) stay native, so
                # their oracle error string ('bad_flac_header') is unchanged.
                b = ogg_flac_bytes(
                    sr, pcm, corrupt_frames=bool(body_corrupt), **enc_kwargs
                )
            else:
                b = flac_mod.encode(pcm, sr, **enc_kwargs)
                if body_corrupt:
                    ba = bytearray(b)
                    for k in range(60, 76):  # inside the first frame's body
                        ba[k] ^= 0xA5
                    b = bytes(ba)
            if corrupt_header:
                b = b"XXXX" + b[4:]  # break magic ('fLaC' or 'OggS')
        elif codec in ("opus", "mp3"):
            n_samp = min(int(sr * max(dur, 200) / 1000), 200_000)
            opus_framing_plant = bool(
                chain_corrupt and codec == "opus"
                and opus_body_corrupt_is_framing(i)
            )
            b = container_bytes(codec, i, sr * 2 if sr_mismatch else sr, n_samp,
                                corrupt_sideinfo=bool(sideinfo_corrupt),
                                corrupt_framing=opus_framing_plant)
            if chain_corrupt and not opus_framing_plant:
                ba = bytearray(b)
                if codec == "mp3":
                    # frames carry no CRC — break a mid-chain frame HEADER
                    # (sync bytes), which the frame walk must reach and reject
                    flen = mp3_frame_len(0xFB, 0x90)
                    k = (3 * len(ba) // 4 // flen) * flen
                else:
                    # any page byte breaks that page's CRC-32
                    k = 3 * len(ba) // 4
                for j in range(k, min(k + 8, len(ba))):
                    ba[j] ^= 0xA5
                b = bytes(ba)
            if corrupt_header:
                b = b"XXXX" + b[4:]  # break magic / frame sync
        else:
            sig = clean_pcm(i, sr, max(dur, 200))
            pcm = _noisy_pcm16(i, sig)
            if corrupt_payload:
                if i % 2 == 0:
                    pcm = pcm[: max(len(pcm) // 2, 1)]       # truncation
                else:
                    pcm = (pcm.astype(np.int32) * 13 % 65536 - 32768).astype(np.int16)  # garbage
            b = wav_bytes(pcm, sr)

        transcript: str | None = _transcript(i)
        if _hit(np.array([i]), "transcript_null")[0]:
            transcript = None

        out["clip_id"].append(f"clip_{i:010d}")
        out["bytes"].append(b)
        out["sr_hz"].append(sr)
        out["dur_ms"].append(dur)
        out["codec"].append(codec)
        out["transcript"].append(transcript)
    return pd.DataFrame(out)


def gen_clips(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """The clips fact table, with planted violations + duplicated rows."""
    base = spark.range(0, n, 1, partitions)
    dup_ids = [int(i) for i in planted_ids(n, "clip_id_duplicate")]
    dups = spark.createDataFrame([(i,) for i in dup_ids] or [(int(-1),)], "id long").filter(
        F.col("id") >= 0
    )
    ids = base.unionByName(dups)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_rows(pdf["id"].values)

    return ids.mapInPandas(gen, schema=CLIPS_SCHEMA)


def gen_transcripts(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Dimension table: gold transcripts, minus dangling-FK plants, with
    planted mismatches."""
    base = spark.range(0, n, 1, partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            keep = ~_hit(ids, "dangling_fk")
            ids = ids[keep]
            rows = {"clip_id": [], "transcript_gold": []}
            for i in ids:
                i = int(i)
                g = _transcript(i)
                if _hit(np.array([i]), "transcript_mismatch")[0]:
                    g = g + " xmismatchx"
                rows["clip_id"].append(f"clip_{i:010d}")
                rows["transcript_gold"].append(g)
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema="clip_id string, transcript_gold string")


def series_noise(s: int, i: int) -> float:
    """Deterministic md5-derived uniform noise in [-0.05, 0.05): the first 8
    hex digits of md5('SEED|s|i') as a uint32, scaled. Hash-based (not RNG)
    so an external ANSI-SQL oracle reproduces the series bit-for-bit — the
    same engine-wide portability rule as the dedup hashes."""
    import hashlib

    h = int(hashlib.md5(f"{SEED}|{s}|{i}".encode()).hexdigest()[:8], 16)
    return (h / 4294967296.0 - 0.5) * 0.1


def gen_series(spark: SparkSession, n_series: int = 8, n_points: int = 1000) -> DataFrame:
    """Time-series scoring fixture (FIXTURES.md §6): seeded noisy 2-harmonic
    sine per series with a level-shift anomaly in a known closed index range
    (the hexagon-dataset labeled-interval analog, models/utils.py:34-39).
    value = sin(2π·0.7·t) + 0.3·sin(4π·0.7·t) + md5-noise (+5.0 inside the
    planted interval), t = idx/50 — every term SQL-reproducible."""
    base = spark.range(0, n_series * n_points, 1, 8)

    def gen(batches):
        for pdf in batches:
            gids = pdf["id"].values
            sid = gids // n_points
            idx = gids % n_points
            rows = []
            for g, s, i in zip(gids, sid, idx):
                t = i / 50.0
                v = np.sin(2 * np.pi * 0.7 * t) + 0.3 * np.sin(4 * np.pi * 0.7 * t)
                v += series_noise(int(s), int(i))
                lo, hi = anomaly_range(int(s), n_points)
                if lo <= i <= hi:
                    v += 5.0  # level shift (large vs wave amplitude ~1.3 so the
                    # rolling z-score trips at any phase of the carrier)
                rows.append((f"s{int(s):03d}", int(i), float(v)))
            yield pd.DataFrame(rows, columns=["series_id", "idx", "value"])

    return base.mapInPandas(gen, schema="series_id string, idx long, value double")


def anomaly_range(series: int, n_points: int) -> tuple[int, int]:
    start = 200 + 61 * series % (n_points - 120)
    return start, start + 40
