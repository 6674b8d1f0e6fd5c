"""FLAC encoder/decoder (pure numpy, public spec — RFC 9639).

Closes the codec-body seam: fixture FLAC clips carry REAL frames that the
validation engine decodes back to PCM for the SNR>=30dB invariant — the
Spark analog of the reference's reconstruct-and-compare loop
(anomaly_detection.py:326-343), genuinely exercised on ~15% of the codec
mix instead of a header-only stub.

Subset implemented (a superset of what the fixture generator emits):
  * MONO and STEREO (r6: all four channel assignments — independent L/R,
    left-side, right-side, mid-side — exact integer decorrelation, the
    side channel coded at bps+1 bits, mid-side's lost LSB restored from
    the side's parity), 8/12/16/20/24 bits/sample, BOTH blocking
    strategies, every blocksize / sample-rate code (tables and explicit
    fields); frame channel/bps codes are cross-checked against STREAMINFO
    so a forged header is a violation, never a stub route;
  * subframes: VERBATIM, CONSTANT, FIXED predictors of orders 0-4, and
    LPC of any order 1-32 (quantized Levinson-Durbin coefficients, exact
    integer inverse filter) with Rice-coded residuals (both coding methods,
    any partition order, escape partitions), with or without WASTED-BITS
    shifting, decoded at ARBITRARY bit offsets (stereo second subframes
    are not byte-aligned) — the full set of shapes real-world FLAC
    encoders emit (r5/r5b/r6) — exact integer reconstruction, so the
    decode stays lossless; CRC-16 (poly 0x8005) frame footer.
Since r6b there is NO out-of-subset FLAC shape left: 1-8 channels
(independent subframes beyond stereo, per RFC 9639 §4.1 — only the four
stereo modes decorrelate) and every bps 4-32 (odd widths via sample-size
code 0, 32-bit side channels at 33 coded bits) all decode, so the
NotImplementedError stub is GONE for bare FLAC — every malformation is a
ValueError violation. Every frame header is CRC-8 VERIFIED before any
field is trusted: ANY single-byte corruption past the metadata block is a
ValueError violation (or decodes identically) — a tested theorem
(test_single_byte_corruption_never_reaches_the_stub, extended to
stereo/24-bit frames in r6). CORRUPTION — including reserved
subframe/coding-method codes, which no valid stream contains — raises
ValueError and becomes a violation.

Scale note on the Rice decoder: a per-sample Python loop (unary scan + k
bits) would cost ~1 us/sample — minutes per bench run. Instead the whole
bitstream is unpacked once per clip (np.unpackbits) and each partition is
decoded with vectorized numpy: unary terminators are the fixed point of the
monotone map g(t) = first 1-bit at >= t+1+k, whose full orbit is extracted
by binary lifting (g^2 = g o g, doubling the solved prefix each step) —
O(n log n) numpy ops, no per-sample Python. Remainder bits gather as k
strided fancy-index reads; the fixed-predictor inverse is ``order`` chained
prefix sums (exact int64 arithmetic).

Scale note: CRC-16 is the only per-byte work in the decode hot path, so it is
computed as a vectorized GF(2) tree reduction (numpy) instead of a per-byte
Python loop: CRC with init=0/no-reflect is linear, so crc(A||B) =
advance(crc(A), len(B)) ^ crc(B); 16-bit words fold pairwise per level with
precomputed advance-by-2^k-words tables (T_{2k} = T_k o T_k). ~n/2 table
lookups total per message vs n sequential Python iterations.
"""

from __future__ import annotations

import struct

import numpy as np

# 4080, not 4096: the CRC-16 tree pads each frame to a power-of-two WORD
# count, and a 4096-sample frame is 4096 sample-words + ~5 header words —
# just past the 4096 boundary, doubling the fold work. 4080 keeps a full
# frame (header + verbatim samples) within 4096 words.
BLOCKSIZE = 4080
CRC16_POLY = 0x18005  # x^16 + x^15 + x^2 + 1 (FLAC frame CRC, init 0)
CRC8_POLY = 0x107     # x^8 + x^2 + x + 1   (FLAC header CRC, init 0)


def _build_crc8_table() -> bytes:
    t = []
    for v in range(256):
        r = v
        for _ in range(8):
            r = (r << 1) ^ (CRC8_POLY if r & 0x80 else 0)
        t.append(r & 0xFF)
    return bytes(t)


_CRC8_TABLE = _build_crc8_table()


def crc8(data: bytes) -> int:
    """FLAC header CRC-8 — headers are <16 bytes, a Python loop is fine."""
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def _build_t1() -> np.ndarray:
    """T1[v] = v * x^16 mod p over GF(2): the CRC-16 of one 16-bit word."""
    r = np.arange(65536, dtype=np.uint32)
    for _ in range(16):
        r = r << 1
        r ^= ((r >> 16) & 1) * np.uint32(CRC16_POLY)
    return r.astype(np.uint16)


#: _ADV[k][v] = advance v by 2^k words (multiply by x^(16*2^k) mod p);
#: built lazily by composition: _ADV[k+1] = _ADV[k][_ADV[k]]
_ADV: list[np.ndarray] = []


def _adv(level: int) -> np.ndarray:
    while len(_ADV) <= level:
        _ADV.append(_build_t1() if not _ADV else _ADV[-1][_ADV[-1]])
    return _ADV[level]


def crc16_many(chunks: list) -> np.ndarray:
    """CRC-16 (poly 0x8005, init 0, no reflection, no xorout) of SEVERAL
    byte chunks in one vectorized GF(2) tree reduction: leading zero pad is a
    no-op under init=0, so every chunk is front-padded to the same
    power-of-two word count and the whole batch folds as a 2-D array — one
    numpy call sequence per CLIP instead of per frame (the decode hot path).
    Chunk-to-matrix preamble shared with the CRC-32 fold (engine/oggcrc.py)."""
    from engine.oggcrc import pad_words_matrix

    mat = pad_words_matrix(chunks)
    arr = _adv(0)[mat]  # per-word CRC: R(w) = w * x^16 mod p
    level = 0
    while arr.shape[1] > 1:
        arr = _adv(level)[arr[:, 0::2]] ^ arr[:, 1::2]
        level += 1
    return arr[:, 0]


def crc16(data) -> int:
    return int(crc16_many([data])[0])


# ---------------------------------------------------------------------------
# frame-number coding (UTF-8-style, spec section 9.1.5)
# ---------------------------------------------------------------------------

def utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    for _ in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    out.append(lead_mask | n)
    return bytes(reversed(out))


def utf8_decode(b, pos: int) -> tuple[int, int]:
    """Decode a coded number at ``pos``; returns (value, next_pos). Raises
    ValueError (never IndexError) on truncation — a malformed clip must stay
    a per-row violation, not crash the Arrow batch task."""
    if pos >= len(b):
        raise ValueError("bad_flac_frame")
    first = b[pos]
    if first < 0x80:
        return first, pos + 1
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7 or pos + nbytes > len(b):
        raise ValueError("bad_flac_frame")
    val = first & (0x7F >> nbytes)
    for k in range(1, nbytes):
        c = b[pos + k]
        if (c & 0xC0) != 0x80:
            raise ValueError("bad_flac_frame")
        val = (val << 6) | (c & 0x3F)
    return val, pos + nbytes


# ---------------------------------------------------------------------------
# Rice residual coding (spec section 9.2.7) — vectorized both directions
# ---------------------------------------------------------------------------

def zigzag(r: np.ndarray) -> np.ndarray:
    """Signed residual -> unsigned rice symbol: 0,-1,1,-2,... -> 0,1,2,3,..."""
    r = r.astype(np.int64)
    return (r << 1) ^ (r >> 63)


def unzigzag(u: np.ndarray) -> np.ndarray:
    return (u >> 1) ^ -(u & 1)


def best_rice_k(u: np.ndarray, max_k: int = 14) -> int:
    """Rice parameter minimizing total bits n*(k+1) + sum(u >> k)."""
    if len(u) == 0:
        return 0
    best, best_bits = 0, None
    for k in range(max_k + 1):
        bits = len(u) * (k + 1) + int(np.sum(u >> k))
        if best_bits is None or bits < best_bits:
            best, best_bits = k, bits
    return best


def rice_encode_bits(u: np.ndarray, k: int) -> np.ndarray:
    """Rice(k) codes of unsigned symbols as a uint8 0/1 bit array:
    per symbol, (u>>k) zeros, a 1 terminator, then k low bits MSB-first.
    Fully vectorized: terminator positions from a cumsum of code lengths,
    remainder bits via k strided scatters."""
    if len(u) == 0:
        return np.zeros(0, dtype=np.uint8)
    lens = (u >> k) + 1 + k
    ends = np.cumsum(lens)
    bits = np.zeros(int(ends[-1]), dtype=np.uint8)
    term = ends - 1 - k
    bits[term] = 1
    for j in range(k):
        bits[term + 1 + j] = (u >> (k - 1 - j)) & 1
    return bits


def _read_bits(bits: np.ndarray, p: int, nb: int) -> int:
    """Small fixed-width field (<= 5 bits) from the unpacked bit array."""
    if p + nb > len(bits):
        raise ValueError("bad_flac_frame")
    v = 0
    for x in bits[p : p + nb]:
        v = (v << 1) | int(x)
    return v


#: block-chase stride: the successor map is composed up to g^CHASE_B (log2
#: CHASE_B cheap O(m) gathers), then the orbit advances CHASE_B codes per
#: vector step — n/B python-loop iterations instead of a full O(m log n)
#: binary lift (measured ~4x on fixture-shaped frames, k~8; r7 re-sweep
#: 16/32/64/128 interleaved best-of-4: 128 is ~4% faster than 64 on the
#: fixture mix — one more compose is cheaper than twice the stride count)
CHASE_B = 128


def rice_decode_block(
    bits: np.ndarray,
    ones: np.ndarray,
    S: np.ndarray,
    p: int,
    n_r: int,
    k: int,
    stream: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Decode ``n_r`` Rice(k) codes starting at absolute bit offset ``p``.

    ``bits`` is the clip's full unpacked bitstream, ``ones`` its 1-bit
    positions and ``S`` the exclusive bit prefix-sum (both computed once per
    clip). The unary region of every code is all-zeros, so each terminator
    is exactly the first 1-bit at or after its code's start: T_i = g(T_{i-1})
    with g(t) = ones[S[t + 1 + k]], a monotone self-map of 1-bit index
    space built by one O(m) gather (no searchsorted). The orbit is walked in
    CHASE_B-wide vector strides using the precomposed g^CHASE_B. Any valid
    n_r-code block consumes at most n_r*(k+1) 1-bits, so the index window is
    exact; running past it means a truncated/corrupt stream -> ValueError."""
    if n_r == 0:
        return np.zeros(0, dtype=np.int64), p
    c = 1 + k
    lo = int(S[min(p, len(bits))])
    # a valid block consumes n_r terminators + remainder ones: at most
    # n_r*(k+1), on average ~n_r*(1+k/2). Try the mean-sized window first
    # (its m-wide ops are the block's dominant cost) and fall back to the
    # exact bound only if the orbit runs past it.
    exact = n_r * c + 1
    for bound in (min(n_r * (2 + k // 2) + 1024, exact), exact):
        hi = min(lo + bound, len(ones))
        o = ones[lo:hi]
        m = len(o)
        if m == 0:
            raise ValueError("bad_flac_frame")
        # local successor map with sentinel m (out-of-window maps to itself);
        # S's slack pad makes S[o + c] safe without clamping o + c first
        g = np.empty(m + 1, dtype=np.int32)
        np.minimum(S[o + c] - lo, m, out=g[:m])
        g[m] = m
        orbit = np.empty(n_r, dtype=np.int32)
        B = min(CHASE_B, n_r)
        # seed the first B entries by scalar chase (B is small)
        idx = 0
        for i in range(B):
            orbit[i] = idx
            idx = int(g[idx])
        if n_r > B:
            # compose to g^B with alternating preallocated buffers
            gB = np.take(g, g)
            buf = np.empty_like(gB)
            step = 2
            while step < B:
                np.take(gB, gB, out=buf)
                gB, buf = buf, gB
                step <<= 1
            for s in range(B, n_r, B):
                e = min(s + B, n_r)
                np.take(gB, orbit[s - B : e - B], out=orbit[s:e])
        if int(orbit[-1]) < m:
            break  # decoded within this window
        if hi == min(lo + exact, len(ones)):
            raise ValueError("bad_flac_frame")
    T = o[orbit]
    end = int(T[-1]) + c
    if end > len(bits):
        raise ValueError("bad_flac_frame")
    q = np.empty(n_r, dtype=np.int64)
    q[0] = T[0] - p
    if n_r > 1:
        q[1:] = T[1:] - T[:-1] - c
    u = q << k
    if k:
        if stream is not None and k <= 14:
            # remainder bits straight from the BYTE stream: each code's k
            # bits (k <= 14, start offset 0-7) fit a 3-byte window — three
            # 1-D gathers + shifts instead of an (n, k) bit matrix
            # (measured ~8x on k=8 frames)
            start = T.astype(np.int64) + 1
            b0 = start >> 3
            s = start & 7
            last = len(stream) - 1
            w = (
                (stream[b0].astype(np.int64) << 16)
                | (stream[np.minimum(b0 + 1, last)].astype(np.int64) << 8)
                | stream[np.minimum(b0 + 2, last)]
            )
            u |= (w >> (24 - k - s)) & ((1 << k) - 1)
        else:
            # generic path (rice2 parameters up to 30 bits): one 2-D gather
            # + matmul for all remainder bits
            mat = bits[T[:, None] + np.arange(1, k + 1)]
            u |= mat @ (np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64))
    return unzigzag(u), end


def _peek_bits(mv, n: int, start_bit: int, nb: int) -> int:
    """Up to 16 bits at an arbitrary absolute bit offset, straight from the
    byte stream (no unpack) — used to size the local window."""
    b0 = start_bit >> 3
    if b0 + 1 > n:
        raise ValueError("bad_flac_frame")
    w = 0
    for j in range(4):
        w = (w << 8) | (mv[b0 + j] if b0 + j < n else 0)
    return (w >> (32 - (start_bit & 7) - nb)) & ((1 << nb) - 1)


def _decode_residual_section(
    mv, stream: np.ndarray, n: int, start_bit: int, bs: int, order: int
) -> tuple[np.ndarray, int]:
    """Decode a coded-residual section (spec 9.2.7: 2-bit method, 4-bit
    partition order, rice/escape partitions) starting at the absolute BIT
    offset ``start_bit`` (arbitrary: subframes are bit-contiguous within a
    frame). Returns (residuals, end_bit); the frame-level caller byte-aligns
    after the LAST subframe and verifies the zero padding.

    The bit machinery (unpackbits / flatnonzero / prefix-sum) runs on a
    FRAME-LOCAL window sized from the first partition's rice parameter, not
    the whole clip: per-frame arrays stay L2-resident, which at 32-way
    parallelism beats whole-clip precomputation (the r4 CRC-fold lesson
    again — DRAM-bound transient arrays throttle wide parallelism). If the
    window undershoots (later partitions with bigger parameters,
    quotient-heavy streams), it grows 4x and retries; a window reaching the
    stream end re-raises the genuine error."""
    method = _peek_bits(mv, n, start_bit, 2)
    if method > 1:
        raise ValueError("bad_flac_frame")  # reserved coding method
    porder = _peek_bits(mv, n, start_bit + 2, 4)
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    nparts = 1 << porder
    part_n = bs >> porder
    if part_n << porder != bs or part_n < order:
        raise ValueError("bad_flac_frame")
    # window sized from the first partition's parameter (peeked straight
    # from the bytes): mean code length is ~k+2 bits; +3 covers heavy
    # quotients while keeping the unpack/nonzero/cumsum arrays ~20% smaller
    # than the old +4 (r7 sweep: +3 is 15% faster on the fixture mix, +2
    # loses to retries); escape partitions / undershoot hit the retry path
    k0 = _peek_bits(mv, n, start_bit + 6, pbits)
    wstart = start_bit >> 3
    off = start_bit - wstart * 8  # 0-7: local bit offset of the section
    W = (bs * (k0 + 3)) // 8 + 96
    while True:
        wlimit = min(wstart + W, n)
        local = stream[wstart:wlimit]
        bits = np.unpackbits(local)
        ones = np.flatnonzero(bits).astype(np.int32)
        # 40 trailing slack entries let the rice decoder gather
        # S[one + 1 + k] without a clamp pass
        S = np.zeros(len(bits) + 41, dtype=np.int32)
        np.cumsum(bits, out=S[1 : len(bits) + 1])
        S[len(bits) + 1 :] = S[len(bits)]
        try:
            bp = off + 6  # method(2) + partition order(4)
            resids = []
            for pi in range(nparts):
                cnt = part_n - order if pi == 0 else part_n
                pk = _read_bits(bits, bp, pbits)
                bp += pbits
                if pk == escape:
                    nb = _read_bits(bits, bp, 5)
                    bp += 5
                    vals, bp = raw_decode_block(bits, bp, cnt, nb)
                else:
                    vals, bp = rice_decode_block(bits, ones, S, bp, cnt, pk, local)
                resids.append(vals)
            resid = np.concatenate(resids) if len(resids) > 1 else resids[0]
            # end is the absolute BIT offset: subframes are bit-contiguous
            # within a frame (only the LAST one is byte-padded, by the
            # frame-level _align_checked) — r6 stereo support
            end_bit = wstart * 8 + bp
            if (end_bit >> 3) + 2 > n:
                raise ValueError("bad_flac_frame")
            return resid, end_bit
        except ValueError:
            if wlimit < n:  # the window, not the stream, may have run out
                W *= 4
                continue
            raise


#: frame-header blocksize table (spec 9.1.2): codes 1-5 and 8-15 are fixed
#: sizes, 6/7 carry the size at the header's end, 0 is reserved
_BS_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

#: frame-header sample-size table (spec 9.1.4): bits per sample by code;
#: 0b000 = from STREAMINFO, 0b011 reserved (rejected before lookup),
#: 0b111 = 32-bit (RFC 9639) — outside the subset, caught by the
#: STREAMINFO cross-check (a <=24-bit stream never carries it)
_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _align_checked(mv, n: int, end_bit: int) -> int:
    """Byte-align after a subframe body: the padding bits to the next byte
    boundary must be zero; returns the end byte (CRC-16 bytes must fit)."""
    end = (end_bit + 7) >> 3
    if end + 2 > n:
        raise ValueError("bad_flac_frame")
    pad = end * 8 - end_bit
    if pad and _peek_bits(mv, n, end_bit, pad) != 0:
        raise ValueError("bad_flac_frame")
    return end


def _local_bits(stream: np.ndarray, n: int, start_bit: int, n_bits: int):
    """Unpack exactly the bytes covering [start_bit, start_bit + n_bits);
    returns (bits, local_offset_of_start_bit)."""
    if (start_bit + n_bits + 7) >> 3 > n:
        raise ValueError("bad_flac_frame")
    b0 = start_bit >> 3
    b1 = (start_bit + n_bits + 7) >> 3
    return np.unpackbits(stream[b0:b1]), start_bit - b0 * 8


def _decode_subframe(
    mv, stream: np.ndarray, n: int, start_bit: int, bs: int, bps: int
):
    """One subframe of ``bps`` bits/sample starting at the absolute BIT
    offset ``start_bit`` (byte-aligned only for the FIRST subframe of a
    frame — stereo second subframes start mid-byte): handles CONSTANT /
    VERBATIM / FIXED / LPC, with or without wasted-bits shifting (spec
    9.2.2: a set flag is followed by a unary count w; the body is coded at
    bps-w bits and the decoded samples are shifted left by w). Side
    channels of stereo decorrelation pass bps+1. Returns (samples,
    end_bit) — bit-exact, no alignment: the frame decoder byte-aligns
    after the last subframe. Reserved subframe types are corruption
    (ValueError), never a stub."""
    sub = _peek_bits(mv, n, start_bit, 8)
    if sub & 0x80:
        raise ValueError("bad_flac_frame")  # padding bit must be 0
    stype = (sub >> 1) & 0x3F
    bit = start_bit + 8
    w = 0
    if sub & 0x01:
        z = 0
        while _peek_bits(mv, n, bit + z, 1) == 0:
            z += 1
            if z > bps - 2:  # bps - w must stay >= 1
                raise ValueError("bad_flac_frame")
        w = z + 1
        bit += z + 1
    ebps = bps - w  # effective coded width (<= 33: side channel of 32-bit)
    if stype == 0x00:  # CONSTANT: one ebps-bit value for the whole block
        if ebps <= 25:  # _peek_bits window limit (32 - 7-bit offset)
            v = _peek_bits(mv, n, bit, ebps)
            if v >= 1 << (ebps - 1):
                v -= 1 << ebps
        else:  # 26-33 bits: unpack-and-fold path (already sign-extends)
            bits_l, off = _local_bits(stream, n, bit, ebps)
            v = int(raw_decode_block(bits_l, off, 1, ebps)[0][0])
        return np.full(bs, v << w, dtype=np.int64), bit + ebps
    if stype == 0x01:  # VERBATIM: bs raw ebps-bit samples
        if ebps == 16 and w == 0 and (bit & 7) == 0:
            # byte-aligned 16-bit fast path; int16 keeps the hot path's
            # memory traffic (w>0 would need the wider post-shift range)
            start = bit >> 3
            end = start + 2 * bs
            if end + 2 > n:
                raise ValueError("bad_flac_frame")
            return np.frombuffer(mv[start:end], dtype=">i2").astype(np.int16), end * 8
        bits_l, off = _local_bits(stream, n, bit, bs * ebps)
        vals, _ = raw_decode_block(bits_l, off, bs, ebps)
        return vals << w, bit + bs * ebps
    if 0x08 <= stype <= 0x0C or stype & 0x20:
        order = ((stype & 0x1F) + 1) if stype & 0x20 else stype - 0x08
        if order > bs:
            raise ValueError("bad_flac_frame")
        if ebps == 16 and (bit & 7) == 0 and order:  # byte-aligned fast path
            start = bit >> 3
            wend = start + 2 * order
            if wend > n:
                raise ValueError("bad_flac_frame")
            warmup = np.frombuffer(mv[start:wend], dtype=">i2").astype(np.int64)
            bit = wend * 8
        elif order:
            bits_l, off = _local_bits(stream, n, bit, order * ebps)
            warmup, _ = raw_decode_block(bits_l, off, order, ebps)
            bit += order * ebps
        else:
            warmup = np.zeros(0, dtype=np.int64)
        if stype & 0x20:  # LPC: precision / shift / quantized coefficients
            prec = _peek_bits(mv, n, bit, 4) + 1
            if prec == 16:
                raise ValueError("bad_flac_frame")  # 0b1111 is forbidden
            shift = _peek_bits(mv, n, bit + 4, 5)
            if shift & 0x10:
                # signed field, but negative shifts MUST NOT occur (RFC 9639)
                raise ValueError("bad_flac_frame")
            bit += 9
            coefs = []
            for _ in range(order):
                c = _peek_bits(mv, n, bit, prec)
                if c >= 1 << (prec - 1):
                    c -= 1 << prec  # two's complement
                coefs.append(c)
                bit += prec
        resid, end = _decode_residual_section(mv, stream, n, bit, bs, order)
        if stype & 0x20:
            samples = lpc_reconstruct(warmup, resid, coefs, shift)
        else:
            samples = reconstruct_fixed(warmup, resid, order)
        return (samples << w if w else samples), end
    # subframe types 2-7 / 13-31 are RESERVED — no valid stream contains
    # them, so this is corruption, not an unimplemented shape
    raise ValueError("bad_flac_frame")


def raw_decode_block(
    bits: np.ndarray, p: int, n_r: int, nbits: int
) -> tuple[np.ndarray, int]:
    """Escape-coded partition: n_r residuals as raw ``nbits``-bit two's
    complement (spec: rice parameter escape code, 5-bit width follows)."""
    end = p + n_r * nbits
    if end > len(bits):
        raise ValueError("bad_flac_frame")
    if nbits == 0:
        return np.zeros(n_r, dtype=np.int64), end
    mat = bits[p:end].reshape(n_r, nbits).astype(np.int64)
    vals = mat @ (np.int64(1) << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    vals[vals >= (1 << (nbits - 1))] -= 1 << nbits
    return vals, end


def fixed_residual(blk: np.ndarray, order: int) -> np.ndarray:
    """Order-o fixed-predictor residual = o-th finite difference (exact
    integer arithmetic; spec section 9.2.5's binomial predictors)."""
    s = blk.astype(np.int64)
    return np.diff(s, n=order) if order else s


def lpc_predict(s: np.ndarray, coefs, shift: int, order: int) -> np.ndarray:
    """Vectorized forward prediction over KNOWN samples (encoder side — no
    feedback): pred[i] = (sum_j c_j * s[i-j]) >> shift for i in
    [order, len(s))."""
    s = s.astype(np.int64)
    acc = np.zeros(len(s) - order, dtype=np.int64)
    for j, c in enumerate(coefs):  # c_1 applies to s[i-1], etc.
        acc += int(c) * s[order - 1 - j : len(s) - 1 - j]
    return acc >> shift


def lpc_reconstruct(warmup, resid: np.ndarray, coefs, shift: int) -> np.ndarray:
    """Exact integer LPC inverse filter: s[i] = r[i] +
    ((sum_j c_j*s[i-1-j]) >> shift). The arithmetic shift inside the
    feedback loop makes this genuinely sequential (the truncation is
    nonlinear, so no prefix-sum/lifting trick applies and a float IIR is
    not bit-exact) — a plain-int Python loop is the honest implementation.
    Cost ~0.1 us per sample per coefficient; the fixture bounds LPC to a
    small share of the flac mix and BENCH.md carries the measured cost."""
    order = len(coefs)
    out = [int(x) for x in warmup]
    co = [int(c) for c in coefs]
    sh = int(shift)
    # divergence guard: valid 16-bit-audio state never leaves this range; a
    # corrupt stream's feedback loop can grow without bound (unbounded
    # Python ints), which must surface as a violation, not an OverflowError.
    # Checked once per unrolled block — between checks, growth is bounded by
    # (max|c|)^8, so even a diverging corrupt frame stays cheap.
    LIM = 1 << 34
    rl = resid.tolist()
    if order == 8:
        # the fixture encoder's order: EIGHT samples per iteration with
        # explicit state renaming — no per-sample append, no per-sample
        # 8-tuple rotation, 1/8th the loop overhead (~2x vs the rolled loop)
        s0, s1, s2, s3, s4, s5, s6, s7 = out[-1], out[-2], out[-3], out[-4], \
            out[-5], out[-6], out[-7], out[-8]
        c0, c1, c2, c3, c4, c5, c6, c7 = co
        ext = out.extend
        nfull = len(rl) - (len(rl) & 7)
        for i in range(0, nfull, 8):
            r0, r1, r2, r3, r4, r5, r6, r7 = rl[i : i + 8]
            v0 = r0 + ((c0*s0 + c1*s1 + c2*s2 + c3*s3 + c4*s4 + c5*s5 + c6*s6 + c7*s7) >> sh)
            v1 = r1 + ((c0*v0 + c1*s0 + c2*s1 + c3*s2 + c4*s3 + c5*s4 + c6*s5 + c7*s6) >> sh)
            v2 = r2 + ((c0*v1 + c1*v0 + c2*s0 + c3*s1 + c4*s2 + c5*s3 + c6*s4 + c7*s5) >> sh)
            v3 = r3 + ((c0*v2 + c1*v1 + c2*v0 + c3*s0 + c4*s1 + c5*s2 + c6*s3 + c7*s4) >> sh)
            v4 = r4 + ((c0*v3 + c1*v2 + c2*v1 + c3*v0 + c4*s0 + c5*s1 + c6*s2 + c7*s3) >> sh)
            v5 = r5 + ((c0*v4 + c1*v3 + c2*v2 + c3*v1 + c4*v0 + c5*s0 + c6*s1 + c7*s2) >> sh)
            v6 = r6 + ((c0*v5 + c1*v4 + c2*v3 + c3*v2 + c4*v1 + c5*v0 + c6*s0 + c7*s1) >> sh)
            v7 = r7 + ((c0*v6 + c1*v5 + c2*v4 + c3*v3 + c4*v2 + c5*v1 + c6*v0 + c7*s0) >> sh)
            # bound-check BOTH an early and the last lane: checking v7 alone
            # lets a crafted stream grow the unchecked lanes multiplicatively
            # while cancelling back below LIM at v7 (ADVICE r5)
            if not (-LIM < v7 < LIM and -LIM < v0 < LIM):
                raise ValueError("bad_flac_frame")
            ext((v0, v1, v2, v3, v4, v5, v6, v7))
            s0, s1, s2, s3, s4, s5, s6, s7 = v7, v6, v5, v4, v3, v2, v1, v0
        for r in rl[nfull:]:
            v = r + ((c0*s0 + c1*s1 + c2*s2 + c3*s3 + c4*s4 + c5*s5 + c6*s6 + c7*s7) >> sh)
            if not -LIM < v < LIM:
                raise ValueError("bad_flac_frame")
            out.append(v)
            s0, s1, s2, s3, s4, s5, s6, s7 = v, s0, s1, s2, s3, s4, s5, s6
    else:
        rng = range(order)
        for r in rl:
            acc = 0
            for j in rng:
                acc += co[j] * out[-1 - j]
            v = int(r) + (acc >> sh)
            if not -LIM < v < LIM:
                raise ValueError("bad_flac_frame")
            out.append(v)
    try:
        return np.array(out, dtype=np.int64)
    except OverflowError:  # alternating-sign divergence can dodge the v7 check
        raise ValueError("bad_flac_frame") from None


def reconstruct_fixed(
    warmup: np.ndarray, resid: np.ndarray, order: int
) -> np.ndarray:
    """Invert ``fixed_residual``: ``order`` chained prefix sums, each level
    seeded by the matching finite difference of the warmup samples."""
    cur = resid.astype(np.int64)
    w = warmup.astype(np.int64)
    for j in range(order, 0, -1):
        # level j turns D^j (at i >= j) into D^{j-1} (at i >= j-1), seeded by
        # D^{j-1}[j-1] = diff(warmup, j-1)[0]
        seed = np.diff(w, n=j - 1)[0] if j > 1 else w[0]
        cur = np.concatenate(([seed], seed + np.cumsum(cur)))
    return cur


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def streaminfo(
    sr: int, n_samples: int, blocksize: int = BLOCKSIZE,
    channels: int = 1, bps: int = 16,
) -> bytes:
    """'fLaC' magic + last-block STREAMINFO. ``n_samples`` is interchannel
    (per-channel sample count, spec 8.2)."""
    packed = (
        (sr << 44) | ((channels - 1) << 41) | ((bps - 1) << 36)
        | (n_samples & ((1 << 36) - 1))
    )
    si = (
        struct.pack(">HH", blocksize, blocksize)
        + b"\x00\x00\x00" + b"\x00\x00\x00"  # min/max framesize unknown
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                        # raw-PCM md5 unset
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def _byte_bits(v: int) -> np.ndarray:
    return np.unpackbits(np.array([v], dtype=np.uint8))


def int_bits(vals, nbits: int) -> np.ndarray:
    """Two's-complement MSB-first bits of each value, flattened — the
    building block for non-byte-aligned fields (stereo second subframes,
    non-16-bit warmup/verbatim bodies)."""
    v = np.asarray(vals, dtype=np.int64) & ((1 << nbits) - 1)
    return (
        (v[:, None] >> np.arange(nbits - 1, -1, -1)) & 1
    ).astype(np.uint8).ravel()


def _fixed_subframe_bits(
    blk: np.ndarray,
    bps: int = 16,
    corrupt_warmup: bool = False,
    order: int | None = None,
    warmup_shift: int = 4096,
) -> np.ndarray:
    """One FIXED subframe as a BIT array (header byte + warmup + rice
    residual section, unpadded — subframes are bit-contiguous within a
    frame). Order is chosen like real encoders do — smallest
    sum(|residual|) over orders 0-4 (deterministic).

    ``corrupt_warmup`` is the r5 planting hook: the WRITTEN warmup samples
    are shifted by ``warmup_shift`` while the residuals stay derived from
    the true warmup, producing a perfectly VALID frame (CRC-8/CRC-16/paging
    all consistent) that decodes to a wrong signal — only genuine predictor
    reconstruction + SNR compare can catch it. Order is forced to 1 so the
    injected error is a constant offset (amplitude 1/8 at the default
    shift) in every frame: SNR ~= 10-14 dB << 30 regardless of clip
    length, with no clipping and no zero-crossing-rate shift."""
    if corrupt_warmup:
        order = 1 if len(blk) >= 2 else 0
    elif order is None:
        costs = [
            int(np.abs(fixed_residual(blk, o)).sum()) for o in range(min(5, len(blk)))
        ]
        order = int(np.argmin(costs))
    else:
        # fixed predictors exist only for orders 0-4, and warmup cannot
        # exceed the block
        order = min(order, 4, len(blk))
    resid = fixed_residual(blk, order)
    u = zigzag(resid)
    k = best_rice_k(u)
    warmup = blk[:order].astype(np.int64)
    if corrupt_warmup and order:
        warmup = warmup + warmup_shift
    head = np.zeros(10, dtype=np.uint8)  # method 00 | partition order 0000 | k
    for j in range(4):
        head[6 + j] = (k >> (3 - j)) & 1
    return np.concatenate([
        _byte_bits((0x08 + order) << 1),
        int_bits(warmup, bps),
        head,
        rice_encode_bits(u, k),
    ])


def _lpc_subframe_bits(
    blk: np.ndarray, bps: int = 16, order: int = 8, precision: int = 12
) -> np.ndarray:
    """One LPC subframe as a BIT array: Levinson-Durbin coefficients
    quantized to ``precision`` bits, residual computed with EXACT integer
    prediction (so decode is lossless), Rice-coded. Falls back to the
    fixed-predictor family when the block is too short or degenerate."""
    n = len(blk)
    if n <= order + 1:
        return _fixed_subframe_bits(blk, bps)
    x = blk.astype(np.float64)
    ac = np.array([float(np.dot(x[: n - j], x[j:])) for j in range(order + 1)])
    if ac[0] == 0.0:  # digital silence
        return _fixed_subframe_bits(blk, bps)
    # Levinson-Durbin recursion
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - float(np.dot(a[:i], ac[i:0:-1][: i]))
        k = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1.0 - k * k
        if err <= 0:
            break
    cmax = float(np.max(np.abs(a)))
    if not np.isfinite(cmax) or cmax == 0.0:
        return _fixed_subframe_bits(blk, bps)
    # shift so the largest coefficient uses the full precision
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(a * (1 << shift)), -lim, lim - 1).astype(np.int64)
    resid = blk[order:].astype(np.int64) - lpc_predict(blk, q, shift, order)
    u = zigzag(resid)
    k = best_rice_k(u)
    # header byte + warmup, then the UNALIGNED tail: prec-1(4) shift(5)
    # coeffs(order*precision) | method(2) porder(4) rice k(4) | residual
    head = []
    for j in range(4):
        head.append((precision - 1 >> 3 - j) & 1)
    for j in range(5):
        head.append((shift >> 4 - j) & 1)
    for c in q:
        c2 = int(c) & ((1 << precision) - 1)
        for j in range(precision):
            head.append((c2 >> precision - 1 - j) & 1)
    head += [0, 0, 0, 0, 0, 0]  # method 00, partition order 0000
    for j in range(4):
        head.append((k >> 3 - j) & 1)
    return np.concatenate([
        _byte_bits((0x20 | (order - 1)) << 1),
        int_bits(blk[:order], bps),
        np.array(head, np.uint8),
        rice_encode_bits(u, k),
    ])


def _subframe_bits(
    blk: np.ndarray,
    bps: int,
    predictor: str,
    corrupt_warmup: bool = False,
    fixed_order: int | None = None,
    warmup_shift: int = 4096,
) -> np.ndarray:
    if corrupt_warmup or predictor == "fixed":
        return _fixed_subframe_bits(blk, bps, corrupt_warmup, fixed_order,
                                    warmup_shift)
    if predictor == "lpc":
        return _lpc_subframe_bits(blk, bps)
    return np.concatenate([_byte_bits(0x02), int_bits(blk, bps)])  # verbatim


#: stereo channel-assignment cycle: frame fi uses MODES[(fi + mode_seed) % 4]
#: so every multi-frame clip exercises independent L/R AND all three
#: decorrelated modes; single-frame clips vary by mode_seed (the clip id)
STEREO_MODES = (0b0001, 0b1000, 0b1001, 0b1010)  # L/R, left-side, right-side, mid-side

#: sample-size code by bps; odd widths (e.g. 13-bit) have no dedicated code
#: and fall back to 0 = "from STREAMINFO" (RFC 9639 §9.1.4)
_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_frames(
    pcm: np.ndarray,
    blocksize: int = BLOCKSIZE,
    predictor: str = "verbatim",
    corrupt_warmup: bool = False,
    fixed_order: int | None = None,
    channels: int = 1,
    bps: int = 16,
    corrupt_side_warmup: bool = False,
    mode_seed: int = 0,
) -> bytes:
    """Fixed-blocksize frames. Mono 16-bit keeps the r5 byte-level fast
    paths; stereo (channel-interleaved ``pcm``, all four channel-assignment
    modes cycled per frame) and 8/12/20/24-bit go through the bit-level
    assembler, since their subframes are not byte-aligned.

    ``corrupt_side_warmup`` is the r6 stereo planting hook: every frame is
    forced to left-side mode and the SIDE subframe's written warmup is
    shifted — all CRCs verify, both subframes decode, but the reconstructed
    RIGHT channel (R = L - side) carries a constant offset: only genuine
    stereo decorrelation + the SNR compare can catch it."""
    out = []
    n_per = len(pcm) // channels
    ss_code = _SS_CODE.get(bps, 0)  # odd widths: 0 = "from STREAMINFO"
    shift = 4096 << max(0, bps - 16)
    for fi, start in enumerate(range(0, n_per, blocksize)):
        if channels == 2:
            blk2 = np.asarray(pcm[2 * start : 2 * (start + blocksize)], dtype=np.int64)
            left, right = blk2[0::2], blk2[1::2]
            ch_code = 0b1000 if corrupt_side_warmup else \
                STEREO_MODES[(fi + mode_seed) % 4]
            nblk = len(left)
        elif channels > 2:
            blkN = np.asarray(
                pcm[channels * start : channels * (start + blocksize)],
                dtype=np.int64,
            )
            chans = [blkN[c::channels] for c in range(channels)]
            ch_code = channels - 1  # 3-8 independent channels
            nblk = len(chans[0])
        else:
            blk = pcm[start : start + blocksize]
            ch_code = 0
            nblk = len(blk)
        # sync(14) 0b11111111111110 | reserved 0 | fixed-blocksize 0;
        # blocksize code 0b0111 (16-bit at end) | sr code 0b0000 (STREAMINFO);
        # channel assignment | sample-size code | reserved 0
        hdr = bytes([0xFF, 0xF8, 0x70, (ch_code << 4) | (ss_code << 1)])
        hdr += utf8_encode(fi)
        hdr += struct.pack(">H", nblk - 1)
        hdr += bytes([crc8(hdr)])
        if channels == 1 and bps == 16 and predictor == "verbatim" \
                and not corrupt_warmup:
            frame = hdr + b"\x02" + blk.astype(">i2").tobytes()  # fast path
        else:
            if channels > 2:
                parts = [_subframe_bits(c, bps, predictor) for c in chans]
            elif channels == 2:
                if ch_code == 0b0001:
                    parts = [_subframe_bits(left, bps, predictor),
                             _subframe_bits(right, bps, predictor)]
                else:
                    side = left - right
                    if ch_code == 0b1000:
                        parts = [
                            _subframe_bits(left, bps, predictor),
                            _subframe_bits(side, bps + 1, predictor,
                                           corrupt_side_warmup, None, shift),
                        ]
                    elif ch_code == 0b1001:
                        parts = [_subframe_bits(side, bps + 1, predictor),
                                 _subframe_bits(right, bps, predictor)]
                    else:
                        mid = (left + right) >> 1
                        parts = [_subframe_bits(mid, bps, predictor),
                                 _subframe_bits(side, bps + 1, predictor)]
            else:
                parts = [_subframe_bits(np.asarray(blk, dtype=np.int64), bps,
                                        predictor, corrupt_warmup,
                                        fixed_order, shift)]
            bits = np.concatenate(parts)
            pad = (-len(bits)) % 8
            if pad:
                bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
            frame = hdr + np.packbits(bits).tobytes()
        out.append(frame + struct.pack(">H", crc16(frame)))
    return b"".join(out)


def encode(
    pcm: np.ndarray,
    sr: int,
    streaminfo_sr: int | None = None,
    predictor: str = "verbatim",
    corrupt_warmup: bool = False,
    fixed_order: int | None = None,
    channels: int = 1,
    bps: int = 16,
    corrupt_side_warmup: bool = False,
    mode_seed: int = 0,
) -> bytes:
    """Full container; ``pcm`` is channel-interleaved when channels=2.
    ``streaminfo_sr`` overrides the DECLARED rate (used by the
    sr_metadata_mismatch plant) without touching the frame payload."""
    return streaminfo(
        streaminfo_sr or sr, len(pcm) // channels, channels=channels, bps=bps
    ) + encode_frames(
        pcm, predictor=predictor, corrupt_warmup=corrupt_warmup,
        fixed_order=fixed_order, channels=channels, bps=bps,
        corrupt_side_warmup=corrupt_side_warmup, mode_seed=mode_seed,
    )


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode(b) -> np.ndarray:
    """Decode an in-subset FLAC container to float32 PCM in [-1, 1)
    (stereo: channel-interleaved; ``decode_meta`` also reports the layout).

    Raises ValueError (-> violation) on any malformation: bad magic /
    STREAMINFO ('bad_flac_header'), bad sync, failed CRC-8/CRC-16, or a
    sample-count mismatch vs STREAMINFO ('bad_flac_frame'). Since r6b the
    decoder covers every legal shape (1-8 channels, bps 4-32, all subframe
    types) — no NotImplementedError route remains in bare FLAC."""
    return decode_meta(b)[0]


def decode_meta(b) -> tuple[np.ndarray, int]:
    """``decode`` plus the channel count: (interleaved_pcm32, channels)."""
    pcm, frames, stored, nch = parse(b)
    crcs = crc16_many([f for f in frames])
    for c, s in zip(crcs, stored):
        if int(c) != s:
            raise ValueError("bad_flac_frame")
    return pcm, nch


def parse(b) -> tuple[np.ndarray, list, list[int], int]:
    """``decode`` minus the frame CRC-16 verification: returns
    (pcm_float32, frame_bytes, stored_crc16s, channels) so a caller holding
    MANY clips can fold every frame of every clip into ONE batched tree
    reduction (audio.invariant_batches) instead of one numpy call sequence
    per clip. All structural checks (magic, STREAMINFO, sync, header CRC-8,
    channel/bps cross-field conformance, sample count) still raise here."""
    from engine.oggcrc import as_u8

    mv = as_u8(b)  # pa.Buffer exposes signed bytes ('b'); index unsigned
    # None guard mirrors decode_wav_pcm16 / the opus-mp3 validators: a null
    # payload must be a per-row ValueError violation, never a TypeError that
    # escapes the batch task (ADVICE r3)
    n = len(mv) if mv is not None else 0
    if mv is None or n < 42 or bytes(mv[:4]) != b"fLaC":
        raise ValueError("bad_flac_header")
    # walk metadata blocks; the first MUST be STREAMINFO (34 bytes)
    pos = 4
    first = True
    total_samples = None
    while True:
        if pos + 4 > n:
            raise ValueError("bad_flac_header")
        hdr = mv[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(bytes(mv[pos + 1 : pos + 4]), "big")
        if first:
            if btype != 0 or length != 34:
                raise ValueError("bad_flac_header")
            packed = int.from_bytes(bytes(mv[pos + 4 + 10 : pos + 4 + 18]), "big")
            sr = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
            if not (1 <= sr <= 655350):
                raise ValueError("bad_flac_header")
            if bps < 4:
                # STREAMINFO bps is 4-32 (RFC 9639 §8.2); 1-3 is invalid,
                # i.e. corruption — never a stub route. Channels 1-8 and
                # every bps 4-32 (odd widths via ss_code 0) all decode:
                # since r6b there is NO out-of-subset FLAC shape left.
                raise ValueError("bad_flac_header")
            first = False
        pos += 4 + length
        if pos > n:
            raise ValueError("bad_flac_header")
        if last:
            break

    chunks: list[np.ndarray] = []
    frames: list = []   # (frame bytes sans footer, stored crc16)
    got = 0
    stream = None  # zero-copy uint8 view over the whole buffer, built lazily
    while pos < n:
        fstart = pos
        if pos + 5 > n or mv[pos] != 0xFF or (mv[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("bad_flac_frame")  # bad sync / reserved bit set
        # parse ALL header fields first, verify the header CRC-8, and only
        # THEN route out-of-subset shapes to the stub: a corrupted header
        # byte always fails the CRC (-> violation) instead of flipping a
        # field into a shape the stub would plumbing-pass (r5 review fix).
        # The variable-blocksize strategy and the blocksize/sample-rate
        # code tables are decoded outright — per-frame handling is
        # identical; only stereo and non-16-bit remain out of subset.
        bs_code = mv[pos + 2] >> 4
        sr_code = mv[pos + 2] & 0x0F
        chan_bps = mv[pos + 3]
        if bs_code == 0 or sr_code == 15:
            raise ValueError("bad_flac_frame")  # reserved / invalid codes
        _, pos2 = utf8_decode(mv, pos + 4)
        if bs_code == 6:
            if pos2 + 1 > n:
                raise ValueError("bad_flac_frame")
            bs = mv[pos2] + 1
            pos2 += 1
        elif bs_code == 7:
            if pos2 + 2 > n:
                raise ValueError("bad_flac_frame")
            bs = struct.unpack(">H", mv[pos2 : pos2 + 2])[0] + 1
            pos2 += 2
        else:
            bs = _BS_TABLE[bs_code]
        if sr_code == 12:
            pos2 += 1  # explicit rate in kHz (value unused: STREAMINFO rules)
        elif sr_code in (13, 14):
            pos2 += 2  # explicit rate in Hz / daHz
        if pos2 + 1 > n or crc8(bytes(mv[fstart:pos2])) != mv[pos2]:
            raise ValueError("bad_flac_frame")
        pos2 += 1
        channels_code = chan_bps >> 4
        ss_code = (chan_bps >> 1) & 0x07
        if chan_bps & 0x01 or ss_code == 0b011 or channels_code >= 11:
            raise ValueError("bad_flac_frame")  # reserved bits / codes
        if channels_code < 8:
            nch = channels_code + 1  # 1-8 independent channels
        else:
            nch = 2  # 8/9/10: left-/right-/mid-side stereo decorrelation
                     # (>= 11 is reserved, rejected above)
        if nch != channels:
            # frames must conform to STREAMINFO (RFC 9639 §9.1.3): a channel
            # count flip is a cross-field corruption, never a stub route
            raise ValueError("bad_flac_frame")
        if ss_code == 0:
            fbps = bps  # from STREAMINFO (already validated in-subset)
        else:
            fbps = _SS_TABLE[ss_code]
            if fbps != bps:
                raise ValueError("bad_flac_frame")  # must match STREAMINFO
        if pos2 + 1 > n:
            raise ValueError("bad_flac_frame")
        if stream is None:
            stream = np.frombuffer(mv, dtype=np.uint8)  # zero-copy view
        bit = pos2 * 8
        if channels_code < 8:
            subs = []
            for _c in range(nch):
                s_c, bit = _decode_subframe(mv, stream, n, bit, bs, fbps)
                subs.append(s_c)
        else:
            # decorrelated stereo: the SIDE channel carries fbps+1 bits
            bps0 = fbps + (1 if channels_code == 9 else 0)
            bps1 = fbps + (1 if channels_code in (8, 10) else 0)
            c0, bit = _decode_subframe(mv, stream, n, bit, bs, bps0)
            c1, bit = _decode_subframe(mv, stream, n, bit, bs, bps1)
            c0 = c0.astype(np.int64)
            c1 = c1.astype(np.int64)
            if channels_code == 8:      # left-side: c1 = left - right
                subs = [c0, c0 - c1]
            elif channels_code == 9:    # right-side: c0 = left - right
                subs = [c0 + c1, c1]
            else:                       # mid-side (exact integer inverse:
                # mid = (L+R)>>1 lost the LSB, restored from side's parity)
                m2 = (c0 << 1) | (c1 & 1)
                subs = [(m2 + c1) >> 1, (m2 - c1) >> 1]
        end = _align_checked(mv, n, bit)
        for s_c in subs:
            if len(s_c) != bs:
                raise ValueError("bad_flac_frame")
        if nch == 1:
            samples = subs[0]
        else:
            samples = np.empty(nch * bs, dtype=np.int64)
            for c in range(nch):
                samples[c::nch] = subs[c]
        stored = struct.unpack(">H", mv[end : end + 2])[0]
        frames.append((mv[fstart:end], stored))
        chunks.append(samples)
        got += bs
        pos = end + 2

    if total_samples and got != total_samples:
        raise ValueError("bad_flac_frame")
    if not chunks:
        raise ValueError("bad_flac_frame")
    pcm = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
    # one fused pass: int -> float32 scale by the exact power of two
    # (bit-identical to astype + divide, half the temporaries); stereo is
    # channel-INTERLEAVED (L R L R ...), ``channels`` reports the layout
    pcm32 = np.multiply(
        pcm, np.float32(1.0 / (1 << (bps - 1))), dtype=np.float32
    )
    return pcm32, [f for f, _ in frames], [s for _, s in frames], channels
