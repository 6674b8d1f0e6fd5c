"""Vectorized Ogg page CRC-32 (poly 0x04C11DB7, init 0, no reflection).

Same GF(2) tree-reduction idea as engine/flac.py's CRC-16, extended to a
32-bit state: a 2^32-entry advance table is impossible, but advance-by-k is
LINEAR over GF(2), so it splits into two 65536-entry uint32 tables acting on
the state's high and low 16-bit halves: adv_k(s) = AH_k[s>>16] ^ AL_k[s&0xFFFF].

Base case (advance by one 16-bit word, i.e. multiply by x^16 mod p):
  * low half v (degree < 16): v*x^16 has degree < 32 -> AL_1[v] = v << 16
    (no reduction needed);
  * high half v<<16: (v<<16)*x^16 = v*x^32 mod p = W32[v], the same table
    that maps a data word to its standalone CRC contribution.
Doubling: adv_{2k} = adv_k o adv_k, so AH/AL tables compose by applying the
level-k map elementwise to the level-k tables themselves.

Used by the Ogg page-chain validator (engine/audio.py) on the decode hot
path — one tree reduction per page batch, no per-byte Python.
"""

from __future__ import annotations

import numpy as np

POLY = 0x04C11DB7


def as_u8(b) -> memoryview | None:
    """Normalize any buffer to an UNSIGNED byte memoryview: pa.Buffer exposes
    format 'b' (signed), which breaks integer byte comparisons."""
    if b is None:
        return None
    mv = memoryview(b)
    return mv.cast("B") if mv.format != "B" else mv


def pad_words_matrix(chunks: list) -> np.ndarray:
    """Shared CRC-fold preamble: each byte chunk front-padded to an even
    length (leading zeros are a no-op under init=0), viewed as big-endian
    16-bit words, front-padded again to one power-of-two width, stacked into
    a 2-D uint16 matrix for the tree reduction."""
    words = []
    maxlen = 1
    for c in chunks:
        b = np.frombuffer(c, dtype=np.uint8)
        if len(b) % 2:
            b = np.concatenate([np.zeros(1, dtype=np.uint8), b])
        w = b.view(">u2").astype(np.uint16)
        words.append(w)
        maxlen = max(maxlen, len(w))
    n2 = 1 << (maxlen - 1).bit_length()
    mat = np.zeros((len(words), n2), dtype=np.uint16)
    for i, w in enumerate(words):
        mat[i, n2 - len(w) :] = w
    return mat


def _build_w32() -> np.ndarray:
    """W32[v] = v * x^32 mod p (uint32): the CRC of one 16-bit word."""
    r = np.arange(65536, dtype=np.uint64)
    for _ in range(32):
        r = r << np.uint64(1)
        r ^= ((r >> np.uint64(32)) & np.uint64(1)) * np.uint64(POLY | (1 << 32))
    return r.astype(np.uint32)


#: _ADV[k] = (AH, AL) advancing the 32-bit state by 2^k words
_ADV: list[tuple[np.ndarray, np.ndarray]] = []


def _adv(level: int) -> tuple[np.ndarray, np.ndarray]:
    while len(_ADV) <= level:
        if not _ADV:
            w32 = _build_w32()
            al = (np.arange(65536, dtype=np.uint32) << np.uint32(16))
            _ADV.append((w32, al))
        else:
            ah, al = _ADV[-1]
            _ADV.append((
                ah[ah >> np.uint32(16)] ^ al[ah & np.uint32(0xFFFF)],
                ah[al >> np.uint32(16)] ^ al[al & np.uint32(0xFFFF)],
            ))
    return _ADV[level]


def crc32_many(chunks: list) -> np.ndarray:
    """Ogg CRC-32 of several byte chunks in one 2-D tree reduction
    (front-padding with zeros is a no-op under init=0)."""
    mat = pad_words_matrix(chunks)
    w32 = _adv(0)[0]
    arr = w32[mat]  # per-word CRC contribution
    level = 0
    while arr.shape[1] > 1:
        ah, al = _adv(level)
        a = arr[:, 0::2]
        arr = ah[a >> np.uint32(16)] ^ al[a & np.uint32(0xFFFF)] ^ arr[:, 1::2]
        level += 1
    return arr[:, 0]


def crc32(data) -> int:
    return int(crc32_many([data])[0])
