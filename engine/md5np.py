"""Vectorized MD5 (RFC 1321) over numpy uint8 buffers.

Why this exists: the text/dedup operators hash tens of millions of tiny
strings (8-char grams, ~20-char shingles) per batch. The JVM expression path
pays per-call digest setup and per-element UTF8String allocation for each
one; here the whole batch is hashed as a handful of numpy array ops — the
64 MD5 rounds run once per BLOCK COLUMN over N messages at a time
(guide §4.2: hand whole batches to vectorized native code).

Bit-identical to hashlib.md5 for any input (property-tested against it in
tests/test_md5np.py); messages of any length are supported via the masked
multi-block walk. Memory is bounded by chunking callers: a (n, 64*maxblocks)
uint8 padded-message matrix is built per call, so callers hash in slices of
~1M short messages (~64 MB transient — cache-friendlier too).
"""

from __future__ import annotations

import numpy as np

_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint8,
)
_K = (
    np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 4294967296.0)
    .astype(np.uint64)
    .astype(np.uint32)
)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    dtype=np.uint8,
)

_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _compress(state, X, active=None):
    """One MD5 block round over N lanes. ``X``: (n, 16) uint32 message words;
    ``state``: list of four (n,) uint32 arrays, updated in place. ``active``:
    optional bool mask — lanes whose message ended earlier keep their state."""
    A, B, C, D = state
    a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        f = f + a + _K[i] + X[:, _G[i]]
        s = int(_S[i])
        rot = (f << np.uint32(s)) | (f >> np.uint32(32 - s))
        a, d, c, b = d, c, b, b + rot
    if active is None:
        A += a
        B += b
        C += c
        D += d
    else:
        A += np.where(active, a, 0).astype(np.uint32)
        B += np.where(active, b, 0).astype(np.uint32)
        C += np.where(active, c, 0).astype(np.uint32)
        D += np.where(active, d, 0).astype(np.uint32)


def md5_digests(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """MD5 of N variable-length byte strings packed in a flat uint8 buffer
    with (N+1) int offsets. Returns (N, 16) uint8 digests."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    n = len(lens)
    if n == 0:
        return np.zeros((0, 16), dtype=np.uint8)
    nblocks = ((lens + 8) >> 6) + 1  # ceil((len + 9) / 64)
    maxb = int(nblocks.max())
    M = np.zeros((n, maxb * 64), dtype=np.uint8)
    total = int(offsets[-1] - offsets[0])
    if total:
        row = np.repeat(np.arange(n), lens)
        col = np.arange(int(offsets[0]), int(offsets[-1])) - np.repeat(offsets[:-1], lens)
        M[row, col] = data[int(offsets[0]) : int(offsets[-1])]
    rows = np.arange(n)
    M[rows, lens] = 0x80
    bitlen = lens.astype(np.uint64) << np.uint64(3)
    lpos = nblocks * 64 - 8
    for j in range(8):
        M[rows, lpos + j] = ((bitlen >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    # little-endian uint32 words: (n, maxb, 16)
    W = np.ascontiguousarray(M).view(np.uint32).reshape(n, maxb, 16)
    if not np.little_endian:  # pragma: no cover - big-endian host
        W = W.byteswap()
    state = [np.full(n, v, dtype=np.uint32) for v in _INIT]
    for b in range(maxb):
        active = nblocks > b if maxb > 1 else None
        _compress(state, W[:, b, :], active)
    out = np.empty((n, 16), dtype=np.uint8)
    for i, reg in enumerate(state):
        out[:, 4 * i : 4 * i + 4] = reg.view(np.uint8).reshape(n, 4) if np.little_endian else reg.byteswap().view(np.uint8).reshape(n, 4)
    return out


def md5_fixed(mat: np.ndarray) -> np.ndarray:
    """MD5 of N equal-length messages given as an (N, L) uint8 matrix with
    L <= 55 (single block). Returns (N, 16) uint8 digests."""
    n, L = mat.shape
    if L > 55:
        raise ValueError("md5_fixed: single-block messages only (L <= 55)")
    M = np.zeros((n, 64), dtype=np.uint8)
    M[:, :L] = mat
    M[:, L] = 0x80
    bitlen = L * 8
    for j in range(8):
        M[:, 56 + j] = (bitlen >> (8 * j)) & 0xFF
    W = M.view(np.uint32)
    if not np.little_endian:  # pragma: no cover
        W = W.byteswap()
    state = [np.full(n, v, dtype=np.uint32) for v in _INIT]
    _compress(state, W)
    out = np.empty((n, 16), dtype=np.uint8)
    for i, reg in enumerate(state):
        out[:, 4 * i : 4 * i + 4] = reg.view(np.uint8).reshape(n, 4) if np.little_endian else reg.byteswap().view(np.uint8).reshape(n, 4)
    return out


#: lane-chunk for the round loop: 8k lanes keep every working array ~32 KB
#: (L1/L2-resident) — measured 3.9 M hashes/s/core vs 0.9 M at 2M lanes
#: (the r4 CRC-fold lesson: cache residency beats call count)
MD5_CHUNK = 8192


def md5_fixed_chunked(mat: np.ndarray, chunk: int = MD5_CHUNK) -> np.ndarray:
    """Cache-blocked ``md5_fixed``: hash in ``chunk``-lane slices."""
    n = mat.shape[0]
    if n <= chunk:
        return md5_fixed(mat)
    return np.concatenate(
        [md5_fixed(mat[i : i + chunk]) for i in range(0, n, chunk)]
    )


def md5_digests_chunked(
    data: np.ndarray, offsets: np.ndarray, chunk: int = MD5_CHUNK
) -> np.ndarray:
    """Cache-blocked ``md5_digests``: hash in ``chunk``-message slices."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n <= chunk:
        return md5_digests(data, offsets)
    return np.concatenate(
        [md5_digests(data, offsets[i : i + chunk + 1]) for i in range(0, n, chunk)]
    )


def digests_to_u64_pair(dig: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) big-endian uint64 views of (N, 16) digests: lexicographic
    order of (hi, lo) == lexicographic order of the digest bytes == order of
    the 32-char lowercase hex strings (hex is a monotone byte->chars map)."""
    d = np.ascontiguousarray(dig)
    u = d.view(np.uint64).reshape(-1, 2)
    if np.little_endian:
        u = u.byteswap()
    return u[:, 0], u[:, 1]


def digests_to_hex_bytes(dig: np.ndarray) -> np.ndarray:
    """(N, 16) uint8 digests -> (N, 32) uint8 lowercase-hex ASCII codes."""
    n = dig.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    out[:, 0::2] = _HEX[dig >> 4]
    out[:, 1::2] = _HEX[dig & 0x0F]
    return out


def fixed_ascii_string_array(mat: np.ndarray):
    """(N, W) uint8 ASCII codes -> pyarrow StringArray with zero per-row
    Python objects (one data buffer + arithmetic offsets)."""
    import pyarrow as pa

    n, w = mat.shape
    offsets = pa.array(np.arange(0, w * (n + 1), w, dtype=np.int32))
    data = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
    return pa.StringArray.from_buffers(n, offsets.buffers()[1], data)


def hex_string_array(hex_bytes: np.ndarray):
    """(N, 32) uint8 hex codes -> pyarrow StringArray (see
    ``fixed_ascii_string_array``)."""
    return fixed_ascii_string_array(hex_bytes)
