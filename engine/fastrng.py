"""Vectorized bit-exact replay of ``default_rng(SeedSequence([seed, id]))``.

The per-clip expected-signal parameters (f1, phase — synth.clean_pcm32) are
drawn from a fresh ``np.random.default_rng(np.random.SeedSequence([SEED, i]))``
per clip.  Constructing that object pair costs ~50 us per clip in
Python/Cython — the single largest line item in the invariant UDF's profile
(0.85 s of a 5.4 s single-core second per 20k clips).  Both algorithms are
public and fixed (NumPy's SeedSequence pool hashing; O'Neill's PCG64 with
XSL-RR output), and every hash-constant step in them is *data-independent*,
so the whole chain vectorizes across a batch of clip ids with plain uint32 /
uint64 numpy arithmetic: ~2.6 us/clip, bit-identical output (pinned by
tests/test_properties.py against the real Generator for hundreds of ids).

Only the first two ``random()`` doubles are replayed — all the validation
side ever draws.  Ids >= 2**32 take more entropy words, changing the hash
call sequence; those fall back to the real Generator (correct at 10^12-row
scale, where only the far tail of ids crosses the boundary; the vectorized
fast path covers each 2^32-aligned majority chunk).
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF
_INIT_A, _MULT_A = 0x43B0D7E5, 0x931E8875
_INIT_B, _MULT_B = 0x8B51F9DD, 0x58F38DED
_MIX_L, _MIX_R = 0xCA01F9DD, 0x4973F715
_XSHIFT = np.uint32(16)
_PCG_MULT = 0x2360ED051FC65DA44385DF649FCCF645
_U32, _U64 = np.uint64(0xFFFFFFFF), np.uint64(32)

#: hashmix's hash-constant chain is data-independent: precompute (hc, hc*A)
#: pairs for the 16 pool-mixing calls (2-word entropy -> 4 fills + 12 mixes)
_HCS_A: list[tuple[int, int]] = []
_hc = _INIT_A
for _ in range(16):
    _nxt = (_hc * _MULT_A) & _M32
    _HCS_A.append((_hc, _nxt))
    _hc = _nxt

#: generate_state(4, uint64) emits 8 uint32 words under the INIT_B chain
_HCS_B: list[tuple[int, int]] = []
_hc = _INIT_B
for _ in range(8):
    _nxt = (_hc * _MULT_B) & _M32
    _HCS_B.append((_hc, _nxt))
    _hc = _nxt
del _hc, _nxt

_PCG_LIMBS = [(_PCG_MULT >> (32 * i)) & _M32 for i in range(4)]


def _seedseq_state4(seed: int, ids: np.ndarray) -> list[np.ndarray]:
    """SeedSequence([seed, id]).generate_state(4, uint64) for a vector of
    ids < 2**32: returns 4 uint64 arrays (state words in numpy's order)."""
    n = len(ids)
    k = 0

    def hashmix(v: np.ndarray) -> np.ndarray:
        nonlocal k
        hc, nxt = _HCS_A[k]
        k += 1
        v = (v ^ np.uint32(hc)) * np.uint32(nxt)
        return v ^ (v >> _XSHIFT)

    def mix(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        r = x * np.uint32(_MIX_L) - y * np.uint32(_MIX_R)
        return r ^ (r >> _XSHIFT)

    zero = np.zeros(n, np.uint32)
    pool = [
        hashmix(np.full(n, seed & _M32, np.uint32)),
        hashmix(ids.astype(np.uint32)),
        hashmix(zero),
        hashmix(zero),
    ]
    for src in range(4):
        for dst in range(4):
            if src != dst:
                pool[dst] = mix(pool[dst], hashmix(pool[src]))
    out32 = []
    for i in range(8):
        hc, nxt = _HCS_B[i]
        v = (pool[i % 4] ^ np.uint32(hc)) * np.uint32(nxt)
        out32.append((v ^ (v >> _XSHIFT)).astype(np.uint64))
    return [out32[2 * j] | (out32[2 * j + 1] << _U64) for j in range(4)]


def _limbs128(hi: np.ndarray, lo: np.ndarray) -> list[np.ndarray]:
    return [lo & _U32, lo >> _U64, hi & _U32, hi >> _U64]


def _mul128(a: list[np.ndarray], c: list[int]) -> list[np.ndarray]:
    """(a * c) mod 2**128 over 32-bit limb vectors (column sums stay < 2**40,
    far inside uint64)."""
    n = a[0].shape[0]
    cols = [np.zeros(n, np.uint64) for _ in range(4)]
    for i in range(4):
        for j in range(4 - i):
            if c[j] == 0:
                continue
            p = a[i] * np.uint64(c[j])
            cols[i + j] += p & _U32
            if i + j + 1 < 4:
                cols[i + j + 1] += p >> _U64
    out, carry = [], np.zeros(n, np.uint64)
    for kk in range(4):
        s = cols[kk] + carry
        out.append(s & _U32)
        carry = s >> _U64
    return out


def _add128(a: list[np.ndarray], b: list[np.ndarray]) -> list[np.ndarray]:
    out, carry = [], np.zeros_like(a[0])
    for kk in range(4):
        s = a[kk] + b[kk] + carry
        out.append(s & _U32)
        carry = s >> _U64
    return out


def first_doubles(seed: int, ids: np.ndarray, ndraws: int = 2) -> list[np.ndarray]:
    """The first ``ndraws`` ``Generator.random()`` doubles of
    ``default_rng(SeedSequence([seed, id]))`` for every id, vectorized.
    Ids >= 2**32 fall back to the real Generator row-wise."""
    ids = np.asarray(ids, dtype=np.int64)
    big = ids >= (1 << 32)
    s4 = _seedseq_state4(seed, ids)
    initstate = _limbs128(s4[0], s4[1])
    initseq = _limbs128(s4[2], s4[3])
    inc, carry = [], np.zeros_like(s4[0])
    for kk in range(4):
        inc.append(((initseq[kk] << np.uint64(1)) | carry) & _U32)
        carry = initseq[kk] >> np.uint64(31)
    inc[0] = inc[0] | np.uint64(1)
    # pcg_setseq_128_srandom: state = ((0*M+inc)+initstate)*M + inc
    state = _add128(_mul128(_add128(inc, initstate), _PCG_LIMBS), inc)
    draws = []
    for _ in range(ndraws):
        state = _add128(_mul128(state, _PCG_LIMBS), inc)
        lo = state[0] | (state[1] << _U64)
        hi = state[2] | (state[3] << _U64)
        x = hi ^ lo
        rot = state[3] >> np.uint64(26)          # state >> 122 (XSL-RR)
        v = np.where(rot == 0, x, (x >> rot) | (x << (np.uint64(64) - rot)))
        draws.append(
            (v >> np.uint64(11)).astype(np.float64) * (1.0 / 9007199254740992.0)
        )
    if big.any():
        for w in np.flatnonzero(big):
            g = np.random.default_rng(np.random.SeedSequence([seed, int(ids[w])]))
            for d in draws:
                d[w] = g.random()
    return draws
