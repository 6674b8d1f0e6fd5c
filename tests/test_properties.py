"""Property-based tests (hypothesis) for the from-scratch algorithmic cores:
t-digest rank error, the winnowing guarantee, and the streaming EWMA
closed-form scan. These are the pieces with real math contracts — the
properties hold for ALL inputs, not just the seeded fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.sketch import TDigest

# ---------------------------------------------------------------------------
# t-digest: rank error bounded for arbitrary value distributions
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    heavy_tail=st.booleans(),
    n=st.integers(2_000, 20_000),
)
def test_tdigest_rank_error_bound(seed, heavy_tail, n):
    rng = np.random.default_rng(seed)
    x = rng.lognormal(2.0, 1.2, n) if heavy_tail else rng.normal(0.0, 5.0, n)
    d = TDigest(200).add(x)
    xs = np.sort(x)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        got = d.quantile(q)
        rank = np.searchsorted(xs, got, side="right") / n
        # k1 scale-function bound is ~4 q(1-q)/compression = 0.005 at the
        # median; allow 2x slack for interpolation
        assert abs(rank - q) < 0.01, (q, rank)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), k=st.integers(2, 9))
def test_tdigest_merge_any_split_matches_whole(seed, k):
    """Mergeability: digesting k arbitrary chunks and merging ~= one digest."""
    rng = np.random.default_rng(seed)
    x = rng.normal(10, 3, 30_000)
    whole = TDigest(200).add(x)
    parts = [TDigest(200).add(c) for c in np.array_split(x, k)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.total_weight == len(x)
    for q in (0.05, 0.5, 0.95):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.1


# ---------------------------------------------------------------------------
# winnowing guarantee (Schleimer et al. SIGMOD'03): any shared substring of
# length >= w + k - 1 produces at least one shared fingerprint
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    copy_len=st.integers(30, 120),
)
def test_winnow_shared_substring_shares_fingerprint(spark, seed, copy_len):
    from engine.text import winnow_fingerprints

    k, w = 8, 4
    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))

    def txt(m):
        return "".join(rng.choice(alpha, m))

    shared = txt(copy_len)  # >= w + k - 1 = 11 always
    doc_a = txt(60) + shared + txt(60)
    doc_b = txt(45) + shared + txt(80)
    df = spark.createDataFrame([(0, doc_a), (1, doc_b)], "doc_id long, text string")
    fp = winnow_fingerprints(df, "text", "doc_id", k=k, w=w).collect()
    a = {r["fingerprint"] for r in fp if r["doc_id"] == 0}
    b = {r["fingerprint"] for r in fp if r["doc_id"] == 1}
    assert a & b, "shared substring must share at least one fingerprint"


# ---------------------------------------------------------------------------
# streaming EWMA closed-form scan == pandas ewm(adjust=True), any chunking
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    alpha=st.floats(0.01, 0.99),
    n=st.integers(2, 400),
    n_chunks=st.integers(1, 5),
)
def test_streaming_ewma_scan_matches_pandas(seed, alpha, n, n_chunks):
    """The vectorized closed-form scan used by stateful_ewma_stream must
    reproduce pandas ewm(alpha, adjust=True).mean().shift(1) for ANY alpha,
    ANY length, and ANY micro-batch chunking of the series."""
    from engine.streaming import stateful_ewma_stream  # noqa: F401 (same math)

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 50, n)

    # reimplement the scan exactly as stateful_ewma_stream's inner function
    r = 1.0 - alpha
    chunk = max(1, min(4096, int(300.0 / max(-np.log(r), 1e-12))))

    def scan(vals, num, den):
        fc = np.empty(len(vals))
        for i in range(0, len(vals), chunk):
            c = vals[i : i + chunk]
            m = len(c)
            p = r ** np.arange(1, m + 1)
            rinv_j = r ** -np.arange(1, m + 1)
            num_t = p * (num + np.cumsum(c * rinv_j))
            den_t = p * den + (1.0 - p) / alpha
            prev_num = np.concatenate(([num], num_t[:-1]))
            prev_den = np.concatenate(([den], den_t[:-1]))
            fc[i : i + m] = np.where(
                prev_den > 0, prev_num / np.where(prev_den > 0, prev_den, 1.0), np.nan
            )
            num, den = float(num_t[-1]), float(den_t[-1])
        return fc, num, den

    # arbitrary micro-batch split, state carried across chunks
    cuts = sorted(rng.integers(0, n, n_chunks - 1).tolist()) if n_chunks > 1 else []
    got = []
    num = den = 0.0
    for part in np.split(x, cuts):
        if len(part):
            fc, num, den = scan(part, num, den)
            got.append(fc)
    got = np.concatenate(got) if got else np.array([])

    exp = pd.Series(x).ewm(alpha=alpha, adjust=True).mean().shift(1).to_numpy()
    assert np.isnan(got[0]) and np.isnan(exp[0])
    np.testing.assert_allclose(got[1:], exp[1:], rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# FLAC verbatim codec: lossless round trip + CRC fold == bitwise CRC, for
# ARBITRARY pcm content and lengths (including blocksize boundaries)
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.one_of(
        st.integers(1, 300),
        st.sampled_from([4079, 4080, 4081, 8159, 8160, 8161, 12240]),
        st.integers(4000, 20_000),
    ),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
)
def test_flac_roundtrip_any_content(seed, n, sr):
    from engine import flac

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, n).astype(np.int16)
    out = flac.decode(flac.encode(pcm, sr))
    assert np.array_equal((out * np.float32(32768.0)).astype(np.int16), pcm)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=600))
def test_crc_folds_match_bitwise_reference(data):
    from engine import flac
    from engine.oggcrc import crc32
    from engine.synth import ogg_crc

    r16 = 0
    for b in data:
        r16 ^= b << 8
        for _ in range(8):
            r16 = ((r16 << 1) ^ 0x8005) & 0xFFFF if r16 & 0x8000 else (r16 << 1) & 0xFFFF
    assert flac.crc16(data) == r16
    assert crc32(data) == ogg_crc(data)


def test_fastrng_bit_exact_vs_numpy_generator():
    """engine/fastrng.py replays SeedSequence([SEED, id]) -> PCG64 ->
    2 x random() bit-exactly (the invariant UDF's vectorized param path).
    Covers dense low ids, scattered large ids, and the >= 2**32 fallback."""
    import numpy as np

    from engine.fastrng import first_doubles
    from engine.synth import SEED

    ids = np.array(
        list(range(0, 500))
        + [10_007, 999_983, 2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**40 + 123],
        dtype=np.int64,
    )
    d1, d2 = first_doubles(SEED, ids, 2)
    for k, i in enumerate(ids):
        ref = np.random.default_rng(np.random.SeedSequence([SEED, int(i)]))
        assert d1[k] == ref.random(), i
        assert d2[k] == ref.random(), i


def test_clip_params_batch_matches_clean_pcm32_params():
    """clip_params_batch must reproduce exactly the (f1, phase) drawn by
    synth.clean_pcm32 / clean_pcm via _rng(i)."""
    import numpy as np

    from engine import synth

    ids = np.arange(0, 200, 7, dtype=np.int64)
    f1s, phases = synth.clip_params_batch(ids)
    for k, i in enumerate(ids):
        rng = synth._rng(int(i))
        assert f1s[k] == 80.0 + 400.0 * rng.random()
        assert phases[k] == 2 * np.pi * rng.random()


def test_fastrng_property_random_ids():
    """Property check across the id space (incl. the 2**32 fast/slow-path
    boundary): the vectorized replay equals the real Generator bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import numpy as np

    from engine.fastrng import first_doubles
    from engine.synth import SEED

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=0, max_value=(1 << 40)))
    def check(i):
        d1, d2 = first_doubles(SEED, np.array([i], dtype=np.int64), 2)
        ref = np.random.default_rng(np.random.SeedSequence([SEED, i]))
        assert d1[0] == ref.random() and d2[0] == ref.random()

    check()


# ---------------------------------------------------------------------------
# decoder adversarial-robustness properties (r5): a validation engine's
# decoders must NEVER crash on arbitrary bytes — every outcome is a valid
# PCM array, a ValueError (violation), or a NotImplementedError (documented
# out-of-subset stub). IndexError / OverflowError / struct.error escaping
# the Arrow batch task would fail the whole partition.
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(payload=st.binary(max_size=3000), codec=st.sampled_from(
    ["flac", "opus", "mp3", "pcm_s16le", None, "wma"]))
def test_decode_any_bytes_never_crashes(payload, codec):
    from engine import audio

    try:
        out = audio.decode(payload, codec)
        assert out is None or isinstance(out, np.ndarray)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=100, deadline=None)
@given(tail=st.binary(max_size=2000))
def test_flac_valid_prefix_plus_garbage_never_crashes(tail):
    """Garbage appended after a valid FLAC header/STREAMINFO exercises the
    frame parser (sync, subframe types incl. fixed/LPC, rice partitions)
    with attacker-controlled bits."""
    from engine import audio, flac

    b = flac.streaminfo(8000, 4080) + tail
    try:
        audio.decode(b, "flac")
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 12),
       predictor=st.sampled_from(["fixed", "lpc", "verbatim"]))
def test_flac_multi_byte_corruption_detected_or_identical(seed, n_flips, predictor):
    """Multi-byte corruption of a real coded stream: caught or decodes
    identically — never a silent wrong decode, never a stray exception."""
    from engine import flac

    rng = np.random.default_rng(seed)
    pcm = (np.sin(2 * np.pi * 300 * np.arange(3000) / 8000) * 15000
           + rng.uniform(-60, 60, 3000)).astype(np.int16)
    b = bytearray(flac.encode(pcm, 8000, predictor=predictor))
    for i in rng.choice(np.arange(4, len(b)), size=n_flips, replace=False):
        b[i] ^= int(rng.integers(1, 256))
    try:
        out = flac.decode(bytes(b))
        assert np.array_equal(
            (out * np.float32(32768.0)).astype(np.int16), pcm)
    except (ValueError, NotImplementedError):
        pass
