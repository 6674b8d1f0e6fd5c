"""Focused tests for the r7 vectorized rewrites: the numpy MD5 kernel and
the mapInArrow winnow / minhash paths must be bit-identical to the old
JVM-expression semantics on every edge (nulls, empties, runs of spaces,
unicode, short docs, duplicate shingles)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# md5np vs hashlib (property)
# ---------------------------------------------------------------------------

def test_md5np_matches_hashlib_all_lengths():
    from engine import md5np

    rng = np.random.default_rng(42)
    msgs = [bytes(rng.integers(0, 256, size=L, dtype=np.uint8)) for L in
            [0, 1, 7, 8, 54, 55, 56, 63, 64, 65, 119, 120, 128, 200, 1000]]
    buf = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    offs = np.cumsum([0] + [len(m) for m in msgs])
    dig = md5np.md5_digests(buf, offs)
    for i, m in enumerate(msgs):
        assert dig[i].tobytes() == hashlib.md5(m).digest(), len(m)
    # fixed-width + chunked paths
    mat = rng.integers(0, 256, size=(20000, 8), dtype=np.uint8)
    dig2 = md5np.md5_fixed_chunked(mat, chunk=4096)
    for i in (0, 1, 4095, 4096, 19999):
        assert dig2[i].tobytes() == hashlib.md5(mat[i].tobytes()).digest()
    # (hi, lo) ordering == hex-string ordering
    hi, lo = md5np.digests_to_u64_pair(dig2)
    hexes = [hashlib.md5(mat[i].tobytes()).hexdigest() for i in range(2000)]
    order_np = np.lexsort((lo[:2000], hi[:2000]))
    assert [hexes[i] for i in order_np] == sorted(hexes)
    # hex encoding + arrow round trip
    arr = md5np.hex_string_array(md5np.digests_to_hex_bytes(dig2[:100]))
    assert arr.to_pylist() == [hashlib.md5(mat[i].tobytes()).hexdigest()
                               for i in range(100)]


# ---------------------------------------------------------------------------
# winnow mapInArrow vs reference python semantics
# ---------------------------------------------------------------------------

def _winnow_ref(s: str, k: int, w: int) -> set[tuple[int, str]]:
    rng = max(len(s) - (k - 1), 1)
    hashes = [hashlib.md5(s[i : i + k].encode()).hexdigest() for i in range(rng)]
    mins: dict[str, int] = {}
    for i in range(rng):
        mins.setdefault(min(hashes[i : i + w]), i)
    return {(pos, fp) for fp, pos in mins.items()}


@pytest.mark.parametrize("k,w", [(8, 4), (5, 3)])
def test_winnow_arrow_edge_cases(spark, k, w):
    from engine.text import winnow_fingerprints

    docs = [
        (0, "abcdefghijklmnopqrstuvwxyz0123456789"),
        (1, ""),                      # empty -> one fingerprint of md5("")
        (2, "short"),                 # < k chars -> whole-text gram
        (3, "aaaaaaaaaaaaaaaaaaaa"),  # all-identical grams (dup fingerprints)
        (4, "héllo wörld ünicode text with àccents everywhere ok"),  # non-ASCII
        (5, None),                    # null -> no rows
        (6, "spaces   and   runs   of   spaces   here we go now"),
        (7, "x" * (k - 1)),           # exactly k-1 chars
        (8, "x" * k),                 # exactly k chars -> one gram
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    for did, txt in docs:
        if txt is None:
            assert did not in got
        else:
            assert got.get(did, set()) == _winnow_ref(txt, k, w), (did, txt)


# ---------------------------------------------------------------------------
# minhash mapInArrow vs reference python semantics
# ---------------------------------------------------------------------------

def _minhash_ref(s: str | None, n_bands: int, k: int) -> dict[int, str | None]:
    if s is None:
        return {b: None for b in range(n_bands)}
    ws = s.split(" ")  # java split(-1) == python split(' '): empties kept
    if len(ws) >= k:
        shingles = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    else:
        shingles = [s]
    return {
        b: min(hashlib.md5(f"{b}|{sh}".encode()).hexdigest() for sh in shingles)
        for b in range(n_bands)
    }


def test_minhash_arrow_edge_cases(spark):
    from engine.dedup import minhash_signatures

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, ""),                       # 1 word -> whole-text shingle
        (2, "one two"),                # < k words -> whole-text shingle
        (3, "one two three"),          # exactly k words -> one shingle
        (4, None),                     # null -> null minhash per band
        (5, "a  b   c d"),             # space runs -> empty words kept
        (6, " leading and trailing "),
        (7, "héllo wörld ünicode texte à trois mots et plus"),
        (8, "dup dup dup dup dup dup dup"),  # duplicate shingles
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[tuple[int, int], str | None] = {}
    for r in minhash_signatures(df, "text", "doc_id", n_bands=8, k=3).collect():
        got[(r["doc_id"], r["band"])] = r["minhash"]
    for did, txt in docs:
        exp = _minhash_ref(txt, 8, 3)
        for b in range(8):
            assert got[(did, b)] == exp[b], (did, b, txt)
    assert len(got) == len(docs) * 8


# ---------------------------------------------------------------------------
# ewma mapInPandas partition path vs per-series pandas reference
# ---------------------------------------------------------------------------

def test_ewma_partition_path_matches_per_series_pandas(spark):
    """The r7 grouped-ewm partition path must be BIT-identical to the old
    per-group applyInPandas (pandas Series.ewm per series) — including a
    series that spans several Arrow chunks, duplicate order keys resolved
    by the secondary key, and a single-row series."""
    import pandas as pd

    from engine.scoring import ewma_residual

    rng = np.random.default_rng(5)
    rows = []
    for s in range(40):
        n = int(rng.integers(1, 120))
        for i in range(n):
            rows.append((f"s{s:02d}", i, float(rng.standard_normal())))
    # one long series to span Arrow chunk boundaries
    for i in range(5000):
        rows.append(("long", i, float(rng.standard_normal())))
    pdf = pd.DataFrame(rows, columns=["sid", "idx", "value"])
    df = spark.createDataFrame(pdf).repartition(7)
    got = {
        (r["sid"], r["idx"]): r["ewma"]
        for r in ewma_residual(df, "value", ["idx"], "sid", alpha=0.1).collect()
    }
    for sid, g in pdf.groupby("sid"):
        exp = g.sort_values("idx")["value"].ewm(alpha=0.1, adjust=True).mean().shift(1)
        for (_, row), e in zip(g.sort_values("idx").iterrows(), exp):
            v = got[(row["sid"], row["idx"])]
            if pd.isna(e):
                assert v is None or np.isnan(v)
            else:
                assert v == e, (sid, row["idx"], v, e)


# ---------------------------------------------------------------------------
# r7 structural helpers: scan spreading and lazy violation frames
# ---------------------------------------------------------------------------

def test_spread_is_scale_adaptive(spark):
    """_spread parallelizes a single-split scan but must be a NO-OP when the
    input already carries enough partitions (at production scale no extra
    exchange may appear)."""
    from engine.queries import _spread

    target = spark.sparkContext.defaultParallelism
    small = spark.range(0, 100, 1, 1)
    assert _spread(spark, small).rdd.getNumPartitions() == target
    big = spark.range(0, 1000, 1, target + 4)
    out = _spread(spark, big)
    assert out is big  # untouched: no repartition node added


def test_lazy_violation_frames_defer_construction(spark):
    """run_suite must NOT build per-constraint violation plans until a
    caller indexes them (driver-side analysis cost), while keeping the
    plain-dict contract for assignment and access."""
    from engine import checks
    from engine.suite import ConstraintSuite, Range

    from pyspark.sql import functions as F

    df = spark.range(0, 50).select("id", F.col("id").alias("v"))
    s = ConstraintSuite([Range("v_range", column="v", lo=0, hi=10)])
    res = checks.run_suite(df, s, key_cols=["id"], n_buckets=4, stat_columns=[])
    raw = dict.__getitem__(res.violations, "v_range")
    assert callable(raw) and not hasattr(raw, "columns")  # still a factory
    built = res.violations["v_range"]
    assert hasattr(built, "columns")  # materialized on access
    assert res.violations["v_range"] is built  # cached
    assert built.count() == 39  # 11..49 violate
