"""Text-analysis operators for training-data pipelines.

Everything here is expression-only (JVM-side, whole-stage codegen) — no Python
in the hot path. Heuristics are deterministic so they reproduce bit-for-bit in
an external SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# function-word list used by the lang-id + quality heuristics (the fixture
# vocabulary is English-ish; real deployments swap per-language lists)
STOP_EN = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

#: BPE-ish tokenizer regex: letter runs | digit runs | single non-alnum glyph
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def stopword_ratio(text_col: str, stoplist=STOP_EN) -> Column:
    w = words(text_col)
    in_list = F.filter(w, lambda x: x.isin(list(stoplist)))
    return F.size(in_list) / F.size(w)


def lang_id(text_col: str, threshold: float = 0.05) -> Column:
    """N-gram/function-word heuristic: docs whose function-word ratio clears
    ``threshold`` are tagged 'en', else 'und'. (A real system scores several
    per-language lists and argmaxes — same shape, more columns.)"""
    return F.when(stopword_ratio(text_col) > threshold, F.lit("en")).otherwise(
        F.lit("und")
    )


def token_counts(text_col: str) -> dict[str, Column]:
    """Whitespace tokens + BPE-ish regex tokens + chars."""
    return {
        "ws_tokens": F.size(words(text_col)),
        "re_tokens": F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)),
        "n_chars": F.length(F.col(text_col)),
    }


def quality_score(text_col: str) -> Column:
    """Deterministic quality score in [0,1]: length band + mean word length
    band + stopword-ratio band — the usual cheap pre-filter stack
    (length/punct/stopword ratios) used before expensive dedup/training."""
    n_chars = F.length(F.col(text_col)).cast("double")
    n_words = F.size(words(text_col)).cast("double")
    mean_wlen = (n_chars - (n_words - 1)) / n_words  # spaces removed
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    stop = stopword_ratio(text_col)
    stop_ok = F.when((stop >= 0.01) & (stop <= 0.6), 1.0).otherwise(0.0)
    return (len_ok * 0.4 + wlen_ok * 0.3 + stop_ok * 0.3)


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer et al., SIGMOD'03):
    hash all k-char grams, keep the minimum hash of every w-gram window.

    Expression-only AND shuffle-free until the final fingerprint distinct:
    the k-gram hashes stay an ARRAY column, and the per-window minima are
    computed with ``transform + slice + array_min`` on that array — nothing
    explodes (and nothing shuffles) at gram granularity. The round-1 design
    posexploded one row per character position and ran ``min() OVER`` on the
    gram stream, forcing an Exchange of ~n_chars rows per doc — a
    scale-killer at 100 TB of text. Here the only shuffle is the final
    groupBy, whose map-side partial agg already collapses to distinct
    (doc, fingerprint) pairs. Output: (id, pos, fingerprint) — the distinct
    window-min hashes with their first (0-based) positions."""
    hashes = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> md5(substring({text_col}, i, {k})))"
    )
    # slice() clips at the array end, matching the window frame's shrink at
    # the tail (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)
    wins = F.expr(
        f"transform(sequence(1, size(__hs)), "
        f"i -> struct(i - 1 AS pos, array_min(slice(__hs, i, {w})) AS fingerprint))"
    )
    return (
        df.select(F.col(id_col), hashes.alias("__hs"))
        .select(F.col(id_col), F.explode(wins).alias("s"))
        .groupBy(id_col, F.col("s.fingerprint").alias("fingerprint"))
        .agg(F.min("s.pos").alias("pos"))
        .select(id_col, "pos", "fingerprint")
    )
