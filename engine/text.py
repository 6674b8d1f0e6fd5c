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


def _winnow_batches(k: int, w: int, batches):
    """mapInArrow body of ``winnow_fingerprints``: per Arrow batch, hash
    every k-char gram of every doc with the VECTORIZED MD5 (engine/md5np —
    one numpy round-loop per 8k-gram slice instead of one JVM digest call
    per gram), take the per-window argmin on (hi, lo) uint64 digest views,
    and dedup (fingerprint -> min pos) per doc with one lexsort — the whole
    operator runs inside the scan stage, no gram ever leaves the task.

    ASCII fast path is fully vectorized; docs with non-ASCII chars (where
    char offsets != byte offsets) or fewer than k chars take an exact
    per-doc hashlib path with identical semantics (substring clipping at
    the tail, whole-text gram for short docs)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from engine import md5np

    for rb in batches:
        names = rb.schema.names
        ids = rb.column(0)
        texts = rb.column(1)
        n = rb.num_rows
        out_rows: list[np.ndarray] = []   # row index into the batch
        out_pos: list[np.ndarray] = []
        out_fp_arrays: list[pa.Array] = []

        # --- flat byte view of the utf8 column (offset width per arrow type:
        # string -> int32, large_string -> int64)
        bufs = texts.buffers()
        off_dt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        off_raw = np.frombuffer(bufs[1], dtype=off_dt)[
            texts.offset : texts.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, dtype=np.uint8)
        )
        valid = np.ones(n, dtype=bool)
        if texts.null_count:
            valid = ~np.asarray(pa.compute.is_null(texts))
        blens = off_raw[1:] - off_raw[:-1]
        # docs whose bytes are pure ASCII have char offsets == byte offsets;
        # one global max answers the common all-ASCII batch in one pass
        is_ascii = np.ones(n, dtype=bool)
        seg_all = data[off_raw[0] : off_raw[-1]]
        if len(seg_all) and seg_all.max() >= 128:
            for j in range(n):
                if valid[j] and blens[j]:
                    seg = data[off_raw[j] : off_raw[j + 1]]
                    if seg.max() >= 128:
                        is_ascii[j] = False
        fast = valid & is_ascii & (blens >= k)
        slow = valid & ~fast

        # --- vectorized path: all >=k-char ASCII docs of the batch at once
        if fast.any():
            docs = np.flatnonzero(fast)
            g = (blens[docs] - (k - 1)).astype(np.int64)  # grams per doc
            tot = int(g.sum())
            gcum = np.concatenate(([0], np.cumsum(g)))
            doc_row = np.repeat(docs, g).astype(np.int64)
            pos_in_doc = (np.arange(tot) - np.repeat(gcum[:-1], g)).astype(np.int64)
            abs_start = np.repeat(off_raw[docs], g) + pos_in_doc
            M = data[abs_start[:, None] + np.arange(k)]
            dig = md5np.md5_fixed_chunked(M) if k <= 55 else md5np.md5_digests_chunked(
                M.reshape(-1), np.arange(0, (tot + 1) * k, k)
            )
            hi, lo = md5np.digests_to_u64_pair(dig)
            gd = np.repeat(g, g)  # grams-in-doc, per gram
            best = np.arange(tot, dtype=np.int64)
            for d in range(1, w):
                cand = np.minimum(np.arange(tot) + d, tot - 1)
                ok = pos_in_doc + d < gd
                chi, clo = hi[cand], lo[cand]
                bhi, blo = hi[best], lo[best]
                take = ok & ((chi < bhi) | ((chi == bhi) & (clo < blo)))
                best = np.where(take, cand, best)
            whi, wlo = hi[best], lo[best]
            order = np.lexsort((pos_in_doc, wlo, whi, doc_row))
            dr, h1, l1 = doc_row[order], whi[order], wlo[order]
            first = np.ones(tot, dtype=bool)
            first[1:] = (dr[1:] != dr[:-1]) | (h1[1:] != h1[:-1]) | (l1[1:] != l1[:-1])
            keep = order[first]
            out_rows.append(doc_row[keep])
            out_pos.append(pos_in_doc[keep])
            out_fp_arrays.append(
                md5np.hex_string_array(md5np.digests_to_hex_bytes(dig[best[keep]]))
            )

        # --- exact per-doc path: short or non-ASCII docs (char semantics)
        for j in np.flatnonzero(slow):
            s = texts[int(j)].as_py()
            rng = max(len(s) - (k - 1), 1)
            hashes = [
                hashlib.md5(s[i : i + k].encode("utf-8")).hexdigest()
                for i in range(rng)
            ]
            mins: dict[str, int] = {}
            for i in range(rng):
                wmin = min(hashes[i : i + w])
                mins.setdefault(wmin, i)
            if mins:
                out_rows.append(np.full(len(mins), j, dtype=np.int64))
                out_pos.append(np.fromiter(mins.values(), dtype=np.int64))
                out_fp_arrays.append(pa.array(list(mins.keys()), type=pa.string()))

        if not out_rows:
            continue
        rows = np.concatenate(out_rows)
        pos = np.concatenate(out_pos).astype(np.int32)
        fps = (
            pa.concat_arrays(out_fp_arrays)
            if len(out_fp_arrays) > 1
            else out_fp_arrays[0]
        )
        yield pa.RecordBatch.from_arrays(
            [ids.take(pa.array(rows)), pa.array(pos), fps],
            names=[names[0], "pos", "fingerprint"],
        )


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer et al., SIGMOD'03):
    hash all k-char grams, keep the minimum hash of every w-gram window.
    Output: (id, pos, fingerprint) — the distinct window-min hashes with
    their first (0-based) positions.

    Shuffle-FREE and Python-vectorized since r7: one ``mapInArrow`` pass
    hashes every gram with the numpy block-parallel MD5 (engine/md5np,
    ~4M hashes/s/core vs ~1M/s for the JVM md5() expression, which pays
    per-call digest setup) and dedups (fingerprint -> min pos) inside the
    batch, so the operator emits its final rows straight out of the scan
    stage. The round-1 design posexploded one row per character position
    and ran ``min() OVER`` (an Exchange of ~n_chars rows per doc); round 2-6
    kept the grams in an array column but still exploded into a groupBy
    Exchange of (doc, fingerprint) pairs. Nothing explodes, nothing
    shuffles at any granularity now — at 100 TB the cost is exactly one
    pass over the text."""
    from functools import partial

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(
        partial(_winnow_batches, k, w),
        schema=f"{id_col} {id_type}, pos int, fingerprint string",
    )
