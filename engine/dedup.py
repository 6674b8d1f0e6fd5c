"""Deduplication operators for large-scale document pipelines.

All hashing is md5-based (not xxhash64) so every step is reproducible by an
external ANSI-SQL oracle — and deterministic across engines, cluster sizes and
resume boundaries (the engine-wide determinism rule, SURVEY.md §7 hard-part 3).

Scale notes (100 TB story):
  * exact dedup: one shuffle on the 32-hex digest — a narrow key, map-side
    partial agg absorbs duplicate skew.
  * MinHash-LSH: shingle explode happens map-side and is immediately
    re-aggregated per (doc, band) — the shuffle carries only
    n_docs x n_bands rows, never the exploded shingles.
  * candidate pairs: self-join on (band, minhash) buckets; hot buckets (e.g.
    boilerplate docs) are bounded by ``max_bucket_size`` before the join —
    the standard LSH guard against quadratic blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact duplicate groups:
    (text_hash, n_docs, keep_id=min id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact text hash (deterministic keep-first)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def word_shingles(text_col: str, k: int = 3):
    """k-word shingles as an array column (expression, no UDF).

    Docs with < k words fall back to the whole text as a single shingle.
    The split array is bound ONCE via a single-element transform lambda —
    the r1-r6 version re-evaluated ``split(text)`` inside the per-shingle
    lambda, making the expression O(words^2) per doc."""
    words = F.split(F.col(text_col), " ")
    joined = F.expr(
        f"transform(array(split({text_col}, ' ')), ws -> "
        f"transform(sequence(1, size(ws) - {k - 1}), "
        f"i -> concat_ws(' ', slice(ws, i, {k}))))[0]"
    )
    return F.when(F.size(words) >= k, joined).otherwise(F.array(F.col(text_col)))


def _utf8_view(texts, n: int):
    """(byte_offsets int64 (n+1), flat uint8 data, valid bool mask) of a
    pyarrow utf8 array, honoring the array's slice offset and offset width
    (string -> int32, large_string -> int64 — misreading one as the other
    would silently corrupt, so the dtype comes from the arrow type)."""
    import numpy as np
    import pyarrow as pa

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
    return off_raw, data, valid


def _word_spans(data, off_raw, docs):
    """Vectorized single-space word boundaries for the selected docs: byte
    0x20 never occurs inside a UTF-8 multibyte sequence, so byte-splitting
    equals char-splitting with java/python semantics (empties kept).
    Returns (W words-per-doc, wcum, word_start, word_end) — starts/ends are
    absolute offsets into ``data``."""
    import numpy as np

    nd = len(docs)
    d_lo, d_hi = off_raw[docs], off_raw[docs + 1]
    sp = np.flatnonzero(data[off_raw[0] : off_raw[-1]] == 32) + off_raw[0]
    if len(sp):
        owner = np.searchsorted(d_hi, sp, "right")
        inside = (owner < nd) & (sp >= d_lo[np.minimum(owner, nd - 1)])
        sp, owner = sp[inside], owner[inside]
    else:
        owner = sp
    W = np.bincount(owner, minlength=nd) + 1
    wcum = np.concatenate(([0], np.cumsum(W)))
    tw = int(wcum[-1])
    ws = np.empty(tw, dtype=np.int64)
    we = np.empty(tw, dtype=np.int64)
    first = np.zeros(tw, dtype=bool)
    first[wcum[:-1]] = True
    last = np.zeros(tw, dtype=bool)
    last[wcum[1:] - 1] = True
    ws[first] = d_lo
    ws[~first] = sp + 1
    we[last] = d_hi
    we[~last] = sp
    return W, wcum, ws, we


def _minhash_batches(n_bands: int, k: int, batches):
    """mapInArrow body of ``minhash_signatures``. Three exactness-preserving
    rewrites make it vectorizable end to end:

      * a k-word shingle joined with ' ' from a single-space split IS a byte
        span of the original text (joining consecutive split pieces with the
        split char reconstructs the span), so shingles are (start, end)
        pairs into the batch's flat utf8 buffer — no Python string is ever
        built (byte 0x20 never occurs inside a UTF-8 multibyte sequence, so
        this holds for any unicode text);
      * min over the shingle MULTISET equals min over the distinct set, so
        the per-doc array_distinct is dropped;
      * every span is content-hashed once (vectorized MD5, engine/md5np)
        and deduplicated ON THE DIGEST across the whole batch, so the
        n_bands prefixed hashes run once per UNIQUE shingle, not once per
        occurrence (fixture vocabulary repeats shingles heavily).

    Per doc and band, the signature is the lexicographic (hi, lo)-min over
    its instances' band digests via two minimum.reduceat passes — identical
    to min over the 32-char hex strings (hex is a monotone byte map).
    Emits (id, band, minhash); a null text emits n_bands null-minhash rows
    exactly like the old explode(array(null)) -> min(null) plan."""
    import numpy as np
    import pyarrow as pa

    from engine import md5np

    U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    for rb in batches:
        names = rb.schema.names
        ids = rb.column(0)
        texts = rb.column(1)
        n = rb.num_rows
        off_raw, data, valid = _utf8_view(texts, n)
        docs = np.flatnonzero(valid)
        nd = len(docs)
        out_batches = []
        if nd:
            d_lo, d_hi = off_raw[docs], off_raw[docs + 1]
            W, wcum, ws, we = _word_spans(data, off_raw, docs)
            tw = int(wcum[-1])
            # --- shingle spans: words i..i+k-1 -> bytes [ws[i], we[i+k-1])
            has = W >= k
            S = np.where(has, W - (k - 1), 1)  # docs with < k words: whole text
            scum = np.concatenate(([0], np.cumsum(S)))
            ts = int(scum[-1])
            sh_idx = np.arange(ts) - np.repeat(scum[:-1], S)  # shingle no. in doc
            base = np.repeat(wcum[:-1], S)
            sh_start = np.where(
                np.repeat(has, S), ws[np.minimum(base + sh_idx, tw - 1)],
                np.repeat(d_lo, S),
            )
            sh_end = np.where(
                np.repeat(has, S),
                we[np.minimum(base + sh_idx + (k - 1), tw - 1)],
                np.repeat(d_hi, S),
            )
            # --- content-hash every span once; dedup on the digest
            lens = sh_end - sh_start
            flat_off = np.concatenate(([0], np.cumsum(lens)))
            rel = np.arange(int(flat_off[-1])) - np.repeat(flat_off[:-1], lens)
            flat = data[np.repeat(sh_start, lens) + rel]
            cdig = md5np.md5_digests_chunked(flat, flat_off)
            chi, clo = md5np.digests_to_u64_pair(cdig)
            order = np.lexsort((clo, chi))
            oh, ol = chi[order], clo[order]
            grp_first = np.ones(ts, dtype=bool)
            grp_first[1:] = (oh[1:] != oh[:-1]) | (ol[1:] != ol[:-1])
            gid_sorted = np.cumsum(grp_first) - 1
            inv = np.empty(ts, dtype=np.int64)
            inv[order] = gid_sorted
            reps = order[grp_first]  # one representative instance per unique
            nu = len(reps)
            # --- n_bands prefixed hashes per UNIQUE shingle
            r_len = lens[reps]
            r_off = np.concatenate(([0], np.cumsum(r_len + 2)))
            # build "b|<shingle>" messages: shingle bytes scattered once,
            # the 1-byte band prefix rewritten in place per band
            msg = np.empty(int(r_off[-1]), dtype=np.uint8)
            body_rel = np.arange(int(r_len.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(r_len)))[:-1], r_len
            )
            msg[np.repeat(r_off[:-1] + 2, r_len) + body_rel] = data[
                np.repeat(sh_start[reps], r_len) + body_rel
            ]
            msg[r_off[:-1] + 1] = ord("|")
            band_hi = np.empty((n_bands, nu), dtype=np.uint64)
            band_lo = np.empty((n_bands, nu), dtype=np.uint64)
            for b in range(n_bands):
                pre = str(b).encode()
                if len(pre) != 1:  # n_bands > 10 would need wider prefixes
                    raise ValueError("minhash mapInArrow path supports n_bands <= 10")
                msg[r_off[:-1]] = pre[0]
                bdig = md5np.md5_digests_chunked(msg, r_off)
                band_hi[b], band_lo[b] = md5np.digests_to_u64_pair(bdig)
            # --- per-doc, per-band lexicographic min over instances
            starts = scum[:-1]
            doc_of = np.repeat(np.arange(nd), S)
            sig = np.empty((nd * n_bands, 2), dtype=np.uint64)
            for b in range(n_bands):
                ih = band_hi[b][inv]
                il = band_lo[b][inv]
                m_hi = np.minimum.reduceat(ih, starts)
                il2 = np.where(ih == m_hi[doc_of], il, U64MAX)
                m_lo = np.minimum.reduceat(il2, starts)
                sig[b::n_bands, 0] = m_hi
                sig[b::n_bands, 1] = m_lo
            dig_bytes = (
                sig.byteswap() if np.little_endian else sig
            ).view(np.uint8).reshape(nd * n_bands, 16)
            fp = md5np.hex_string_array(md5np.digests_to_hex_bytes(dig_bytes))
            rows = np.repeat(docs, n_bands)
            bands = np.tile(np.arange(n_bands, dtype=np.int32), nd)
            out_batches.append((rows, bands, fp))
        nulls = np.flatnonzero(~valid)
        if len(nulls):
            rows = np.repeat(nulls, n_bands)
            bands = np.tile(np.arange(n_bands, dtype=np.int32), len(nulls))
            fp = pa.array([None] * (len(nulls) * n_bands), type=pa.string())
            out_batches.append((rows, bands, fp))
        if not out_batches:
            continue
        rows = np.concatenate([r for r, _, _ in out_batches])
        bands = np.concatenate([b for _, b, _ in out_batches])
        fps = (
            pa.concat_arrays([f for _, _, f in out_batches])
            if len(out_batches) > 1
            else out_batches[0][2]
        )
        yield pa.RecordBatch.from_arrays(
            [ids.take(pa.array(rows)), pa.array(bands), fps],
            names=[names[0], "band", "minhash"],
        )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_bands: int = 8, k: int = 3
) -> DataFrame:
    """Per-doc MinHash per band: min over shingles of md5(band || '|' || shingle).

    One vectorized ``mapInArrow`` pass since r7 (was: explode shingles ->
    groupBy(doc) with one min-agg per band): shingles never exist as Spark
    rows, every unique shingle is hashed once per band in numpy
    (engine/md5np), and the per-doc minima collapse inside the batch — the
    operator emits its (id, band, minhash) rows straight from the scan
    stage with NO shuffle at all. Returns (id, band, minhash)."""
    from functools import partial

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(
        partial(_minhash_batches, n_bands, k),
        schema=f"{id_col} {id_type}, band int, minhash string",
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, max_bucket_size: int = 1000
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, minhash) bucket.

    Buckets larger than ``max_bucket_size`` are dropped (boilerplate guard —
    at web scale a single hot bucket would otherwise produce O(n^2) pairs).
    Returns distinct (id_a, id_b) with id_a < id_b."""
    b = sigs.groupBy("band", "minhash").agg(
        F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("sz")
    ).filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket_size))
    a = b.select(F.explode("ids").alias("id_a"), "ids")
    pairs = a.select(
        "id_a", F.explode("ids").alias("id_b")
    ).filter(F.col("id_a") < F.col("id_b"))
    return pairs.distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact k-gram Jaccard on candidate pairs (verification step after LSH).

    r7 shape: the candidate set (tiny — LSH output) is materialized ONCE
    with ``localCheckpoint`` so the whole signature/bucket pipeline is not
    re-executed per join branch (guide §3.3: a materialized intermediate
    truncates the plan), then the doc table is pruned to pair PARTICIPANTS
    with a broadcast semi-join before any shingling — the r1-r6 version
    built shingle arrays for every doc, paying the O(words) array build for
    the ~99% of docs no candidate touches. The join then compares
    precomputed array COLUMNS, so the threshold predicate the optimizer
    pushes into the join condition stays cheap. Returns
    (id_a, id_b, jaccard)."""
    pairs = pairs.localCheckpoint()
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = df.join(F.broadcast(ids), id_col, "leftsemi").select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, k)).alias("sh"),
    ).select(F.col(id_col), "sh", F.size("sh").alias("n"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                  F.col("n").alias("na"))
    bb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                   F.col("n").alias("nb"))
    j = pairs.join(a, "id_a").join(bb, "id_b")
    # |A u B| = |A| + |B| - |A n B| for distinct arrays: the union array is
    # never built — one intersect per pair instead of intersect + union
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("na") + F.col("nb")).cast("double") - inter
    return (
        j.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_batches(batches):
    """mapInArrow body of ``simhash64``: per Arrow batch, hash every word
    OCCURRENCE with the vectorized MD5 and reduce the 64 sign-sums per doc
    with one ``add.reduceat`` — the first 16 hex chars of md5 as a 64-bit
    integer are exactly the big-endian u64 of the digest's first 8 bytes,
    so bit j is ``(hi >> j) & 1`` with no hex parsing at all. A null text
    emits no row, matching the old explode(split(null)) plan."""
    import numpy as np
    import pyarrow as pa

    from engine import md5np

    shifts = np.arange(64, dtype=np.uint64)
    for rb in batches:
        names = rb.schema.names
        ids = rb.column(0)
        texts = rb.column(1)
        n = rb.num_rows
        off_raw, data, valid = _utf8_view(texts, n)
        docs = np.flatnonzero(valid)
        nd = len(docs)
        if nd == 0:
            continue
        W, wcum, ws, we = _word_spans(data, off_raw, docs)
        lens = we - ws
        flat_off = np.concatenate(([0], np.cumsum(lens)))
        rel = np.arange(int(flat_off[-1])) - np.repeat(flat_off[:-1], lens)
        flat = data[np.repeat(ws, lens) + rel]
        dig = md5np.md5_digests_chunked(flat, flat_off)
        hi, _lo = md5np.digests_to_u64_pair(dig)
        # one reduceat per bit keeps transient memory at O(occurrences)
        # instead of an (occurrences, 64) matrix — a word-heavy batch would
        # otherwise materialize gigabytes
        ones = np.empty((nd, 64), dtype=np.int64)
        starts = wcum[:-1]
        for j in range(64):
            ones[:, j] = np.add.reduceat((hi >> shifts[j]) & np.uint64(1), starts).astype(np.int64)
        bvals = 2 * ones - W[:, None]
        out = np.where(bvals[:, ::-1] > 0, np.uint8(49), np.uint8(48))  # MSB first
        yield pa.RecordBatch.from_arrays(
            [
                ids.take(pa.array(docs)),
                md5np.fixed_ascii_string_array(np.ascontiguousarray(out)),
            ],
            names=[names[0], "simhash"],
        )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash from word-level md5 bits.

    bit_j(doc) = sign( sum over words of (bit_j(md5(word)) ? +1 : -1) ).
    Uses the first 16 hex chars of md5 as a 64-bit integer. The signature is
    returned as a 64-char '0'/'1' string (exact, portable — no 64-bit
    unsigned headaches); near-dup docs differ in few positions (hamming).

    One vectorized ``mapInArrow`` pass since r7 (was: explode words ->
    64 conditional-sum aggregates over md5-hex substrings): word spans are
    byte slices of the batch buffer, digests come from the numpy MD5, and
    the per-doc sign-sums collapse inside the batch — no explode, no
    groupBy, no shuffle."""
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(
        _simhash_batches,
        schema=f"{id_col} {id_type}, simhash string",
    )


def hamming(a, b):
    """Hamming distance between two 64-char '0'/'1' bit-string columns:
    popcount of the XOR, computed on two 32-bit halves (conv -> bigint fits
    without sign trouble). Identical distances to the r1-r6 per-character
    comparison chain, at 4 integer ops per pair instead of 64 substring
    compares — the verify stage runs over every band-bucket candidate, so
    at near-dup-dense fixtures this is tens of millions of evaluations."""
    def half(col, start):
        return F.conv(F.substring(col, start, 32), 2, 10).cast("long")

    return (
        F.bit_count(half(a, 1).bitwiseXOR(half(b, 1)))
        + F.bit_count(half(a, 33).bitwiseXOR(half(b, 33)))
    ).cast("int")


def band_spans(n_bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Partition ``n_bits`` into ``n_bands`` contiguous (start, width) spans;
    the first ``n_bits % n_bands`` bands are one bit wider so every bit is
    covered even when n_bands does not divide n_bits."""
    base, extra = divmod(n_bits, n_bands)
    spans, pos = [], 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        spans.append((pos, w))
        pos += w
    return spans


def _band_structs(n_bands: int):
    return [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("simhash", start + 1, width).alias("bits"),
        )
        for b, (start, width) in enumerate(band_spans(64, n_bands))
    ]


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Full SimHash near-dup pipeline: signature -> band-bucket join ->
    hamming verification.

    The 64-bit signature is split into ``n_bands`` contiguous bands; by the
    pigeonhole principle any pair within ``max_hamming < n_bands`` differing
    bits shares at least one identical band, so candidate generation is an
    equi-join on (band, band_bits) — no O(n^2) comparison. Completeness
    REQUIRES ``max_hamming < n_bands``: ``n_bands`` is bumped to
    ``max_hamming + 1`` automatically when the caller's value would violate
    the pigeonhole condition (bands may then have uneven widths). Hot buckets
    are bounded like in MinHash-LSH. Returns (id_a, id_b, hamming_dist)."""
    if max_hamming >= n_bands:
        n_bands = max_hamming + 1
    if n_bands > 64:
        raise ValueError(f"n_bands must be <= 64, got {n_bands}")
    sigs = simhash64(df, text_col, id_col)
    bands = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.array(*_band_structs(n_bands))).alias("s"),
    ).select(id_col, "simhash", "s.band", "s.bits")
    b = bands.groupBy("band", "bits").agg(
        F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh"))).alias("rows"),
        F.count(F.lit(1)).alias("sz"),
    ).filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket_size))
    a = b.select(F.explode("rows").alias("ra"), "rows")
    pairs = (
        a.select("ra", F.explode("rows").alias("rb"))
        .filter(F.col("ra.id") < F.col("rb.id"))
        .select(
            F.col("ra.id").alias("id_a"),
            F.col("rb.id").alias("id_b"),
            hamming(F.col("ra.sh"), F.col("rb.sh")).alias("hamming_dist"),
        )
        .filter(F.col("hamming_dist") <= max_hamming)
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over verified pairs)
# ---------------------------------------------------------------------------

def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "min_label",
) -> DataFrame:
    """Connected components over a verified near-duplicate pair graph:
    ``(node, cluster_id)`` with cluster_id = the component's minimum node id
    — the step that turns pairwise near-dup evidence into keep-one-per-
    cluster dedup decisions.

    Iterative min-label propagation, all DataFrame ops: each round every
    node takes the min label across itself and its neighbors; fixpoint in
    O(component diameter) rounds. Near-dup components are LSH-bucket-local
    and shallow (diameter ~2-4), so a handful of rounds suffices; a
    web-graph-scale variant would switch to large-star/small-star
    (O(log n) rounds) at the same call site. Per round: one shuffle join +
    one groupBy on (node) — ``localCheckpoint`` truncates the growing plan
    lineage so round k does not re-execute rounds 1..k-1. The convergence
    probe collects ONE scalar per round (the changed-label count).

    ``algorithm``: 'min_label' (default — raises on non-convergence),
    'two_phase' (delegate to ``near_dup_clusters_twophase``), or 'auto'
    (min-label for the shallow common case; if a component's diameter
    exceeds ``max_iter``, fall back to the O(log n)-round two-phase variant
    instead of aborting — at web scale one deep boilerplate chain should
    not kill the pipeline).
    """
    if algorithm == "two_phase":
        return near_dup_clusters_twophase(pairs, id_a, id_b, max_iter=max_iter)
    if algorithm not in ("min_label", "auto"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nb = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src").agg(F.min("label").alias("nb_label"))
        )
        stepped = (
            labels.join(nb, labels["node"] == nb["src"], "left")
            .select(
                "node", "label",
                F.least(F.col("label"), F.coalesce("nb_label", "label")).alias("new_label"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("new_label") < F.col("label")).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # a label moves ONE hop per round, so a component of diameter >
        # max_iter would exit here with non-minimal labels — silently wrong
        # cluster ids are worse than a loud stop. 'auto' switches to the
        # O(log n)-round two-phase variant; the default stays loud.
        if algorithm == "auto":
            return near_dup_clusters_twophase(pairs, id_a, id_b)
        raise ValueError(
            f"near_dup_clusters did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds it; pass algorithm='auto' "
            "or 'two_phase' for deep graphs)"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def near_dup_clusters_twophase(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond") —
    the O(log n)-round variant of ``near_dup_clusters`` for graphs whose
    diameter can be deep (one boilerplate chain at web scale), where
    min-label's O(diameter) rounds would abort.

    Same signature and output contract as ``near_dup_clusters``:
    ``(node, cluster_id)`` with cluster_id = the component's minimum node id
    (min under the column's natural ordering, so string ids cluster under the
    lexicographic min exactly like the min-label variant).

      * large-star(u): every neighbor v > u re-attaches to
        m = min(N(u) ∪ {u}) — halves long chains.
      * small-star(u): over min-canonicalized edges (u > v), every neighbor
        and u itself attach to m = min(N<(u) ∪ {u}).

    Per round: two groupBy shuffles + two joins on node id; the edge set
    shrinks toward one star per component, at which point the edge list IS
    the (node -> cluster_id) mapping. Fixpoint detection is EXACT (same-count
    + empty set-difference on the canonical edge set), not a checksum, and
    non-convergence still raises rather than returning wrong labels.
    ``localCheckpoint`` truncates plan lineage each round like the min-label
    loop."""
    # every node mentioned in pairs, BEFORE self-loops are dropped: a node
    # appearing only as (x, x) still owes a (x, x) singleton label — the
    # min-label variant emits it, so parity requires it here too
    # (r4 review finding)
    all_nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .unionByName(pairs.select(F.col(id_b).alias("node")))
        .distinct()
    )
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    # carry |e| across rounds: this round's small.count() IS next round's
    # e.count(), so the fixpoint probe costs one job per round, not two
    e_cnt = e.count()
    converged = False
    for _ in range(max_iter):
        # ---- large-star over the bidirectional adjacency
        bidir = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = bidir.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("u", "mn").alias("m")
        )
        large = (
            bidir.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # ---- small-star over min-canonicalized (u > v) edges
        ec = (
            large.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins2 = ec.groupBy("u").agg(F.min("v").alias("m"))
        joined = ec.join(mins2, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # exact fixpoint test: both sides are distinct sets, so equal counts
        # plus one empty difference proves set equality
        s_cnt = small.count()
        if s_cnt == e_cnt and small.exceptAll(e).limit(1).count() == 0:
            e = small
            converged = True
            break
        e, e_cnt = small, s_cnt
    if not converged:
        raise ValueError(
            f"near_dup_clusters_twophase did not converge within "
            f"max_iter={max_iter} rounds"
        )
    # at fixpoint every component is a star rooted at its min node: the edge
    # list is (child, root); roots label themselves
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster_id")
    )
    labeled = e.select(
        F.col("u").alias("node"), F.col("v").alias("cluster_id")
    ).unionByName(roots)
    singletons = all_nodes.join(
        labeled.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("cluster_id"))
    return labeled.unionByName(singletons)
