"""Mergeable t-digest + KS/PSI drift statistics on sketches.

The reference fits its threshold state on the training distribution only
(``anomaly_detection.py:453-456``: histogram at :347-350, KDE + q=0.99
quantile at :371-373) and applies it to test scores (:458-463). At 10^12 rows
the distribution itself can't be materialized, so this module carries it as a
**t-digest** (Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests") — an associative, commutative, bounded-size sketch:

    per-partition build (vectorized numpy over Arrow batches)
      -> merge (driver or treeAggregate combiner)
      -> quantile / cdf queries -> KS statistic & PSI vs a baseline digest.

Pure python/numpy (no external deps); serializes to bytes for storage in a
baseline_stats snapshot table (FIXTURES.md §3).
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TDigest:
    """Merging t-digest with the k1 scale-function size bound.

    Centroids kept sorted by mean; ``compress`` greedily merges neighbors
    while the merged weight stays within the local capacity
    4*n*q(1-q)/compression — small near the tails (accurate extreme
    quantiles), large in the middle.
    """

    __slots__ = ("compression", "means", "weights", "_buf")

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []

    # -- building ------------------------------------------------------------
    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self._buf.append(v)
        if sum(len(b) for b in self._buf) > 32 * self.compression:
            self.compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.compress()
        other.compress()
        if len(other.means):
            self._buf = []
            means = np.concatenate([self.means, other.means])
            weights = np.concatenate([self.weights, other.weights])
            order = np.argsort(means, kind="stable")
            self.means, self.weights = means[order], weights[order]
            self._merge_sorted()
        return self

    def compress(self) -> None:
        if self._buf:
            v = np.concatenate(self._buf)
            self._buf = []
            means = np.concatenate([self.means, v])
            weights = np.concatenate([self.weights, np.ones(len(v))])
            order = np.argsort(means, kind="stable")
            self.means, self.weights = means[order], weights[order]
        self._merge_sorted()

    def _merge_sorted(self) -> None:
        n = float(self.weights.sum())
        if n == 0 or len(self.means) <= 1:
            return
        out_m: list[float] = []
        out_w: list[float] = []
        cum = 0.0
        cur_m, cur_w = self.means[0], self.weights[0]
        for m, w in zip(self.means[1:], self.weights[1:]):
            q = (cum + cur_w / 2.0) / n
            cap = max(1.0, 4.0 * n * q * (1.0 - q) / self.compression)
            if cur_w + w <= cap:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- queries ---------------------------------------------------------------
    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) + sum(len(b) for b in self._buf)

    def quantile(self, q: float) -> float:
        self.compress()
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        n = self.weights.sum()
        target = q * n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target) - 1
        t = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + t * (self.means[i + 1] - self.means[i]))

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        self.compress()
        xs = np.asarray(xs, dtype=np.float64)
        if not len(self.means):
            return np.full(len(xs), np.nan)
        n = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return np.interp(xs, self.means, cum / n, left=0.0, right=1.0)

    # -- serialization -----------------------------------------------------------
    def to_bytes(self) -> bytes:
        self.compress()
        head = struct.pack("<Iq", self.compression, len(self.means))
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        compression, k = struct.unpack("<Iq", b[:12])
        d = cls(compression)
        d.means = np.frombuffer(b[12 : 12 + 8 * k]).copy()
        d.weights = np.frombuffer(b[12 + 8 * k : 12 + 16 * k]).copy()
        return d


# ---------------------------------------------------------------------------
# distributed build: per-partition digests via Arrow batches, merged centrally
# ---------------------------------------------------------------------------

def build_digest(
    df: DataFrame,
    column: str,
    compression: int = 200,
    tree_combine: bool = False,
    max_driver_partials: int = 1024,
) -> TDigest:
    """One scan: per-partition t-digests built from Arrow batches
    (vectorized ``add``), merged associatively.

    ``tree_combine=False``: flat driver merge — exact and fine up to ~10^4
    partitions. ``tree_combine=True``: treeAggregate semantics — an
    intermediate executor-side combine level (digests shuffled into
    ~sqrt(n_partitions) groups, merged per group) before the driver merge, so
    at 10^6-partition scale the driver only ever sees ~10^3 partials.

    Determinism: digest merge order perturbs the centroids slightly, so every
    level is keyed and ordered — each partial carries its source partition id,
    the combine level groups on ``pmod(pid, fan_in)`` (not round-robin
    ``repartition()``, which is retry-nondeterministic) and merges in pid
    order, and the driver merges the combine outputs in group-key order.
    Re-running the same input yields a bit-identical digest."""
    col_df = df.select(F.col(column).cast("double").alias("v"))

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        d = TDigest(compression)
        for pdf in batches:
            d.add(pdf["v"].to_numpy())
        yield pd.DataFrame({"pid": [pid], "digest": [d.to_bytes()]})

    partials = col_df.mapInPandas(per_partition, schema="pid long, digest binary")

    if tree_combine:

        def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            rows: list[tuple[int, bytes]] = []
            for pdf in batches:
                rows += [(int(p), bytes(b)) for p, b in zip(pdf["pid"], pdf["digest"])]
            if not rows:
                return
            rows.sort(key=lambda r: r[0])
            d = TDigest(compression)
            for _, b in rows:
                d.merge(TDigest.from_bytes(b))
            yield pd.DataFrame({"pid": [rows[0][0]], "digest": [d.to_bytes()]})

        # as many combine levels as needed (√n fan-in per level): 10^6
        # partitions -> 10^3 -> driver; each level keyed + pid-ordered so the
        # result stays bit-deterministic
        n_parts = col_df.rdd.getNumPartitions()
        while n_parts > max_driver_partials:
            fan_in = max(int(n_parts ** 0.5), 1)
            partials = partials.repartition(
                fan_in, F.pmod(F.col("pid"), F.lit(fan_in))
            ).mapInPandas(combine, schema="pid long, digest binary")
            n_parts = fan_in

    merged = sorted(partials.collect(), key=lambda r: r["pid"])
    out = TDigest(compression)
    for r in merged:
        out.merge(TDigest.from_bytes(bytes(r["digest"])))
    return out


def build_digests(df: DataFrame, columns: list[str], compression: int = 200) -> dict[str, TDigest]:
    """Digests for several columns in ONE scan (column-pruned)."""
    sel = df.select(*[F.col(c).cast("double").alias(c) for c in columns])

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        ds = {c: TDigest(compression) for c in columns}
        for pdf in batches:
            for c in columns:
                ds[c].add(pdf[c].to_numpy())
        yield pd.DataFrame(
            {
                "pid": [pid] * len(columns),
                "column_name": columns,
                "digest": [ds[c].to_bytes() for c in columns],
            }
        )

    parts = sel.mapInPandas(
        per_partition, schema="pid long, column_name string, digest binary"
    ).collect()
    out = {c: TDigest(compression) for c in columns}
    # pid-ordered merge: digest merging is order-sensitive at the float level,
    # and collect() row order is not guaranteed across reruns
    for r in sorted(parts, key=lambda r: r["pid"]):
        out[r["column_name"]].merge(TDigest.from_bytes(r["digest"]))
    return out


# ---------------------------------------------------------------------------
# drift statistics on sketches
# ---------------------------------------------------------------------------

def ks_statistic(a: TDigest, b: TDigest) -> float:
    """Two-sample KS statistic approximated on the digests: max |F_a - F_b|
    over the union of centroid locations."""
    a.compress()
    b.compress()
    xs = np.union1d(a.means, b.means)
    if not len(xs):
        return 0.0
    return float(np.max(np.abs(a.cdf(xs) - b.cdf(xs))))


def psi(baseline: TDigest, current: TDigest, bins: int = 10, eps: float = 1e-6) -> float:
    """Population Stability Index on ``bins`` equal-mass baseline buckets
    (edges = baseline quantiles): sum (p_cur - p_base) * ln(p_cur / p_base)."""
    edges = [baseline.quantile(i / bins) for i in range(1, bins)]
    edges = np.unique(np.asarray(edges, dtype=np.float64))
    if not len(edges):
        return 0.0

    def bucket_probs(d: TDigest) -> np.ndarray:
        c = d.cdf(edges)
        p = np.diff(np.concatenate([[0.0], c, [1.0]]))
        return np.clip(p, eps, None)

    p, q = bucket_probs(baseline), bucket_probs(current)
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum((q - p) * np.log(q / p)))


def categorical_psi(
    baseline_counts: dict[str, int], current_counts: dict[str, int], eps: float = 1e-6
) -> float:
    """PSI over a categorical domain (e.g. codec mix drift)."""
    keys = sorted(set(baseline_counts) | set(current_counts))
    p = np.array([baseline_counts.get(k, 0) for k in keys], dtype=np.float64)
    q = np.array([current_counts.get(k, 0) for k in keys], dtype=np.float64)
    p = np.clip(p / max(p.sum(), 1.0), eps, None)
    q = np.clip(q / max(q.sum(), 1.0), eps, None)
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum((q - p) * np.log(q / p)))
