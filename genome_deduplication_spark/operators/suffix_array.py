"""Exact long-common-substring pass over candidate pairs.

The masked-region analogue (reference: duplicate k-mer positions become
masked spans, code/dedup2.py:18,235-246): two documents that share one long
verbatim substring are duplicates-in-part even when whole-document Jaccard
is below threshold (a press release quoted inside distinct articles).

Physical shape: the candidate pair list joins back to text ONCE
(sort-merge join on id), then ``applyInPandas`` per bounded group runs an
O(n log n) suffix-array (prefix-doubling, pure numpy) over the concatenation
of the two docs and scans adjacent suffix pairs from different docs for the
longest cross-document LCP. Group sizes are bounded by the LSH bucket caps,
so no group explodes an executor.

The same kernel, run on a single document against itself, finds internal
repeats — the reference's internal-vs-global repeat discrimination
(code/dedup2.py:177-195).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _suffix_array_ranks(
    data: np.ndarray,
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Prefix-doubling suffix array (O(n log^2 n)) + rank history.

    Returns (sa, ranks) where ranks is [(width, r)] and r[i] == r[j] iff
    data[i:i+width] == data[j:j+width] — the sparse table the vectorized
    LCP walk consumes (no per-character Python loop anywhere).
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    order = np.argsort(data, kind="stable")
    r = np.empty(n, dtype=np.int64)
    r[order] = np.cumsum(
        np.concatenate(([0], (np.diff(data[order]) != 0).astype(np.int64)))
    )
    ranks: list[tuple[int, np.ndarray]] = [(1, r.astype(np.int32))]
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = r[k:]
        comp = r * (n + 1) + (key2 + 1)
        order = np.argsort(comp, kind="stable")
        newr = np.empty(n, dtype=np.int64)
        newr[order] = np.cumsum(
            np.concatenate(([0], (np.diff(comp[order]) != 0).astype(np.int64)))
        )
        r = newr
        k *= 2
        ranks.append((k, r.astype(np.int32)))
        if r[order[-1]] == n - 1:
            break
    sa = np.empty(n, dtype=np.int64)
    sa[r] = np.arange(n)
    return sa, ranks


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Prefix-doubling suffix array over an int array (O(n log^2 n))."""
    return _suffix_array_ranks(data)[0]


def _lcp_from_ranks(
    n: int, sa: np.ndarray, ranks: list[tuple[int, np.ndarray]]
) -> np.ndarray:
    """Vectorized LCP of adjacent SA entries via the doubling rank table.

    Classic sparse-table walk, batched over all n-1 adjacent pairs at once:
    descend widths; wherever rank_w[i] == rank_w[j] the pair shares a
    w-prefix — advance both cursors by w and accumulate. O(n log n) numpy,
    replacing the one-char-per-Python-iteration Kasai loop that dominated
    the substring stage at scale.
    """
    if n < 2:
        return np.zeros(n, dtype=np.int64)
    i = sa[1:].copy()
    j = sa[:-1].copy()
    h = np.zeros(n - 1, dtype=np.int64)
    for w, r in reversed(ranks):
        alive = (i + w <= n) & (j + w <= n)
        if not alive.any():
            continue
        eq = alive.copy()
        eq[alive] = r[i[alive]] == r[j[alive]]
        h[eq] += w
        i[eq] += w
        j[eq] += w
    lcp = np.zeros(n, dtype=np.int64)
    lcp[1:] = h
    return lcp


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP of adjacent suffixes in SA order (vectorized, see _lcp_from_ranks).

    Recomputes the rank table from `data` (the passed sa is only used for
    adjacency order) — callers that need both should use
    suffix_array_and_lcp, which builds the rank table once."""
    _, ranks = _suffix_array_ranks(data)
    return _lcp_from_ranks(len(data), sa, ranks)


def suffix_array_and_lcp(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sa, lcp) from ONE prefix-doubling pass — the suffix_array() +
    lcp_array() call sequence runs the O(n log^2 n) doubling twice; every
    hot kernel below uses this combined entry point instead."""
    sa, ranks = _suffix_array_ranks(data)
    return sa, _lcp_from_ranks(len(data), sa, ranks)


def longest_common_substring_len(a: str, b: str) -> int:
    """Longest verbatim substring shared by a and b (suffix array + LCP)."""
    if not a or not b:
        return 0
    xa = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    xb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    sep = np.array([256], dtype=np.int64)  # out-of-alphabet separator
    data = np.concatenate([xa, sep, xb])
    na = len(xa)
    sa, ranks = _suffix_array_ranks(data)
    lcp = _lcp_from_ranks(len(data), sa, ranks)
    # adjacent suffixes from different docs (separator belongs to neither)
    from_a = sa < na
    from_b = sa > na
    cross = (from_a[1:] & from_b[:-1]) | (from_b[1:] & from_a[:-1])
    return int(lcp[1:][cross].max()) if cross.any() else 0


def longest_self_repeat_len(a: str) -> int:
    """Longest substring occurring >= twice within one document (max LCP)."""
    if not a:
        return 0
    data = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    _, lcp = suffix_array_and_lcp(data)
    return int(lcp.max()) if len(lcp) else 0


def anchor_candidate_pairs(
    docs: DataFrame,
    min_len: int,
    shingle_k: int,
    max_bucket_size: int = 200,
    min_shared_anchors: int = 2,
    anchor_k: int | None = None,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs for the exact-substring pass via anchor shingles.

    The reference catches shared substrings because *every* k-mer enters one
    global set (code/dedup2.py:142) — any overlap of length >= k collides.
    At web scale indexing every shingle is the full inverted index; instead
    we index only *anchor* shingles (hash % m == 0, winnowing-style
    fingerprinting). A shared substring of length >= min_len contains
    (min_len - anchor_k + 1) consecutive anchor-width shingles, so with
    m = window / 4 the expected number of shared anchors is ~4 and the miss
    probability (1 - 1/m)^window ~ e^-4 < 2%. Deterministic — no rand().

    ``anchor_k`` is intentionally much wider than the similarity shingle
    (default ~min_len/2, capped at 48): a 9-char shingle is not
    discriminative on low-entropy text (common phrases collide corpus-wide,
    exploding the candidate set), while a 48-char exact match between
    non-duplicated documents is vanishingly rare. This mirrors the
    reference's choice of k=32 over a 4-letter alphabet — the anchor must
    carry enough entropy to make chance collisions negligible
    (code/dedup2.py:576, k default discussion).
    """
    from genome_deduplication_spark.functions.shingles import char_shingles64

    if anchor_k is None:
        anchor_k = max(shingle_k, min(48, min_len // 2))
    window = max(min_len - anchor_k + 1, 1)
    m = max(window // 4, 1)
    # xxhash64 (not the portable md5 hash): anchors never need cross-engine
    # reproduction, and xxhash is ~an order of magnitude cheaper per window
    anchors = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                char_shingles64(F.col(text_col), anchor_k),
                lambda h: F.pmod(h, F.lit(m)) == 0,
            )
        ).alias("anchor"),
    )
    return pairs_from_anchor_rows(
        anchors, max_bucket_size, min_shared_anchors, id_col=id_col
    )


def pairs_from_anchor_rows(
    anchors: DataFrame,
    max_bucket_size: int,
    min_shared_anchors: int,
    id_col: str = "url",
) -> DataFrame:
    """(id, anchor) rows -> candidate (id_a < id_b) pairs.

    Boilerplate prune: an anchor present in more than `max_bucket_size`
    documents is template text (headers/footers/navigation), not a quoted
    passage — its bucket is DROPPED, not sampled. Template anchors are
    all-or-nothing (every templated doc shares the identical windows), so
    rank-sampling them would still emit cap^2 useless pairs per anchor.
    This deliberately diverges from the reference (which masks every
    duplicate k-mer regardless of frequency, code/dedup2.py:142): at
    10^12 docs, frequency IS the boilerplate/quotation signal.
    """
    # Physical shape (rewritten in round 5 after the 640k profile): the old
    # a-join-b self-join exchanged the full (anchor, id) payload twice and
    # sort-merge-joined two 10M-row string-keyed sides — ~730 CPU-s at
    # local[8], amplified by this host's flat aggregate memory-bandwidth
    # cap (BENCH.md round 5). Now: count-first drop of template anchors
    # (map-side combinable, so mega-anchors never reach a reducer), ONE
    # exchange of the kept rows keyed by compact hash128 ids, capped
    # member arrays, and pairs emitted by array transforms (the lsh.py
    # clique pattern — cap 50 bounds a row to 1225 pair structs). The
    # small surviving pair set joins back to real ids at the end.
    compact = isinstance(anchors.schema[id_col].dataType, T.StringType)
    if compact:
        from genome_deduplication_spark.functions.hashing import hash128

        key_col = "_sa_key"
        keyed = anchors.select(
            "anchor", hash128(F.col(id_col)).alias(key_col)
        )
        # distinct (group-by-only => buffer-free HashAggregate; md5
        # collisions make key<->id effectively bijective)
        idmap = anchors.select(
            hash128(F.col(id_col)).alias(key_col), F.col(id_col)
        ).distinct()
    else:
        key_col = id_col
        keyed = anchors

    # df >= 2: an anchor seen in one document cannot witness a shared
    # substring — pruning singletons here (the overwhelming majority of
    # anchors) keeps them out of the member join + collect_list entirely
    small = (
        keyed.groupBy("anchor")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= max_bucket_size))
        .select("anchor")
    )
    members = (
        keyed.join(small, "anchor")
        .groupBy("anchor")
        .agg(F.sort_array(F.collect_list(key_col)).alias("m"))
        .where(F.size("m") >= 2)
    )
    clique = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.slice(F.col("m"), i + 2, max_bucket_size),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # require >= min_shared_anchors distinct shared anchors: a true shared
    # substring of min_len yields ~4 expected anchors; a single chance anchor
    # collision (one common phrase) is pruned before any suffix-array work
    pairs = (
        members.select(F.explode(clique).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        # duplicate (id, anchor) input rows (allowed by the public
        # contract) repeat a key inside the sorted member array, which
        # would emit self-pairs — filter them (ADVICE r5 #1); row-local,
        # runs before the aggregate so it costs nothing measurable
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_anchors"))
        .where(F.col("n_shared_anchors") >= min_shared_anchors)
        .select("id_a", "id_b")
    )
    if compact:
        map_a = idmap.select(
            F.col(key_col).alias("id_a"), F.col(id_col).alias("_ia")
        )
        map_b = idmap.select(
            F.col(key_col).alias("id_b"), F.col(id_col).alias("_ib")
        )
        pairs = (
            pairs.join(map_a, "id_a")
            .join(map_b, "id_b")
            .select(
                F.least("_ia", "_ib").alias("id_a"),
                F.greatest("_ia", "_ib").alias("id_b"),
            )
        )
    return pairs


def exact_substring_pairs(
    pairs: DataFrame,
    pages: DataFrame,
    min_len: int,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Candidate (id_a, id_b) pairs -> those sharing a substring >= min_len.

    Output: id_a, id_b, lcs_len, is_substring_dup.
    """
    texts = pages.select(F.col(id_col), F.col(text_col))
    joined = (
        pairs.join(texts.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed(text_col, "text_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed(text_col, "text_b"), "id_b")
    )

    schema = T.StructType(
        [
            T.StructField("id_a", T.StringType()),
            T.StructField("id_b", T.StringType()),
            T.StructField("lcs_len", T.LongType()),
        ]
    )

    def _kernel(it):
        for pdf in it:
            lens = [
                longest_common_substring_len(ta or "", tb or "")
                for ta, tb in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "lcs_len": lens}
            )

    # the kernel is per-ROW (each pair independent), so mapInPandas — no
    # group key, no shuffle, and parallelism scales with input partitions
    # instead of a fixed bucket constant. Arrow batches bound memory; the
    # upstream pair join already spread pairs across partitions.
    out = joined.mapInPandas(_kernel, schema)
    return out.withColumn("is_substring_dup", F.col("lcs_len") >= F.lit(min_len))
