"""Exact-duplicate clustering (the minimum end-to-end slice).

Semantics transplanted from the reference: a document whose content was seen
before is a duplicate, and the *first* occurrence wins
(first-occurrence-wins deferred commit, code/dedup2.py:13-15,420-421).
"First" for web pages = min (warc_ts, url) — the election rule replacing the
reference's sequential file/scan order (code/dedup2.py:549-554).

Physical shape: one hash aggregate on the content hash (map-side partial
min), no join — the cheapest possible formulation; at 10^12 docs this is a
single shuffle keyed by a uniformly-distributed 64-bit hash, which AQE can
coalesce freely (no skew by construction unless true mega-duplicates exist,
which is exactly the data's skew and is what we want to group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genome_deduplication_spark.functions.hashing import hash128
from genome_deduplication_spark.functions.text import normalize_text


def content_key(text: Column) -> Column:
    """128-bit content hash of normalized text (BINARY(16), unhex'd md5):
    at the 10^12-doc design point a 60/64-bit key silently false-merges
    tens of thousands of unrelated documents (birthday bound); 128 bits
    puts the expectation at ~1e-12. A FLAT binary key, not a struct —
    struct group keys fall off the fast hash-aggregate path (measured
    2.7x pipeline regression with struct<hi,lo>). Oracle-facing queries
    keep the 60-bit hash60 where DuckDB must recompute the value;
    collisions are impossible at oracle scale."""
    return hash128(normalize_text(text))


def exact_dup_clusters(
    pages: DataFrame,
    id_cols: tuple[str, ...] = ("warc_ts", "url"),
    text_col: str = "text",
) -> DataFrame:
    """(id..., cluster table): every row gets the content-hash cluster key and
    the canonical (first-occurrence) member of its cluster.

    Output: id_cols... , content_hash, canonical_<id_cols[-1]>.
    """
    keyed = pages.select(*id_cols, content_key(F.col(text_col)).alias("content_hash"))
    order_struct = F.struct(*[F.col(c) for c in id_cols])
    canon = keyed.groupBy("content_hash").agg(
        F.min(order_struct).alias("_canon"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    canon = canon.select(
        "content_hash",
        F.col(f"_canon.{id_cols[-1]}").alias("canonical_id"),
        "cluster_size",
    )
    return keyed.join(canon, "content_hash")


def exact_dedup_keep_first(
    pages: DataFrame,
    id_cols: tuple[str, ...] = ("warc_ts", "url"),
    text_col: str = "text",
) -> DataFrame:
    """Retain only the canonical row per content hash (the 'samples' of the
    reference: regions kept for training, code/dedup2.py:17)."""
    order_struct = F.struct(*[F.col(c) for c in id_cols])
    ranked = pages.withColumn("content_hash", content_key(F.col(text_col)))
    winners = ranked.groupBy("content_hash").agg(F.min(order_struct).alias("_w"))
    cond = F.lit(True)
    for c in id_cols:
        cond = cond & (F.col(f"_w.{c}") == F.col(c))
    return (
        ranked.join(winners, "content_hash")
        .where(cond)
        .drop("_w")
    )
