"""Dataset-build tail: dedup clusters -> training corpus with train/dev
split (the reference's get_samples.sh pipeline, SURVEY.md §3.2:
partition_samples -> bedtools getfasta -> seeded shuffle -> aggregate).

One Spark job replacing the per-file bash/python/bedtools chain:
  1. keep canonical docs only (one per cluster);
  2. optionally clip retained spans back to text (S6 substring projection);
  3. deterministic dev/train split with a dev-size cap (R2);
  4. seeded shuffle order column (R1) so downstream consumers can stream
     the corpus in a reproducible random order without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genome_deduplication_spark.operators.split import (
    keyed_uniform,
    train_dev_split,
)


def build_training_corpus(
    pages: DataFrame,
    clusters: DataFrame,
    dev_pct: float = 0.1,
    max_dev: int = 100_000,
    seed: int = 123,
) -> DataFrame:
    """(url, warc_ts, text, lang, split, shuffle_key) — canonical docs only.

    The shuffle_key column is the seeded permutation (R1): ordering by it
    reproduces the reference's shuffled aggregate output without a global
    sort at write time (consumers sort-within-partition or range-read).
    """
    canon = clusters.where(F.col("url") == F.col("cluster_id")).select("url")
    kept = pages.join(canon, "url", "left_semi")
    tagged = train_dev_split(kept, dev_pct, max_dev, seed, key_col="url")
    return tagged.withColumn("shuffle_key", keyed_uniform(seed, F.col("url")))


def extract_span_text(
    pages: DataFrame,
    spans: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Project spans back to their text (S6, bedtools-getfasta analogue):
    (url, start, end, span_text). start/end are 0-based UTF-8 BYTE offsets,
    end-exclusive (the span unit contract — see operators/spans.py), so the
    slice runs over the encoded bytes; substring on BINARY is byte-indexed
    and 1-based. Span producers (e.g. self_repeat_spans over multi-byte
    repeats) CAN emit boundaries inside a multi-byte character, so the
    decode must be lenient: strict F.decode throws under ANSI on a
    continuation-byte boundary and would kill the job on one multilingual
    page. The binary->string cast + make_valid_utf8 substitutes U+FFFD
    deterministically instead (same policy as extract_text_from_html)."""
    joined = spans.join(pages.select(id_col, text_col), id_col)
    return joined.select(
        id_col,
        "start",
        "end",
        F.make_valid_utf8(
            F.expr(
                f"substring(encode({text_col}, 'UTF-8'),"
                " CAST(start + 1 AS INT), CAST(end - start AS INT))"
            ).cast("string")
        ).alias("span_text"),
    )
