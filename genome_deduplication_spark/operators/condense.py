"""Gaps-and-islands interval condensation.

The Spark form of the reference's ``condense_masked_regions`` /
``condense_ambiguous_regions`` (code/dedup2.py:235-258): merge consecutive
positions into [start, end) intervals, widening the right edge by ``widen``
(k for masked k-mer starts, 1 for single ambiguous characters).

Classic window pattern: flag where pos != lag(pos)+1, running sum of flags =
island id, group by island. Two shuffles (one for the window partition, one
for the groupBy — Catalyst reuses the partitioning, so effectively one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def condense_positions(
    positions: DataFrame,
    widen: int,
    key_col: str = "url",
    pos_col: str = "pos",
) -> DataFrame:
    """(key, pos) rows -> (key, start, end) maximal intervals.

    start inclusive, end exclusive, end = max(run) + widen — exactly the
    reference's widening rule (code/dedup2.py:241-244 for k, :252-255 for 1).
    """
    w = Window.partitionBy(key_col).orderBy(pos_col)
    flagged = positions.select(key_col, pos_col).distinct().withColumn(
        "_new_island",
        F.when(
            F.col(pos_col) - F.lag(pos_col).over(w) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy(key_col, "_island")
        .agg(
            F.min(pos_col).alias("start"),
            (F.max(pos_col) + F.lit(widen)).alias("end"),
        )
        .drop("_island")
    )


def unused_token_spans(
    docs: DataFrame,
    used_tokens: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    tok_col: str = "tok",
) -> DataFrame:
    """A7 end-to-end: maximal runs of tokens ABSENT from `used_tokens`,
    merged into spans and projected back to text — the reference's
    unused-k-mer merge (summary_stats/unused_kmers.py:63-89: walk the
    sequence, collect positions whose k-mer never appears in the dedup
    output, merge consecutive positions into maximal substrings).

    Composition: posexplode -> anti-join (the set difference) ->
    condense_positions (gaps-and-islands) -> token-slice projection.
    Output: (id, start, end, span_text) with start/end 0-based token
    ordinals, end-exclusive.
    """
    from genome_deduplication_spark.functions.text import normalize_text

    toks = docs.select(
        id_col, F.split(normalize_text(F.col(text_col)), " ").alias("_toks")
    )
    pos = toks.select(
        id_col, F.posexplode("_toks").alias("pos", "tok_val")
    )
    missing = pos.join(
        used_tokens.select(F.col(tok_col).alias("tok_val")),
        "tok_val",
        "left_anti",
    )
    runs = condense_positions(missing, widen=1, key_col=id_col, pos_col="pos")
    return runs.join(toks, id_col).select(
        id_col,
        "start",
        "end",
        F.concat_ws(
            " ",
            F.slice(
                "_toks",
                (F.col("start") + 1).cast("int"),
                (F.col("end") - F.col("start")).cast("int"),
            ),
        ).alias("span_text"),
    )


def merge_intervals(
    spans: DataFrame,
    key_col: str = "url",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping/adjacent [start, end) intervals per key — the
    coverage-check primitive (reference check 5, check_beds.sh:51-74)."""
    # dedupe identical intervals first: tied (start, end) rows with different
    # running flags make the island cumulative sum order-dependent (ROWS
    # frames have no deterministic order among ties), and merging is
    # idempotent on duplicates anyway
    spans = spans.select(key_col, start_col, end_col).distinct()
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    run = spans.withColumn(
        "_max_end_so_far",
        F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "_new_island",
        F.when(
            F.col(start_col) <= F.col("_max_end_so_far"), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = run.withColumn(
        "_island",
        F.sum("_new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(key_col, "_island")
        .agg(F.min(start_col).alias(start_col), F.max(end_col).alias(end_col))
        .drop("_island")
    )
