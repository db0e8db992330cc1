"""Cross-document boilerplate phrase removal.

The training-data cleaning tier between exact dedup (whole-doc) and
near-dup clustering (whole-doc): word n-grams that recur across >= min_df
DISTINCT documents are "boilerplate phrases" (nav bars, license footers,
share buttons in real web text); every token covered by at least one such
phrase occurrence is removed, and the document is re-emitted cleaned.
This is the CCNet / C4 / RefinedWeb-style repeated-segment filter,
re-expressed declaratively; the reference's analogous move is masking
regions whose k-mers were seen before (code/dedup2.py:206-246) — there
within one sequence, here across the corpus.

Plan shape (scale notes for the 100 TB case):
- phrases are 64-bit hashes (`xxhash64`), never strings, so the
  document-frequency aggregate shuffles fixed-width rows; the n-gram
  windows themselves are built JVM-side inside whole-stage codegen
  (split -> transform(sequence) -> slice -> concat_ws -> xxhash64),
  no Python and no explode until the window rows are needed;
- coverage is computed from boiler window START positions only
  (collect_list per doc, at most one int per token), then token removal
  is a pure array expression (`filter` with the positional lambda +
  `exists` over starts) — the cleaned text never round-trips through an
  exploded (doc, token) shuffle;
- the df >= min_df filter runs on the aggregate BEFORE any join back, so
  the join's build side is only the boilerplate subset. With a df cap
  (`max_df`) the pathological all-docs phrase (e.g. an empty-string
  artifact) can be excluded; by default everything >= min_df counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

__all__ = [
    "boilerplate_phrases",
    "remove_boilerplate_phrases",
    "word_window_hashes",
]


def word_window_hashes(toks_col: str, n: int) -> Column:
    """Array of xxhash64(n-gram phrase) over the named array<string>
    column, one per window start (1-based start s covers tokens
    s..s+n-1). Empty array when the doc is shorter than n tokens —
    F.sequence(1, 0) DESCENDS in Spark, so the short case must be
    guarded, not relied on to be empty."""
    return F.when(
        F.size(F.col(toks_col)) >= n,
        F.expr(
            f"transform(sequence(1, size({toks_col}) - {n} + 1), "
            f"s -> xxhash64(concat_ws(' ', slice({toks_col}, s, {n}))))"
        ),
    ).otherwise(F.expr("cast(array() as array<bigint>)"))


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        id_col, F.split(normalize_text(F.col(text_col)), " ").alias("_bp_toks")
    )


def boilerplate_phrases(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """(phrase_hash BIGINT, df INT): word n-grams occurring in >= min_df
    distinct documents, by document frequency."""
    base = _tokenized(docs, id_col, text_col)
    wins = base.select(
        id_col, F.explode(word_window_hashes("_bp_toks", n)).alias("phrase_hash")
    )
    return (
        wins.groupBy("phrase_hash")
        .agg(F.countDistinct(id_col).cast("int").alias("df"))
        .where(F.col("df") >= min_df)
    )


def remove_boilerplate_phrases(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
    persist: bool = True,
) -> DataFrame:
    """Per input document: (id, n_tokens, n_boiler_tokens, cleaned_text).

    cleaned_text is the NORMALIZED text (lowercased, whitespace-collapsed
    — the same normalization every other text operator applies) with all
    tokens covered by any boilerplate window removed; '' when the whole
    document is boilerplate. Window coverage is a union: overlapping
    boiler windows do not double-count tokens.
    """
    base = _tokenized(docs, id_col, text_col)
    wins = base.select(
        id_col,
        F.posexplode(word_window_hashes("_bp_toks", n)).alias("_s0", "phrase_hash"),
    ).select(id_col, (F.col("_s0") + 1).alias("start"), "phrase_hash")
    if persist:
        # wins feeds BOTH the df aggregate and the starts join; without
        # materialization the scan+split+window+xxhash stage runs twice
        # (observed: 3 parquet scans in the unpersisted plan). Eager — a
        # lazy localCheckpoint mark is not persisted under AQE (PLANS.md
        # round 4). Fixed-width rows (id, int, bigint), cheap to hold.
        wins = wins.localCheckpoint(eager=True)

    boiler = (
        wins.groupBy("phrase_hash")
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") >= min_df)
        .select("phrase_hash")
    )
    # starts of boiler windows, one compact array per doc
    starts = (
        wins.join(boiler, "phrase_hash")
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("_bp_starts"))
    )

    joined = base.join(starts, id_col, "left")
    # token at 1-based position p is covered iff some boiler window start
    # s satisfies s <= p < s + n; positional filter lambda gives 0-based i
    covered = (
        "exists(_bp_starts, s -> s <= i + 1 AND i + 1 < s + {n})".format(n=n)
    )
    cleaned = F.expr(
        "CASE WHEN _bp_starts IS NULL THEN _bp_toks "
        f"ELSE filter(_bp_toks, (t, i) -> NOT {covered}) END"
    )
    return joined.select(
        id_col,
        F.size("_bp_toks").alias("n_tokens"),
        (F.size("_bp_toks") - F.size(cleaned)).alias("n_boiler_tokens"),
        F.array_join(cleaned, " ").alias("cleaned_text"),
    )
