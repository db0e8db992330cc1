"""Within-document span operators — the masks/ignored/ambiguous table side
of the reference's output model (4 BED files per input,
code/dedup2.py:280-310).

The web-text output model (SURVEY.md §1.5) is a `spans` table
(url, start, end, kind) with kind in {self_repeat, masked, ambiguous}:

* `self_repeat_spans` — maximal repeated blocks *within* one document, the
  internal-repeat case the reference's v2 specifically distinguishes from
  global repeats (sample-local k-mer positions, code/dedup2.py:105,143,183).
  Found per-doc with the suffix-array/LCP kernel inside applyInPandas.
* `coverage_gaps` — the check-5 analogue (spans must tile [0, len),
  check_beds.sh:51-74): given a spans table, report the uncovered gaps per
  doc (empty result == full coverage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genome_deduplication_spark.operators.condense import merge_intervals
from genome_deduplication_spark.operators.suffix_array import lcp_array, suffix_array


def self_repeat_spans_py(text: str, min_len: int) -> list[tuple[int, int]]:
    """Char spans [start, end) of blocks of length >= min_len that occur at
    least twice in `text` (byte offsets; both occurrences reported).
    Sequential kernel — runs inside the grouped-map UDF."""
    if not text:
        return []
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    n = len(data)
    if n < min_len * 2:
        return []
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    spans: list[tuple[int, int]] = []
    for i in range(1, n):
        l = int(lcp[i])
        if l >= min_len:
            for start in (int(sa[i]), int(sa[i - 1])):
                spans.append((start, start + l))
    if not spans:
        return []
    # merge overlapping spans
    spans.sort()
    merged = [spans[0]]
    for s, e in spans[1:]:
        if s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def self_repeat_spans(
    docs: DataFrame,
    min_len: int,
    id_col: str = "url",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """(url, start, end) spans of internal repeats >= min_len chars."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
        ]
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out_id, out_s, out_e = [], [], []
        for u, t in zip(pdf[id_col], pdf[text_col]):
            for s, e in self_repeat_spans_py(t or "", min_len):
                out_id.append(u)
                out_s.append(s)
                out_e.append(e)
        return pd.DataFrame({id_col: out_id, "start": out_s, "end": out_e})

    bucketed = docs.select(id_col, text_col).withColumn(
        "_g", F.pmod(F.xxhash64(id_col), F.lit(n_buckets))
    )
    return bucketed.groupBy("_g").applyInPandas(_kernel, schema)


def coverage_gaps(
    spans: DataFrame,
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Uncovered [start, end) gaps per doc given a spans table — empty
    result means the spans tile every document (check-5 analogue)."""
    merged = merge_intervals(spans, key_col=id_col)
    lens = docs.select(id_col, F.length(text_col).alias("_len"))
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("start")
    with_prev = merged.withColumn(
        "_prev_end", F.lag("end").over(w)
    ).withColumn("_gap_start", F.coalesce(F.col("_prev_end"), F.lit(0)))
    inner_gaps = with_prev.where(F.col("start") > F.col("_gap_start")).select(
        id_col,
        F.col("_gap_start").alias("start"),
        F.col("start").alias("end"),
    )
    last = merged.groupBy(id_col).agg(F.max("end").alias("_max_end"))
    tail_gaps = (
        lens.join(last, id_col, "left")
        .withColumn("_max_end", F.coalesce("_max_end", F.lit(0)))
        .where(F.col("_max_end") < F.col("_len"))
        .select(id_col, F.col("_max_end").alias("start"), F.col("_len").alias("end"))
    )
    return inner_gaps.unionByName(tail_gaps)
