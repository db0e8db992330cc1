"""Benchmark decontamination: flag training docs that overlap a test set.

The standard LLM training-data hygiene pass (GPT-3 appendix C / Gopher /
FineWeb all ship a variant): a training document is contaminated when it
shares at least one word n-gram (n=13 is the GPT-3 convention) with any
document in a benchmark/test collection. The reference's analogous
primitive is membership of a k-mer in the previously-seen set
(code/dedup2.py:418-443); here the "seen set" is the benchmark's n-gram
universe and the verdict is per-document.

Plan shape (100 TB story): benchmark collections are tiny relative to the
corpus (thousands of docs vs billions), so the benchmark n-gram set is
the textbook broadcast side — distinct 64-bit hashes, broadcast to every
executor; the corpus side streams its windows through one codegen stage
(split -> transform -> xxhash64, shared kernel
`boilerplate.word_window_hashes`) into a broadcast-hash join + partial
count. No shuffle touches corpus text; the only wide exchange is the
per-doc count aggregate on (id) — fixed-width rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .boilerplate import _tokenized, word_window_hashes

__all__ = ["flag_contaminated"]


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per doc in ``docs``: (id, is_benchmark, n_shared_ngrams,
    contaminated).

    ``benchmark`` rows may themselves appear in ``docs`` (the usual case
    when decontaminating an already-ingested corpus): they are marked
    is_benchmark=true and reported clean (their trivial self-overlap is
    not contamination). n_shared_ngrams counts window POSITIONS in the
    doc whose n-gram occurs anywhere in the benchmark, so a repeated
    leaked phrase counts once per occurrence.
    """
    bench_ids = benchmark.select(F.col(id_col).alias("_dc_bid")).distinct()
    bench_grams = (
        _tokenized(benchmark, id_col, text_col)
        .select(F.explode(word_window_hashes("_bp_toks", n)).alias("gram"))
        .distinct()
    )
    wins = _tokenized(docs, id_col, text_col).select(
        id_col, F.explode(word_window_hashes("_bp_toks", n)).alias("gram")
    )
    hits = (
        wins.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("_dc_hits"))
    )
    out = (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .join(
            bench_ids.withColumn("_dc_isb", F.lit(True)),
            F.col(id_col) == F.col("_dc_bid"),
            "left",
        )
    )
    is_bench = F.coalesce(F.col("_dc_isb"), F.lit(False))
    shared = F.when(is_bench, F.lit(0)).otherwise(
        F.coalesce(F.col("_dc_hits"), F.lit(0))
    )
    return out.select(
        id_col,
        is_bench.alias("is_benchmark"),
        shared.alias("n_shared_ngrams"),
        (shared > 0).alias("contaminated"),
    )
