"""Corpus mixing: per-source epoch weights with deterministic repeats.

The training-data composition step (The Pile's per-set epochs, DoReMi's
domain weights): each document is replicated according to its source's
target weight w — floor(w) guaranteed copies plus one more iff a
key-derived uniform falls below frac(w). All randomness is key-derived
(house rule, operators/split.py): the mix is reproducible and
partitioning-invariant, and per-source realized mass concentrates tightly
around w * |source|. Reference analogue: the stochastic retain decision
per flagged duplicate (code/dedup2.py:283-«retain probability»), lifted
from drop/keep to a replication count.

Scale shape: one row-local Project (weight lookup via broadcast dim or
literal CASE, copy count arithmetic) + ``explode(sequence(...))`` —
output rows stream straight out of the generator, no shuffle at all.
Downstream training-shard writers shuffle the mixed stream; the mix
itself moves nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .split import keyed_uniform

__all__ = ["mix_corpus"]


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    seed: int,
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 1.0,
    order_col: Column | None = None,
) -> DataFrame:
    """Replicate each doc per its source weight; adds ``copy_id`` (0-based).

    ``n_copies = floor(w) + (u < w - floor(w))`` with u = ``order_col``
    (must be uniform in [0,1); default keyed_uniform(seed, key)). Weight
    0.25 keeps a deterministic quarter of the source; weight 2.5 emits
    2 copies of every doc and a third for half of them. Docs with an
    unknown source take ``default_weight``.

    ``F.sequence(0, n-1)`` DESCENDS for n == 0 (Spark gotcha), so the
    n == 0 case is guarded to an empty array, dropping the doc.
    """
    u = order_col if order_col is not None else keyed_uniform(seed, F.col(key_col))
    w: Column = F.lit(float(default_weight))
    for src, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(w)
    base = F.floor(w).cast("int")
    n = (base + (u < (w - base)).cast("int")).alias("_n")
    copies = F.when(
        F.col("_n") >= 1, F.sequence(F.lit(0), F.col("_n") - 1)
    ).otherwise(F.expr("cast(array() as array<int>)"))
    return (
        docs.withColumn("_n", n)
        .select(*docs.columns, F.explode(copies).alias("copy_id"))
    )
