"""Dataset-build tail: seeded shuffle, train/dev split, size-matched sampling.

Reference semantics (SURVEY.md §2.5):
  R1 seeded permutation shuffle        (code/shuffle.py:18-25)
  R2 train/dev split, dev = pct capped (code/partition_samples.sh:16-35)
  R3 control-line sampling w/o replacement
                                       (code/get_samples_based_on_dedup.py:27-41)

All randomness is *key-derived* (hash of seed + stable id), never F.rand():
the reference seeds its RNG explicitly for reproducibility
(code/dedup2.py:585); in Spark the analogous guarantee must also hold across
repartitioning, which plain rand() does not provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U_DENOM = 1_000_000_007


def keyed_uniform(seed: int, *cols) -> F.Column:
    """Deterministic uniform [0,1) derived from (seed, key columns)."""
    return (
        F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(_U_DENOM)) / F.lit(float(_U_DENOM))
    )


def seeded_shuffle(df: DataFrame, seed: int, *key_cols: str) -> DataFrame:
    """Deterministic permutation: order by keyed hash (R1)."""
    return df.orderBy(keyed_uniform(seed, *[F.col(c) for c in key_cols]), *key_cols)


def train_dev_split(
    df: DataFrame,
    dev_pct: float,
    max_dev: int,
    seed: int,
    key_col: str = "url",
) -> DataFrame:
    """Tag each row 'dev' or 'train'; dev = dev_pct of rows capped at max_dev,
    chosen by seeded shuffle order (R2: head -n dev / tail train)."""
    w = Window.orderBy(keyed_uniform(seed, F.col(key_col)), F.col(key_col))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    n = df.count()
    n_dev = min(int(n * dev_pct), max_dev)
    return ranked.withColumn(
        "split", F.when(F.col("_rk") <= n_dev, F.lit("dev")).otherwise(F.lit("train"))
    ).drop("_rk")


def sample_exact_n(df: DataFrame, n: int, seed: int, key_col: str = "url") -> DataFrame:
    """Sample-without-replacement of exactly n rows (R3): seeded shuffle +
    limit. (Global window ordering is acceptable because n is small in the
    control-corpus use case; for huge n use df.sample + exact top-up.)"""
    return (
        df.orderBy(keyed_uniform(seed, F.col(key_col)), F.col(key_col)).limit(n)
    )
