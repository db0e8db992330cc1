"""Similarity search over embedding columns.

Two tiers, mirroring the dedup pipeline's exact-vs-LSH split:

* :func:`cosine_topk_bruteforce` — exact top-k by cosine; the baseline and
  the oracle for the approximate path. O(Q x N) — fine for moderate query
  sets, the 100 TB path is the LSH variant.
* :func:`cosine_topk_lsh` — random-hyperplane LSH (sign-sketch) bucketing:
  vectors sharing >= 1 of `bands` sketch bands are candidates; exact cosine
  is computed only within buckets. The scale story is identical to the text
  LSH stage: uniform band keys, bucket caps, AQE skew handling.

All vector math is JVM-side (`zip_with`/`aggregate` over array<double>) —
no Python in the hot path. The hyperplane matrix is derived from the seed
with splitmix64 (deterministic, partitioning-invariant) and enters the plan
as literals — the broadcast-permutation-matrix pattern at tiny size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.select(
        "*",
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_norm"),
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, n_id, rank, sim)."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("n_id"), F.col("_v").alias("cv"), F.col("_norm").alias("cn")
    )
    scored = q.join(c, F.col("q_id") != F.col("n_id")).select(
        "q_id",
        "n_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes from splitmix64 streams."""
    m = (1 << 64) - 1
    out = np.empty((n_bits, dim), dtype=np.float64)
    state = (seed * 0x9E3779B97F4A7C15 + 12345) & m
    for i in range(n_bits):
        for j in range(dim):
            state = (state + 0x9E3779B97F4A7C15) & m
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
            z ^= z >> 31
            # map to (-1, 1) uniform; CLT of one uniform is fine for LSH signs
            out[i, j] = (z / m) * 2.0 - 1.0
    return out


# above this dim the literal expression tree (dim x n_bits F.lit nodes)
# bloats the Catalyst plan — switch to an Arrow kernel with the matrix
# closure-captured (the broadcast-permutation-matrix pattern)
_SKETCH_LITERAL_MAX_DIM = 128


def hyperplane_sketch_udf(planes: np.ndarray):
    """Pandas-UDF sign sketch for high-dim embeddings: one Arrow batch
    matmul against the closure-captured (n_bits, dim) matrix; equivalent
    to the literal-expression path up to FP summation order (matmul uses
    pairwise/SIMD reduction, the JVM path a sequential left fold — a
    projection within one ulp of zero can flip a sign bit between the
    two, so the dim<=128/dim>128 switch is NOT guaranteed bit-identical;
    property tests use well-separated vectors)."""
    weights = np.ascontiguousarray(planes.T)  # (dim, n_bits)
    powers = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))

    @F.pandas_udf("long")
    def _sketch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            vals = s.to_numpy()
            out = np.zeros(len(vals), dtype=np.int64)
            ok = np.array([v is not None for v in vals])
            if ok.any():
                mat = np.stack(
                    [np.asarray(vals[i], dtype=np.float64)
                     for i in np.flatnonzero(ok)]
                )
                bits = (mat @ weights) > 0  # (rows, n_bits)
                out[ok] = (bits.astype(np.uint64) * powers).sum(
                    axis=1
                ).astype(np.int64)
            yield pd.Series(out)

    return _sketch


def sketch_column(vec_col: Column, planes: np.ndarray) -> Column:
    """Pick the sketch implementation by dimension: JVM literal expressions
    for small dims (whole-stage codegen, no Python), Arrow matmul kernel
    when the literal tree would explode the plan (dim > 128 at real
    embedding widths 768-4096)."""
    if planes.shape[1] <= _SKETCH_LITERAL_MAX_DIM:
        return hyperplane_sketch(vec_col, planes)
    return hyperplane_sketch_udf(planes)(vec_col)


def hyperplane_sketch(
    vec_col: Column, planes: np.ndarray
) -> Column:
    """n_bits sign bits packed into a long (n_bits <= 63)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(w)) for w in planes[i]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(planes.shape[0])
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 123,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Approximate cosine top-k via sign-sketch band buckets.

    Recall is tunable with (n_bits, bands): more bands -> higher recall,
    more candidates. Returns the same schema as the brute-force baseline.
    """
    planes = _hyperplanes(dim, n_bits, seed)
    rows = n_bits // bands

    def sketch_bands(df: DataFrame, side: str) -> DataFrame:
        nm = with_norm(df, vec_col)
        sk = nm.withColumn("_sketch", sketch_column(F.col("_v"), planes))
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftrightunsigned(F.col("_sketch"), b * rows)
                    .bitwiseAND(F.lit((1 << rows) - 1))
                    .alias("band_val"),
                )
                for b in range(bands)
            ]
        )
        return sk.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col("_v").alias(f"{side}v"),
            F.col("_norm").alias(f"{side}n"),
            F.explode(band_arr).alias("band"),
        ).select(
            f"{side}_id", f"{side}v", f"{side}n",
            F.col("band.band_id").alias("band_id"),
            F.col("band.band_val").alias("band_val"),
        )

    qb = sketch_bands(queries, "q")
    cb = sketch_bands(corpus, "c")
    # bucket cap on the corpus side bounds candidate fan-out per band bucket
    w_cap = Window.partitionBy("band_id", "band_val").orderBy("c_id")
    cb = cb.withColumn("_r", F.row_number().over(w_cap)).where(
        F.col("_r") <= max_bucket_size
    )
    cand = (
        qb.join(cb, ["band_id", "band_val"])
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "qv", "qn", F.col("c_id").alias("n_id"), "cv",
                F.col("cn").alias("cn"))
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = cand.select(
        "q_id",
        "n_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    sim_threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup variant): LSH candidates
    filtered to sim >= threshold, emitted as (id_a < id_b) edges compatible
    with the connected-components clusterer."""
    topk = cosine_topk_lsh(vectors, vectors, k=50, id_col=id_col,
                           vec_col=vec_col, **lsh_kwargs)
    return (
        topk.where(F.col("sim") >= sim_threshold)
        .select(
            F.least("q_id", "n_id").alias("id_a"),
            F.greatest("q_id", "n_id").alias("id_b"),
        )
        .distinct()
    )
