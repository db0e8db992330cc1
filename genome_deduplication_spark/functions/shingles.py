"""Shingle extraction — the reimplementation of the reference k-mer inner
loop (all overlapping k-substrings, code/dedup2.py:135-139).

Three interchangeable kernels:

* :func:`char_shingles31` — JVM-side Column expression (portable md5-derived
  hashes mod 2**31-1). O(n*k) but fully inside whole-stage codegen and
  reproducible by the DuckDB oracle + pure-Python oracle. Default.
* :func:`char_shingles64` — JVM-side xxhash64 variant (scale path when no
  external oracle must reproduce values; 64-bit space).
* :func:`char_shingles31_pandas` — Arrow-batched numpy rolling polynomial
  hash, O(n) per document: the kernel for very long documents where O(n*k)
  substring hashing dominates. Uses its own deterministic polynomial family
  (mirrored by the Python oracle) — do not mix families within one run.

All kernels emit the *distinct* shingle set (set semantics, matching the
reference's set membership model, code/dedup2.py:142).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genome_deduplication_spark.config import MERSENNE31

_M61 = (1 << 61) - 1
_POLY_BASE = 1315423911  # deterministic polynomial base for the numpy kernel


def _positions(col: Column, k: int) -> Column:
    # 1-based start positions of every k-window; empty when len(text) < k.
    # NB: F.sequence(1, 0) yields a DESCENDING [1, 0] in Spark, so the
    # short-text case must be handled explicitly, not via greatest().
    return F.when(
        F.length(col) >= k, F.sequence(F.lit(1), F.length(col) - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))


def char_shingles31(col: Column, k: int) -> Column:
    """array<long> of distinct md5-derived shingle hashes mod 2**31-1."""
    sh = F.transform(
        _positions(col, k),
        lambda i: F.conv(F.substring(F.md5(F.substring(col, i, k)), 1, 15), 16, 10)
        .cast("long")
        % F.lit(MERSENNE31),
    )
    return F.array_distinct(sh)


def char_shingles64(col: Column, k: int) -> Column:
    """array<long> of distinct xxhash64 shingle hashes (scale path)."""
    sh = F.transform(_positions(col, k), lambda i: F.xxhash64(F.substring(col, i, k)))
    return F.array_distinct(sh)


def word_shingles(col: Column, n: int) -> Column:
    """array<string> of distinct n-word shingles of normalized text."""
    words = F.split(col, " ")
    sh = F.transform(
        F.when(
            F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - F.lit(n))
        ).otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_distinct(sh)


def make_char_shingles31_pandas(k: int):
    """Arrow-batched O(n) rolling-hash shingle kernel.

    Polynomial rolling hash over UTF-8 bytes in the 2**61-1 Mersenne field,
    reduced to 2**31-1 at the end. Matches
    :func:`genome_deduplication_spark.oracle.poly_shingles_py`.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingles_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            out = []
            for s in series:
                if s is None:
                    out.append([])
                    continue
                data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                out.append(np.unique(poly_window_hashes_np(data, k)))
            yield pd.Series(out)

    return shingles_udf


def poly_window_hashes_np(data: np.ndarray, k: int) -> np.ndarray:
    """All k-byte window hashes of a uint8 array, polynomial family mod
    2**31-1. Vectorized: k passes of O(n) numpy ops.

    The modulus is 2**31-1 (not 2**61-1) so every intermediate
    byte*power product stays below 2**39 — far inside uint64, no silent
    wraparound. The final hash space is 31-bit regardless (MinHash domain).

    NOTE: windows are over UTF-8 BYTES (not characters) — consistent
    between this kernel and :func:`poly_shingles31_py`; fine for hashing
    (byte windows are as discriminative as char windows)."""
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.int64)
    vals = data.astype(np.uint64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    m31 = np.uint64(MERSENNE31)
    power = np.uint64(1)
    base = _POLY_BASE % MERSENNE31
    for i in range(k - 1, -1, -1):
        acc = (acc + vals[i : i + n - k + 1] * power) % m31
        power = np.uint64((int(power) * base) % MERSENNE31)
    return acc.astype(np.int64)


def poly_shingles31_py(text: str, k: int) -> set[int]:
    """Pure-Python twin of :func:`poly_window_hashes_np` (distinct set) —
    the oracle-side shingle family for the pipeline's differential tests."""
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        return set()
    base = _POLY_BASE % MERSENNE31
    out = set()
    # Horner per window (O(n*k) python — oracle-scale only)
    for i in range(n - k + 1):
        h = 0
        for b in data[i : i + k]:
            h = (h * base + b) % MERSENNE31
        out.add(h)
    return out


__all__ = [
    "char_shingles31",
    "char_shingles64",
    "word_shingles",
    "make_char_shingles31_pandas",
    "poly_window_hashes_np",
    "poly_shingles31_py",
]
