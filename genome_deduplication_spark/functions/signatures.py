"""Fused signature kernel: one Arrow pass computing MinHash + SimHash.

Running MinHash and SimHash as separate pandas UDFs deserializes the (large)
shingle column twice and boxes every output value into Python ints via
tolist(); fused, the shingle batch crosses the Arrow boundary once and all
outputs stay numpy until Arrow serialization. Same arithmetic as
functions.minhash / functions.simhash (property-tested equal).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genome_deduplication_spark.config import MERSENNE31, DedupConfig

_MASK = np.uint64((1 << 64) - 1)
_M31 = np.uint64(MERSENNE31)
# rows per cache block: keep a block's flat segment (~row_len*BLOCK_ROWS*8B)
# plus three work buffers inside L2 so the 128-perm + 64-bit inner loops
# read cache, not DRAM (unblocked, the kernel is memory-bandwidth-bound and
# stops scaling past ~8 cores — measured 3.5s -> 9.1s per task at 32 workers)
_BLOCK_ELEMS = 32_768


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _mersenne_mod_inplace(x: np.ndarray, out: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """out = x mod (2**31-1) for x < 2**62 — two shift/add folds + one
    conditional subtract; ~5x cheaper than integer division and bit-exact
    equal to `%` (property-tested)."""
    np.bitwise_and(x, _M31, out=out)
    np.right_shift(x, np.uint64(31), out=tmp)
    out += tmp
    np.bitwise_and(out, _M31, out=tmp)
    out >>= np.uint64(31)
    tmp += out
    np.copyto(out, tmp)
    out[out >= _M31] -= _M31
    return out


def minhash_simhash_blocked(
    flat: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    num_perm: int,
    bits: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cache-blocked MinHash + SimHash over batch-flattened shingle sets.

    flat: uint64 shingle hashes (< 2**31-1) of all rows concatenated;
    starts/lengths: per-row offsets. Returns (sigs[n_rows, num_perm] int64,
    simhash[n_rows] int64). Identical output to the naive per-perm loop.
    """
    n_rows = len(starts)
    # int32 output: every value < 2**31-1 fits, and the signature matrix is
    # the dominant Arrow/shuffle/checkpoint payload (128 values/doc) — half
    # the bytes is half the memory traffic on a DRAM-bound kernel stage
    sigs = np.empty((n_rows, num_perm), dtype=np.int32)
    sims = np.zeros(n_rows, dtype=np.uint64)
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    r0 = 0
    prod = buf = tmp = None
    while r0 < n_rows:
        # grow the block until its flat segment exceeds _BLOCK_ELEMS
        r1 = r0
        f0 = starts[r0]
        while r1 < n_rows and (starts[r1] + lengths[r1] - f0) <= _BLOCK_ELEMS:
            r1 += 1
        if r1 == r0:  # single row larger than the block budget
            r1 = r0 + 1
        f1 = starts[r1 - 1] + lengths[r1 - 1]
        seg = flat[f0:f1]
        segstarts = (starts[r0:r1] - f0).astype(np.int64)
        if prod is None or len(prod) != len(seg):
            prod = np.empty(len(seg), dtype=np.uint64)
            buf = np.empty(len(seg), dtype=np.uint64)
            tmp = np.empty(len(seg), dtype=np.uint64)
        for j in range(num_perm):
            np.multiply(seg, au[j], out=prod)
            prod += bu[j]
            m = _mersenne_mod_inplace(prod, buf, tmp)
            sigs[r0:r1, j] = np.minimum.reduceat(m.view(np.int64), segstarts)
        # SimHash on the same (cache-hot) segment
        fu = _splitmix64(seg)
        counts = lengths[r0:r1]
        sim = np.zeros(r1 - r0, dtype=np.uint64)
        for bit in range(bits):
            ones = np.add.reduceat(
                ((fu >> np.uint64(bit)) & np.uint64(1)).astype(np.int64),
                segstarts,
            )
            sim |= (ones * 2 > counts).astype(np.uint64) << np.uint64(bit)
        sims[r0:r1] = sim
        r0 = r1
    return sigs, sims.astype(np.int64)


def make_doc_signature_udf(cfg: DedupConfig):
    """The one-pass document kernel: normalized text -> struct(n_shingles,
    minhash, simhash, anchors).

    Everything per-document happens in a single Arrow round trip:
    * O(n) polynomial rolling shingle hashes (numpy, k vectorized passes)
      — replaces the O(n*k) JVM md5 path in the hot pipeline (the md5
      family remains the cross-engine-portable path for oracle queries);
    * distinct shingle set (np.unique);
    * 128-perm MinHash + 64-bit SimHash over the distinct set;
    * anchor hashes for the exact-substring index: anchor_k-byte windows
      whose hash % m == 0 (see operators/suffix_array.anchor_candidate_pairs
      for the selectivity math).

    Differentially tested against the pure-Python twins
    (oracle.poly twins / functions.shingles.poly_shingles31_py).
    """
    from genome_deduplication_spark.functions.shingles import (
        poly_window_hashes_batched,
    )

    a_list, b_list = cfg.minhash_coefficients()
    a = np.array(a_list, dtype=np.int64)
    b = np.array(b_list, dtype=np.int64)
    p = np.int64(MERSENNE31)
    num_perm = cfg.num_perm
    bits = cfg.simhash_bits
    k = cfg.shingle_k
    anchor_k = cfg.anchor_width()
    anchor_m = cfg.anchor_modulus()

    schema = T.StructType(
        [
            T.StructField("n_shingles", T.IntegerType()),
            T.StructField("minhash", T.ArrayType(T.IntegerType())),
            T.StructField("simhash", T.LongType()),
            T.StructField("anchors", T.ArrayType(T.LongType())),
        ]
    )

    @F.pandas_udf(schema)
    def doc_signature_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in it:
            texts = series.to_numpy()
            n_rows = len(texts)
            # Chunked batch prefix rolling hash: docs are concatenated into
            # ~32KB L2-resident groups and BOTH window widths (shingle k +
            # anchor width) derive from one shared modular prefix sum per
            # group — O(n) vector passes total vs O(k_shingle + k_anchor)
            # per-doc passes, with every operand cache-resident (the
            # whole-batch flat variant was DRAM-streaming and collapsed
            # under host bandwidth contention — PLANS.md round 4). Values
            # are bit-identical to the per-doc kernel (property-tested +
            # diff-twin vs the pure-Python oracle).
            enc = [(t or "").encode("utf-8") for t in texts]
            per_doc = poly_window_hashes_batched(enc, (k, anchor_k))
            sh_rows_raw = per_doc[k]
            aw_rows_raw = per_doc[anchor_k]
            _empty = np.empty(0, dtype=np.int64)
            shingle_rows: list = []
            anchor_rows: list = []
            lengths = np.empty(n_rows, dtype=np.int64)
            for i in range(n_rows):
                sh = np.unique(sh_rows_raw[i])
                lengths[i] = len(sh)
                shingle_rows.append(sh)
                aw = aw_rows_raw[i]
                anchor_rows.append(
                    np.unique(aw[aw % anchor_m == 0]) if len(aw) else _empty
                )
            mh_out: list = [None] * n_rows
            sh_out: list = [None] * n_rows
            nonempty = np.flatnonzero(lengths > 0)
            if len(nonempty):
                flat = np.concatenate(
                    [shingle_rows[i] for i in nonempty]
                ).astype(np.uint64)
                ne_lengths = lengths[nonempty]
                starts = np.concatenate(([0], np.cumsum(ne_lengths)[:-1]))
                sigs, sim = minhash_simhash_blocked(
                    flat, starts, ne_lengths, a, b, num_perm, bits
                )
                for idx, i in enumerate(nonempty):
                    mh_out[i] = sigs[idx]
                    sh_out[i] = int(sim[idx])
            yield pd.DataFrame(
                {
                    "n_shingles": pd.Series(lengths, dtype="int32"),
                    "minhash": mh_out,
                    "simhash": pd.Series(sh_out, dtype="object"),
                    "anchors": anchor_rows,
                }
            )

    return doc_signature_udf


def make_signature_udf(cfg: DedupConfig):
    """array<long> shingles -> struct(minhash array<long>, simhash long)."""
    a_list, b_list = cfg.minhash_coefficients()
    a = np.array(a_list, dtype=np.int64)
    b = np.array(b_list, dtype=np.int64)
    p = np.int64(MERSENNE31)
    num_perm = cfg.num_perm
    bits = cfg.simhash_bits

    schema = T.StructType(
        [
            T.StructField("minhash", T.ArrayType(T.IntegerType())),
            T.StructField("simhash", T.LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def signature_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for series in it:
            vals = series.to_numpy()
            lengths = np.array(
                [0 if s is None else len(s) for s in vals], dtype=np.int64
            )
            n_rows = len(vals)
            mh_out: list = [None] * n_rows
            sh_out = np.zeros(n_rows, dtype=np.int64)
            nonempty = np.flatnonzero(lengths > 0)
            if len(nonempty):
                flat = np.concatenate([np.asarray(vals[i], dtype=np.int64)
                                       for i in nonempty]).astype(np.uint64)
                ne_lengths = lengths[nonempty]
                starts = np.concatenate(([0], np.cumsum(ne_lengths)[:-1]))
                sigs, sim = minhash_simhash_blocked(
                    flat, starts, ne_lengths, a, b, num_perm, bits
                )
                for k, i in enumerate(nonempty):
                    mh_out[i] = sigs[k]  # numpy array: no python-int boxing
                sh_out[nonempty] = sim
            yield pd.DataFrame(
                {
                    "minhash": mh_out,
                    # object dtype: None + int64 must NOT become float64
                    # (2**63-scale values silently lose low bits)
                    "simhash": pd.Series(
                        [
                            None if lengths[i] == 0 else int(sh_out[i])
                            for i in range(n_rows)
                        ],
                        dtype="object",
                    ),
                }
            )

    return signature_udf
