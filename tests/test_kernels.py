"""Unit tests for the signature kernels vs. their pure-Python twins."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from genome_deduplication_spark.config import DedupConfig, lsh_threshold_curve
from genome_deduplication_spark.functions.minhash import (
    make_minhash_udf,
    minhash_py,
)
from genome_deduplication_spark.functions.shingles import char_shingles31
from genome_deduplication_spark.functions.simhash import make_simhash_udf, simhash_py
from genome_deduplication_spark.oracle import normalize_py, shingles31_py

CFG = DedupConfig()


def test_shingles_spark_matches_python(spark):
    texts = ["hello world this is a test", "aaaaaaaaaaaa", "short", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(char_shingles31(F.col("text"), CFG.shingle_k).alias("s")).collect()
    for t, r in zip(texts, rows):
        assert set(r["s"]) == shingles31_py(t, CFG.shingle_k), t


def test_minhash_spark_matches_python(spark):
    rng = random.Random(7)
    sets = [sorted(rng.sample(range(1, 2**31 - 1), rng.randint(5, 200))) for _ in range(10)]
    sets.append([])  # empty -> null signature
    df = spark.createDataFrame([(s,) for s in sets], "shingles array<bigint>")
    udf = make_minhash_udf(CFG)
    rows = df.select(udf("shingles").alias("sig")).collect()
    for s, r in zip(sets, rows):
        if not s:
            assert r["sig"] is None
        else:
            assert r["sig"] == minhash_py(s, CFG)


def test_minhash_estimates_jaccard(spark):
    rng = random.Random(11)
    base = set(rng.sample(range(1, 2**31 - 1), 1000))
    # build a set with true jaccard ~0.8: |A∩B|/|A∪B| = 0.8
    keep = set(list(base)[:900])
    extra = set(rng.sample(range(1, 2**31 - 1), 125))
    other = keep | extra
    true_j = len(base & other) / len(base | other)
    sig_a = minhash_py(sorted(base), CFG)
    sig_b = minhash_py(sorted(other), CFG)
    est = sum(x == y for x, y in zip(sig_a, sig_b)) / CFG.num_perm
    assert abs(est - true_j) < 0.12  # ~3 sigma at 128 perms


def test_simhash_spark_matches_python(spark):
    rng = random.Random(13)
    sets = [sorted(rng.sample(range(1, 2**31 - 1), rng.randint(5, 100))) for _ in range(8)]
    df = spark.createDataFrame([(s,) for s in sets], "shingles array<bigint>")
    udf = make_simhash_udf(64)
    rows = df.select(udf("shingles").alias("sig")).collect()
    for s, r in zip(sets, rows):
        assert r["sig"] == simhash_py(s, 64)


def test_fused_signature_udf_matches_separate_kernels(spark):
    import random as _r

    from pyspark.sql import functions as F2

    from genome_deduplication_spark.functions.signatures import make_signature_udf

    rng = _r.Random(21)
    sets = [sorted(rng.sample(range(1, 2**31 - 1), rng.randint(5, 300))) for _ in range(12)]
    sets.append([])
    df = spark.createDataFrame([(s,) for s in sets], "shingles array<bigint>")
    fused = make_signature_udf(CFG)
    rows = df.select(fused("shingles").alias("sig")).select(
        F2.col("sig.minhash").alias("mh"), F2.col("sig.simhash").alias("sh")
    ).collect()
    for s, r in zip(sets, rows):
        if not s:
            assert r["mh"] is None and r["sh"] is None
        else:
            assert r["mh"] == minhash_py(s, CFG)
            assert r["sh"] == simhash_py(s, 64)


def test_doc_signature_udf_matches_python_twins(spark):
    """The one-pass text kernel == pure-Python poly twins (shingles,
    MinHash, SimHash, anchors)."""
    import random as _r

    from pyspark.sql import functions as F2

    from genome_deduplication_spark.functions.shingles import poly_shingles31_py
    from genome_deduplication_spark.functions.signatures import (
        make_doc_signature_udf,
    )

    rng = _r.Random(5)
    words = "alpha beta gamma delta epsilon zeta".split()
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 120)))
        for _ in range(10)
    ]
    texts += ["", "tiny", "x" * 200]  # empty / sub-k / min_len-scale
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    udf = make_doc_signature_udf(CFG)
    rows = df.select("text", udf("text").alias("sig")).select(
        "text",
        F2.col("sig.n_shingles").alias("n"),
        F2.col("sig.minhash").alias("mh"),
        F2.col("sig.simhash").alias("sh"),
        F2.col("sig.anchors").alias("an"),
    ).collect()
    anchor_k = CFG.anchor_width()
    anchor_m = CFG.anchor_modulus()
    for r in rows:
        t = r["text"]
        want_sh = poly_shingles31_py(t, CFG.shingle_k)
        assert r["n"] == len(want_sh), t[:30]
        if not want_sh:
            assert r["mh"] is None and r["sh"] is None
        else:
            s = sorted(want_sh)
            assert r["mh"] == minhash_py(s, CFG)
            assert r["sh"] == simhash_py(s, 64)
        want_anchors = {
            h for h in poly_shingles31_py(t, anchor_k) if h % anchor_m == 0
        }
        assert set(r["an"]) == want_anchors


def test_mersenne_mod_equals_modulo():
    """The fast-fold reduction must be bit-exact vs `%` over the full
    (a*h+b) input range, including edge values."""
    import numpy as np

    from genome_deduplication_spark.config import MERSENNE31 as P
    from genome_deduplication_spark.functions.signatures import (
        _mersenne_mod_inplace,
    )

    rng = random.Random(31)
    edge = [0, 1, P - 1, P, P + 1, 2 * P, (1 << 62) - 1, (1 << 61), 1 << 31]
    rand = [rng.randrange(0, 1 << 62) for _ in range(10000)]
    x = np.array(edge + rand, dtype=np.uint64)
    out = np.empty_like(x)
    tmp = np.empty_like(x)
    got = _mersenne_mod_inplace(x.copy(), out, tmp)
    want = x % np.uint64(P)
    assert (got == want).all()


def test_blocked_kernel_matches_python_across_block_boundaries():
    """Rows straddling cache-block boundaries must produce identical
    signatures (block size is an implementation detail)."""
    import numpy as np

    from genome_deduplication_spark.functions import signatures as S
    from genome_deduplication_spark.functions.minhash import minhash_py
    from genome_deduplication_spark.functions.simhash import simhash_py

    rng = random.Random(17)
    a_list, b_list = CFG.minhash_coefficients()
    a = np.array(a_list, dtype=np.int64)
    b = np.array(b_list, dtype=np.int64)
    # mix of tiny rows and one row larger than the block budget
    rows = [sorted(rng.sample(range(1, 2**31 - 1), n))
            for n in (3, 500, S._BLOCK_ELEMS + 1000, 7, 2000)]
    lengths = np.array([len(r) for r in rows])
    flat = np.concatenate([np.array(r, dtype=np.uint64) for r in rows])
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    sigs, sims = S.minhash_simhash_blocked(flat, starts, lengths, a, b,
                                           CFG.num_perm, 64)
    for i, r in enumerate(rows):
        assert sigs[i].tolist() == minhash_py(r, CFG), i
        assert int(sims[i]) == simhash_py(r, 64), i


def test_batched_shingle_kernel_matches_per_doc_multi_group():
    """ADVICE r4: differential guard for the chunked batch kernel's
    multi-group slicing path — docs totalling several group_bytes,
    including one doc larger than a group, empty docs, and sub-k docs,
    must be bit-identical to the per-doc kernel."""
    import numpy as np

    from genome_deduplication_spark.functions.shingles import (
        poly_window_hashes_batched,
        poly_window_hashes_np,
    )

    rng = random.Random(41)
    group = 4096  # small group so a handful of docs spans many groups
    sizes = [0, 3, 8, 700, group + 517, 1200, 0, 9, 2500, 3 * group + 11, 64]
    docs = [bytes(rng.randrange(256) for _ in range(n)) for n in sizes]
    widths = (9, 48)
    got = poly_window_hashes_batched(docs, widths, group_bytes=group)
    for k in widths:
        assert len(got[k]) == len(docs)
        for d, enc in enumerate(docs):
            want = poly_window_hashes_np(np.frombuffer(enc, dtype=np.uint8), k)
            assert np.array_equal(got[k][d], want), (k, d)


def test_batched_shingle_kernel_duplicate_widths():
    """ADVICE r4 (medium): widths=(k, k) is legal (anchor_width can equal
    shingle_k) — the batch kernel must not double-append rows."""
    import numpy as np

    from genome_deduplication_spark.functions.shingles import (
        poly_window_hashes_batched,
        poly_window_hashes_np,
    )

    rng = random.Random(43)
    docs = [bytes(rng.randrange(256) for _ in range(n))
            for n in (100, 0, 57, 9, 300)]
    got = poly_window_hashes_batched(docs, (9, 9), group_bytes=256)
    assert len(got[9]) == len(docs)  # was 2x before the dedupe fix
    for d, enc in enumerate(docs):
        want = poly_window_hashes_np(np.frombuffer(enc, dtype=np.uint8), 9)
        assert np.array_equal(got[9][d], want), d


def test_lsh_threshold_curve_sane():
    cfg = DedupConfig()
    # at j = threshold the curve should be steep and high
    assert lsh_threshold_curve(cfg, 0.8) > 0.999
    assert lsh_threshold_curve(cfg, 0.3) < 0.25


def test_normalize_twins(spark):
    from genome_deduplication_spark.functions.text import normalize_text

    texts = ["  A  B\t\nC  ", "Hello   WORLD", "", "x"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(normalize_text(F.col("text")).alias("n")).collect()
    for t, r in zip(texts, rows):
        assert r["n"] == normalize_py(t)
