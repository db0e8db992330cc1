from __future__ import annotations

import math
import random

from genome_deduplication_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)


def _make_vectors(spark, n=120, dim=16, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
    # plant near-duplicate vectors: 110..119 are tiny perturbations of 0..9
    for i in range(10):
        base = rows[i][1]
        rows[110 + i] = (
            110 + i,
            [x + rng.gauss(0, 0.01) for x in base],
        )
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"), rows


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_bruteforce_topk_matches_python(spark):
    df, rows = _make_vectors(spark)
    out = cosine_topk_bruteforce(df.where("vec_id < 5"), df, k=3)
    got = {(r["q_id"], r["rank"]): r["n_id"] for r in out.collect()}
    vecs = dict(rows)
    for q in range(5):
        sims = sorted(
            ((-_cosine(vecs[q], vecs[c]), c) for c in vecs if c != q)
        )[:3]
        for rank, (negs, c) in enumerate(sims, start=1):
            assert got[(q, rank)] == c, (q, rank)


def test_lsh_topk_finds_planted_neighbors(spark):
    df, rows = _make_vectors(spark)
    out = cosine_topk_lsh(
        df.where("vec_id < 10"), df, k=1, dim=16, n_bits=16, bands=8, seed=7
    )
    got = {r["q_id"]: r["n_id"] for r in out.where("rank = 1").collect()}
    hits = sum(1 for q in range(10) if got.get(q) == 110 + q)
    assert hits >= 9, got  # near-identical vectors share almost all bands


def test_embedding_near_dup_pairs(spark):
    df, rows = _make_vectors(spark)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, sim_threshold=0.99, dim=16, n_bits=16, bands=8, seed=7
        ).collect()
    }
    planted = {(i, 110 + i) for i in range(10)}
    assert planted <= pairs
    # random gaussian pairs at dim 16 essentially never hit cos >= 0.99
    extras = pairs - planted
    assert len(extras) <= 2, extras


def test_highdim_sketch_udf_path(spark):
    """dim=768 takes the Arrow-kernel sketch (no plan blowup) and still
    retrieves planted near-dup pairs end-to-end."""
    import numpy as np

    from genome_deduplication_spark.operators.similarity import (
        _SKETCH_LITERAL_MAX_DIM,
        _hyperplanes,
        hyperplane_sketch_udf,
    )

    dim = 768
    assert dim > _SKETCH_LITERAL_MAX_DIM
    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, dim))
    rows = [(i, base[i].tolist()) for i in range(30)]
    # 100..104 = tiny perturbations of 0..4
    for i in range(5):
        rows.append((100 + i, (base[i] + rng.normal(0, 0.01, dim)).tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, sim_threshold=0.9, dim=dim, n_bits=16, bands=8, seed=11
        ).collect()
    }
    assert pairs == {(i, 100 + i) for i in range(5)}
    # UDF sketch matches its numpy definition exactly
    planes = _hyperplanes(dim, 16, 11)
    out = df.select(
        "vec_id", hyperplane_sketch_udf(planes)("embedding").alias("s")
    ).collect()
    for r in out:
        v = np.asarray(rows[[i for i, (vid, _) in enumerate(rows) if vid == r["vec_id"]][0]][1])
        bits = (planes @ v) > 0
        want = int((bits.astype(np.uint64) << np.arange(16, dtype=np.uint64)).sum())
        assert r["s"] == want
