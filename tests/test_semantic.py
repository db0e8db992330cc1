"""SemDeDup-style semantic dedup: k-means cells + within-cell cosine prune.

Fixture: planted tight blobs (anchor + members at cos ~0.9999) over a
random unit-vector background whose mutual cosines stay far below eps —
the geometric regime the operator contracts for (module docstring). The
truth graph is then blob cliques, independent of k-means internals, so
the tests assert exact output."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genome_deduplication_spark.operators.semantic import (
    assign_cells,
    kmeans_fit,
    semantic_dedup,
)

DIM = 32
N_BG = 40
N_ANCHORS = 4
N_MEMBERS = 5
MEMBER_BASE = 1000
EPS = 0.9


def _planted_corpus() -> list[tuple[int, list[float]]]:
    rng = np.random.default_rng(7)
    bg = rng.normal(size=(N_BG, DIM))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    # precondition of the fixture: background pairs far below eps
    sims = bg @ bg.T
    np.fill_diagonal(sims, 0.0)
    assert sims.max() < 0.8, "fixture seed no longer separates background"
    rows = [(i, bg[i].tolist()) for i in range(N_BG)]
    for a in range(N_ANCHORS):
        for j in range(N_MEMBERS):
            noise = rng.normal(size=DIM) * 0.005
            v = bg[a] + noise
            rows.append((MEMBER_BASE + a * N_MEMBERS + j, v.tolist()))
    return rows


def _truth() -> dict[int, int]:
    rep = {i: i for i in range(N_BG)}
    for a in range(N_ANCHORS):
        for j in range(N_MEMBERS):
            rep[MEMBER_BASE + a * N_MEMBERS + j] = a
    return rep


SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
    ]
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_planted_corpus(), SCHEMA).localCheckpoint(
        eager=True
    )


def test_semantic_dedup_matches_planted_truth(corpus):
    out = semantic_dedup(corpus, k=N_ANCHORS, eps=EPS, n_iter=3).collect()
    got = {r["vec_id"]: (r["rep_id"], r["kept"]) for r in out}
    truth = _truth()
    assert len(got) == len(truth)
    for vid, rep in truth.items():
        assert got[vid] == (rep, rep == vid), f"vec {vid}"


def test_semantic_dedup_partitioning_invariance(corpus):
    a = semantic_dedup(
        corpus.repartition(1), k=N_ANCHORS, eps=EPS, n_iter=3
    ).collect()
    b = semantic_dedup(
        corpus.repartition(7, "vec_id"), k=N_ANCHORS, eps=EPS, n_iter=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_cells_keep_blobs_intact(corpus):
    cents = kmeans_fit(corpus, k=N_ANCHORS, n_iter=3)
    assert cents.shape == (N_ANCHORS, DIM)
    # unit-norm centroids (spherical k-means)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    cells = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(corpus, cents).select("vec_id", "cell").collect()
    }
    for a in range(N_ANCHORS):
        blob = {cells[a]} | {
            cells[MEMBER_BASE + a * N_MEMBERS + j] for j in range(N_MEMBERS)
        }
        assert len(blob) == 1, f"blob {a} split across cells {blob}"


def test_k_larger_than_corpus_clamps(spark):
    rows = _planted_corpus()[:3]
    df = spark.createDataFrame(rows, SCHEMA)
    cents = kmeans_fit(df, k=10, n_iter=2)
    assert cents.shape == (3, DIM)
    out = semantic_dedup(df, k=10, eps=EPS, n_iter=2).collect()
    assert {r["vec_id"] for r in out} == {r[0] for r in rows}


def test_unreachable_eps_keeps_everything(corpus):
    out = semantic_dedup(corpus, k=N_ANCHORS, eps=1.000001, n_iter=2).collect()
    assert all(r["kept"] and r["rep_id"] == r["vec_id"] for r in out)


def test_cell_cap_truncates_comparisons_not_rows(spark):
    # one tight blob of 6, k=1 (single cell), cap 3: only the 3 lowest ids
    # are compared (clique -> rep 0); overflow rows must still appear in
    # the output, as kept singletons — the lsh.py DROP_CAP contract
    rng = np.random.default_rng(11)
    anchor = rng.normal(size=DIM)
    anchor /= np.linalg.norm(anchor)
    rows = [
        (i, (anchor + rng.normal(size=DIM) * 0.005).tolist()) for i in range(6)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = semantic_dedup(df, k=1, eps=EPS, n_iter=2, max_cell_size=3).collect()
    got = {r["vec_id"]: (r["rep_id"], r["kept"]) for r in out}
    assert got == {
        0: (0, True),
        1: (0, False),
        2: (0, False),
        3: (3, True),
        4: (4, True),
        5: (5, True),
    }
