"""End-to-end training-corpus plan (plans/training_corpus.py).

Planted-fixture semantics for every stage of the composition (tier
dedup, both integer quality gates, benchmark exclusion + contamination,
shard assignment), plus determinism/partitioning invariance; the
sf-scale differential against DuckDB runs via the driver oracle row
(training_corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genome_deduplication_spark.config import DedupConfig
from genome_deduplication_spark.plans.training_corpus import (
    build_training_corpus,
)

CFG = DedupConfig()


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i:03d}" for i in range(n))


@pytest.fixture(scope="module")
def tc_fixture(spark):
    base = _words("alpha", 60)                    # 60 tokens, all distinct
    bench_text = _words("bench", 60)
    # 13 consecutive benchmark tokens leaked into otherwise-unique text
    leak = " ".join(bench_text.split()[10:23])
    contaminated = _words("leaky", 30) + " " + leak + " " + _words("tail", 17)
    rows = [
        (0, "https://ex.com/a", base),                       # kept
        (1, "https://ex.com/a?utm_source=x", _words("b", 60)),  # url tier
        (2, "https://ex.com/c", base),                       # exact tier
        (3, "https://ex.com/d", _words("short", 10)),        # < min_tokens
        (4, "https://ex.com/e", " ".join(["loop"] * 60)),    # low distinct
        (5, "https://ex.com/f", bench_text),                 # benchmark doc
        (6, "https://ex.com/g", contaminated),               # contaminated
        (7, "https://ex.com/h", _words("omega", 45)),        # kept
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, text string")
    benchmark = spark.createDataFrame(
        [(5, bench_text)], "doc_id long, text string"
    )
    return rows, pages, benchmark


def test_training_corpus_stage_semantics(spark, tc_fixture):
    _, pages, benchmark = tc_fixture
    out = build_training_corpus(
        pages, CFG, benchmark=benchmark, min_tokens=30, min_distinct_pct=40,
        rows_per_shard=64,
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    # exactly the two docs that survive every stage
    assert set(got) == {0, 7}
    assert got[0]["n_tokens"] == 60 and got[0]["n_distinct_tokens"] == 60
    assert got[7]["n_tokens"] == 45
    # 2 clean docs / 64 per shard -> one shard
    assert {r["shard_id"] for r in got.values()} == {0}


def test_training_corpus_shard_range_and_determinism(spark, tc_fixture):
    _, pages, benchmark = tc_fixture
    kwargs = dict(
        benchmark=benchmark, min_tokens=30, min_distinct_pct=40,
        rows_per_shard=1,  # n_shards == n_clean: exercises real bucketing
    )
    a = build_training_corpus(pages, CFG, **kwargs)
    b = build_training_corpus(pages.repartition(7, "url"), CFG, **kwargs)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b, "shard assignment must be partitioning-invariant"
    n = len(rows_a)
    assert all(0 <= r[-1] < n for r in rows_a)


def test_training_corpus_all_filtered(spark):
    pages = spark.createDataFrame(
        [(1, "https://ex.com/x", "too short")],
        "doc_id long, url string, text string",
    )
    benchmark = spark.createDataFrame([], "doc_id long, text string")
    out = build_training_corpus(pages, CFG, benchmark=benchmark)
    assert out.columns == ["doc_id", "n_tokens", "n_distinct_tokens", "shard_id"]
    assert out.count() == 0
