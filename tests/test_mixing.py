"""Corpus mixing (operators/mixing.py).

Semantics under test: n_copies = floor(w) + (u < frac(w)) with
key-derived u; integer weights replicate exactly; weight 0 drops the
source; unknown sources take default_weight; copy_id enumerates 0..n-1;
the mix is deterministic and shuffle-free.
"""

from collections import Counter

from pyspark.sql import functions as F

from genome_deduplication_spark.operators.mixing import mix_corpus
from genome_deduplication_spark.operators.split import keyed_uniform


def _docs(spark, n=200):
    return spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(n)], "doc_id bigint, source string"
    )


def test_integer_weights_exact_and_zero_drops(spark):
    out = mix_corpus(
        _docs(spark), {"s0": 3.0, "s1": 0.0}, seed=1, default_weight=1.0
    ).collect()
    by_src = Counter(r["source"] for r in out)
    assert by_src == {"s0": 150, "s2": 50, "s3": 50}  # s0 x3, s1 dropped
    copies = Counter((r["doc_id"], r["copy_id"]) for r in out)
    assert max(copies.values()) == 1  # copy_id enumerates, never repeats
    s0_ids = {r["doc_id"] for r in out if r["source"] == "s0"}
    for d in s0_ids:
        assert {r["copy_id"] for r in out if r["doc_id"] == d} == {0, 1, 2}


def test_fractional_weight_matches_uniform_threshold(spark):
    df = _docs(spark, 400)
    out = mix_corpus(df, {"s0": 1.5}, seed=9).collect()
    u = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", keyed_uniform(9, F.col("doc_id")).alias("u")
        ).collect()
    }
    got = Counter(r["doc_id"] for r in out if r["source"] == "s0")
    for i in range(0, 400, 4):  # the s0 docs
        assert got[i] == (2 if u[i] < 0.5 else 1), i
    # determinism: a second evaluation is identical
    out2 = mix_corpus(df, {"s0": 1.5}, seed=9).collect()
    assert Counter((r["doc_id"], r["copy_id"]) for r in out) == Counter(
        (r["doc_id"], r["copy_id"]) for r in out2
    )


def test_mix_plan_is_shuffle_free(spark):
    plan = (
        mix_corpus(_docs(spark), {"s0": 2.5}, seed=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
