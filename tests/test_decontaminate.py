"""Benchmark decontamination (operators/decontaminate.py).

Semantics under test: a doc is contaminated iff it shares >= 1 word
n-gram (default n=13, the GPT-3 convention) with any benchmark doc;
benchmark docs present in the corpus are reported is_benchmark=true and
clean (self-overlap is not contamination); n_shared_ngrams counts window
POSITIONS in the doc (a repeated leaked phrase counts per occurrence);
docs shorter than n tokens have no windows and are always clean.
Differential: a python brute force over the same normalized corpus.
"""

import random
import re

from pyspark.sql import Row

from genome_deduplication_spark.operators.decontaminate import flag_contaminated

LEAK = "the quick brown fox jumps over the lazy dog near the old mill"  # 13 words


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _norm_tokens(text):
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def _brute(docs, benchmark, n=13):
    """Python twin: per doc_id -> (is_benchmark, n_shared_ngrams)."""
    def grams(text):
        toks = _norm_tokens(text)
        return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    bench_ids = {i for i, _ in benchmark}
    bench_set = {g for _, t in benchmark for g in grams(t)}
    out = {}
    for i, t in docs:
        if i in bench_ids:
            out[i] = (True, 0)
        else:
            out[i] = (False, sum(1 for g in grams(t) if g in bench_set))
    return out


def _run(spark, docs, benchmark, n=13):
    rows = flag_contaminated(_df(spark, docs), _df(spark, benchmark), n=n).collect()
    return {
        r["doc_id"]: (r["is_benchmark"], r["n_shared_ngrams"], r["contaminated"])
        for r in rows
    }


def test_leak_flagged_benchmark_clean_short_doc_clean(spark):
    bench = [(100, f"benchmark question preamble {LEAK} answer choices follow")]
    docs = bench + [
        (1, f"scraped page containing the verbatim test item {LEAK} plus chatter"),
        (2, "totally unrelated content with plenty of words but no overlap at all"
            " in any window of thirteen"),
        (3, "short doc"),  # < 13 tokens: no windows
    ]
    out = _run(spark, docs, bench)
    assert out[100] == (True, 0, False)
    assert out[1] == (False, 1, True)
    assert out[2] == (False, 0, False)
    assert out[3] == (False, 0, False)


def test_repeated_leak_counts_per_occurrence(spark):
    bench = [(100, LEAK)]
    docs = bench + [(1, f"{LEAK} filler words in the middle {LEAK}")]
    out = _run(spark, docs, bench)
    # the exact 13-gram occurs at two window positions; the windows that
    # straddle leak+filler don't match anything in the benchmark set
    assert out[1] == (False, 2, True)


def test_benchmark_disjoint_from_corpus(spark):
    # decontaminating BEFORE ingest: benchmark ids don't appear in docs
    bench = [(900, LEAK)]
    docs = [(1, f"prefix {LEAK} suffix"), (2, "clean words only here")]
    out = _run(spark, docs, bench)
    assert set(out) == {1, 2}
    assert out[1] == (False, 1, True)
    assert out[2] == (False, 0, False)
    assert all(not isb for isb, _, _ in out.values())


def test_differential_vs_python_brute_force(spark):
    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        docs.append((i, " ".join(words)))
    # plant verbatim leaks of two benchmark docs into three corpus docs
    bench = [(i, t) for i, t in docs if i % 20 == 0]  # ids 0,20,40
    for victim, src in [(3, 0), (7, 20), (11, 20)]:
        leak_toks = _norm_tokens(docs[src][1])[:13]
        if len(leak_toks) == 13:
            docs[victim] = (victim, docs[victim][1] + " " + " ".join(leak_toks))
    expect = _brute(docs, bench, n=13)
    got = _run(spark, docs, bench, n=13)
    assert {k: v[:2] for k, v in got.items()} == expect
    assert all((v[1] > 0) == v[2] for v in got.values())
    assert sum(v[2] for v in got.values()) >= 2  # the plants actually fire


def test_plan_broadcasts_benchmark_grams_no_corpus_text_shuffle(spark):
    """Scale guard: the benchmark gram set must be the broadcast build
    side of the corpus-window join (benchmark collections are tiny vs the
    corpus), and no Exchange may carry the tokenized corpus text — the
    only wide shuffle is the fixed-width per-doc hit count."""
    import os

    import pytest

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("driver testdata not present")
    import __spark_entry__ as entrymod

    qe = entrymod.q_decontamination(spark, sf)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # shuffles may key on the doc id (per-doc hit count) or on the gram
    # hash (the BENCHMARK side's bounded distinct); never on the token
    # array or any text column
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert (
                "doc_id" in ln or "gram" in ln or "_dc_bid" in ln
            ), ln  # _dc_bid = the bounded benchmark-id distinct
            assert "_bp_toks" not in ln and "text" not in ln, ln
