"""Cross-document boilerplate phrase removal (operators/boilerplate.py).

Semantics under test: word n-grams shared by >= min_df distinct docs are
boilerplate; every token covered by any boiler window is removed from the
normalized text; coverage is a union over overlapping windows; docs
shorter than n tokens are untouched; a fully-boilerplate doc cleans to ''.
"""

import random

from pyspark.sql import Row

from genome_deduplication_spark.operators.boilerplate import (
    boilerplate_phrases,
    remove_boilerplate_phrases,
)

FOOTER = "all rights reserved by the example site inc"  # 8 words


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_shared_footer_removed_unique_text_kept(spark):
    rows = [
        (1, f"alpha beta gamma {FOOTER}"),
        (2, f"delta epsilon {FOOTER} zeta"),
        (3, "nothing shared here at all today friends ok"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_phrases(_docs(spark, rows), n=8, min_df=2).collect()
    }
    assert out[1]["cleaned_text"] == "alpha beta gamma"
    assert out[2]["cleaned_text"] == "delta epsilon zeta"
    assert out[1]["n_boiler_tokens"] == 8 and out[2]["n_boiler_tokens"] == 8
    assert out[3]["cleaned_text"] == rows[2][1] and out[3]["n_boiler_tokens"] == 0


def test_min_df_counts_distinct_docs_not_occurrences(spark):
    # the footer appears TWICE in one doc but only in that doc: df=1 < 2
    rows = [(1, f"{FOOTER} middle words here {FOOTER}"), (2, "unrelated text")]
    out = remove_boilerplate_phrases(_docs(spark, rows), n=8, min_df=2).collect()
    assert all(r["n_boiler_tokens"] == 0 for r in out)
    assert boilerplate_phrases(_docs(spark, rows), n=8, min_df=2).count() == 0


def test_fully_boilerplate_doc_cleans_to_empty(spark):
    rows = [(1, FOOTER), (2, FOOTER), (3, "x y z")]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_phrases(_docs(spark, rows), n=8, min_df=2).collect()
    }
    assert out[1]["cleaned_text"] == "" and out[1]["n_boiler_tokens"] == 8
    assert out[1]["n_tokens"] == 8
    # doc 3 is shorter than n: no windows, untouched
    assert out[3]["cleaned_text"] == "x y z" and out[3]["n_boiler_tokens"] == 0


def test_overlapping_windows_union_not_double_count(spark):
    # 9 shared tokens -> two overlapping 8-windows; coverage must be 9
    nine = FOOTER + " forever"
    rows = [(1, f"{nine} tail"), (2, f"head {nine}")]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_phrases(_docs(spark, rows), n=8, min_df=2).collect()
    }
    assert out[1]["n_boiler_tokens"] == 9 and out[1]["cleaned_text"] == "tail"
    assert out[2]["n_boiler_tokens"] == 9 and out[2]["cleaned_text"] == "head"


def _brute(rows, n, min_df):
    toks = {i: t.lower().split() for i, t in rows}
    from collections import defaultdict

    docs_of = defaultdict(set)
    for i, ts in toks.items():
        for s in range(len(ts) - n + 1):
            docs_of[" ".join(ts[s : s + n])].add(i)
    boiler = {p for p, ds in docs_of.items() if len(ds) >= min_df}
    out = {}
    for i, ts in toks.items():
        cov = set()
        for s in range(len(ts) - n + 1):
            if " ".join(ts[s : s + n]) in boiler:
                cov.update(range(s, s + n))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        out[i] = (len(ts), len(cov), " ".join(kept))
    return out


def test_differential_vs_brute_force(spark):
    rng = random.Random(20260817)
    vocab = [f"w{j}" for j in range(12)]  # small vocab -> chance n-gram hits
    rows = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(2, 30))]
        rows.append((i, " ".join(words)))
    # plant a shared block in a third of the docs
    block = "p q r s t u v w x".split()
    for i in range(0, 40, 3):
        words = rows[i][1].split()
        at = rng.randint(0, len(words))
        rows[i] = (i, " ".join(words[:at] + block + words[at:]))
    for n, min_df in ((8, 2), (5, 3)):
        want = _brute(rows, n, min_df)
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_boiler_tokens"], r["cleaned_text"])
            for r in remove_boilerplate_phrases(
                _docs(spark, rows), n=n, min_df=min_df
            ).collect()
        }
        assert got == want, f"n={n} min_df={min_df}"
