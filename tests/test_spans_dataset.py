from __future__ import annotations

from pyspark.sql import functions as F

from genome_deduplication_spark.config import DedupConfig
from genome_deduplication_spark.fixtures.pages import (
    fx_exact,
    fx_internal_repeat,
    pages_df,
)
from genome_deduplication_spark.operators.spans import (
    coverage_gaps,
    self_repeat_spans,
    self_repeat_spans_py,
)
from genome_deduplication_spark.plans.dataset_build import (
    build_training_corpus,
    extract_span_text,
)
from genome_deduplication_spark.plans.pipeline import dedup_pipeline


def test_self_repeat_spans_py_finds_planted_block():
    block = "the quick brown fox jumps over the lazy dog again and again ok"
    text = block + " filler words here " + block
    spans = self_repeat_spans_py(text, min_len=30)
    assert spans, "planted repeat not found"
    # both occurrences covered
    assert any(s <= 0 < e for s, e in spans)
    assert any(s <= text.rindex(block) < e for s, e in spans)
    assert self_repeat_spans_py("all unique words here", 10) == []


def test_self_repeat_spans_operator(spark):
    corpus = fx_internal_repeat(seed=42, docs=10)
    df = pages_df(spark, corpus)
    # fixture blocks are 20-60 words (>=100 chars); filler 50-150 words
    out = self_repeat_spans(df, min_len=100)
    urls_with_repeats = {r["url"] for r in out.select("url").distinct().collect()}
    assert len(urls_with_repeats) >= 8  # most planted docs detected
    assert urls_with_repeats <= {r["url"] for r in corpus.truth_clusters}


def test_coverage_gaps(spark):
    docs = spark.createDataFrame(
        [("a", "x" * 100), ("b", "y" * 50)], "url string, text string"
    )
    spans = spark.createDataFrame(
        [("a", 0, 40), ("a", 40, 100), ("b", 10, 20)],
        "url string, start bigint, end bigint",
    )
    gaps = {(r["url"], r["start"], r["end"]) for r in coverage_gaps(spans, docs).collect()}
    assert gaps == {("b", 0, 10), ("b", 20, 50)}  # 'a' fully tiled


def test_extract_span_text(spark):
    docs = spark.createDataFrame([("a", "hello world")], "url string, text string")
    spans = spark.createDataFrame([("a", 6, 11)], "url string, start bigint, end bigint")
    rows = extract_span_text(docs, spans).collect()
    assert rows[0]["span_text"] == "world"


def test_extract_span_text_continuation_byte_boundary(spark):
    """Regression (round-3 ADVICE): maximal byte repeats CAN start on a
    UTF-8 continuation byte — 'Ұ' (D2 B0) and 'а' (D0 B0) share their
    second byte, so the repeated block is b'\\xb0' + b'Z'*200, starting
    mid-character. Strict F.decode threw under ANSI and killed the job;
    the lenient path must yield U+FFFD instead of crashing."""
    text = "XҰ" + "Z" * 200 + " middle filler " + "Yа" + "Z" * 200
    spans = self_repeat_spans_py(text, min_len=50)
    assert spans
    raw = text.encode("utf-8")
    # the advisor's premise: at least one span boundary splits a character
    assert any(
        (raw[s] & 0xC0) == 0x80 or (e < len(raw) and (raw[e] & 0xC0) == 0x80)
        for s, e in spans
    )
    df = spark.createDataFrame([("a", text)], "url string, text string")
    sdf = spark.createDataFrame(
        [("a", s, e) for s, e in spans], "url string, start bigint, end bigint"
    )
    rows = extract_span_text(df, sdf).collect()  # must not throw
    for r in rows:
        expect = raw[r["start"]:r["end"]].decode("utf-8", errors="replace")
        assert r["span_text"] == expect


def test_span_byte_contract_non_ascii(spark):
    """Span offsets are UTF-8 byte offsets end-to-end: spans found on
    multi-byte text slice back to the exact repeated block, and
    coverage_gaps accounts in octets."""
    block = "héllo wörld ünïcode çontent " * 3  # multi-byte chars
    text = block + "середина filler " + block
    spans = self_repeat_spans_py(text, min_len=30)
    assert spans
    df = spark.createDataFrame([("a", text)], "url string, text string")
    sdf = spark.createDataFrame(
        [("a", s, e) for s, e in spans], "url string, start bigint, end bigint"
    )
    raw = text.encode("utf-8")
    for r in extract_span_text(df, sdf).collect():
        assert r["span_text"] == raw[r["start"]:r["end"]].decode("utf-8")
        assert block.strip() in r["span_text"]
    # gaps + spans must tile [0, octet_length)
    gaps = coverage_gaps(sdf, df).collect()
    covered = sum(e - s for s, e in spans) + sum(
        r["end"] - r["start"] for r in gaps
    )
    assert covered == len(raw)


def test_build_training_corpus(spark):
    corpus = fx_exact(seed=42, groups=10, copies=3)
    df = pages_df(spark, corpus)
    tables = dedup_pipeline(df, DedupConfig(), run_dir=None,
                            enable_substring_pass=False)
    out = build_training_corpus(df, tables["clusters"], dev_pct=0.2, max_dev=3)
    rows = out.collect()
    assert len(rows) == 10  # one canonical per cluster
    assert sum(1 for r in rows if r["split"] == "dev") == 2  # 20% of 10
    # deterministic shuffle key
    out2 = build_training_corpus(df, tables["clusters"], dev_pct=0.2, max_dev=3)
    assert {(r["url"], r["shuffle_key"]) for r in rows} == {
        (r["url"], r["shuffle_key"]) for r in out2.collect()
    }

def test_four_way_spans_tile_corpus(spark):
    """Reference 4-way output parity (code/dedup2.py:17-31): sample/masked/
    ignored/ambiguous spans tile every document's [0, octet_length) exactly
    once on the mixed fixture."""
    from genome_deduplication_spark.fixtures.pages import fx_mixed
    from genome_deduplication_spark.operators.spans import (
        build_spans_table,
        coverage_gaps,
    )

    corpus = fx_mixed(seed=42)
    df = pages_df(spark, corpus)
    tables = dedup_pipeline(df, DedupConfig(), run_dir=None,
                            enable_substring_pass=False)
    spans = build_spans_table(
        tables["normalized"].where("NOT is_ambiguous"),
        tables["clusters"],
        tables["ambiguous"],
        min_repeat_len=120,
    ).localCheckpoint(eager=True)
    docs = tables["normalized"].select("url", "text")
    # no gaps...
    assert coverage_gaps(spans, docs).count() == 0
    # ...and no overlaps: per-doc span lengths sum to octet_length
    covered = {
        r["url"]: r["c"]
        for r in spans.groupBy("url")
        .agg(F.sum(F.col("end") - F.col("start")).alias("c"))
        .collect()
    }
    lens = {
        r["url"]: r["l"]
        for r in docs.select(
            "url", F.coalesce(F.octet_length("text"), F.lit(0)).alias("l")
        ).collect()
    }
    for url, ln in lens.items():
        assert covered.get(url, 0) == ln, url
    # every kind present on this fixture
    kinds = {r["kind"] for r in spans.select("kind").distinct().collect()}
    assert kinds == {"sample", "masked", "ignored", "ambiguous"}


def test_write_training_shards_roundtrip_and_determinism(spark, tmp_path):
    """Shard export: every row lands in exactly one shard, one file per
    shard directory, manifest counts match, and the assignment is
    deterministic across re-exports."""
    import glob
    import json
    import os

    from genome_deduplication_spark.sources.sinks import write_training_shards

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "shards")
    m = write_training_shards(
        df, out, rows_per_shard=100, key_col="doc_id", fmt="json", seed=7
    )
    assert m["n_shards"] == 5 and m["rows"] == m["rows_read_back"] == 500
    assert sum(m["per_shard_rows"].values()) == 500
    for sid in m["per_shard_rows"]:
        files = [
            f
            for f in glob.glob(os.path.join(out, "data", f"shard_id={sid}", "*"))
            if not os.path.basename(f).startswith(("_", "."))
        ]
        assert len(files) == 1, (sid, files)
    back = spark.read.json(os.path.join(out, "data"))
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500

    out2 = str(tmp_path / "shards2")
    m2 = write_training_shards(
        df.repartition(13), out2, rows_per_shard=100, key_col="doc_id", fmt="json",
        seed=7,
    )
    assert m2["per_shard_rows"] == m["per_shard_rows"]
    assign1 = {
        r["doc_id"]: r["shard_id"] for r in back.select("doc_id", "shard_id").collect()
    }
    assign2 = {
        r["doc_id"]: r["shard_id"]
        for r in spark.read.json(os.path.join(out2, "data"))
        .select("doc_id", "shard_id")
        .collect()
    }
    assert assign1 == assign2  # row-level assignment, not just counts
    with open(os.path.join(out, "shards_manifest.json")) as f:
        assert json.load(f)["per_shard_rows"] == m["per_shard_rows"]


def test_write_training_shards_empty_input(spark, tmp_path):
    from genome_deduplication_spark.sources.sinks import write_training_shards

    df = spark.createDataFrame([], "doc_id bigint, text string")
    m = write_training_shards(
        df, str(tmp_path / "empty"), rows_per_shard=10, key_col="doc_id"
    )
    assert m["rows"] == m["n_shards"] == 0 and m["per_shard_rows"] == {}
