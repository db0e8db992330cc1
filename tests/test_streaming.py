from __future__ import annotations

from genome_deduplication_spark.config import DedupConfig
from genome_deduplication_spark.fixtures.pages import (
    PAGES_SCHEMA,
    fx_exact,
    pages_df,
)
from genome_deduplication_spark.streaming.ingest import run_ingest

CFG = DedupConfig()


def test_streaming_ingest_dedups_exact(spark, tmp_path):
    corpus = fx_exact(seed=42, groups=5, copies=3)
    src = str(tmp_path / "incoming")
    pages_df(spark, corpus).drop("html").write.parquet(src)

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, text string, lang string"
        ).parquet(src)
    )
    out = str(tmp_path / "signatures")
    ckpt = str(tmp_path / "ckpt")
    q = run_ingest(stream, CFG, out, ckpt, watermark="10 minutes")
    q.awaitTermination(120)

    sigs = spark.read.parquet(out)
    # 15 docs in 5 exact groups -> watermark-window exact dedup keeps 5
    assert sigs.count() == 5
    assert sigs.select("content_hash").distinct().count() == 5
    cols = set(sigs.columns)
    assert {"url", "warc_ts", "content_hash", "minhash", "simhash"} <= cols

    # resume: a second drop with one new group + one repeat group lands in
    # the same sink via the same checkpoint
    more = fx_exact(seed=99, groups=1, copies=2)
    pages_df(spark, more).drop("html").write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, text string, lang string"
        ).parquet(src)
    )
    q2 = run_ingest(stream2, CFG, out, ckpt, watermark="10 minutes")
    q2.awaitTermination(120)
    sigs2 = spark.read.parquet(out)
    assert sigs2.select("content_hash").distinct().count() == 6
