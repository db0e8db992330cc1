"""Incremental pages ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9) and the north_rule does not
require streaming; this module exists because a production crawl is
*incremental*: new WARC drops land continuously, and recomputing signatures
for the whole corpus per drop is absurd at 10^12 docs. The streaming job
maintains the *signature* table incrementally (the expensive per-doc work:
normalize, shingle, MinHash, SimHash); the pair/cluster stages stay batch
jobs over the signature table's snapshots (exactly the reference's
checkpoint-then-continue cadence, code/dedup2.py:553, at stream granularity).

Within-stream exact dedup uses dropDuplicatesWithinWatermark on the content
hash — the streaming analogue of the global seen-set probe for the
exact-duplicate case. Cross-batch near-dup unification is the batch CC
stage's job, by design: LSH bucket state is unbounded, so it belongs in the
snapshot table, not in stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genome_deduplication_spark.config import DedupConfig
from genome_deduplication_spark.functions.signatures import make_doc_signature_udf
from genome_deduplication_spark.functions.text import normalize_text
from genome_deduplication_spark.operators.exact_dedup import content_key


def streaming_signatures(pages_stream: DataFrame, cfg: DedupConfig) -> DataFrame:
    """pages stream -> signature stream (same one-pass kernel as batch
    stage 2, so streamed and batch signature tables are interchangeable)."""
    doc_signature_udf = make_doc_signature_udf(cfg)
    norm = pages_stream.select(
        "url",
        "warc_ts",
        normalize_text(F.col("text")).alias("text"),
        "lang",
    ).where(F.col("text").isNotNull() & (F.length("text") >= cfg.shingle_k))
    return norm.select(
        "url",
        "warc_ts",
        content_key(F.col("text")).alias("content_hash"),
        doc_signature_udf("text").alias("sig"),
    ).select(
        "url",
        "warc_ts",
        "content_hash",
        F.col("sig.n_shingles").alias("n_shingles"),
        F.col("sig.minhash").alias("minhash"),
        F.col("sig.simhash").alias("simhash"),
        F.col("sig.anchors").alias("anchors"),
    )


def run_ingest(
    pages_stream: DataFrame,
    cfg: DedupConfig,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    dedup_exact: bool = True,
    trigger_available_now: bool = True,
):
    """Start the ingest query: signature stream -> parquet sink (Iceberg
    table in production), exact dups within the watermark dropped at the
    stream edge. Returns the StreamingQuery."""
    sigs = streaming_signatures(pages_stream, cfg)
    if dedup_exact:
        sigs = sigs.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    writer = (
        sigs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
