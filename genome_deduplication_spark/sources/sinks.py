"""Output sinks — the BED-dump analogue (reference code/dedup2.py:280-310
writes 4 region files per input; here: clusters / pairs / spans tables).

Parquet in this sandbox; `writeTo(...).append()` against an Iceberg catalog
in production (same call sites, different format string). Writers partition
by a stable bucket of the key so downstream consumers get co-located reads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _write(df: DataFrame, path: str, partition_cols: list[str] | None = None,
           mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_clusters(clusters: DataFrame, out_dir: str) -> None:
    """clusters(url, cluster_id, cluster_size)."""
    _write(clusters, os.path.join(out_dir, "clusters"))


def write_pairs(pairs: DataFrame, out_dir: str) -> None:
    """pairs(id_a, id_b, [scores...])."""
    _write(pairs, os.path.join(out_dir, "pairs"))


def write_spans(spans: DataFrame, out_dir: str, kind: str) -> None:
    """spans(url, start, end) tagged with their kind
    (samples/masks/ignored/ambiguous analogue)."""
    _write(spans.withColumn("kind", F.lit(kind)), os.path.join(out_dir, f"spans_{kind}"))


def write_run_manifest(out_dir: str, config_json: str, metrics: list[dict]) -> None:
    """Reproducibility manifest (reference config.json, code/dedup2.py:513)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "run_manifest.json"), "w") as f:
        json.dump({"config": json.loads(config_json), "metrics": metrics}, f, indent=2)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    *,
    rows_per_shard: int,
    key_col: str,
    fmt: str = "json",
    seed: int = 0,
) -> dict:
    """Export the final mixed/cleaned corpus as size-targeted training
    shards (the JSONL-shard convention of web-scale training sets) with a
    read-back manifest.

    Shard assignment is DETERMINISTIC and partitioning-invariant: rows
    are bucketed by a key-derived uniform (house rule, operators/split)
    into ceil(n / rows_per_shard) shards; `repartition(n_shards,
    shard_id)` puts each whole shard in exactly one task, so every shard
    directory holds ONE file with no second compaction pass. Shard sizes
    concentrate around rows_per_shard (multinomial, not exact); the
    manifest records per-shard counts so trainers can verify.

    Returns the manifest dict (also written to ``shards_manifest.json``).
    Reference analogue: the per-input region-file dump + config manifest,
    code/dedup2.py:280-310,513.
    """
    from ..operators.split import keyed_uniform

    n = df.count()
    if n == 0:  # read.json cannot infer schema from a fileless directory
        manifest = {
            "format": fmt, "rows": 0, "rows_read_back": 0, "n_shards": 0,
            "rows_per_shard_target": rows_per_shard, "per_shard_rows": {},
            "seed": seed, "key_col": key_col,
        }
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "shards_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return manifest
    n_shards = max(1, -(-n // rows_per_shard))
    bucket = F.floor(
        keyed_uniform(seed, F.col(key_col)) * F.lit(n_shards)
    ).cast("int")
    data_dir = os.path.join(out_dir, "data")
    out = df.withColumn("shard_id", bucket).repartition(n_shards, "shard_id")
    w = out.write.mode("overwrite").partitionBy("shard_id")
    (w.json(data_dir) if fmt == "json" else w.parquet(data_dir))

    spark = df.sparkSession
    back = spark.read.format(fmt).load(data_dir)
    per_shard = {
        int(r["shard_id"]): r["cnt"]
        for r in back.groupBy("shard_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    manifest = {
        "format": fmt,
        "rows": n,
        "rows_read_back": int(sum(per_shard.values())),
        "n_shards": n_shards,
        "rows_per_shard_target": rows_per_shard,
        "per_shard_rows": {str(k): int(v) for k, v in sorted(per_shard.items())},
        "seed": seed,
        "key_col": key_col,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "shards_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
