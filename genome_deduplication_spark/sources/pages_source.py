"""Pages input source (S1/S2 analogues).

The reference expands a manifest of FASTA paths, filters to existing files
with a warning, and persists a basename->path map
(code/dedup2.py:517-539). The Spark equivalent implemented and tested here
is **parquet paths / path manifests** with missing-path accounting surfaced
as a lineage metric instead of a stderr warning.

``table_format="iceberg"`` routes through the standard DSv2
``spark.read.format("iceberg")`` hook as a documented swap-in: it is
exercised by tests only up to Spark's data-source resolution (the
iceberg-spark-runtime jar is absent in this sandbox, so resolution raises),
and the checkpointing layer likewise uses parquet + an atomic JSON manifest
rather than Iceberg snapshots — see sources/checkpoint.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def expand_manifest(manifest_path: str) -> tuple[list[str], list[str]]:
    """Manifest file (one path per line) -> (existing, missing) paths.
    Mirrors the reference's existence filter (code/dedup2.py:528-532)."""
    with open(manifest_path) as f:
        paths = [line.strip() for line in f if line.strip()]
    existing = [p for p in paths if os.path.exists(p)]
    missing = [p for p in paths if not os.path.exists(p)]
    return existing, missing


def read_pages(
    spark: SparkSession,
    source: str | list[str],
    table_format: str = "parquet",
) -> tuple[DataFrame, dict]:
    """Load the pages table.

    ``source`` is an Iceberg table name (format='iceberg'), a parquet
    path/glob, a list of paths, or a ``.txt``/``.list`` manifest of paths.
    Returns (DataFrame, lineage dict with missing-path accounting).
    """
    lineage: dict = {"missing_paths": []}
    if table_format == "iceberg":
        # DSv2 swap-in: needs the iceberg-spark-runtime jar + a catalog conf
        # on the session; without them Spark's source resolution raises
        # (tested) — the parquet+manifest path below is what this sandbox
        # runs end to end.
        df = spark.read.format("iceberg").load(source)
        return df, lineage
    if isinstance(source, str) and source.endswith((".txt", ".list")):
        existing, missing = expand_manifest(source)
        lineage["missing_paths"] = missing
        if not existing:
            raise FileNotFoundError(f"manifest {source} has no existing paths")
        df = spark.read.parquet(*existing)
    elif isinstance(source, list):
        existing = [p for p in source if os.path.exists(p)]
        lineage["missing_paths"] = [p for p in source if not os.path.exists(p)]
        df = spark.read.parquet(*existing)
    else:
        df = spark.read.parquet(source)
    missing_cols = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing_cols and set(missing_cols) != {"html"}:
        raise ValueError(f"pages source missing columns: {missing_cols}")
    return df, lineage
