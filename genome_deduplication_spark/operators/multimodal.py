"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
Spark-side plumbing (schemas, batching, partition sizing) is real and
tested, while the codec step is stubbed behind DECODERS_AVAILABLE — the
decode libraries are not in this container (by design; see module tests).

The deterministic fake decoder lets the full pipeline (decode -> feature ->
dedup-by-feature) run end-to-end in tests: it derives a fixed-length
"feature vector" from the payload bytes, so two identical payloads produce
identical features (which is all the dedup path needs).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODERS_AVAILABLE = False  # real image/audio codecs not present in-container

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEAT_DIM = 32


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: bucket byte histogram
    folded to _FEAT_DIM floats. Identical payloads -> identical features."""
    if not payload:
        return np.zeros(_FEAT_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % _FEAT_DIM, minlength=_FEAT_DIM).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n > 0 else hist


def decode_and_featurize(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """media table -> (media_id, kind, feature array<float>, n_bytes).

    mapInPandas so one Arrow batch holds `batch_rows` payloads — the batch
    shape is sized for large binaries (keep `batch_rows * payload_size`
    under executor Arrow memory; callers with big media should also set
    spark.sql.execution.arrow.maxRecordsPerBatch accordingly).
    """
    if DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError(
            "real codec path requires image/audio libs absent in container"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_feature(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [
                        0 if p is None else len(p) for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _kernel, out_schema
    )


def media_exact_dup_clusters(media: DataFrame) -> DataFrame:
    """Exact payload dedup: sha2 of bytes, min-id election — JVM-side."""
    keyed = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("payload_hash")
    )
    canon = keyed.groupBy("payload_hash").agg(
        F.min("media_id").alias("cluster_id"), F.count(F.lit(1)).alias("cluster_size")
    )
    return keyed.join(canon, "payload_hash")


def frame_sample_positions(duration_ms: F.Column, every_ms: int) -> F.Column:
    """Deterministic frame-sampling positions for video payloads (JVM-side):
    [0, every_ms, 2*every_ms, ...) < duration_ms."""
    return F.when(
        duration_ms > 0,
        F.sequence(F.lit(0).cast("long"), duration_ms - 1, F.lit(every_ms).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
