"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The container has no image/audio codecs, so the *decode kernels are stubs*
(deterministic fakes / ``NotImplementedError`` behind an import-try), but the
Spark-side contract is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` iterator signatures, and partition sizing all match what a
production decode stage needs — swap the kernel, keep the plan.

Batch shape: decode stages set ``spark.sql.execution.arrow.maxRecordsPerBatch``
small (media rows are MBs) — see :func:`decode_conf`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
    ]
)

# conf recommended while a decode stage is in the plan
def decode_conf() -> dict[str, str]:
    return {"spark.sql.execution.arrow.maxRecordsPerBatch": "64"}


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 5) * 128, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 8) * 16 if kind != "audio" else None,
                48 + (i % 6) * 16 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: real impl would be PIL/libvips (not in container).
    Deterministic fake: payload bytes tiled to (h, w) grayscale."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL/libvips (not installed)")
    buf = np.frombuffer(payload, dtype=np.uint8)
    return np.resize(buf, (height, width))


FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, mean_intensity double, feat array<double>"


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (iterator of Arrow
    batches).  The kernel is the stub; the plumbing — column pruning before
    the UDF, bounded batch size, typed output schema — is production-shaped."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means = [], []
            for payload, w, h in zip(pdf.payload, pdf.width, pdf.height):
                arr = _decode_image_stub(
                    payload, int(w) if pd.notna(w) else 16, int(h) if pd.notna(h) else 16
                ).astype(np.float64)
                means.append(float(arr.mean()))
                # fake embedding: histogram of the decoded plane, normalized
                hist, _ = np.histogram(arr, bins=feat_dim, range=(0, 255))
                s = hist.sum() or 1
                feats.append((hist / s).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf.media_id,
                    "kind": pdf.kind,
                    "n_bytes": [len(p) for p in pdf.payload],
                    "mean_intensity": means,
                    "feat": feats,
                }
            )

    from ..session import ensure_shipped

    ensure_shipped(media.sparkSession)
    pruned = media.select("media_id", "kind", "width", "height", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame ts.
    Frame *content* decode is stubbed; the explode of frame timestamps is the
    real Spark-side shape (1→N via sequence/explode, JVM-side)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
