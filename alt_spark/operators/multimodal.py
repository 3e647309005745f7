"""Multimodal columns: opaque binary payloads + typed metadata (⊕ J11).

The reference stores media as URL columns (og_image_url,
migrations-atlas/migrations/20260301000000_add_og_image_url_to_feeds.sql;
fetcher alt-backend/app/shared/driver/alt_db/ogp_image_driver.go). The
north-star generalization treats image/audio/video as first-class
`binary` columns with a typed metadata struct, and runs decode /
feature-extract / resize / frame-sample as Arrow-batched kernels.

Spark-side plumbing here is real and tested: pinned schema, Arrow batch
shape (mapInPandas over record batches), partition-friendly layout
(payloads stay with their rows; kernels are narrow maps — no shuffle).
The actual codec calls are STUBBED — image/audio libraries are not in
this container — behind `_decode_stub`, which produces a deterministic
fake so the pipeline shape is verifiable end-to-end. Swapping the stub
for PIL/ffmpeg changes no plan, schema, or partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "media_table", "decode_features", "resize_plan", "frame_sample_plan"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table(df: DataFrame) -> DataFrame:
    """Validate/coerce an arbitrary frame into the pinned media schema."""
    return df.select(
        F.col("media_id").cast("long"),
        F.col("payload").cast("binary"),
        F.col("meta").cast(MEDIA_SCHEMA["meta"].dataType),
    )


def _decode_stub(payload: bytes | None, mime: str | None, dim: int) -> list[float]:
    """Deterministic fake decoder. REAL DECODE NOT IMPLEMENTED — this
    container has no image/audio codecs. A real kernel would replace
    only this function (e.g. PIL decode → pooled embedding); everything
    around it — Arrow batching, schema, partitioning — is production
    shape. The fake hashes payload bytes into a stable unit-scale vector
    so tests can assert exact values.
    """
    if payload is None:
        return [0.0] * dim
    acc = 2166136261
    out = []
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            acc = (acc ^ b) * 16777619 % (1 << 32)
        out.append(((acc % 2048) / 1024.0) - 1.0)
    return out


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payload → feature vector, Arrow-batched (mapInPandas).

    The kernel sees pandas DataFrames of whole Arrow record batches
    (spark.sql.execution.arrow.maxRecordsPerBatch rows each), not Python
    rows — the §2.L surface for external-model/codec UDFs (I14-style).
    Narrow map: runs inside the scan stage, preserves partitioning.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["meta"].map(
                        lambda m: None if m is None else m["mime"]
                    ),
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "feature": [
                        _decode_stub(
                            p, None if m is None else m["mime"], dim
                        )
                        for p, m in zip(pdf["payload"], pdf["meta"])
                    ],
                }
            )

    return media.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_px: int = 512) -> DataFrame:
    """Resize planning is pure metadata math — it never decodes: the
    scale factor and target dims come from the typed meta struct
    (JVM-side), so the expensive kernel runs only on rows that need it.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_px, max_px / F.greatest(w, h).cast("double")
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "payload",
        "meta",
        scale.alias("scale"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling as a lateral explode of timestamps derived
    from meta.duration_ms — the decode of each sampled frame is the
    stubbed kernel's job; the sampling plan itself is columnar."""
    n = (F.col("meta.duration_ms") / every_ms).cast("int")
    return media.filter(F.col("meta.duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )
