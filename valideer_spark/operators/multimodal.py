"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages (one Python worker per partition, batched columnar
transfer — never per-row UDF calls).

The image/audio codecs are NOT installed in this container, so the decode
kernels are stubbed: ``decode_stub='fake'`` produces a deterministic fake
decode (content-hash-seeded dimensions/features) so the Spark-side
plumbing — schemas, batch iteration, partitioning — is fully real and
testable; ``decode_stub='raise'`` raises NotImplementedError where a real
codec (PIL/ffmpeg) would be called.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real codec: dimensions/duration/feature
    derived from the content hash. Replace with PIL/ffmpeg in production."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    duration = int.from_bytes(digest[2:4], "big") if kind in ("audio", "video") else 0
    feature = [b / 255.0 for b in digest[:FEATURE_DIM]]
    return {
        "content_hash": digest.hex()[:16],
        "width": width if kind in ("image", "video") else 0,
        "height": height if kind in ("image", "video") else 0,
        "duration_ms": duration,
        "feature": feature,
    }


def extract_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    kind_col: str = "media_kind",
    decode_stub: str = "fake",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode/feature-extract a binary media column via ``mapInPandas``.

    Input: (media_ref string, media_kind string, payload binary).
    Output: MEDIA_META_SCHEMA rows (one per input, order-free).
    """
    import pandas as pd

    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "media_kind": [], "n_bytes": [],
                "content_hash": [], "width": [], "height": [],
                "duration_ms": [], "feature": [],
            }
            for ref, kind, payload in zip(
                pdf[ref_col], pdf[kind_col], pdf[payload_col]
            ):
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "real media codecs (PIL/ffmpeg) are not installed in "
                        "this container; use decode_stub='fake'"
                    )
                payload = bytes(payload) if payload is not None else b""
                meta = _fake_decode(payload, kind)
                out["media_ref"].append(ref)
                out["media_kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["content_hash"].append(meta["content_hash"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["duration_ms"].append(meta["duration_ms"])
                out["feature"].append(meta["feature"])
            yield pd.DataFrame(out)

    src = df.select(
        F.col(ref_col).alias("media_ref"),
        F.col(kind_col).alias("media_kind"),
        F.col(payload_col).alias(payload_col),
    )
    if batch_partitions:
        src = src.repartition(batch_partitions)
    return src.mapInPandas(process, schema=MEDIA_META_SCHEMA)


def synth_media_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic fake binary payloads for every media span — exercises
    the binary-column plumbing without external data."""
    spans = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("media_kind"),
    ).filter(F.col("media_ref").isNotNull()).distinct()
    return spans.withColumn(
        "payload",
        F.encode(
            F.concat(F.lit("payload:"), F.col("media_ref"), F.lit(":"),
                     F.repeat(F.col("media_kind"), 8)),
            "utf-8",
        ),
    )
