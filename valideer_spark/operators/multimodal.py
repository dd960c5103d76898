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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    kind_col: str = "media_kind",
    decode_stub: str = "fake",
) -> DataFrame:
    """Resize the image payloads to (target_w, target_h) via Arrow-batched
    ``mapInPandas`` — non-image rows pass through untouched dimensions.

    The PIXEL transform is stubbed (PIL absent in this container): the
    fake codec re-derives a deterministic payload of size proportional to
    target_w*target_h from the content hash, so batch shapes, schema and
    partition behavior are production-real. Swap ``_fake_resize`` for
    ``PIL.Image.resize`` in deployment.
    """
    import pandas as pd

    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def _fake_resize(payload: bytes) -> bytes:
        digest = hashlib.sha256(payload).digest()
        # deterministic stand-in "pixel buffer": 3 bytes/px, hash-tiled
        n = target_w * target_h * 3
        return (digest * (n // len(digest) + 1))[:n]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "width": [], "height": [], "payload": []}
            for ref, kind, payload in zip(
                pdf[ref_col], pdf[kind_col], pdf[payload_col]
            ):
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "real image codecs (PIL) are not installed; use "
                        "decode_stub='fake'"
                    )
                payload = bytes(payload) if payload is not None else b""
                out["media_ref"].append(ref)
                if kind == "image":
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["payload"].append(_fake_resize(payload))
                else:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return df.select(ref_col, kind_col, payload_col).mapInPandas(
        process, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    kind_col: str = "media_kind",
    decode_stub: str = "fake",
) -> DataFrame:
    """Sample frames from video payloads (1:N row expansion through
    ``mapInPandas`` — the batch-iterator shape a real ffmpeg demuxer
    needs). Frame COUNT derives from the fake-decoded duration; frame
    bytes are deterministic content-hash slices. Non-video rows produce
    no output rows."""
    import pandas as pd

    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for ref, kind, payload in zip(
                pdf[ref_col], pdf[kind_col], pdf[payload_col]
            ):
                if kind != "video":
                    continue
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "real video codecs (ffmpeg) are not installed; use "
                        "decode_stub='fake'"
                    )
                payload = bytes(payload) if payload is not None else b""
                meta = _fake_decode(payload, "video")
                n_frames = min(max_frames, max(1, meta["duration_ms"] // every_ms))
                digest = hashlib.sha256(payload).digest()
                for i in range(int(n_frames)):
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(
                        hashlib.sha256(digest + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return df.select(ref_col, kind_col, payload_col).mapInPandas(
        process, schema=FRAME_SCHEMA
    )


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
