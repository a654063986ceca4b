"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
decode / feature-extract / resize / frame-sample kernels are Arrow-batched
``mapInPandas`` stages.  The actual codec work is STUBBED (no imaging or
audio libraries in this container): ``decode_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives plausible metadata from the payload
bytes — the Spark-side plumbing (schemas, batching, partitioning, UDF
signatures) is real and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    base = spark.range(0, n, 1, partitions)

    def gen(batches):
        kinds = np.array(["image", "audio", "video"])
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rows = []
            for i in ids:
                k = kinds[i % 3]
                payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + int(i) % 4)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": str(k),
                        "payload": payload,
                        "meta": {
                            "mime": f"{k}/x-fake",
                            "width": 64 + int(i) % 512 if k != "audio" else 0,
                            "height": 48 + int(i) % 256 if k != "audio" else 0,
                            "duration_ms": 1000 + int(i) % 9000 if k != "image" else 0,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake: dimensions/frames + a 16-d feature vector all
    derived from the payload digest (stands in for a real codec)."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    w = 16 + int(digest[0]) * 4
    h = 16 + int(digest[1]) * 2
    frames = 1 if kind == "image" else 1 + int(digest[2]) % 32
    feat = (arr[:16] / 255.0).astype(np.float32)
    return w, h, frames, feat


def decode_stub(
    media: DataFrame, fake: bool = False, batch_hint: int = 256
) -> DataFrame:
    """Decode/feature-extract stage.  With ``fake=False`` this raises at
    executor time (the marked stub: a real deployment plugs PIL/ffmpeg
    here); ``fake=True`` runs the deterministic fake through the full
    Arrow path."""

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "use fake=True for the deterministic test decoder"
                )
            ids = pdf["media_id"].to_numpy()
            kinds = pdf["kind"].to_numpy()
            payloads = pdf["payload"].to_numpy()
            rows = []
            for i in range(len(pdf)):
                w, h, nf, feat = _fake_decode(bytes(payloads[i]), kinds[i])
                rows.append(
                    {
                        "media_id": ids[i],
                        "kind": kinds[i],
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing: explode sampled frame indices per video
    (pure Catalyst sequence/explode — the shape a real sampler uses)."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return decoded.filter(F.col("n_frames") > 1).select(
        "media_id",
        "kind",
        F.explode(idx).alias("frame_index"),
        "feature",
    )


def resize_meta(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as column algebra: target dims preserving aspect."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.withColumns(
        {
            "target_width": F.ceil(F.col("width") * scale).cast("int"),
            "target_height": F.ceil(F.col("height") * scale).cast("int"),
        }
    )
