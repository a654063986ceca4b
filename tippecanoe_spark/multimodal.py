"""Multimodal columns: binary payloads + typed metadata, with REAL
pure-stdlib codecs for the formats this container can decode.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages.  :mod:`media_codecs` decodes PNG (zlib inflate +
scanline unfilter), BMP, PPM/PGM, concatenated-PPM raw video, and PCM
WAV — so the pipeline here runs REAL decoding end to end, and the
synthetic media table writes real payloads whose dimensions derive
arithmetically from ``media_id`` (the driver's multimodal oracle
recomputes them relationally in DuckDB).

Formats that need codecs this environment lacks (JPEG, MP4, …) still
raise ``NotImplementedError`` through :func:`decode_stub`'s documented
stub path unless ``fake=True`` substitutes the deterministic fake.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import media_codecs as mc

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
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _synth_params(i: int) -> dict:
    """media_id → deterministic payload parameters.  The SAME arithmetic
    lives in the driver oracle's SQL (queries_ext._sql_multimodal) — the
    decode stage must recover exactly these numbers from the bytes."""
    m = i % 4
    if m == 0:  # PNG RGB
        return {"kind": "image", "mime": "image/png",
                "w": 16 + i % 32, "h": 8 + i % 16, "frames": 1, "ms": 0}
    if m == 1:  # BMP
        return {"kind": "image", "mime": "image/bmp",
                "w": 12 + i % 24, "h": 6 + i % 12, "frames": 1, "ms": 0}
    if m == 2:  # WAV PCM mono 8 kHz
        n = 800 + (i % 32) * 40
        return {"kind": "audio", "mime": "audio/wav",
                "w": 0, "h": 0, "frames": 0, "ms": n // 8}
    side = 8 + i % 8  # raw concatenated-PPM video
    return {"kind": "video", "mime": "video/x-raw-ppm",
            "w": side, "h": side, "frames": 2 + i % 7, "ms": 0}


def _synth_payload(i: int) -> bytes:
    p = _synth_params(i)
    if p["mime"] == "image/png":
        yy, xx = np.mgrid[0 : p["h"], 0 : p["w"]]
        px = ((yy + xx + i) % 256).astype(np.uint8)
        rgb = np.stack([px, (px + 85) % 256, (px + 170) % 256], axis=2)
        return mc.encode_png(rgb.astype(np.uint8))
    if p["mime"] == "image/bmp":
        yy, xx = np.mgrid[0 : p["h"], 0 : p["w"]]
        px = ((yy * 3 + xx + i) % 256).astype(np.uint8)
        return mc.encode_bmp(np.stack([px, px, px], axis=2))
    if p["mime"] == "audio/wav":
        n = p["ms"] * 8
        t = np.arange(n, dtype=np.float64)
        wave_s = (np.sin(2 * np.pi * (100 + i % 50) * t / 8000.0) * 12000).astype(np.int16)
        return mc.encode_wav(wave_s, rate=8000)
    frames = []
    for fidx in range(p["frames"]):
        yy, xx = np.mgrid[0 : p["h"], 0 : p["w"]]
        frames.append(((yy + xx + i + fidx * 17) % 256).astype(np.uint8))
    return b"".join(mc.encode_ppm(f) for f in frames)


def synthetic_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic media table with REAL payload bytes (PNG/BMP/WAV/
    raw-PPM video) whose dimensions derive from media_id."""
    base = spark.range(0, n, 1, partitions)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy(np.int64):
                i = int(i)
                p = _synth_params(i)
                rows.append(
                    {
                        "media_id": i,
                        "kind": p["kind"],
                        "payload": _synth_payload(i),
                        "meta": {
                            "mime": p["mime"],
                            "width": p["w"],
                            "height": p["h"],
                            "duration_ms": p["ms"],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_one(payload: bytes) -> dict | None:
    """One payload → decoded facts + 16-d feature, or None if the format
    needs an unavailable codec."""
    mime = mc.sniff(payload)
    if mime is None:
        return None
    if mime == "audio/wav":
        samples, rate = mc.decode_wav(payload)
        return {
            "width": 0, "height": 0, "n_frames": 0,
            "duration_ms": int(len(samples) * 1000 // rate),
            "feature": mc.audio_feature(samples).tolist(),
        }
    if mime == "image/x-portable-anymap":
        frames = mc.decode_ppm_frames(payload)
        h, w = frames[0].shape[:2]
        return {
            "width": int(w), "height": int(h), "n_frames": len(frames),
            "duration_ms": 0,
            "feature": mc.image_feature(frames[0]).tolist(),
        }
    px = mc.decode_png(payload) if mime == "image/png" else mc.decode_bmp(payload)
    h, w = px.shape[:2]
    return {
        "width": int(w), "height": int(h), "n_frames": 1, "duration_ms": 0,
        "feature": mc.image_feature(px).tolist(),
    }


def decode_media(media: DataFrame, strict: bool = True) -> DataFrame:
    """REAL decode stage: sniff + decode each payload with the
    pure-stdlib codecs.  ``strict`` raises on undecodable formats (the
    honest stub for JPEG/MP4); ``strict=False`` drops them."""

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                pdf["payload"].to_numpy(),
            ):
                got = decode_one(bytes(payload))
                if got is None:
                    if strict:
                        raise NotImplementedError(
                            "no codec for this payload in this environment"
                            " (PNG/BMP/PPM/WAV decode natively; JPEG/MP4"
                            " need external codecs)"
                        )
                    continue
                rows.append({"media_id": mid, "kind": kind, **got})
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder (kept for the documented JPEG/MP4 stub
    path): dimensions/frames + a 16-d feature from the payload digest."""
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
    """Legacy stub API: with ``fake=False`` raises at executor time (a
    real deployment plugs PIL/ffmpeg here); ``fake=True`` runs the
    deterministic fake through the full Arrow path.  New code should use
    :func:`decode_media`, which decodes PNG/BMP/PPM/WAV for real."""

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "use decode_media for PNG/BMP/PPM/WAV or fake=True "
                    "for the deterministic test decoder"
                )
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                pdf["payload"].to_numpy(),
            ):
                w, h, nf, feat = _fake_decode(bytes(payload), kind)
                rows.append(
                    {
                        "media_id": mid, "kind": kind, "width": w, "height": h,
                        "n_frames": nf, "duration_ms": 0,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling for raw-PPM video payloads: decode, keep
    every ``every_n``-th frame, one output row per kept frame with that
    frame's own feature vector."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
            ):
                b = bytes(payload)
                if mc.sniff(b) != "image/x-portable-anymap":
                    continue
                frames = mc.decode_ppm_frames(b)
                if len(frames) < 2:
                    continue
                for fi in range(0, len(frames), every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": fi,
                            "feature": mc.image_feature(frames[fi]).tolist(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(
        gen,
        schema="media_id long, frame_index int, feature array<float>",
    )


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """REAL resize: decode images, nearest-neighbor downscale to fit
    ``max_side`` preserving aspect, re-encode as PNG."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
            ):
                b = bytes(payload)
                mime = mc.sniff(b)
                if mime == "image/png":
                    px = mc.decode_png(b)
                elif mime == "image/bmp":
                    px = mc.decode_bmp(b)
                else:
                    continue
                h, w = px.shape[:2]
                scale = min(1.0, max_side / max(w, h))
                tw = max(1, int(w * scale))
                th = max(1, int(h * scale))
                out = mc.resize_image(px, tw, th)
                rows.append(
                    {
                        "media_id": mid,
                        "target_width": tw,
                        "target_height": th,
                        "resized": mc.encode_png(out),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(
        gen,
        schema="media_id long, target_width int, target_height int,"
        " resized binary",
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
