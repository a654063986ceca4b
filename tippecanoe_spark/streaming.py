"""Structured Streaming: incremental tile statistics over a feature
stream.

The reference is strictly batch (SURVEY §1.4: no streaming model), but a
web-scale ingest pipeline receives pages continuously; this module gives
the engine's streaming face:

- :func:`stream_geocode` — the same Arrow geocode/serialize kernels over
  ``readStream`` micro-batches (stateless map stages compose unchanged —
  the payoff of keeping them as pure DataFrame transforms).
- :func:`streaming_tile_counts` — watermarked, windowed per-tile feature
  counts at a target zoom: the live "tiles heating up" signal that the
  batch pyramid build consumes as its hot-tile plan at the next run.
- :func:`run_file_stream` — file-source driver (new parquet dropped into
  a directory = new micro-batch), foreachBatch-compatible.

Late data: event time is ``warc_ts``; the default 10-minute watermark
bounds state (aggregation state per (window, tile) is dropped once the
watermark passes the window end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import TilingConfig
from .features import serialize
from .geocode import geocode
from .synth import WEBPAGES_SCHEMA


def stream_pages(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source page stream: parquet files arriving in ``input_dir``."""
    return (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_geocode(pages: DataFrame, cfg: TilingConfig | None = None) -> DataFrame:
    """Streaming geocode+serialize: identical kernels as batch; the
    event-time column rides along for watermarking."""
    cfg = cfg or TilingConfig()
    with_ts = geocode(pages, keep_cols=("warc_ts",))
    return serialize(with_ts, cfg, keep_cols=("warc_ts",))


def streaming_tile_counts(
    features: DataFrame,
    z: int = 6,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed per-tile counts at zoom z (pure Catalyst:
    shiftright bbox → tile key, groupBy window+tile)."""
    shift = 32 - z
    return (
        features.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.shiftright(F.col("minx"), shift).cast("int").alias("tx"),
            F.shiftright(F.col("miny"), shift).cast("int").alias("ty"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.approx_count_distinct("url").alias("n_pages"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tx", "ty", "n_features", "n_pages",
        )
    )


def run_file_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    z: int = 6,
    queryName: str = "tile_counts",
):
    """Start the stream into an in-memory sink (tests / monitoring);
    production would writeStream to an Iceberg/parquet table instead."""
    pages = stream_pages(spark, input_dir)
    feats = stream_geocode(pages)
    counts = streaming_tile_counts(feats, z=z)
    return (
        counts.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
