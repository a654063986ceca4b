"""Per-zoom pyramid driver — the traverse_zooms analog
(reference: tile.cpp:3272-3623), Spark-first.

For each zoom z in [minzoom, maxzoom]:

1. filter the stamped feature relation to ``feature_minzoom <= z``
   (rate dropping was decided once, globally — main.cpp:299-350);
2. tag tiles via Catalyst bbox arithmetic (:func:`tile.assign_tiles`);
3. route oversized tiles through hierarchical split-and-merge
   (:func:`tile.tiles_for_zoom`), bounded by ``cfg.max_features_per_task``;
4. write the zoom's tiles as a parquet partition
   ``{out_dir}/z={z}/`` + a ``_zoom_{z}.json`` metrics manifest —
   the per-zoom checkpoint the north rule requires: a re-run skips zooms
   whose manifest exists (idempotent resume), and the manifest carries
   per-zoom lineage (input row count, tile count, byte totals, hot tiles).

The per-tile feature *counts* come from one cheap groupBy-count over the
tile keys — the statistics pass that replaces tippecanoe's
largest-shard-first scheduling (tile.cpp:3327-3378) with an explicit
split plan.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import minzoom as mzmod
from . import tile as tilemod
from .config import TilingConfig


def zoom_manifest_path(out_dir: str, z: int) -> str:
    return os.path.join(out_dir, f"_zoom_{z}.json")


def build_pyramid(
    spark: SparkSession,
    features: DataFrame,
    cfg: TilingConfig | None = None,
    out_dir: str | None = None,
    stamp: bool = True,
    resume: bool = True,
) -> list[dict]:
    """Run the full z-range.  Returns the per-zoom metrics manifests.
    With ``out_dir=None`` the tiles are computed and counted but not
    persisted (bench mode)."""
    cfg = cfg or TilingConfig()
    feats = mzmod.stamp_minzoom(features, cfg) if stamp else features
    feats = feats.persist()
    try:
        manifests: list[dict] = []
        for z in range(cfg.minzoom, cfg.maxzoom + 1):
            if out_dir and resume:
                mp = zoom_manifest_path(out_dir, z)
                if os.path.exists(mp):
                    with open(mp) as fh:
                        manifests.append(json.load(fh))
                    continue
            manifests.append(build_zoom(spark, feats, z, cfg, out_dir))
        return manifests
    finally:
        feats.unpersist()


def build_zoom(
    spark: SparkSession,
    stamped: DataFrame,
    z: int,
    cfg: TilingConfig,
    out_dir: str | None = None,
) -> dict:
    t0 = time.time()
    # statistics pass: per-tile feature counts (drives the split plan)
    assigned = tilemod.assign_tiles(stamped, z, cfg)
    counts = (
        assigned.groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cfg.max_features_per_task)
        .collect()
    )
    hot = {(r["tx"], r["ty"]): r["n"] for r in counts}

    tiles = tilemod.tiles_for_zoom(
        stamped, z, cfg, hot_counts=hot, split_budget=cfg.max_features_per_task
    )
    if out_dir:
        zdir = os.path.join(out_dir, f"z={z}")
        tiles.write.mode("overwrite").parquet(zdir)
        tiles = spark.read.parquet(zdir)
    stats = tiles.agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.coalesce(F.sum("n_in"), F.lit(0)).alias("n_in"),
        F.coalesce(F.sum("n_out"), F.lit(0)).alias("n_out"),
        F.coalesce(F.sum("gz_bytes"), F.lit(0)).alias("gz_bytes"),
        F.coalesce(F.max("gz_bytes"), F.lit(0)).alias("max_gz"),
        F.coalesce(F.max("passes"), F.lit(0)).alias("max_passes"),
    ).collect()[0]
    manifest = {
        "z": z,
        "n_tiles": stats["n_tiles"],
        "n_features_in": stats["n_in"],
        "n_features_out": stats["n_out"],
        "gz_bytes": stats["gz_bytes"],
        "max_tile_gz_bytes": stats["max_gz"],
        "max_passes": stats["max_passes"],
        "hot_tiles_split": len(hot),
        "wall_sec": round(time.time() - t0, 3),
    }
    if out_dir:
        with open(zoom_manifest_path(out_dir, z), "w") as fh:
            json.dump(manifest, fh)
    return manifest
