"""Flagship pipeline: documents → point features → the real engine stages
(serialize, curve-order minzoom stamping) → per-tile rollup with S2/hex
cell ids.  This is the driver's smoke-check entry."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells, features, minzoom, proj
from .config import TilingConfig
from .queries import derived_lonlat_cols


def doc_point_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → raw feature rows (derived deterministic lon/lat)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon, lat = derived_lonlat_cols(F.col("doc_id"))
    raw = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(0).alias("mention_seq"),
        F.lit("docs").alias("layer"),
        F.lit(1).alias("geom_type"),
        F.array(F.struct(lon.alias("lon"), lat.alias("lat"))).alias("coords"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("attrs"),
    )
    return raw


def flagship(spark: SparkSession, sf_dir: str, z: int = 4) -> DataFrame:
    """Top tiles by surviving-feature count at zoom z, with cell ids."""
    cfg = TilingConfig()
    feats = features.serialize(doc_point_features(spark, sf_dir), cfg)
    stamped = minzoom.stamp_minzoom(feats, cfg)

    shift = 32 - z

    def rollup(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = (pdf["minx"].to_numpy() + pdf["maxx"].to_numpy()) // 2
            y = (pdf["miny"].to_numpy() + pdf["maxy"].to_numpy()) // 2
            lon, lat = proj.world_to_lonlat(x, y)
            s2 = cells.s2_cell_id(lon, lat, level=max(z, 1))
            hx = cells.hex_cell(x, y, res=max(z, 1))
            yield pd.DataFrame(
                {
                    "tile_x": (x >> shift).astype(np.int32),
                    "tile_y": (y >> shift).astype(np.int32),
                    "s2_cell": s2,
                    "hex_cell": hx,
                    "feature_minzoom": pdf["feature_minzoom"].to_numpy(),
                }
            )

    sch = T.StructType(
        [
            T.StructField("tile_x", T.IntegerType()),
            T.StructField("tile_y", T.IntegerType()),
            T.StructField("s2_cell", T.LongType()),
            T.StructField("hex_cell", T.LongType()),
            T.StructField("feature_minzoom", T.IntegerType()),
        ]
    )
    cols = ["minx", "maxx", "miny", "maxy", "feature_minzoom"]
    per_feat = stamped.select(*cols).mapInPandas(rollup, schema=sch)
    return (
        per_feat.groupBy("tile_x", "tile_y")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.when(F.col("feature_minzoom") <= z, 1).otherwise(0)).alias(
                "n_survive"
            ),
            F.countDistinct("s2_cell").alias("n_s2_cells"),
            F.countDistinct("hex_cell").alias("n_hex_cells"),
        )
        .orderBy(F.desc("n_features"), "tile_x", "tile_y")
    )
