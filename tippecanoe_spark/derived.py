"""Shared helpers for the oracle-backed query suite: deterministic
lon/lat derivation from integer keys and Web-Mercator world-coordinate
expressions, in both Catalyst and ANSI-SQL form (identical closed forms
so Spark and DuckDB agree bit-for-bit on integer outputs)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WORLD = float(1 << 32)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_lonlat_cols(key: Column) -> tuple[Column, Column]:
    lon = ((key * 7919) % 360000) / 1000.0 - 180.0
    lat = ((key * 104729) % 164000) / 1000.0 - 82.0
    return lon, lat


DERIVED_LONLAT_SQL = (
    "((({k} * 7919) % 360000) / 1000.0 - 180.0)",
    "((({k} * 104729) % 164000) / 1000.0 - 82.0)",
)


def world_xy_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Web-Mercator world coords (2**32 grid) as Catalyst expressions —
    formula identical to proj.lonlat_to_world (projection.cpp:22-65)."""
    lat_r = F.radians(lat)
    # floor(v + 0.5) = C std::round on this positive domain
    # (projection.cpp:60-61; proj._c_round is the numpy twin)
    x = F.floor((lon + 180.0) / 360.0 * WORLD + 0.5).cast("long")
    y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / float(np.pi)) / 2.0 * WORLD
        + 0.5
    ).cast("long")
    return x, y


def world_xy_sql(lon_s: str, lat_s: str) -> tuple[str, str]:
    x = f"CAST(floor(({lon_s} + 180.0) / 360.0 * {WORLD!r} + 0.5) AS BIGINT)"
    y = (
        f"CAST(floor((1.0 - ln(tan(radians({lat_s})) + 1.0 / cos(radians({lat_s})))"
        f" / pi()) / 2.0 * {WORLD!r} + 0.5) AS BIGINT)"
    )
    return x, y
