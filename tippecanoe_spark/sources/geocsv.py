"""CSV point source (S6): header-sniffed lat/lon columns → point
features (geocsv.cpp:14-141 semantics).

- lat/lon column detection: case-insensitive exact/prefix match on
  latitude/longitude/lat/lon/lng/x/y (geocsv.cpp:40-67 spirit).
- every other column becomes an attribute; numeric-looking values keep
  their numeric rendering (geocsv.cpp:100-108 type sniff is deferred to
  the MVT encoder's coerce step, identical outcome).
- the whole thing is Catalyst + one Arrow kernel for projection/index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import proj
from ..features import FEATURE_SCHEMA, pack_cmds

_LAT_NAMES = ("latitude", "lat", "y")
_LON_NAMES = ("longitude", "lon", "lng", "long", "x")


def _type_csv_value(v: str | None, empty_null: bool) -> str | None:
    """geocsv.cpp:96-108 typing on an already-dequoted value: JSON
    numbers stay bare (the MVT encoder re-types them numeric), empty →
    "" string or dropped (--empty-csv-columns-are-null), everything else
    string-tagged."""
    from ..csvutil import csv_is_number
    from .geojson import STRING_TAG

    if v is None:
        v = ""
    if csv_is_number(v):
        return v
    if v == "" and empty_null:
        return None
    return STRING_TAG + v


def _find_col(cols: list[str], names: tuple[str, ...]) -> str:
    lower = {c.lower(): c for c in cols}
    for n in names:
        if n in lower:
            return lower[n]
    for c in cols:
        for n in names:
            if c.lower().startswith(n):
                return c
    raise ValueError(f"no column matching {names} in {cols}")


def read_geocsv(
    spark: SparkSession, path: str, layer: str | None = None,
    empty_columns_null: bool = False,
) -> DataFrame:
    """CSV file(s) → canonical point-feature DataFrame.

    Value typing follows geocsv.cpp:96-108: dequote first, then JSON
    number rules decide number vs string (quoted numerics ARE numbers on
    this input path, unlike tile-join's CSV join); empty fields are ""
    strings, or dropped with ``empty_columns_null``
    (--empty-csv-columns-are-null).  Non-number values are STRING_TAGged
    so the MVT encoder never re-types them."""
    raw = spark.read.csv(
        path, header=True, inferSchema=False,
        escape='"', ignoreLeadingWhiteSpace=True,
    )
    lat_col = _find_col(raw.columns, _LAT_NAMES)
    lon_col = _find_col(raw.columns, _LON_NAMES)
    attr_cols = [c for c in raw.columns if c not in (lat_col, lon_col)]
    layer = layer or "layer0"

    prepared = raw.select(
        F.col(lon_col).cast("double").alias("_lon"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.create_map(
            *[x for c in attr_cols for x in (F.lit(c), F.col(c))]
        ).alias("_attrs") if attr_cols else F.create_map().alias("_attrs"),
        F.monotonically_increasing_id().alias("_seq"),
    ).filter(F.col("_lon").isNotNull() & F.col("_lat").isNotNull())

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x, y = proj.lonlat_to_world(
                pdf["_lon"].to_numpy(), pdf["_lat"].to_numpy()
            )
            index = proj.encode_index(x, y)
            seq = pdf["_seq"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    # negative synthetic key: unique for joins, but the
                    # MVT encoder only emits ids >= 0 — the reference
                    # writes no id for CSV input (geocsv.cpp has_id=false)
                    "feature_id": -seq - 1,
                    "url": np.repeat(str(path), len(pdf)),
                    "layer": np.repeat(layer, len(pdf)),
                    "geom_type": np.ones(len(pdf), dtype=np.int32),
                    "geometry": [
                        pack_cmds([(1, int(a), int(b))]) for a, b in zip(x, y)
                    ],
                    "attrs": [
                        {
                            k: tv
                            for k, v in (m or {}).items()
                            for tv in (_type_csv_value(v, empty_columns_null),)
                            if tv is not None
                        }
                        for m in pdf["_attrs"]
                    ],
                    "index": index,
                    "extent": np.zeros(len(pdf), dtype=np.int64),
                    "seq": seq,
                    "minx": x, "miny": y, "maxx": x, "maxy": y,
                }
            )

    return prepared.mapInPandas(gen, schema=FEATURE_SCHEMA)
