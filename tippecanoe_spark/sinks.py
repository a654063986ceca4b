"""Tile sinks: mbtiles (SQLite), dirtiles (z/x/y.pbf), tileset metadata.

The cluster-native sink is the parquet/Iceberg tiles table written per
zoom by :mod:`tippecanoe_spark.pyramid` (SURVEY §1.4: ``(z,x,y,tile)``).
mbtiles / dirtiles are *export* steps run driver-side over that table —
the same split the reference's SQLite writer implies (mbtiles.cpp:50-85
takes a lock per insert; a distributed writer would serialize there
anyway).

mbtiles specifics mirrored from the reference (mbtiles.cpp):
- ``map``/``images`` split with content-addressed tile dedup
  (mbtiles_write_tile semantics) — identical tile bytes stored once;
- TMS y-flip (row = 2^z - 1 - y);
- ``metadata`` table with name/format/bounds/center/zoom rows and the
  ``json`` blob carrying vector_layers + tilestats (E5, T35).
"""

from __future__ import annotations

import hashlib
import json
import os
import sqlite3
from collections import Counter, defaultdict

from pyspark.sql import DataFrame

from . import mvt
from .proj import world_to_lonlat


def tilestats(tiles_rows) -> dict:
    """Per-layer per-attribute type/value histograms (T35,
    mbtiles.cpp:206-300) with the reference's caps: 1000 attributes,
    1000 sample values, 100 per attribute."""
    layers: dict[str, dict] = {}
    for row in tiles_rows:
        for layer in mvt.decode_tile(bytes(row["tile"])):
            st = layers.setdefault(
                layer["name"],
                {"count": 0, "geometry": Counter(), "attribs": defaultdict(Counter)},
            )
            for feat in layer["features"]:
                st["count"] += 1
                st["geometry"][feat["type"]] += 1
                for k, v in feat["attrs"].items():
                    if len(st["attribs"]) >= 1000 and k not in st["attribs"]:
                        continue
                    vals = st["attribs"][k]
                    if len(vals) < 100:
                        vals[json.dumps(v, default=str)] += 1
    geom_names = {1: "Point", 2: "LineString", 3: "Polygon"}
    out_layers = []
    for name, st in layers.items():
        attrs = []
        for k, vals in list(st["attribs"].items())[:1000]:
            parsed = [json.loads(s) for s in vals]
            types = {"string" if isinstance(p, str) else "boolean" if isinstance(p, bool) else "number" for p in parsed}
            attrs.append(
                {
                    "attribute": k,
                    "count": len(vals),
                    "type": sorted(types)[0] if len(types) == 1 else "mixed",
                    "values": sorted(parsed, key=lambda p: json.dumps(p, default=str))[:100],
                }
            )
        dominant = st["geometry"].most_common(1)[0][0] if st["geometry"] else 1
        out_layers.append(
            {
                "layer": name,
                "count": st["count"],
                "geometry": geom_names.get(dominant, "Unknown"),
                "attributeCount": len(attrs),
                "attributes": attrs,
            }
        )
    return {"layerCount": len(out_layers), "layers": out_layers}


def make_metadata(
    name: str,
    tiles_rows,
    minzoom: int,
    maxzoom: int,
    bounds: tuple[float, float, float, float] | None = None,
    with_tilestats: bool = True,
) -> dict:
    """name/format/bounds/center/zooms + json(vector_layers, tilestats)
    (make_metadata, mbtiles.cpp:668+; bounds logic main.cpp:2795-2829)."""
    layer_keys: dict[str, dict[str, str]] = {}
    for row in tiles_rows:
        for layer in mvt.decode_tile(bytes(row["tile"])):
            keys = layer_keys.setdefault(layer["name"], {})
            for feat in layer["features"]:
                for k, v in feat["attrs"].items():
                    t = (
                        "Boolean"
                        if isinstance(v, bool)
                        else "Number"
                        if isinstance(v, (int, float))
                        else "String"
                    )
                    keys.setdefault(k, t)
    vector_layers = [
        {
            "id": name_,
            "description": "",
            "minzoom": minzoom,
            "maxzoom": maxzoom,
            "fields": fields,
        }
        for name_, fields in sorted(layer_keys.items())
    ]
    if bounds is None:
        bounds = (-180.0, -85.05112877980659, 180.0, 85.05112877980659)
    w, s, e, n = bounds
    meta = {
        "name": name,
        "format": "pbf",
        "type": "overlay",
        "version": "2",
        "minzoom": str(minzoom),
        "maxzoom": str(maxzoom),
        "bounds": f"{w},{s},{e},{n}",
        "center": f"{(w + e) / 2},{(s + n) / 2},{maxzoom}",
        "json": json.dumps(
            {"vector_layers": vector_layers}
            | ({"tilestats": tilestats(tiles_rows)} if with_tilestats else {})
        ),
    }
    return meta


def bounds_from_features(features: DataFrame) -> tuple[float, float, float, float]:
    from pyspark.sql import functions as F

    row = features.agg(
        F.min("minx").alias("minx"), F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
    ).collect()[0]
    if row["minx"] is None:
        return (-180.0, -85.05112877980659, 180.0, 85.05112877980659)
    import numpy as np

    lon0, lat1 = world_to_lonlat(np.array([row["minx"]]), np.array([row["miny"]]))
    lon1, lat0 = world_to_lonlat(np.array([row["maxx"]]), np.array([row["maxy"]]))
    return (float(lon0[0]), float(lat0[0]), float(lon1[0]), float(lat1[0]))


def write_mbtiles(
    path: str,
    tiles_rows,
    metadata: dict,
) -> int:
    """Driver-side mbtiles export with content-addressed dedup.  Returns
    the number of tile rows written."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("CREATE TABLE metadata (name text, value text)")
    cur.execute(
        "CREATE TABLE map (zoom_level integer, tile_column integer,"
        " tile_row integer, tile_id text)"
    )
    cur.execute("CREATE TABLE images (tile_id text, tile_data blob)")
    n = 0
    seen: set[str] = set()
    for row in tiles_rows:
        data = bytes(row["tile"])
        tid = hashlib.sha256(data).hexdigest()[:24]
        if tid not in seen:
            seen.add(tid)
            cur.execute("INSERT INTO images VALUES (?, ?)", (tid, data))
        flipped = (1 << row["z"]) - 1 - row["y"]
        cur.execute(
            "INSERT INTO map VALUES (?, ?, ?, ?)", (row["z"], row["x"], flipped, tid)
        )
        n += 1
    for k, v in metadata.items():
        cur.execute("INSERT INTO metadata VALUES (?, ?)", (k, str(v)))
    cur.execute(
        "CREATE VIEW tiles AS SELECT map.zoom_level, map.tile_column,"
        " map.tile_row, images.tile_data FROM map JOIN images"
        " ON images.tile_id = map.tile_id"
    )
    cur.execute(
        "CREATE UNIQUE INDEX map_index ON map (zoom_level, tile_column, tile_row)"
    )
    con.commit()
    con.close()
    return n


def read_mbtiles(path: str) -> list[dict]:
    """tiles view → [{z,x,y,tile}] with the y-flip undone (S10 role)."""
    con = sqlite3.connect(path)
    rows = []
    for z, x, row_y, data in con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ):
        rows.append({"z": z, "x": x, "y": (1 << z) - 1 - row_y, "tile": data})
    con.close()
    return rows


def write_dirtiles(out_dir: str, tiles_rows, metadata: dict) -> int:
    """z/x/y.pbf layout + metadata.json (dirtiles.cpp role)."""
    n = 0
    for row in tiles_rows:
        d = os.path.join(out_dir, str(row["z"]), str(row["x"]))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{row['y']}.pbf"), "wb") as fh:
            fh.write(bytes(row["tile"]))
        n += 1
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(metadata, fh, indent=2)
    return n


def enumerate_tiles(tiles: DataFrame) -> DataFrame:
    """S11: list z/x/y present."""
    return tiles.select("z", "x", "y").orderBy("z", "x", "y")
