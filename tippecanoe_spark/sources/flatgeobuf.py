"""FlatGeobuf source (S4): .fgb files → the canonical feature relation.

The reference decodes with the official flatbuffers headers and skips the
packed Hilbert R-tree by computing its size (flatgeobuf.cpp:361-405);
this module re-derives the same from the PUBLIC FlatGeobuf spec
(flatgeobuf.org, header.fbs/feature.fbs) with a minimal flatbuffers
table reader — magic, size-prefixed header, optional index skip, then
size-prefixed feature tables whose properties blob is the documented
(column_index:uint16, value) packed encoding.

Parallelism is per file (Spark binaryFile source); the reference's
per-feature thread fan-out maps to Spark splitting many .fgb inputs
across tasks.  A single huge .fgb parses on one task — same limit as a
single whole-file FeatureCollection (SURVEY S1 note).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..config import TilingConfig
from ..features import FEATURE_SCHEMA
from .geojson import feature_to_rows

MAGIC = b"fgb"

# GeometryType enum (header.fbs)
_GEOM_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
    7: "GeometryCollection",
}

# ColumnType enum (header.fbs)
_COL_FMT = {
    0: ("b", 1), 1: ("B", 1), 2: ("?", 1), 3: ("h", 2), 4: ("H", 2),
    5: ("i", 4), 6: ("I", 4), 7: ("q", 8), 8: ("Q", 8),
    9: ("f", 4), 10: ("d", 8),
}
_COL_STRINGISH = {11, 12, 13}  # String, Json, DateTime
_COL_BINARY = 14


class _Table:
    """Minimal flatbuffers table accessor (public wire format)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        soff = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soff
        self.vt_len = struct.unpack_from("<H", buf, self.vt)[0]

    def _field_off(self, fid: int) -> int:
        slot = 4 + 2 * fid
        if slot + 2 > self.vt_len:
            return 0
        rel = struct.unpack_from("<H", self.buf, self.vt + slot)[0]
        return self.pos + rel if rel else 0

    def scalar(self, fid: int, fmt: str, default=0):
        off = self._field_off(fid)
        if not off:
            return default
        return struct.unpack_from("<" + fmt, self.buf, off)[0]

    def _indirect(self, off: int) -> int:
        return off + struct.unpack_from("<I", self.buf, off)[0]

    def string(self, fid: int) -> str | None:
        off = self._field_off(fid)
        if not off:
            return None
        p = self._indirect(off)
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def vector(self, fid: int) -> tuple[int, int]:
        """(element start, count) or (0, 0)."""
        off = self._field_off(fid)
        if not off:
            return 0, 0
        p = self._indirect(off)
        n = struct.unpack_from("<I", self.buf, p)[0]
        return p + 4, n

    def vector_of_tables(self, fid: int) -> list["_Table"]:
        start, n = self.vector(fid)
        out = []
        for i in range(n):
            o = start + 4 * i
            out.append(_Table(self.buf, o + struct.unpack_from("<I", self.buf, o)[0]))
        return out

    def table(self, fid: int) -> "_Table | None":
        off = self._field_off(fid)
        if not off:
            return None
        return _Table(self.buf, self._indirect(off))

    def doubles(self, fid: int) -> np.ndarray:
        start, n = self.vector(fid)
        if n == 0:
            return np.empty(0, dtype=np.float64)
        return np.frombuffer(self.buf, dtype="<f8", count=n, offset=start)

    def uints(self, fid: int) -> np.ndarray:
        start, n = self.vector(fid)
        if n == 0:
            return np.empty(0, dtype=np.uint32)
        return np.frombuffer(self.buf, dtype="<u4", count=n, offset=start)


def _index_size(n_items: int, node_size: int) -> int:
    """Packed Hilbert R-tree byte size — the skip computation of
    flatgeobuf.cpp:361-384 (40 bytes per node)."""
    if node_size < 2 or n_items == 0:
        return 0
    n = n_items
    num_nodes = n
    while n != 1:
        n = (n + node_size - 1) // node_size
        num_nodes += n
    return num_nodes * 40


def _geometry_to_geojson(g: _Table, gtype: int) -> dict | None:
    t = g.scalar(6, "B", 0) or gtype
    xy = g.doubles(1)
    ends = g.uints(0)
    pts = xy.reshape(-1, 2)

    def rings() -> list:
        if len(ends) == 0:
            return [pts.tolist()]
        out, prev = [], 0
        for e in ends:
            out.append(pts[prev : int(e)].tolist())
            prev = int(e)
        return out

    name = _GEOM_NAMES.get(t)
    if name == "Point":
        return {"type": "Point", "coordinates": pts[0].tolist()}
    if name == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": pts.tolist()}
    if name == "LineString":
        return {"type": "LineString", "coordinates": pts.tolist()}
    if name == "MultiLineString":
        return {"type": "MultiLineString", "coordinates": rings()}
    if name == "Polygon":
        return {"type": "Polygon", "coordinates": rings()}
    if name == "MultiPolygon":
        # parts vector of sub-geometries (feature.fbs)
        parts = g.vector_of_tables(7)
        if parts:
            return {
                "type": "MultiPolygon",
                "coordinates": [
                    _geometry_to_geojson(p, 3)["coordinates"] for p in parts
                ],
            }
        return {"type": "MultiPolygon", "coordinates": [rings()]}
    if name == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [
                _geometry_to_geojson(p, 0) for p in g.vector_of_tables(7)
            ],
        }
    return None


def _decode_properties(blob: bytes, columns: list[tuple[str, int]]) -> dict:
    """Packed (uint16 column index, typed value) stream (feature.fbs
    docs; numbers keep full precision via repr-style rendering that
    matches the reference's milo dtoa for integers)."""
    out: dict = {}
    i = 0
    n = len(blob)
    while i + 2 <= n:
        ci = struct.unpack_from("<H", blob, i)[0]
        i += 2
        name, ctype = columns[ci]
        if ctype in _COL_FMT:
            fmt, size = _COL_FMT[ctype]
            (v,) = struct.unpack_from("<" + fmt, blob, i)
            i += size
            if ctype == 2:
                out[name] = bool(v)
            elif ctype == 9:  # float32 — render at float precision
                out[name] = float(np.float32(v))
            else:
                out[name] = v
        elif ctype in _COL_STRINGISH:
            ln = struct.unpack_from("<I", blob, i)[0]
            i += 4
            out[name] = blob[i : i + ln].decode("utf-8")
            i += ln
        elif ctype == _COL_BINARY:
            ln = struct.unpack_from("<I", blob, i)[0]
            i += 4 + ln  # binary attributes are not representable in MVT
        else:
            break
    return out


def parse_flatgeobuf(data: bytes) -> tuple[str, list[dict]]:
    """.fgb bytes → (layer name, GeoJSON-style feature dicts)."""
    if data[:3] != MAGIC or data[4:7] != MAGIC:
        raise ValueError("not a FlatGeobuf file")
    pos = 8
    (hlen,) = struct.unpack_from("<I", data, pos)
    pos += 4
    header = _Table(data, pos + struct.unpack_from("<I", data, pos)[0])
    name = header.string(0) or "layer0"
    gtype = header.scalar(2, "B", 0)
    cols = [
        (c.string(0) or f"col{i}", c.scalar(1, "B", 0))
        for i, c in enumerate(header.vector_of_tables(7))
    ]
    n_features = header.scalar(8, "Q", 0)
    node_size = header.scalar(9, "H", 16)
    pos += hlen
    pos += _index_size(n_features, node_size)

    feats = []
    while pos + 4 <= len(data):
        (flen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        f = _Table(data, pos + struct.unpack_from("<I", data, pos)[0])
        geom_t = f.table(0)
        props_start, props_n = f.vector(1)
        props = (
            _decode_properties(data[props_start : props_start + props_n], cols)
            if props_n
            else {}
        )
        geometry = _geometry_to_geojson(geom_t, gtype) if geom_t else None
        if geometry is not None:
            feats.append(
                {"type": "Feature", "geometry": geometry, "properties": props}
            )
        pos += flen
    return name, feats


def read_flatgeobuf(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    cfg: TilingConfig | None = None,
) -> DataFrame:
    """FlatGeobuf file(s) → canonical feature DataFrame."""
    gscale = (
        max(32 - (cfg.full_detail + cfg.maxzoom), 0) if cfg is not None else 0
    )
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                lname, feats = parse_flatgeobuf(bytes(content))
                use_layer = layer or lname
                for i, f in enumerate(feats):
                    rows.extend(feature_to_rows(f, i, use_layer, p, gscale))
            if rows:
                yield pd.DataFrame(rows)

    return binary.mapInPandas(gen, schema=FEATURE_SCHEMA)
