"""Geobuf source (S5): protobuf-encoded GeoJSON → the canonical feature
relation.

Implements the PUBLIC geobuf spec (github.com/mapbox/geobuf,
geobuf.proto) with the repo's own varint machinery — the reference's
parser is geobuf.cpp (584 LoC against protozero).  Wire layout:

  Data        { keys=1 rep string; dimensions=2; precision=3;
                feature_collection=4 | feature=5 | geometry=6 }
  FeatureCollection { features=1 rep Feature }
  Feature     { geometry=1; id=11 str | int_id=12 sint; values=13 rep
                Value; properties=14 packed uint pairs }
  Geometry    { type=1 enum; lengths=2 packed uint; coords=3 packed
                sint (delta per dimension, scaled 10^precision);
                geometries=4 rep Geometry }
  Value       { string=1 | double=2 | pos_int=3 | neg_int=4 | bool=5 |
                json=6 }

A matching encoder is included for round-trip tests (the reference
generates its geobuf fixtures with an external tool at test time, so no
committed .geobuf fixture exists to byte-compare against).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..config import TilingConfig
from ..features import FEATURE_SCHEMA
from .geojson import feature_to_rows

_GEOM_TYPES = [
    "Point", "MultiPoint", "LineString", "MultiLineString",
    "Polygon", "MultiPolygon", "GeometryCollection",
]


# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

def _rv(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _wv(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzz(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _rv(buf, i)
        fid, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _rv(buf, i)
            yield fid, v
        elif wt == 2:
            ln, i = _rv(buf, i)
            yield fid, buf[i : i + ln]
            i += ln
        elif wt == 5:
            yield fid, buf[i : i + 4]
            i += 4
        elif wt == 1:
            yield fid, buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(buf):
        v, i = _rv(buf, i)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_value(buf: bytes):
    for fid, v in _fields(buf):
        if fid == 1:
            return v.decode("utf-8")
        if fid == 2:
            return struct.unpack("<d", v)[0]
        if fid == 3:
            return v
        if fid == 4:
            return -v
        if fid == 5:
            return bool(v)
        if fid == 6:
            return json.loads(v.decode("utf-8"))
    return None


def _decode_geometry(buf: bytes, e: float, dim: int) -> dict | None:
    gtype = 0
    lengths: list[int] = []
    coords: list[int] = []
    subs: list[dict] = []
    for fid, v in _fields(buf):
        if fid == 1:
            gtype = v
        elif fid == 2:
            lengths = _packed_varints(v)
        elif fid == 3:
            coords = [_unzz(x) for x in _packed_varints(v)]
        elif fid == 4:
            g = _decode_geometry(v, e, dim)
            if g is not None:
                subs.append(g)
    name = _GEOM_TYPES[gtype]

    def line(vals: list[int]) -> list[list[float]]:
        arr = np.array(vals, dtype=np.int64).reshape(-1, dim)
        return (np.cumsum(arr, axis=0) / e)[:, :2].tolist()

    if name == "Point":
        return {"type": "Point", "coordinates": [c / e for c in coords[:2]]}
    if name == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": line(coords)}
    if name == "LineString":
        return {"type": "LineString", "coordinates": line(coords)}
    if name in ("MultiLineString", "Polygon"):
        if not lengths:
            parts = [line(coords)]
        else:
            parts, i = [], 0
            for ln in lengths:
                parts.append(line(coords[i : i + ln * dim]))
                i += ln * dim
        if name == "Polygon":
            # geobuf drops the closing vertex; re-close the rings
            parts = [p + [p[0]] for p in parts]
        return {"type": name, "coordinates": parts}
    if name == "MultiPolygon":
        # lengths: [n_polys, n_rings, ring_len...] nested spec
        if not lengths:
            return {"type": "MultiPolygon",
                    "coordinates": [[line(coords) + []]]}
        i = 0
        li = 1
        polys = []
        for _ in range(lengths[0]):
            n_rings = lengths[li]
            li += 1
            rings = []
            for _ in range(n_rings):
                ln = lengths[li]
                li += 1
                r = line(coords[i : i + ln * dim])
                rings.append(r + [r[0]])
                i += ln * dim
            polys.append(rings)
        return {"type": "MultiPolygon", "coordinates": polys}
    if name == "GeometryCollection":
        return {"type": "GeometryCollection", "geometries": subs}
    return None


def parse_geobuf(data: bytes) -> list[dict]:
    """Geobuf bytes → GeoJSON-style feature dicts."""
    keys: list[str] = []
    dim = 2
    precision = 6
    fc = feat = geom = None
    for fid, v in _fields(data):
        if fid == 1:
            keys.append(v.decode("utf-8"))
        elif fid == 2:
            dim = v
        elif fid == 3:
            precision = v
        elif fid == 4:
            fc = v
        elif fid == 5:
            feat = v
        elif fid == 6:
            geom = v
    e = float(10 ** precision)

    def decode_feature(buf: bytes) -> dict:
        geometry = None
        fid_val = None
        values: list = []
        props: list[int] = []
        for f, v in _fields(buf):
            if f == 1:
                geometry = _decode_geometry(v, e, dim)
            elif f == 11:
                fid_val = v.decode("utf-8")
            elif f == 12:
                fid_val = _unzz(v)
            elif f == 13:
                values.append(_decode_value(v))
            elif f == 14:
                props = _packed_varints(v)
        properties = {
            keys[props[i]]: values[props[i + 1]]
            for i in range(0, len(props), 2)
        }
        out = {"type": "Feature", "geometry": geometry, "properties": properties}
        if fid_val is not None:
            out["id"] = fid_val
        return out

    if fc is not None:
        return [
            decode_feature(v) for f, v in _fields(fc) if f == 1
        ]
    if feat is not None:
        return [decode_feature(feat)]
    if geom is not None:
        g = _decode_geometry(geom, e, dim)
        return [{"type": "Feature", "geometry": g, "properties": {}}] if g else []
    return []


# ---------------------------------------------------------------------------
# encode (for round-trip tests)
# ---------------------------------------------------------------------------

def _enc_field(out: bytearray, fid: int, payload: bytes) -> None:
    _wv(out, (fid << 3) | 2)
    _wv(out, len(payload))
    out += payload


def _enc_varint_field(out: bytearray, fid: int, v: int) -> None:
    _wv(out, fid << 3)
    _wv(out, v)


def _enc_geometry(geom: dict, e: int, dim: int = 2) -> bytes:
    out = bytearray()
    t = _GEOM_TYPES.index(geom["type"])
    _enc_varint_field(out, 1, t)

    def flat(coords, closing=False) -> list[int]:
        pts = [(round(c[0] * e), round(c[1] * e)) for c in coords]
        if closing and len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        deltas = []
        px = py = 0
        for x, y in pts:
            deltas += [x - px, y - py]
            px, py = x, y
        return deltas

    coords: list[int] = []
    lengths: list[int] = []
    if geom["type"] == "Point":
        coords = [round(c * e) for c in geom["coordinates"][:2]]
    elif geom["type"] in ("MultiPoint", "LineString"):
        coords = flat(geom["coordinates"])
    elif geom["type"] in ("MultiLineString", "Polygon"):
        closing = geom["type"] == "Polygon"
        parts = geom["coordinates"]
        acc = []
        prev = bytearray()
        px = py = 0
        for p in parts:
            pts = [(round(c[0] * e), round(c[1] * e)) for c in p]
            if closing and len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            lengths.append(len(pts))
            for x, y in pts:
                acc += [x - px, y - py]
                px, py = x, y
        coords = acc
        if len(parts) == 1:
            lengths = []
    elif geom["type"] == "MultiPolygon":
        polys = geom["coordinates"]
        lengths = [len(polys)]
        acc = []
        px = py = 0
        for rings in polys:
            lengths.append(len(rings))
            for r in rings:
                pts = [(round(c[0] * e), round(c[1] * e)) for c in r]
                if len(pts) > 1 and pts[0] == pts[-1]:
                    pts = pts[:-1]
                lengths.append(len(pts))
                for x, y in pts:
                    acc += [x - px, y - py]
                    px, py = x, y
        coords = acc
    if lengths:
        pk = bytearray()
        for v in lengths:
            _wv(pk, v)
        _enc_field(out, 2, bytes(pk))
    if coords:
        pk = bytearray()
        for v in coords:
            _wv(pk, _zz(v))
        _enc_field(out, 3, bytes(pk))
    return bytes(out)


def encode_geobuf(features: list[dict], precision: int = 6) -> bytes:
    """GeoJSON features → geobuf bytes (test encoder)."""
    e = 10 ** precision
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    feats_out = bytearray()
    for f in features:
        fo = bytearray()
        _enc_field(fo, 1, _enc_geometry(f["geometry"], e))
        values = bytearray()
        props: list[int] = []
        vcount = 0
        for k, v in (f.get("properties") or {}).items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vo = bytearray()
            if isinstance(v, bool):
                _enc_varint_field(vo, 5, int(v))
            elif isinstance(v, str):
                _enc_field(vo, 1, v.encode("utf-8"))
            elif isinstance(v, int):
                if v >= 0:
                    _enc_varint_field(vo, 3, v)
                else:
                    _enc_varint_field(vo, 4, -v)
            elif isinstance(v, float):
                _wv(vo, (2 << 3) | 1)
                vo += struct.pack("<d", v)
            else:
                _enc_field(vo, 6, json.dumps(v).encode("utf-8"))
            _enc_field(fo, 13, bytes(vo))
            props += [key_idx[k], vcount]
            vcount += 1
        if props:
            pk = bytearray()
            for v in props:
                _wv(pk, v)
            _enc_field(fo, 14, bytes(pk))
        if "id" in f:
            if isinstance(f["id"], int):
                _enc_varint_field(fo, 12, _zz(f["id"]))
            else:
                _enc_field(fo, 11, str(f["id"]).encode("utf-8"))
        _enc_field(feats_out, 1, bytes(fo))
    out = bytearray()
    for k in keys:
        _enc_field(out, 1, k.encode("utf-8"))
    _enc_varint_field(out, 3, precision)
    _enc_field(out, 4, bytes(feats_out))
    return bytes(out)


def read_geobuf(
    spark: SparkSession,
    path: str,
    layer: str = "layer0",
    cfg: TilingConfig | None = None,
) -> DataFrame:
    """Geobuf file(s) → canonical feature DataFrame."""
    gscale = (
        max(32 - (cfg.full_detail + cfg.maxzoom), 0) if cfg is not None else 0
    )
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, f in enumerate(parse_geobuf(bytes(content))):
                    rows.extend(feature_to_rows(f, i, layer, p, gscale))
            if rows:
                yield pd.DataFrame(rows)

    return binary.mapInPandas(gen, schema=FEATURE_SCHEMA)
