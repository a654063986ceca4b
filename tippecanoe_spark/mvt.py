"""Mapbox Vector Tile (MVT) encoder / decoder — pure-Python protobuf wire
format, no protobuf runtime dependency.

Implements the public vector_tile spec 2.1 (the same .proto the reference
embeds at vector_tile.proto:1; assembly semantics studied from
mvt.cpp:325-500 and tile.cpp:2614-2684, re-implemented from the wire spec):

- Tile { repeated Layer layers = 3 }
- Layer { version=15(=2), name=1, repeated Feature features=2,
          repeated string keys=3, repeated Value values=4, extent=5 }
- Feature { id=1, packed tags=2, type=3, packed geometry=4 }
- Value { string=1, float=2, double=3, int=4, uint=5, sint=6, bool=7 }
- geometry stream: (count<<3)|cmd with MOVETO=1 LINETO=2 CLOSEPATH=7 and
  zigzag-encoded coordinate deltas (mvt.cpp:432-460 semantics).

Key/value constant pools are deduplicated per layer (the reference uses a
65536-slot hash, mvt.hpp:225-226; a dict gives identical output order:
first-seen wins).

The encoder takes features already scaled to tile-local integer
coordinates (0..extent plus buffer overhang).  The decoder exists for
tests / tile-join / overzoom (decode.cpp:1-668 role).
"""

from __future__ import annotations

import gzip as _gzip
import struct
from typing import Any, Iterable

GEOM_POINT, GEOM_LINE, GEOM_POLYGON = 1, 2, 3
OP_MOVETO, OP_LINETO, OP_CLOSEPATH = 1, 2, 7


# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

def _varint(buf: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(buf: bytearray, field: int, wire: int) -> None:
    _varint(buf, (field << 3) | wire)


def _bytes_field(buf: bytearray, field: int, payload: bytes) -> None:
    _tag(buf, field, 2)
    _varint(buf, len(payload))
    buf += payload


# ---------------------------------------------------------------------------
# Value encoding (mvt.hpp:67-78 type system)
# ---------------------------------------------------------------------------

def encode_value(v: Any) -> bytes:
    """Typed attribute value → Value message bytes.  Strings stay strings;
    bools/ints/floats map to the matching variant (serial_val rendering,
    serial.hpp:36-52: numbers arrive as strings and are re-typed here)."""
    buf = bytearray()
    if isinstance(v, bool):
        _tag(buf, 7, 0)
        _varint(buf, 1 if v else 0)
    elif isinstance(v, int):
        if v >= 0:
            _tag(buf, 5, 0)
            _varint(buf, v)
        else:
            _tag(buf, 6, 0)
            _varint(buf, _zigzag(v) & 0xFFFFFFFFFFFFFFFF)
    elif isinstance(v, float):
        _tag(buf, 3, 1)
        buf += struct.pack("<d", v)
    else:
        s = str(v)
        # numeric-looking strings re-typed (tile-join/serial_val behavior)
        _bytes_field(buf, 1, s.encode("utf-8"))
    return bytes(buf)


def coerce_string_value(s: str) -> Any:
    """serial_val string → typed python value: int if integral, float if
    numeric, bool for true/false, else string (serial.cpp:924-958 spirit)."""
    if s == "true":
        return True
    if s == "false":
        return False
    try:
        i = int(s)
        if -(2**63) <= i < 2**64:
            return i
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


# ---------------------------------------------------------------------------
# geometry command stream
# ---------------------------------------------------------------------------

def encode_geometry(cmds: Iterable[tuple[int, int, int]]) -> list[int]:
    """[(op,x,y)...] in tile coords → packed uint32 command stream.
    Runs of identical ops are length-prefixed; coords are zigzag deltas
    from the running cursor (mvt.cpp:432-460 semantics)."""
    out: list[int] = []
    cmds = list(cmds)
    px = py = 0
    i = 0
    n = len(cmds)
    while i < n:
        op = cmds[i][0]
        j = i
        while j < n and cmds[j][0] == op:
            j += 1
        run = j - i
        out.append((run << 3) | op)
        if op != OP_CLOSEPATH:
            for k in range(i, j):
                _, x, y = cmds[k]
                out.append(_zigzag(x - px) & 0xFFFFFFFF)
                out.append(_zigzag(y - py) & 0xFFFFFFFF)
                px, py = x, y
        i = j
    return out


def decode_geometry(stream: list[int]) -> list[tuple[int, int, int]]:
    cmds: list[tuple[int, int, int]] = []
    px = py = 0
    i = 0
    n = len(stream)
    while i < n:
        word = stream[i]
        i += 1
        op = word & 7
        run = word >> 3
        if op == OP_CLOSEPATH:
            cmds.extend((OP_CLOSEPATH, 0, 0) for _ in range(run))
            continue
        for _ in range(run):
            px += _unzigzag(stream[i])
            py += _unzigzag(stream[i + 1])
            i += 2
            cmds.append((op, px, py))
    return cmds


# ---------------------------------------------------------------------------
# layer / tile assembly
# ---------------------------------------------------------------------------

class LayerBuilder:
    """Accumulates features for one named layer with key/value interning."""

    def __init__(self, name: str, extent: int = 4096, version: int = 2):
        self.name = name
        self.extent = extent
        self.version = version
        self.keys: list[str] = []
        self._key_ix: dict[str, int] = {}
        self.values: list[bytes] = []
        self._val_ix: dict[bytes, int] = {}
        self.features: list[bytes] = []

    def _intern_key(self, k: str) -> int:
        ix = self._key_ix.get(k)
        if ix is None:
            ix = len(self.keys)
            self.keys.append(k)
            self._key_ix[k] = ix
        return ix

    def _intern_value(self, v: Any) -> int:
        enc = encode_value(v)
        ix = self._val_ix.get(enc)
        if ix is None:
            ix = len(self.values)
            self.values.append(enc)
            self._val_ix[enc] = ix
        return ix

    def add_feature(
        self,
        geom_type: int,
        cmds: Iterable[tuple[int, int, int]],
        attrs: dict[str, Any] | None = None,
        feature_id: int | None = None,
    ) -> None:
        buf = bytearray()
        if feature_id is not None and feature_id >= 0:
            _tag(buf, 1, 0)
            _varint(buf, feature_id)
        if attrs:
            tags = bytearray()
            for k, v in attrs.items():
                if v is None:
                    continue
                _varint(tags, self._intern_key(k))
                _varint(tags, self._intern_value(v))
            _bytes_field(buf, 2, bytes(tags))
        _tag(buf, 3, 0)
        _varint(buf, geom_type)
        geom = bytearray()
        for word in encode_geometry(cmds):
            _varint(geom, word)
        _bytes_field(buf, 4, bytes(geom))
        self.features.append(bytes(buf))

    def build(self) -> bytes:
        buf = bytearray()
        _tag(buf, 15, 0)
        _varint(buf, self.version)
        _bytes_field(buf, 1, self.name.encode("utf-8"))
        for f in self.features:
            _bytes_field(buf, 2, f)
        for k in self.keys:
            _bytes_field(buf, 3, k.encode("utf-8"))
        for v in self.values:
            _bytes_field(buf, 4, v)
        _tag(buf, 5, 0)
        _varint(buf, self.extent)
        return bytes(buf)


def encode_tile(layers: Iterable[LayerBuilder]) -> bytes:
    buf = bytearray()
    for layer in layers:
        _bytes_field(buf, 3, layer.build())
    return bytes(buf)


def gzip_tile(tile: bytes, level: int = 6) -> bytes:
    """Deterministic gzip (mtime=0) — tile compression (compression.cpp)."""
    return _gzip.compress(tile, compresslevel=level, mtime=0)


def gunzip_tile(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return _gzip.decompress(data)
    return data


# ---------------------------------------------------------------------------
# decoder (tests / tile-join / overzoom)
# ---------------------------------------------------------------------------

def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = data[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _iter_fields(data: bytes):
    i = 0
    n = len(data)
    while i < n:
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(data, i)
            yield field, v
        elif wire == 2:
            ln, i = _read_varint(data, i)
            yield field, data[i : i + ln]
            i += ln
        elif wire == 5:
            yield field, data[i : i + 4]
            i += 4
        elif wire == 1:
            yield field, data[i : i + 8]
            i += 8
        else:
            raise ValueError(f"bad wire type {wire}")


def decode_value(data: bytes) -> Any:
    for field, v in _iter_fields(data):
        if field == 1:
            return v.decode("utf-8")
        if field == 2:
            return struct.unpack("<f", v)[0]
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 4:
            return v - (1 << 64) if v >= 1 << 63 else v
        if field == 5:
            return v
        if field == 6:
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    return None


def decode_tile(data: bytes) -> list[dict]:
    """Tile bytes → [{name, extent, version, features:[{id,type,attrs,cmds}]}]."""
    data = gunzip_tile(data)
    layers = []
    for field, payload in _iter_fields(data):
        if field != 3:
            continue
        name, extent, version = "", 4096, 2
        keys: list[str] = []
        values: list[Any] = []
        raw_feats: list[bytes] = []
        for f, v in _iter_fields(payload):
            if f == 1:
                name = v.decode("utf-8")
            elif f == 2:
                raw_feats.append(v)
            elif f == 3:
                keys.append(v.decode("utf-8"))
            elif f == 4:
                values.append(decode_value(v))
            elif f == 5:
                extent = v
            elif f == 15:
                version = v
        feats = []
        for rf in raw_feats:
            fid, gtype, attrs, cmds = None, 0, {}, []
            for f, v in _iter_fields(rf):
                if f == 1:
                    fid = v
                elif f == 2:
                    tags = []
                    i = 0
                    while i < len(v):
                        t, i = _read_varint(v, i)
                        tags.append(t)
                    for a, b in zip(tags[::2], tags[1::2]):
                        attrs[keys[a]] = values[b]
                elif f == 3:
                    gtype = v
                elif f == 4:
                    stream = []
                    i = 0
                    while i < len(v):
                        w, i = _read_varint(v, i)
                        stream.append(w)
                    cmds = decode_geometry(stream)
            feats.append({"id": fid, "type": gtype, "attrs": attrs, "cmds": cmds})
        layers.append(
            {"name": name, "extent": extent, "version": version, "features": feats}
        )
    return layers
