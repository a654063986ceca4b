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

import numpy as np

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


def _varint_bytes_slow(v: int) -> bytes:
    buf = bytearray()
    _varint(buf, v)
    return bytes(buf)


def _lazy_varint_table() -> list[bytes]:
    return [_varint_bytes_slow(i) for i in range(16384)]


_VARINT_BYTES = _lazy_varint_table()


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

_VALUE_MEMO: dict[tuple[type, Any], bytes] = {}


def encode_value(v: Any) -> bytes:
    """Typed attribute value → Value message bytes.  Strings stay strings;
    bools/ints/floats map to the matching variant (serial_val rendering,
    serial.hpp:36-52: numbers arrive as strings and are re-typed here).
    Memoized — attribute values repeat heavily across features and tiles,
    and the type key keeps True/1/1.0 distinct."""
    try:
        memo_key = (type(v), v)
        got = _VALUE_MEMO.get(memo_key)
        if got is not None:
            return got
    except TypeError:  # unhashable — encode directly
        memo_key = None
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
    out = bytes(buf)
    if memo_key is not None and len(_VALUE_MEMO) < 1_000_000:
        _VALUE_MEMO[memo_key] = out
    return out


_COERCE_MEMO: dict[str, Any] = {}


class ForcedString(str):
    """A value that must encode as mvt_string even when it looks numeric:
    accumulated concat/comma results (preserve_attribute emits
    mvt_string for the string ops regardless of content)."""


def coerce_string_value(s: str) -> Any:
    """serial_val string → typed python value: int if integral, float if
    numeric, bool for true/false, else string (serial.cpp:924-958 spirit).
    Memoized — serialized attr values repeat across features and tiles."""
    if type(s) is ForcedString:
        return str(s)
    got = _COERCE_MEMO.get(s)
    if got is None:
        got = _coerce_string_value(s)
        if len(_COERCE_MEMO) < 1_000_000:
            _COERCE_MEMO[s] = got
    return got


def _coerce_string_value(s: str) -> Any:
    if s.startswith("\x02"):
        # serial_val string-type tag (sources/geojson.py STRING_TAG): a
        # JSON string whose content looks numeric/boolean stays a string
        return s[1:]
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
# vectorized wire kernels (numpy command-stream codec)
#
# The geometry command stream is the engine's dominant constant factor:
# every tile encode, decode, tile-join merge and overzoom pass walks it.
# These kernels do zigzag/delta/varint as whole-array numpy ops — one
# bytes() per geometry instead of one Python iteration per vertex.
# Byte-identical to the scalar forms above (asserted in tests).
# ---------------------------------------------------------------------------

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def pack_varints(vals: np.ndarray) -> bytes:
    """uint64 array → concatenated LEB128 varints (protobuf packed field
    payload), fully vectorized: per-value byte counts via threshold
    compares, then ≤10 masked scatter passes into one output buffer."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        m = v >= np.uint64(1 << (7 * k))
        if not m.any():
            break
        nb += m
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    np.cumsum(nb[:-1], out=starts[1:])
    rem = v.copy()
    for k in range(10):
        mask = nb > k
        if not mask.any():
            break
        idx = starts[mask] + k
        byte = (rem[mask] & _U0x7F).astype(np.uint8)
        byte |= (nb[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = byte
        rem >>= _U7
    return out.tobytes()


def unpack_varints(data: bytes) -> np.ndarray:
    """Packed-varint payload → uint64 array, vectorized: value boundaries
    are bytes without the continuation bit; ≤10 masked gather passes."""
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    group = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos = np.arange(len(b), dtype=np.int64) - starts[group]
    payload = (b & 0x7F).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    for k in range(10):
        m = pos == k
        if not m.any():
            break
        vals[group[m]] |= payload[m] << np.uint64(7 * k)
    return vals


def zigzag_array(v: np.ndarray) -> np.ndarray:
    """int64 array → zigzag32 uint64 (coordinate deltas).

    Masks to 32 bits, matching both the scalar geometry path
    (encode_geometry: _zigzag & 0xFFFFFFFF) and the reference, which
    writes geometry parameters as zigzag32 via protozero uint32
    (mvt.cpp:432-460).  Deltas >= 2^31 (reachable at vardepth-confirm
    detail 30-z tiles) wrap identically on every path — see
    test_tiles.py zigzag-extreme property test.
    """
    v = v.astype(np.int64, copy=False)
    return (((v << 1) ^ (v >> 63)) & 0xFFFFFFFF).astype(np.uint64)


def unzigzag_array(v: np.ndarray) -> np.ndarray:
    u = v.astype(np.int64, copy=False)
    return (u >> 1) ^ -(u & 1)


def encode_geometry_arrays(
    ops: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """(ops, xs, ys) arrays → packed uint64 command-word stream.

    Same run-length + zigzag-delta output as encode_geometry (byte-
    identical through pack_varints), computed as array ops: run breaks
    via diff, cursor deltas via diff over the non-CLOSEPATH subsequence,
    interleave via a boolean scatter mask."""
    n = len(ops)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    ops = np.asarray(ops, dtype=np.int64)
    brk = np.flatnonzero(np.diff(ops) != 0) + 1
    starts = np.concatenate((np.zeros(1, dtype=np.int64), brk))
    ends = np.concatenate((brk, np.array([n], dtype=np.int64)))
    run_ops = ops[starts]
    runs = ends - starts
    cmd_words = ((runs << 3) | run_ops).astype(np.uint64)
    coord_mask = ops != OP_CLOSEPATH
    cx = np.asarray(xs, dtype=np.int64)[coord_mask]
    cy = np.asarray(ys, dtype=np.int64)[coord_mask]
    m = len(cx)
    dx = np.empty(m, dtype=np.int64)
    dy = np.empty(m, dtype=np.int64)
    if m:
        dx[0] = cx[0]
        dy[0] = cy[0]
        np.subtract(cx[1:], cx[:-1], out=dx[1:])
        np.subtract(cy[1:], cy[:-1], out=dy[1:])
    coords = np.empty(2 * m, dtype=np.uint64)
    coords[0::2] = zigzag_array(dx)
    coords[1::2] = zigzag_array(dy)
    # output slots: each run-group emits 1 cmd word + (2·run unless CLOSEPATH)
    contrib = np.where(run_ops == OP_CLOSEPATH, 1, 1 + 2 * runs)
    total = int(contrib.sum())
    out = np.empty(total, dtype=np.uint64)
    cmd_pos = np.empty(len(contrib), dtype=np.int64)
    cmd_pos[0] = 0
    np.cumsum(contrib[:-1], out=cmd_pos[1:])
    is_cmd = np.zeros(total, dtype=bool)
    is_cmd[cmd_pos] = True
    out[is_cmd] = cmd_words
    out[~is_cmd] = coords
    return out


def decode_geometry_arrays(
    words: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed command-word stream → (ops, xs, ys) absolute-coordinate
    arrays (CLOSEPATH rows carry 0,0 like the scalar decoder).  The only
    Python loop is over command RUNS (a handful per geometry); vertices
    are delta-decoded with one cumsum."""
    words = np.asarray(words, dtype=np.uint64)
    n = len(words)
    groups: list[tuple[int, int, int]] = []  # (op, run, coord_word_start)
    i = 0
    while i < n:
        w = int(words[i])
        op = w & 7
        run = w >> 3
        i += 1
        if op == OP_CLOSEPATH:
            groups.append((op, run, -1))
        else:
            groups.append((op, run, i))
            i += 2 * run
    total = sum(g[1] for g in groups)
    ops = np.empty(total, dtype=np.int64)
    xs = np.zeros(total, dtype=np.int64)
    ys = np.zeros(total, dtype=np.int64)
    coord_rows = np.zeros(total, dtype=bool)
    pos = 0
    coord_slices = []
    for op, run, cstart in groups:
        ops[pos : pos + run] = op
        if cstart >= 0:
            coord_rows[pos : pos + run] = True
            coord_slices.append(words[cstart : cstart + 2 * run])
        pos += run
    if coord_slices:
        cw = np.concatenate(coord_slices)
        dx = unzigzag_array(cw[0::2])
        dy = unzigzag_array(cw[1::2])
        xs[coord_rows] = np.cumsum(dx)
        ys[coord_rows] = np.cumsum(dy)
    return ops, xs, ys


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
        cmds = cmds if isinstance(cmds, list) else list(cmds)
        if len(cmds) >= 16:
            a = np.array(cmds, dtype=np.int64)
            payload = pack_varints(
                encode_geometry_arrays(a[:, 0], a[:, 1], a[:, 2])
            )
        else:
            geom = bytearray()
            vb = _VARINT_BYTES
            for word in encode_geometry(cmds):
                geom += vb[word] if word < 16384 else _varint_bytes_slow(word)
            payload = bytes(geom)
        self._append_feature(geom_type, payload, attrs, feature_id)

    def add_feature_arrays(
        self,
        geom_type: int,
        ops: np.ndarray,
        xs: np.ndarray,
        ys: np.ndarray,
        attrs: dict[str, Any] | None = None,
        feature_id: int | None = None,
    ) -> None:
        """Array-native add: geometry given as (ops, xs, ys) columns —
        the hot path for the stream kernel / tile-join / overzoom.
        Below ~16 commands the scalar encoder wins: the whole-array
        zigzag/delta/varint kernels cost ~10 numpy dispatches, which
        dwarfs a dozen Python loop iterations."""
        if len(ops) < 16:
            geom = bytearray()
            vb = _VARINT_BYTES
            for word in encode_geometry(
                zip(ops.tolist(), xs.tolist(), ys.tolist())
            ):
                geom += vb[word] if word < 16384 else _varint_bytes_slow(word)
            payload = bytes(geom)
        else:
            payload = pack_varints(encode_geometry_arrays(ops, xs, ys))
        self._append_feature(geom_type, payload, attrs, feature_id)

    def _append_feature(
        self,
        geom_type: int,
        geom_payload: bytes,
        attrs: dict[str, Any] | None,
        feature_id: int | None,
    ) -> None:
        buf = bytearray()
        if feature_id is not None and feature_id >= 0:
            _tag(buf, 1, 0)
            _varint(buf, feature_id)
        if attrs:
            tags = bytearray()
            vb = _VARINT_BYTES
            for k, v in attrs.items():
                if v is None:
                    continue
                ki = self._intern_key(k)
                vi = self._intern_value(v)
                # pool indices are small in practice — cached byte strings
                # skip the per-byte python varint loop
                tags += vb[ki] if ki < 16384 else _varint_bytes_slow(ki)
                tags += vb[vi] if vi < 16384 else _varint_bytes_slow(vi)
            _bytes_field(buf, 2, bytes(tags))
        _tag(buf, 3, 0)
        _varint(buf, geom_type)
        _bytes_field(buf, 4, geom_payload)
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


def _count_varints_at(payload_lens: list[int], joined: bytes) -> np.ndarray:
    """Per-payload varint counts for concatenated self-delimiting varint
    payloads (each payload ends on a value boundary, so word counts are
    the number of continuation-bit-clear bytes in each byte range)."""
    b = np.frombuffer(joined, dtype=np.uint8)
    cum_ends = np.concatenate(
        (np.zeros(1, dtype=np.int64), np.cumsum(b < 0x80))
    )
    bounds = np.cumsum(np.asarray(payload_lens, dtype=np.int64))
    at_bounds = cum_ends[bounds]
    counts = np.empty(len(payload_lens), dtype=np.int64)
    counts[0] = at_bounds[0]
    np.subtract(at_bounds[1:], at_bounds[:-1], out=counts[1:])
    return counts


def _decode_layer_features(
    raw_feats: list[bytes], keys: list[str], values: list[Any], arrays: bool
) -> list[dict]:
    """Whole-layer vectorized feature decode.

    Per-feature numpy calls on tiny buffers cost more than they save, so
    geometry and tag payloads from ALL features are concatenated, varint-
    unpacked in ONE numpy pass, and split back by per-payload word counts.
    The only remaining Python loops are per feature / per command run —
    never per vertex."""
    n = len(raw_feats)
    fids: list[int | None] = [None] * n
    gtypes = [0] * n
    tag_payloads: list[bytes] = [b""] * n
    geom_payloads: list[bytes] = [b""] * n
    for i, rf in enumerate(raw_feats):
        p = 0
        ln = len(rf)
        while p < ln:
            key, p = _read_varint(rf, p)
            f, wire = key >> 3, key & 7
            if wire == 0:
                v, p = _read_varint(rf, p)
                if f == 1:
                    fids[i] = v
                elif f == 3:
                    gtypes[i] = v
            elif wire == 2:
                sz, p = _read_varint(rf, p)
                if f == 2:
                    tag_payloads[i] = rf[p : p + sz]
                elif f == 4:
                    geom_payloads[i] = rf[p : p + sz]
                p += sz
            elif wire == 5:
                p += 4
            else:
                p += 8

    # ---- attrs: one unpack over all tag payloads
    attrs_per: list[dict] = [{} for _ in range(n)]
    joined_tags = b"".join(tag_payloads)
    if joined_tags:
        tag_counts = _count_varints_at([len(t) for t in tag_payloads], joined_tags)
        all_tags = unpack_varints(joined_tags).tolist()
        off = 0
        for i in range(n):
            c = int(tag_counts[i])
            if c:
                d = attrs_per[i]
                for j in range(off, off + c, 2):
                    d[keys[all_tags[j]]] = values[all_tags[j + 1]]
            off += c

    # ---- geometry: one unpack, then a per-run scan (runs ≪ vertices)
    joined_geom = b"".join(geom_payloads)
    words = unpack_varints(joined_geom).tolist() if joined_geom else []
    geom_counts = (
        _count_varints_at([len(g) for g in geom_payloads], joined_geom)
        if joined_geom
        else np.zeros(n, dtype=np.int64)
    )
    run_ops: list[int] = []
    run_lens: list[int] = []
    coord_starts: list[int] = []  # word index of first coord word per run
    rows_per_feat = np.zeros(n, dtype=np.int64)
    coords_per_feat = np.zeros(n, dtype=np.int64)
    w = 0
    for i in range(n):
        end = w + int(geom_counts[i])
        rows = 0
        coords = 0
        while w < end:
            word = words[w]
            op = word & 7
            run = word >> 3
            w += 1
            run_ops.append(op)
            run_lens.append(run)
            rows += run
            if op == OP_CLOSEPATH:
                coord_starts.append(-1)
            else:
                coord_starts.append(w)
                coords += run
                w += 2 * run
        rows_per_feat[i] = rows
        coords_per_feat[i] = coords

    total_rows = int(rows_per_feat.sum())
    ro = np.asarray(run_ops, dtype=np.int64)
    rl = np.asarray(run_lens, dtype=np.int64)
    ops_all = np.repeat(ro, rl)
    xs_all = np.zeros(total_rows, dtype=np.int64)
    ys_all = np.zeros(total_rows, dtype=np.int64)
    coord_rows = np.repeat(ro != OP_CLOSEPATH, rl)
    m = ro != OP_CLOSEPATH
    if m.any():
        # gather coordinate words: ranges [cstart, cstart+2·run) per run
        cs = np.asarray(coord_starts, dtype=np.int64)[m]
        cl = 2 * rl[m]
        tot = int(cl.sum())
        base = np.repeat(cs, cl)
        stops = np.cumsum(cl)
        local = np.arange(tot, dtype=np.int64) - np.repeat(stops - cl, cl)
        warr = np.asarray(words, dtype=np.uint64)
        cw = warr[base + local]
        dx = unzigzag_array(cw[0::2])
        dy = unzigzag_array(cw[1::2])
        # cursor resets per FEATURE: segmented cumsum over feature slices
        cx = np.cumsum(dx)
        cy = np.cumsum(dy)
        fstarts = np.concatenate(
            (np.zeros(1, dtype=np.int64), np.cumsum(coords_per_feat)[:-1])
        )
        nz = coords_per_feat > 0
        basex = np.zeros(len(cx) + 1, dtype=np.int64)
        basey = np.zeros(len(cy) + 1, dtype=np.int64)
        basex[1:] = cx
        basey[1:] = cy
        offx = np.repeat(basex[fstarts[nz]], coords_per_feat[nz])
        offy = np.repeat(basey[fstarts[nz]], coords_per_feat[nz])
        xs_all[coord_rows] = cx - offx
        ys_all[coord_rows] = cy - offy

    feats: list[dict] = []
    row_bounds = np.concatenate(
        (np.zeros(1, dtype=np.int64), np.cumsum(rows_per_feat))
    )
    for i in range(n):
        s, e = int(row_bounds[i]), int(row_bounds[i + 1])
        feat = {"id": fids[i], "type": gtypes[i], "attrs": attrs_per[i]}
        if arrays:
            feat["ops"] = ops_all[s:e]
            feat["xs"] = xs_all[s:e]
            feat["ys"] = ys_all[s:e]
        else:
            feat["cmds"] = list(
                zip(
                    ops_all[s:e].tolist(),
                    xs_all[s:e].tolist(),
                    ys_all[s:e].tolist(),
                )
            )
        feats.append(feat)
    return feats


def decode_tile(data: bytes, arrays: bool = False) -> list[dict]:
    """Tile bytes → [{name, extent, version, features:[...]}].

    Each feature dict carries {id, type, attrs} plus either ``cmds``
    ([(op,x,y)...], default) or — with ``arrays=True`` — ``ops``/``xs``/
    ``ys`` numpy columns (the zero-copy form the vectorized tile-join /
    overzoom paths consume).  Geometry streams are decoded with the
    numpy varint kernel either way."""
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
        feats = _decode_layer_features(raw_feats, keys, values, arrays)
        layers.append(
            {"name": name, "extent": extent, "version": version, "features": feats}
        )
    return layers
