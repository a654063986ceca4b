"""tippecanoe-decode equivalent (decode.cpp + write_json.cpp): render a
tileset or a single tile as the reference's exact GeoJSON text — byte
for byte, including the json_writer spacing quirks (space after ``{``,
the double-space before an empty hash's ``}``), ``%f`` lon/lat, Grisu2
numbers, and the ``\\n,\\n`` feature separators.  The committed golden
files in the reference's tests/ were produced by this format, so the
parity tests compare with plain string equality.

CLI:  python -m tippecanoe_spark.decode tileset.mbtiles
      python -m tippecanoe_spark.decode tile.pbf z x y
with -Z/-z zoom windows, -l layer selection, and -x metadata-key
stripping (``-x generator`` in the reference's own test recipes).
"""

from __future__ import annotations

import math

from . import mvt
from .grisu import dtoa_milo

_TOP, _HASH, _HASH_KEY, _HASH_VALUE, _ARRAY, _ARRAY_ELT = range(6)


class JsonWriter:
    """Port of write_json.cpp's json_writer state machine."""

    def __init__(self):
        self.out: list[str] = []
        self.state: list[int] = []
        self.nospace = False
        self.wantnl = False

    # -- plumbing ---------------------------------------------------------
    def _adjust(self) -> None:
        st = self.state
        if not st:
            st.append(_TOP)
        elif st[-1] == _TOP:
            self.out.append("\n")
        elif st[-1] == _HASH:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            st[-1] = _HASH_KEY
        elif st[-1] == _HASH_KEY:
            self.out.append(":")
            if not self.nospace:
                self.out.append(" ")
                self.nospace = False
            st[-1] = _HASH_VALUE
        elif st[-1] == _HASH_VALUE:
            if self.wantnl:
                self.out.append(",\n")
                self.nospace = False
            elif self.nospace:
                self.out.append(",")
                self.nospace = False
            else:
                self.out.append(", ")
            self.wantnl = False
            st[-1] = _HASH_KEY
        elif st[-1] == _ARRAY:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            st[-1] = _ARRAY_ELT
        else:  # _ARRAY_ELT
            if self.wantnl:
                self.out.append(",\n")
                self.nospace = False
            elif self.nospace:
                self.out.append(",")
                self.nospace = False
            else:
                self.out.append(", ")
            self.wantnl = False

    # -- values -----------------------------------------------------------
    def write_array(self):
        self._adjust()
        self.out.append("[")
        self.state.append(_ARRAY)

    def end_array(self):
        tok = self.state.pop()
        assert tok in (_ARRAY, _ARRAY_ELT)
        if not self.nospace:
            self.out.append(" ")
        self.nospace = False
        self.out.append("]")

    def write_hash(self):
        self._adjust()
        self.out.append("{")
        self.state.append(_HASH)

    def end_hash(self):
        tok = self.state.pop()
        if tok == _HASH:
            if not self.nospace:
                self.out.append("  ")  # reference keeps this double space
            self.nospace = False
            self.out.append("}")
        else:
            assert tok in (_HASH_KEY, _HASH_VALUE)
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            self.out.append("}")

    def write_string(self, s: str):
        self._adjust()
        buf = ['"']
        for ch in s:
            if ch in ('\\', '"'):
                buf.append("\\" + ch)
            elif ch < " ":
                buf.append("\\u%04x" % ord(ch))
            else:
                buf.append(ch)
        buf.append('"')
        self.out.append("".join(buf))

    def write_signed(self, v: int):
        self._adjust()
        self.out.append(str(int(v)))

    def write_unsigned(self, v: int):
        self._adjust()
        self.out.append(str(int(v)))

    def write_number(self, d: float):
        self._adjust()
        self.out.append(dtoa_milo(float(d)))

    def write_float(self, d: float):
        self._adjust()
        self.out.append("%f" % d)

    def write_bool(self, b: bool):
        self._adjust()
        self.out.append("true" if b else "false")

    def write_null(self):
        self._adjust()
        self.out.append("null")

    def write_stringified(self, s: str):
        self._adjust()
        self.out.append(s)

    def write_newline(self):
        self.out.append("\n")
        self.nospace = True

    def comma_newline(self):
        self.wantnl = True

    def text(self) -> str:
        return "".join(self.out)


def _unproject(px: int, py: int, z: int, x: int, y: int, extent: int,
               projection: str = "EPSG:4326"):
    """tile px → lon/lat (tile2lonlat, projection.cpp:67-71) or EPSG:3857
    meters (tiletoepsg3857, projection.cpp:96-104), via the
    world-coordinate scaling in write_json.cpp:395-401."""
    wscale = 1 << (32 - z)
    wx = wscale * x + (wscale // extent) * px
    wy = wscale * y + (wscale // extent) * py
    if projection == "EPSG:3857":
        k = math.pi * 6378137.0 / (1 << 31)
        return (wx - (1 << 31)) * k, (((1 << 32) - 1 - wy) - (1 << 31)) * k
    n = float(1 << 32)
    lon = 360.0 * wx / n - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2.0 * wy / n))))
    return lon, lat


_CRS_ALIAS = {"EPSG:3857": "urn:ogc:def:crs:EPSG::3857"}


def _write_value(w: JsonWriter, key: str, v) -> None:
    w.write_string(key)
    if isinstance(v, bool):
        w.write_bool(v)
    elif isinstance(v, float):
        w.write_number(v)
    elif isinstance(v, int):
        if v >= 0:
            w.write_unsigned(v)
        else:
            w.write_signed(v)
    elif v is None:
        w.write_null()
    else:
        w.write_string(str(v))


def layer_to_geojson(
    w: JsonWriter, layer: dict, z: int, x: int, y: int, comma: bool = True,
    projection: str = "EPSG:4326", name: bool = False, zoom: bool = False,
    coordinate_mode: int = 0,
) -> None:
    """write_json.cpp:271-633 — features of one decoded layer.  ``name``/
    ``zoom`` add the pipeline mode's tippecanoe wrapper (decode -c)."""
    extent = layer["extent"] or 4096
    # write_coords (write_json.cpp:261-269): scale 0 = lon/lat via %f;
    # --fraction = px/extent, --integer = raw px, both through Grisu2
    if coordinate_mode == 1:
        scale = float(extent)
    elif coordinate_mode == 2:
        scale = 1.0
    else:
        scale = 0.0

    def wc(o):
        if scale == 0.0:
            w.write_float(o[1])
            w.write_float(o[2])
        else:
            w.write_number(o[3] / scale)
            w.write_number(o[4] / scale)

    for f in layer["features"]:
        w.write_hash()
        w.write_string("type")
        w.write_string("Feature")
        if f.get("id") is not None:
            w.write_string("id")
            w.write_unsigned(f["id"])
        if name or zoom:
            w.write_string("tippecanoe")
            w.write_hash()
            if name:
                w.write_string("layer")
                w.write_string(layer["name"])
            if zoom:
                w.write_string("minzoom")
                w.write_unsigned(z)
                w.write_string("maxzoom")
                w.write_unsigned(z)
            w.end_hash()
        w.write_string("properties")
        w.write_hash()
        for k, v in f["attrs"].items():
            _write_value(w, k, v)
        w.end_hash()

        w.write_string("geometry")
        w.write_hash()
        ops = [
            (op, *(_unproject(px, py, z, x, y, extent, projection)
                   if op != 7 else (0, 0)))
            + (px, py)
            for op, px, py in f["cmds"]
        ]
        t = f["type"]
        if t == 1:
            if len(ops) == 1:
                w.write_string("type")
                w.write_string("Point")
                w.write_string("coordinates")
                w.write_array()
                wc(ops[0])
                w.end_array()
            else:
                w.write_string("type")
                w.write_string("MultiPoint")
                w.write_string("coordinates")
                w.write_array()
                for o in ops:
                    w.write_array()
                    wc(o)
                    w.end_array()
                w.end_array()
        elif t == 2:
            movetos = sum(1 for o in ops if o[0] == 1)
            if movetos < 2:
                w.write_string("type")
                w.write_string("LineString")
                w.write_string("coordinates")
                w.write_array()
                for o in ops:
                    w.write_array()
                    wc(o)
                    w.end_array()
                w.end_array()
            else:
                w.write_string("type")
                w.write_string("MultiLineString")
                w.write_string("coordinates")
                w.write_array()
                w.write_array()
                started = False
                for o in ops:
                    if o[0] == 1:
                        if started:
                            w.end_array()
                            w.write_array()
                        w.write_array()
                        wc(o)
                        w.end_array()
                        started = True
                    else:
                        w.write_array()
                        wc(o)
                        w.end_array()
                w.end_array()
                w.end_array()
        else:  # polygon
            rings: list[list] = []
            for o in ops:
                if o[0] == 1:
                    rings.append([])
                if rings:
                    if o[0] == 7:
                        rings[-1].append(rings[-1][0])
                    else:
                        rings[-1].append(o)
            areas = []
            outer = 0
            for i, ring in enumerate(rings):
                area = 0.0
                n = len(ring)
                for k2 in range(n):
                    o1, o2 = ring[k2], ring[(k2 + 1) % n]
                    area += float(o1[3]) * float(o2[4])
                    area -= float(o1[4]) * float(o2[3])
                area /= 2
                areas.append(area)
                if area >= 0 or i == 0:
                    outer += 1
            multi = outer > 1
            w.write_string("type")
            w.write_string("MultiPolygon" if multi else "Polygon")
            w.write_string("coordinates")
            w.write_array()
            w.write_array()
            if multi:
                w.write_array()
            sstate = 0
            for i, ring in enumerate(rings):
                if areas[i] >= 0:
                    if sstate != 0:
                        w.end_array()
                        w.end_array()
                        w.write_array()
                        w.write_array()
                    sstate = 1
                if sstate == 2:
                    w.end_array()
                    w.write_array()
                for o in ring:
                    w.write_array()
                    wc(o)
                    w.end_array()
                sstate = 2
            if multi:
                w.end_array()
            w.end_array()
            w.end_array()
        w.end_hash()
        w.end_hash()
        if comma:
            w.write_newline()
            w.comma_newline()


def _handle_tile(
    w: JsonWriter, blob: bytes, z: int, x: int, y: int,
    layers_filter: set[str] | None = None, projection: str = "EPSG:4326",
    coordinate_mode: int = 0,
) -> None:
    """handle() (decode.cpp:85-236): one tile's FeatureCollection into a
    shared writer (single-tile AND whole-tileset modes)."""
    was_compressed = blob[:2] == b"\x1f\x8b"
    layers = mvt.decode_tile(bytes(blob))
    w.write_hash()
    w.write_string("type")
    w.write_string("FeatureCollection")
    w.write_string("properties")
    w.write_hash()
    w.write_string("zoom")
    w.write_signed(z)
    w.write_string("x")
    w.write_signed(x)
    w.write_string("y")
    w.write_signed(y)
    if not was_compressed:
        w.write_string("compressed")
        w.write_bool(False)
    w.end_hash()
    if projection in _CRS_ALIAS:
        w.write_string("crs")
        w.write_hash()
        w.write_string("type")
        w.write_string("name")
        w.write_string("properties")
        w.write_hash()
        w.write_string("name")
        w.write_string(_CRS_ALIAS[projection])
        w.end_hash()
        w.end_hash()
    w.write_string("features")
    w.write_array()
    w.write_newline()
    first_layer = True
    for layer in layers:
        if layers_filter and layer["name"] not in layers_filter:
            continue
        if not first_layer:
            w.comma_newline()
        w.write_hash()
        w.write_string("type")
        w.write_string("FeatureCollection")
        w.write_string("properties")
        w.write_hash()
        w.write_string("layer")
        w.write_string(layer["name"])
        w.write_string("version")
        w.write_signed(layer["version"] or 2)
        w.write_string("extent")
        w.write_signed(layer["extent"] or 4096)
        w.end_hash()
        w.write_string("features")
        w.write_array()
        w.write_newline()
        first_layer = False
        layer_to_geojson(
            w, layer, z, x, y, comma=True, projection=projection,
            coordinate_mode=coordinate_mode,
        )
        w.end_array()
        w.end_hash()
        w.write_newline()
    w.end_array()
    w.end_hash()
    w.write_newline()


def tile_to_text(
    blob: bytes, z: int, x: int, y: int, layers_filter: set[str] | None = None,
    projection: str = "EPSG:4326",
) -> str:
    """One tile's bytes → the reference's single-tile decode text."""
    w = JsonWriter()
    _handle_tile(w, blob, z, x, y, layers_filter, projection)
    return w.text()


def tileset_to_text(
    rows,
    metadata: dict,
    layers_filter: set[str] | None = None,
    exclude_meta: tuple[str, ...] = (),
    projection: str = "EPSG:4326",
    coordinate_mode: int = 0,
) -> str:
    """Whole-tileset decode (decode.cpp:321-489): metadata rows sorted
    by name (each value printed as a string), then every tile in
    (zoom, column, TMS-row) order as a nested FeatureCollection — the
    exact byte layout of the reference's committed decode goldens."""
    w = JsonWriter()
    w.write_hash()
    w.write_string("type")
    w.write_string("FeatureCollection")
    w.write_string("properties")
    w.write_hash()
    w.write_newline()
    within = False
    for name in sorted(metadata):
        if name in exclude_meta:
            continue
        if within:
            w.comma_newline()
        within = True
        w.write_string(name)
        w.write_string(str(metadata[name]))
    w.write_newline()
    w.wantnl = False  # the reference's own XXX (decode.cpp:362)
    w.end_hash()
    w.write_string("features")
    w.write_array()
    w.write_newline()
    within = False
    for r in sorted(rows, key=lambda r: (r["z"], r["x"], (1 << r["z"]) - 1 - r["y"])):
        if within:
            w.comma_newline()
        within = True
        _handle_tile(
            w, bytes(r["tile"]), r["z"], r["x"], r["y"], layers_filter,
            projection, coordinate_mode,
        )
    w.end_array()
    w.end_hash()
    w.write_newline()
    return w.text()


def tileset_to_pipeline_text(
    rows, layers_filter: set[str] | None = None
) -> str:
    """decode -c: one feature per line with the tippecanoe {layer,
    minzoom, maxzoom} wrapper, tiles in (zoom, column, TMS-row) order
    (decode.cpp:434 SELECT ... order by zoom_level, tile_column,
    tile_row) — no metadata block, so whole-tileset output is
    byte-comparable against the reference's committed goldens."""
    w = JsonWriter()
    ordered = sorted(
        rows, key=lambda r: (r["z"], r["x"], (1 << r["z"]) - 1 - r["y"])
    )
    for r in ordered:
        for layer in mvt.decode_tile(bytes(r["tile"])):
            if layers_filter and layer["name"] not in layers_filter:
                continue
            layer_to_geojson(
                w, layer, r["z"], r["x"], r["y"],
                comma=False, name=True, zoom=True,
            )
    w.write_newline()
    return w.text()


def main(argv: list[str] | None = None) -> int:
    import argparse
    import sys

    ap = argparse.ArgumentParser(prog="tippecanoe-spark-decode")
    ap.add_argument("-Z", "--minimum-zoom", type=int, default=0)
    ap.add_argument("-z", "--maximum-zoom", type=int, default=32)
    ap.add_argument("-l", "--layer", action="append", default=[])
    ap.add_argument("-x", "--exclude-metadata-row", action="append", default=[])
    ap.add_argument("tileset")
    ap.add_argument("zxy", nargs="*", type=int)
    args = ap.parse_args(argv)

    lf = set(args.layer) or None
    if len(args.zxy) == 3:
        with open(args.tileset, "rb") as fh:
            blob = fh.read()
        sys.stdout.write(
            tile_to_text(blob, args.zxy[0], args.zxy[1], args.zxy[2], lf)
        )
        return 0

    from . import sinks

    if args.tileset.endswith(".pmtiles"):
        _meta, tiles = sinks.read_pmtiles(args.tileset)
        rows = []
        for t in tiles:
            z, x, y = sinks.pmtiles_id_to_zxy(t["tile_id"])
            rows.append({"z": z, "x": x, "y": y, "tile": t["tile"]})
    else:
        rows = sinks.read_mbtiles(args.tileset)
    rows = [
        r for r in rows
        if args.minimum_zoom <= r["z"] <= args.maximum_zoom
    ]
    rows.sort(key=lambda r: (r["z"], r["x"], r["y"]))
    for r in rows:
        sys.stdout.write(tile_to_text(bytes(r["tile"]), r["z"], r["x"], r["y"], lf))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
