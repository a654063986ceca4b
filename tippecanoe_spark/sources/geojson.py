"""GeoJSON source (S1): files → the canonical feature relation.

The reference pull-parses GeoJSON/ndjson with a custom streaming parser
(geojson.cpp:43-270, read_json.cpp); here the Spark-native split is:

- **ndjson / GeoJSON-seq** (one feature per line, optional RS=0x1E
  prefix): ``spark.read.text`` gives free file splitting and per-line
  parallelism (the do_read_parallel analog, main.cpp:451-540), an
  Arrow-batched kernel parses each line.
- **whole-file FeatureCollection**: one row per file via
  ``wholetext=True``, the kernel iterates its features.  Parallelism is
  per-file — matching the reference, which also cannot split a single
  FeatureCollection without the \\n heuristic.

Geometry handling (geojson.cpp:85-199 semantics):
- Point/MultiPoint/LineString/MultiLineString/Polygon/MultiPolygon and
  GeometryCollection (recursively flattened).
- MultiPolygon/MultiLineString stay ONE feature (one command stream,
  like the reference's serial_feature) so per-tile feature multisets
  match; MultiPoint is split one-row-per-point (documented deviation —
  the point kernels are single-point columnar).
- Polygon holes stay in the same command stream with opposite winding
  (fix_polygon, clip.cpp:1755-1901).
- properties → map<string,string>: scalars rendered like serial_val
  (numbers as given, true/false, null dropped), nested arrays/objects
  stringified (geojson.cpp:192-199 via stringify_value).
- ``tippecanoe: {layer}`` extension honored for the layer name
  (geojson.cpp:85-100); per-feature min/maxzoom recorded as
  ``tippecanoe_minzoom``/``tippecanoe_maxzoom`` attrs for the zoom
  filter stage.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import proj
from ..config import TilingConfig
from ..features import (
    FEATURE_SCHEMA,
    OP_CLOSEPATH,
    OP_LINETO,
    OP_MOVETO,
    pack_cmds,
    _MAX_EXTENT,
    rep_index_point,
    fix_polygon_rotation,
    signed_area,
)

_GEOM_TYPES = {
    "Point": 1, "MultiPoint": 1,
    "LineString": 2, "MultiLineString": 2,
    "Polygon": 3, "MultiPolygon": 3,
}


STRING_TAG = "\x02"  # serial_val mvt_string type marker (see below)
# serial_val mvt_null marker (read_json.cpp stringify_value JSON_NULL):
# a null property SURVIVES serialization — -T coercion turns it into the
# declared type (serial.cpp:802, coerce_value), otherwise it is dropped
# at MVT encode like the reference drops mvt_null values
NULL_TAG = "\x00"


def _render_value(v) -> str | None:
    """serial_val string rendering (serial.hpp:36-52, geojson.cpp:192-199).

    The attrs column is map<string,string>, so the JSON type distinction
    serial_val keeps in its type byte must live in the string itself: a
    JSON STRING that would otherwise coerce to a number or bool at
    encode time (GEOID-style digit strings, "true") is prefixed with
    ``STRING_TAG``; ``mvt.coerce_string_value`` strips the tag and pins
    mvt_string.  Unambiguous strings stay untagged so filters and
    attribute joins keep matching on raw values.  JSON null renders as
    ``NULL_TAG + "null"`` (mvt_null survives to the coercion stage)."""
    if v is None:
        return NULL_TAG + "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
            return str(int(v))
        if isinstance(v, int) and not (-(2**63) <= v < 2**64):
            # the reference's JSON parser holds integers beyond
            # [int64min, uint64max] as DOUBLES (read_json large_signed/
            # large_unsigned stay 0 → milo dtoa of the double value,
            # including Grisu2's occasional non-shortest digits)
            from ..grisu import dtoa_milo

            return dtoa_milo(float(v))
        if isinstance(v, float):
            from ..grisu import dtoa_milo

            return dtoa_milo(v)
        return str(v)
    if isinstance(v, str):
        if v in ("true", "false"):
            return STRING_TAG + v
        try:
            float(v)
        except ValueError:
            return v
        return STRING_TAG + v
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def _flatten_geometries(geom: dict):
    """Yield (geom_type, parts).

    Multi-geometries stay ONE feature like the reference (a serial_feature
    holds the whole MultiPolygon/MultiLineString command stream) — splitting
    them duplicated names in per-tile multisets.  For polygons ``parts`` is
    a list of ring-lists (one per polygon part); for lines a list of line
    coordinate arrays; MultiPoint is ONE feature whose command stream is
    several MOVETOs, exactly like the reference.
    """
    if geom is None:
        return
    t = geom.get("type")
    if t == "GeometryCollection":
        for g in geom.get("geometries") or []:
            yield from _flatten_geometries(g)
        return
    if t not in _GEOM_TYPES:
        return
    coords = geom.get("coordinates")
    if coords is None:
        return
    gt = _GEOM_TYPES[t]
    if t == "Point":
        yield gt, [[coords]]
    elif t == "MultiPoint":
        yield gt, [[c] for c in coords]
    elif t == "LineString":
        yield gt, [coords]
    elif t == "MultiLineString":
        yield gt, list(coords)
    elif t == "Polygon":
        yield gt, [coords]  # one ring-list: outer + holes together
    else:  # MultiPolygon: one feature, list of ring-lists
        yield gt, list(coords)


def _quantize(x: np.ndarray, y: np.ndarray, gscale: int):
    """geometry_scale rounding (serial.cpp:30-31): round to the maxzoom
    pixel grid so feature order matches the reference."""
    if gscale <= 0:
        return x, y
    half = 1 << (gscale - 1)
    return ((x + half) >> gscale) << gscale, ((y + half) >> gscale) << gscale


def _unwrap_longitude(rx: np.ndarray) -> np.ndarray:
    """-aw (scale_geometry, serial.cpp:314-336): a LINETO that jumps at
    least 180 deg — but not exactly 360, which some data sets draw on
    purpose — is pulled back by a world width; the offset accumulates
    along the line and resets at each MOVETO (per line part here)."""
    out = np.asarray(rx, dtype=np.int64).copy()
    w = 1 << 32
    half = 1 << 31
    off = 0
    prev = int(out[0])
    for i in range(1, len(out)):
        xx = int(out[i]) + off
        if xx - prev > half and xx - prev != w:
            off -= w
            xx -= w
        elif prev - xx > half and prev - xx != w:
            off += w
            xx += w
        out[i] = xx
        prev = xx
    return out


def _project(lon: np.ndarray, lat: np.ndarray, cfg: TilingConfig | None):
    """-s projection (projection.cpp:74-94): coordinates are lon/lat
    (EPSG:4326) by default, or EPSG:3857 meters linearly rescaled."""
    if cfg is not None and cfg.projection == "EPSG:3857":
        return proj.epsg3857_to_world(lon, lat)
    return proj.lonlat_to_world(lon, lat)


def feature_to_rows(
    feat: dict, seq: int, default_layer: str, source_id: str, gscale: int = 0,
    base_seq: int | None = None, cfg: TilingConfig | None = None,
) -> list[dict]:
    """One GeoJSON feature dict → canonical feature rows.

    ``base_seq``: pre-composed absolute sequence number — row seq is
    ``base_seq + part_no`` with NO further shifting (the line-mode path
    composes partition_id*2^33 + a local counter; shifting that by 8
    would overflow int64 for partition ids >= 64)."""
    props = feat.get("properties") or {}
    tc = feat.get("tippecanoe") or {}
    layer = tc.get("layer", default_layer)
    attrs = {}
    id_override = None
    for k, v in props.items():
        rv = _render_value(v)
        if rv is not None:
            attrs[str(k)] = rv
    if cfg is not None and cfg.use_attribute_for_id:
        # --use-attribute-for-id runs BEFORE -x/-X exclusion
        # (serial.cpp:813-848 precedes the exclude checks at 850): a
        # NUMBER-typed integer value becomes the id and leaves the bag
        v = attrs.get(cfg.use_attribute_for_id)
        if v is not None and re.fullmatch(r"[0-9]+", v):
            iv = int(v)
            if iv < 2**63:
                id_override = iv
                del attrs[cfg.use_attribute_for_id]
    if "minzoom" in tc:
        attrs["tippecanoe_minzoom"] = str(tc["minzoom"])
    if "maxzoom" in tc:
        attrs["tippecanoe_maxzoom"] = str(tc["maxzoom"])
    if cfg is not None and (
        cfg.include_attrs or cfg.exclude_attrs or cfg.exclude_all_attrs
    ):
        # -y / -x / -X apply at SERIALIZATION (serial.cpp:850-860): the
        # filtered bag is what coalcmp, accumulation, and ordering see —
        # filtering only at encode leaves coalesce comparing attrs the
        # user asked to drop.  The tippecanoe extension pseudo-attrs
        # are not properties and always survive.
        special = ("tippecanoe_minzoom", "tippecanoe_maxzoom")
        if cfg.include_attrs or cfg.exclude_all_attrs:
            inc = set(cfg.include_attrs)
            attrs = {
                k: v for k, v in attrs.items() if k in inc or k in special
            }
        else:
            exc = set(cfg.exclude_attrs)
            attrs = {
                k: v for k, v in attrs.items()
                if k not in exc or k in special
            }
    msl = cfg.max_string_attribute_length if cfg is not None else 0
    if msl > 0:
        # --maximum-string-attribute-length (serial.cpp:871-875): only
        # mvt_string-typed values are truncated, at a UTF-8 boundary.
        # In our encoding a value is string-typed iff it is tagged, or
        # untagged and not parseable as a number (numbers/bools render
        # short and keep their type).
        from ..text import truncate_string

        for k, v in list(attrs.items()):
            if v.startswith(NULL_TAG):
                continue  # mvt_null: not a string value
            tagged = v.startswith(STRING_TAG)
            s = v[1:] if tagged else v
            if len(s.encode("utf-8")) <= msl:
                continue
            if not tagged:
                try:
                    float(s)
                    continue  # numeric-typed: reference leaves it alone
                except ValueError:
                    pass
            s = truncate_string(s, msl)
            # a truncated string can become number/bool-ambiguous; keep
            # its mvt_string type with the tag
            retag = s in ("true", "false")
            if not retag:
                try:
                    float(s)
                    retag = True
                except ValueError:
                    pass
            attrs[k] = (STRING_TAG + s) if retag else s
    # feature id (geojson.cpp:102-139): kept only when the input id is a
    # JSON NUMBER that is a non-negative exact integer — string ids and
    # fractional/overflowing numbers are dropped with a warning in the
    # reference (strings convert only under -aI, not implemented).  The
    # int64 cap is ours (Spark long column); the reference holds uint64.
    fid = feat.get("id")
    if (
        isinstance(fid, bool)
        or not isinstance(fid, int)
        or fid < 0
        or fid > 0x7FFFFFFFFFFFFFFF
    ):
        fid = None
    if id_override is not None:
        fid = id_override

    geom = feat.get("geometry")
    if geom is None and feat.get("type") in _GEOM_TYPES or feat.get("type") == "GeometryCollection":
        geom = feat  # bare geometry (read_json.cpp behavior)
    # --clip-bounding-box (serial.cpp:467-505): projected at startup
    # ((lon1,lat1)->(minx,maxy), (lon2,lat2)->(maxx,miny),
    # main.cpp:3693-3697), applied in SCALED coordinates after
    # fix_polygon, then remove_noop; a feature clipped empty vanishes
    clip_s = None
    if cfg is not None and cfg.clip_bounding_box is not None:
        lon1, lat1, lon2, lat2 = cfg.clip_bounding_box
        bx, by = proj.lonlat_to_world(
            np.array([lon1, lon2]), np.array([lat1, lat2])
        )
        # SHIFT_RIGHT rounds half away from zero (serial.cpp:30), it is
        # not a truncating shift — one gscale grid step of difference in
        # the clip edge is visible in the clip-bounding-box goldens
        def _sr(v: int) -> int:
            h = 1 << (gscale - 1) if gscale else 0
            return ((v + h) >> gscale) if v >= 0 else -((-v + h) >> gscale)

        clip_s = (
            _sr(int(bx[0])), _sr(int(by[1])), _sr(int(bx[1])), _sr(int(by[0]))
        ) if gscale else (int(bx[0]), int(by[1]), int(bx[1]), int(by[0]))
    rows = []
    part_no = 0
    for gt, parts in _flatten_geometries(geom or {}):
        cmds = []
        # raw coords feed the INDEX point (reference fills sf.bbox BEFORE
        # the geometry_scale rounding, serial.cpp:339-351, and the point
        # index is that raw bbox midpoint, serial.cpp:689-692); quantized
        # coords feed the command stream, extent, AND the stored
        # membership bbox — at tile read the reference recomputes sf.bbox
        # from decode_geometry's re-expanded scaled coords
        # (serial.cpp:267), so stream membership at every zoom is decided
        # on the geometry_scale grid, not raw coords
        all_x: list[np.ndarray] = []
        all_y: list[np.ndarray] = []
        all_qx: list[np.ndarray] = []
        all_qy: list[np.ndarray] = []
        extent = 0
        if gt == 3:
            # parts = list of ring-lists (one per polygon part); each
            # part: [outer, hole, hole...].  Extent = Σ signed ring areas
            # over the WHOLE multipolygon (serial.cpp:634-651: holes
            # subtract; a hole-heavy geometry can go negative → clamp 0)
            extent_f = 0.0
            for rings_ in parts:
                for ri, ring in enumerate(rings_):
                    lon = np.array([c[0] for c in ring], dtype=np.float64)
                    lat = np.array([c[1] for c in ring], dtype=np.float64)
                    rx, ry = _project(lon, lat, cfg)
                    if (
                        cfg is not None
                        and cfg.detect_longitude_wraparound
                        and len(rx) > 1
                    ):
                        # -aw applies to every LINETO — polygon ring
                        # vertices included (scale_geometry walks ops,
                        # not geometry types; serial.cpp:314-336)
                        rx = _unwrap_longitude(rx)
                    # serialize order (serial.cpp:457-465): scale_geometry
                    # quantizes FIRST, then fix_polygon reverses/rotates
                    # on the QUANTIZED coordinates.  Consecutive
                    # duplicates created by quantization are NOT collapsed
                    # (remove_noop only runs when clip_to_tile clips).
                    x, y = _quantize(rx, ry, gscale)
                    if len(x) > 1 and x[0] == x[-1] and y[0] == y[-1]:
                        x, y = x[:-1], y[:-1]
                    if len(x) < 3:
                        continue
                    area = signed_area(x, y)
                    # outer ring positive (screen-CW), holes negative.
                    # fix_polygon reverses when (area > 0) != outer
                    # (clip.cpp:1811-1815): an outer whose QUANTIZED area
                    # collapsed to zero is reversed too.
                    want_positive = ri == 0
                    if cfg is not None and cfg.use_source_polygon_winding:
                        # -pw: every ring reversed (GeoJSON winding is
                        # opposite vector winding, clip.cpp:1802-1805)
                        do_reverse = True
                    elif cfg is not None and cfg.reverse_source_polygon_winding:
                        do_reverse = False  # -pW: rings exactly as read
                    else:
                        do_reverse = (area > 0) != want_positive
                    if do_reverse:
                        # the reference reverses the CLOSED ring
                        # (clip.cpp:1817-1823), so the reversed sequence
                        # still starts at v0: v0, v(n-1), ..., v1.  The
                        # phase matters — the rotation's duplicate-value
                        # tie-break picks the first index.
                        x = np.roll(x[::-1], 1)
                        y = np.roll(y[::-1], 1)
                        area = -area
                    extent_f += area
                    # fix_polygon rotation (clip.cpp:1829-1877): start the
                    # ring at the vertex furthest from the vertex furthest
                    # from the centroid, so the always-retained start/end
                    # never lands on a low-impact point.  Ring starts are
                    # also the tiny-polygon placeholder anchors, so this
                    # is load-bearing for fixture parity.
                    rot = fix_polygon_rotation(x, y, gscale)
                    if rot:
                        x, y = np.roll(x, -rot), np.roll(y, -rot)
                    if clip_s is not None:
                        from ..geom import clip as _clipmod

                        xs_s = (x >> gscale) if gscale else x
                        ys_s = (y >> gscale) if gscale else y
                        cx, cy = _clipmod.clip_ring(
                            np.asarray(xs_s, dtype=np.int64),
                            np.asarray(ys_s, dtype=np.int64), *clip_s
                        )
                        if len(cx) < 3:
                            extent_f -= area  # ring clipped away entirely
                            continue
                        x = (cx << gscale) if gscale else cx
                        y = (cy << gscale) if gscale else cy
                        # extent comes from the CLIPPED geometry
                        # (serial.cpp:634-651 runs after the clip)
                        extent_f -= area
                        extent_f += signed_area(x, y)
                    all_x.append(rx)
                    all_y.append(ry)
                    all_qx.append(x)
                    all_qy.append(y)
                    cmds.append((OP_MOVETO, int(x[0]), int(y[0])))
                    cmds.extend(
                        (OP_LINETO, int(a), int(b)) for a, b in zip(x[1:], y[1:])
                    )
                    cmds.append((OP_CLOSEPATH, 0, 0))
            extent = min(int(round(max(extent_f, 0.0))), _MAX_EXTENT)
        else:
            for line in parts:
                lon = np.array([c[0] for c in line], dtype=np.float64)
                lat = np.array([c[1] for c in line], dtype=np.float64)
                rx, ry = _project(lon, lat, cfg)
                if (
                    cfg is not None
                    and cfg.detect_longitude_wraparound
                    and gt == 2
                    and len(rx) > 1
                ):
                    rx = _unwrap_longitude(rx)
                x, y = _quantize(rx, ry, gscale)
                if len(x) == 0:
                    continue
                if clip_s is not None:
                    from ..geom import clip as _clipmod

                    xs_s = np.asarray((x >> gscale) if gscale else x, dtype=np.int64)
                    ys_s = np.asarray((y >> gscale) if gscale else y, dtype=np.int64)
                    if gt == 1:
                        keep = (
                            (xs_s >= clip_s[0]) & (ys_s >= clip_s[1])
                            & (xs_s <= clip_s[2]) & (ys_s <= clip_s[3])
                        )
                        if not keep.any():
                            continue
                        x, y = x[keep], y[keep]
                        cmds.extend((OP_MOVETO, int(a), int(b)) for a, b in zip(x, y))
                        all_x.append(rx)
                        all_y.append(ry)
                        all_qx.append(x)
                        all_qy.append(y)
                        continue
                    segs = _clipmod.clip_line(xs_s, ys_s, *clip_s)
                    emitted = False
                    for sx, sy in segs:
                        # remove_noop(0): exact consecutive duplicates
                        if len(sx) > 1:
                            m = np.empty(len(sx), dtype=bool)
                            m[0] = True
                            np.logical_or(sx[1:] != sx[:-1], sy[1:] != sy[:-1], out=m[1:])
                            sx, sy = sx[m], sy[m]
                        if len(sx) < 2:
                            continue
                        ux = (np.asarray(sx, dtype=np.int64) << gscale) if gscale else sx
                        uy = (np.asarray(sy, dtype=np.int64) << gscale) if gscale else sy
                        cmds.append((OP_MOVETO, int(ux[0]), int(uy[0])))
                        cmds.extend(
                            (OP_LINETO, int(a), int(b)) for a, b in zip(ux[1:], uy[1:])
                        )
                        all_qx.append(ux)
                        all_qy.append(uy)
                        if len(ux) > 1:
                            length = float(
                                np.sum(np.hypot(np.diff(ux.astype(np.float64)),
                                                np.diff(uy.astype(np.float64))))
                            )
                            extent += min(
                                int(round(np.pi * (length / 2.0) ** 2)), _MAX_EXTENT
                            )
                        emitted = True
                    if emitted:
                        all_x.append(rx)
                        all_y.append(ry)
                    continue
                cmds.append((OP_MOVETO, int(x[0]), int(y[0])))
                cmds.extend((OP_LINETO, int(a), int(b)) for a, b in zip(x[1:], y[1:]))
                all_x.append(rx)
                all_y.append(ry)
                all_qx.append(x)
                all_qy.append(y)
                if gt == 2 and len(x) > 1:
                    length = float(
                        np.sum(np.hypot(np.diff(x.astype(np.float64)),
                                        np.diff(y.astype(np.float64))))
                    )
                    extent += min(int(round(np.pi * (length / 2.0) ** 2)), _MAX_EXTENT)
        if not cmds:
            continue
        ax = np.concatenate(all_x)
        ay = np.concatenate(all_y)
        aqx = np.concatenate(all_qx)
        aqy = np.concatenate(all_qy)
        # stored membership bbox: QUANTIZED geometry (serial.cpp:267)
        minx, maxx = int(aqx.min()), int(aqx.max())
        miny, maxy = int(aqy.min()), int(aqy.max())
        # representative index point (P7, serial.cpp:686-724): RAW bbox
        # midpoint for points, center-of-mass for densest-drop polygons,
        # hash-chosen vertex otherwise — matches the reference's global
        # feature order for polygons/lines (forced keeps, -zg planning)
        px_, py_ = rep_index_point(
            cmds, gt,
            int(ax.min()), int(ay.min()), int(ax.max()), int(ay.max()),
            gscale, cfg or TilingConfig(),
        )
        index = int(
            proj.encode_index(np.array([px_]), np.array([py_]), curve=(cfg or TilingConfig()).curve)[0]
        )
        row_seq = (base_seq + part_no) if base_seq is not None else (seq << 8) + part_no
        rows.append(
            {
                # id-less features get a NEGATIVE synthetic key: unique
                # for joins/twin-folding, but the MVT encoder emits ids
                # only for >= 0 (the reference writes no id when the
                # input had none — has_id, serial.cpp; emitting one
                # inflates every byte-budget decision)
                "feature_id": fid if fid is not None else -row_seq - 1,
                "url": source_id,
                "layer": layer,
                "geom_type": gt,
                "geometry": pack_cmds(cmds),
                "attrs": attrs,
                "index": index,
                "extent": min(extent, _MAX_EXTENT),
                "seq": row_seq,
                "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
            }
        )
        part_no += 1
    return rows


def _parse_line(line: str):
    line = line.strip().lstrip("\x1e").rstrip(",")
    if not line or line in ("[", "]", "{", "}"):
        return None
    try:
        obj = json.loads(line)
    except json.JSONDecodeError:
        return None
    return obj if isinstance(obj, (dict, list)) else None


def _harvest_geoms(v) -> list:
    """read_json.cpp behavior: geometry objects found ANYWHERE inside an
    arbitrary JSON container are bare features, in document order
    (tests/geometry/bare.json: ``{"something": [{LineString}]}`` and a
    bare array of geometries both parse).  Feature objects are atomic —
    geometries inside their properties stringify, never extract."""
    if isinstance(v, dict):
        t = v.get("type")
        if t in _GEOM_TYPES or t in ("Feature", "GeometryCollection"):
            return [v]
        if t == "FeatureCollection":
            return list(v.get("features") or [])
        out = []
        for val in v.values():
            out.extend(_harvest_geoms(val))
        return out
    if isinstance(v, list):
        out = []
        for val in v:
            out.extend(_harvest_geoms(val))
        return out
    return []


def _line_feats(obj) -> list:
    """One parsed top-level JSON value → feature/geometry dicts."""
    if isinstance(obj, dict):
        t = obj.get("type")
        if t == "FeatureCollection":
            return list(obj.get("features") or [])
        if t in _GEOM_TYPES or t in ("Feature", "GeometryCollection"):
            return [obj]
    return _harvest_geoms(obj)


def read_geojson(
    spark: SparkSession,
    path: str,
    layer: str = "layer0",
    whole_file: bool | None = None,
    cfg: TilingConfig | None = None,
) -> DataFrame:
    """GeoJSON file(s) → canonical feature DataFrame.  ``whole_file=None``
    auto-detects: tries line mode and falls back to whole-file for
    multi-line FeatureCollections.  ``cfg`` supplies the geometry_scale
    quantization (reference-order parity); None keeps full precision."""
    gscale = cfg.gscale if cfg is not None else 0
    if whole_file is None:
        head = spark.read.text(path).limit(50).collect()
        # line-parseable only if EVERY non-structural line parses on its
        # own and at least one yields a feature; a single multi-line
        # feature mixed into otherwise line-delimited input (the
        # reference's overture-235 regression case) must take the
        # whole-file streaming decoder or it would silently vanish
        parsed_any = False
        bad = False
        for r in head:
            s = r["value"].strip().lstrip("\x1e").rstrip(",")
            if not s or s in ("[", "]", "{", "}"):
                continue
            obj = _parse_line(r["value"])
            if obj is None:
                bad = True
                break
            if _line_feats(obj):
                parsed_any = True
        whole_file = bad or not parsed_any

    if whole_file:
        text_df = spark.read.text(path, wholetext=True)

        def _strip_trailing_commas(text: str) -> str:
            # the reference's pull parser (jsonpull) tolerates trailing
            # commas before ] / } (tests/stable/in.json has one); Python
            # json does not — drop them with a string-aware scan
            if ",]" not in text and ",}" not in text and (
                not re.search(r",\s*[\]}]", text)
            ):
                return text
            out = []
            in_str = False
            esc = False
            n = len(text)
            i = 0
            while i < n:
                c = text[i]
                if in_str:
                    out.append(c)
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == '"':
                        in_str = False
                    i += 1
                    continue
                if c == '"':
                    in_str = True
                    out.append(c)
                    i += 1
                    continue
                if c == ",":
                    j = i + 1
                    while j < n and text[j] in " \t\r\n":
                        j += 1
                    if j < n and text[j] in "]}":
                        i += 1  # drop the trailing comma
                        continue
                out.append(c)
                i += 1
            return "".join(out)

        def gen(batches):
            # json pull-parser analog (read_json.cpp): decode SUCCESSIVE
            # JSON values from the raw text — handles one FeatureCollection,
            # a bare geometry, or a concatenation of Feature/geometry
            # objects with arbitrary whitespace/newlines between tokens
            dec = json.JSONDecoder()
            for pdf in batches:
                rows = []
                for val in pdf["value"]:
                    text = _strip_trailing_commas(val)
                    pos, i = 0, 0
                    n_text = len(text)
                    while pos < n_text:
                        while pos < n_text and text[pos] in " \t\r\n\x1e,":
                            pos += 1
                        if pos >= n_text:
                            break
                        try:
                            doc, pos = dec.raw_decode(text, pos)
                        except json.JSONDecodeError:
                            break
                        feats = (
                            _line_feats(doc)
                            if isinstance(doc, (dict, list))
                            else []
                        )
                        for f in feats:
                            rows.extend(
                                feature_to_rows(f, i, layer, path, gscale, cfg=cfg)
                            )
                            i += 1
                if rows:
                    yield pd.DataFrame(rows)

        return text_df.mapInPandas(gen, schema=FEATURE_SCHEMA)

    text_df = spark.read.text(path).selectExpr(
        "value", "monotonically_increasing_id() AS line_no"
    )

    def gen_lines(batches):
        # seq = partition_id * 2^33 + local emitted-row counter: preserves
        # (partition, line, feature, part) order without the lossy shifts
        # that overflow int64 at partition ids >= 64
        counter = 0
        for pdf in batches:
            rows = []
            for val, line_no in zip(pdf["value"], pdf["line_no"]):
                obj = _parse_line(val)
                if obj is None:
                    continue
                pid_base = (int(line_no) >> 33) << 33
                feats = _line_feats(obj)
                if not feats:
                    continue
                for f in feats:
                    out = feature_to_rows(
                        f, 0, layer, path, gscale,
                        base_seq=pid_base + counter, cfg=cfg,
                    )
                    counter += max(len(out), 1)
                    rows.extend(out)
            if rows:
                yield pd.DataFrame(rows)

    return text_df.mapInPandas(gen_lines, schema=FEATURE_SCHEMA)
