"""Canonical feature relation — the Spark analog of tippecanoe's
``serial_feature`` (reference: serial.hpp:105-172) and of
``serialize_feature`` (reference: serial.cpp:416-922): project to world
coordinates, fix polygon winding, compute the spatial index key, extent and
bbox, and normalize attributes.

Schema (SURVEY §1.4):

    feature_id long            -- stable id: xxhash64(url, mention_seq)
    url        string          -- provenance
    layer      string
    geom_type  int             -- 1 point / 2 line / 3 polygon
    geometry   array<struct<op int, x long, y long>>  -- world coords 2**32
    attrs      map<string,string>
    index      long            -- space-filling-curve key of rep. point
                                  (serial.cpp:686-724; signed-long-safe, proj.py)
    extent     long            -- size key (serial.cpp:636-680)
    seq        long            -- stable tiebreak (input-order analog)
    minx/miny/maxx/maxy long   -- world bbox (flattened for pushdown: keeping
                                  bbox as top-level longs lets parquet
                                  min/max stats prune files on spatial range
                                  predicates — the Spark version of the
                                  reference's clip-at-ingest, serial.cpp:467-500)

Geometry ops are MVT-style MOVETO=1 / LINETO=2 / CLOSEPATH=7
(geometry.hpp:18-21); multi-geometries are flat command streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import proj
from .config import TilingConfig
from .geom import clip as _clipmod

OP_MOVETO, OP_LINETO, OP_CLOSEPATH = 1, 2, 7

# Geometry transport: a PACKED BINARY column, not array<struct>.
# Layout: n vertices as [n × uint8 op][n × int64 x][n × int64 y]
# (little-endian, 17 bytes/vertex).  Rationale (measured on the z0-z8
# pyramid): Arrow→pandas materializes array<struct> as one Python dict
# PER VERTEX per (zoom, tile) row — the kernels then re-parse those
# dicts per tile.  A binary blob crosses Arrow as a single buffer and
# unpacks to three numpy views with zero per-vertex Python.
GEOMETRY_T = T.BinaryType()


def pack_cmds(cmds) -> bytes:
    """[(op,x,y)...] or (n,3) array → packed geometry bytes."""
    a = np.asarray(cmds, dtype=np.int64).reshape(-1, 3)
    return a[:, 0].astype(np.uint8).tobytes() + a[:, 1].tobytes() + a[:, 2].tobytes()


def pack_cmds_arrays(ops: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> bytes:
    return (
        np.asarray(ops).astype(np.uint8).tobytes()
        + np.ascontiguousarray(xs, dtype=np.int64).tobytes()
        + np.ascontiguousarray(ys, dtype=np.int64).tobytes()
    )


def unpack_cmds(blob, dx: int = 0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed geometry bytes → (ops, xs, ys) int64 views.  ``dx`` shifts
    x by a world delta (dateline twins carry the shift in a column and
    apply it here instead of rewriting the blob)."""
    b = bytes(blob)
    n = len(b) // 17
    # ops stay uint8 — the opcode comparisons below never need int64 and
    # the astype copy was ~20% of the per-feature unpack cost
    ops = np.frombuffer(b, dtype=np.uint8, count=n)
    xs = np.frombuffer(b, dtype=np.int64, count=n, offset=n)
    ys = np.frombuffer(b, dtype=np.int64, count=n, offset=9 * n)
    if dx:
        xs = xs + dx
    return ops, xs, ys


def unpack_cmds_tuples(blob, dx: int = 0) -> list[tuple[int, int, int]]:
    ops, xs, ys = unpack_cmds(blob, dx)
    return list(zip(ops.tolist(), xs.tolist(), ys.tolist()))


def blob_to_rings(blob, dx: int = 0) -> list[tuple[np.ndarray, np.ndarray]]:
    """Packed geometry → list of (x, y) vertex arrays, one per
    MOVETO..CLOSEPATH/next-MOVETO run.  All-numpy split (no per-vertex
    Python)."""
    ops, xs, ys = unpack_cmds(blob, dx)
    if len(ops) == 0:
        return []
    moves = ops == OP_MOVETO
    n_moves = int(moves.sum())
    closes = ops == OP_CLOSEPATH
    if not closes.any():
        # fast path: no CLOSEPATH rows (lines, points)
        if n_moves <= 1:
            return [(xs, ys)]
        starts = np.flatnonzero(moves)
        bounds = np.concatenate(([0], starts[starts > 0], [len(ops)]))
        return [
            (xs[bounds[i]: bounds[i + 1]], ys[bounds[i]: bounds[i + 1]])
            for i in range(len(bounds) - 1)
        ]
    keep = ~closes
    xs_v, ys_v = xs[keep], ys[keep]
    if len(xs_v) == 0:
        return []
    if n_moves <= 1:
        return [(xs_v, ys_v)]
    run = np.cumsum(moves)[keep]
    cuts = np.flatnonzero(np.diff(run)) + 1
    bounds = np.concatenate(([0], cuts, [len(xs_v)]))
    return [
        (xs_v[bounds[i]: bounds[i + 1]], ys_v[bounds[i]: bounds[i + 1]])
        for i in range(len(bounds) - 1)
    ]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("layer", T.StringType()),
        T.StructField("geom_type", T.IntegerType()),
        T.StructField("geometry", GEOMETRY_T),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("index", T.LongType()),
        T.StructField("extent", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("minx", T.LongType()),
        T.StructField("miny", T.LongType()),
        T.StructField("maxx", T.LongType()),
        T.StructField("maxy", T.LongType()),
    ]
)

_MAX_EXTENT = (1 << 62) - 1


def _xxh64_str(url: np.ndarray, seq: np.ndarray) -> np.ndarray:
    """Cheap stable 63-bit id from (url, mention_seq) — FNV-1a over bytes.
    (Not cryptographic; only needs stability + low collision rate.)"""
    out = np.empty(len(url), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, (u, s) in enumerate(zip(url, seq)):
            h = np.uint64(0xCBF29CE484222325)
            for b in f"{u}#{s}".encode():
                h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
            out[i] = h
    return (out >> np.uint64(1)).astype(np.int64)  # 63-bit, non-negative


def signed_area(x: np.ndarray, y: np.ndarray) -> float:
    """Shoelace in world coords (y grows south).  Positive = clockwise on
    screen = exterior ring, matching MVT winding and the reference's
    get_area convention (clip.cpp:642-689).

    Coordinates are translated to the ring's first vertex before the
    products exactly like the reference (clip.cpp:664-667): the raw
    shoelace on absolute 2^32-scale coordinates loses the entire area of
    a few-unit ring to float64 cancellation — the SIGN comes out random,
    which silently flips tiny-ring windings."""
    n = len(x)
    if n == 0:
        return 0.0
    if n <= 8:
        # scalar path: the numpy roll/sum dispatch costs more than the
        # arithmetic for the tiny rings that dominate the tile stream
        bx, by = x[0], y[0]
        a = 0.0
        for i in range(n):
            j = i + 1 if i + 1 < n else 0
            a += float(x[i] - bx) * float(y[j] - by) - float(
                x[j] - bx
            ) * float(y[i] - by)
        return 0.5 * a
    xs = np.asarray(x)
    ys = np.asarray(y)
    xs = (xs - xs[0]).astype(np.float64)
    ys = (ys - ys[0]).astype(np.float64)
    return 0.5 * float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def ring_to_cmds(x: np.ndarray, y: np.ndarray) -> list[tuple[int, int, int]]:
    cmds = [(OP_MOVETO, int(x[0]), int(y[0]))]
    cmds += [(OP_LINETO, int(xi), int(yi)) for xi, yi in zip(x[1:], y[1:])]
    cmds.append((OP_CLOSEPATH, 0, 0))
    return cmds


def _tdiv_arr(v: np.ndarray, d: int) -> np.ndarray:
    """C++ integer division (truncation toward zero), vectorized."""
    q = v // d
    return q + ((v % d != 0) & (v < 0))


def fix_polygon_rotation(x: np.ndarray, y: np.ndarray, gscale: int) -> int:
    """fix_polygon's start-vertex choice (clip.cpp:1829-1877): the vertex
    furthest from the vertex furthest from the centroid — a far edge of
    the shape, so the always-retained ring start/end is never wasted on a
    low-impact point.  Computed in geometry_scale-shifted coordinates
    with the reference's truncating /16 metric and (y, x) tie-breaks.
    Returns the rotation offset (callers np.roll by -offset)."""
    n = len(x)
    if n < 2:
        return 0
    xs = (np.asarray(x, dtype=np.int64) >> gscale) if gscale > 0 else np.asarray(x, dtype=np.int64)
    ys = (np.asarray(y, dtype=np.int64) >> gscale) if gscale > 0 else np.asarray(y, dtype=np.int64)
    # centroid: truncating integer mean
    cx = int(xs.sum()) // n
    cy = int(ys.sum()) // n
    if int(xs.sum()) < 0 and int(xs.sum()) % n != 0:
        cx += 1
    if int(ys.sum()) < 0 and int(ys.sum()) % n != 0:
        cy += 1

    def _pick(d2: np.ndarray) -> int:
        # sequential rule: replace when strictly farther, or equally far
        # and (y, x)-smaller — i.e. the first (y, x)-min among the maxima
        m = d2 == d2.max()
        cand = np.flatnonzero(m)
        o = np.lexsort((xs[cand], ys[cand]))
        return int(cand[o[0]])

    xd = _tdiv_arr(xs - cx, 16)
    yd = _tdiv_arr(ys - cy, 16)
    furthest = _pick(xd * xd + yd * yd)
    xd = _tdiv_arr(xs - int(xs[furthest]), 16)
    yd = _tdiv_arr(ys - int(ys[furthest]), 16)
    return _pick(xd * xd + yd * yd)


_W_MASK = (1 << 32) - 1


def _split_cmd_rings(cmds):
    """[(op,x,y)] → list of vertex lists (MOVETO..LINETO runs)."""
    rings = []
    cur: list[tuple[int, int]] = []
    for op, x, y in cmds:
        if op == OP_MOVETO:
            if cur:
                rings.append(cur)
            cur = [(x, y)]
        elif op == OP_LINETO:
            cur.append((x, y))
        else:
            if cur:
                rings.append(cur)
            cur = []
    if cur:
        rings.append(cur)
    return rings


def _center_of_mass_mp(cmds) -> tuple[int, int]:
    """Area-weighted polygon center of mass over scaled coords — a
    transcription of center_of_mass_mp + centerOfMass
    (geometry.cpp:546-634, Turf-style open-ring sums, truncating
    double→int conversions preserved)."""
    ringx = ringy = 0.0
    ringcount = 0
    for pts in _split_cmd_rings(cmds):
        n = len(pts)
        xsum = float(sum(p[0] for p in pts))
        ysum = float(sum(p[1] for p in pts))
        area = signed_area(
            np.array([p[0] for p in pts], dtype=np.float64),
            np.array([p[1] for p in pts], dtype=np.float64),
        )
        cx = int(np.round(xsum / n))
        cy = int(np.round(ysum / n))
        # centerOfMass with the centroid as translation point
        sx = sy = s_area = 0.0
        for i in range(n - 1):
            xi, yi = pts[i][0] - cx, pts[i][1] - cy
            xj, yj = pts[i + 1][0] - cx, pts[i + 1][1] - cy
            a = xi * yj - xj * yi
            s_area += a
            sx += (xi + xj) * a
            sy += (yi + yj) * a
        if s_area == 0:
            mx, my = cx, cy
        else:
            f = 1.0 / (6.0 * (s_area * 0.5))
            mx, my = int(cx + f * sx), int(cy + f * sy)
        ringx += mx * area
        ringy += my * area
        ringcount += int(area)
    if ringcount == 0:
        return 0, 0
    return int(ringx / ringcount), int(ringy / ringcount)


def rep_index_point(
    cmds, gt: int, minx: int, miny: int, maxx: int, maxy: int,
    gscale: int, cfg: TilingConfig,
) -> tuple[int, int]:
    """Representative index point (P7, serial.cpp:686-724):
    point → lossy bbox midpoint (low bit dropped — our order-31 curve
    drops it anyway); polygon with densest-drop → center of mass of the
    scaled geometry; else → hash-chosen vertex (Σ scaled coords mod
    command count, CLOSEPATH zeros included, matching the reference's
    quirk)."""
    if gt == 1:
        return (minx // 2 + maxx // 2) & _W_MASK, (miny // 2 + maxy // 2) & _W_MASK
    if gt == 3 and (cfg.drop_densest_as_needed or cfg.coalesce_densest_as_needed):
        scaled = [(op, x >> gscale, y >> gscale) for op, x, y in cmds]
        mx, my = _center_of_mass_mp(scaled)
        return (mx << gscale) & _W_MASK, (my << gscale) & _W_MASK
    # the reference hashes over fix_polygon's output drawvec, where every
    # polygon ring carries its duplicated closing vertex and CLOSEPATH
    # ops are gone (clip.cpp:1879-1887) — so the ring start counts twice
    # and the modulo denominator is Σ(ring_len + 1), not the command
    # count.  Lines have no closing duplicates.
    if gt == 3:
        verts: list[tuple[int, int]] = []
        ring: list[tuple[int, int]] = []
        for op, x, y in cmds:
            if op == OP_MOVETO:
                if ring:
                    ring.append(ring[0])
                    verts.extend(ring)
                ring = [(x, y)]
            elif op == OP_LINETO:
                ring.append((x, y))
            else:  # CLOSEPATH terminates the ring
                if ring:
                    ring.append(ring[0])
                    verts.extend(ring)
                ring = []
        if ring:
            ring.append(ring[0])
            verts.extend(ring)
    else:
        verts = [(x, y) for _, x, y in cmds]
    n = len(verts)
    s = sum((x >> gscale) + (y >> gscale) for x, y in verts)
    ix = s % n if n else 0
    return verts[ix][0] & _W_MASK, verts[ix][1] & _W_MASK


def serialize(
    raw: DataFrame,
    cfg: TilingConfig | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Raw geocoded features → canonical feature relation (Arrow-batched).
    ``keep_cols`` ride along unchanged (streaming event time etc.)."""
    cfg = cfg or TilingConfig()
    curve = cfg.curve
    # --clip-bounding-box in world coordinates (P6)
    clip_box = None
    if cfg.clip_bounding_box is not None:
        w, s, e, n_ = cfg.clip_bounding_box
        bx, by = proj.lonlat_to_world(np.array([w, e]), np.array([n_, s]))
        clip_box = (int(bx[0]), int(by[0]), int(bx[1]), int(by[1]))
    # geometry_scale quantization (main.cpp:3764-3775, serial.cpp:30-31):
    # coordinates are rounded to the maxzoom pixel grid BEFORE bbox/index
    # computation — round(x / 2^s) << s with s = 32 - (detail + maxzoom).
    # This is what makes the global feature order (and therefore
    # rate-drop selection) match the reference exactly.
    gscale = max(32 - (cfg.full_detail + cfg.maxzoom), 0)
    out_schema = FEATURE_SCHEMA
    if keep_cols:
        from pyspark.sql import types as _T

        out_schema = _T.StructType(
            FEATURE_SCHEMA.fields + [raw.schema[c] for c in keep_cols]
        )

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # flatten all coords in the batch, project once (vectorized)
            coord_lists = pdf["coords"].to_numpy()
            counts = np.array([len(c) for c in coord_lists], dtype=np.int64)
            offs = np.concatenate([[0], np.cumsum(counts)])
            if offs[-1] == 0:
                continue
            lons = np.concatenate(
                [np.array([p["lon"] for p in c], dtype=np.float64) for c in coord_lists]
            )
            lats = np.concatenate(
                [np.array([p["lat"] for p in c], dtype=np.float64) for c in coord_lists]
            )
            wx, wy = proj.lonlat_to_world(lons, lats)
            # geometry is quantized to the maxzoom pixel grid
            # (scale_geometry, serial.cpp:304-380); bbox and the curve
            # index stay full-precision (sf.bbox is filled BEFORE the
            # quantization there) — both matter for reference parity
            if gscale > 0:
                half = 1 << (gscale - 1)
                qx = ((wx + half) >> gscale) << gscale
                qy = ((wy + half) >> gscale) << gscale
            else:
                qx, qy = wx, wy

            gts = pdf["geom_type"].to_numpy()
            geoms, idx_x, idx_y, extents = [], [], [], []
            minxs, minys, maxxs, maxys = [], [], [], []
            keep_rows: list[int] = []
            for i in range(n):
                a, b = offs[i], offs[i + 1]
                x, y = qx[a:b], qy[a:b]  # quantized: geometry + extent
                rx, ry = wx[a:b], wy[a:b]  # raw: bbox + index
                gt = int(gts[i])
                line_segs = None
                if clip_box is not None:
                    # --clip-bounding-box (P6, serial.cpp:467-500)
                    cx0, cy0, cx1, cy1 = clip_box
                    if gt == 1:
                        if not (cx0 <= x[0] <= cx1 and cy0 <= y[0] <= cy1):
                            continue
                    elif gt == 2:
                        line_segs = _clipmod.clip_line(x, y, cx0, cy0, cx1, cy1)
                        if not line_segs:
                            continue
                        x = np.concatenate([s[0] for s in line_segs])
                        y = np.concatenate([s[1] for s in line_segs])
                        rx, ry = x, y  # bbox from the clipped geometry
                    else:
                        x, y = _clipmod.clip_ring(x, y, cx0, cy0, cx1, cy1)
                        if len(x) < 3:
                            continue
                        rx, ry = x, y
                if gt == 3:
                    # drop duplicated closing vertex; fix winding (outer CW
                    # on screen — fix_polygon analog, clip.cpp:1755-1901;
                    # single rings only here, holes handled in geom.polygon)
                    if len(x) > 1 and x[0] == x[-1] and y[0] == y[-1]:
                        x, y = x[:-1], y[:-1]
                    area = signed_area(x, y)
                    if area < 0:
                        x, y = x[::-1], y[::-1]
                        area = -area
                    geoms.append(ring_to_cmds(x, y))
                    extents.append(min(int(round(area)), _MAX_EXTENT))
                elif gt == 2:
                    if line_segs is not None:
                        cmds = []
                        for sx, sy in line_segs:
                            cmds.append((OP_MOVETO, int(sx[0]), int(sy[0])))
                            cmds += [
                                (OP_LINETO, int(xi), int(yi))
                                for xi, yi in zip(sx[1:], sy[1:])
                            ]
                    else:
                        cmds = [(OP_MOVETO, int(x[0]), int(y[0]))]
                        cmds += [
                            (OP_LINETO, int(xi), int(yi))
                            for xi, yi in zip(x[1:], y[1:])
                        ]
                    geoms.append(cmds)
                    # line pseudo-area: circle over its length
                    # (serial.cpp:661-676)
                    length = float(
                        np.sum(np.hypot(np.diff(x.astype(np.float64)),
                                        np.diff(y.astype(np.float64))))
                    )
                    extents.append(
                        min(int(round(np.pi * (length / 2.0) ** 2)), _MAX_EXTENT)
                    )
                else:
                    geoms.append([(OP_MOVETO, int(x[0]), int(y[0]))])
                    extents.append(0)
                # stored bbox comes from the QUANTIZED geometry: the
                # reference recomputes sf.bbox from decode_geometry's
                # re-expanded scaled coords at every tile read
                # (serial.cpp:267), so stream membership at z >= 1 is
                # decided on the geometry_scale grid, not raw coords
                minxs.append(int(x.min()))
                minys.append(int(y.min()))
                maxxs.append(int(x.max()))
                maxys.append(int(y.max()))
                # representative index point (P7, serial.cpp:686-724):
                # lossy RAW-bbox midpoint for points (serial.cpp:689-692
                # fills sf.bbox before scale_geometry quantizes),
                # center-of-mass for densest-drop polygons, hash-chosen
                # vertex otherwise
                px_, py_ = rep_index_point(
                    geoms[-1], gt,
                    int(rx.min()), int(ry.min()), int(rx.max()), int(ry.max()),
                    gscale, cfg,
                )
                idx_x.append(px_)
                idx_y.append(py_)
                keep_rows.append(i)

            if not keep_rows:
                continue
            sel = np.array(keep_rows, dtype=np.int64)
            sub = pdf.iloc[sel]
            index = proj.encode_index(
                np.array(idx_x, dtype=np.int64),
                np.array(idx_y, dtype=np.int64),
                curve=curve,
            )
            urls = sub["url"].to_numpy()
            mseqs = sub["mention_seq"].to_numpy()
            fids = _xxh64_str(urls, mseqs)
            out = {
                "feature_id": fids,
                "url": urls,
                "layer": sub["layer"].to_numpy(),
                "geom_type": gts[sel].astype(np.int32),
                "geometry": [pack_cmds(g) for g in geoms],
                "attrs": sub["attrs"].to_numpy(),
                "index": index,
                "extent": np.array(extents, dtype=np.int64),
                "seq": fids,  # stable tiebreak; input order analog
                "minx": np.array(minxs, dtype=np.int64),
                "miny": np.array(minys, dtype=np.int64),
                "maxx": np.array(maxxs, dtype=np.int64),
                "maxy": np.array(maxys, dtype=np.int64),
            }
            for c in keep_cols:
                out[c] = sub[c].to_numpy()
            yield pd.DataFrame(out)

    out = raw.mapInPandas(gen, schema=out_schema)
    if cfg.use_attribute_for_id:
        out = apply_use_attribute_for_id(out, cfg)
    return out


def apply_use_attribute_for_id(df: DataFrame, cfg: TilingConfig) -> DataFrame:
    """--use-attribute-for-id (serial.cpp:813-848): the attribute becomes
    the feature id ONLY when it is a NUMBER-typed value (a tagged JSON
    string never qualifies without -aI) whose serial string is a plain
    nonnegative integer (strtoull must consume it all and round-trip —
    fractions and too-large values warn and keep the original id); on
    success the attribute is removed from the bag."""
    from pyspark.sql import functions as F

    key = cfg.use_attribute_for_id
    raw_val = F.col("attrs").getItem(key)
    # untagged (number-typed) AND integer-only; leading zeros strip like
    # the reference's strip_zeroes round-trip check
    elig = raw_val.rlike("^[0-9]+$")
    val = F.when(elig, raw_val.try_cast("long"))
    return df.withColumn(
        "feature_id", F.coalesce(val, F.col("feature_id"))
    ).withColumn(
        "attrs",
        F.when(
            val.isNotNull(),
            F.map_filter(F.col("attrs"), lambda k, _: k != F.lit(key)),
        ).otherwise(F.col("attrs")),
    )
