"""Overzoom: derive deeper tiles from parent tiles (J4).

The reference re-derives a z+k tile from its ancestor by decoding, world-
rescaling, clipping to the child + buffer, reducing and re-encoding
(overzoom, clip.cpp:1217-1753; CLI overzoom.cpp).  Used by tile-join's
``--overzoom`` to extend a shallower tileset downward.

Here the same derivation is a pure function on tile bytes plus a Spark
stage that fans each parent tile out to its 4**k children.  Parity
internals (clip.cpp:1560-1680 order): per-feature bbox quick exclusion,
clip, tiny-polygon reduction (``tiny_polygon_size``), Douglas–Peucker
simplification (``simplification``), and ``deduplicate_by_id`` — the
last three opt-in with reference defaults (0 / 0 / off,
overzoom.cpp:115-116,23).

Scale shape: the parent decode happens ONCE per tile (runs pre-split to
float arrays); each child does a vectorized bbox probe over all features
before any clip work, so sparse parents skip ~¾ of their children for
the cost of a few array compares.  All geometry bytes move through the
numpy command-stream codec (mvt.pack_varints)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import mvt
from .features import OP_CLOSEPATH, OP_LINETO, OP_MOVETO
from .geom import clip as clipmod
from .geom import simplify as simpmod


def _parse_parent(parent: bytes, extent: int) -> list[dict]:
    """Decode + pre-split a parent tile ONCE: the runs become float
    arrays already rescaled to the parent's own ``extent`` grid, so each
    of the 4**k children only shifts/scales/clips/encodes (the reference
    decodes once per overzoom() call too, clip.cpp:1217-1243).  Each
    feature carries its bbox for the per-child quick exclusion
    (clip.cpp:1551-1571)."""
    layers = []
    for layer in mvt.decode_tile(parent, arrays=True):
        src_extent = layer["extent"] or 4096
        sc = extent / src_extent
        feats = []
        bboxes = []
        for f in layer["features"]:
            ops, xs, ys = f["ops"], f["xs"], f["ys"]
            if len(ops) == 0:
                continue
            x = xs.astype(np.float64) * sc
            y = ys.astype(np.float64) * sc
            coord = ops != OP_CLOSEPATH
            runs = []
            mstarts = np.flatnonzero(ops == OP_MOVETO)
            if len(mstarts) == 0:
                continue
            bounds = np.append(mstarts, len(ops))
            for ri in range(len(mstarts)):
                s, e = int(bounds[ri]), int(bounds[ri + 1])
                m = coord[s:e]
                closed = not m.all()  # a CLOSEPATH row terminates the run
                runs.append(("ring" if closed else "line", x[s:e][m], y[s:e][m]))
            cx = x[coord]
            cy = y[coord]
            feats.append(
                {"type": f["type"], "id": f["id"], "attrs": f["attrs"], "runs": runs}
            )
            bboxes.append((cx.min(), cy.min(), cx.max(), cy.max()))
        b = (
            np.array(bboxes, dtype=np.float64).reshape(-1, 4)
            if bboxes
            else np.empty((0, 4), dtype=np.float64)
        )
        layers.append({"name": layer["name"], "features": feats, "bbox": b})
    return layers


def _derive_child(
    parsed: list[dict],
    k: int, cx0: int, cy0: int,
    buffer_px: int, extent: int,
    simplification: float = 0.0,
    tiny_polygon_size: float = 0.0,
    deduplicate_by_id: bool = False,
) -> bytes | None:
    """One child tile from a pre-parsed parent."""
    scale = 1 << k
    lo, hi = -buffer_px, extent + buffer_px
    x_off = cx0 * scale
    y_off = cy0 * scale
    out_layers = []
    for layer in parsed:
        feats = layer["features"]
        if not feats:
            continue
        # vectorized bbox probe: which features can touch this child at
        # all (quick exclusion, clip.cpp:1565-1571) — on a sparse parent
        # most children die here without any per-feature work
        b = layer["bbox"]
        live = np.flatnonzero(
            (b[:, 2] * scale - x_off >= lo)
            & (b[:, 0] * scale - x_off <= hi)
            & (b[:, 3] * scale - y_off >= lo)
            & (b[:, 1] * scale - y_off <= hi)
        )
        if len(live) == 0:
            continue
        lb = None
        seen_ids: set[int] = set()
        tiny = (
            simpmod.TinyPolygonReducer(tiny_polygon_size)
            if tiny_polygon_size > 0
            else None
        )
        for fi in live:
            f = feats[fi]
            if (
                deduplicate_by_id
                and f["id"] is not None
                and f["id"] in seen_ids
            ):
                continue
            o_parts: list[np.ndarray] = []
            x_parts: list[np.ndarray] = []
            y_parts: list[np.ndarray] = []
            net_area = 0.0
            included_last_outer = False
            for kind, px, py in f["runs"]:
                x = px * scale - x_off
                y = py * scale - y_off
                if f["type"] == 1:
                    xi = np.round(x).astype(np.int64)
                    yi = np.round(y).astype(np.int64)
                    m = (xi >= lo) & (xi <= hi) & (yi >= lo) & (yi <= hi)
                    if m.any():
                        xi, yi = xi[m], yi[m]
                        o_parts.append(np.full(len(xi), OP_MOVETO, dtype=np.int64))
                        x_parts.append(xi)
                        y_parts.append(yi)
                elif kind == "line":
                    for cxr, cyr in clipmod.clip_line(x, y, lo, lo, hi, hi):
                        # C-cast truncation like the scalar path's int()
                        cxr = cxr.astype(np.int64)
                        cyr = cyr.astype(np.int64)
                        # remove_noop after the clip (clip.cpp:1653):
                        # consecutive duplicates created by clipping at a
                        # corner collapse; a run left with no LINETO dies
                        if len(cxr) > 1:
                            keepm = np.empty(len(cxr), dtype=bool)
                            keepm[0] = True
                            np.not_equal(cxr[1:], cxr[:-1], out=keepm[1:])
                            keepm[1:] |= cyr[1:] != cyr[:-1]
                            cxr, cyr = cxr[keepm], cyr[keepm]
                        if len(cxr) < 2:
                            continue
                        if simplification > 0 and len(cxr) > 2:
                            keep = simpmod.douglas_peucker(
                                cxr, cyr, simplification
                            )
                            cxr, cyr = cxr[keep], cyr[keep]
                        ops_r = np.full(len(cxr), OP_LINETO, dtype=np.int64)
                        ops_r[0] = OP_MOVETO
                        o_parts.append(ops_r)
                        x_parts.append(cxr)
                        y_parts.append(cyr)
                else:
                    rx, ry = clipmod.clip_ring(x, y, lo, lo, hi, hi)
                    if len(rx) < 3:
                        continue
                    rx = rx.astype(np.int64)
                    ry = ry.astype(np.int64)
                    area = (
                        np.dot(rx, np.roll(ry, -1))
                        - np.dot(np.roll(rx, -1), ry)
                    ) / 2.0
                    net_area += area
                    if tiny is not None:
                        # reduce_tiny_poly ring selection (clip.cpp:
                        # 1083-1120): outer reduces at 0 < area <= px²;
                        # a hole reduces only when its outer did not
                        # represent itself; zero-area rings vanish
                        if area == 0:
                            continue
                        if (area > 0 and area <= tiny.threshold2) or (
                            area < 0 and not included_last_outer
                        ):
                            red = tiny.consume(area, int(rx[0]), int(ry[0]))
                            if area > 0:
                                included_last_outer = False
                            if red == ():
                                continue  # dissolved into the accumulator
                            rx, ry = red
                        elif area > 0:
                            included_last_outer = True
                    if simplification > 0 and len(rx) > 3:
                        keep = simpmod.douglas_peucker(rx, ry, simplification)
                        rx, ry = rx[keep], ry[keep]
                        if len(rx) < 3:
                            continue
                    ops_r = np.full(len(rx) + 1, OP_LINETO, dtype=np.int64)
                    ops_r[0] = OP_MOVETO
                    ops_r[-1] = OP_CLOSEPATH
                    o_parts.append(ops_r)
                    x_parts.append(np.append(rx, 0))
                    y_parts.append(np.append(ry, 0))
            if f["type"] == 3 and o_parts and net_area <= 0:
                # the child window sits inside a HOLE of the polygon:
                # each surrounding ring (outer and hole alike) clips to
                # the full window, cancelling to zero net area — the
                # reference's nesting-aware clip emits nothing there
                continue
            if o_parts:
                if lb is None:
                    lb = mvt.LayerBuilder(layer["name"], extent=extent)
                lb.add_feature_arrays(
                    f["type"],
                    np.concatenate(o_parts),
                    np.concatenate(x_parts),
                    np.concatenate(y_parts),
                    f["attrs"],
                    f["id"],
                )
                if deduplicate_by_id and f["id"] is not None:
                    seen_ids.add(f["id"])
        if lb is not None and lb.features:
            out_layers.append(lb)
    if not out_layers:
        return None
    return mvt.gzip_tile(mvt.encode_tile(out_layers))


def overzoom_tile(
    parent: bytes,
    oz: int, ox: int, oy: int,
    nz: int, nx: int, ny: int,
    buffer_px: int = 80,
    extent: int = 4096,
    **kwargs,
) -> bytes | None:
    """Parent tile bytes at (oz,ox,oy) → child tile at (nz,nx,ny), or None
    if nothing survives the clip.  (nz,nx,ny) must be a descendant tile."""
    k = nz - oz
    if k < 0 or (nx >> k) != ox or (ny >> k) != oy:
        raise ValueError("child tile is not a descendant of the parent")
    scale = 1 << k
    cx0 = (nx - (ox << k)) * extent // scale
    cy0 = (ny - (oy << k)) * extent // scale
    return _derive_child(
        _parse_parent(parent, extent), k, cx0, cy0, buffer_px, extent, **kwargs
    )


def overzoom(
    tiles: DataFrame,
    target_z: int | list[int] | tuple[int, ...],
    buffer_px: int = 80,
    simplification: float = 0.0,
    tiny_polygon_size: float = 0.0,
    deduplicate_by_id: bool = False,
) -> DataFrame:
    """Fan every tile out to its descendants at ``target_z`` (one zoom or
    a list of zooms — each level derived DIRECTLY from the parent bytes,
    never from an intermediate re-encode, matching tile-join's
    best-ancestor read).  Input schema (z,x,y,tile); output the same,
    children only.

    Scale shape: ONE scan of ``tiles``, two fused stages.  Stage A
    decodes each parent once and, for targets within k ≤ 2, derives the
    ≤16 children per level in place; for deeper targets it emits
    (parent-bytes, tz, 4×4-child-window) work rows instead, so a single
    deep parent spreads its 4**k children across the cluster rather than
    pinning one task.  Everything then crosses ONE hash shuffle (child
    coords for finished rows, window coords for work rows — the parent
    bytes are duplicated 4**(k-2)× through it, the price of the
    parallelism) and stage B derives the windowed children.  The single
    scan matters because ``tiles`` is usually an expensive uncached
    pipeline: a two-branch union would recompute it once per branch even
    when the deep branch filters to zero rows."""
    from pyspark.sql import functions as F

    targets = sorted(
        {int(target_z)} if isinstance(target_z, int) else {int(t) for t in target_z}
    )
    schema = T.StructType(
        [
            T.StructField("z", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("tile", T.BinaryType()),
        ]
    )
    # unified stage-A output: finished children carry tz = -1; deep work
    # rows carry (parent z/x/y/bytes, tz, wx, wy)
    uschema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("tz", T.IntegerType()),
            T.StructField("wx", T.IntegerType()),
            T.StructField("wy", T.IntegerType()),
        ]
    )

    extent = 4096

    def _children(parsed, oz, ox, oy, tz, dx_range, dy_range, rows):
        k = tz - oz
        scale = 1 << k
        for dx in dx_range:
            for dy in dy_range:
                child = _derive_child(
                    parsed, k,
                    dx * extent // scale, dy * extent // scale,
                    buffer_px, extent,
                    simplification=simplification,
                    tiny_polygon_size=tiny_polygon_size,
                    deduplicate_by_id=deduplicate_by_id,
                )
                if child is not None:
                    rows.append(
                        {
                            "z": tz,
                            "x": (ox << k) + dx,
                            "y": (oy << k) + dy,
                            "tile": child,
                            "tz": -1, "wx": -1, "wy": -1,
                        }
                    )

    def gen_stage_a(batches):
        # decode + pre-split ONCE per parent; derive every k <= 2 level's
        # children in place (children whose window misses every feature
        # bbox die in the vectorized probe inside _derive_child) and
        # explode k > 2 levels into 4×4-child window work rows
        for pdf in batches:
            rows: list[dict] = []
            zs = pdf["z"].to_numpy()
            xs = pdf["x"].to_numpy()
            ys = pdf["y"].to_numpy()
            blobs = pdf["tile"].to_numpy()
            for i in range(len(pdf)):
                oz, ox, oy = int(zs[i]), int(xs[i]), int(ys[i])
                direct = [tz for tz in targets if 0 < tz - oz <= 2]
                deep = [tz for tz in targets if tz - oz > 2]
                if direct:
                    parsed = _parse_parent(mvt.gunzip_tile(bytes(blobs[i])), extent)
                    for tz in direct:
                        k = tz - oz
                        _children(
                            parsed, oz, ox, oy, tz, range(1 << k), range(1 << k), rows
                        )
                for tz in deep:
                    nq = 1 << (tz - oz - 2)
                    blob = blobs[i]
                    for wx in range(nq):
                        for wy in range(nq):
                            rows.append(
                                {
                                    "z": oz, "x": ox, "y": oy, "tile": blob,
                                    "tz": tz, "wx": wx, "wy": wy,
                                }
                            )
            if rows:
                yield pd.DataFrame(rows)

    def gen_stage_b(batches):
        # post-shuffle: finished rows (tz == -1) pass through; window work
        # rows derive their 4×4 children here
        for pdf in batches:
            done = pdf[pdf["tz"] < 0]
            if len(done):
                yield done[["z", "x", "y", "tile"]]
            work = pdf[pdf["tz"] >= 0]
            if len(work) == 0:
                continue
            rows: list[dict] = []
            zs = work["z"].to_numpy()
            xs = work["x"].to_numpy()
            ys = work["y"].to_numpy()
            tzs = work["tz"].to_numpy()
            wxs = work["wx"].to_numpy()
            wys = work["wy"].to_numpy()
            blobs = work["tile"].to_numpy()
            for i in range(len(work)):
                oz, ox, oy = int(zs[i]), int(xs[i]), int(ys[i])
                tz = int(tzs[i])
                wx, wy = int(wxs[i]), int(wys[i])
                parsed = _parse_parent(mvt.gunzip_tile(bytes(blobs[i])), extent)
                _children(
                    parsed, oz, ox, oy, tz,
                    range(wx * 4, wx * 4 + 4), range(wy * 4, wy * 4 + 4),
                    rows,
                )
            if rows:
                yield pd.DataFrame(rows)[["z", "x", "y", "tile"]]

    return (
        tiles.filter(F.col("z") < max(targets))
        .mapInPandas(gen_stage_a, schema=uschema)
        .repartition(
            F.col("z"), F.col("x"), F.col("y"),
            F.col("tz"), F.col("wx"), F.col("wy"),
        )
        .mapInPandas(gen_stage_b, schema=schema)
    )
