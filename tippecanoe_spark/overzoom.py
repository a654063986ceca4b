"""Overzoom: derive deeper tiles from parent tiles (J4).

The reference re-derives a z+k tile from its ancestor by decoding, world-
rescaling, clipping to the child + buffer, reducing and re-encoding
(overzoom, clip.cpp:1217-1753; CLI overzoom.cpp).  Used by tile-join's
``--overzoom`` to extend a shallower tileset downward.

Here the same derivation is a pure function on tile bytes plus a Spark
stage that fans each parent tile out to its 4**k children (children that
clip to empty are not emitted — the child-emptiness probe of
clip.cpp:1697-1731 falls out naturally)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import mvt
from .features import OP_CLOSEPATH, OP_LINETO, OP_MOVETO
from .geom import clip as clipmod


def _split_runs(cmds):
    """Command stream → list of (op_kind, x_arr, y_arr) runs; op_kind is
    'ring' (ends with CLOSEPATH) or 'line'."""
    runs = []
    cur = []
    closed = False
    for op, x, y in cmds:
        if op == OP_MOVETO:
            if cur:
                runs.append(("ring" if closed else "line", cur))
            cur = [(x, y)]
            closed = False
        elif op == OP_LINETO:
            cur.append((x, y))
        elif op == OP_CLOSEPATH:
            closed = True
            if cur:
                runs.append(("ring", cur))
            cur = []
    if cur:
        runs.append(("ring" if closed else "line", cur))
    return runs


def _parse_parent(parent: bytes, extent: int) -> list[dict]:
    """Decode + pre-split a parent tile ONCE: the runs become float
    arrays already rescaled to the parent's own ``extent`` grid, so each
    of the 4**k children only shifts/scales/clips/encodes (the reference
    decodes once per overzoom() call too, clip.cpp:1217-1243)."""
    layers = []
    for layer in mvt.decode_tile(parent):
        src_extent = layer["extent"]
        feats = []
        for f in layer["features"]:
            runs = []
            for kind, pts in _split_runs(f["cmds"]):
                x = np.array([p[0] for p in pts], dtype=np.float64)
                y = np.array([p[1] for p in pts], dtype=np.float64)
                runs.append((kind, x * extent / src_extent, y * extent / src_extent))
            feats.append(
                {"type": f["type"], "id": f["id"], "attrs": f["attrs"], "runs": runs}
            )
        layers.append({"name": layer["name"], "features": feats})
    return layers


def _derive_child(
    parsed: list[dict],
    k: int, cx0: int, cy0: int,
    buffer_px: int, extent: int,
) -> bytes | None:
    """One child tile from a pre-parsed parent."""
    scale = 1 << k
    lo, hi = -buffer_px, extent + buffer_px
    out_layers = []
    for layer in parsed:
        lb = mvt.LayerBuilder(layer["name"], extent=extent)
        for f in layer["features"]:
            cmds = []
            for kind, px, py in f["runs"]:
                x = px * scale - cx0 * scale
                y = py * scale - cy0 * scale
                if f["type"] == 1:
                    xi = np.round(x).astype(np.int64)
                    yi = np.round(y).astype(np.int64)
                    for xx, yy in zip(xi, yi):
                        if lo <= xx <= hi and lo <= yy <= hi:
                            cmds.append((OP_MOVETO, int(xx), int(yy)))
                elif kind == "line":
                    for cxr, cyr in clipmod.clip_line(x, y, lo, lo, hi, hi):
                        cmds.append((OP_MOVETO, int(cxr[0]), int(cyr[0])))
                        cmds.extend(
                            (OP_LINETO, int(a), int(b))
                            for a, b in zip(cxr[1:], cyr[1:])
                        )
                else:
                    rx, ry = clipmod.clip_ring(x, y, lo, lo, hi, hi)
                    if len(rx) < 3:
                        continue
                    cmds.append((OP_MOVETO, int(rx[0]), int(ry[0])))
                    cmds.extend(
                        (OP_LINETO, int(a), int(b)) for a, b in zip(rx[1:], ry[1:])
                    )
                    cmds.append((OP_CLOSEPATH, 0, 0))
            if cmds:
                lb.add_feature(f["type"], cmds, f["attrs"], f["id"])
        if lb.features:
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
) -> bytes | None:
    """Parent tile bytes at (oz,ox,oy) → child tile at (nz,nx,ny), or None
    if nothing survives the clip.  (nz,nx,ny) must be a descendant tile."""
    k = nz - oz
    if k < 0 or (nx >> k) != ox or (ny >> k) != oy:
        raise ValueError("child tile is not a descendant of the parent")
    scale = 1 << k
    cx0 = (nx - (ox << k)) * extent // scale
    cy0 = (ny - (oy << k)) * extent // scale
    return _derive_child(_parse_parent(parent, extent), k, cx0, cy0, buffer_px, extent)


def overzoom(tiles: DataFrame, target_z: int, buffer_px: int = 80) -> DataFrame:
    """Fan every tile at max available zoom out to ``target_z`` children.
    Input schema (z,x,y,tile); output the same, children only."""
    schema = T.StructType(
        [
            T.StructField("z", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("tile", T.BinaryType()),
        ]
    )

    extent = 4096

    def gen(batches):
        for pdf in batches:
            rows = []
            zs = pdf["z"].to_numpy()
            xs = pdf["x"].to_numpy()
            ys = pdf["y"].to_numpy()
            blobs = pdf["tile"].to_numpy()
            for i in range(len(pdf)):
                oz, ox, oy = int(zs[i]), int(xs[i]), int(ys[i])
                k = target_z - oz
                if k <= 0:
                    continue
                # decode + pre-split ONCE per parent; each child only
                # shifts/clips/encodes
                parsed = _parse_parent(mvt.gunzip_tile(bytes(blobs[i])), extent)
                scale = 1 << k
                for dx in range(1 << k):
                    for dy in range(1 << k):
                        nx, ny = (ox << k) + dx, (oy << k) + dy
                        child = _derive_child(
                            parsed, k,
                            dx * extent // scale, dy * extent // scale,
                            buffer_px, extent,
                        )
                        if child is not None:
                            rows.append(
                                {"z": target_z, "x": nx, "y": ny, "tile": child}
                            )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(gen, schema=schema)
