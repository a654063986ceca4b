"""Shared-node preservation (T24, ``-pn``).

The reference emits (prev, mid, next) vertex triples for every line/
polygon vertex, sorts them globally, and marks midpoints that appear
with ≥2 distinct neighbor pairs as unsimplifiable nodes (emit
serial.cpp:507-599; merge main.cpp:2015-2169; probe via bloom filter +
bsearch geometry.cpp:248-267).  Keeping those vertices pins shared
borders so adjacent polygons stay coincident after independent
simplification.

Spark shape: explode vertices with a neighbor-pair hash (Arrow kernel),
``groupBy(x, y).agg(countDistinct(pair))`` — one shuffle on a
well-spread key — then collect + broadcast the (small) shared set; tile
kernels receive it as required-vertex marks for Douglas-Peucker /
Visvalingam."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import features as featmod
from .features import OP_CLOSEPATH, OP_LINETO, OP_MOVETO


def _vertex_triples(cmds) -> list[tuple[int, int, int]]:
    """(x, y, neighbor_hash) per interior vertex of each run; ring
    closure wraps the neighbors.  The neighbor hash is order-independent
    (prev/next sorted, serial.hpp:287-297) so A→B→C and C→B→A agree.
    FORCED nodes — shared unconditionally, not by the 2-distinct-pairs
    rule — are emitted with nh = -1: every line run's start and end
    vertex (serial.cpp:547-552), and for polygon rings the start vertex
    plus the reference's two Douglas-Peucker anchors (the vertex
    farthest from the start, then the vertex farthest from that chord,
    ties by (y, x) draw order; serial.cpp:554-592).  The node merge
    keeps every unique entry (main.cpp:2135-2156), so one forced
    emission anywhere pins the vertex in every feature that uses it.
    ``cmds`` is a list of (op, x, y) tuples."""
    out = []
    runs: list[tuple[list, bool]] = []
    cur: list[tuple[int, int]] = []
    closed = False
    for op, x, y in cmds:
        if op == OP_MOVETO:
            if cur:
                runs.append((cur, closed))
            cur, closed = [(x, y)], False
        elif op == OP_LINETO:
            cur.append((x, y))
        elif op == OP_CLOSEPATH:
            closed = True
            runs.append((cur, True))
            cur = []
    if cur:
        runs.append((cur, closed))
    for pts, is_ring in runs:
        n = len(pts)
        if n < 2:
            continue
        for i in range(n):
            if not is_ring and (i == 0 or i == n - 1):
                continue  # line endpoints get FORCED nodes below instead
            p = pts[(i - 1) % n]
            q = pts[(i + 1) % n]
            a, b = (p, q) if p <= q else (q, p)
            h = hash((a, b)) & 0x7FFFFFFFFFFFFFFF
            out.append((pts[i][0], pts[i][1], h))
        if not is_ring:
            # line start + end are never simplified away in ANY feature
            # (serial.cpp:543-552 add_scaled_node)
            out.append((pts[0][0], pts[0][1], -1))
            out.append((pts[-1][0], pts[-1][1], -1))
        elif n >= 3:
            # ring start + the two reference DP anchors
            # (serial.cpp:554-592)
            from .geom.borders import _dist_ref

            out.append((pts[0][0], pts[0][1], -1))
            x0, y0 = pts[0]
            far = 0.0
            which = 0
            for k in range(1, n):
                d = float(pts[k][0] - x0) ** 2 + float(pts[k][1] - y0) ** 2
                if d > far or (
                    d == far
                    and (pts[k][1], pts[k][0]) < (pts[which][1], pts[which][0])
                ):
                    far = d
                    which = k
            out.append((pts[which][0], pts[which][1], -1))
            far = 0.0
            which2 = 0
            for k in range(1, n):
                d = _dist_ref(
                    pts[k][0], pts[k][1], x0, y0, pts[which][0], pts[which][1]
                )
                if d > far or (
                    d == far
                    and (pts[k][1], pts[k][0]) < (pts[which2][1], pts[which2][0])
                ):
                    far = d
                    which2 = k
            out.append((pts[which2][0], pts[which2][1], -1))
    return out


def shared_nodes(features: DataFrame, min_pairs: int = 2) -> set[tuple[int, int]]:
    """Vertices (world coords) used with ≥ ``min_pairs`` distinct
    neighbor pairs across all line/polygon features."""
    sel = features.filter(F.col("geom_type") != 1)
    if "_dl" in features.columns:
        lines = sel.select("geometry", "_dl")
    else:
        lines = sel.select("geometry", F.lit(0).cast("long").alias("_dl"))
    schema = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
            T.StructField("nh", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            dls = pdf["_dl"].to_numpy()
            for blob, dl in zip(pdf["geometry"], dls):
                rows.extend(_vertex_triples(featmod.unpack_cmds_tuples(blob, int(dl))))
            if rows:
                yield pd.DataFrame(rows, columns=["x", "y", "nh"])

    verts = lines.mapInPandas(gen, schema=schema)
    hot = (
        verts.groupBy("x", "y")
        .agg(
            F.count_distinct(F.when(F.col("nh") >= 0, F.col("nh"))).alias(
                "n_pairs"
            ),
            F.max(F.col("nh") == -1).alias("forced"),
        )
        .filter((F.col("n_pairs") >= min_pairs) | F.col("forced"))
        .collect()
    )
    return {(r["x"], r["y"]) for r in hot}


def required_mask(
    x: np.ndarray, y: np.ndarray, shared: set[tuple[int, int]]
) -> np.ndarray:
    """Boolean keep-mask for simplification: True where the vertex is a
    shared node (geometry.cpp:248-267 probe)."""
    out = np.zeros(len(x), dtype=bool)
    for i in range(len(x)):
        if (int(x[i]), int(y[i])) in shared:
            out[i] = True
    return out
