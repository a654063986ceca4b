"""Kernel-level driver-gate queries: the per-tile drop/cluster/simplify/
clean family (T5/T6, T9-T19, T32) exercised on deterministic fixtures
derived from the ``documents`` table, each with a closed-form or
transcribed DuckDB oracle.

These close the round-1 gap where ~30 per-tile operators had only pytest
coverage: every kernel here runs through its REAL implementation
(geom.clean / drop / geom.simplify) inside a Spark plan, and the oracle
recomputes the expected result independently in SQL (recursive CTEs for
the sequential greedy scans, closed forms for the constructed geometry).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .derived import _t

# ===========================================================================
# T5 — polygon clean/union (clean_or_clip_poly, clip.cpp:260-388)
# ===========================================================================
#
# Constructed per-doc polygons with analytically known positive-fill
# results: rect (valid, area w*h), bowtie (self-crossing, positive lobe
# = w*h/4), donut (outer + 2x2 hole, area w*h-4, two rings).  w,h even
# so the bowtie crossing lands on the integer grid (no snap error).


def _poly_params(d: int) -> tuple[int, int, int]:
    return 10 + 2 * (d % 7), 8 + 2 * (d % 5), d % 3


def q_polygon_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60).select("doc_id")

    def gen(batches):
        from .features import signed_area
        from .geom.clean import clean_rings

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype(int):
                w, h, m = _poly_params(d)
                if m == 0:  # valid rect
                    rings = [(np.array([0, w, w, 0]), np.array([0, 0, h, h]))]
                elif m == 1:  # bowtie
                    rings = [(np.array([0, w, w, 0]), np.array([0, h, 0, h]))]
                else:  # donut: outer + reversed 2x2 hole
                    rings = [
                        (np.array([0, w, w, 0]), np.array([0, 0, h, h])),
                        (np.array([2, 2, 4, 4]), np.array([2, 4, 4, 2])),
                    ]
                out = clean_rings(rings)
                area = int(round(sum(signed_area(x, y) for x, y in out)))
                rows.append(
                    {"doc_id": d, "n_rings": len(out), "area_clean": area}
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen, schema="doc_id long, n_rings int, area_clean long"
    ).orderBy("doc_id")


SQL_POLYGON_CLEAN = """
WITH p AS (
  SELECT doc_id,
         10 + 2 * (doc_id % 7) AS w,
         8 + 2 * (doc_id % 5) AS h,
         doc_id % 3 AS m
  FROM documents WHERE doc_id < 60)
SELECT doc_id,
       CAST(CASE WHEN m = 2 THEN 2 ELSE 1 END AS INTEGER) AS n_rings,
       CAST(CASE WHEN m = 0 THEN w * h
                 WHEN m = 1 THEN (w * h) // 4
                 ELSE w * h - 4 END AS BIGINT) AS area_clean
FROM p ORDER BY doc_id
"""


# ===========================================================================
# T6 — polygon ∩ polygon region clip (clip_poly_poly, clip.cpp:390-450)
# ===========================================================================


def q_polygon_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection/union/difference areas of two parametric rects:
    A = [0,w]x[0,h], B = A shifted by (w//2, h//2)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60).select("doc_id")

    def gen(batches):
        from .features import signed_area
        from .geom.clean import intersect_rings, subtract_rings, union_rings

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype(int):
                w, h, _ = _poly_params(d)
                ox, oy = w // 2, h // 2
                a = [(np.array([0, w, w, 0]), np.array([0, 0, h, h]))]
                b = [
                    (
                        np.array([ox, ox + w, ox + w, ox]),
                        np.array([oy, oy, oy + h, oy + h]),
                    )
                ]

                def area(rr):
                    return int(round(sum(signed_area(x, y) for x, y in rr)))

                rows.append(
                    {
                        "doc_id": d,
                        "area_inter": area(intersect_rings(a, b)),
                        "area_union": area(union_rings(a, b)),
                        "area_diff": area(subtract_rings(a, b)),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id long, area_inter long, area_union long, area_diff long",
    ).orderBy("doc_id")


SQL_POLYGON_BOOLEAN = """
WITH p AS (
  SELECT doc_id,
         10 + 2 * (doc_id % 7) AS w,
         8 + 2 * (doc_id % 5) AS h
  FROM documents WHERE doc_id < 60),
q AS (
  SELECT doc_id, w, h,
         (w - w // 2) * (h - h // 2) AS inter
  FROM p)
SELECT doc_id,
       CAST(inter AS BIGINT) AS area_inter,
       CAST(2 * w * h - inter AS BIGINT) AS area_union,
       CAST(w * h - inter AS BIGINT) AS area_diff
FROM q ORDER BY doc_id
"""


# ===========================================================================
# T19 — Douglas-Peucker distance threshold (douglas_peucker +
# distance_from_line, clip.cpp:879-1001)
# ===========================================================================


def q_dp_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: a 3-point polyline (0,0)-(L/2,dev)-(L,0) simplified at a
    doc-derived tolerance; kept-vertex count pins the kernel's
    perpendicular-distance test and threshold comparison."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120).select("doc_id")

    def gen(batches):
        from .geom.simplify import douglas_peucker

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype(int):
                L = 64 + 8 * (d % 5)
                dev = d % 13
                tol = float(3 + d % 7)
                x = np.array([0, L // 2, L], dtype=np.int64)
                y = np.array([0, dev, 0], dtype=np.int64)
                m = douglas_peucker(x, y, tol)
                rows.append({"doc_id": d, "n_kept": int(m.sum())})
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, schema="doc_id long, n_kept int").orderBy("doc_id")


# mid point kept iff its perpendicular distance to the endpoint chord
# (here simply |dev|, chord is horizontal) exceeds the tolerance
SQL_DP_SIMPLIFY = """
SELECT doc_id,
       CAST(CASE WHEN (doc_id % 13) > (3 + doc_id % 7) THEN 3 ELSE 2 END
            AS INTEGER) AS n_kept
FROM documents WHERE doc_id < 120 ORDER BY doc_id
"""


# ===========================================================================
# T13/T32 — drop-sequence priority + feature-limit top-k
# (calculate_drop_sequence tile.cpp:859-864; truncation tile.cpp:2595-2611)
# ===========================================================================


def q_drop_sequence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 doc_ids by drop-sequence priority over synthetic
    (minzoom, index) pairs.  The oracle transcribes the exact bit layout:
    out = minzoom<<59 | (bit_reverse64(index) & ~(31<<59)); priority
    order = ascending ``out`` (the kernel returns ~out as signed int64
    and keeps the largest)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")

    def gen(batches):
        from . import drop as dropmod

        for pdf in batches:
            d = pdf["doc_id"].to_numpy(dtype=np.int64)
            ix = (d * 2654435761) % (1 << 59)
            mz = d % 12
            prio = dropmod.drop_sequence(mz, ix)
            yield pd.DataFrame({"doc_id": d, "prio": prio})

    prios = docs.mapInPandas(gen, schema="doc_id long, prio long")
    # doc_id tie-break: the masked bit-reversal drops index bits 0-4, so
    # distinct docs can share a priority
    return (
        prios.orderBy(F.col("prio").desc(), F.col("doc_id"))
        .limit(20)
        .select("doc_id")
        .orderBy("doc_id")
    )


# bit_reverse64(ix) & ~(31<<59) for ix < 2^59 keeps result bits 0..58,
# where bit j of the reversal equals bit 63-j of ix — i.e. source bits
# 5..58 land at 63-b.  Sum of BIGINT shifts stays under 2^59.
SQL_DROP_SEQUENCE_TOPK = """
WITH src AS (
  SELECT doc_id,
         (doc_id * 2654435761) % (1::BIGINT << 59) AS ix,
         doc_id % 12 AS mz
  FROM documents WHERE doc_id < 200),
rev AS (
  SELECT doc_id, mz,
         (SELECT coalesce(sum(((ix >> i) & 1) << (63 - i)), 0)
          FROM generate_series(5, 58) AS t(i)) AS br
  FROM src),
pri AS (
  SELECT doc_id, (mz::BIGINT << 59) | br::BIGINT AS outv FROM rev)
SELECT doc_id FROM pri ORDER BY outv ASC, doc_id LIMIT 20
"""
# NOTE: ordering by outv ASC == kernel's priority DESC (prio = ~outv);
# final ORDER BY doc_id applied by the comparator's column sort.


def _q_drop_sequence_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_drop_sequence_topk(spark, sf_dir)


# ===========================================================================
# T11/T15 — densest-as-needed gap drop with span/target threshold
# (drop_by_gap tile.cpp:2020-2064; choose_mingap tile.cpp:754-795)
# ===========================================================================


def q_gap_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accumulate-until-mingap scan equals greedy 1-D selection by
    curve distance: keep a feature iff index - last_kept_index >= mingap.
    mingap from choose_mingap (span/target).  Oracle = recursive CTE."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select("doc_id")

    def gen(batches):
        from . import drop as dropmod

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        d = np.sort(
            np.concatenate([p["doc_id"].to_numpy(dtype=np.int64) for p in pdfs])
        )
        ix = np.sort((d * 48271) % 100000)
        gap = dropmod.gaps_in_index_order(ix)
        mingap = dropmod.choose_mingap(gap, 0.25, 0.0)
        keep = dropmod.drop_by_gap(gap, mingap)
        yield pd.DataFrame(
            {
                "n_kept": [int(keep.sum())],
                "first_ix": [int(ix[keep][0])],
                "last_ix": [int(ix[keep][-1])],
            }
        )

    # single-partition: the scan is tile-local sequential semantics (one
    # tile group); coalesce(1) mirrors the per-tile grouping
    return docs.coalesce(1).mapInPandas(
        gen, schema="n_kept long, first_ix long, last_ix long"
    )


SQL_GAP_DROP = """
WITH RECURSIVE pts AS (
  SELECT DISTINCT (doc_id * 48271) % 100000 AS ix
  FROM documents WHERE doc_id < 150),
stats AS (
  -- choose_mingap: span of finite gaps / (n * fraction); finite-gap sum
  -- telescopes to max-min
  SELECT (max(ix) - min(ix)) / (count(*) * 0.25) AS mingap,
         min(ix) AS first_ix
  FROM pts),
kept AS (
  SELECT first_ix AS ix FROM stats
  UNION ALL
  SELECT nxt FROM (
    SELECT (SELECT min(p.ix) FROM pts p, stats s
            WHERE p.ix >= kept.ix + s.mingap) AS nxt
    FROM kept) WHERE nxt IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(ix) AS BIGINT) AS first_ix,
       CAST(max(ix) AS BIGINT) AS last_ix
FROM kept
"""


# ===========================================================================
# T9 — gamma thinning (manage_gap, tile.cpp:720-750)
# ===========================================================================


def q_gamma_thin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same greedy scan with threshold = median(finite gap)^(1/gamma)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select("doc_id")
    GAMMA = 2.0

    def gen(batches):
        from . import drop as dropmod

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        d = np.concatenate([p["doc_id"].to_numpy(dtype=np.int64) for p in pdfs])
        ix = np.sort((d * 69621) % 131071)
        gap = dropmod.gaps_in_index_order(ix)
        finite = gap[np.isfinite(gap)]
        base_gap = float(np.median(finite))
        keep = dropmod.gamma_thin(gap, GAMMA, base_gap)
        yield pd.DataFrame({"n_kept": [int(keep.sum())]})

    return docs.coalesce(1).mapInPandas(gen, schema="n_kept long")


SQL_GAMMA_THIN = """
WITH RECURSIVE pts AS (
  SELECT DISTINCT (doc_id * 69621) % 131071 AS ix
  FROM documents WHERE doc_id < 150),
gaps AS (
  SELECT ix, ix - lag(ix) OVER (ORDER BY ix) AS g FROM pts),
thr AS (
  SELECT (SELECT power(median(g), 1.0 / 2.0) FROM gaps WHERE g IS NOT NULL) AS t,
         (SELECT min(ix) FROM pts) AS first_ix),
kept AS (
  SELECT first_ix AS ix FROM thr
  UNION ALL
  SELECT nxt FROM (
    SELECT (SELECT min(p.ix) FROM pts p, thr s
            WHERE p.ix >= kept.ix + s.t) AS nxt
    FROM kept) WHERE nxt IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_kept FROM kept
"""


# ===========================================================================
# T10 — greedy clustering with running centroid (tile.cpp:1993-2050)
# ===========================================================================


def q_cluster_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D projection of the cluster scan (y=0): leads + point_count.
    The oracle replays the running-centroid greedy via a recursive CTE
    row machine — identical float64 ops, so results agree exactly."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 80).select("doc_id")
    D = 40.0

    def gen(batches):
        from . import drop as dropmod

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        d = np.concatenate([p["doc_id"].to_numpy(dtype=np.int64) for p in pdfs])
        order = np.argsort((d * 40503) % 9973, kind="mergesort")
        d = d[order]
        xs = ((d * 40503) % 9973).astype(np.float64)
        ys = np.zeros(len(d))
        lead_of, _, _, count = dropmod.cluster_points(xs, ys, D * D)
        leads = np.flatnonzero(lead_of == np.arange(len(d)))
        yield pd.DataFrame(
            {
                "lead_doc": d[leads],
                "point_count": count[leads],
            }
        )

    return (
        docs.coalesce(1)
        .mapInPandas(gen, schema="lead_doc long, point_count long")
        .orderBy("lead_doc")
    )


SQL_CLUSTER_GREEDY = """
WITH RECURSIVE pts AS (
  SELECT doc_id, ((doc_id * 40503) % 9973)::DOUBLE AS x,
         row_number() OVER (ORDER BY (doc_id * 40503) % 9973, doc_id) AS rn
  FROM documents WHERE doc_id < 80),
n AS (SELECT count(*) AS total FROM pts),
walk AS (
  SELECT rn, doc_id AS lead_doc, x AS cx, 1::BIGINT AS cnt
  FROM pts WHERE rn = 1
  UNION ALL
  SELECT p.rn,
         CASE WHEN (p.x - w.cx) * (p.x - w.cx) <= 1600.0
              THEN w.lead_doc ELSE p.doc_id END,
         CASE WHEN (p.x - w.cx) * (p.x - w.cx) <= 1600.0
              THEN w.cx + (p.x - w.cx) / (w.cnt + 1) ELSE p.x END,
         CASE WHEN (p.x - w.cx) * (p.x - w.cx) <= 1600.0
              THEN w.cnt + 1 ELSE 1 END
  FROM walk w JOIN pts p ON p.rn = w.rn + 1)
SELECT lead_doc, CAST(max(cnt) AS BIGINT) AS point_count
FROM walk GROUP BY lead_doc ORDER BY lead_doc
"""


# ===========================================================================
# T17 — tiny-polygon accumulator (reduce_tiny_poly, clip.cpp:1048-1140)
# ===========================================================================


def q_tiny_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-threshold rings in sequence: each ring's fate (kept/dropped/
    placeholder) from the running-area accumulator.  Emission count over
    a prefix equals floor(cumsum/threshold²) — closed form in SQL."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select("doc_id")
    T2 = 9.0  # tiny_polygon_size = 3

    def gen(batches):
        from .geom.simplify import TinyPolygonReducer

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        d = np.sort(
            np.concatenate([p["doc_id"].to_numpy(dtype=np.int64) for p in pdfs])
        )
        red = TinyPolygonReducer(3.0)
        n_kept = n_drop = n_place = 0
        for dd in d:
            area = float(dd % 8)  # 0..7, all <= threshold² = 9
            if area == 0:
                # zero-area rings are clipping debris: no output, no
                # accumulation (clip.cpp:1122-1126)
                n_drop += 1
                continue
            # every positive area here is <= threshold², so the caller's
            # included_last_outer walk always routes it to the reducer
            r = red.consume(area, 0, 0)
            if r == ():
                n_drop += 1
            else:
                n_place += 1
        yield pd.DataFrame(
            {"n_kept": [n_kept], "n_dropped": [n_drop], "n_placeholder": [n_place]}
        )

    return docs.coalesce(1).mapInPandas(
        gen, schema="n_kept long, n_dropped long, n_placeholder long"
    )


SQL_TINY_POLY = """
-- strict-> emission with one subtract per ring (clip.cpp:1087-1097):
-- with every area <= threshold² the accumulator never exceeds 2*9
-- before an emit, so emissions over a prefix of integer areas equal
-- floor((cum - 1) / 9); zero-area rings vanish without accumulating
WITH seq AS (
  SELECT doc_id, (doc_id % 8)::BIGINT AS area
  FROM documents WHERE doc_id < 100),
c AS (SELECT sum(area) AS cum, count(*) AS n FROM seq)
SELECT CAST(0 AS BIGINT) AS n_kept,
       CAST(n - greatest(0, (cum - 1) // 9) AS BIGINT) AS n_dropped,
       CAST(greatest(0, (cum - 1) // 9) AS BIGINT) AS n_placeholder
FROM c
"""


# ===========================================================================
# T23 — shared-border joint simplification (-ab,
# find_common_edges, shared_borders.cpp:86-575)
# ===========================================================================
#
# Per doc: a horizontal stack of n adjacent squares whose shared vertical
# borders zigzag by ±2 px around the border line.  Joint arc
# simplification at tol 5 collapses every zigzag midpoint IDENTICALLY on
# both sides, so each square ends as exactly its 4 corners and the n-1
# shared borders become n-1 straight edges present in both neighbors —
# all closed-form in SQL.


def q_shared_borders(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40).select("doc_id")
    H = 20

    def gen(batches):
        from .geom.borders import find_common_edges

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype(int):
                n = 3 + d % 4
                w = 10 + 2 * (d % 5)
                feats = []
                for i in range(n):
                    x0, x1 = i * w, (i + 1) * w
                    xs, ys = [x0, x1], [0, 0]
                    if i < n - 1:  # right border zigzags going down
                        xs += [x1 + 2]
                        ys += [H // 2]
                    xs += [x1, x0]
                    ys += [H, H]
                    if i > 0:  # left border zigzags going up
                        xs += [x0 + 2]
                        ys += [H // 2]
                    feats.append(
                        [(np.array(xs, dtype=np.int64), np.array(ys, dtype=np.int64))]
                    )
                out = find_common_edges(feats, simplify_tol=5.0, extent=4096)
                nv = sum(len(r[0]) for f in out for r in f)
                # edges present in exactly two features = surviving
                # shared borders
                from collections import Counter

                cnt: Counter = Counter()
                for f in out:
                    for rx, ry in f:
                        m = len(rx)
                        for j in range(m):
                            a = (int(rx[j]), int(ry[j]))
                            b = (int(rx[(j + 1) % m]), int(ry[(j + 1) % m]))
                            cnt[(a, b) if a <= b else (b, a)] += 1
                rows.append(
                    {
                        "doc_id": d,
                        "n_feats": len([f for f in out if f]),
                        "total_verts": nv,
                        "shared_edges": sum(1 for v in cnt.values() if v == 2),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        schema="doc_id long, n_feats long, total_verts long, shared_edges long",
    ).orderBy("doc_id")


SQL_SHARED_BORDERS = """
SELECT doc_id,
       CAST(3 + doc_id % 4 AS BIGINT) AS n_feats,
       CAST(4 * (3 + doc_id % 4) AS BIGINT) AS total_verts,
       CAST(2 + doc_id % 4 AS BIGINT) AS shared_edges
FROM documents WHERE doc_id < 40 ORDER BY doc_id
"""


# ===========================================================================
# registry
# ===========================================================================

QUERIES_KERNELS = {
    "polygon_clean": q_polygon_clean,
    "polygon_boolean": q_polygon_boolean,
    "dp_simplify": q_dp_simplify,
    "drop_sequence_topk": q_drop_sequence_topk,
    "gap_drop": q_gap_drop,
    "gamma_thin": q_gamma_thin,
    "cluster_greedy": q_cluster_greedy,
    "tiny_poly": q_tiny_poly,
    "shared_borders": q_shared_borders,
}

ORACLES_KERNELS = {
    "polygon_clean": SQL_POLYGON_CLEAN,
    "polygon_boolean": SQL_POLYGON_BOOLEAN,
    "dp_simplify": SQL_DP_SIMPLIFY,
    "drop_sequence_topk": SQL_DROP_SEQUENCE_TOPK,
    "gap_drop": SQL_GAP_DROP,
    "gamma_thin": SQL_GAMMA_THIN,
    "cluster_greedy": SQL_CLUSTER_GREEDY,
    "tiny_poly": SQL_TINY_POLY,
    "shared_borders": SQL_SHARED_BORDERS,
}
