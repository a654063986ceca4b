"""Per-tile pipeline: clip → scale → thin/drop → simplify → MVT encode.

The Spark re-expression of write_tile (reference: tile.cpp:1665-3079).
A tile group arrives as an Arrow batch of features assigned to (z,x,y);
the kernel walks them in space-filling-curve order exactly like the
reference's index-ordered feature stream.

Two-phase shape for skew (north rule / SURVEY §4 "skew handling"):

- :func:`prepare_group` — the *split-associative* stages (clip to buffered
  tile, scale to tile grid, Douglas-Peucker / Visvalingam, tiny-polygon
  reduction, too-small-line drop).  Safe to run on child-quadkey
  sub-partitions of a hot tile because each feature is processed
  independently.
- :func:`finalize_group` — the *order-dependent* stages (gamma thinning,
  clustering, as-needed drops with tile-local threshold escalation, top-k
  truncation, attribute accumulation, MVT encode + gzip + budget loop).
  Always runs once per tile, after sub-partitions are merged back in index
  order (SURVEY §7: merge *before* the sequential scans).

Threshold escalation deviates from the reference deliberately: tippecanoe
erases and re-runs a whole zoom when any tile overflows
(tile.cpp:3506-3571).  On a cluster that means recomputing the zoom's
entire lineage; instead each tile escalates its own thresholds over the
already-prepared feature batch (same monotone choose_* logic,
tile.cpp:754-857) — one pass over the data per zoom, no global barrier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import drop as dropmod
from . import mvt
from .config import TilingConfig
from .features import OP_CLOSEPATH, OP_LINETO, OP_MOVETO, signed_area
from .geom import clip as clipmod
from .geom import simplify as simpmod

WORLD_BITS = 32

# schema of prepared (tile-local) features between the two phases
PREPARED_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.IntegerType()),
        T.StructField("ty", T.IntegerType()),
        T.StructField("feature_id", T.LongType()),
        T.StructField("layer", T.StringType()),
        T.StructField("geom_type", T.IntegerType()),
        T.StructField("geometry", T.ArrayType(
            T.StructType(
                [
                    T.StructField("op", T.IntegerType()),
                    T.StructField("x", T.LongType()),
                    T.StructField("y", T.LongType()),
                ]
            )
        )),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("index", T.LongType()),
        T.StructField("extent", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("feature_minzoom", T.IntegerType()),
    ]
)

TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("tile", T.BinaryType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("raw_bytes", T.LongType()),
        T.StructField("gz_bytes", T.LongType()),
        T.StructField("passes", T.IntegerType()),
    ]
)


def buffer_world(z: int, cfg: TilingConfig) -> int:
    """Tile buffer in world units: buffer/256ths of the tile width
    (main.cpp:74 default 5)."""
    shift = WORLD_BITS - z
    return cfg.buffer << max(shift - 8, 0)


def assign_tiles(features: DataFrame, z: int, cfg: TilingConfig) -> DataFrame:
    """Tag each surviving feature with every (tx,ty) tile it touches at
    zoom z, including the buffer overhang — the Spark form of the child-
    shard rewrite (tile.cpp:443-534).  Pure Catalyst: bbox arithmetic +
    sequence/explode, so predicate pushdown on feature_minzoom and the
    bbox columns reaches the parquet scan."""
    shift = WORLD_BITS - z
    buf = buffer_world(z, cfg)
    nmax = (1 << z) - 1
    surviving = features.filter(F.col("feature_minzoom") <= F.lit(z))
    tx0 = F.greatest(F.lit(0), F.shiftright(F.col("minx") - buf, shift)).cast("int")
    tx1 = F.least(F.lit(nmax), F.shiftright(F.col("maxx") + buf, shift)).cast("int")
    ty0 = F.greatest(F.lit(0), F.shiftright(F.col("miny") - buf, shift)).cast("int")
    ty1 = F.least(F.lit(nmax), F.shiftright(F.col("maxy") + buf, shift)).cast("int")
    return (
        surviving.withColumn("tx", F.explode(F.sequence(tx0, tx1)))
        .withColumn("ty", F.explode(F.sequence(ty0, ty1)))
    )


# ---------------------------------------------------------------------------
# phase 1: prepare (clip + scale + simplify) — split-associative
# ---------------------------------------------------------------------------

def _cmds_to_rings(cmds) -> list[tuple[np.ndarray, np.ndarray]]:
    """Flat command stream → list of (x,y) vertex arrays (one per
    MOVETO..CLOSEPATH/next-MOVETO run)."""
    rings = []
    cur_x: list[int] = []
    cur_y: list[int] = []
    for c in cmds:
        op = c["op"]
        if op == OP_MOVETO:
            if cur_x:
                rings.append((np.array(cur_x, dtype=np.int64), np.array(cur_y, dtype=np.int64)))
            cur_x, cur_y = [c["x"]], [c["y"]]
        elif op == OP_LINETO:
            cur_x.append(c["x"])
            cur_y.append(c["y"])
        elif op == OP_CLOSEPATH:
            if cur_x:
                rings.append((np.array(cur_x, dtype=np.int64), np.array(cur_y, dtype=np.int64)))
            cur_x, cur_y = [], []
    if cur_x:
        rings.append((np.array(cur_x, dtype=np.int64), np.array(cur_y, dtype=np.int64)))
    return rings


def _dedupe_consecutive(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """remove_noop analog (clip.cpp:532-604): collapse zero-length linetos
    after rounding to the tile grid."""
    if len(x) <= 1:
        return x, y
    keep = np.empty(len(x), dtype=bool)
    keep[0] = True
    keep[1:] = (np.diff(x) != 0) | (np.diff(y) != 0)
    return x[keep], y[keep]


def prepare_tile_pdf(pdf: pd.DataFrame, z: int, cfg: TilingConfig) -> pd.DataFrame:
    """Clip + scale + simplify the features of one tile (or one child-quad
    sub-partition of a hot tile).  Vectorized fast path for points; python
    loop only for the line/polygon minority."""
    if len(pdf) == 0:
        return pdf.iloc[0:0]
    shift = WORLD_BITS - z
    detail = cfg.full_detail
    extent_px = 1 << detail
    buf_px = (cfg.buffer * extent_px) >> 8  # buffer in tile pixels
    tx = int(pdf["tx"].iloc[0])
    ty = int(pdf["ty"].iloc[0])
    ox = tx << shift
    oy = ty << shift
    half = 1 << (shift - detail - 1) if shift > detail else 0

    def to_px(w: np.ndarray, origin: int) -> np.ndarray:
        rel = np.asarray(w, dtype=np.int64) - origin
        if shift >= detail:
            return (rel + half) >> (shift - detail)
        return rel << (detail - shift)

    lo, hi = -buf_px, extent_px + buf_px
    gts = pdf["geom_type"].to_numpy()

    # ---- points: fully vectorized (minx==x, miny==y for points) ----
    pt_mask = gts == 1
    out_rows: list[dict] = []
    if pt_mask.any():
        sub = pdf.loc[pt_mask]
        px = to_px(sub["minx"].to_numpy(), ox)
        py = to_px(sub["miny"].to_numpy(), oy)
        inside = (px >= lo) & (px <= hi) & (py >= lo) & (py <= hi)
        sub = sub.loc[inside]
        px, py = px[inside], py[inside]
        for (_, row), xx, yy in zip(sub.iterrows(), px, py):
            out_rows.append(
                {
                    "tx": tx, "ty": ty,
                    "feature_id": row["feature_id"], "layer": row["layer"],
                    "geom_type": 1,
                    "geometry": [{"op": OP_MOVETO, "x": int(xx), "y": int(yy)}],
                    "attrs": row["attrs"], "index": row["index"],
                    "extent": row["extent"], "seq": row["seq"],
                    "feature_minzoom": row["feature_minzoom"],
                }
            )

    # ---- lines / polygons ----
    tol = cfg.simplification  # tolerance in tile pixels (res*simplification)
    tiny = simpmod.TinyPolygonReducer(cfg.tiny_polygon_size)
    for _, row in pdf.loc[~pt_mask].iterrows():
        gt = int(row["geom_type"])
        rings = _cmds_to_rings(row["geometry"])
        cmds: list[tuple[int, int, int]] = []
        if gt == 2:
            for rx, ry in rings:
                rx, ry = to_px(rx, ox), to_px(ry, oy)
                for cx, cy in clipmod.clip_line(rx, ry, lo, lo, hi, hi):
                    cx, cy = _dedupe_consecutive(cx, cy)
                    if len(cx) < 2 or (
                        z < cfg.maxzoom and simpmod.line_is_too_small(cx, cy, 1.0)
                    ):
                        continue
                    if tol > 0 and z < cfg.maxzoom:
                        if cfg.visvalingam:
                            m = simpmod.visvalingam(cx, cy, tol * tol)
                        else:
                            m = simpmod.douglas_peucker(cx, cy, tol)
                        cx, cy = cx[m], cy[m]
                    cmds.append((OP_MOVETO, int(cx[0]), int(cy[0])))
                    cmds.extend((OP_LINETO, int(a), int(b)) for a, b in zip(cx[1:], cy[1:]))
        else:
            for rx, ry in rings:
                rx, ry = to_px(rx, ox), to_px(ry, oy)
                cx, cy = clipmod.clip_ring(rx, ry, lo, lo, hi, hi)
                if len(cx) < 3:
                    continue
                cx, cy = _dedupe_consecutive(cx, cy)
                if len(cx) < 3:
                    continue
                area = signed_area(cx, cy)
                red = tiny.consume(area, int(cx[0]), int(cy[0])) if z < cfg.maxzoom else None
                if red is not None:
                    if red == ():  # dropped into the accumulator
                        continue
                    cx, cy = red  # placeholder square
                elif tol > 0 and z < cfg.maxzoom and len(cx) > 4:
                    if cfg.visvalingam:
                        m = simpmod.visvalingam(cx, cy, tol * tol)
                    else:
                        m = simpmod.douglas_peucker(cx, cy, tol)
                    # keep at least a triangle
                    if m.sum() >= 3:
                        cx, cy = cx[m], cy[m]
                cmds.append((OP_MOVETO, int(cx[0]), int(cy[0])))
                cmds.extend((OP_LINETO, int(a), int(b)) for a, b in zip(cx[1:], cy[1:]))
                cmds.append((OP_CLOSEPATH, 0, 0))
        if not cmds:
            continue
        out_rows.append(
            {
                "tx": tx, "ty": ty,
                "feature_id": row["feature_id"], "layer": row["layer"],
                "geom_type": gt,
                "geometry": [{"op": o, "x": a, "y": b} for o, a, b in cmds],
                "attrs": row["attrs"], "index": row["index"],
                "extent": row["extent"], "seq": row["seq"],
                "feature_minzoom": row["feature_minzoom"],
            }
        )
    cols = [f.name for f in PREPARED_SCHEMA.fields]
    if not out_rows:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    return pd.DataFrame(out_rows, columns=cols)


# ---------------------------------------------------------------------------
# phase 2: finalize (order-dependent drops + encode) — once per tile
# ---------------------------------------------------------------------------

def finalize_tile_pdf(pdf: pd.DataFrame, z: int, cfg: TilingConfig) -> pd.DataFrame:
    """Sequential stages + MVT encode with tile-local budget escalation."""
    cols = ["z", "x", "y", "tile", "n_in", "n_out", "raw_bytes", "gz_bytes", "passes"]
    if len(pdf) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    tx = int(pdf["tx"].iloc[0])
    ty = int(pdf["ty"].iloc[0])
    n_in = len(pdf)
    pdf = pdf.sort_values(["index", "seq"], kind="mergesort").reset_index(drop=True)
    index = pdf["index"].to_numpy(dtype=np.int64)
    gap = dropmod.gaps_in_index_order(index)
    keep = np.ones(n_in, dtype=bool)

    # gamma thinning (T9)
    if cfg.gamma > 0:
        base_gap = float(np.nanmedian(gap[np.isfinite(gap)])) if n_in > 1 else 0.0
        keep &= dropmod.gamma_thin(gap, cfg.gamma, base_gap)

    # clustering (T10): merge index-order neighbors within cluster_distance
    cluster_attrs: dict[int, dict] = {}
    if cfg.cluster_distance > 0 and (pdf["geom_type"].to_numpy() == 1).all():
        xs = np.array([g[0]["x"] for g in pdf["geometry"]], dtype=np.float64)
        ys = np.array([g[0]["y"] for g in pdf["geometry"]], dtype=np.float64)
        d = float(cfg.cluster_distance)
        lead_of, cx, cy, count = dropmod.cluster_points(xs, ys, d * d)
        keep &= lead_of == np.arange(n_in)
        for i in np.flatnonzero(keep):
            if count[i] > 1:
                cluster_attrs[i] = {
                    "clustered": "true",
                    "point_count": str(int(count[i])),
                    "sqrt_point_count": str(round(float(np.sqrt(count[i])), 2)),
                    "point_count_abbreviated": dropmod.point_count_abbreviated(int(count[i])),
                    "_cx": int(round(cx[i])), "_cy": int(round(cy[i])),
                }

    # as-needed drops with tile-local monotone escalation (T11-T13 + E4)
    seq_prio = dropmod.drop_sequence(
        pdf["feature_minzoom"].to_numpy(dtype=np.int64), index
    )
    extent_arr = pdf["extent"].to_numpy(dtype=np.int64)
    mingap, minextent, minseq = 0.0, 0.0, -np.inf
    passes = 0
    max_feat = cfg.max_tile_features if cfg.max_tile_features > 0 else None
    if cfg.limit_tile_feature_count > 0:
        max_feat = min(max_feat or 10**18, cfg.limit_tile_feature_count)

    def current_keep() -> np.ndarray:
        k = keep.copy()
        if cfg.drop_densest_as_needed and mingap > 0:
            k &= dropmod.drop_by_gap(gap, mingap)
        if cfg.drop_smallest_as_needed and minextent > 0:
            k &= dropmod.drop_by_extent(extent_arr, minextent)
        if minseq > -np.inf:
            k &= dropmod.drop_by_sequence(seq_prio, minseq)
        return k

    def encode(k: np.ndarray) -> tuple[bytes, int, int]:
        sel = pdf.loc[k]
        # attribute accumulation onto survivors (T33): dropped features
        # fold onto the previous kept feature in index order
        accum: dict[int, dict[str, str]] = {}
        if cfg.accumulate_attrs and not k.all():
            kept_pos = np.flatnonzero(k)
            if len(kept_pos):
                owner = np.searchsorted(kept_pos, np.arange(n_in), side="right") - 1
                owner = kept_pos[np.clip(owner, 0, len(kept_pos) - 1)]
                for name, op in cfg.accumulate_attrs.items():
                    for lead in kept_pos:
                        group = np.flatnonzero((owner == lead) | (np.arange(n_in) == lead))
                        vals = [
                            pdf["attrs"].iloc[int(g)].get(name)
                            for g in group
                            if pdf["attrs"].iloc[int(g)] and name in pdf["attrs"].iloc[int(g)]
                        ]
                        if vals:
                            accum.setdefault(int(lead), {})[name] = (
                                dropmod.accumulate_attribute(op, vals)
                            )
        layers: dict[str, mvt.LayerBuilder] = {}
        n_out = 0
        order_vals = None
        if cfg.order_by:
            order_vals = sel["attrs"].map(
                lambda a: float(a.get(cfg.order_by, "nan")) if a else float("nan")
            ).to_numpy()
            order = np.argsort(-order_vals if cfg.order_descending else order_vals, kind="mergesort")
            sel = sel.iloc[order]
        for pos, row in sel.iterrows():
            lb = layers.get(row["layer"])
            if lb is None:
                lb = layers[row["layer"]] = mvt.LayerBuilder(
                    row["layer"], extent=1 << cfg.full_detail
                )
            attrs = dict(row["attrs"] or {})
            extra = cluster_attrs.get(pos)
            cmds = [(c["op"], c["x"], c["y"]) for c in row["geometry"]]
            if extra:
                cmds = [(OP_MOVETO, extra["_cx"], extra["_cy"])]
                attrs.update({kk: vv for kk, vv in extra.items() if not kk.startswith("_")})
            if pos in accum:
                attrs.update(accum[pos])
            if cfg.exclude_all_attrs:
                attrs = {}
            else:
                if cfg.include_attrs:
                    attrs = {a: b for a, b in attrs.items() if a in cfg.include_attrs}
                for ex in cfg.exclude_attrs:
                    attrs.pop(ex, None)
            typed = {a: mvt.coerce_string_value(b) for a, b in attrs.items()}
            lb.add_feature(int(row["geom_type"]), cmds, typed, int(row["feature_id"]))
            n_out += 1
        raw = mvt.encode_tile(layers.values())
        return raw, n_out, len(raw)

    k = current_keep()
    while True:
        passes += 1
        if max_feat and k.sum() > max_feat:
            # feature-budget overflow: keep the top-k by drop-sequence
            # priority (T13/T32, tile.cpp:2595-2611)
            pos = np.flatnonzero(k)
            order = np.argsort(-seq_prio[pos], kind="mergesort")[:max_feat]
            k = np.zeros(n_in, dtype=bool)
            k[pos[np.sort(order)]] = True
        raw, n_out, raw_bytes = encode(k)
        gz = mvt.gzip_tile(raw)
        if len(gz) <= cfg.max_tile_size or passes >= 5 or n_out <= 1:
            break
        # size overflow: escalate thresholds monotonically (tile.cpp:754-857)
        frac = cfg.max_tile_size / len(gz) * 0.9
        if cfg.drop_densest_as_needed:
            mingap = dropmod.choose_threshold(gap[k], frac, mingap)
        elif cfg.drop_smallest_as_needed:
            minextent = dropmod.choose_threshold(
                extent_arr[k].astype(np.float64), frac, minextent
            )
        else:
            kp = seq_prio[k].astype(np.float64)
            minseq = max(minseq, float(np.quantile(kp, 1.0 - frac)))
        k = current_keep()
    return pd.DataFrame(
        [
            {
                "z": z, "x": tx, "y": ty, "tile": gz,
                "n_in": n_in, "n_out": n_out,
                "raw_bytes": raw_bytes, "gz_bytes": len(gz),
                "passes": passes,
            }
        ],
        columns=cols,
    )


# ---------------------------------------------------------------------------
# Spark drivers for one zoom
# ---------------------------------------------------------------------------

def tiles_for_zoom(
    features: DataFrame,
    z: int,
    cfg: TilingConfig,
    hot_counts: dict[tuple[int, int], int] | None = None,
    split_budget: int = 200_000,
) -> DataFrame:
    """Build all tiles at zoom z.  ``hot_counts`` (tile → feature count,
    from a cheap pre-aggregation) routes oversized tiles through the
    hierarchical split-and-merge path: sub-partition by child quadkey at a
    depth that bounds per-task features, prepare each sub-partition
    independently, then merge per tile for the sequential stages."""
    assigned = assign_tiles(features, z, cfg)
    shift = WORLD_BITS - z

    hot = {t: c for t, c in (hot_counts or {}).items() if c > split_budget}

    def prep(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return prepare_tile_pdf(pdf, z, cfg)

    def fin(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return finalize_tile_pdf(pdf, z, cfg)

    if not hot:
        def whole(key, pdf: pd.DataFrame) -> pd.DataFrame:
            return finalize_tile_pdf(prepare_tile_pdf(pdf, z, cfg), z, cfg)

        return assigned.groupBy("tx", "ty").applyInPandas(whole, schema=TILE_SCHEMA)

    # split depth per hot tile: enough child-quad levels that each
    # sub-partition holds <= split_budget features
    max_count = max(hot.values())
    depth = 1
    while (max_count >> (2 * depth)) > split_budget and depth < 8:
        depth += 1
    hot_keys = [(t[0] << z) | t[1] for t in hot]
    hot_col = F.shiftleft(F.col("tx").cast("long"), z).bitwiseOR(F.col("ty").cast("long"))
    is_hot = hot_col.isin(hot_keys)

    cold = assigned.filter(~is_hot)
    hot_df = assigned.filter(is_hot)
    # child-quadkey salt: the next `depth` zoom levels of the feature's
    # representative point (spatially coherent split — SURVEY §4)
    sub_shift = shift - depth
    salt = (
        F.shiftleft(
            F.shiftright(F.col("minx"), sub_shift) - F.shiftleft(F.col("tx").cast("long"), depth),
            depth,
        )
        + (F.shiftright(F.col("miny"), sub_shift) - F.shiftleft(F.col("ty").cast("long"), depth))
    )
    prepared_hot = (
        hot_df.withColumn("salt", salt.cast("int"))
        .groupBy("tx", "ty", "salt")
        .applyInPandas(lambda k, p: prepare_tile_pdf(p, z, cfg), schema=PREPARED_SCHEMA)
    )
    hot_tiles = prepared_hot.groupBy("tx", "ty").applyInPandas(fin, schema=TILE_SCHEMA)

    def whole(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return finalize_tile_pdf(prepare_tile_pdf(pdf, z, cfg), z, cfg)

    cold_tiles = cold.groupBy("tx", "ty").applyInPandas(whole, schema=TILE_SCHEMA)
    return cold_tiles.unionByName(hot_tiles)
