"""Statistics-driven plan refinement: -zg maxzoom guessing, basezoom and
droprate guessing (reference: main.cpp:2279-2670).

The reference computes these with one or two sequential scans over the
globally index-sorted feature stream.  The Spark shapes:

- **maxzoom guess** (main.cpp:2279-2483): Welford mean/stddev of
  log(index gaps) is just the mean/variance of log-diffs — an
  order-independent aggregate once the diffs exist.  Diffs come from a
  range-partitioned sort: each partition summarizes its own consecutive
  pairs (sum, sum-of-squares, count, dupes) plus its first/last index;
  the driver folds in the partition-boundary pairs.  One shuffle, O(P)
  driver state.
- **basezoom/droprate guess** (main.cpp:2490-2670): the per-zoom
  max-tile-count table rolls up hierarchically — count features per
  MAX_ZOOM tile once (one groupBy on the quadkey prefix), then each
  shallower zoom aggregates the CHILD TILE table (4× smaller per level),
  never re-reading features.  25 tiny aggregations over tile-level data.

Deviations (documented): the within-feature distance refinement
(dist_sum, main.cpp:2416-2427) and the gamma-adjusted planner counts
(manage_gap inside the basezoom scan) are not modeled — the first needs
per-vertex stats we don't retain at plan time, the second only matters
when planning WITH gamma; both paths fall back to the gamma=0 counts.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import TilingConfig

MAX_ZOOM = 24  # main.hpp:77
MAX_FEATURES = 50_000  # main.cpp:2567 (basezoom_marker_width 1)
TILE_COUNT_CAP = 2 * 1024 * 1024  # main.cpp:2450


def round_droprate(r: float) -> float:
    """main.cpp:1236-1238."""
    return round(r * 100000.0) / 100000.0


# ---------------------------------------------------------------------------
# gap statistics (distributed)
# ---------------------------------------------------------------------------

def gap_stats(features: DataFrame) -> dict:
    """(count, mean, m2, dupes, area_sum) of log index gaps over the
    sorted index stream — the exact quantities Welford accumulates at
    main.cpp:2313-2320, plus Σ extent for the tile-count cap."""
    spark = features.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # area_sum counts POLYGON extent only (serial.cpp:682-684) — line
    # pseudo-areas must not feed the 2M-tile maxzoom cap
    area_col = F.when(F.col("geom_type") == 3, F.col("extent")).otherwise(
        F.lit(0)
    )
    ordered = features.select(
        "index", area_col.alias("extent")
    ).repartitionByRange(parts, F.col("index")).sortWithinPartitions("index")

    def summarize(batches):
        ixs = []
        area = 0
        for pdf in batches:
            if len(pdf):
                ixs.append(pdf["index"].to_numpy(dtype=np.int64))
                area += int(pdf["extent"].to_numpy(dtype=np.int64).sum())
        if not ixs:
            return
        ix = np.concatenate(ixs)
        d = np.diff(ix)
        pos = d[d > 0].astype(np.float64)
        logs = np.log(pos)
        yield pd.DataFrame(
            {
                "n": [len(ix)],
                "first_ix": [int(ix[0])],
                "last_ix": [int(ix[-1])],
                "s1": [float(logs.sum())],
                "s2": [float((logs * logs).sum())],
                "pairs": [len(pos)],
                "dupes": [int((d == 0).sum())],
                "area": [area],
            }
        )

    rows = ordered.mapInPandas(
        summarize,
        schema="n long, first_ix long, last_ix long, s1 double, s2 double,"
        " pairs long, dupes long, area long",
    ).collect()
    rows = sorted(rows, key=lambda r: r["first_ix"])
    s1 = sum(r["s1"] for r in rows)
    s2 = sum(r["s2"] for r in rows)
    pairs = sum(r["pairs"] for r in rows)
    dupes = sum(r["dupes"] for r in rows)
    area = sum(r["area"] for r in rows)
    # partition-boundary pairs
    for a, b in zip(rows, rows[1:]):
        d = b["first_ix"] - a["last_ix"]
        if d > 0:
            lg = float(np.log(d))
            s1 += lg
            s2 += lg * lg
            pairs += 1
        elif d == 0:
            dupes += 1
    if pairs == 0:
        return {"count": 0, "mean": 0.0, "m2": 0.0, "dupes": dupes, "area_sum": area}
    mean = s1 / pairs
    m2 = s2 - pairs * mean * mean
    return {
        "count": pairs,
        "mean": mean,
        "m2": max(m2, 0.0),
        "dupes": dupes,
        "area_sum": area,
    }


def within_feature_dist_stats(features: DataFrame) -> tuple[float, int]:
    """The want_dist accumulator (serial.cpp:600-637): per feature, sort
    the curve keys of its vertices, average the log gaps between
    distinct consecutive keys, convert to pseudo-feet, and accumulate
    ``log(dist_ft) * n`` / ``n`` globally.  Captures the RESOLUTION
    WITHIN lines/polygons, which drives -zg for non-point inputs
    (main.cpp:2417-2427).  One shuffle-free pass."""
    from . import features as featmod
    from .proj import encode_index

    def summarize(batches):
        s = 0.0
        n_tot = 0
        for pdf in batches:
            for blob in pdf["geometry"]:
                ops, xs, ys = featmod.unpack_cmds(blob)
                m = (ops == 1) | (ops == 2)
                if int(m.sum()) < 2:
                    continue
                locs = np.sort(encode_index(xs[m], ys[m]).astype(np.int64))
                d = np.diff(locs)
                pos = d[d > 0].astype(np.float64)
                if len(pos) == 0:
                    continue
                avg = float(np.exp(np.log(pos).mean()))
                dist_ft = float(np.sqrt(avg)) / 33.0
                s += float(np.log(dist_ft)) * len(pos)
                n_tot += len(pos)
        yield pd.DataFrame({"s": [s], "n": [n_tot]})

    rows = features.select("geometry").mapInPandas(
        summarize, schema="s double, n long"
    ).collect()
    return float(sum(r["s"] for r in rows)), int(sum(r["n"] for r in rows))


def guess_maxzoom_from_stats(
    stats: dict, cfg: TilingConfig
) -> tuple[int, float]:
    """(maxzoom, droprate) from the gap statistics — the closed-form tail
    of main.cpp:2342-2434 (lognormal gap model, -1.5σ, pseudo-feet
    conversion, cluster-distance interaction, droprate curve fit, dupes
    adjustment, within-feature resolution override) plus the 2M-tile cap
    (main.cpp:2440-2455)."""
    count = stats["count"]
    dupes = stats["dupes"]
    droprate = cfg.droprate
    guess_rate = droprate < 0
    maxzoom = 0
    if count == 0:
        maxzoom = max(cfg.minzoom, 0)
        if guess_rate:
            droprate = 1.0
    else:
        mean = stats["mean"]
        stddev = float(np.sqrt(stats["m2"] / count))
        avg = float(np.exp(mean))
        nearby = float(np.exp(mean - 1.5 * stddev))
        nearby_ft = float(np.sqrt(nearby)) / 33.0
        want = nearby_ft / 2.0
        maxzoom = int(
            np.ceil(np.log(360.0 / (0.00000274 * want)) / np.log(2.0) - cfg.full_detail)
        )
        maxzoom = max(maxzoom, 0)

        # cluster-distance interaction (main.cpp:2377-2388)
        if cfg.cluster_distance > 0:
            while maxzoom < 32 - cfg.full_detail and maxzoom < 33 - cfg.low_detail:
                zoom_mingap = (
                    ((1 << (32 - maxzoom)) // 256 * cfg.cluster_distance) ** 2
                )
                if avg > zoom_mingap:
                    break
                maxzoom += 1

        if guess_rate:
            droprate = round_droprate(
                float(np.exp(-0.7681 * np.log(stddev) + 1.582))
            ) if stddev > 0 else 2.5
            droprate = max(droprate, 0.0)
            if dupes != 0 and droprate not in (0.0,):
                maxzoom += int(
                    np.round(np.log((dupes + count) / count) / np.log(droprate))
                )

    # within-feature resolution (main.cpp:2417-2427): for line/polygon
    # inputs the vertex spacing, not the feature spacing, sets the zoom
    dist_n = int(stats.get("dist_count", 0))
    if dist_n > 0:
        want2 = float(np.exp(stats["dist_sum"] / dist_n)) / 8.0
        mz = int(
            np.ceil(np.log(360.0 / (0.00000274 * want2)) / np.log(2.0) - cfg.full_detail)
        )
        if mz > maxzoom or count <= 0:
            maxzoom = mz

    maxzoom = max(maxzoom, 0)
    maxzoom = min(maxzoom, 32 - cfg.full_detail, 33 - cfg.low_detail)

    # 2M-tile cap from the polygon area sum (main.cpp:2440-2455)
    area_sum = stats.get("area_sum", 0)
    if area_sum > 0:
        total = 0.0
        for i in range(1, maxzoom + 1):
            total += float(np.ceil(area_sum / float((1 << (32 - i)) ** 2)))
            if total > TILE_COUNT_CAP:
                maxzoom = i - 1
                break

    # --smallest-maximum-zoom-guess floor (main.cpp:2461-2466)
    maxzoom = max(maxzoom, cfg.min_maxzoom)
    maxzoom = max(maxzoom, cfg.minzoom)
    return maxzoom, droprate


# ---------------------------------------------------------------------------
# per-zoom max tile counts (hierarchical rollup)
# ---------------------------------------------------------------------------

def max_tile_counts(features: DataFrame, upto_z: int = MAX_ZOOM) -> dict[int, int]:
    """{z: max features in any single tile at z} for z in 0..upto_z —
    the max[] table of main.cpp:2496-2585 (gamma=0 counts).  One feature
    groupBy at upto_z, then each shallower zoom rolls up the CHILD TILE
    counts (4× smaller each level)."""
    shift = 32 - upto_z
    # representative point = bbox midpoint — the same point encode_index
    # hashed, so this equals the reference's decode_index(ix) coordinates
    base = (
        features.select(
            F.shiftright(
                F.floor((F.col("minx") + F.col("maxx")) / 2).cast("long"), shift
            ).alias("tx"),
            F.shiftright(
                F.floor((F.col("miny") + F.col("maxy")) / 2).cast("long"), shift
            ).alias("ty"),
        )
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    out: dict[int, int] = {}
    cur = base
    z = upto_z
    while True:
        row = cur.agg(F.max("n").alias("m")).collect()[0]
        out[z] = int(row["m"] or 0)
        if z == 0:
            break
        cur = (
            cur.select(
                F.shiftright("tx", 1).alias("tx"),
                F.shiftright("ty", 1).alias("ty"),
                "n",
            )
            .groupBy("tx", "ty")
            .agg(F.sum("n").alias("n"))
        )
        z -= 1
    base.unpersist()
    return out


def guess_basezoom_droprate(
    maxes: dict[int, int], cfg: TilingConfig, maxzoom: int
) -> tuple[int, float]:
    """(basezoom, droprate) from the per-zoom max tile counts —
    main.cpp:2565-2634."""
    basezoom = cfg.basezoom
    droprate = cfg.droprate
    if basezoom < 0:
        basezoom = MAX_ZOOM
        for z in range(MAX_ZOOM, -1, -1):
            if maxes.get(z, 0) < MAX_FEATURES:
                basezoom = z
    if cfg.basezoom < 0 and basezoom > maxzoom:
        # "working from the other direction" (main.cpp:2590-2617)
        if droprate < 0:
            if maxzoom == 0:
                droprate = 2.5
            else:
                droprate = round_droprate(
                    float(
                        np.exp(
                            np.log(maxes[0] / max(maxes[maxzoom], 1)) / maxzoom
                        )
                    )
                )
        basezoom = 0
        for z in range(0, maxzoom + 1):
            zoomdiff = np.log(maxes[z] / MAX_FEATURES) / np.log(droprate)
            if zoomdiff + z > basezoom:
                basezoom = int(np.ceil(zoomdiff + z))
    elif droprate < 0:
        droprate = 1.0
        for z in range(basezoom - 1, -1, -1):
            interval = float(np.exp(np.log(droprate) * (basezoom - z)))
            if maxes.get(z, 0) / interval >= MAX_FEATURES:
                interval = maxes[z] / MAX_FEATURES
                droprate = round_droprate(
                    float(np.exp(np.log(interval) / (basezoom - z)))
                )
    return basezoom, droprate


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def resolve_plan(features: DataFrame, cfg: TilingConfig) -> TilingConfig:
    """Fill in guessed maxzoom (cfg.maxzoom < 0 == -zg), basezoom and
    droprate (negative == guess) from data statistics, like the plan
    refinement step of the reference lifecycle (SURVEY §3.1 step 4)."""
    maxzoom = cfg.maxzoom
    droprate = cfg.droprate
    if maxzoom < 0:
        stats = gap_stats(features)
        stats["dist_sum"], stats["dist_count"] = within_feature_dist_stats(
            features
        )
        maxzoom, droprate = guess_maxzoom_from_stats(stats, cfg)
    basezoom = cfg.basezoom
    need_rate = droprate < 0
    # reference resolves basezoom -1 to maxzoom inside the -zg branch
    # (main.cpp:2475-2477); the explicit scan only runs for -Bg (-2)
    if basezoom == -2 or need_rate:
        maxes = max_tile_counts(features)
        basezoom, droprate = guess_basezoom_droprate(
            {**maxes}, replace(cfg, basezoom=-1 if basezoom == -2 else basezoom,
                               droprate=droprate), maxzoom
        )
    if basezoom < 0:
        basezoom = maxzoom
    # the -zg marker (maxzoom = -1) makes __post_init__ clamp minzoom to
    # -1 (the minzoom > maxzoom guard); restore it now that maxzoom is
    # real — a negative minzoom leaks a phantom zz = -1 assignment level
    # into the fused pyramid (caught by the csv-suite decode byte parity:
    # a duplicate forced-keep feature in a second z0 tile row)
    minzoom = max(cfg.minzoom, 0)
    return replace(
        cfg, maxzoom=maxzoom, minzoom=min(minzoom, maxzoom),
        basezoom=basezoom, droprate=droprate,
    )
