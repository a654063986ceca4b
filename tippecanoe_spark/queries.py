"""Named queries for the driver's correctness gate.

Every entry here is a pair: a PySpark implementation ``(spark, sf_dir) ->
DataFrame`` and (where SQL-expressible) an ANSI-SQL oracle DuckDB runs on
the same parquet tables.  Column names/aliases match exactly; double
aggregates are rounded identically on both sides.

Geospatial queries derive deterministic lon/lat from table keys
(pure integer arithmetic — identical in Spark and DuckDB) and then push
them through the REAL engine operators (projection, curve keys, minzoom
stamping, tiling), with the oracle re-deriving the same math in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from . import proj
from .config import TilingConfig

# shared key→lon/lat→world-coordinate helpers (Catalyst + SQL twins)
from .derived import (  # noqa: F401  (re-exported for flagship/tests)
    DERIVED_LONLAT_SQL,
    WORLD,
    _t,
    derived_lonlat_cols,
    world_xy_cols,
    world_xy_sql,
)


def morton_sql(x_s: str, y_s: str, bits: int) -> str:
    """Bit-interleave as explicit SQL (x even bits, y odd)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_s} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y_s} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def morton_col(x: F.Column, y: F.Column, bits: int) -> F.Column:
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    return out


# ===========================================================================
# Relational coverage (the generic operators under the pipeline: scans,
# filters, joins incl. broadcast, aggregations, windows, top-k)
# ===========================================================================

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg w/ partial aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join; small dims broadcast explicitly."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name")
    )


SQL_REGION_REVENUE = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + group + global top-k (the feature-limit/top-k pattern T32)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_TOP_ORDERS = """
SELECT l_orderkey, revenue, o_orderdate
FROM (
  SELECT l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_orderkey
) r JOIN orders ON l_orderkey = o_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window coverage: lag + cumulative session ids (30-min gaps) over
    events — the relational pattern behind the index-ordered scans T8/T9."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_s = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("session_no", F.sum("new_sess").over(w))
    return (
        with_s.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_events"),
            F.round(F.sum("session_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


SQL_USER_SESSIONS = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
), sess AS (
  SELECT user_id, event_id, ts, value,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM lagged
), per_sess AS (
  SELECT user_id, session_no, count(*) AS n_events,
         round(sum(value), 2) AS session_value
  FROM sess GROUP BY user_id, session_no
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_events,
       round(sum(session_value), 2) AS total_value
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


# ===========================================================================
# Geospatial operators over derived points (the engine's own math, oracled)
# ===========================================================================

def q_tile_counts_z4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points → Web-Mercator world grid → z4 tiles → per-tile counts.
    The relational skeleton of the tiling stage (geometry.cpp:52-55
    tile addressing)."""
    docs = _t(spark, sf_dir, "documents")
    lon, lat = derived_lonlat_cols(F.col("doc_id"))
    x, y = world_xy_cols(lon, lat)
    z = 4
    return (
        docs.select(
            F.shiftright(x, 32 - z).cast("int").alias("tile_x"),
            F.shiftright(y, 32 - z).cast("int").alias("tile_y"),
        )
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_features"))
        .orderBy("tile_x", "tile_y")
    )


def _sql_tile_counts(z: int) -> str:
    lon_s = DERIVED_LONLAT_SQL[0].format(k="doc_id")
    lat_s = DERIVED_LONLAT_SQL[1].format(k="doc_id")
    x_s, y_s = world_xy_sql(lon_s, lat_s)
    return f"""
SELECT CAST(({x_s} >> {32 - z}) AS INTEGER) AS tile_x,
       CAST(({y_s} >> {32 - z}) AS INTEGER) AS tile_y,
       count(*) AS n_features
FROM documents
GROUP BY 1, 2
ORDER BY tile_x, tile_y
"""


SQL_TILE_COUNTS_Z4 = _sql_tile_counts(4)


def q_quadkey_z8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton quadkey encoding at z8 (projection.cpp:159-172 semantics),
    checked bit-for-bit against explicit SQL interleave."""
    docs = _t(spark, sf_dir, "documents")
    lon, lat = derived_lonlat_cols(F.col("doc_id"))
    x, y = world_xy_cols(lon, lat)
    z = 8
    tx = F.shiftright(x, 32 - z)
    ty = F.shiftright(y, 32 - z)

    def gen(batches):
        for pdf in batches:
            qk = proj.morton_encode(
                pdf["tx"].to_numpy().astype(np.uint64),
                pdf["ty"].to_numpy().astype(np.uint64),
            ).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "quadkey": qk})

    pts = docs.select("doc_id", tx.alias("tx"), ty.alias("ty"))
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("quadkey", T.LongType())]
    )
    return (
        pts.mapInPandas(gen, schema=out_schema)
        .groupBy("quadkey")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .orderBy("quadkey")
    )


def _sql_quadkey_z8() -> str:
    lon_s = DERIVED_LONLAT_SQL[0].format(k="doc_id")
    lat_s = DERIVED_LONLAT_SQL[1].format(k="doc_id")
    x_s, y_s = world_xy_sql(lon_s, lat_s)
    m = morton_sql(f"({x_s} >> 24)", f"({y_s} >> 24)", 8)
    return f"""
SELECT {m} AS quadkey, count(*) AS n_docs, min(doc_id) AS min_doc
FROM documents
GROUP BY 1 ORDER BY quadkey
"""


SQL_QUADKEY_Z8 = _sql_quadkey_z8()


def q_feature_minzoom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-drop minzoom stamping (T8, main.cpp:299-350 semantics) on
    derived points: rank in Morton order, fractional-interval keeps at
    droprate 2.5 / basezoom 14.  Exercises the real vectorized
    minzoom_for_ranks kernel; oracle recomputes the closed form in SQL."""
    cfg = TilingConfig()
    docs = _t(spark, sf_dir, "documents")
    lon, lat = derived_lonlat_cols(F.col("doc_id"))
    x, y = world_xy_cols(lon, lat)
    tx = F.shiftright(x, 1)
    ty = F.shiftright(y, 1)

    def gen(batches):
        from .minzoom import minzoom_for_ranks

        for pdf in batches:
            mz = minzoom_for_ranks(pdf["rn"].to_numpy(), cfg)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature_minzoom": mz})

    pts = docs.select("doc_id", tx.alias("hx"), ty.alias("hy"))

    def gen_m(batches):
        for pdf in batches:
            m = proj.morton_encode(
                pdf["hx"].to_numpy().astype(np.uint64),
                pdf["hy"].to_numpy().astype(np.uint64),
            ).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "morton": m})

    sch = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("morton", T.LongType())]
    )
    with_m = pts.mapInPandas(gen_m, schema=sch)
    w = Window.orderBy("morton", "doc_id")
    ranked = with_m.withColumn("rn", F.row_number().over(w))
    sch2 = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("feature_minzoom", T.IntegerType()),
        ]
    )
    out = ranked.select("doc_id", "rn").mapInPandas(gen, schema=sch2)
    return (
        out.groupBy("feature_minzoom")
        .agg(F.count(F.lit(1)).alias("n_features"), F.min("doc_id").alias("min_doc"))
        .orderBy("feature_minzoom")
    )


def _sql_feature_minzoom() -> str:
    """SQL transcription of the exact rate-drop cascade (see minzoom.py):
    one CTE per zoom level; candidates at level i are the rows accepted at
    level i+1; acceptance uses A_k = k + least(0, runmin(cap_j + 1 - j))."""
    cfg = TilingConfig()
    bz = cfg.resolved_basezoom()
    lon_s = DERIVED_LONLAT_SQL[0].format(k="doc_id")
    lat_s = DERIVED_LONLAT_SQL[1].format(k="doc_id")
    x_s, y_s = world_xy_sql(lon_s, lat_s)
    m = morton_sql(f"(({x_s}) >> 1)", f"(({y_s}) >> 1)", 31)
    ctes = [
        f"pts AS (SELECT doc_id, {m} AS morton FROM documents)",
        "ranked AS (SELECT doc_id, row_number() OVER (ORDER BY morton, doc_id)"
        " AS rn FROM pts)",
    ]
    rejects = []
    prev = "ranked"
    for level in range(min(cfg.maxzoom, bz - 1), -1, -1):
        interval = float(np.exp(np.log(cfg.droprate) * (bz - level)))
        kv = f"kv{level}"
        ctes.append(
            f"""{kv} AS (
  SELECT doc_id, rn, row_number() OVER (ORDER BY rn) AS k,
         floor(rn / {interval!r}) + 1 AS cap
  FROM {prev})"""
        )
        ev = f"eval{level}"
        ctes.append(
            f"""{ev} AS (
  SELECT doc_id, rn,
         k + least(0, min(cap - k)
                      OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)) AS acc_a
  FROM {kv})"""
        )
        lv = f"lvl{level}"
        ctes.append(
            f"""{lv} AS (
  SELECT doc_id, rn,
         acc_a > coalesce(lag(acc_a) OVER (ORDER BY rn), 0) AS acc
  FROM {ev})"""
        )
        rejects.append(
            f"SELECT doc_id, {level + 1} AS feature_minzoom FROM {lv} WHERE NOT acc"
        )
        ctes.append(f"surv{level} AS (SELECT doc_id, rn FROM {lv} WHERE acc)")
        prev = f"surv{level}"
    rejects.append(f"SELECT doc_id, 0 AS feature_minzoom FROM {prev}")
    union = " UNION ALL ".join(rejects)
    return f"""
WITH {", ".join(ctes)},
assigned AS ({union})
SELECT CAST(feature_minzoom AS INTEGER) AS feature_minzoom,
       count(*) AS n_features, min(doc_id) AS min_doc
FROM assigned GROUP BY 1 ORDER BY feature_minzoom
"""


SQL_FEATURE_MINZOOM = _sql_feature_minzoom()


# ===========================================================================
# registry
# ===========================================================================

from .queries_ext import ORACLES_EXT, QUERIES_EXT  # noqa: E402
from .queries_kernels import ORACLES_KERNELS, QUERIES_KERNELS  # noqa: E402

QUERIES = {
    **QUERIES_KERNELS,
    "pricing_summary": q_pricing_summary,
    "region_revenue": q_region_revenue,
    "top_orders": q_top_orders,
    "user_sessions": q_user_sessions,
    "tile_counts_z4": q_tile_counts_z4,
    "quadkey_z8": q_quadkey_z8,
    "feature_minzoom": q_feature_minzoom,
    **QUERIES_EXT,
}

ORACLES = {
    **ORACLES_KERNELS,
    **ORACLES_EXT,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "region_revenue": SQL_REGION_REVENUE,
    "top_orders": SQL_TOP_ORDERS,
    "user_sessions": SQL_USER_SESSIONS,
    "tile_counts_z4": SQL_TILE_COUNTS_Z4,
    "quadkey_z8": SQL_QUADKEY_Z8,
    "feature_minzoom": SQL_FEATURE_MINZOOM,
}
