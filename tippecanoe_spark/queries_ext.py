"""Extended correctness-gate queries: tiling kernel, spatial joins, kNN,
filter language, dedup family, similarity search, text analysis,
multimodal plumbing.

Same contract as :mod:`tippecanoe_spark.queries`: each Spark query has a
DuckDB oracle where SQL-expressible (identical column aliases both
sides); genuinely non-relational ops (LSH candidate generation, blocked
greedy dedup, fake-codec plumbing) are registered without oracles and get
the driver's rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import dedup as dedupmod
from . import join as joinmod
from . import similarity as simmod
from . import textops
from .config import TilingConfig
from .filters import compile_filter
from .derived import (
    DERIVED_LONLAT_SQL,
    _t,
    derived_lonlat_cols,
    world_xy_cols,
    world_xy_sql,
)

WORLD = 1 << 32


def _doc_world_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lon, lat = derived_lonlat_cols(F.col("doc_id"))
    x, y = world_xy_cols(lon, lat)
    return docs.select("doc_id", x.alias("wx"), y.alias("wy"))


def _doc_world_xy_sql() -> str:
    lon_s = DERIVED_LONLAT_SQL[0].format(k="doc_id")
    lat_s = DERIVED_LONLAT_SQL[1].format(k="doc_id")
    x_s, y_s = world_xy_sql(lon_s, lat_s)
    return f"SELECT doc_id, {x_s} AS wx, {y_s} AS wy FROM documents"


# ===========================================================================
# tiling kernel, oracle-checked (the REAL per-tile pipeline on counts)
# ===========================================================================

def q_tiles_z4_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → full engine path (serialize → minzoom stamp → tile
    assign → per-tile clip/encode kernel) at z4 with buffer 0 and dropping
    off, so per-tile in/out counts are exactly the relational tile counts
    — the oracle pins the whole kernel's bookkeeping."""
    from .features import serialize
    from .flagship import doc_point_features
    from .minzoom import stamp_minzoom
    from .tile import tiles_for_zoom

    cfg = TilingConfig(buffer=0, no_feature_dropping=True, maxzoom=4)
    feats = serialize(doc_point_features(spark, sf_dir), cfg)
    stamped = stamp_minzoom(feats, cfg)
    tiles = tiles_for_zoom(stamped, 4, cfg)
    return (
        tiles.select(
            F.col("x").alias("tile_x"),
            F.col("y").alias("tile_y"),
            F.col("n_in").alias("n_in"),
            F.col("n_out").alias("n_out"),
        )
        .orderBy("tile_x", "tile_y")
    )


def _sql_tiles_z4_kernel() -> str:
    # Reference-faithful membership (serial.cpp:30-31, 267; clip_point
    # closed interval): coords are geometry_scale-quantized at ingest
    # (gscale = 32 - (full_detail 12 + maxzoom 4) = 16, round-half-up),
    # and a quantized point exactly on a tile edge belongs to BOTH
    # adjacent tiles — coverage is [ (q-1)>>28, q>>28 ] clamped to 0..15.
    lon_s = DERIVED_LONLAT_SQL[0].format(k="doc_id")
    lat_s = DERIVED_LONLAT_SQL[1].format(k="doc_id")
    x_s, y_s = world_xy_sql(lon_s, lat_s)
    return f"""
WITH q AS (
  SELECT ((({x_s}) + 32768) >> 16) << 16 AS qx,
         ((({y_s}) + 32768) >> 16) << 16 AS qy
  FROM documents),
b AS (
  SELECT greatest(0, (qx - 1) >> 28) AS xlo, least(15, qx >> 28) AS xhi,
         greatest(0, (qy - 1) >> 28) AS ylo, least(15, qy >> 28) AS yhi
  FROM q),
emit AS (
  SELECT tx.tile_x, ty.tile_y
  FROM b,
  UNNEST(CASE WHEN xhi > xlo THEN [xlo, xhi] ELSE [xlo] END) AS tx(tile_x),
  UNNEST(CASE WHEN yhi > ylo THEN [ylo, yhi] ELSE [ylo] END) AS ty(tile_y))
SELECT CAST(tile_x AS INTEGER) AS tile_x, CAST(tile_y AS INTEGER) AS tile_y,
       count(*) AS n_in, count(*) AS n_out
FROM emit GROUP BY 1, 2 ORDER BY tile_x, tile_y
"""


# ===========================================================================
# point-in-polygon broadcast join (J5)
# ===========================================================================

def _nation_rect(k: int) -> tuple[int, int, int, int]:
    """Deterministic disjoint world-grid rectangle for nation key k
    (5x5 grid, each cell's [2%,18%] interior band)."""
    col, row = k % 5, k // 5
    x0 = (col * 20 + 2) * WORLD // 100
    x1 = (col * 20 + 18) * WORLD // 100
    y0 = (row * 20 + 2) * WORLD // 100
    y1 = (row * 20 + 18) * WORLD // 100
    return x0, y0, x1, y1


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs (points) ∈ 25 nation rectangles via the grid-bucketed
    broadcast polygon index; -1 = outside all."""
    polys = []
    for k in range(25):
        x0, y0, x1, y1 = _nation_rect(k)
        polys.append(
            (
                k,
                [
                    (
                        np.array([x0, x1, x1, x0], dtype=np.int64),
                        np.array([y0, y0, y1, y1], dtype=np.int64),
                    )
                ],
            )
        )
    ix = joinmod.PolygonIndex(polys, grid_zoom=5)
    pts = _doc_world_xy(spark, sf_dir)
    out = joinmod.pip_join(pts, ix, x_col="wx", y_col="wy")
    return (
        out.groupBy("polygon_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .orderBy("polygon_id")
    )


def _sql_pip_join() -> str:
    return f"""
WITH pts AS ({_doc_world_xy_sql()}),
nk AS (SELECT n_nationkey AS k,
              ((n_nationkey % 5) * 20 + 2) * {WORLD} // 100 AS x0,
              ((n_nationkey % 5) * 20 + 18) * {WORLD} // 100 AS x1,
              ((n_nationkey // 5) * 20 + 2) * {WORLD} // 100 AS y0,
              ((n_nationkey // 5) * 20 + 18) * {WORLD} // 100 AS y1
       FROM nation),
tagged AS (
  SELECT p.doc_id, coalesce(max(nk.k), -1) AS polygon_id
  FROM pts p LEFT JOIN nk
    ON p.wx >= nk.x0 AND p.wx < nk.x1 AND p.wy >= nk.y0 AND p.wy < nk.y1
  GROUP BY p.doc_id)
SELECT polygon_id, count(*) AS n_docs, min(doc_id) AS min_doc
FROM tagged GROUP BY 1 ORDER BY polygon_id
"""


# ===========================================================================
# kNN (exact integer d², grid index with guaranteed-radius expansion)
# ===========================================================================

def q_knn_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each doc_id < 50: sum of squared distances (exact int64) to
    its 3 nearest neighbor docs on the >>12 world grid — the fully
    distributed grid kNN join (no corpus collect / driver index; the
    100 TB-safe shape)."""
    pts = _doc_world_xy(spark, sf_dir).select(
        "doc_id",
        F.shiftright("wx", 12).alias("rx"),
        F.shiftright("wy", 12).alias("ry"),
    )
    probes = pts.filter(F.col("doc_id") < 50)
    nn = joinmod.knn_grid_join(
        pts, probes, k=3, cell_bits=14,
        id_col="doc_id", x_col="rx", y_col="ry",
    )
    return (
        nn.groupBy(F.col("probe_id").alias("doc_id"))
        .agg(F.sum("d2").cast("long").alias("d2_sum"))
        .orderBy("doc_id")
    )


def _sql_knn_docs() -> str:
    return f"""
WITH pts AS (SELECT doc_id, wx >> 12 AS rx, wy >> 12 AS ry
             FROM ({_doc_world_xy_sql()})),
probes AS (SELECT * FROM pts WHERE doc_id < 50),
pairs AS (
  SELECT p.doc_id,
         (p.rx - c.rx) * (p.rx - c.rx) + (p.ry - c.ry) * (p.ry - c.ry) AS d2
  FROM probes p JOIN pts c ON c.doc_id != p.doc_id),
ranked AS (
  SELECT doc_id, d2, row_number() OVER (PARTITION BY doc_id ORDER BY d2) AS rn
  FROM pairs)
SELECT doc_id, CAST(sum(d2) AS BIGINT) AS d2_sum FROM ranked WHERE rn <= 3
GROUP BY doc_id ORDER BY doc_id
"""


# ===========================================================================
# filter expression language (§2.7) compiled to Catalyst
# ===========================================================================

_FILTER_AST = [
    "all",
    ["==", "lang", "en"],
    [">=", "n_chars", 150],
    ["!in", "source", "src0", "src3"],
]


def q_feature_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("feature_id"),
        F.lit("docs").alias("layer"),
        F.lit(1).alias("geom_type"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("attrs"),
    )
    return feats.filter(compile_filter(_FILTER_AST)).agg(
        F.count(F.lit(1)).alias("n_match"), F.min("feature_id").alias("min_doc")
    )


SQL_FEATURE_FILTER = """
SELECT count(*) AS n_match, min(doc_id) AS min_doc
FROM documents
WHERE lang = 'en' AND n_chars >= 150 AND source NOT IN ('src0', 'src3')
"""


# ===========================================================================
# attribute join (J2)
# ===========================================================================

def q_attr_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("feature_id"),
        F.create_map(
            F.lit("nk"), (F.col("doc_id") % 25).cast("string")
        ).alias("attrs"),
    )
    dim = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = joinmod.attribute_join(feats, dim, "nk", "n_nationkey", how="inner")
    return (
        joined.select(
            F.col("attrs").getItem("n_name").alias("n_name"), "feature_id"
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("feature_id").alias("min_doc"))
        .orderBy("n_name")
    )


SQL_ATTR_JOIN = """
SELECT n_name, count(*) AS n_docs, min(doc_id) AS min_doc
FROM documents JOIN nation ON doc_id % 25 = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ===========================================================================
# dedup family
# ===========================================================================

def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a 3-word prefix key (hash-groupBy shape)."""
    docs = _t(spark, sf_dir, "documents")
    key = F.concat_ws(" ", F.slice(F.split(F.col("text"), r"\s+"), 1, 3))
    groups = dedupmod.duplicate_groups(docs, key, "doc_id")
    return groups.orderBy("dup_key")


SQL_EXACT_DUP_GROUPS = """
SELECT array_to_string(string_split_regex(text, '\\s+')[1:3], ' ') AS dup_key,
       count(*) AS n_dups, min(doc_id) AS keeper_id
FROM documents
GROUP BY 1 HAVING count(*) > 1 ORDER BY dup_key
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard pairs (inverted-index join, no cross
    join) among doc_id < 120.  Threshold 0.02 sits just under the
    corpus's max pair similarity (~0.03) so the result is non-empty."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return dedupmod.ngram_jaccard_pairs(docs, threshold=0.02).orderBy(
        "id_a", "id_b"
    )


SQL_NGRAM_JACCARD = """
WITH docs AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w
  FROM documents WHERE doc_id < 120),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
  FROM docs WHERE len(w) >= 3),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s)) AS inter,
         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, round(inter * 1.0 / uni, 6) AS jaccard
FROM pairs WHERE round(inter * 1.0 / uni, 6) >= 0.02 AND inter > 0
ORDER BY id_a, id_b
"""


def _with_mutated_neardups(docs: DataFrame, n: int = 20) -> DataFrame:
    """Union the corpus with near-duplicate copies of its first ``n``
    docs (id + 100000, last two words dropped) — known high-Jaccard pairs
    for the LSH ops to find."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    mutated = (
        docs.filter(F.col("doc_id") < n)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn(
            "text",
            F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(1)))),
        )
    )
    return docs.unionByName(mutated)


def _planted_recall_floor(
    pairs: DataFrame, n_planted: int, id_lt: int, bound: float
) -> DataFrame:
    """ann_lsh-style property oracle: the DuckDB side computes
    (n_planted, ceil(bound·n_planted)) from the relational ground truth;
    the Spark side saturates its recalled-planted-pair count at the same
    floor, so recall >= bound ⇒ both sides emit identical numbers and a
    recall regression below the floor hash-mismatches numerically."""
    found = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 100000) & (F.col("id_a") < id_lt)
    ).agg(F.count_distinct("id_a").alias("nf"))
    import math

    floor = int(math.ceil(bound * n_planted))
    return found.select(
        F.lit(n_planted).cast("long").alias("n_planted"),
        F.least(F.col("nf"), F.lit(floor)).cast("long").alias("n_found_floor"),
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup recall over the corpus + 20 planted mutated
    near-dups: every planted pair has Jaccard >= the 0.5 threshold, and
    the seeded banding recalls >= 90% of them (measured 20/20 at
    sf0.001/sf0.01) — asserted via the saturating-floor property oracle
    (the banding itself is not SQL-replayable)."""
    docs = _with_mutated_neardups(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    )
    pairs = dedupmod.minhash_dedup_pairs(docs, threshold=0.5)
    return _planted_recall_floor(pairs, 20, 20, 0.9)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pigeonhole near-dup recall over corpus + 20 planted
    near-dups (measured 17-19/20 recalled; floor 0.75)."""
    docs = _with_mutated_neardups(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    )
    sigs = dedupmod.simhash_signatures(docs)
    pairs = dedupmod.simhash_near_pairs(sigs, max_hamming=8)
    return _planted_recall_floor(pairs, 20, 20, 0.75)


def q_spatial_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked greedy spatial dedup on doc points.  The oracle replays
    the exact per-cell greedy (keep a point iff no already-kept point of
    its cell is within r) as a recursive CTE carrying the kept set as a
    LIST — float64 arithmetic matches IEEE between engines."""
    pts = _doc_world_xy(spark, sf_dir).select(
        F.col("doc_id").alias("feature_id"),
        F.col("wx").alias("minx"),
        F.col("wy").alias("miny"),
        F.col("doc_id").alias("index"),
        F.lit(0).alias("seq"),
    )
    out = joinmod.spatial_dedup(pts, radius=float(1 << 27))
    return out.select(F.col("feature_id").alias("doc_id")).orderBy("doc_id")


def _sql_spatial_dedup() -> str:
    # cell key replicates join.spatial_dedup: bits = ceil(log2(r)) + 2
    # = 29 for r = 2^27; greedy order inside a cell is (index, seq) =
    # (doc_id, 0)
    return f"""
WITH RECURSIVE pts AS (
  SELECT doc_id, CAST(wx AS DOUBLE) AS x, CAST(wy AS DOUBLE) AS y,
         ((wx >> 29) << 32) | (wy >> 29) AS cell,
         row_number() OVER (
           PARTITION BY ((wx >> 29) << 32) | (wy >> 29) ORDER BY doc_id
         ) AS rn
  FROM ({_doc_world_xy_sql()})),
walk AS (
  SELECT cell, rn, doc_id, true AS kept, [{{'kx': x, 'ky': y}}] AS ks
  FROM pts WHERE rn = 1
  UNION ALL
  SELECT p.cell, p.rn, p.doc_id,
         len(list_filter(w.ks, k ->
           (k.kx - p.x) * (k.kx - p.x) + (k.ky - p.y) * (k.ky - p.y)
             <= 18014398509481984.0)) = 0,
         CASE WHEN len(list_filter(w.ks, k ->
           (k.kx - p.x) * (k.kx - p.x) + (k.ky - p.y) * (k.ky - p.y)
             <= 18014398509481984.0)) = 0
              THEN list_append(w.ks, {{'kx': p.x, 'ky': p.y}}) ELSE w.ks END
  FROM walk w JOIN pts p ON p.cell = w.cell AND p.rn = w.rn + 1)
SELECT doc_id FROM walk WHERE kept ORDER BY doc_id
"""


# ===========================================================================
# similarity search
# ===========================================================================

def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-3 for probes vec_id < 20.  The cosine
    is emitted as floor(round(cos,6)*100) — an integer both engines derive
    from identical doubles with identical ops, sidestepping the
    Spark-decimal-vs-DuckDB-binary rounding divergence (numpy pairwise vs
    DuckDB sequential summation differ ~1 ulp; round-to-6 absorbs that,
    then the float*100 floor is deterministic)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    out = simmod.brute_topk(emb, probes, k=3)
    return out.select(
        "probe_id",
        "neighbor_id",
        F.floor(F.col("cosine") * 100).cast("int").alias("cosine_pct"),
    ).orderBy("probe_id", "neighbor_id")


SQL_EMBEDDING_TOPK = """
WITH pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(c.embedding, p.embedding) AS cos
  FROM embeddings p JOIN embeddings c ON c.vec_id != p.vec_id
  WHERE p.vec_id < 20),
ranked AS (
  SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM pairs)
SELECT probe_id, neighbor_id,
       CAST(floor(round(cos, 6) * 100) AS INTEGER) AS cosine_pct
FROM ranked WHERE rn <= 3 ORDER BY probe_id, neighbor_id
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k + measured recall vs brute force.
    Oracle-checked facts: the ground-truth count is relational (k probes
    × 3 true neighbors) and the multi-probe LSH recall must clear a 0.6
    floor (measured ≈0.9 at sf0.01; the bound is the contract — a recall
    regression fails the gate, while hash-level jitter does not)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    brute = simmod.brute_topk(emb, probes, k=3).select(
        "probe_id", F.col("neighbor_id").alias("bn")
    )
    approx = simmod.lsh_topk(emb, probes, k=3, n_planes=6, n_tables=8).select(
        "probe_id", F.col("neighbor_id").alias("an")
    )
    hits = brute.join(
        approx, (brute.probe_id == approx.probe_id) & (F.col("bn") == F.col("an")), "left"
    )
    # n_hit_floor saturates at the 0.6·n_true recall floor, which the
    # DuckDB oracle computes independently from the relational ground
    # truth: recall >= 0.6 ⇒ both sides emit ceil(0.6·n_true) exactly;
    # a recall regression below the floor hash-mismatches numerically.
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.least(
            F.sum(F.when(F.col("an").isNotNull(), 1).otherwise(0)),
            F.ceil(F.count(F.lit(1)) * 0.6),
        )
        .cast("long")
        .alias("n_hit_floor"),
    )


def _sql_ann_lsh() -> str:
    return """
SELECT CAST(3 * count(*) AS BIGINT) AS n_true,
       CAST(ceil(0.6 * 3 * count(*)) AS BIGINT) AS n_hit_floor
FROM embeddings WHERE vec_id < 20
"""


def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate recall (LSH bucket + exact cosine
    verify).  Near-dups planted: vec_id+100000 copies of the first 10
    vectors with +0.01 on every component (cosine ≈ 0.99); the 6-plane
    single-table bucket recalls ~0.76 of them in expectation (measured
    7-8/10), asserted at a 0.6 floor via the saturating property
    oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    planted = (
        emb.filter(F.col("vec_id") < 10)
        .withColumn("vec_id", F.col("vec_id") + 100000)
        .withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x + F.lit(0.01)),
        )
    )
    corpus = emb.unionByName(planted)
    pairs = simmod.cosine_near_dup_pairs(corpus, threshold=0.9, n_planes=6)
    return _planted_recall_floor(pairs, 10, 10, 0.6)


# ===========================================================================
# text analysis
# ===========================================================================

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q = docs.withColumn("q", textops.quality_score(F.col("text")))
    return (
        q.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
        .orderBy("lang", "source")
    )


SQL_TEXT_QUALITY = r"""
WITH scored AS (
  SELECT lang, source,
    round(
      0.3 * (CASE WHEN length(text) >= 100 AND length(text) <= 10000 THEN 1.0
                  WHEN length(text) >= 20 THEN 0.5 ELSE 0.0 END)
    + 0.25 * (CASE WHEN length(text) * 1.0 / greatest(
                len(list_filter(string_split_regex(text, '\s+'), t -> t != '')), 1)
                BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.3 END)
    + 0.25 * (CASE WHEN
        len(list_filter(string_split_regex(text, '\s+'),
            t -> lower(t) IN ('the','a','of','and','to','in','is','for','on','with')))
        * 1.0 / greatest(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')), 1)
        >= 0.05 THEN 1.0
        ELSE (len(list_filter(string_split_regex(text, '\s+'),
              t -> lower(t) IN ('the','a','of','and','to','in','is','for','on','with')))
              * 1.0 / greatest(len(list_filter(string_split_regex(text, '\s+'), t -> t != '')), 1)) / 0.05 END)
    + 0.2 * (length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0
             / greatest(length(text), 1)), 6) AS q
  FROM documents)
SELECT lang, source, count(*) AS n_docs, round(avg(q), 4) AS avg_quality
FROM scored GROUP BY lang, source ORDER BY lang, source
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    stats = textops.token_stats(docs)
    return (
        stats.groupBy("source")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_distinct_tokens").alias("total_distinct"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


SQL_TOKEN_STATS = r"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_tokens,
         len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x != ''))) AS n_distinct
  FROM documents)
SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_distinct) AS BIGINT) AS total_distinct, max(n_tokens) AS max_tokens
FROM t GROUP BY source ORDER BY source
"""


def q_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pred = docs.withColumn("predicted", textops.detect_language(F.col("text")))
    return (
        pred.groupBy("predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .orderBy("predicted")
    )


def _sql_lang_detect() -> str:
    def cnt(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in textops.STOPWORDS[lang])
        return (
            r"len(list_filter(string_split_regex(text, '\s+'),"
            f" x -> lower(x) IN ({words})))"
        )

    return f"""
WITH c AS (
  SELECT doc_id, {cnt('en')} AS c_en, {cnt('de')} AS c_de, {cnt('fr')} AS c_fr
  FROM documents),
p AS (
  SELECT doc_id,
         CASE WHEN greatest(c_en, c_de, c_fr) <= 0 THEN 'und'
              WHEN c_de = greatest(c_en, c_de, c_fr) THEN 'de'
              WHEN c_en = greatest(c_en, c_de, c_fr) THEN 'en'
              ELSE 'fr' END AS predicted
  FROM c)
SELECT predicted, count(*) AS n_docs, min(doc_id) AS min_doc
FROM p GROUP BY predicted ORDER BY predicted
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint property oracle (ann_lsh pattern): the
    polynomial scan itself is not SQL-expressible, but two exact
    relational consequences of a correct 61-bit rolling hash are —
    (a) byte-identical texts get identical fingerprints (determinism),
    asserted by planting 20 exact copies (doc_id+100000) and counting
    recovered planted collisions, and (b) distinct texts get distinct
    fingerprints on this fixed corpus (injectivity in practice: expected
    cross-collisions ~ n²/2^62 ≈ 0), asserted as
    countDistinct(fingerprint) == countDistinct(text).  DuckDB computes
    both expectations straight from the text column."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    fp = textops.with_fingerprint(docs.unionByName(planted))
    matched = (
        fp.filter(F.col("doc_id") < 20)
        .alias("a")
        .join(
            fp.filter(F.col("doc_id") >= 100000).alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 100000)
            & (F.col("b.fingerprint") == F.col("a.fingerprint")),
        )
        .agg(F.count_distinct("a.doc_id").alias("n_planted_matched"))
    )
    stats = fp.agg(
        F.countDistinct("fingerprint").alias("n_distinct_fp"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return stats.crossJoin(matched).select(
        "n_docs", "n_distinct_fp", "n_planted_matched"
    )


def q_overzoom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overzoom (J4): build z3 tiles from doc points, derive z5 children
    through the tile-byte path (parse parent MVT → rescale → clip →
    re-encode), and report per-child-tile decoded feature counts.  At
    buffer 0 with point features these are pure relational facts: a doc
    point lands in child (wx>>27, wy>>27) — the oracle derives them from
    the raw table while Spark goes the long way through tile bytes."""
    from . import mvt as mvtmod
    from . import overzoom as ozmod
    from . import tile as tilemod
    from .features import serialize
    from .flagship import doc_point_features
    from .minzoom import stamp_minzoom

    cfg = TilingConfig(buffer=0, no_feature_dropping=True, maxzoom=3)
    feats = serialize(doc_point_features(spark, sf_dir), cfg)
    stamped = stamp_minzoom(feats, cfg)
    parents = tilemod.tiles_for_zoom(stamped, 3, cfg)
    children = ozmod.overzoom(
        parents.select("z", "x", "y", "tile"), target_z=5, buffer_px=0
    )

    def count_feats(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ns = [
                sum(len(l["features"]) for l in mvtmod.decode_tile(bytes(b)))
                for b in pdf["tile"].to_numpy()
            ]
            yield pd.DataFrame(
                {
                    "tile_x": pdf["x"].to_numpy(),
                    "tile_y": pdf["y"].to_numpy(),
                    "n": np.array(ns, dtype=np.int64),
                }
            )

    return (
        children.mapInPandas(count_feats, schema="tile_x int, tile_y int, n long")
        .orderBy("tile_x", "tile_y")
    )


def _sql_overzoom() -> str:
    # Reference-faithful membership + closed-interval clip parity: coords
    # are geometry_scale-quantized at ingest (gscale = 32 - (12 + 3) =
    # 17, round-half-up).  A quantized point on a z5 child boundary
    # (multiple of 2^27) is emitted into BOTH adjacent children — whether
    # the boundary is between siblings (closed [lo, hi] px clip inside
    # one parent) or between parents (the point rode BOTH parents through
    # the inclusive bbox membership, serial.cpp:267 + quick_check/
    # clip_point, and each parent contributes its edge child).  Coverage
    # per axis is [ (q-1)>>27, q>>27 ] clamped to 0..31.
    return f"""
WITH pts AS ({_doc_world_xy_sql()}),
q AS (
  SELECT ((wx + 65536) >> 17) << 17 AS qx,
         ((wy + 65536) >> 17) << 17 AS qy
  FROM pts),
b AS (
  SELECT greatest(0, (qx - 1) >> 27) AS xlo, least(31, qx >> 27) AS xhi,
         greatest(0, (qy - 1) >> 27) AS ylo, least(31, qy >> 27) AS yhi
  FROM q),
emit AS (
  SELECT tx.tile_x, ty.tile_y
  FROM b,
  UNNEST(CASE WHEN xhi > xlo THEN [xlo, xhi] ELSE [xlo] END) AS tx(tile_x),
  UNNEST(CASE WHEN yhi > ylo THEN [ylo, yhi] ELSE [ylo] END) AS ty(tile_y))
SELECT CAST(tile_x AS INTEGER) AS tile_x, CAST(tile_y AS INTEGER) AS tile_y,
       count(*) AS n
FROM emit GROUP BY 1, 2 ORDER BY tile_x, tile_y
"""


def q_tile_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tile-join merge (J1): two tilesets built from doc halves merge into
    per-tile unions (rows-only)."""
    from . import join as joinmod
    from . import mvt as mvtmod
    from . import tile as tilemod
    from .features import serialize
    from .flagship import doc_point_features
    from .minzoom import stamp_minzoom

    cfg = TilingConfig(buffer=0, no_feature_dropping=True, maxzoom=2)
    raw = doc_point_features(spark, sf_dir)
    half_a = raw.filter(F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    half_b = raw.filter(~F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    t_a = tilemod.tiles_for_zoom(stamp_minzoom(serialize(half_a, cfg), cfg), 2, cfg)
    t_b = tilemod.tiles_for_zoom(stamp_minzoom(serialize(half_b, cfg), cfg), 2, cfg)
    merged = joinmod.tile_join([t_a, t_b])

    def count_feats(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = pdf["tile"].to_numpy()
            ns = [
                sum(len(l["features"]) for l in mvtmod.decode_tile(bytes(b)))
                for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "z": pdf["z"].to_numpy(),
                    "x": pdf["x"].to_numpy(),
                    "y": pdf["y"].to_numpy(),
                    "n": np.array(ns, dtype=np.int64),
                }
            )

    counted = merged.mapInPandas(
        count_feats, schema="z int, x int, y int, n long"
    )
    return counted.agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum("n").cast("long").alias("n_features"),
    )


# buffer 0 ⇒ every doc point lands in exactly one z2 tile; the merged
# tileset must therefore hold every doc once, across the distinct tile
# set — fully relational facts DuckDB can derive from the same table
def _sql_tile_join() -> str:
    return f"""
WITH pts AS ({_doc_world_xy_sql()})
SELECT CAST(count(DISTINCT (wx >> 30) * 4 + (wy >> 30)) AS BIGINT) AS n_tiles,
       CAST(count(*) AS BIGINT) AS n_features
FROM pts
"""


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal REAL decode: synthetic media carries genuine PNG / BMP
    / PCM-WAV / concatenated-PPM-video payloads whose dimensions derive
    arithmetically from media_id; the pure-stdlib codecs
    (media_codecs.py: zlib inflate + PNG unfilter, BMP rows, wave)
    recover width/height/frames/duration FROM THE BYTES, and DuckDB
    recomputes the same facts from the id arithmetic — a full
    hash-matched oracle over an actual decode round trip."""
    from . import multimodal

    media = multimodal.synthetic_media(spark, 120, partitions=4)
    decoded = multimodal.decode_media(media)
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("width").alias("sum_w"),
            F.sum("height").alias("sum_h"),
            F.sum("n_frames").alias("sum_frames"),
            F.sum("duration_ms").alias("sum_ms"),
        )
        .orderBy("kind")
    )


def _sql_multimodal() -> str:
    # the _synth_params arithmetic (multimodal.py): i%4==0 PNG
    # (16+i%32, 8+i%16), 1 BMP (12+i%24, 6+i%12), 2 WAV (ms = (800 +
    # (i%32)*40)/8), 3 raw-PPM video (side 8+i%8, frames 2+i%7)
    return """
WITH ids AS (SELECT UNNEST(range(120)) AS i),
m AS (
  SELECT i,
    CASE i % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'image'
               WHEN 2 THEN 'audio' ELSE 'video' END AS kind,
    CASE i % 4 WHEN 0 THEN 16 + i % 32 WHEN 1 THEN 12 + i % 24
               WHEN 2 THEN 0 ELSE 8 + i % 8 END AS w,
    CASE i % 4 WHEN 0 THEN 8 + i % 16 WHEN 1 THEN 6 + i % 12
               WHEN 2 THEN 0 ELSE 8 + i % 8 END AS h,
    CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 1
               WHEN 2 THEN 0 ELSE 2 + i % 7 END AS frames,
    CASE i % 4 WHEN 2 THEN (800 + (i % 32) * 40) // 8 ELSE 0 END AS ms
  FROM ids)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(w) AS BIGINT) AS sum_w,
       CAST(sum(h) AS BIGINT) AS sum_h,
       CAST(sum(frames) AS BIGINT) AS sum_frames,
       CAST(sum(ms) AS BIGINT) AS sum_ms
FROM m GROUP BY kind ORDER BY kind
"""


def q_vardepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-depth pyramid (-at, tile.cpp:1701-1713/3055-3066): doc
    points at buffer 0 with dropping off make EVERY z1 tile a confirmed
    full-detail leaf, so the whole z2..z5 pyramid is pruned.  Output =
    per-tile decoded feature counts of the entire build — if pruning
    failed, extra z>=2 rows break the row count; if leafing failed, the
    z1 encode (at detail 29) would carry different content.  The oracle
    is the pure relational fact: the build is exactly the z1 occupancy
    histogram."""
    from . import mvt as mvtmod
    from . import tile as tilemod
    from .features import serialize
    from .flagship import doc_point_features
    from .minzoom import stamp_minzoom

    cfg = TilingConfig(
        minzoom=1,
        maxzoom=5,
        buffer=0,
        no_feature_dropping=True,
        variable_depth_pyramid=True,
    )
    feats = serialize(doc_point_features(spark, sf_dir), cfg)
    stamped = stamp_minzoom(feats, cfg)
    tiles = tilemod.tiles_fused(stamped, cfg)

    def count_feats(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ns = [
                sum(len(l["features"]) for l in mvtmod.decode_tile(bytes(b)))
                for b in pdf["tile"].to_numpy()
            ]
            yield pd.DataFrame(
                {
                    "tile_z": pdf["z"].to_numpy(),
                    "tile_x": pdf["x"].to_numpy(),
                    "tile_y": pdf["y"].to_numpy(),
                    "n": np.array(ns, dtype=np.int64),
                }
            )

    return tiles.mapInPandas(
        count_feats, schema="tile_z int, tile_x int, tile_y int, n long"
    ).orderBy("tile_z", "tile_x", "tile_y")


def _sql_vardepth() -> str:
    return f"""
SELECT 1 AS tile_z, CAST(wx >> 31 AS INTEGER) AS tile_x,
       CAST(wy >> 31 AS INTEGER) AS tile_y, count(*) AS n
FROM ({_doc_world_xy_sql()})
GROUP BY 2, 3 ORDER BY 1, 2, 3
"""


def _doc_points_with_attrs(
    spark: SparkSession, sf_dir: str, attr_cols: dict
) -> DataFrame:
    """documents → raw point-feature rows with a custom attrs map (every
    value stringified — the serial_val everything-is-a-string model)."""
    docs = _t(spark, sf_dir, "documents")
    lon, lat = derived_lonlat_cols(F.col("doc_id"))
    kv = []
    for k, c in attr_cols.items():
        kv += [F.lit(k), c.cast("string")]
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(0).alias("mention_seq"),
        F.lit("docs").alias("layer"),
        F.lit(1).alias("geom_type"),
        F.array(F.struct(lon.alias("lon"), lat.alias("lat"))).alias("coords"),
        F.create_map(*kv).alias("attrs"),
    )


def _tiles_z2(
    spark: SparkSession, sf_dir: str, cfg, attr_cols: dict,
    idless: bool = False,
):
    from .features import serialize
    from .minzoom import stamp_minzoom
    from .tile import tiles_for_zoom

    raw = _doc_points_with_attrs(spark, sf_dir, attr_cols)
    feats = serialize(raw, cfg)
    if idless:
        # drop the synthetic stable ids (negative feature_id = no id):
        # coalcmp merges only id-less identical features (tile.cpp:122-133)
        feats = feats.withColumn(
            "feature_id",
            F.when(F.col("feature_id") >= 0, -F.col("feature_id") - 1)
            .otherwise(F.col("feature_id")),
        )
    stamped = stamp_minzoom(feats, cfg)
    return tiles_for_zoom(stamped, 2, cfg)


# ===========================================================================
# T30 — order-by attribute (-o/--order-by, tile.cpp write-phase ordering)
# ===========================================================================

def q_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline at z2 with --order-descending-by on an injective
    rank attribute: the DECODED per-tile feature sequence must equal the
    SQL window ordering — pins the write-phase sort, not just the flag."""
    from . import mvt as mvtmod

    cfg = TilingConfig(
        buffer=0, no_feature_dropping=True, maxzoom=2,
        order_by="rank", order_descending=True,
    )
    tiles = _tiles_z2(
        spark, sf_dir, cfg,
        {"rank": (F.col("doc_id") * 7919) % 99991, "doc": F.col("doc_id")},
    )

    def dec(batches):
        for pdf in batches:
            rows = []
            for x_, y_, blob in zip(pdf["x"], pdf["y"], pdf["tile"]):
                for layer in mvtmod.decode_tile(bytes(blob)):
                    for pos, f in enumerate(layer["features"]):
                        rows.append(
                            {
                                "tile_x": int(x_), "tile_y": int(y_),
                                "pos": pos, "doc_id": int(f["attrs"]["doc"]),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(
        dec, schema="tile_x int, tile_y int, pos long, doc_id long"
    ).orderBy("tile_x", "tile_y", "pos")


def _sql_order_by() -> str:
    return f"""
WITH pts AS ({_doc_world_xy_sql()})
SELECT CAST(wx >> 30 AS INTEGER) AS tile_x, CAST(wy >> 30 AS INTEGER) AS tile_y,
       row_number() OVER (PARTITION BY wx >> 30, wy >> 30
                          ORDER BY (doc_id * 7919) % 99991 DESC) - 1 AS pos,
       doc_id
FROM pts ORDER BY tile_x, tile_y, pos
"""


# ===========================================================================
# T29 — reorder + coalesce identical features (-ao/-ac, tile.cpp:2520-2546)
# ===========================================================================

def q_reorder_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """With identical attrs everywhere and NO feature ids, -ao makes
    every tile's points one adjacent run and -ac merges the run into a
    single multipoint: each tile must decode to exactly ONE feature
    carrying ALL the points.  (Features carrying distinct ids never
    coalesce — coalcmp compares has_id/id, tile.cpp:122-133 — so the
    synthetic stable ids are dropped here.)"""
    from . import mvt as mvtmod

    cfg = TilingConfig(
        buffer=0, no_feature_dropping=True, maxzoom=2,
        reorder_features=True, coalesce_features=True,
    )
    tiles = _tiles_z2(spark, sf_dir, cfg, {"kind": F.lit("d")}, idless=True)

    def dec(batches):
        for pdf in batches:
            rows = []
            for x_, y_, blob in zip(pdf["x"], pdf["y"], pdf["tile"]):
                for layer in mvtmod.decode_tile(bytes(blob)):
                    rows.append(
                        {
                            "tile_x": int(x_), "tile_y": int(y_),
                            "n_feats": len(layer["features"]),
                            "n_points": sum(
                                len(f["cmds"]) for f in layer["features"]
                            ),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(
        dec, schema="tile_x int, tile_y int, n_feats long, n_points long"
    ).orderBy("tile_x", "tile_y")


def _sql_reorder_coalesce() -> str:
    return f"""
WITH pts AS ({_doc_world_xy_sql()})
SELECT CAST(wx >> 30 AS INTEGER) AS tile_x, CAST(wy >> 30 AS INTEGER) AS tile_y,
       CAST(1 AS BIGINT) AS n_feats, count(*) AS n_points
FROM pts GROUP BY 1, 2 ORDER BY tile_x, tile_y
"""


# ===========================================================================
# T32+T33 — feature-limit truncation + attribute accumulation
# (tile.cpp:2595-2611 top-k by drop sequence; attribute.cpp:92-188 fold)
# ===========================================================================

def q_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z2 build truncated to 5 features/tile with --accumulate-attribute
    val:sum.  Reference -O semantics (layer_features.resize,
    tile.cpp:2595-2611): the limit keeps the FIRST 5 features per
    (tile, layer) in curve order and the truncated tail vanishes
    WITHOUT preservation, so with no other dropping active every
    survivor carries its own val.  (Full -E accumulation parity —
    rate-drop victims folding onto survivors, empty-clip streams,
    fall-through keeps — is pinned by test_accumulate_fixture_parity
    against the reference's accumulate golden.)"""
    from . import mvt as mvtmod

    cfg = TilingConfig(
        buffer=0, no_feature_dropping=True, maxzoom=2,
        limit_tile_feature_count=5,
        accumulate_attrs={"val": "sum"},
    )
    tiles = _tiles_z2(
        spark, sf_dir, cfg,
        {"val": F.col("doc_id") % 101, "doc": F.col("doc_id")},
    )

    def dec(batches):
        for pdf in batches:
            rows = []
            for x_, y_, blob in zip(pdf["x"], pdf["y"], pdf["tile"]):
                for layer in mvtmod.decode_tile(bytes(blob)):
                    for f in layer["features"]:
                        rows.append(
                            {
                                "tile_x": int(x_), "tile_y": int(y_),
                                "doc_id": int(f["attrs"]["doc"]),
                                "val": int(float(f["attrs"]["val"])),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(
        dec, schema="tile_x int, tile_y int, doc_id long, val long"
    ).orderBy("tile_x", "tile_y", "doc_id")


def _sql_accumulate() -> str:
    lon_s = DERIVED_LONLAT_SQL[0].format(k="doc_id")
    lat_s = DERIVED_LONLAT_SQL[1].format(k="doc_id")
    x_s, y_s = world_xy_sql(lon_s, lat_s)
    # feature index = quadkey_index(rep_point) = morton(y>>1 even bits,
    # x>>1 odd bits); drop priority DESC == bit-reversed index ASC
    # (calculate_drop_sequence, tile.cpp:859-864 — same transcription as
    # SQL_DROP_SEQUENCE_TOPK, here over the 62-bit real curve key).
    # Interleave inlined (not imported from .queries: circular import).
    terms = []
    for b in range(31):
        terms.append(f"((((({y_s}) >> 1) >> {b}) & 1) << {2 * b})")
        terms.append(f"((((({x_s}) >> 1) >> {b}) & 1) << {2 * b + 1})")
    ix = "(" + " | ".join(terms) + ")"
    return f"""
WITH src AS (
  SELECT doc_id, doc_id % 101 AS val,
         ({x_s}) >> 30 AS tx, ({y_s}) >> 30 AS ty,
         {ix} AS ix
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tx, ty ORDER BY ix, doc_id) AS rn
  FROM src)
SELECT CAST(tx AS INTEGER) AS tile_x, CAST(ty AS INTEGER) AS tile_y,
       doc_id, CAST(val AS BIGINT) AS val
FROM ranked WHERE rn <= 5 ORDER BY 1, 2, 3
"""


# ===========================================================================
# T35 — tilestats (mbtiles.cpp:206-300)
# ===========================================================================

def q_tilestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z2 build → the real sinks.tilestats accumulator: per-layer feature
    counts, dominant geometry, and per-attribute distinct-value counts
    are plain relational facts."""
    cfg = TilingConfig(buffer=0, no_feature_dropping=True, maxzoom=2)
    tiles = _tiles_z2(spark, sf_dir, cfg, {"lang": F.col("lang")})

    def agg(batches):
        from .sinks import tilestats

        rows = []
        for pdf in batches:
            rows.extend({"tile": bytes(b)} for b in pdf["tile"].to_numpy())
        st = tilestats(rows)
        out = []
        for layer in st["layers"]:
            for a in layer["attributes"]:
                out.append(
                    {
                        "layer": layer["layer"],
                        "feat_count": layer["count"],
                        "geometry": layer["geometry"],
                        "attribute": a["attribute"],
                        "value_count": a["count"],
                        "att_type": a["type"],
                    }
                )
        yield pd.DataFrame(out)

    return tiles.coalesce(1).mapInPandas(
        agg,
        schema=(
            "layer string, feat_count long, geometry string, "
            "attribute string, value_count long, att_type string"
        ),
    ).orderBy("layer", "attribute")


def _sql_tilestats() -> str:
    return """
SELECT 'docs' AS layer, count(*) AS feat_count, 'Point' AS geometry,
       'lang' AS attribute,
       CAST(count(DISTINCT lang) AS BIGINT) AS value_count,
       'string' AS att_type
FROM documents
"""


# ===========================================================================
# registry
# ===========================================================================

QUERIES_EXT = {
    "tiles_z4_kernel": q_tiles_z4_kernel,
    "pip_join": q_pip_join,
    "knn_docs": q_knn_docs,
    "feature_filter": q_feature_filter,
    "attr_join": q_attr_join,
    "exact_dup_groups": q_exact_dup_groups,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "spatial_dedup": q_spatial_dedup,
    "embedding_topk": q_embedding_topk,
    "ann_lsh": q_ann_lsh,
    "cosine_near_dup": q_cosine_near_dup,
    "text_quality": q_text_quality,
    "token_stats": q_token_stats,
    "lang_detect": q_lang_detect,
    "fingerprint": q_fingerprint,
    "multimodal": q_multimodal,
    "overzoom": q_overzoom,
    "tile_join": q_tile_join,
    "vardepth_pyramid": q_vardepth,
    "order_by": q_order_by,
    "reorder_coalesce": q_reorder_coalesce,
    "accumulate_truncate": q_accumulate,
    "tilestats": q_tilestats,
}

ORACLES_EXT = {
    "tiles_z4_kernel": _sql_tiles_z4_kernel(),
    "pip_join": _sql_pip_join(),
    "knn_docs": _sql_knn_docs(),
    "feature_filter": SQL_FEATURE_FILTER,
    "attr_join": SQL_ATTR_JOIN,
    "exact_dup_groups": SQL_EXACT_DUP_GROUPS,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "text_quality": SQL_TEXT_QUALITY,
    "token_stats": SQL_TOKEN_STATS,
    "lang_detect": _sql_lang_detect(),
    "tile_join": _sql_tile_join(),
    "overzoom": _sql_overzoom(),
    "spatial_dedup": _sql_spatial_dedup(),
    "ann_lsh": _sql_ann_lsh(),
    "vardepth_pyramid": _sql_vardepth(),
    "order_by": _sql_order_by(),
    "reorder_coalesce": _sql_reorder_coalesce(),
    "accumulate_truncate": _sql_accumulate(),
    "tilestats": _sql_tilestats(),
    "minhash_pairs": """
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(ceil(0.9 * count(*)) AS BIGINT) AS n_found_floor
FROM documents WHERE doc_id < 20
""",
    "simhash_pairs": """
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(ceil(0.75 * count(*)) AS BIGINT) AS n_found_floor
FROM documents WHERE doc_id < 20
""",
    "cosine_near_dup": """
SELECT CAST(count(*) AS BIGINT) AS n_planted,
       CAST(ceil(0.6 * count(*)) AS BIGINT) AS n_found_floor
FROM embeddings WHERE vec_id < 10
""",
    # the rolling-hash scan is not DuckDB-replayable, but its relational
    # consequences are (see q_fingerprint): planted exact copies must
    # collide, everything else must not, so the fingerprint-distinct
    # count equals the text-distinct count over corpus+planted
    "fingerprint": """
WITH base AS (SELECT doc_id, text FROM documents),
planted AS (SELECT doc_id + 100000 AS doc_id, text FROM base WHERE doc_id < 20),
a AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT coalesce(text, '')) AS BIGINT) AS n_distinct_fp,
       CAST((SELECT count(*) FROM base WHERE doc_id < 20) AS BIGINT)
           AS n_planted_matched
FROM a
""",
    # multimodal: full oracle — synthetic payloads are REAL PNG/BMP/WAV/
    # raw-PPM bytes, the pure-stdlib codecs decode them, and the oracle
    # recomputes the planted dimensions from media_id arithmetic
    "multimodal": _sql_multimodal(),
}
