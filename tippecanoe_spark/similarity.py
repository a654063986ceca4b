"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path, and embedding-cosine near-duplicate detection.

Scale shape: the probe set (queries) is small relative to the corpus, so
the corpus streams through executors while the probes broadcast — the same
build/probe asymmetry as the PIP join.  For corpus×corpus near-dup, LSH
bucketing turns the O(n²) into a per-bucket join exactly like MinHash
banding in :mod:`tippecanoe_spark.dedup`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat, norms


def brute_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) probe matrix, stream the
    corpus in Arrow batches, compute batch×probe dot products with one
    matmul, keep per-probe running top-k via a final groupBy.

    Output: (probe_id, neighbor_id, cosine) — k rows per probe."""
    spark = corpus.sparkSession
    p_ids, p_mat, p_norms = _collect_matrix(probes, id_col, vec_col)
    bp = spark.sparkContext.broadcast((p_ids, p_mat / p_norms[:, None]))
    schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gen(batches):
        pids, pmat = bp.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ pmat.T  # corpus_batch × probes
            # partial top-k INSIDE the kernel: emit <= k rows per probe
            # per batch (same (cosine desc, id asc) order as the final
            # window, so the cross-batch reduce sees every contender) —
            # the intermediate relation is O(k·|probes|·batches), not
            # |corpus|×|probes|
            out_p, out_n, out_c = [], [], []
            # k+1 so a probe's own row (filtered after the kernel when
            # exclude_self) can't evict a true neighbor from the batch
            kk = min(k + 1, len(ids))
            for j in range(len(pids)):
                col = sims[:, j]
                if len(ids) > kk * 4:
                    cand = np.argpartition(-col, kk * 2 - 1)[: kk * 2]
                    # widen to the full tie group at the boundary cosine:
                    # argpartition's arbitrary tie subset could otherwise
                    # exclude the smallest-id tied neighbors the final
                    # (cosine desc, id asc) window would select
                    cand = np.flatnonzero(col >= col[cand].min())
                else:
                    cand = np.arange(len(ids))
                order = cand[np.lexsort((ids[cand], -col[cand]))][:kk]
                out_p.append(np.full(len(order), pids[j]))
                out_n.append(ids[order])
                out_c.append(col[order])
            yield pd.DataFrame(
                {
                    "probe_id": np.concatenate(out_p),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    all_sims = corpus.mapInPandas(gen, schema=schema)
    if exclude_self:
        all_sims = all_sims.filter(F.col("probe_id") != F.col("neighbor_id"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        all_sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    n_tables: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of ``n_planes`` projections →
    integer bucket, repeated for ``n_tables`` independent plane sets
    (multi-table LSH — the standard recall lever: a near pair only has
    to collide in ONE table).  Output (id, table, bucket); one pass over
    the input emits ``n_tables`` rows per vector."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    spark = df.sparkSession
    bpl = spark.sparkContext.broadcast(planes)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def gen(batches):
        pl = bpl.value
        nt, npl, _ = pl.shape
        weights = 1 << np.arange(npl, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            ids = pdf[id_col].to_numpy(np.int64)
            # (n, nt, npl) signs in one gemm: planes reshaped (nt*npl, dim)
            signs = (mat @ pl.reshape(nt * npl, -1).T) > 0
            buckets = (
                signs.reshape(len(mat), nt, npl).astype(np.int64) @ weights
            )  # (n, nt)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, nt),
                    "table": np.tile(np.arange(nt, dtype=np.int32), len(mat)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.mapInPandas(gen, schema=schema)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    multiprobe: int = 1,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: brute force restricted to the probe's LSH
    bucket(s).  ``multiprobe=1`` additionally probes every bucket at
    Hamming distance 1 from the query's sign pattern (flip each plane
    bit); ``n_tables`` independent plane sets multiply recall (a true
    neighbor only needs to collide in one).  The corpus side is still
    read once — it emits n_tables bucket rows per vector in a single
    pass, and candidates are deduped before ranking."""
    cb = hyperplane_buckets(corpus, n_planes, id_col, vec_col, dim, n_tables=n_tables)
    pb = hyperplane_buckets(probes, n_planes, id_col, vec_col, dim, n_tables=n_tables)
    corpus_b = corpus.join(cb.withColumnRenamed("id", id_col), id_col)
    probes_b = probes.join(pb.withColumnRenamed("id", id_col), id_col)
    if multiprobe >= 1:
        flips = F.array(
            F.lit(0), *[F.lit(1 << b) for b in range(n_planes)]
        )
        probes_b = probes_b.withColumn(
            "bucket",
            F.explode(
                F.transform(flips, lambda m: F.col("bucket").bitwiseXOR(m))
            ),
        )
    joined = (
        corpus_b.alias("c")
        .join(
            F.broadcast(probes_b.alias("p")),
            (F.col("c.bucket") == F.col("p.bucket"))
            & (F.col("c.table") == F.col("p.table")),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col(f"c.{vec_col}"), F.col(f"p.{vec_col}"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.{vec_col}"), lambda v: v * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    sim = dot / (norm("c") * norm("p"))
    pairs = (
        joined.select(
            F.col(f"p.{id_col}").alias("probe_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            sim.alias("cosine"),
        )
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        # a pair colliding in several tables (or several probe buckets)
        # must rank once, not once per collision
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding near-duplicates: LSH-bucket self-join + exact cosine
    verify within buckets.  (id_a < id_b, cosine >= threshold)."""
    b = hyperplane_buckets(df, n_planes, id_col, vec_col, dim)
    withb = df.join(b.withColumnRenamed("id", id_col), id_col)
    a = withb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    c = withb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    joined = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    nrm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda v: v * v), F.lit(0.0), lambda a_, v: a_ + v)
    )
    sim = dot / (nrm("va") * nrm("vb"))
    return (
        joined.withColumn("cosine", F.round(sim, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
