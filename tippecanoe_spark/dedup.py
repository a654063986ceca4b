"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.  (Embedding-cosine near-dup lives
in :mod:`tippecanoe_spark.similarity`.)

Scale notes (100 TB design):

- exact: hash-groupBy on the text (or its fingerprint) — one shuffle on
  a well-distributed key; AQE handles stragglers.
- MinHash/LSH: signature computation is embarrassingly parallel
  (mapInPandas, numpy); candidate generation explodes each doc into
  ``bands`` rows and self-joins on the band-bucket hash — the join key is
  (band_id, bucket_hash), high cardinality, so the shuffle spreads well.
  No O(n²) stage anywhere; the exact-Jaccard verify runs only on LSH
  candidates.
- SimHash: 64-bit signature per doc; near-dup pairs found by the
  pigeonhole trick (split signature into 4 chunks of 16 bits; any pair
  within Hamming distance 3 shares at least one exact chunk) — again a
  self-join on (chunk_id, chunk_value).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textops import tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per identical text.  groupBy on the text
    hash, not the text itself, to keep shuffle rows small."""
    h = F.sha2(F.col(text_col), 256)
    w = df.withColumn("_h", h)
    keep = w.groupBy("_h").agg(F.min(id_col).alias("_keep_id"))
    return (
        w.join(keep, "_h")
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("_h", "_keep_id")
    )


def duplicate_groups(df: DataFrame, key: F.Column, id_col: str = "doc_id") -> DataFrame:
    """Groups with >1 member under ``key``: (key, n_dups, keeper_id)."""
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingles + n-gram Jaccard (exact, for verification and as its own op)
# ---------------------------------------------------------------------------

def word_shingles(text_col: str = "text", k: int = 3) -> F.Column:
    """k-word shingles as an array column — pure Catalyst (split +
    transform over an index sequence), no UDF."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
                ),
            )
        ),
    ).otherwise(F.array())


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard >= threshold via an inverted-index
    join (shingle → docs, pairs sharing a shingle, group-count), never a
    cross join: |pairs| is bounded by co-occurrence, and the heavy lifting
    is two hash shuffles.  Returns (id_a, id_b, jaccard) with id_a < id_b."""
    # materialize the shingle arrays ONCE: the shingle expression tree is
    # large (transform over a sequence), and leaving it inline makes
    # Catalyst re-evaluate it for the size column, the explode, and both
    # sides of the self-join (measured 55s → 3s at 120 docs)
    arrs = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, k).alias("_sh")
    ).persist()
    sh = arrs.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_s")
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_n").alias("na"), "_s")
    b = sh.select(F.col("_id").alias("id_b"), F.col("_n").alias("nb"), "_s")
    inter = (
        a.join(b, "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    out = np.empty(len(shingles), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, s in enumerate(shingles):
            h = np.uint64(0xCBF29CE484222325)
            for byt in s.encode("utf-8"):
                h = (h ^ np.uint64(byt)) * np.uint64(0x100000001B3)
            out[i] = h
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    seed: int = 1,
) -> DataFrame:
    """(id, signature array<long>) — num_perm min-hashes via the standard
    (a*h + b) mod p universal family over FNV shingle hashes."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_perm, dtype=np.uint64)
    with_sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, k).alias("shingles")
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, sigs = [], []
            for _, row in pdf.iterrows():
                raw = row["shingles"]
                sh = [] if raw is None else list(raw)
                if not sh:
                    sig = np.full(num_perm, np.int64(np.iinfo(np.int64).max))
                else:
                    hv = _hash_shingles(sh)
                    with np.errstate(over="ignore"):
                        m = (hv[None, :] * a[:, None] + b[:, None]) % _MERSENNE
                    sig = m.min(axis=1).astype(np.int64)
                ids.append(row["id"])
                sigs.append(sig.tolist())
            if ids:
                yield pd.DataFrame({"id": ids, "signature": sigs})

    return with_sh.mapInPandas(gen, schema=schema)


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 8
) -> DataFrame:
    """Band the signatures and self-join on (band, bucket): docs sharing
    any band bucket become candidate pairs (id_a < id_b, deduped)."""
    rows_per_band = F.size(F.col("signature")) / bands
    banded = signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.hash(
                        F.slice(
                            F.col("signature"),
                            (bnd * rows_per_band + 1).cast("int"),
                            rows_per_band.cast("int"),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → band candidates → exact
    Jaccard verify on candidates only.  Output (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, k, num_perm)
    cand = minhash_lsh_candidates(sigs, bands)
    # materialized once — reused for both sides of the candidate join
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, k).alias("_sh")
    ).persist()
    joined = (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: each token hash votes ±1 per
    bit; the sign of the vote sum forms the signature."""
    with_t = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("simhash", T.LongType())]
    )

    def gen(batches):
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, out = [], []
            for _, row in pdf.iterrows():
                raw = row["toks"]
                toks = [] if raw is None else list(raw)
                if not toks:
                    ids.append(row["id"])
                    out.append(0)
                    continue
                hv = _hash_shingles(toks)
                votes = ((hv[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
                votes = np.where(votes == 1, 1, -1).sum(axis=0)
                sig = np.uint64(0)
                for bit in np.flatnonzero(votes > 0):
                    sig |= np.uint64(1) << np.uint64(bit)
                ids.append(row["id"])
                out.append(np.int64(sig))
            if ids:
                yield pd.DataFrame({"id": ids, "simhash": out})

    return with_t.mapInPandas(gen, schema=schema)


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pigeonhole LSH: 4 chunks of 16 bits; Hamming<=3 pairs share a chunk.
    Self-join on (chunk_id, value), verify Hamming distance exactly."""
    chunks = signatures.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a = chunks.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "val")
    b = chunks.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "val")
    pairs = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
