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
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard >= threshold via an inverted-index
    join (shingle → docs, pairs sharing a shingle, group-count), never a
    cross join: |pairs| is bounded by co-occurrence, and the heavy lifting
    is two hash shuffles.  Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``max_shingle_df`` (opt-in, default None = exact): shingles occurring
    in more than this many docs are dropped from the INVERTED INDEX (not
    from the per-doc shingle-set sizes) before the self-join — a single
    stop-shingle ("the of the") otherwise creates a quadratic hot key at
    corpus scale.  CAVEAT: with a cap set, the exact-all-pairs contract
    no longer holds — two SHORT documents whose shingle sets consist only
    of ultra-common shingles can have Jaccard up to 1.0 and be silently
    missed.  Use the cap for long-document corpora where every doc
    carries rare shingles, or pair it with a MinHash pass for the head."""
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
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("_s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("_s")
        )
        sh = sh.join(F.broadcast(hot), "_s", "left_anti")
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
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _byte_matrix(strings) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte matrix (zero-padded) + lengths for a batch of strings —
    one memcpy via flat concatenation, no per-byte Python."""
    bs = [(s or "").encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    if len(bs) == 0 or lens.max(initial=0) == 0:
        return np.zeros((len(bs), 0), dtype=np.uint8), lens
    maxlen = int(lens.max())
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    mat = np.zeros((len(bs), maxlen), dtype=np.uint8)
    mat[np.arange(maxlen)[None, :] < lens[:, None]] = flat
    return mat, lens


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """FNV-1a per string, vectorized across the batch: one masked-update
    column sweep over the padded byte matrix — bit-identical to the
    scalar per-byte loop (uint64 wrap arithmetic), total work = total
    bytes, all at numpy C speed."""
    mat, lens = _byte_matrix(shingles)
    h = np.full(len(shingles), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            hj = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(j < lens, hj, h)
    return h


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
        sentinel = np.int64(np.iinfo(np.int64).max)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # flatten every shingle of the batch, hash once, then take
            # segmented minima per doc — no per-row Python
            sh_lists = [
                list(s) if s is not None else [] for s in pdf["shingles"]
            ]
            counts = np.fromiter((len(s) for s in sh_lists), np.int64, n)
            flat = [s for lst in sh_lists for s in lst]
            sigs = np.full((n, num_perm), sentinel, dtype=np.int64)
            if flat:
                hv = _hash_shingles(flat)
                with np.errstate(over="ignore"):
                    m = (hv[None, :] * a[:, None] + b[:, None]) % _MERSENNE
                nz = np.flatnonzero(counts)
                starts = np.concatenate([[0], np.cumsum(counts)])[:-1][nz]
                seg = np.minimum.reduceat(m, starts, axis=1).astype(np.int64)
                sigs[nz] = seg.T
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "signature": list(sigs)}
            )

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
        weights = (np.uint64(1) << bits).astype(np.uint64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            tok_lists = [list(t) if t is not None else [] for t in pdf["toks"]]
            counts = np.fromiter((len(t) for t in tok_lists), np.int64, n)
            flat = [t for lst in tok_lists for t in lst]
            sig = np.zeros(n, dtype=np.uint64)
            if flat:
                hv = _hash_shingles(flat)
                # per-token ±1 votes per bit, summed per doc via reduceat
                votes = (
                    ((hv[:, None] >> bits[None, :]) & np.uint64(1))
                    .astype(np.int32) * 2 - 1
                )
                nz = np.flatnonzero(counts)
                starts = np.concatenate([[0], np.cumsum(counts)])[:-1][nz]
                seg = np.add.reduceat(votes, starts, axis=0)
                sig[nz] = ((seg > 0).astype(np.uint64) * weights[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "simhash": sig.astype(np.int64)}
            )

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
