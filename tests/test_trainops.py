"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tippecanoe_spark import dedup as dedupmod
from tippecanoe_spark import similarity as simmod
from tippecanoe_spark import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "der hund und die katze sind ein team mit den", "de"),
        (3, "completely different words entirely here now then", "en"),
        (4, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (5, "le chat est dans la maison et le jardin pour", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestDedup:
    def test_exact_dedup(self, spark, docs):
        kept = dedupmod.exact_dedup(docs)
        ids = {r["doc_id"] for r in kept.collect()}
        assert 0 in ids and 4 not in ids and len(ids) == 5

    def test_duplicate_groups(self, docs):
        g = dedupmod.duplicate_groups(docs, F.col("text")).collect()
        assert len(g) == 1 and g[0]["n_dups"] == 2 and g[0]["keeper_id"] == 0

    def test_ngram_jaccard_pairs(self, docs):
        pairs = dedupmod.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 4) in got  # identical → jaccard 1.0
        assert (0, 1) in got  # near-dup
        jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert jac[(0, 4)] == 1.0
        assert 0.5 <= jac[(0, 1)] < 1.0

    def test_minhash_finds_neardups(self, docs):
        pairs = dedupmod.minhash_dedup_pairs(docs, threshold=0.5).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 4) in got and (0, 1) in got
        # dissimilar docs absent
        assert not any(3 in p for p in got)

    def test_simhash_exact_dup_distance_zero(self, docs):
        sigs = dedupmod.simhash_signatures(docs)
        pairs = dedupmod.simhash_near_pairs(sigs, max_hamming=0).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 4)}


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((40, 8))
        vecs[7] = vecs[3] * 2.0  # same direction as 3 → cosine 1
        rows = [(int(i), [float(v) for v in vecs[i]]) for i in range(40)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_brute_topk_matches_numpy(self, emb):
        out = simmod.brute_topk(emb, emb.filter(F.col("vec_id") == 3), k=1).collect()
        assert out[0]["neighbor_id"] == 7
        assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-5)

    def test_brute_topk_k_rows_per_probe(self, emb):
        probes = emb.filter(F.col("vec_id") < 5)
        out = simmod.brute_topk(emb, probes, k=3)
        counts = out.groupBy("probe_id").count().collect()
        assert all(r["count"] == 3 for r in counts) and len(counts) == 5

    def test_lsh_buckets_deterministic(self, emb):
        b1 = {r["id"]: r["bucket"] for r in simmod.hyperplane_buckets(emb, 8, dim=8).collect()}
        b2 = {r["id"]: r["bucket"] for r in simmod.hyperplane_buckets(emb, 8, dim=8).collect()}
        assert b1 == b2
        assert b1[3] == b1[7]  # co-directional vectors share every hyperplane side

    def test_cosine_near_dup_finds_planted(self, emb):
        pairs = simmod.cosine_near_dup_pairs(emb, threshold=0.99, n_planes=4, dim=8).collect()
        assert (3, 7) in {(r["id_a"], r["id_b"]) for r in pairs}


class TestTextOps:
    def test_detect_language(self, docs):
        out = {r["doc_id"]: r["pred"] for r in docs.select(
            "doc_id", textops.detect_language(F.col("text")).alias("pred")
        ).collect()}
        assert out[0] == "en" and out[2] == "de" and out[5] == "fr"
        assert out[3] == "und"  # no stopword evidence

    def test_quality_score_bounds(self, docs):
        scores = [r["q"] for r in docs.select(textops.quality_score(F.col("text")).alias("q")).collect()]
        assert all(0.0 <= s <= 1.0 for s in scores)

    def test_token_stats(self, docs):
        st = textops.token_stats(docs).filter(F.col("doc_id") == 0).collect()[0]
        assert st["n_tokens"] == 9
        assert st["n_distinct_tokens"] == 8  # 'the' twice

    def test_fingerprint_stable_and_discriminating(self, spark, docs):
        fp = textops.with_fingerprint(docs).select("doc_id", "fingerprint").collect()
        vals = {r["doc_id"]: r["fingerprint"] for r in fp}
        assert vals[0] == vals[4]  # identical text, identical fingerprint
        assert vals[0] != vals[1]

    def test_bpe_ish_pieces_exceed_words(self, spark):
        df = spark.createDataFrame([("hello,world 42x",)], "text string")
        n = df.select(textops.bpe_ish_token_count(F.col("text")).alias("n")).collect()[0]["n"]
        assert n == 5  # ['hello', ',', 'world', '42', 'x'] — pinned to
        # catch regex regressions


class TestMultimodal:
    def test_decode_stub_fake_path(self, spark):
        from tippecanoe_spark import multimodal

        media = multimodal.synthetic_media(spark, 30, partitions=2)
        decoded = multimodal.decode_stub(media, fake=True)
        rows = decoded.collect()
        assert len(rows) == 30
        assert all(len(r["feature"]) == 16 for r in rows)
        imgs = [r for r in rows if r["kind"] == "image"]
        assert all(r["n_frames"] == 1 for r in imgs)

    def test_decode_stub_raises_without_fake(self, spark):
        from tippecanoe_spark import multimodal

        media = multimodal.synthetic_media(spark, 5, partitions=1)
        with pytest.raises(Exception, match="NotImplementedError|media codecs"):
            multimodal.decode_stub(media, fake=False).collect()

    def test_frame_sample_and_resize(self, spark):
        from tippecanoe_spark import multimodal

        media = multimodal.synthetic_media(spark, 30, partitions=2)
        decoded = multimodal.decode_stub(media, fake=True)
        frames = multimodal.frame_sample(decoded, every_n=8).collect()
        assert frames and all(r["frame_index"] % 8 == 0 for r in frames)
        resized = multimodal.resize_meta(decoded, max_side=64).collect()
        assert all(max(r["target_width"], r["target_height"]) <= 65 for r in resized)
