"""Tiling stack tests: MVT codec round-trip, simplification/drop kernels,
and the end-to-end pyramid over the synthetic webtext corpus."""

from __future__ import annotations

import numpy as np
import pytest

from tippecanoe_spark import drop as dropmod
from tippecanoe_spark import mvt
from tippecanoe_spark.config import TilingConfig
from tippecanoe_spark.geom import simplify as simpmod
from tippecanoe_spark.features import pack_cmds


# ---------------------------------------------------------------------------
# MVT codec
# ---------------------------------------------------------------------------

class TestMvt:
    def test_geometry_roundtrip(self):
        cmds = [
            (mvt.OP_MOVETO, 10, 20),
            (mvt.OP_LINETO, 30, 20),
            (mvt.OP_LINETO, 30, 40),
            (mvt.OP_CLOSEPATH, 0, 0),
            (mvt.OP_MOVETO, -5, -7),
            (mvt.OP_LINETO, 100, 200),
        ]
        assert mvt.decode_geometry(mvt.encode_geometry(cmds)) == [
            (1, 10, 20), (2, 30, 20), (2, 30, 40), (7, 0, 0),
            (1, -5, -7), (2, 100, 200),
        ]

    def test_tile_roundtrip_with_attrs(self):
        lb = mvt.LayerBuilder("roads", extent=4096)
        lb.add_feature(
            mvt.GEOM_LINE,
            [(1, 0, 0), (2, 100, 100)],
            {"name": "A1", "lanes": 4, "toll": True, "len_km": 2.5},
            feature_id=42,
        )
        lb.add_feature(mvt.GEOM_POINT, [(1, 7, 9)], {"name": "A1"}, feature_id=43)
        data = mvt.encode_tile([lb])
        layers = mvt.decode_tile(data)
        assert len(layers) == 1
        lay = layers[0]
        assert lay["name"] == "roads" and lay["extent"] == 4096 and lay["version"] == 2
        f0, f1 = lay["features"]
        assert f0["id"] == 42 and f0["type"] == 2
        assert f0["attrs"] == {"name": "A1", "lanes": 4, "toll": True, "len_km": 2.5}
        assert f1["attrs"]["name"] == "A1"
        # value pool dedup: "A1" interned once
        assert data.count(b"A1") == 1

    def test_gzip_roundtrip_deterministic(self):
        lb = mvt.LayerBuilder("l")
        lb.add_feature(mvt.GEOM_POINT, [(1, 1, 1)], {})
        raw = mvt.encode_tile([lb])
        gz1, gz2 = mvt.gzip_tile(raw), mvt.gzip_tile(raw)
        assert gz1 == gz2
        assert mvt.gunzip_tile(gz1) == raw

    def test_negative_and_zigzag_values(self):
        lb = mvt.LayerBuilder("l")
        lb.add_feature(mvt.GEOM_POINT, [(1, 0, 0)], {"a": -17, "b": 2**40})
        attrs = mvt.decode_tile(mvt.encode_tile([lb]))[0]["features"][0]["attrs"]
        assert attrs == {"a": -17, "b": 2**40}

    def test_zigzag_paths_byte_identical_extreme_deltas(self):
        """The scalar (<16-command) and vectorized (>=16) geometry
        encoders must emit identical bytes even for coordinate deltas
        >= 2^31 (reachable at vardepth-confirm detail 30-z tiles); both
        wrap as zigzag32 like the reference (mvt.cpp:432-460 writes
        geometry parameters through protozero uint32)."""
        rng = np.random.default_rng(7)
        for trial in range(20):
            n = int(rng.integers(2, 40))
            xs = rng.integers(-(2**33), 2**33, n).astype(np.int64)
            ys = rng.integers(-(2**33), 2**33, n).astype(np.int64)
            # force at least one extreme jump
            xs[-1] = xs[0] + (2**31 + int(rng.integers(0, 2**30)))
            ops = np.full(n, mvt.OP_LINETO, dtype=np.int64)
            ops[0] = mvt.OP_MOVETO
            cmds = [(int(o), int(x), int(y)) for o, x, y in zip(ops, xs, ys)]
            scalar = mvt.encode_geometry(cmds)
            vec = mvt.encode_geometry_arrays(ops, xs, ys)
            assert [int(w) for w in vec] == [int(w) for w in scalar]
            assert mvt.pack_varints(np.asarray(scalar, dtype=np.uint64)) == \
                mvt.pack_varints(vec)
            # both decoders agree on the wrapped stream
            sop, sx, sy = mvt.decode_geometry_arrays(vec)
            dec = mvt.decode_geometry(scalar)
            assert [(int(o), int(a), int(b)) for o, a, b in zip(sop, sx, sy)] == dec


# ---------------------------------------------------------------------------
# simplification kernels
# ---------------------------------------------------------------------------

class TestSimplify:
    def test_dp_collinear_collapses(self):
        x = np.arange(10, dtype=np.int64) * 100
        y = np.zeros(10, dtype=np.int64)
        m = simpmod.douglas_peucker(x, y, 1.0)
        assert m[0] and m[-1] and m.sum() == 2

    def test_dp_keeps_corner(self):
        x = np.array([0, 50, 100], dtype=np.int64)
        y = np.array([0, 80, 0], dtype=np.int64)
        assert simpmod.douglas_peucker(x, y, 10.0).all()
        m = simpmod.douglas_peucker(x, y, 100.0)
        assert m.tolist() == [True, False, True]

    def test_dp_required_vertices_survive(self):
        x = np.arange(5, dtype=np.int64) * 10
        y = np.zeros(5, dtype=np.int64)
        keep = np.array([False, False, True, False, False])
        m = simpmod.douglas_peucker(x, y, 5.0, keep=keep)
        assert m[2]

    def test_dp_large_coords_stable(self):
        # world-scale coords (2**32) must not overflow
        base = np.int64(3_000_000_000)
        x = np.array([base, base + 500, base + 1000], dtype=np.int64)
        y = np.array([0, 400, 0], dtype=np.int64)
        assert simpmod.douglas_peucker(x, y, 10.0).all()

    def test_visvalingam_removes_smallest_area(self):
        x = np.array([0, 10, 20, 30], dtype=np.int64)
        y = np.array([0, 1, 50, 0], dtype=np.int64)
        m = simpmod.visvalingam(x, y, 250.0)  # vertex 1 triangle area = 240
        assert m.tolist() == [True, False, True, True]

    def test_line_too_small(self):
        assert simpmod.line_is_too_small(
            np.array([0, 1]), np.array([0, 1]), 4.0
        )
        assert not simpmod.line_is_too_small(
            np.array([0, 10]), np.array([0, 0]), 4.0
        )

    def test_tiny_polygon_accumulator(self):
        # caller decides WHICH rings reduce (included_last_outer walk);
        # consume accumulates signed area and emits a centered square
        # when an outer pushes it strictly past px² (clip.cpp:1083-1097)
        red = simpmod.TinyPolygonReducer(2.0)
        assert red.consume(3.0, 0, 0) == ()  # first tiny ring dissolves
        out = red.consume(3.0, 5, 5)  # accumulator crosses 4 px²
        assert out != ()
        xs, ys = out
        # pixel-sized square centered on (5, 5): corners 5 ± 1
        assert xs.tolist() == [4, 6, 6, 4] and ys.tolist() == [4, 4, 6, 6]
        assert red.consume(-1.5, 0, 0) == ()  # hole de-accumulates
        assert abs(red.accum - 0.5) < 1e-12


# ---------------------------------------------------------------------------
# drop kernels
# ---------------------------------------------------------------------------

class TestDrop:
    def test_gap_thinning_keeps_sparse(self):
        idx = np.array([0, 1, 2, 1000, 1001, 5000], dtype=np.int64)
        gap = dropmod.gaps_in_index_order(idx)
        keep = dropmod.drop_by_gap(gap, 10.0)
        assert keep.tolist() == [True, False, False, True, False, True]

    def test_drop_by_extent(self):
        keep = dropmod.drop_by_extent(np.array([1, 100, 5]), 10.0)
        assert keep.tolist() == [False, True, False]

    def test_drop_sequence_deterministic_and_distinct(self):
        mz = np.zeros(100, dtype=np.int64)
        ix = np.arange(100, dtype=np.int64) * 7919
        s1 = dropmod.drop_sequence(mz, ix)
        s2 = dropmod.drop_sequence(mz, ix)
        assert (s1 == s2).all()
        assert len(np.unique(s1)) == 100

    def test_cluster_points_centroid(self):
        x = np.array([0.0, 2.0, 100.0])
        y = np.array([0.0, 0.0, 0.0])
        lead, cx, cy, count = dropmod.cluster_points(x, y, 25.0)
        assert lead.tolist() == [0, 0, 2]
        assert count[0] == 2 and cx[0] == pytest.approx(1.0)

    def test_accumulate_ops(self):
        assert dropmod.accumulate_attribute("sum", ["1", "2", "3.5"]) == "6.5"
        assert dropmod.accumulate_attribute("mean", ["2", "4"]) == "3"
        assert dropmod.accumulate_attribute("count", ["a", "b"]) == "2"
        assert dropmod.accumulate_attribute("comma", ["a", "b"]) == "a,b"
        assert dropmod.accumulate_attribute("max", ["2", "9", "4"]) == "9"

    def test_point_count_abbreviated(self):
        assert dropmod.point_count_abbreviated(950) == "950"
        assert dropmod.point_count_abbreviated(1200) == "1.2k"
        assert dropmod.point_count_abbreviated(54321) == "54k"


# ---------------------------------------------------------------------------
# end-to-end pyramid (Spark)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_features(spark):
    from tippecanoe_spark import features, geocode, synth

    pages = synth.webpages(spark, 400, partitions=4)
    return features.serialize(geocode.geocode(pages))


class TestPyramid:
    def test_build_small_pyramid(self, spark, small_features, tmp_path_factory):
        from tippecanoe_spark import pyramid

        out = str(tmp_path_factory.mktemp("tiles"))
        cfg = TilingConfig(maxzoom=4)
        manifests = pyramid.build_pyramid(spark, small_features, cfg, out_dir=out)
        assert len(manifests) == 5
        # z0 exists with exactly one tile holding every surviving feature
        z0 = manifests[0]
        assert z0["n_tiles"] == 1
        assert z0["n_features_out"] > 0
        # deeper zooms fan out and never lose features to tile misassignment
        assert manifests[4]["n_tiles"] >= manifests[1]["n_tiles"]

        # resume: second call reads manifests, no recompute
        again = pyramid.build_pyramid(spark, small_features, cfg, out_dir=out)
        assert [m["z"] for m in again] == [0, 1, 2, 3, 4]

    def test_tiles_decode_and_match_counts(self, spark, small_features):
        from tippecanoe_spark import mvt as mvtmod
        from tippecanoe_spark import tile as tilemod
        from tippecanoe_spark.minzoom import stamp_minzoom

        cfg = TilingConfig(maxzoom=3, no_feature_dropping=True)
        stamped = stamp_minzoom(small_features, cfg)
        tiles = tilemod.tiles_for_zoom(stamped, 3, cfg).collect()
        assert tiles
        total = 0
        for row in tiles:
            layers = mvtmod.decode_tile(bytes(row["tile"]))
            n = sum(len(l["features"]) for l in layers)
            assert n == row["n_out"]
            total += n
            for l in layers:
                assert l["extent"] == 4096
                for f in l["features"]:
                    assert f["type"] in (1, 2, 3)
        assert total >= stamped.count()  # buffered duplicates allowed

    def test_mbtiles_roundtrip(self, spark, small_features, tmp_path):
        from tippecanoe_spark import sinks
        from tippecanoe_spark import tile as tilemod
        from tippecanoe_spark.minzoom import stamp_minzoom

        cfg = TilingConfig(maxzoom=2)
        stamped = stamp_minzoom(small_features, cfg)
        rows = tilemod.tiles_for_zoom(stamped, 2, cfg).collect()
        meta = sinks.make_metadata("t", rows, 0, 2)
        path = str(tmp_path / "out.mbtiles")
        n = sinks.write_mbtiles(path, rows, meta)
        assert n == len(rows)
        back = sinks.read_mbtiles(path)
        assert {(r["z"], r["x"], r["y"]) for r in back} == {
            (r["z"], r["x"], r["y"]) for r in rows
        }
        assert "vector_layers" in meta["json"]

    def test_hot_tile_split_merge_equivalence(self, spark, small_features):
        """Hierarchical split-and-merge must produce the same tiles as the
        direct path (north rule: bounded task size without changing
        results)."""
        from tippecanoe_spark import tile as tilemod
        from tippecanoe_spark.minzoom import stamp_minzoom

        cfg = TilingConfig(maxzoom=2, no_feature_dropping=True, gamma=0.0)
        stamped = stamp_minzoom(small_features, cfg)
        direct = {
            (r["z"], r["x"], r["y"]): (r["n_out"], bytes(r["tile"]))
            for r in tilemod.tiles_for_zoom(stamped, 2, cfg).collect()
        }
        # force-split every tile by claiming tiny budgets
        assigned = tilemod.assign_tiles(stamped, 2, cfg)
        from pyspark.sql import functions as F

        counts = {
            (r["tx"], r["ty"]): r["n"]
            for r in assigned.groupBy("tx", "ty")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        split = {
            (r["z"], r["x"], r["y"]): (r["n_out"], bytes(r["tile"]))
            for r in tilemod.tiles_for_zoom(
                stamped, 2, cfg, hot_counts=counts, split_budget=10
            ).collect()
        }
        assert set(direct) == set(split)
        for key in direct:
            assert direct[key][0] == split[key][0], key
            assert direct[key][1] == split[key][1], key


class TestAsNeededStrategies:
    """The coalesce/cluster/fraction-as-needed family (tile.cpp:2020-2109)
    must change output when over budget — accepting-and-ignoring a
    correctness flag is a bug (round-1 verdict)."""

    @staticmethod
    def _pdf(n=400, seed=3):
        import pandas as pd

        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            x, y = int(rng.integers(0, 4096)), int(rng.integers(0, 4096))
            rows.append(
                {
                    "tx": 0, "ty": 0, "feature_id": i, "layer": "l",
                    "geom_type": 1,
                    "geometry": pack_cmds([(1, x, y)]),
                    "attrs": {"name": ("n%d" % i) * 20},
                    "index": int(rng.integers(0, 1 << 40)),
                    "extent": 1, "seq": i, "feature_minzoom": 0,
                }
            )
        return pd.DataFrame(rows)

    def _run(self, **flags):
        from tippecanoe_spark import mvt
        from tippecanoe_spark.tile import _finalize_tile_dict

        cfg = TilingConfig(max_tile_size=3000, compress_tiles=False, **flags)
        out = _finalize_tile_dict(self._pdf(), 4, cfg)
        feats = mvt.decode_tile(bytes(out["tile"]))[0]["features"]
        return out, feats

    def test_coalesce_densest_preserves_points_as_multipoints(self):
        out, feats = self._run(coalesce_densest_as_needed=True)
        n_pts = sum(len(f["cmds"]) for f in feats)
        assert n_pts == 400  # every input point survives, merged
        assert out["n_out"] < 400  # into fewer features
        assert any(len(f["cmds"]) > 1 for f in feats)

    def test_cluster_densest_adds_cluster_attrs(self):
        out, feats = self._run(cluster_densest_as_needed=True)
        clustered = [f for f in feats if f["attrs"].get("clustered")]
        assert clustered
        total = sum(int(f["attrs"]["point_count"]) for f in clustered) + sum(
            1 for f in feats if not f["attrs"].get("clustered")
        )
        assert total == 400  # counts account for every input point

    def test_drop_vs_coalesce_differ(self):
        out_d, feats_d = self._run(drop_densest_as_needed=True)
        out_c, feats_c = self._run(coalesce_densest_as_needed=True)
        assert sum(len(f["cmds"]) for f in feats_d) < 400
        assert sum(len(f["cmds"]) for f in feats_c) == 400

    def test_budget_respected_under_all_strategies(self):
        for flags in (
            {"drop_densest_as_needed": True},
            {"coalesce_densest_as_needed": True},
            {"cluster_densest_as_needed": True},
            {"drop_fraction_as_needed": True},
        ):
            out, _ = self._run(**flags)
            assert out["gz_bytes"] <= 3000 or out["passes"] >= 5, flags


class TestDetailReduction:
    def test_single_giant_feature_reduces_detail(self):
        """E4 fallback (tile.cpp:1719-1721,3034-3036): when drops can't
        fit the budget (n_out==1 can't drop), lower the grid detail
        instead of shipping an oversized tile."""
        import pandas as pd

        from tippecanoe_spark import mvt
        from tippecanoe_spark.tile import _finalize_tile_dict

        rng = np.random.default_rng(7)
        n = 4000
        xs = rng.integers(0, 4096, n)
        ys = rng.integers(0, 4096, n)
        cmds = pack_cmds(
            [(1, int(xs[0]), int(ys[0]))]
            + [(2, int(a), int(b)) for a, b in zip(xs[1:], ys[1:])]
        )
        pdf = pd.DataFrame(
            [{
                "tx": 0, "ty": 0, "feature_id": 1, "layer": "l",
                "geom_type": 2, "geometry": cmds, "attrs": {},
                "index": 0, "extent": 10, "seq": 0, "feature_minzoom": 0,
            }]
        )
        base = _finalize_tile_dict(
            pdf.copy(), 4, TilingConfig(max_tile_size=0, compress_tiles=False)
        )
        cfg = TilingConfig(max_tile_size=9000, compress_tiles=False)
        out = _finalize_tile_dict(pdf, 4, cfg)
        layer = mvt.decode_tile(bytes(out["tile"]))[0]
        assert out["n_out"] == 1
        assert layer["extent"] < 4096  # detail was reduced
        # strictly smaller than the unbudgeted encode; fits when the
        # min_detail floor allows (random 4000-pt line bottoms out near
        # the budget — the reference ships its smallest attempt too)
        assert out["gz_bytes"] < base["gz_bytes"]
        budget12 = _finalize_tile_dict(
            pdf.copy(), 4, TilingConfig(max_tile_size=12000, compress_tiles=False)
        )
        assert budget12["gz_bytes"] <= 12000


class TestMultiplierClusters:
    def test_retain_points_multiplier(self, spark):
        """T16 (--retain-points-multiplier): rate-dropped followers stay
        (up to M-1 per lead), leads carry the cluster-start marker
        (tile.cpp:1304-1311, 2237-2241)."""
        import pandas as pd

        from tippecanoe_spark import mvt
        from tippecanoe_spark import tile as tilemod

        rows = []
        # 2 leads (minzoom 0) and 6 followers (minzoom 3, dropped at z2).
        # Coords are nudged off exact tile boundaries: membership is
        # closed at the buffered edge (quick_check/clip_point parity), so
        # a point EXACTLY on a shared edge correctly lands in both tiles
        # — not what this count-shape test wants to exercise.
        for i in range(8):
            fm = 0 if i % 4 == 0 else 3
            px, py = ((i + 1) << 27) + 3, (1 << 30) + 7
            rows.append(
                {
                    "feature_id": i, "url": "u%d" % i, "layer": "l",
                    "geom_type": 1,
                    "geometry": pack_cmds([(1, px, py)]),
                    "attrs": {}, "index": i << 40, "extent": 0, "seq": i,
                    "minx": px, "miny": py,
                    "maxx": px, "maxy": py,
                    "feature_minzoom": fm,
                }
            )
        feats = spark.createDataFrame(pd.DataFrame(rows))
        cfg_off = TilingConfig(maxzoom=4, basezoom=3, buffer=0)
        cfg_on = TilingConfig(
            maxzoom=4, basezoom=3, buffer=0, retain_points_multiplier=3,
            keep_first_per_tile=False,
        )
        cfg_off2 = TilingConfig(maxzoom=4, basezoom=3, buffer=0,
                                keep_first_per_tile=False)
        z = 2  # below follower minzoom 3
        n_off = sum(
            r["n_out"]
            for r in tilemod.tiles_for_zoom(feats, z, cfg_off2).collect()
        )
        tiles_on = tilemod.tiles_for_zoom(feats, z, cfg_on).collect()
        n_on = sum(r["n_out"] for r in tiles_on)
        assert n_off == 2  # only the leads
        # droprate 2.5: extra = log 3/log 2.5 ≈ 1.2 zooms -> followers at
        # minzoom 3 qualify at z2; cap M-1=2 followers per lead
        # i=7 lands in its own tile and becomes that tile's first-kept
        # lead (tile.cpp:1295-1298), so 6 multiplier keeps + 1 extra lead
        assert n_on == 7
        marked = 0
        for r in tiles_on:
            for layer in mvt.decode_tile(bytes(r["tile"])):
                for f in layer["features"]:
                    if f["attrs"].get("tippecanoe:retain_points_multiplier_first"):
                        marked += 1
        assert marked == 3  # the two minzoom-0 leads + the lone-tile lead


class TestDropByAttribute:
    def test_attribute_threshold_escalation(self):
        """T14 (--drop-by-attribute-as-needed, tile.cpp:2110-2144):
        over-budget tiles drop by the numeric attribute, ascending or
        descending; missing values never drop."""
        import pandas as pd

        from tippecanoe_spark import mvt
        from tippecanoe_spark.tile import _finalize_tile_dict

        rng = np.random.default_rng(11)
        rows = []
        for i in range(300):
            rows.append(
                {
                    "tx": 0, "ty": 0, "feature_id": i, "layer": "l",
                    "geom_type": 1,
                    "geometry": pack_cmds([(1, int(rng.integers(0, 4096)),
                                            int(rng.integers(0, 4096)))]),
                    "attrs": {"rank": str(i), "pad": "x" * 40},
                    "index": int(rng.integers(0, 1 << 40)),
                    "extent": 1, "seq": i, "feature_minzoom": 0,
                }
            )
        pdf = pd.DataFrame(rows)
        asc = _finalize_tile_dict(
            pdf.copy(), 4,
            TilingConfig(max_tile_size=4000, compress_tiles=False,
                         drop_by_attribute="rank"),
        )
        desc = _finalize_tile_dict(
            pdf.copy(), 4,
            TilingConfig(max_tile_size=4000, compress_tiles=False,
                         drop_by_attribute="rank",
                         drop_by_attribute_descending=True),
        )
        assert asc["n_out"] < 300 and desc["n_out"] < 300

        def ranks(out):
            feats = mvt.decode_tile(bytes(out["tile"]))[0]["features"]
            return sorted(int(f["attrs"]["rank"]) for f in feats)

        r_asc, r_desc = ranks(asc), ranks(desc)
        # ascending drops the LOW ranks, descending drops the HIGH ranks
        assert min(r_asc) > 0 and max(r_asc) == 299
        assert min(r_desc) == 0 and max(r_desc) < 299
