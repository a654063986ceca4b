"""Join / overzoom / filter-language tests."""

from __future__ import annotations

import os
import numpy as np
import pytest
from pyspark.sql import functions as F

from tippecanoe_spark import join as joinmod
from tippecanoe_spark import mvt
from tippecanoe_spark.filters import compile_filter, compile_layer_filters
from tippecanoe_spark.overzoom import overzoom_tile


def _rect(minx, miny, maxx, maxy):
    return [
        (
            np.array([minx, maxx, maxx, minx], dtype=np.int64),
            np.array([miny, miny, maxy, maxy], dtype=np.int64),
        )
    ]


class TestPolygonIndex:
    def test_lookup_rects(self):
        ix = joinmod.PolygonIndex(
            [(1, _rect(0, 0, 1 << 30, 1 << 30)), (2, _rect(1 << 31, 0, 3 << 30, 1 << 30))],
            grid_zoom=4,
        )
        px = np.array([1 << 29, (1 << 31) + 5, 1 << 33], dtype=np.int64)
        py = np.array([1 << 29, 5, 5], dtype=np.int64)
        assert ix.lookup(px, py).tolist() == [1, 2, -1]

    def test_first_match_deterministic(self):
        # overlapping polygons: lowest id wins
        ix = joinmod.PolygonIndex(
            [(7, _rect(0, 0, 100, 100)), (3, _rect(0, 0, 100, 100))], grid_zoom=2
        )
        assert ix.lookup(np.array([50]), np.array([50])).tolist() == [3]


class TestPointIndex:
    def test_within_radius_and_knn(self):
        rng = np.random.default_rng(7)
        x = rng.integers(0, 1 << 20, 500)
        y = rng.integers(0, 1 << 20, 500)
        ids = np.arange(500)
        ix = joinmod.PointIndex(ids, x, y, cell_bits=14)
        q = 250
        got = set(ix.ids[ix.within_radius(int(x[q]), int(y[q]), 5000.0)].tolist())
        d2 = (x - x[q]).astype(float) ** 2 + (y - y[q]).astype(float) ** 2
        want = set(ids[d2 <= 5000.0**2].tolist())
        assert got == want

        nn_ids, nn_d = ix.knn(int(x[q]), int(y[q]), 5, exclude_id=q)
        brute = np.argsort(np.where(ids == q, np.inf, d2), kind="mergesort")[:5]
        assert set(nn_ids.tolist()) == set(ids[brute].tolist())
        assert nn_d.tolist() == sorted(nn_d.tolist())


class TestSparkJoins:
    def test_pip_join(self, spark):
        pts = spark.createDataFrame(
            [(1, 10, 10), (2, 500, 500), (3, 10**9, 10**9)],
            "id long, minx long, miny long",
        )
        ix = joinmod.PolygonIndex([(42, _rect(0, 0, 1000, 1000))], grid_zoom=3)
        out = joinmod.pip_join(pts, ix).orderBy("id").collect()
        assert [r["polygon_id"] for r in out] == [42, 42, -1]
        inner = joinmod.pip_join(pts, ix, how="inner").count()
        assert inner == 2

    def test_attribute_join(self, spark):
        feats = spark.createDataFrame(
            [(1, {"geoid": "A"}), (2, {"geoid": "B"}), (3, {"geoid": "Z"})],
            "feature_id long, attrs map<string,string>",
        )
        dim = spark.createDataFrame(
            [("A", 100), ("B", 200)], "geoid string, population int"
        )
        out = joinmod.attribute_join(feats, dim, "geoid", "geoid", how="left")
        rows = {r["feature_id"]: r["attrs"] for r in out.collect()}
        assert rows[1]["population"] == "100"
        assert "population" not in rows[3]
        assert joinmod.attribute_join(feats, dim, "geoid", "geoid", how="inner").count() == 2

    def test_spatial_dedup_blocked(self, spark):
        pts = spark.createDataFrame(
            [(i, i, 100 + (i % 2), 100, 0) for i in range(10)],
            "feature_id long, index long, minx long, miny long, seq long",
        )
        out = joinmod.spatial_dedup(pts, radius=10.0)
        assert out.count() == 1  # all within 10 units, one survivor

    def test_tile_join_merges_layers(self, spark):
        lb1 = mvt.LayerBuilder("a")
        lb1.add_feature(1, [(1, 5, 5)], {"s": "x"}, 1)
        lb2 = mvt.LayerBuilder("a")
        lb2.add_feature(1, [(1, 9, 9)], {"s": "y"}, 2)
        t1 = spark.createDataFrame(
            [(0, 0, 0, bytearray(mvt.encode_tile([lb1])))], "z int, x int, y int, tile binary"
        )
        t2 = spark.createDataFrame(
            [(0, 0, 0, bytearray(mvt.encode_tile([lb2]))), (1, 0, 0, bytearray(mvt.encode_tile([lb2])))],
            "z int, x int, y int, tile binary",
        )
        out = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in joinmod.tile_join([t1, t2]).collect()}
        assert set(out) == {(0, 0, 0), (1, 0, 0)}
        merged = mvt.decode_tile(out[(0, 0, 0)])
        assert len(merged) == 1 and len(merged[0]["features"]) == 2
        names = {f["attrs"]["s"] for f in merged[0]["features"]}
        assert names == {"x", "y"}


class TestOverzoom:
    def _tile(self):
        lb = mvt.LayerBuilder("l", extent=4096)
        lb.add_feature(1, [(1, 100, 100)], {"n": "p0"}, 1)  # NW quadrant
        lb.add_feature(1, [(1, 3000, 3000)], {"n": "p1"}, 2)  # SE quadrant
        lb.add_feature(
            2, [(1, 0, 2048), (2, 4096, 2048)], {"n": "line"}, 3
        )  # horizontal line across the middle
        return mvt.encode_tile([lb])

    def test_children_partition_points(self):
        parent = self._tile()
        kids = {}
        for dx in range(2):
            for dy in range(2):
                child = overzoom_tile(parent, 3, 2, 2, 4, 4 + dx, 4 + dy, buffer_px=0)
                if child is not None:
                    kids[(dx, dy)] = mvt.decode_tile(child)
        # p0 lands in (0,0), p1 in (1,1); the line crosses all at y=2048
        names00 = {f["attrs"]["n"] for f in kids[(0, 0)][0]["features"]}
        names11 = {f["attrs"]["n"] for f in kids[(1, 1)][0]["features"]}
        assert "p0" in names00 and "p1" in names11
        assert "p0" not in names11
        # line at y=2048 maps to child rows y-index 1 (tile-local 0 edge)
        assert "line" in names11 or "line" in names00 or (0, 1) in kids

    def test_point_scales_correctly(self):
        parent = self._tile()
        child = overzoom_tile(parent, 3, 2, 2, 4, 4, 4, buffer_px=0)
        feats = mvt.decode_tile(child)[0]["features"]
        p0 = next(f for f in feats if f["attrs"]["n"] == "p0")
        assert p0["cmds"] == [(1, 200, 200)]  # 100 * 2

    def test_non_descendant_raises(self):
        with pytest.raises(ValueError):
            overzoom_tile(self._tile(), 3, 2, 2, 4, 99, 0)


class TestFilters:
    @pytest.fixture()
    def feats(self, spark):
        return spark.createDataFrame(
            [
                (1, "roads", 2, {"kind": "hwy", "lanes": "4"}),
                (2, "roads", 2, {"kind": "path"}),
                (3, "pois", 1, {"kind": "cafe", "rating": "4.5"}),
                (4, "pois", 1, {}),
            ],
            "feature_id long, layer string, geom_type int, attrs map<string,string>",
        )

    def test_has_and_compare(self, feats):
        assert feats.filter(compile_filter(["has", "kind"])).count() == 3
        assert feats.filter(compile_filter(["!has", "kind"])).count() == 1
        assert feats.filter(compile_filter(["==", "kind", "hwy"])).count() == 1
        # numeric compare on stringly-typed attr
        assert feats.filter(compile_filter([">=", "lanes", 3])).count() == 1
        # missing attr: == false, != true (evaluator.cpp:219-224)
        assert feats.filter(compile_filter(["!=", "kind", "hwy"])).count() == 3

    def test_combinators_and_pseudo(self, feats):
        ast = ["all", ["==", "$type", "Point"], ["in", "kind", "cafe", "bar"]]
        assert feats.filter(compile_filter(ast)).count() == 1
        assert feats.filter(compile_filter(["none", ["has", "kind"]])).count() == 1
        assert feats.filter(compile_filter(["==", "$zoom", 3], zoom=3)).count() == 4

    def test_layer_keyed(self, feats):
        flt = {"roads": ["==", "kind", "hwy"], "*": ["has", "kind"]}
        out = feats.filter(compile_layer_filters(flt))
        assert {r["feature_id"] for r in out.collect()} == {1, 3}


class TestTileJoinOptions:
    """J3 option surface (tile-join.cpp:1287+): layer keep/remove/rename,
    zoom clamp, --overzoom."""

    @staticmethod
    def _tiles(spark, layer_name, z=2):
        import pandas as pd

        from tippecanoe_spark import mvt

        rows = []
        for x in range(2):
            lb = mvt.LayerBuilder(layer_name, extent=4096)
            lb.add_feature(1, [(1, 100 + x, 200)], {"k": layer_name}, x + 1)
            rows.append(
                {"z": z, "x": x, "y": 0, "tile": mvt.gzip_tile(mvt.encode_tile([lb]))}
            )
        return spark.createDataFrame(
            pd.DataFrame(rows), "z int, x int, y int, tile binary"
        )

    def test_keep_remove_rename(self, spark):
        from tippecanoe_spark import mvt
        from tippecanoe_spark.join import tile_join

        a = self._tiles(spark, "roads")
        b = self._tiles(spark, "rivers")
        out = tile_join(
            [a, b], remove_layers=("rivers",), rename_layers={"roads": "ways"}
        ).collect()
        assert len(out) == 2
        for r in out:
            layers = mvt.decode_tile(bytes(r["tile"]))
            assert [l["name"] for l in layers] == ["ways"]

    def test_keep_only(self, spark):
        from tippecanoe_spark import mvt
        from tippecanoe_spark.join import tile_join

        a = self._tiles(spark, "roads")
        b = self._tiles(spark, "rivers")
        out = tile_join([a, b], keep_layers=("rivers",)).collect()
        for r in out:
            assert [l["name"] for l in mvt.decode_tile(bytes(r["tile"]))] == ["rivers"]

    def test_zoom_clamp(self, spark):
        from tippecanoe_spark.join import tile_join

        a = self._tiles(spark, "roads", z=2)
        b = self._tiles(spark, "roads", z=4)
        out = tile_join([a, b], maxzoom=3).collect()
        assert {r["z"] for r in out} == {2}

    def test_overzoom_integration(self, spark):
        from tippecanoe_spark.join import tile_join

        a = self._tiles(spark, "roads", z=2)
        out = tile_join([a], overzoom_to=3).collect()
        zs = {r["z"] for r in out}
        assert zs == {2, 3}


class TestGreedyRadiusDedup:
    """Sub-grid greedy dedup kernel == brute-force greedy reference."""

    @staticmethod
    def _brute(xs, ys, r):
        import numpy as np

        keep = np.ones(len(xs), dtype=bool)
        kx, ky = [], []
        for i in range(len(xs)):
            if kx:
                d2 = (np.array(kx) - xs[i]) ** 2 + (np.array(ky) - ys[i]) ** 2
                if (d2 <= r * r).any():
                    keep[i] = False
                    continue
            kx.append(xs[i])
            ky.append(ys[i])
        return keep

    def test_matches_bruteforce_random(self):
        import numpy as np

        from tippecanoe_spark.join import greedy_radius_dedup

        rng = np.random.default_rng(7)
        for n, r in ((500, 10.0), (2000, 3.0), (300, 100.0)):
            xs = rng.uniform(0, 200, n)
            ys = rng.uniform(0, 200, n)
            got = greedy_radius_dedup(xs, ys, r)
            want = self._brute(xs, ys, r)
            assert (got == want).all()

    def test_boundary_exact_radius(self):
        import numpy as np

        from tippecanoe_spark.join import greedy_radius_dedup

        # d == radius is a duplicate (<=), d just above survives
        xs = np.array([0.0, 10.0, 10.000001])
        ys = np.array([0.0, 0.0, 0.0])
        got = greedy_radius_dedup(xs, ys, 10.0)
        assert got.tolist() == [True, False, True]


class TestOverzoomDeepFanout:
    """k>2 overzoom goes through the (parent, 4x4-window) shuffle path:
    the derive stage must run >1 task, and bytes must equal direct
    per-child derivation (clip.cpp:1217-1753 semantics unchanged)."""

    def _parent(self):
        lb = mvt.LayerBuilder("l", extent=4096)
        rng = np.random.default_rng(3)
        for i in range(40):
            x = int(rng.integers(0, 4096))
            y = int(rng.integers(0, 4096))
            lb.add_feature(1, [(1, x, y)], {"i": str(i)}, i + 1)
        lb.add_feature(2, [(1, 0, 0), (2, 4095, 4095)], {"i": "diag"}, 99)
        return mvt.encode_tile([lb])

    def test_z0_to_z6_window_shuffle(self, spark):
        from tippecanoe_spark.overzoom import _derive_child, _parse_parent, overzoom

        parent = self._parent()
        df = spark.createDataFrame(
            [(0, 0, 0, bytearray(mvt.gzip_tile(parent)))],
            "z int, x int, y int, tile binary",
        )
        # AQE rightly coalesces this toy shuffle back to one partition;
        # disable coalescing so the task spread of the window shuffle is
        # observable (at real scale the partitions are large and stay split)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            res = (
                overzoom(df, 6, buffer_px=0)
                .withColumn("pid", F.spark_partition_id())
                .collect()
            )
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        out = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in res}

        # byte-identical to direct derivation of each of the 4096 children
        parsed = _parse_parent(parent, 4096)
        want = {}
        for cx in range(64):
            for cy in range(64):
                c = _derive_child(parsed, 6, cx * 64, cy * 64, 0, 4096)
                if c is not None:
                    want[(6, cx, cy)] = c
        assert out == want and len(out) > 40

        # the single deep parent spread across >1 task (the whole point
        # of the window shuffle: no 4**6 fan-out pinned to one task)
        assert len({r["pid"] for r in res}) > 1

    def test_multi_level_targets_match_single_calls(self, spark):
        from tippecanoe_spark.overzoom import overzoom

        parent = self._parent()
        df = spark.createDataFrame(
            [(1, 0, 1, bytearray(mvt.gzip_tile(parent)))],
            "z int, x int, y int, tile binary",
        )
        multi = {
            (r["z"], r["x"], r["y"]): bytes(r["tile"])
            for r in overzoom(df, [2, 3, 4], buffer_px=0).collect()
        }
        single = {}
        for tz in (2, 3, 4):
            for r in overzoom(df, tz, buffer_px=0).collect():
                single[(r["z"], r["x"], r["y"])] = bytes(r["tile"])
        assert multi == single
        assert {z for z, _, _ in multi} == {2, 3, 4}


class TestJsonTool:
    """tippecanoe-json-tool equivalent (jsontool.cpp) vs the committed
    .standard goldens (Makefile json-tool-test): -e GEOID10 | sort |
    -c population.csv, byte-for-byte."""

    JP = "/root/reference/tests/join-population"

    def _sorted_features(self):
        import json as _json

        from tippecanoe_spark import jsontool

        src = f"{self.JP}/tabblock_06001420.json"
        # the fixture is CONCATENATED bare features (",\n"-separated, no
        # FeatureCollection wrapper) — pull-parser style decode
        dec = _json.JSONDecoder()
        text = open(src).read()
        feats, pos, n = [], 0, len(text)
        while pos < n:
            while pos < n and text[pos] in " \t\r\n,":
                pos += 1
            if pos >= n:
                break
            doc, pos = dec.raw_decode(text, pos)
            feats.append(doc)
        lines = sorted(jsontool.extract_lines(feats, "GEOID10"))
        return [jsontool.unwrap_sorted_line(l) for l in lines]

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/tests/join-population"),
        reason="reference fixtures unavailable",
    )
    def test_sort_join_standard_golden(self):
        from tippecanoe_spark import jsontool

        got = [
            jsontool.stringify(f)
            for f in jsontool.join_features_csv(
                self._sorted_features(), f"{self.JP}/population.csv"
            )
        ]
        with open(f"{self.JP}/tabblock_06001420.json.sort.joined.standard") as fh:
            want = [l.rstrip("\n") for l in fh]
        assert got == want

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/tests/join-population"),
        reason="reference fixtures unavailable",
    )
    def test_sort_join_null_standard_golden(self):
        from tippecanoe_spark import jsontool

        got = [
            jsontool.stringify(f)
            for f in jsontool.join_features_csv(
                self._sorted_features(), f"{self.JP}/population.csv",
                empty_null=True,
            )
        ]
        with open(
            f"{self.JP}/tabblock_06001420-null.json.sort.joined.standard"
        ) as fh:
            want = [l.rstrip("\n") for l in fh]
        assert got == want

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/tests/join-population"),
        reason="reference fixtures unavailable",
    )
    def test_spark_wrapper_matches_stream(self, spark):
        """The distributed wrapper produces the same joined feature set
        in the same sort order as the sequential reference flow."""
        from tippecanoe_spark import jsontool

        rows = jsontool.spark_join_geojson_csv(
            spark, f"{self.JP}/tabblock_06001420.json",
            f"{self.JP}/population.csv",
        ).collect()
        got = [r["feature"] for r in rows]
        with open(f"{self.JP}/tabblock_06001420.json.sort.joined.standard") as fh:
            want = [l.rstrip("\n") for l in fh]
        assert got == want
