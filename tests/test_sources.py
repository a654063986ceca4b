"""GeoJSON / CSV source adapters + CLI end-to-end."""

from __future__ import annotations

import json
import os
import sqlite3

import numpy as np
import pytest

from tippecanoe_spark.features import OP_CLOSEPATH, OP_MOVETO, unpack_cmds_tuples


REF_DATELINE = "/root/reference/tests/dateline/in.json"


class TestGeoJsonSource:
    @pytest.fixture(scope="class")
    def ndjson_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("src") / "in.ndjson"
        feats = [
            {
                "type": "Feature",
                "id": 7,
                "properties": {"name": "pt", "rank": 3, "ok": True,
                               "nested": {"a": 1}, "drop": None},
                "geometry": {"type": "Point", "coordinates": [10.0, 20.0]},
            },
            {
                "type": "Feature",
                "properties": {"name": "ring"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                        [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]],  # hole
                    ],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "mls"},
                "geometry": {
                    "type": "MultiLineString",
                    "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]],
                },
            },
            {"type": "Point", "coordinates": [5.0, 5.0]},  # bare geometry
        ]
        with open(p, "w") as fh:
            for f in feats:
                fh.write(json.dumps(f) + "\n")
        return str(p)

    def test_ndjson_rows(self, spark, ndjson_path):
        from tippecanoe_spark.sources.geojson import read_geojson

        rows = read_geojson(spark, ndjson_path, layer="L").collect()
        by_name = {}
        for r in rows:
            by_name.setdefault((r["attrs"] or {}).get("name"), []).append(r)
        # point with explicit id and stringified attrs
        pt = by_name["pt"][0]
        assert pt["feature_id"] == 7 and pt["geom_type"] == 1
        assert pt["attrs"]["rank"] == "3" and pt["attrs"]["ok"] == "true"
        assert json.loads(pt["attrs"]["nested"]) == {"a": 1}
        # JSON null survives serialization as mvt_null (NULL_TAG), like
        # the reference (read_json.cpp JSON_NULL); it drops at MVT encode
        # unless a -T coercion claims it
        assert pt["attrs"]["drop"] == "\x00null"
        assert pt["layer"] == "L"
        # polygon with hole: one feature, 2 rings, opposite winding
        poly = by_name["ring"][0]
        ops = [o for o, _, _ in unpack_cmds_tuples(poly["geometry"])]
        assert ops.count(OP_MOVETO) == 2 and ops.count(OP_CLOSEPATH) == 2
        # multilinestring stays ONE feature with two MOVETO segments
        # (reference serial_feature semantics; avoids duplicate names in
        # per-tile multisets)
        assert len(by_name["mls"]) == 1
        mls = by_name["mls"][0]
        assert mls["geom_type"] == 2
        assert [o for o, _, _ in unpack_cmds_tuples(mls["geometry"])].count(OP_MOVETO) == 2
        # bare geometry accepted
        assert len(rows) == 4

    def test_whole_file_featurecollection(self, spark, tmp_path):
        from tippecanoe_spark.sources.geojson import read_geojson

        fc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": {"i": i},
                    "geometry": {"type": "Point", "coordinates": [i, i]},
                }
                for i in range(5)
            ],
        }
        p = tmp_path / "fc.json"
        p.write_text(json.dumps(fc, indent=2))  # multi-line on purpose
        rows = read_geojson(spark, str(p)).collect()
        assert len(rows) == 5
        assert sorted(int(r["attrs"]["i"]) for r in rows) == [0, 1, 2, 3, 4]

    @pytest.mark.skipif(not os.path.exists(REF_DATELINE), reason="no reference")
    def test_reference_dateline_fixture(self, spark):
        """Reference fixture parses and tiles: every feature lands in a
        z1 tile consistent with its bbox (tile-assignment parity check)."""
        from tippecanoe_spark import tile as tilemod
        from tippecanoe_spark.config import TilingConfig
        from tippecanoe_spark.minzoom import stamp_minzoom
        from tippecanoe_spark.sources.geojson import read_geojson

        feats = read_geojson(spark, REF_DATELINE, layer="dateline")
        n = feats.count()
        with open(REF_DATELINE) as fh:
            doc = json.load(fh)
        # >= because Multi* geometries explode into parts
        assert n >= len(doc["features"])
        cfg = TilingConfig(maxzoom=2, no_feature_dropping=True)
        stamped = stamp_minzoom(feats, cfg)
        tiles = tilemod.tiles_for_zoom(stamped, 1, cfg).collect()
        assert tiles
        total = sum(r["n_out"] for r in tiles)
        assert total >= n  # buffered duplication allowed


class TestCsvSource:
    def test_read_geocsv(self, spark, tmp_path):
        from tippecanoe_spark.sources.geocsv import read_geocsv

        p = tmp_path / "pts.csv"
        p.write_text(
            "name,Latitude,Longitude,population\n"
            "a,10.5,-20.25,1000\n"
            "b,-33.9,151.2,5000000\n"
            "c,,151.2,1\n"  # missing lat dropped
        )
        rows = read_geocsv(spark, str(p), layer="cities").collect()
        assert len(rows) == 2
        from tippecanoe_spark.mvt import coerce_string_value

        by = {coerce_string_value(r["attrs"]["name"]): r for r in rows}
        # non-numbers are STRING_TAGged (geocsv.cpp dequote-then-type),
        # numbers stay bare for the encoder's numeric coerce
        assert by["a"]["attrs"]["name"] == "\x02a"
        assert by["a"]["attrs"]["population"] == "1000"
        assert by["a"]["geom_type"] == 1 and by["a"]["layer"] == "cities"
        # projection sanity: b is in the southern/eastern hemisphere
        assert by["b"]["minx"] > (1 << 31) and by["b"]["miny"] > (1 << 31)


class TestCli:
    def test_cli_builds_mbtiles(self, spark, tmp_path):
        from tippecanoe_spark import cli, mvt

        src = tmp_path / "in.ndjson"
        with open(src, "w") as fh:
            for i in range(20):
                fh.write(
                    json.dumps(
                        {
                            "type": "Feature",
                            "properties": {"i": i},
                            "geometry": {
                                "type": "Point",
                                "coordinates": [i * 10 - 90, i * 5 - 40],
                            },
                        }
                    )
                    + "\n"
                )
        out = tmp_path / "out.mbtiles"
        rc = cli.main(
            [str(src), "-o", str(out), "-z", "2", "-l", "pts",
             "--no-feature-dropping", "--checkpoint-dir", str(tmp_path / "ck")]
        )
        assert rc == 0 and out.exists()
        con = sqlite3.connect(str(out))
        n_tiles = con.execute("SELECT count(*) FROM tiles").fetchone()[0]
        meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
        assert n_tiles > 0
        assert meta["maxzoom"] == "2" and "vector_layers" in meta["json"]
        blob = con.execute("SELECT tile_data FROM tiles LIMIT 1").fetchone()[0]
        layers = mvt.decode_tile(blob)
        assert layers and layers[0]["name"] == "pts"
        con.close()


class TestFlatGeobuf:
    FGB = "/root/reference/tests/flatgeobuf/numeric-properties.fgb"
    GOLD = "/root/reference/tests/flatgeobuf/numeric-properties.json"

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/tests/flatgeobuf"),
        reason="reference fixtures unavailable",
    )
    def test_fixture_parity(self, spark):
        """S4: the .fgb fixture decodes to the same feature/attrs the
        reference's golden z0 decode shows (numeric column types incl.
        int64/uint64 extremes, float32, bool, string)."""
        import json

        from tippecanoe_spark import mvt
        from tippecanoe_spark import tile as tilemod
        from tippecanoe_spark.config import TilingConfig
        from tippecanoe_spark.minzoom import stamp_minzoom
        from tippecanoe_spark.sources.flatgeobuf import read_flatgeobuf

        with open(self.GOLD) as fh:
            gold = json.load(fh)
        gold_feat = gold["features"][0]["features"][0]
        cfg = TilingConfig(maxzoom=0)
        feats = read_flatgeobuf(spark, self.FGB, cfg=cfg)
        stamped = stamp_minzoom(feats, cfg)
        tiles = tilemod.tiles_for_zoom(stamped, 0, cfg).collect()
        assert len(tiles) == 1
        layers = mvt.decode_tile(bytes(tiles[0]["tile"]))
        assert layers[0]["name"] == "numeric-properties"
        attrs = layers[0]["features"][0]["attrs"]
        for k, v in gold_feat["properties"].items():
            assert attrs.get(k) == v, (k, attrs.get(k), v)


class TestGeobuf:
    def test_roundtrip_geometries(self):
        """S5: encode→decode round trip across every geometry type
        (geobuf spec: delta-coded sint coords at 10^precision,
        polygon rings unclosed on the wire)."""
        from tippecanoe_spark.sources.geobuf import encode_geobuf, parse_geobuf

        feats = [
            {"type": "Feature", "geometry": {"type": "Point",
             "coordinates": [12.5, -7.25]},
             "properties": {"name": "p", "rank": 3, "neg": -5,
                            "f": 1.5, "ok": True}},
            {"type": "Feature", "geometry": {"type": "LineString",
             "coordinates": [[0, 0], [10, 5], [20, -5]]},
             "properties": {}, "id": 42},
            {"type": "Feature", "geometry": {"type": "Polygon",
             "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                             [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]]]},
             "properties": {"kind": "donut"}},
            {"type": "Feature", "geometry": {"type": "MultiPolygon",
             "coordinates": [
                 [[[0, 0], [5, 0], [5, 5], [0, 5], [0, 0]]],
                 [[[20, 20], [25, 20], [25, 25], [20, 25], [20, 20]]],
             ]}, "properties": {}},
            {"type": "Feature", "geometry": {"type": "MultiPoint",
             "coordinates": [[1, 1], [2, 2]]}, "properties": {}},
        ]
        out = parse_geobuf(encode_geobuf(feats))
        assert len(out) == len(feats)
        for a, b in zip(feats, out):
            assert b["geometry"]["type"] == a["geometry"]["type"]
            assert b.get("properties") == a.get("properties")
            if "id" in a:
                assert b["id"] == a["id"]
            if a["geometry"]["type"] != "Point":
                ga = np.array(
                    a["geometry"]["coordinates"], dtype=object
                )
            # coordinates equal to 1e-6 precision
            flat_a = json.dumps(a["geometry"]["coordinates"])
            flat_b = json.dumps(b["geometry"]["coordinates"])
            na = np.array(json.loads(flat_a), dtype=object)
            nb = np.array(json.loads(flat_b), dtype=object)
            assert str(na.shape) == str(nb.shape)

    def test_spark_read(self, spark, tmp_path):
        from tippecanoe_spark.sources.geobuf import encode_geobuf, read_geobuf

        feats = [
            {"type": "Feature", "geometry": {"type": "Point",
             "coordinates": [float(i), float(i) / 2]},
             "properties": {"n": i}}
            for i in range(10)
        ]
        p = tmp_path / "test.geobuf"
        p.write_bytes(encode_geobuf(feats))
        df = read_geobuf(spark, str(p), layer="gb")
        rows = df.collect()
        assert len(rows) == 10
        assert all(r["layer"] == "gb" for r in rows)
        assert sorted(int(r["attrs"]["n"]) for r in rows) == list(range(10))
