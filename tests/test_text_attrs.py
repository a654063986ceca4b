"""UTF-8 validation/truncation (P13, text.cpp, unit.cpp:12-47), -T
attribute coercion (serial.cpp:924-958), --set-attribute,
--use-attribute-for-id (serial.cpp:813-848), and the attribute-filter
op (evaluator.cpp:322-339)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tippecanoe_spark.config import TilingConfig
from tippecanoe_spark.text import check_utf8, truncate16, truncate_string


class TestUtf8:
    """Mirrors unit.cpp:12-47 exactly."""

    def test_valid_strings(self):
        for s in ["", "hello world", "Καλημέρα κόσμε", "こんにちは 世界", "👋🌏"]:
            assert check_utf8(s) == ""

    def test_invalid_bytes(self):
        assert (
            check_utf8(b"Hola m\xf3n")
            == '"Hola m\udcf3n" is not valid UTF-8 (0xF3 0x6E)'
        )

    def test_truncate16(self):
        assert truncate16("0123456789abcdefghi", 16) == "0123456789abcdef"
        assert truncate16("0123456789éîôüéîôüç", 16) == "0123456789éîôüéî"
        assert truncate16("0123456789😀😬😁😂😃😄😅😆", 16) == "0123456789😀😬😁"
        assert truncate16("0123456789😀😬😁😂😃😄😅😆", 17) == "0123456789😀😬😁"
        assert truncate16("0123456789あいうえおかきくけこさ", 16) == "0123456789あいうえおか"

    def test_truncate_string_bytes(self):
        assert truncate_string("789éîôüéîôüç", 3) == "789"
        assert truncate_string("789éîôüéîôüç", 4) == "789"
        assert truncate_string("789éîôüéîôüç", 5) == "789é"
        assert truncate_string("789éîôüéîôüç", 6) == "789é"
        assert truncate_string("789éîôüéîôüç", 7) == "789éî"
        assert truncate_string("0123456789😀😬😁😂😃😄😅😆", 13) == "0123456789"
        assert truncate_string("0123456789😀😬😁😂😃😄😅😆", 14) == "0123456789😀"
        assert truncate_string("😀", 3) == ""
        assert truncate_string("😀", 4) == "😀"


class TestCoercion:
    def test_coerce_types(self):
        from tippecanoe_spark.tile import _coerce_typed, _typed_attrs

        assert _coerce_typed("12", "int") == 12
        assert _coerce_typed("12.7", "int") == 13
        assert _coerce_typed("-12.5", "int") == -13  # C round: away from 0
        assert _coerce_typed("", "int") == 0
        assert _coerce_typed("12", "float") == 12.0
        assert _coerce_typed("x", "float") == 0.0
        assert _coerce_typed("12", "string") == "12"
        assert _coerce_typed("false", "bool") is False
        assert _coerce_typed("0", "bool") is False
        assert _coerce_typed("", "bool") is False
        assert _coerce_typed("0.0", "bool") is False
        assert _coerce_typed("yes", "bool") is True

        cfg = TilingConfig(attribute_types={"a": "string", "b": "bool"})
        out = _typed_attrs({"a": "5", "b": "1", "c": "5"}, cfg)
        assert out == {"a": "5", "b": True, "c": 5}

    def test_set_attribute(self):
        from tippecanoe_spark.tile import _typed_attrs

        cfg = TilingConfig(set_attributes={"source": "synth"})
        assert _typed_attrs({"a": "1"}, cfg) == {"a": 1, "source": "synth"}


class TestUseAttributeForId:
    def test_id_from_attribute(self, spark):
        from tippecanoe_spark.features import serialize, pack_cmds

        raw = spark.createDataFrame(
            [
                ("u1", 0, "l", 1, [{"lon": 10.0, "lat": 10.0}], {"myid": "42", "x": "a"}),
                ("u2", 0, "l", 1, [{"lon": 20.0, "lat": 20.0}], {"x": "b"}),
                ("u3", 0, "l", 1, [{"lon": 30.0, "lat": 30.0}], {"myid": "not-a-number"}),
            ],
            "url string, mention_seq int, layer string, geom_type int,"
            " coords array<struct<lon double, lat double>>,"
            " attrs map<string,string>",
        )
        cfg = TilingConfig(use_attribute_for_id="myid")
        out = serialize(raw, cfg).select("url", "feature_id", "attrs").collect()
        by_url = {r["url"]: r for r in out}
        assert by_url["u1"]["feature_id"] == 42
        assert "myid" not in by_url["u1"]["attrs"]
        assert by_url["u2"]["feature_id"] != 42
        # non-numeric id attr: keep original id AND the attribute
        assert by_url["u3"]["attrs"].get("myid") == "not-a-number"


class TestAttributeFilter:
    def test_strips_attr_when_subfilter_fails(self, spark):
        from tippecanoe_spark.filters import (
            apply_attribute_filters,
            compile_filter,
        )

        df = spark.createDataFrame(
            [
                (1, {"name": "a", "rank": "1"}),
                (2, {"name": "b", "rank": "9"}),
            ],
            "feature_id long, attrs map<string,string>",
        )
        ast = ["all", ["attribute-filter", "name", ["<=", "rank", 5]]]
        # the feature predicate keeps everything
        kept = df.filter(compile_filter(ast)).count()
        assert kept == 2
        out = {
            r["feature_id"]: dict(r["attrs"])
            for r in apply_attribute_filters(df, ast).collect()
        }
        assert out[1] == {"name": "a", "rank": "1"}
        assert out[2] == {"rank": "9"}  # name stripped where rank > 5


class TestClipBoundingBox:
    def test_clip_at_ingest(self, spark):
        """P6 (serial.cpp:467-500): points outside the box drop, lines
        clip to the box, polygons clip with SH."""
        from tippecanoe_spark.features import serialize, pack_cmds
        from tippecanoe_spark.config import TilingConfig

        raw = spark.createDataFrame(
            [
                # inside the box
                ("p_in", 0, "l", 1, [{"lon": 0.0, "lat": 0.0}], {}),
                # outside
                ("p_out", 0, "l", 1, [{"lon": 90.0, "lat": 0.0}], {}),
                # line crossing the east edge of the box
                ("line", 0, "l", 2,
                 [{"lon": 0.0, "lat": 0.0}, {"lon": 90.0, "lat": 0.0}], {}),
            ],
            "url string, mention_seq int, layer string, geom_type int,"
            " coords array<struct<lon double, lat double>>,"
            " attrs map<string,string>",
        )
        cfg = TilingConfig(clip_bounding_box=(-10.0, -10.0, 10.0, 10.0))
        rows = {r["url"]: r for r in serialize(raw, cfg).collect()}
        assert "p_in" in rows and "p_out" not in rows
        line = rows["line"]
        # clipped line's bbox ends at the box's east edge (lon 10)
        import numpy as np
        from tippecanoe_spark import proj

        ex, _ = proj.lonlat_to_world(np.array([10.0]), np.array([0.0]))
        assert abs(line["maxx"] - int(ex[0])) <= (1 << 21)  # quantization slack


class TestOrderingModes:
    @staticmethod
    def _pdf():
        import pandas as pd

        from tippecanoe_spark.features import pack_cmds

        rows = []
        # three features, two sharing identical attrs
        specs = [
            (1, {"k": "a"}, 100, 5),
            (2, {"k": "a"}, 200, 1),
            (3, {"k": "b"}, 300, 3),
        ]
        for fid, attrs, x, sq in specs:
            rows.append(
                {
                    "tx": 0, "ty": 0, "feature_id": fid, "layer": "l",
                    "geom_type": 1, "geometry": pack_cmds([(1, x, 100)]),
                    "attrs": attrs, "index": x, "extent": 0,
                    "seq": sq, "feature_minzoom": 0,
                }
            )
        return pd.DataFrame(rows)

    def test_preserve_input_order(self):
        from tippecanoe_spark import mvt
        from tippecanoe_spark.config import TilingConfig
        from tippecanoe_spark.tile import _finalize_tile_dict

        cfg = TilingConfig(preserve_input_order=True, compress_tiles=False)
        out = _finalize_tile_dict(self._pdf(), 4, cfg)
        feats = mvt.decode_tile(bytes(out["tile"]))[0]["features"]
        assert [f["id"] for f in feats] == [2, 3, 1]  # seq order 1,3,5

    def test_coalesce_identical_attrs(self):
        from tippecanoe_spark import mvt
        from tippecanoe_spark.config import TilingConfig
        from tippecanoe_spark.tile import _finalize_tile_dict

        cfg = TilingConfig(coalesce_features=True, compress_tiles=False)
        # coalcmp includes the feature id (tile.cpp:122-133): the two
        # k=a features carry DISTINCT explicit ids, so they must NOT merge
        out = _finalize_tile_dict(self._pdf(), 4, cfg)
        assert out["n_out"] == 3
        # with no ids (negative feature_id = id-less) identical attrs merge
        pdf = self._pdf()
        pdf["feature_id"] = [-1, -2, -3]
        out = _finalize_tile_dict(pdf, 4, cfg)
        feats = mvt.decode_tile(bytes(out["tile"]))[0]["features"]
        assert out["n_out"] == 2  # the two k=a features merged
        merged = [f for f in feats if f["attrs"].get("k") == "a"][0]
        assert len(merged["cmds"]) == 2  # multipoint
