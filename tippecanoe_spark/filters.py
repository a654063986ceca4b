"""Feature-filter expression language → Catalyst compiler (SURVEY §2.7).

The reference evaluates `-j`/`-J` JSON filter ASTs per feature per zoom in
an interpreter (evaluator.cpp:94-365).  Here the same AST compiles once
into a Catalyst ``Column`` over the feature relation — no UDF, so the
predicate participates in pushdown/codegen.

Supported ops (evaluator.cpp):
  ["has", k] / ["!has", k]                        (:136-158)
  [op, k, v] for ==  !=  >  >=  <  <=             (:160-228; type-mismatch
      evaluates false except for != which evaluates true)
  ["all", f...] / ["any", f...] / ["none", f...]  (:230-264)
  ["in", k, v...] / ["!in", k, v...]              (:266-320)
Pseudo-attributes ``$id``, ``$type``, ``$zoom`` (tile.cpp:1254-1279) read
the relation's own columns; ``$type`` compares against Point/LineString/
Polygon names.

Filters may be keyed per layer (``{"layer-name": ast, "*": ast}``,
evaluator.cpp:345-365).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TYPE_NAMES = {"Point": 1, "LineString": 2, "Polygon": 3}
_CMP = {"==", "!=", ">", ">=", "<", "<="}


def _exists(key: str, zoom: int | None) -> Column:
    """mvt_no_such_key test: a key exists when present in the attrs map
    — INCLUDING null-valued attributes (mvt_null is a value, so
    ["has", k] is true for {"k": null}, evaluator.cpp:145-149)."""
    if key == "$id":
        return F.col("feature_id") >= 0
    if key in ("$type", "$zoom"):
        return F.lit(True)
    return F.col("attrs").getItem(key).isNotNull()


def _typed_compare(key: str, value, zoom: int | None) -> dict:
    """The evaluator's strictly-typed compare (evaluator.cpp:12-90):
    string attrs only compare against string literals, numbers against
    numbers, bools against bools, null against null — any type mismatch
    "fails" (false, except != / !in which read it as not-equal).
    Returns {"valid": found-and-type-matched, "eq", "lt", "gt"}.

    Attr typing rides the serialized tags (sources/geojson.py): untagged
    parseable = number, "true"/"false" = bool, NULL_TAG = null,
    STRING_TAG or unparseable = string."""
    false = F.lit(False)
    if key == "$type":
        # mvt pseudo-attr is the geometry NAME string (tile.cpp:1254-1279)
        if isinstance(value, str):
            code = _TYPE_NAMES.get(value)
            valid = F.lit(code is not None)
            eq = (F.col("geom_type") == code) if code is not None else false
            # strcmp ordering of names — only eq is exercised by the
            # reference's own tests; lt/gt fall back to name order
            names = F.when(F.col("geom_type") == 1, "Point").when(
                F.col("geom_type") == 2, "LineString"
            ).otherwise("Polygon")
            return {"valid": valid, "eq": eq,
                    "lt": names < value, "gt": names > value}
        return {"valid": false, "eq": false, "lt": false, "gt": false}
    if key == "$id":
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return {"valid": false, "eq": false, "lt": false, "gt": false}
        fid = F.col("feature_id")
        valid = fid >= 0
        return {"valid": valid, "eq": fid == value,
                "lt": fid < value, "gt": fid > value}
    if key == "$zoom":
        if zoom is None:
            raise ValueError("$zoom used but no zoom bound")
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return {"valid": false, "eq": false, "lt": false, "gt": false}
        z = F.lit(float(zoom))
        return {"valid": F.lit(True), "eq": z == float(value),
                "lt": z < float(value), "gt": z > float(value)}

    raw = F.col("attrs").getItem(key)
    exists = raw.isNotNull()
    null_t = raw.startswith("\x00")
    tagged = raw.startswith("\x02")
    bool_t = exists & ~tagged & ~null_t & raw.isin("true", "false")
    num = F.when(exists & ~tagged & ~null_t & ~bool_t, raw).otherwise(
        F.lit(None)
    ).try_cast("double")
    num_t = num.isNotNull()
    sval = F.when(tagged, raw.substr(F.lit(2), F.length(raw))).otherwise(raw)
    str_t = exists & ~null_t & ~bool_t & ~num_t

    if value is None:
        return {"valid": exists & null_t, "eq": F.lit(True),
                "lt": false, "gt": false}
    if isinstance(value, bool):
        # evaluator.cpp:63-72: cmp = (attr_bool > literal_bool) — kept
        # quirk-faithful: eq is cmp == 0
        ab = raw == "true"
        cmp_gt = ab & F.lit(not value)
        return {"valid": bool_t, "eq": ~cmp_gt, "lt": false, "gt": cmp_gt}
    if isinstance(value, (int, float)):
        v = float(value)
        return {"valid": num_t, "eq": num == v, "lt": num < v, "gt": num > v}
    return {"valid": str_t, "eq": sval == F.lit(value),
            "lt": sval < F.lit(value), "gt": sval > F.lit(value)}


def compile_filter(ast, zoom: int | None = None) -> Column:
    """Filter AST → boolean Column (evaluator.cpp eval/compare)."""
    if not isinstance(ast, list) or not ast:
        raise ValueError(f"bad filter node: {ast!r}")
    op = ast[0]
    if op == "has":
        return _exists(ast[1], zoom)
    if op == "!has":
        return ~_exists(ast[1], zoom)
    if op in _CMP:
        key, value = ast[1], ast[2]
        t = _typed_compare(key, value, zoom)
        ok = F.coalesce(t["valid"], F.lit(False))
        if op == "==":
            return ok & F.coalesce(t["eq"], F.lit(False))
        if op == "!=":
            # missing key / type mismatch ⇒ not equal ⇒ TRUE
            # (evaluator.cpp:178-186, 196-203)
            return ~(ok & F.coalesce(t["eq"], F.lit(False)))
        if op == ">":
            return ok & F.coalesce(t["gt"], F.lit(False))
        if op == ">=":
            return ok & F.coalesce(t["gt"] | t["eq"], F.lit(False))
        if op == "<":
            return ok & F.coalesce(t["lt"], F.lit(False))
        return ok & F.coalesce(t["lt"] | t["eq"], F.lit(False))
    if op == "all":
        out = F.lit(True)
        for sub in ast[1:]:
            out = out & compile_filter(sub, zoom)
        return out
    if op == "any":
        out = F.lit(False)
        for sub in ast[1:]:
            out = out | compile_filter(sub, zoom)
        return out
    if op == "none":
        return ~compile_filter(["any", *ast[1:]], zoom)
    if op == "in":
        # per element: type mismatch reads as not-equal; missing key ⇒
        # false (evaluator.cpp:266-320)
        key = ast[1]
        out = F.lit(False)
        for v in ast[2:]:
            t = _typed_compare(key, v, zoom)
            out = out | (
                F.coalesce(t["valid"], F.lit(False))
                & F.coalesce(t["eq"], F.lit(False))
            )
        return out
    if op == "!in":
        return ~compile_filter(["in", *ast[1:]], zoom)
    if op == "attribute-filter":
        # keeps the FEATURE unconditionally; the named attribute is
        # stripped when the subfilter fails (evaluator.cpp:322-339) —
        # apply_attribute_filters performs the stripping
        return F.lit(True)
    raise ValueError(f"unknown filter op {op!r}")


def collect_attribute_filters(ast) -> dict[str, list]:
    """{attribute name: subfilter AST} from every ``attribute-filter``
    node in the tree (evaluator.cpp:322-339)."""
    out: dict[str, list] = {}
    if not isinstance(ast, list) or not ast:
        return out
    if ast[0] == "attribute-filter":
        out[ast[1]] = ast[2]
        return out
    if ast[0] in ("all", "any", "none"):
        for sub in ast[1:]:
            out.update(collect_attribute_filters(sub))
    return out


def apply_attribute_filters(df, ast, zoom: int | None = None,
                            attrs_col: str = "attrs"):
    """Strip attributes whose ``attribute-filter`` subfilter evaluates
    false for the row — the output-shaping half of the filter language
    (the boolean half is compile_filter)."""
    strippers = collect_attribute_filters(ast)
    if not strippers:
        return df
    conds = {
        name: F.coalesce(compile_filter(sub, zoom), F.lit(False))
        for name, sub in strippers.items()
    }

    def keep_entry(k: Column, v: Column) -> Column:
        out = F.lit(True)
        for name, cond in conds.items():
            out = out & ~((k == F.lit(name)) & ~cond)
        return out

    return df.withColumn(attrs_col, F.map_filter(F.col(attrs_col), keep_entry))


def compile_layer_filters(filters: dict, layer_col: str = "layer",
                          zoom: int | None = None) -> Column:
    """Per-layer filter dict → one predicate: a feature passes if its
    layer's filter (or the ``*`` fallback) accepts it; layers with no
    entry pass (evaluator.cpp:345-365)."""
    out = None
    star = filters.get("*")
    matched = F.lit(False)
    for name, ast in filters.items():
        if name == "*":
            continue
        cond = (F.col(layer_col) == name) & compile_filter(ast, zoom)
        out = cond if out is None else out | cond
        matched = matched | (F.col(layer_col) == name)
    fallback = compile_filter(star, zoom) if star is not None else F.lit(True)
    rest = ~matched & fallback
    return rest if out is None else out | rest
