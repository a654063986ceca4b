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


def _attr(key: str, zoom: int | None) -> Column:
    if key == "$id":
        return F.col("feature_id").cast("string")
    if key == "$type":
        return F.col("geom_type").cast("string")
    if key == "$zoom":
        if zoom is None:
            raise ValueError("$zoom used but no zoom bound")
        return F.lit(str(zoom))
    # mvt_null values (sources NULL_TAG) behave as absent in filters,
    # matching the pre-null behavior of the attrs map
    v = F.col("attrs").getItem(key)
    return F.when(v.startswith("\x00"), F.lit(None)).otherwise(v)


def _coerce_pair(key: str, col: Column, value) -> tuple[Column, Column]:
    """Comparison typing: numbers compare numerically (the attrs map is
    all-strings, serial_val style), strings lexically; $type compares via
    the geometry-name table."""
    if key == "$type":
        code = _TYPE_NAMES.get(value)
        return F.col("geom_type"), F.lit(code if code is not None else -1)
    if isinstance(value, bool):
        return col, F.lit("true" if value else "false")
    if isinstance(value, (int, float)):
        return col.cast("double"), F.lit(float(value))
    return col, F.lit(value)


def compile_filter(ast, zoom: int | None = None) -> Column:
    """Filter AST → boolean Column."""
    if not isinstance(ast, list) or not ast:
        raise ValueError(f"bad filter node: {ast!r}")
    op = ast[0]
    if op == "has":
        return _attr(ast[1], zoom).isNotNull()
    if op == "!has":
        return _attr(ast[1], zoom).isNull()
    if op in _CMP:
        key, value = ast[1], ast[2]
        col, lit = _coerce_pair(key, _attr(key, zoom), value)
        if op == "==":
            cond = col == lit
        elif op == "!=":
            # type-mismatch / missing ⇒ true for != (evaluator.cpp:219-224)
            return ~F.coalesce(col == lit, F.lit(False))
        elif op == ">":
            cond = col > lit
        elif op == ">=":
            cond = col >= lit
        elif op == "<":
            cond = col < lit
        else:
            cond = col <= lit
        return F.coalesce(cond, F.lit(False))
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
        key = ast[1]
        col = _attr(key, zoom)
        out = F.lit(False)
        for v in ast[2:]:
            c, lit = _coerce_pair(key, col, v)
            out = out | F.coalesce(c == lit, F.lit(False))
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
