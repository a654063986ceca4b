"""tippecanoe-json-tool equivalent (jsontool.cpp): streaming GeoJSON
flatten, sort-key extraction, and sort-merge CSV join on feature
attributes.

The reference tool is a sequential filter designed to compose with
`sort(1)`:

  json-tool -e KEY in.json | sort | json-tool -c table.csv

Here the same three stages exist as plain-iterator functions (the
parity tests drive them byte-for-byte against the reference's committed
`.standard` goldens) plus a Spark wrapper that runs the flatten/join
distributed for big inputs: features parse in parallel, the CSV is
broadcast, and the output keeps the reference's key order (joined
columns appended at the end of properties).

Number formatting caveat: the reference stringifies every number
through milo dtoa (shortest round-trip); Python's repr matches it for
all values that appear in the fixtures, but exponent rendering differs
(1e-07 vs 1e-7) for magnitudes below 1e-6.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator

from .csvutil import csv_dequote, csv_is_number, csv_split

# ---------------------------------------------------------------------------
# sort_quote (jsontool.cpp:109-142): encode a string so its QUOTED form
# sorts in UTF-32 order — codepoints below 0xD800 print as decimal
# \u%04lu escapes (a quirk, not hex), the rest as raw UTF-8 bytes
# ---------------------------------------------------------------------------


def sort_quote(s: str) -> str:
    out: list[str] = []
    for ch in s:
        c = ord(ch)
        if c < 0xD800:
            out.append("\\u%04d" % c)
        else:
            out.append(ch)
    return "".join(out)


def _quote_str(s: str) -> str:
    """jsonpull's string escaping: backslash and quote escaped, control
    chars as lowercase \\u%04x, everything else raw UTF-8."""
    out = ['"']
    for ch in s:
        if ch in ('\\', '"'):
            out.append("\\" + ch)
        elif ch < " ":
            out.append("\\u%04x" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def stringify(obj) -> str:
    """json_stringify analog: compact, insertion-ordered, raw UTF-8;
    integer tokens print as integers (json_pull large_signed path),
    doubles through Grisu2 (dtoa_milo) — byte-faithful to the
    reference, including Grisu2's occasional non-shortest output."""
    from .grisu import dtoa_milo

    parts: list[str] = []

    def ser(o):
        if o is None:
            parts.append("null")
        elif o is True:
            parts.append("true")
        elif o is False:
            parts.append("false")
        elif isinstance(o, str):
            parts.append(_quote_str(o))
        elif isinstance(o, int):
            parts.append(str(o))
        elif isinstance(o, float):
            parts.append(dtoa_milo(o))
        elif isinstance(o, dict):
            parts.append("{")
            for i, (k, v) in enumerate(o.items()):
                if i:
                    parts.append(",")
                parts.append(_quote_str(str(k)))
                parts.append(":")
                ser(v)
            parts.append("}")
        elif isinstance(o, (list, tuple)):
            parts.append("[")
            for i, v in enumerate(o):
                if i:
                    parts.append(",")
                ser(v)
            parts.append("]")
        else:
            parts.append(json.dumps(o))

    ser(obj)
    return "".join(parts)


def _sort_key_of(feature: dict, key: str) -> str:
    props = feature.get("properties") or {}
    if key not in props:
        return sort_quote("null")
    v = props[key]
    if isinstance(v, str):
        return sort_quote(v)
    if isinstance(v, bool):
        return sort_quote(stringify(v))
    if isinstance(v, (int, float)):
        return sort_quote(_num_str(v))
    return sort_quote(stringify(v))


def _num_str(v) -> str:
    if isinstance(v, int):
        return str(v)
    from .grisu import dtoa_milo

    return dtoa_milo(float(v))


def extract_lines(features: Iterable[dict], key: str) -> Iterator[str]:
    """-e KEY: one `{"<sort-quoted key>":<feature>}` line per feature —
    pipe through sort(1) (or sorted()) before the CSV join."""
    for f in features:
        yield '{"%s":%s}' % (_sort_key_of(f, key), stringify(f))


# ---------------------------------------------------------------------------
# -c table.csv: sort-merge join (jsontool.cpp:206-377)
# ---------------------------------------------------------------------------


def _join_key_str(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return stringify(v)
    if isinstance(v, (int, float)):
        return _num_str(v)
    return stringify(v)


def join_features_csv(
    features: Iterable[dict], csv_path: str, empty_null: bool = False
) -> Iterator[dict]:
    """Sort-merge join of a KEY-SORTED feature stream against a sorted
    CSV (header column 0 is the key).  Values type like the reference:
    dequoted first, then JSON-number rule → float, empty → "" (or
    dropped with --empty-csv-columns-are-null); joined columns append at
    the end of properties; both inputs must be sorted or ValueError."""
    fh = open(csv_path, encoding="utf-8")
    header_line = fh.readline()
    if not header_line:
        raise ValueError("couldn't get column header from CSV file")
    header = [csv_dequote(h) for h in csv_split(header_line)]
    fields: list[str] = []
    prev_joinkey: str | None = None
    prev_csvkey = ""

    def next_csv_row() -> list[str]:
        line = fh.readline()
        if not line:
            return []
        return [csv_dequote(x) for x in csv_split(line)]

    for feature in features:
        props = feature.get("properties") or {}
        if header[0] not in props:
            yield feature
            continue
        joinkey = _join_key_str(props[header[0]])
        if prev_joinkey is not None and joinkey < prev_joinkey:
            raise ValueError(
                f'GeoJSON file is out of sort: "{joinkey}" follows "{prev_joinkey}"'
            )
        prev_joinkey = joinkey

        if not fields or joinkey > fields[0]:
            while True:
                fields = next_csv_row()
                if not fields:
                    break
                if fields[0] < prev_csvkey:
                    raise ValueError(
                        f'CSV file is out of sort: "{fields[0]}"'
                        f' follows "{prev_csvkey}"'
                    )
                if fields[0] >= joinkey:
                    break
                prev_csvkey = fields[0]

        if fields and joinkey == fields[0]:
            for i in range(1, min(len(fields), len(header))):
                v = fields[i]
                if v:
                    if v.startswith('"'):
                        props[header[i]] = csv_dequote(v)
                    elif csv_is_number(v):
                        props[header[i]] = float(v)
                    else:
                        props[header[i]] = v
                elif not empty_null:
                    props[header[i]] = ""
        yield feature


def unwrap_sorted_line(line: str) -> dict | None:
    """One `{"<quoted>":<feature>}` (or bare feature) line → the feature
    dict — the harvest behavior of the reference's read_json pull parser,
    which finds Features anywhere inside a JSON value."""
    line = line.strip()
    if not line:
        return None
    obj = json.loads(line)
    while isinstance(obj, dict) and obj.get("type") != "Feature":
        vals = list(obj.values())
        if len(vals) != 1:
            return None
        obj = vals[0]
    return obj if isinstance(obj, dict) else None


# ---------------------------------------------------------------------------
# Spark wrapper: distributed flatten + broadcast join, same output rows
# ---------------------------------------------------------------------------


def spark_join_geojson_csv(
    spark, geojson_path: str, csv_path: str, empty_null: bool = False
):
    """Distributed equivalent of `-e KEY | sort | -c table.csv` for a
    unique-key CSV: features parse in parallel (whole-file pull-parser
    semantics), the CSV becomes a broadcast map, and the result is the
    joined feature stream ordered by the reference's sort-quoted key.
    Returns a DataFrame with (sortkey string, feature json string)."""
    from pyspark.sql import functions as F

    from .csvutil import read_join_csv

    header, mapping = read_join_csv(csv_path)
    # jsontool dequotes EVERY field at read (jsontool.cpp:288-291),
    # unlike tile-join which keeps quotes for typing
    dq = {k: [csv_dequote(x) for x in row] for k, row in mapping.items()}
    key_col = header[0]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            keys, feats = [], []
            for text in pdf["value"]:
                dec = json.JSONDecoder()
                pos = 0
                n = len(text)
                while pos < n:
                    while pos < n and text[pos] in " \t\r\n\x1e,":
                        pos += 1
                    if pos >= n:
                        break
                    try:
                        doc, pos = dec.raw_decode(text, pos)
                    except json.JSONDecodeError:
                        break
                    stack = [doc]
                    while stack:
                        o = stack.pop()
                        if isinstance(o, dict):
                            if o.get("type") == "Feature":
                                feats.append(o)
                            elif o.get("type") == "FeatureCollection":
                                stack.extend(reversed(o.get("features") or []))
                            else:
                                stack.extend(reversed(list(o.values())))
                        elif isinstance(o, list):
                            stack.extend(reversed(o))
            rows_k, rows_j = [], []
            for f in feats:
                props = f.get("properties") or {}
                if key_col in props:
                    jk = _join_key_str(props[key_col])
                    row = dq.get(jk)
                    if row:
                        for i in range(1, min(len(row), len(header))):
                            v = row[i]
                            if v:
                                if csv_is_number(v):
                                    props[header[i]] = float(v)
                                else:
                                    props[header[i]] = v
                            elif not empty_null:
                                props[header[i]] = ""
                rows_k.append(_sort_key_of(f, key_col))
                rows_j.append(stringify(f))
            if rows_k:
                yield pd.DataFrame({"sortkey": rows_k, "feature": rows_j})

    return (
        spark.read.text(geojson_path, wholetext=True)
        .mapInPandas(gen, schema="sortkey string, feature string")
        .orderBy("sortkey")
    )


def main(argv: list[str] | None = None) -> int:
    """CLI: python -m tippecanoe_spark.jsontool [-e KEY] [-c CSV] [-pe] file"""
    import argparse
    import sys

    ap = argparse.ArgumentParser(prog="tippecanoe-spark-json-tool")
    ap.add_argument("-e", "--extract")
    ap.add_argument("-c", "--csv")
    ap.add_argument(
        "-pe", "--empty-csv-columns-are-null", action="store_true", dest="pe"
    )
    ap.add_argument("files", nargs="*")
    args = ap.parse_args(argv)

    def feature_stream():
        dec = json.JSONDecoder()
        for path in args.files or ["/dev/stdin"]:
            with open(path, encoding="utf-8") as f:
                text = f.read()
            pos, n = 0, len(text)
            while pos < n:
                while pos < n and text[pos] in " \t\r\n\x1e,":
                    pos += 1
                if pos >= n:
                    break
                try:
                    doc, pos = dec.raw_decode(text, pos)
                except json.JSONDecodeError:
                    break
                stack = [doc]
                while stack:
                    o = stack.pop()
                    if isinstance(o, dict):
                        if o.get("type") == "Feature":
                            yield o
                        elif o.get("type") == "FeatureCollection":
                            stack.extend(reversed(o.get("features") or []))
                        else:
                            stack.extend(reversed(list(o.values())))
                    elif isinstance(o, list):
                        stack.extend(reversed(o))

    if args.extract:
        for line in extract_lines(feature_stream(), args.extract):
            sys.stdout.write(line + "\n")
    elif args.csv:
        for f in join_features_csv(feature_stream(), args.csv, args.pe):
            sys.stdout.write(stringify(f) + "\n")
    else:
        for f in feature_stream():
            sys.stdout.write(stringify(f) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
