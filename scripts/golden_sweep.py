#!/usr/bin/env python3
"""Generic golden sweep: for EVERY tests/<suite>/out/<flags>.json golden
in the reference repo, reconstruct the build from the flag-encoded
filename (the reference Makefile's %.json.check rule), run our pipeline,
render the full-tileset decode with reference-exact metadata, and
byte-compare against the committed golden.

Reports one line per golden: BYTE_OK / DIFF@n / UNSUPPORTED(flag) /
ERROR.  Usage:  python3 scripts/golden_sweep.py [suite-substring ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/tests"


def decode_flags(stem: str) -> list[str]:
    """Makefile testargs decoding: '_' separates args; %XX escapes."""
    parts = stem.split("_")
    out = []
    for p in parts:
        for a, b in (("%5f", "_"), ("%7b", "{"), ("%2f", "/"), ("%3d", "="),
                     ("%3a", ":"), ("%22", '"'), ("%20", " ")):
            p = p.replace(a, b)
        out.append(p)
    return out


class Unsupported(Exception):
    pass


A_MAP = {
    "L": {"grid_low_zooms": True},
    "b": {"detect_shared_borders": True},
    "t": {"variable_depth_pyramid": True},
    "v": {"visvalingam": True},
    "c": {"coalesce_features": True},
    "o": {"reorder_features": True},
    "w": {"detect_longitude_wraparound": True},
    "g": {"calculate_feature_density": True},
    "s": {"drop_densest_as_needed": True},
    "n": {"drop_smallest_as_needed": True},
    "d": {"drop_fraction_as_needed": True},
    "S": {"coalesce_densest_as_needed": True},
    "N": {"coalesce_smallest_as_needed": True},
    "C": {"cluster_densest_as_needed": True},
    "@": {},
}

P_MAP = {
    "i": {"preserve_input_order": True},
    "f": {"max_tile_features": 0},
    "k": {"max_tile_size": 0},
    "s": {"no_line_simplification": True},
    "S": {"simplify_only_low_zooms": True},
    "t": {"tiny_polygon_size": 0.0},
    "T": {"tiny_polygon_reduction_at_maxzoom": False},
    "n": {"preserve_shared_nodes": True},
    "w": {"use_source_polygon_winding": True},
    "W": {"reverse_source_polygon_winding": True},
    "C": {},  # no tile compression — invisible to the decode text
    "d": {"no_feature_dropping": True},  # P_DYNAMIC_DROP
}

LONG_MAP = {
    "--drop-densest-as-needed": {"drop_densest_as_needed": True},
    "--drop-smallest-as-needed": {"drop_smallest_as_needed": True},
    "--drop-fraction-as-needed": {"drop_fraction_as_needed": True},
    "--coalesce-densest-as-needed": {"coalesce_densest_as_needed": True},
    "--coalesce-smallest-as-needed": {"coalesce_smallest_as_needed": True},
    "--coalesce-fraction-as-needed": {},  # unsupported marker below
    "--cluster-densest-as-needed": {"cluster_densest_as_needed": True},
    "--grid-low-zooms": {"grid_low_zooms": True},
    "--detect-longitude-wraparound": {"detect_longitude_wraparound": True},
    "--detect-shared-borders": {"detect_shared_borders": True},
    "--generate-variable-depth-tile-pyramid": {"variable_depth_pyramid": True},
    "--visvalingam": {"visvalingam": True},
    "--preserve-input-order": {"preserve_input_order": True},
    "--no-tiny-polygon-reduction": {"tiny_polygon_size": 0.0},
    "--no-line-simplification": {"no_line_simplification": True},
    "--no-simplification-of-shared-nodes": {"preserve_shared_nodes": True},
    "--no-tile-size-limit": {"max_tile_size": 0},
    "--no-feature-limit": {"max_tile_features": 0},
    "--no-polygon-splitting": {},  # always-on behavior difference: none
    "--no-duplication": {},  # only affects internals at z0 edges
}


def parse_flags(args: list[str]):
    """argv-ish flag list → (cfg kwargs, extras dict).  Raises
    Unsupported for anything the engine can't honor yet."""
    kw: dict = {}
    extras = {"layer": None, "layer_json": None, "order_by": None,
              "order_desc": False, "use_attr_id": None,
              "no_tilestats": False, "attr_desc": {}, "filter": None}
    i = 0

    def val(flag, arg):
        nonlocal i
        if len(arg) > 2:
            return arg[2:]
        i += 1
        if i >= len(args):
            raise Unsupported(f"{flag} missing value")
        return args[i]

    while i < len(args):
        a = args[i]
        if a in ("-q", "-f", "-P") or a.startswith("-o"):
            pass
        elif a.startswith("--"):
            if "=" in a:
                name, v = a.split("=", 1)
            else:
                name, v = a, None
            if name in LONG_MAP:
                if name == "--coalesce-fraction-as-needed":
                    raise Unsupported(name)
                kw.update(LONG_MAP[name])
            elif name == "--clip-bounding-box":
                if v is None:
                    i += 1
                    v = args[i]
                w, s, e, n = (float(x) for x in v.split(","))
                kw["clip_bounding_box"] = (w, s, e, n)
            elif name == "--retain-points-multiplier":
                if v is None:
                    i += 1
                    v = args[i]
                kw["retain_points_multiplier"] = int(v)
            elif name == "--smallest-maximum-zoom-guess":
                if v is None:
                    i += 1
                    v = args[i]
                kw["min_maxzoom"] = int(v)
                kw.setdefault("maxzoom", -1)
            elif name == "--extra-detail":
                if v is None:
                    i += 1
                    v = args[i]
                kw["extra_detail"] = int(v)
            elif name == "--maximum-string-attribute-length":
                if v is None:
                    i += 1
                    v = args[i]
                kw["max_string_attribute_length"] = int(v)
            elif name == "--accumulate-attribute":
                if v is None:
                    i += 1
                    v = args[i]
                k2, op = v.split(":", 1)
                kw.setdefault("accumulate_attrs", {})[k2] = op
            elif name == "--order-by":
                extras["order_by"] = v if v is not None else args[(i := i + 1)]
            elif name == "--order-descending-by":
                extras["order_by"] = v if v is not None else args[(i := i + 1)]
                extras["order_desc"] = True
            elif name == "--use-attribute-for-id":
                extras["use_attr_id"] = v if v is not None else args[(i := i + 1)]
            elif name == "--limit-tile-feature-count":
                if v is None:
                    i += 1
                    v = args[i]
                kw["limit_tile_feature_count"] = int(v)
            elif name == "--no-tile-stats":
                extras["no_tilestats"] = True
            else:
                raise Unsupported(name)
        elif a.startswith("-z"):
            v = a[2:] or "g"
            kw["maxzoom"] = -1 if v == "g" else int(v)
        elif a.startswith("-Z"):
            kw["minzoom"] = int(val("-Z", a))
        elif a.startswith("-B"):
            v = val("-B", a)
            if v == "g":
                kw["basezoom"] = -2
            else:
                try:
                    kw["basezoom"] = int(v)
                except ValueError:
                    raise Unsupported(f"-B{v}")
        elif a.startswith("-d"):
            kw["full_detail"] = int(val("-d", a))
        elif a.startswith("-D"):
            kw["low_detail"] = int(val("-D", a))
        elif a.startswith("-m"):
            kw["min_detail"] = int(val("-m", a))
        elif a.startswith("-b"):
            kw["buffer"] = int(val("-b", a))
        elif a.startswith("-r"):
            v = val("-r", a)
            if v == "g":
                kw["droprate"] = -1.0
            else:
                try:
                    kw["droprate"] = float(v)
                except ValueError:
                    raise Unsupported(f"-r{v}")
        elif a.startswith("-g"):
            kw["gamma"] = float(val("-g", a))
        elif a.startswith("-M"):
            kw["max_tile_size"] = int(val("-M", a))
        elif a.startswith("-O"):
            kw["max_tile_features"] = int(val("-O", a))
        elif a.startswith("-K"):
            kw["cluster_distance"] = int(val("-K", a))
        elif a.startswith("-S"):
            kw["simplification"] = float(val("-S", a))
        elif a.startswith("-Y"):
            v = val("-Y", a)
            k2, d2 = v.split(":", 1)
            extras["attr_desc"][k2] = d2
        elif a.startswith("-J"):
            extras["filter"] = ("file", val("-J", a))
        elif a.startswith("-j"):
            extras["filter"] = ("json", val("-j", a))
        elif a.startswith("-y"):
            kw.setdefault("include_attrs", []).append(val("-y", a))
        elif a.startswith("-x"):
            kw.setdefault("exclude_attrs", []).append(val("-x", a))
        elif a == "-X":
            kw["exclude_all_attrs"] = True
        elif a.startswith("-T"):
            v = val("-T", a)
            k2, t2 = v.split(":", 1)
            kw.setdefault("attribute_types", {})[k2] = t2
        elif a.startswith("-E"):
            v = val("-E", a)
            k2, op = v.split(":", 1)
            kw.setdefault("accumulate_attrs", {})[k2] = op
        elif a.startswith("-l"):
            extras["layer"] = val("-l", a)
        elif a.startswith("-L"):
            v = val("-L", a)
            if v.startswith("{"):
                extras["layer_json"] = json.loads(v)
            else:
                raise Unsupported(f"-L{v}")
        elif a.startswith("-s"):
            kw["projection"] = val("-s", a)
        elif a.startswith("-a"):
            for ch in a[2:]:
                if ch not in A_MAP:
                    raise Unsupported(f"-a{ch}")
                kw.update(A_MAP[ch])
        elif a.startswith("-p"):
            for ch in a[2:]:
                if ch not in P_MAP:
                    raise Unsupported(f"-p{ch}")
                kw.update(P_MAP[ch])
        else:
            raise Unsupported(a)
        i += 1
    if "include_attrs" in kw:
        kw["include_attrs"] = tuple(kw["include_attrs"])
    if "exclude_attrs" in kw:
        kw["exclude_attrs"] = tuple(kw["exclude_attrs"])
    return kw, extras


def geojson_world_vertices(paths):
    import gzip as _gz

    from tippecanoe_spark import proj

    lons, lats = [], []
    for path in paths:
        op = _gz.open if path.endswith(".gz") else open
        with op(path, "rt") as fh:
            text = fh.read()
        dec = json.JSONDecoder()
        pos, n = 0, len(text)
        while pos < n:
            while pos < n and text[pos] in " \t\r\n,\x1e":
                pos += 1
            if pos >= n:
                break
            try:
                doc, pos = dec.raw_decode(text, pos)
            except Exception:
                break
            feats = doc.get("features") or [doc] if isinstance(doc, dict) else []
            for f in feats:
                g = f.get("geometry") if isinstance(f, dict) else None
                if not g or not g.get("coordinates"):
                    continue

                def walk(c):
                    if isinstance(c[0], (int, float)):
                        lons.append(c[0])
                        lats.append(c[1])
                    else:
                        for e in c:
                            walk(e)

                walk(g["coordinates"])
    return proj.lonlat_to_world(np.array(lons), np.array(lats))


def format_commandline(args: list[str]) -> str:
    out = []
    ok = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789/-_@:.%,")
    for a in args:
        if all(c in ok for c in a):
            out.append(a)
        else:
            out.append("'" + a.replace("'", "'\"'\"'") + "'")
    return " ".join(out)


def run_one(spark, gold_path: str, verbose: bool = False) -> str:
    from tippecanoe_spark import tile as tilemod
    from tippecanoe_spark.config import TilingConfig
    from tippecanoe_spark.decode import tileset_to_text
    from tippecanoe_spark.minzoom import stamp_minzoom
    from tippecanoe_spark.plan import resolve_plan
    from tippecanoe_spark.sinks import make_metadata_ref, raw_file_bboxes
    from tippecanoe_spark.sources.geojson import read_geojson

    suite = gold_path.split("/tests/")[1].split("/")[0]
    stem = os.path.basename(gold_path)[: -len(".json")]
    flags = decode_flags(stem)
    kw, extras = parse_flags(flags)
    order_by = extras["order_by"]
    if order_by is not None:
        kw["order_by"] = order_by
        kw["order_descending"] = extras["order_desc"]
    if extras["use_attr_id"] is not None:
        kw["use_attribute_for_id"] = extras["use_attr_id"]

    if extras["filter"] is not None:
        kind, v = extras["filter"]
        if kind == "file":
            path = v if os.path.isabs(v) else os.path.join("/root/reference", v)
            with open(path) as fh:
                extras["filter"] = json.load(fh)
        else:
            extras["filter"] = json.loads(v)
    inputs = sorted(
        glob.glob(f"{REF}/{suite}/*.json") + glob.glob(f"{REF}/{suite}/*.json.gz")
    )
    if not inputs:
        return "NO_INPUT"
    cfg = TilingConfig(**kw)
    dfs = []
    for p in inputs:
        base = os.path.basename(p)
        layer = base[:-8] if base.endswith(".json.gz") else base[:-5]
        if extras["layer"]:
            layer = extras["layer"]
        if extras["layer_json"] and extras["layer_json"].get("layer"):
            layer = extras["layer_json"]["layer"]
        dfs.append(read_geojson(spark, p, layer=layer, cfg=cfg))
    featdf = dfs[0]
    for d in dfs[1:]:
        featdf = featdf.unionByName(d)
    if extras["filter"] is not None:
        from tippecanoe_spark.filters import compile_layer_filters

        featdf = featdf.filter(
            compile_layer_filters(extras["filter"], zoom=None)
        )
    if cfg.maxzoom < 0 or cfg.basezoom == -2 or cfg.droprate < 0:
        cfg = resolve_plan(featdf, cfg)
    feat_rows = [
        r.asDict() for r in featdf.select("layer", "geom_type", "attrs").collect()
    ]
    stamped = stamp_minzoom(featdf, cfg)
    rows = [
        r.asDict() for r in tilemod.tiles_fused(stamped, cfg).collect()
    ]
    fb, fb1, fb2 = raw_file_bboxes(*geojson_world_vertices(inputs))
    if cfg.clip_bounding_box is not None:
        # with --clip-bounding-box the reference RECOMPUTES sf.bbox from
        # the clipped scaled geometry (serial.cpp:479-500), so the plain
        # bounds shrink to the clip; the antimeridian bboxes stay raw
        # (accumulated before the clip, serial.cpp:425)
        from pyspark.sql import functions as F

        agg = featdf.agg(
            F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy")
        ).collect()[0]
        fb = (agg[0], agg[1], agg[2], agg[3])
    name = f"tests/{suite}/out/{stem}.json.check.mbtiles"
    cmdline = format_commandline(
        ["./tippecanoe", "-q", "-a@", "-f", "-o", name]
        + flags
        + [p.replace("/root/reference/", "") for p in inputs]
    )
    descs = None
    if extras["layer_json"] and extras["layer_json"].get("description"):
        lay = extras["layer_json"].get("layer")
        if lay:
            descs = {lay: extras["layer_json"]["description"]}
    meta = make_metadata_ref(
        name, rows, cfg.minzoom, cfg.maxzoom, fb, fb1, fb2,
        generator="x", generator_options=cmdline, features_rows=feat_rows,
        layer_descriptions=descs,
        basezoom=cfg.basezoom if cfg.basezoom >= 0 else cfg.maxzoom,
        droprate=cfg.droprate,
        retain_points_multiplier=cfg.retain_points_multiplier,
        with_tilestats=not extras["no_tilestats"],
        attribute_descriptions=extras["attr_desc"] or None,
        strategies=tilemod.rate_drop_strategies(stamped, cfg),
    )
    got = tileset_to_text(rows, meta, exclude_meta=("generator",))
    with open(gold_path) as fh:
        want = fh.read()
    if got == want:
        return "BYTE_OK"
    for i, (a, b) in enumerate(zip(got, want)):
        if a != b:
            if verbose:
                print("  G:", repr(got[max(0, i - 120):i + 120]))
                print("  W:", repr(want[max(0, i - 120):i + 120]))
            return f"DIFF@{i}/{len(got)}v{len(want)}"
    return f"DIFF@len:{len(got)}v{len(want)}"


def main():
    from tippecanoe_spark.session import get_spark

    patterns = sys.argv[1:]
    golds = sorted(glob.glob(f"{REF}/*/out/*.json"))
    if patterns:
        golds = [g for g in golds if any(p in g for p in patterns)]
    spark = get_spark(master="local[8]", shuffle_partitions=8, app="sweep")
    spark.sparkContext.setLogLevel("ERROR")
    counts: dict[str, int] = {}
    for g in golds:
        rel = g.split("/tests/")[1]
        try:
            res = run_one(spark, g, verbose=bool(patterns))
        except Unsupported as e:
            res = f"UNSUPPORTED({e})"
        except Exception as e:
            res = f"ERROR({type(e).__name__}: {e})"
            if patterns:
                traceback.print_exc()
        key = res.split("(")[0].split("@")[0]
        counts[key] = counts.get(key, 0) + 1
        print(f"{res:50s} {rel}", flush=True)
    print("SUMMARY:", counts)
    spark.stop()


if __name__ == "__main__":
    main()
