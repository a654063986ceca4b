"""tile-join CLI equivalent (tile-join.cpp option surface over the
tile_join / csv_join_tiles operators).

  python -m tippecanoe_spark.tilejoin -o out.mbtiles in1.mbtiles in2.pmtiles dir3/
with -c CSV join (-x key exclusion, -i matched-only,
--empty-csv-columns-are-null), -l/-L keep/remove layers, -R old:new
rename, -Z/-z zoom clamp, --overzoom, -e directory output.

Inputs and outputs are driver-side (the reference is a single-process
tool); the merge itself runs through the Spark tile_join operator so the
CLI exercises the same code the cluster path uses."""

from __future__ import annotations

import argparse
import os
import sys


def _read_tileset(path: str) -> list[dict]:
    from . import sinks

    if os.path.isdir(path):
        rows = []
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if not fn.endswith(".pbf"):
                    continue
                rel = os.path.relpath(os.path.join(root, fn), path)
                parts = rel.split(os.sep)
                if len(parts) != 3:
                    continue
                with open(os.path.join(root, fn), "rb") as fh:
                    rows.append(
                        {
                            "z": int(parts[0]), "x": int(parts[1]),
                            "y": int(parts[2].split(".")[0]), "tile": fh.read(),
                        }
                    )
        return rows
    if path.endswith(".pmtiles"):
        _meta, tiles = sinks.read_pmtiles(path)
        out = []
        for t in tiles:
            z, x, y = sinks.pmtiles_id_to_zxy(t["tile_id"])
            out.append({"z": z, "x": x, "y": y, "tile": t["tile"]})
        return out
    return sinks.read_mbtiles(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tippecanoe-spark-tile-join")
    ap.add_argument("-o", "--output")
    ap.add_argument("-e", "--output-to-directory")
    ap.add_argument("-f", "--force", action="store_true")
    ap.add_argument("-c", "--csv")
    ap.add_argument("-x", "--exclude", action="append", default=[])
    ap.add_argument("-i", "--if-matched", action="store_true")
    ap.add_argument(
        "-pe", "--empty-csv-columns-are-null", action="store_true", dest="pe"
    )
    ap.add_argument("-l", "--layer", action="append", default=[])
    ap.add_argument("-L", "--exclude-layer", action="append", default=[])
    ap.add_argument("-R", "--rename-layer", action="append", default=[])
    ap.add_argument("-Z", "--minimum-zoom", type=int, default=None)
    ap.add_argument("-z", "--maximum-zoom", type=int, default=None)
    ap.add_argument("--overzoom", type=int, default=None, metavar="MAXZOOM")
    ap.add_argument("-n", "--name")
    ap.add_argument("-N", "--description")
    ap.add_argument("-A", "--attribution")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)

    out = args.output or args.output_to_directory
    if not out:
        print("must specify -o or -e", file=sys.stderr)
        return 1
    if os.path.exists(out) and not args.force:
        print(f"{out}: file exists (use -f to overwrite)", file=sys.stderr)
        return 1

    from .join import csv_join_tiles, tile_join
    from .session import get_spark

    spark = get_spark(master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    srcs = []
    for p in args.inputs:
        rows = _read_tileset(p)
        srcs.append(
            spark.createDataFrame(
                [(r["z"], r["x"], r["y"], bytearray(r["tile"])) for r in rows],
                "z int, x int, y int, tile binary",
            )
        )
    renames = dict(s.split(":", 1) for s in args.rename_layer)
    joined = tile_join(
        srcs,
        keep_layers=tuple(args.layer),
        remove_layers=tuple(args.exclude_layer),
        rename_layers=renames or None,
        minzoom=args.minimum_zoom,
        maxzoom=args.maximum_zoom,
        overzoom_to=args.overzoom,
    )
    if args.csv:
        joined = csv_join_tiles(
            joined, args.csv, exclude=tuple(args.exclude),
            if_matched=args.if_matched, empty_null=args.pe,
        )
    rows = [r.asDict() for r in joined.collect()]

    from . import sinks

    zs = [r["z"] for r in rows] or [0]
    meta = {
        "name": args.name or out,
        "description": args.description or args.name or out,
        "format": "pbf",
        "type": "overlay",
        "version": "2",
        "minzoom": str(min(zs)),
        "maxzoom": str(max(zs)),
    }
    if args.attribution:
        meta["attribution"] = args.attribution
    if args.output_to_directory:
        sinks.write_dirtiles(out, rows, meta)
    elif out.endswith(".pmtiles"):
        sinks.write_pmtiles(out, rows, meta, minzoom=min(zs), maxzoom=max(zs))
    else:
        sinks.write_mbtiles(out, rows, meta)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
