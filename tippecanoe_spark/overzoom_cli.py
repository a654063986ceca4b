"""tippecanoe-overzoom equivalent (overzoom.cpp CLI over the overzoom
operator).

Forms (mirroring the reference):
  python -m tippecanoe_spark.overzoom_cli -o out.pbf in.pbf OZ/OX/OY NZ/NX/NY
  python -m tippecanoe_spark.overzoom_cli -o out.pbf -t NZ/NX/NY \\
      in1.pbf OZ/OX/OY [in2.pbf OZ/OX/OY ...]

Each parent contributes its derivation of the target tile; multiple
results merge layer-by-layer (the reference's merged-dedup pbf test
flow, Makefile:430-443)."""

from __future__ import annotations

import argparse
import sys


def _zxy(s: str) -> tuple[int, int, int]:
    z, x, y = (int(v) for v in s.split("/"))
    return z, x, y


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tippecanoe-spark-overzoom")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-t", "--tile", default=None, metavar="Z/X/Y")
    ap.add_argument("-b", "--buffer", type=int, default=5)
    ap.add_argument("-d", "--full-detail", type=int, default=12)
    ap.add_argument("--deduplicate-by-id", action="store_true")
    ap.add_argument("-s", "--simplification", type=float, default=0.0)
    ap.add_argument("args", nargs="+")
    args = ap.parse_args(argv)

    from .join import merge_tile_blobs
    from .overzoom import overzoom_tile

    extent = 1 << args.full_detail
    buffer_px = (extent * args.buffer) >> 8

    if args.tile is not None:
        if len(args.args) % 2:
            print("expects pairs of: file z/x/y", file=sys.stderr)
            return 1
        nz, nx, ny = _zxy(args.tile)
        pairs = [
            (args.args[i], _zxy(args.args[i + 1]))
            for i in range(0, len(args.args), 2)
        ]
    else:
        if len(args.args) != 3:
            print("expects: file OZ/OX/OY NZ/NX/NY (or use -t)", file=sys.stderr)
            return 1
        nz, nx, ny = _zxy(args.args[2])
        pairs = [(args.args[0], _zxy(args.args[1]))]

    children = []
    for path, (oz, ox, oy) in pairs:
        with open(path, "rb") as fh:
            parent = fh.read()
        child = overzoom_tile(
            parent, oz, ox, oy, nz, nx, ny,
            buffer_px=buffer_px, extent=extent,
            simplification=args.simplification,
            deduplicate_by_id=args.deduplicate_by_id,
        )
        if child is not None:
            children.append(child)
    if not children:
        return 0
    blob = children[0] if len(children) == 1 else merge_tile_blobs(children, extent)
    with open(args.output, "wb") as fh:
        fh.write(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
