"""tippecanoe-enumerate equivalent (enumerate.cpp): list a tileset's
tiles as `fname z x y` lines in (zoom, column, TMS-row) order with XYZ
y — byte-compatible with the reference's committed `enum` golden
(tests/ne_110m_admin_0_countries/out/enum)."""

from __future__ import annotations

import sys


def enumerate_lines(fname: str, rows) -> list[str]:
    ordered = sorted(
        rows, key=lambda r: (r["z"], r["x"], (1 << r["z"]) - 1 - r["y"])
    )
    return [f"{fname} {r['z']} {r['x']} {r['y']}" for r in ordered]


def main(argv: list[str] | None = None) -> int:
    from .tilejoin import _read_tileset

    for fname in (argv if argv is not None else sys.argv[1:]):
        for line in enumerate_lines(fname, _read_tileset(fname)):
            sys.stdout.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
