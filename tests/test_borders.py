"""-ab shared-border detection (T23, shared_borders.cpp:86-575): adjacent
polygons must keep bit-identical borders after simplification."""

from __future__ import annotations

import numpy as np

from tippecanoe_spark import mvt
from tippecanoe_spark.config import TilingConfig
from tippecanoe_spark.features import pack_cmds
from tippecanoe_spark.geom import borders
from tippecanoe_spark.geom import simplify as simpmod


def ring(*pts):
    return (
        np.array([p[0] for p in pts], dtype=np.int64),
        np.array([p[1] for p in pts], dtype=np.int64),
    )


def vertex_set(rings):
    pts = set()
    for rx, ry in rings:
        pts.update(zip(rx.tolist(), ry.tolist()))
    return pts


def edge_set(rings):
    out = set()
    for rx, ry in rings:
        n = len(rx)
        for i in range(n):
            a = (int(rx[i]), int(ry[i]))
            b = (int(rx[(i + 1) % n]), int(ry[(i + 1) % n]))
            out.add((a, b) if a <= b else (b, a))
    return out


ZIG = [(11, 5), (9, 10), (11, 15)]
# two squares whose shared border zigzags around x=10
A = ring((0, 0), (10, 0), *ZIG, (10, 20), (0, 20))
B = ring((10, 0), (20, 0), (20, 20), (10, 20), *reversed(ZIG))


class TestFindCommonEdges:
    def test_shared_border_simplified_identically(self):
        out = borders.find_common_edges(
            [[A], [B]], simplify_tol=5.0, extent=4096
        )
        ea, eb = edge_set(out[0]), edge_set(out[1])
        # the zigzag collapsed to ONE straight edge present in BOTH
        assert (((10, 0), (10, 20))) in (ea & eb)
        assert not (set(ZIG) & (vertex_set(out[0]) | vertex_set(out[1])))
        # outer corners survive
        assert {(0, 0), (0, 20)} <= vertex_set(out[0])
        assert {(20, 0), (20, 20)} <= vertex_set(out[1])

    def test_per_feature_dp_would_diverge(self):
        """The motivating failure: independent DP anchors differently on
        the two rings, so without -ab the borders need not match."""
        out = borders.find_common_edges(
            [[A], [B]], simplify_tol=5.0, extent=4096
        )
        # joint result: shared edges of the two outputs are mirror-equal
        shared = edge_set(out[0]) & edge_set(out[1])
        assert shared  # never empty for adjacent polygons

    def test_rebuild_without_simplify_preserves_vertices(self):
        out = borders.find_common_edges([[A], [B]], simplify_tol=0.0)
        for orig, new in ((A, out[0][0]), (B, out[1][0])):
            assert sorted(zip(orig[0].tolist(), orig[1].tolist())) == sorted(
                zip(new[0].tolist(), new[1].tolist())
            )

    def test_junction_vertex_pinned(self):
        """A vertex where border topology changes (a T-junction collinear
        on one side) is 'necessary' and survives simplification that
        plain per-feature DP would remove it under."""
        D = ring((0, 0), (10, 0), (10, 10), (10, 20), (0, 20))
        B1 = ring((10, 0), (20, 0), (20, 10), (10, 10))
        B2 = ring((10, 10), (20, 10), (20, 20), (10, 20))
        # sanity: per-feature DP at tol=2 drops the collinear (10,10)
        m = simpmod.douglas_peucker(D[0], D[1], 2.0)
        kept = set(zip(D[0][m].tolist(), D[1][m].tolist()))
        assert (10, 10) not in kept
        out = borders.find_common_edges(
            [[D], [B1], [B2]], simplify_tol=2.0, extent=4096
        )
        for f in out:
            assert (10, 10) in vertex_set(f)

    def test_hole_ring_and_unshared_polygon_pass_through(self):
        outer = ring((0, 0), (100, 0), (100, 100), (0, 100))
        hole = ring((40, 40), (40, 60), (60, 60), (60, 40))
        lone = ring((200, 200), (300, 200), (250, 300))
        out = borders.find_common_edges(
            [[outer, hole], [lone]], simplify_tol=3.0, extent=4096
        )
        assert len(out[0]) == 2 and len(out[1]) == 1
        assert vertex_set([out[1][0]]) == vertex_set([lone])


class TestFinalizeAb:
    # prepared -ab polygon geometry is FULL-RES tile-relative (the arc
    # step quantizes in finalize, matching to_tile_scale's position in
    # the reference pipeline) — z=4, detail=12 → px = coord >> 16
    _UP = 16

    def _pdf(self):
        import pandas as pd

        def poly_cmds(r):
            rx, ry = r
            rx = rx << self._UP
            ry = ry << self._UP
            cmds = [(mvt.OP_MOVETO, int(rx[0]), int(ry[0]))]
            cmds += [
                (mvt.OP_LINETO, int(a), int(b))
                for a, b in zip(rx[1:], ry[1:])
            ]
            cmds.append((mvt.OP_CLOSEPATH, 0, 0))
            return cmds

        rows = []
        for i, r in enumerate((A, B)):
            rows.append(
                {
                    "tx": 0, "ty": 0, "feature_id": i + 1, "layer": "l",
                    "geom_type": 3, "geometry": pack_cmds(poly_cmds(r)),
                    "attrs": {}, "index": i, "extent": 100,
                    "seq": i, "feature_minzoom": 0,
                }
            )
        return pd.DataFrame(rows)

    def test_encoded_tile_shares_border(self):
        from tippecanoe_spark.tile import _finalize_tile_dict

        cfg = TilingConfig(
            maxzoom=8, simplification=5.0,
            detect_shared_borders=True, compress_tiles=False,
        )
        out = _finalize_tile_dict(self._pdf(), 4, cfg)
        feats = mvt.decode_tile(bytes(out["tile"]))[0]["features"]
        assert len(feats) == 2
        rings_by_fid = {}
        for f in feats:
            rings = []
            cur = None
            for op, x, y in f["cmds"]:
                if op == mvt.OP_MOVETO:
                    cur = [(x, y)]
                elif op == mvt.OP_LINETO:
                    cur.append((x, y))
                else:
                    rings.append(ring(*cur))
            rings_by_fid[f["id"]] = rings
        e1 = edge_set(rings_by_fid[1])
        e2 = edge_set(rings_by_fid[2])
        # reference DP retain=4 keeps two sub-tolerance zig points on the
        # shared arc (clip.cpp:956 `kept < retain`), but BOTH polygons
        # carry the IDENTICAL simplified arc — the -ab contract
        shared_arc = {
            ((10, 0), (11, 5)),
            ((9, 10), (11, 5)),
            ((9, 10), (10, 20)),
        }
        assert shared_arc <= (e1 & e2)
        # the third zig vertex is beyond retain and under tolerance: gone
        assert (11, 15) not in (vertex_set(rings_by_fid[1]) | vertex_set(rings_by_fid[2]))
        # outer corners survive
        assert {(0, 0), (0, 20)} <= vertex_set(rings_by_fid[1])
        assert {(20, 0), (20, 20)} <= vertex_set(rings_by_fid[2])
