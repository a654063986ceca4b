"""Shared-border detection and joint simplification (-ab, T23).

Reference semantics: shared_borders.cpp:86-575 (find_common_edges) and
its call site tile.cpp:2463 — after the drop loop settles, the tile's
surviving polygons are decomposed into TopoJSON-style arcs so that an
edge shared by two rings is simplified ONCE and both polygons get the
identical simplified border (no slivers between adjacent polygons).

The algorithm:

1. every polygon edge (normalized endpoint order) is mapped to the
   ordered list of rings it appears in (ring ids are global across the
   tile's polygons);
2. a vertex is "necessary" when the ring-set of its incoming edge
   differs from the ring-set of its outgoing edge — the points where
   border topology changes (shared_borders.cpp:140-217).  Necessary
   points propagate across features by coordinate equality;
3. each ring is rotated to start at its LAST necessary vertex (or its
   lowest (y, x) vertex if none) and peeled into arcs from one
   necessary vertex to the next; arcs are deduplicated globally, a
   reversed match yielding a negated arc id (shared_borders.cpp:225-339);
4. each unique arc is simplified once (Douglas-Peucker with endpoints
   and tile-boundary crossings pinned, shared_borders.cpp:341-364);
5. polygons are reassembled from the simplified arcs
   (shared_borders.cpp:528-568).

The reference's merge machinery (shared_borders.cpp:366-526) is dead
code — tile.cpp:1666 fixes merge_fraction at 1, so merge_count is
always 0 — and is not reproduced here.

This runs per tile inside the finalize kernel: tile-local work on the
surviving features only, embarrassingly parallel across tiles, no
cross-tile state — the 100 TB shape is unchanged.
"""

from __future__ import annotations

import numpy as np

from . import simplify as simpmod

# offset to make packed (x, y) keys non-negative: tile-local px coords
# are bounded by the buffered extent (|v| < 2^31 with room to spare)
_OFF = np.int64(1) << np.int64(31)


def _pack_pts(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return ((x + _OFF) << np.int64(33)) | (y + _OFF)


def _dedupe_ring(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop consecutive duplicate vertices including the wraparound pair
    (find_common_edges' opening cleanup, shared_borders.cpp:89-106, where
    the duplicated ring endpoint makes the closing edge explicit)."""
    if len(x) <= 1:
        return x, y
    keep = np.empty(len(x), dtype=bool)
    keep[0] = True
    keep[1:] = (np.diff(x) != 0) | (np.diff(y) != 0)
    x, y = x[keep], y[keep]
    if len(x) > 1 and x[-1] == x[0] and y[-1] == y[0]:
        x, y = x[:-1], y[:-1]
    return x, y


# ---------------------------------------------------------------------------
# reference-faithful arc simplification (full-resolution tile coords)
#
# The -ab golden (-z1 --detect-shared-borders) is vertex-exact, so the
# arc step must reproduce the reference bit for bit: Cohen–Sutherland
# boundary insertion with truncating integer division (clip.cpp:169-225),
# segment distance with integer downshifts rounded to 1/16
# (clip.cpp:distance_from_line), and the OSRM-style stack DP with
# kept=2/retain=4 and winding-dependent scan order (clip.cpp:909-1005).
# ---------------------------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    """C++ integer division: truncation toward zero."""
    q = a // b
    if q < 0 and q * b != a:
        q += 1
    return q


def _clip_cs(x0, y0, x1, y1, xmin, ymin, xmax, ymax):
    """Cohen–Sutherland segment clip, faithful to clip() at
    clip.cpp:169-225 (truncating integer intersection division).
    Returns (code, x0, y0, x1, y1): code 0 = rejected, 1 = unchanged,
    2 = clipped."""

    def out_code(x, y):
        c = 0
        if x < xmin:
            c |= 1
        elif x > xmax:
            c |= 2
        if y < ymin:
            c |= 4
        elif y > ymax:
            c |= 8
        return c

    c0 = out_code(x0, y0)
    c1 = out_code(x1, y1)
    changed = 0
    while True:
        if not (c0 | c1):
            return changed + 1, x0, y0, x1, y1
        if c0 & c1:
            return 0, x0, y0, x1, y1
        c = c0 if c0 else c1
        if c & 8:  # TOP
            x = x0 + _tdiv((x1 - x0) * (ymax - y0), (y1 - y0))
            y = ymax
        elif c & 4:  # BOTTOM
            x = x0 + _tdiv((x1 - x0) * (ymin - y0), (y1 - y0))
            y = ymin
        elif c & 2:  # RIGHT
            y = y0 + _tdiv((y1 - y0) * (xmax - x0), (x1 - x0))
            x = xmax
        else:  # LEFT
            y = y0 + _tdiv((y1 - y0) * (xmin - x0), (x1 - x0))
            x = xmin
        if c == c0:
            x0, y0 = x, y
            c0 = out_code(x0, y0)
        else:
            x1, y1 = x, y
            c1 = out_code(x1, y1)
        changed = 1


def _impose_bounds_ref(
    x: np.ndarray, y: np.ndarray, nec: np.ndarray, extent: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """impose_tile_boundaries (geometry.cpp:188-217): insert a necessary
    vertex at each tile-boundary crossing, with the reference's exact
    integer intersection arithmetic and endpoint-coincidence guards."""
    n = len(x)
    if n < 2 or not (
        (x < 0).any() or (x > extent).any() or (y < 0).any() or (y > extent).any()
    ):
        return x, y, nec
    ox: list[int] = [int(x[0])]
    oy: list[int] = [int(y[0])]
    on: list[bool] = [bool(nec[0])]
    for i in range(1, n):
        x1, y1 = int(x[i - 1]), int(y[i - 1])
        x2, y2 = int(x[i]), int(y[i])
        c, cx1, cy1, cx2, cy2 = _clip_cs(x1, y1, x2, y2, 0, 0, extent, extent)
        if c > 1:
            if cx1 != x1 or cy1 != y1:
                ox.append(cx1)
                oy.append(cy1)
                on.append(True)
            if cx2 != x2 or cy2 != y2:
                ox.append(cx2)
                oy.append(cy2)
                on.append(True)
        ox.append(x2)
        oy.append(y2)
        on.append(bool(nec[i]))
    return (
        np.array(ox, dtype=np.int64),
        np.array(oy, dtype=np.int64),
        np.array(on, dtype=bool),
    )


def _dist_ref(px: int, py: int, ax: int, ay: int, bx: int, by: int) -> float:
    """distance_from_line (clip.cpp): segment distance with integer
    downshifts (truncating) and the result rounded to 1/16."""
    p2x = bx - ax
    p2y = by - ay
    something = (_tdiv(p2x, 4) * _tdiv(p2x, 8) + _tdiv(p2y, 4) * _tdiv(p2y, 8)) * 32.0
    if something == 0:
        u = 0.0
    else:
        u = (
            _tdiv(px - ax, 4) * _tdiv(p2x, 8) + _tdiv(py - ay, 4) * _tdiv(p2y, 8)
        ) * 32.0 / something
    if u >= 1:
        u = 1.0
    elif u <= 0:
        u = 0.0
    dx = (ax + u * p2x) - px
    dy = (ay + u * p2y) - py
    import math

    # std::round on a non-negative value == floor(v + 0.5)
    return math.floor(math.sqrt(dx * dx + dy * dy) * 16.0 + 0.5) / 16.0


def _lt(x: np.ndarray, y: np.ndarray, i: int, j: int) -> bool:
    """draw::operator< — (y, x) lexicographic (geometry.hpp:46-52)."""
    return y[i] < y[j] or (y[i] == y[j] and x[i] < x[j])


def _dp_ref(
    x: np.ndarray, y: np.ndarray, nec: np.ndarray, e: float,
    kept: int = 2, retain: int = 4,
) -> None:
    """douglas_peucker (clip.cpp:909-1005), marking ``nec`` in place.
    Faithful details that decide vertex-exact parity: the shared
    kept/retain counters admit sub-tolerance points until ``retain``
    vertices are kept; the scan direction and tie-breaks depend on the
    (y, x) order of the span endpoints; interior pre-necessary points
    split the initial stack without incrementing ``kept``."""
    n = len(x)
    stack: list[int] = []
    prev = 0
    for here in range(1, n):
        if nec[here]:
            stack.append(prev)
            stack.append(here)
            prev = here
    while stack:
        second = stack.pop()
        first = stack.pop()
        max_distance = -1.0
        if _lt(x, y, first, second):
            far = first
            ax, ay, bx, by = int(x[first]), int(y[first]), int(x[second]), int(y[second])
            for i in range(first + 1, second):
                d = _dist_ref(int(x[i]), int(y[i]), ax, ay, bx, by)
                if (d > e or kept < retain) and (
                    d > max_distance or (d == max_distance and _lt(x, y, i, far))
                ):
                    far = i
                    max_distance = d
        else:
            far = second
            ax, ay, bx, by = int(x[second]), int(y[second]), int(x[first]), int(y[first])
            for i in range(second - 1, first, -1):
                d = _dist_ref(int(x[i]), int(y[i]), ax, ay, bx, by)
                if (d > e or kept < retain) and (
                    d > max_distance or (d == max_distance and _lt(x, y, i, far))
                ):
                    far = i
                    max_distance = d
        if max_distance >= 0:
            nec[far] = True
            kept += 1
            if _lt(x, y, first, second):
                if 1 < far - first:
                    stack.append(first)
                    stack.append(far)
                if 1 < second - far:
                    stack.append(far)
                    stack.append(second)
            else:
                if 1 < second - far:
                    stack.append(far)
                    stack.append(second)
                if 1 < far - first:
                    stack.append(first)
                    stack.append(far)


def _simplify_arc_ref(
    px: np.ndarray, py: np.ndarray, z: int, detail: int,
    simplification: float, mark_bounds: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """simplify_lines for one arc (geometry.cpp:219-313 as called from
    shared_borders.cpp:360 with tx=ty=0, retain=4): endpoints necessary,
    tile-boundary crossings inserted at area 1<<(32-z), one DP pass at
    res*simplification with kept=2/retain=4."""
    n = len(px)
    nec = np.zeros(n, dtype=bool)
    nec[0] = nec[-1] = True
    if mark_bounds:
        px, py, nec = _impose_bounds_ref(px, py, nec, 1 << (32 - z))
    if len(px) > 2:
        res = 1 << (32 - detail - z)
        _dp_ref(px, py, nec, res * simplification)
    return px[nec], py[nec]


def find_common_edges(
    feature_rings: list[list[tuple[np.ndarray, np.ndarray]]],
    simplify_tol: float = 0.0,
    extent: int = 0,
    use_visvalingam: bool = False,
    z: int | None = None,
    detail: int | None = None,
    mark_bounds: bool = True,
) -> list[list[tuple[np.ndarray, np.ndarray]]]:
    """Jointly simplify the shared borders of a tile's polygons.

    ``feature_rings``: one entry per polygon feature — a list of
    (x, y) int64 ring arrays with the first vertex NOT repeated at the
    end.  Returns the same structure with every arc simplified once and
    spliced back; with ``simplify_tol <= 0`` geometry is rebuilt from
    unsimplified arcs (identical point sets, canonical ring rotation).

    Two arc-simplification modes:

    * ``z is not None``: reference-faithful mode — rings are FULL-RES
      tile-relative coords (0..2^(32-z) + buffer); each arc goes
      through ``_simplify_arc_ref`` exactly as shared_borders.cpp:360
      does (boundary insertion at 1<<(32-z), DP at res*simplification
      with retain=4).  ``simplify_tol`` is the -S multiplier.
    * ``z is None``: generic px-space mode (tolerance ``simplify_tol``
      px, boundary pinning at ``extent``) — used by the driver-gate
      kernel query and unit tests.
    """
    rings: list[tuple[np.ndarray, np.ndarray]] = []
    owner: list[tuple[int, int]] = []  # (feature, ring-slot)
    for fi, fr in enumerate(feature_rings):
        for ri, (rx, ry) in enumerate(fr):
            rx = np.asarray(rx, dtype=np.int64)
            ry = np.asarray(ry, dtype=np.int64)
            rx, ry = _dedupe_ring(rx, ry)
            if len(rx) >= 3:
                rings.append((rx, ry))
                owner.append((fi, ri))
    if not rings:
        return [[] for _ in feature_rings]

    # ---- 1. global edge table (ring id per edge, normalized order) ----
    sizes = np.array([len(r[0]) for r in rings], dtype=np.int64)
    ring_of = np.repeat(np.arange(len(rings), dtype=np.int64), sizes)
    ax = np.concatenate([r[0] for r in rings])
    ay = np.concatenate([r[1] for r in rings])
    bx = np.concatenate([np.roll(r[0], -1) for r in rings])
    by = np.concatenate([np.roll(r[1], -1) for r in rings])
    # normalize with the reference's draw< order: (y, x) lexicographic
    swap = (by < ay) | ((by == ay) & (bx < ax))
    e1x = np.where(swap, bx, ax)
    e1y = np.where(swap, by, ay)
    e2x = np.where(swap, ax, bx)
    e2y = np.where(swap, ay, by)

    # group identical edges; within a group rings appear in ascending
    # ring order (edgecmp_ring, shared_borders.cpp:50-67)
    order = np.lexsort((ring_of, e2x, e2y, e1x, e1y))
    s1x, s1y = e1x[order], e1y[order]
    s2x, s2y = e2x[order], e2y[order]
    srings = ring_of[order]
    new_grp = np.empty(len(order), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (
        (np.diff(s1x) != 0)
        | (np.diff(s1y) != 0)
        | (np.diff(s2x) != 0)
        | (np.diff(s2y) != 0)
    )
    grp_start = np.flatnonzero(new_grp)
    grp_id_sorted = np.cumsum(new_grp) - 1
    # signature id per unique edge: the exact ring id sequence
    sig_of_grp = np.empty(len(grp_start), dtype=np.int64)
    sig_ids: dict[bytes, int] = {}
    bounds = np.append(grp_start, len(order))
    for g in range(len(grp_start)):
        key = srings[bounds[g]: bounds[g + 1]].tobytes()
        sig_of_grp[g] = sig_ids.setdefault(key, len(sig_ids))
    edge_sig = np.empty(len(order), dtype=np.int64)
    edge_sig[order] = sig_of_grp[grp_id_sorted]

    # ---- 2. necessary vertices (topology-change points) ----
    starts = np.zeros(len(rings), dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    nec_pts: set[int] = set()
    nec_per_ring: list[np.ndarray] = []
    for r, (rx, ry) in enumerate(rings):
        s = int(sizes[r])
        o = int(starts[r])
        right = edge_sig[o: o + s]          # edge (v_i, v_{i+1})
        left = np.roll(right, 1)             # edge (v_{i-1}, v_i)
        nec = left != right
        nec_per_ring.append(nec)
        if nec.any():
            nec_pts.update(_pack_pts(rx[nec], ry[nec]).tolist())

    # propagate necessity across rings by coordinate
    # (shared_borders.cpp:230-234)
    if nec_pts:
        keys = np.fromiter(nec_pts, dtype=np.int64, count=len(nec_pts))
        keys.sort()
        for r, (rx, ry) in enumerate(rings):
            hit = (
                np.searchsorted(keys, _pack_pts(rx, ry), side="right")
                - np.searchsorted(keys, _pack_pts(rx, ry), side="left")
            ) > 0
            nec_per_ring[r] |= hit

    # ---- 3. rotate + peel into globally deduplicated arcs ----
    arcs: dict[bytes, int] = {}
    arc_pts: list[tuple[np.ndarray, np.ndarray]] = [(np.empty(0), np.empty(0))]
    ring_arcs: list[list[int]] = []
    for r, (rx, ry) in enumerate(rings):
        nec = nec_per_ring[r]
        s = len(rx)
        if nec.any():
            # the reference scans LINETO positions 1..s (s = duplicated
            # endpoint == vertex 0) and keeps the LAST necessary
            # (shared_borders.cpp:236-259)
            rot = 0 if nec[0] else int(np.flatnonzero(nec).max())
        else:
            # lowest (y, x) vertex, earliest on ties
            rot = int(np.lexsort((rx, ry))[0])
            nec = nec.copy()
            nec[rot] = True
        if rot:
            rx = np.roll(rx, -rot)
            ry = np.roll(ry, -rot)
            nec = np.roll(nec, -rot)
        # closed walk: duplicate the start at the end
        wx = np.append(rx, rx[0])
        wy = np.append(ry, ry[0])
        wn = np.append(nec, True)
        cuts = np.flatnonzero(wn)  # cuts[0] == 0
        ids: list[int] = []
        for a, b in zip(cuts[:-1], cuts[1:]):
            px, py = wx[a: b + 1], wy[a: b + 1]
            key = np.stack((px, py)).tobytes()
            aid = arcs.get(key)
            if aid is None:
                rkey = np.stack((px[::-1], py[::-1])).tobytes()
                aid = arcs.get(rkey)
                if aid is None:
                    aid = len(arc_pts)
                    arcs[key] = aid
                    arc_pts.append((px, py))
                else:
                    aid = -aid
            ids.append(aid)
        ring_arcs.append(ids)

    # ---- 4. simplify each unique arc once ----
    if simplify_tol > 0:
        for i in range(1, len(arc_pts)):
            px, py = arc_pts[i]
            if z is not None:
                arc_pts[i] = _simplify_arc_ref(
                    px, py, z, detail, simplify_tol, mark_bounds
                )
                continue
            if len(px) <= 2:
                continue
            if extent > 0:
                px, py, kreq = simpmod.impose_tile_boundaries(px, py, extent)
                if not kreq.any():
                    kreq = None
            else:
                kreq = None
            if use_visvalingam:
                m = simpmod.visvalingam(px, py, simplify_tol * simplify_tol, keep=kreq)
            else:
                m = simpmod.douglas_peucker(px, py, simplify_tol, keep=kreq)
            arc_pts[i] = (px[m], py[m])

    # ---- 5. reassemble features from arcs ----
    out: list[list[tuple[np.ndarray, np.ndarray]]] = [
        [] for _ in feature_rings
    ]
    for r, ids in enumerate(ring_arcs):
        xs: list[np.ndarray] = []
        ys: list[np.ndarray] = []
        for aid in ids:
            px, py = arc_pts[abs(aid)]
            if aid > 0:
                xs.append(px[:-1])
                ys.append(py[:-1])
            else:
                xs.append(px[:0:-1])
                ys.append(py[:0:-1])
        nx = np.concatenate(xs) if xs else np.empty(0, dtype=np.int64)
        ny = np.concatenate(ys) if ys else np.empty(0, dtype=np.int64)
        nx, ny = _dedupe_ring(nx, ny)
        if len(nx) >= 3:
            out[owner[r][0]].append((nx, ny))
    return out

