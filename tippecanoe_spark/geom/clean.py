"""Polygon cleaning and boolean operations (T5/T6).

Semantics match ``clean_or_clip_poly`` (reference: clip.cpp:260-388):
the input ring set — self-intersecting rings, bowties, overlapping or
wrongly-nested rings — is unioned under the POSITIVE fill rule (wagyu's
``fill_type_positive``): the output is the boundary of the region where
the winding number of the input is > 0, as properly-nested simple rings
(outers positive signed area, holes negative, matching get_area,
clip.cpp:642-689).  ``coalesce_polygon`` (tile.cpp:1905-1995) applies
this to every polygon after scaling/simplification; we do the same in
the tile kernel.

Implementation is NOT a wagyu port: it is a trapezoidal sweep over the
integer-snapped segment arrangement —

1. collect directed non-horizontal segments from all rings (winding
   weight +1 where y decreases, so accumulated weight left-to-right
   equals the winding number under the repo's screen-CW-positive
   shoelace convention);
2. event ys = endpoint ys plus all pairwise segment-crossing ys
   (vectorized O(n²) in blocks), so within a slab the active segments
   are totally ordered by x;
3. per slab, fill the gaps between consecutive active segments where
   the fill predicate holds (union: w>0; intersection: wa>0 ∧ wb>0;
   difference: wa>0 ∧ wb≤0), emitting directed slant edges and, per
   event y, the symmetric difference of adjacent slabs' filled
   intervals as horizontal edges;
4. stitch directed edges into rings (sharpest-turn selection at
   saddle vertices keeps rings simple), merge collinear runs that come
   from the same source segment, round to the integer grid.

Deviation from wagyu (documented): wagyu snap-rounds at 16× scale and
retries; we sweep in doubles (exact for the int endpoints) and round
once at the end.  Collapsed output (< 3 distinct vertices or zero area)
returns [] — the caller revives via revive_polygon (tile.cpp:551-590)
where applicable.
"""

from __future__ import annotations

import numpy as np

from ..features import signed_area

__all__ = [
    "clean_rings",
    "union_rings",
    "intersect_rings",
    "subtract_rings",
    "ring_self_intersects",
    "rings_need_cleaning",
    "clip_lines_to_rings",
    "point_winding",
]

Ring = tuple[np.ndarray, np.ndarray]


# ---------------------------------------------------------------------------
# segment soup
# ---------------------------------------------------------------------------

def _rings_to_segments(rings: list[Ring]):
    """Directed non-horizontal segments of a ring list →
    (x0, y0, x1, y1, w) float64/int8 arrays.  w = +1 where y decreases
    (left edge of a positive-area ring), -1 where y increases."""
    xs0, ys0, xs1, ys1 = [], [], [], []
    for rx, ry in rings:
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        if len(rx) < 3:
            continue
        nx = np.roll(rx, -1)
        ny = np.roll(ry, -1)
        keep = ry != ny  # horizontals carry no winding in a y-sweep
        xs0.append(rx[keep])
        ys0.append(ry[keep])
        xs1.append(nx[keep])
        ys1.append(ny[keep])
    if not xs0:
        z = np.empty(0, dtype=np.float64)
        return z, z, z, z, np.empty(0, dtype=np.int8)
    x0 = np.concatenate(xs0)
    y0 = np.concatenate(ys0)
    x1 = np.concatenate(xs1)
    y1 = np.concatenate(ys1)
    w = np.where(y1 < y0, 1, -1).astype(np.int8)
    return x0, y0, x1, y1, w


def _crossing_ys(x0, y0, x1, y1, block: int = 512) -> np.ndarray:
    """All ys where two segments properly cross (interior of both
    y-spans) — these become sweep events so slab x-order is total.
    Vectorized pairwise in blocks to bound memory."""
    n = len(x0)
    if n < 2:
        return np.empty(0, dtype=np.float64)
    ylo = np.minimum(y0, y1)
    yhi = np.maximum(y0, y1)
    dx = x1 - x0
    dy = y1 - y0
    out: list[np.ndarray] = []
    for a in range(0, n, block):
        b = min(a + block, n)
        # segment i in [a,b) vs all j > i
        for i in range(a, b):
            j0 = i + 1
            if j0 >= n:
                break
            # cross of supporting lines: solve p_i + t*d_i = p_j + u*d_j
            denom = dx[i] * dy[j0:] - dy[i] * dx[j0:]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (
                    (x0[j0:] - x0[i]) * dy[j0:] - (y0[j0:] - y0[i]) * dx[j0:]
                ) / denom
            yc = y0[i] + t * dy[i]
            ok = (
                (denom != 0)
                & (yc > np.maximum(ylo[i], ylo[j0:]))
                & (yc < np.minimum(yhi[i], yhi[j0:]))
            )
            if ok.any():
                out.append(yc[ok])
    if not out:
        return np.empty(0, dtype=np.float64)
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# the sweep
# ---------------------------------------------------------------------------

def _sweep_boolean(segs_a, segs_b, fill) -> list[Ring]:
    """Trapezoidal sweep over two segment sets.  ``fill(wa, wb)`` maps
    accumulated winding pairs to filled/not."""
    ax0, ay0, ax1, ay1, aw = segs_a
    bx0, by0, bx1, by1, bw = segs_b
    x0 = np.concatenate([ax0, bx0])
    y0 = np.concatenate([ay0, by0])
    x1 = np.concatenate([ax1, bx1])
    y1 = np.concatenate([ay1, by1])
    w = np.concatenate([aw, bw]).astype(np.int64)
    is_a = np.zeros(len(x0), dtype=bool)
    is_a[: len(ax0)] = True
    n = len(x0)
    if n == 0:
        return []
    ylo = np.minimum(y0, y1)
    yhi = np.maximum(y0, y1)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (x1 - x0) / (y1 - y0)

    events = np.unique(
        np.concatenate([y0, y1, _crossing_ys(x0, y0, x1, y1)])
    )
    if len(events) < 2:
        return []

    # directed boundary edges: (x_start, y_start, x_end, y_end, tag)
    # tag = source segment id for slant edges (collinear-run merge), -1
    # for horizontals
    edges: list[tuple[float, float, float, float, int]] = []
    prev_iv: list[tuple[float, float]] = []  # filled intervals at prev event y
    prev_y = events[0]

    def _xat(idx: np.ndarray, y: float) -> np.ndarray:
        return x0[idx] + (y - y0[idx]) * slope[idx]

    def _merge(iv: list[tuple[float, float]]) -> list[tuple[float, float]]:
        if len(iv) < 2:
            return iv
        out = [iv[0]]
        for lo, hi in iv[1:]:
            if lo <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], hi))
            else:
                out.append((lo, hi))
        return out

    def _emit_horizontals(y: float, below: list, above: list) -> None:
        """Symmetric difference of the filled x-intervals just below and
        just above y → horizontal boundary pieces.  Pieces where only
        the below-slab is filled face 'up' (-x direction, the A\\B end
        edge); pieces where only the above-slab is filled face 'down'
        (+x, the B\\A start edge) — the square orientation check in the
        module tests pins the signs."""
        pts = sorted(
            {v for lo, hi in below for v in (lo, hi)}
            | {v for lo, hi in above for v in (lo, hi)}
        )
        for lo, hi in zip(pts, pts[1:]):
            if hi <= lo:
                continue
            mid = (lo + hi) / 2.0
            in_b = any(l <= mid < h for l, h in below)
            in_a = any(l <= mid < h for l, h in above)
            if in_b and not in_a:
                edges.append((hi, y, lo, y, -1))
            elif in_a and not in_b:
                edges.append((lo, y, hi, y, -1))

    for k in range(len(events) - 1):
        sy0 = events[k]
        sy1 = events[k + 1]
        active = np.flatnonzero((ylo <= sy0) & (yhi >= sy1))
        if len(active) == 0:
            if prev_iv:
                _emit_horizontals(sy0, prev_iv, [])
                prev_iv = []
            prev_y = sy1
            continue
        ym = (sy0 + sy1) / 2.0
        xm = _xat(active, ym)
        order = np.argsort(xm, kind="mergesort")
        act = active[order]
        xs0 = _xat(act, sy0)
        xs1 = _xat(act, sy1)
        wa = np.where(is_a[act], w[act], 0)
        wb = np.where(is_a[act], 0, w[act])
        ca = np.cumsum(wa)
        cb = np.cumsum(wb)
        iv0: list[tuple[float, float]] = []
        iv1: list[tuple[float, float]] = []
        # merge consecutive filled gaps into MAXIMAL spans: a segment
        # between two filled gaps is interior — emitting its left+right
        # edges would cut a zero-width slit into the region
        i = 0
        n_act = len(act)
        while i < n_act - 1:
            if not fill(int(ca[i]), int(cb[i])):
                i += 1
                continue
            l = i
            while i < n_act - 1 and fill(int(ca[i]), int(cb[i])):
                i += 1
            r = i  # act[l] .. act[r] bound the maximal filled span
            xl0, xl1 = xs0[l], xs1[l]
            xr0, xr1 = xs0[r], xs1[r]
            if xl0 == xr0 and xl1 == xr1:
                continue  # zero-width sliver
            # left edge runs up (decreasing y), right edge runs down —
            # yields positive-shoelace outers under the repo convention
            edges.append((xl1, sy1, xl0, sy0, int(act[l])))
            edges.append((xr0, sy0, xr1, sy1, int(act[r])))
            iv0.append((min(xl0, xr0), max(xl0, xr0)))
            iv1.append((min(xl1, xr1), max(xl1, xr1)))
        iv0 = _merge(sorted(iv0))
        iv1 = _merge(sorted(iv1))
        _emit_horizontals(sy0, prev_iv, iv0)
        prev_iv = iv1
        prev_y = sy1
    if prev_iv:
        _emit_horizontals(prev_y, prev_iv, [])

    return _stitch(edges)


def _stitch(edges: list[tuple[float, float, float, float, int]]) -> list[Ring]:
    """Directed boundary edges → simple rings.  At saddle vertices (two
    or more outgoing edges) take the sharpest clockwise turn relative to
    the incoming direction, which keeps each ring simple instead of
    fusing touching regions into a figure-eight."""
    from collections import defaultdict

    # vertex keys snapped to 1/256: a crossing point's x computed from
    # the two crossing lines differs by ulps; exact float keys would
    # break the chain there and drop the whole ring
    def _key(x: float, y: float) -> tuple[int, int]:
        return (int(round(x * 256.0)), int(round(y * 256.0)))

    out_by_start: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, (sx, sy, _, _, _) in enumerate(edges):
        out_by_start[_key(sx, sy)].append(i)
    used = np.zeros(len(edges), dtype=bool)
    rings: list[Ring] = []

    def _turn_key(in_dx: float, in_dy: float, cand: int) -> float:
        sx, sy, ex, ey, _ = edges[cand]
        dx, dy = ex - sx, ey - sy
        # signed turn angle from incoming to candidate direction;
        # min = sharpest turn one way — keeps touching regions separate
        return float(np.arctan2(in_dx * dy - in_dy * dx, in_dx * dx + in_dy * dy))

    for start in range(len(edges)):
        if used[start]:
            continue
        chain = [start]
        used[start] = True
        cur = start
        k0 = _key(edges[start][0], edges[start][1])
        while True:
            _, _, ex, ey, _ = edges[cur]
            if _key(ex, ey) == k0:
                break  # closed
            cands = [i for i in out_by_start[_key(ex, ey)] if not used[i]]
            if not cands:
                chain = []  # open chain — degenerate, drop
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                csx, csy, cex, cey, _ = edges[cur]
                in_dx, in_dy = cex - csx, cey - csy
                nxt = max(cands, key=lambda c: _turn_key(in_dx, in_dy, c))
            used[nxt] = True
            chain.append(nxt)
            cur = nxt
        if not chain:
            continue
        # vertices: start of each edge; merge collinear runs that stay on
        # the same source segment (slab splitting re-joins exactly)
        px: list[float] = []
        py: list[float] = []
        prev_tag = None
        for i in chain:
            sx, sy, _, _, tag = edges[i]
            if prev_tag is not None and tag >= 0 and tag == prev_tag:
                # consecutive edges on the same source segment: the
                # shared vertex is a slab-split artifact — drop it
                continue
            px.append(sx)
            py.append(sy)
            prev_tag = tag
        # same merge at the wrap-around: the chain's FIRST vertex is the
        # junction of the last and first edges — if both lie on the same
        # source segment it is a slab-split artifact too (a chain that
        # happens to START at a split point would otherwise keep it,
        # rounding a mid-segment float to a spurious off-segment vertex)
        if len(px) > 1:
            first_tag = edges[chain[0]][4]
            last_tag = edges[chain[-1]][4]
            if first_tag >= 0 and first_tag == last_tag:
                px.pop(0)
                py.pop(0)
        rx = np.asarray(np.rint(px), dtype=np.int64)
        ry = np.asarray(np.rint(py), dtype=np.int64)
        # dedupe consecutive after rounding
        if len(rx) > 1:
            keep = np.ones(len(rx), dtype=bool)
            keep[1:] = (np.diff(rx) != 0) | (np.diff(ry) != 0)
            if rx[-1] == rx[0] and ry[-1] == ry[0] and len(rx) > 1:
                keep[-1] = False
            rx, ry = rx[keep], ry[keep]
        # drop exactly-collinear vertices (slab/event splits land exactly
        # on their source segment for axis-aligned and integer cases;
        # cross product on int64 is exact)
        while len(rx) >= 3:
            ax, ay = np.roll(rx, 1), np.roll(ry, 1)
            cx, cy = np.roll(rx, -1), np.roll(ry, -1)
            cross = (rx - ax) * (cy - ay) - (ry - ay) * (cx - ax)
            col = cross == 0
            if not col.any():
                break
            rx, ry = rx[~col], ry[~col]
        if len(rx) < 3:
            continue
        if signed_area(rx, ry) == 0:
            continue
        rings.append((rx, ry))
    # outers first, then holes — decode_clipped order (clip.cpp:230-258)
    rings.sort(key=lambda r: -signed_area(r[0], r[1]))
    return rings


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------

_EMPTY = (
    np.empty(0, dtype=np.float64),
    np.empty(0, dtype=np.float64),
    np.empty(0, dtype=np.float64),
    np.empty(0, dtype=np.float64),
    np.empty(0, dtype=np.int8),
)


def clean_rings(rings: list[Ring]) -> list[Ring]:
    """Positive-fill union of one ring set (clean_or_clip_poly with
    clip=false): repairs self-intersections, bowties, bad nesting."""
    return _sweep_boolean(
        _rings_to_segments(rings), _EMPTY, lambda wa, wb: wa > 0
    )


def union_rings(a: list[Ring], b: list[Ring]) -> list[Ring]:
    return _sweep_boolean(
        _rings_to_segments(a),
        _rings_to_segments(b),
        lambda wa, wb: wa > 0 or wb > 0,
    )


def intersect_rings(a: list[Ring], b: list[Ring]) -> list[Ring]:
    """poly ∩ poly region clip (clip_poly_poly, clip.cpp:390-450)."""
    return _sweep_boolean(
        _rings_to_segments(a),
        _rings_to_segments(b),
        lambda wa, wb: wa > 0 and wb > 0,
    )


def subtract_rings(a: list[Ring], b: list[Ring]) -> list[Ring]:
    return _sweep_boolean(
        _rings_to_segments(a),
        _rings_to_segments(b),
        lambda wa, wb: wa > 0 and wb <= 0,
    )


# ---------------------------------------------------------------------------
# fast pre-checks: skip the sweep for already-valid polygons
# ---------------------------------------------------------------------------

def ring_self_intersects(x: np.ndarray, y: np.ndarray, block: int = 512) -> bool:
    """Any proper crossing or overlap between non-adjacent edges of one
    ring.  Vectorized orientation tests (exact for int-valued doubles
    within 2^52)."""
    n = len(x)
    if n < 4:
        return False
    if n <= 8:
        # scalar twin of the vectorized walk below — tiny rings dominate
        # the tile stream and per-pair numpy dispatch costs more than the
        # integer arithmetic
        xs = [float(v) for v in x]
        ys = [float(v) for v in y]

        def o(ax, ay, bx, by, cx, cy):
            v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            return (v > 0) - (v < 0)

        for i in range(n - 2):
            j1 = n if i > 0 else n - 1
            i2 = i + 1
            for j in range(i + 2, j1):
                j2 = (j + 1) % n
                d1 = o(xs[i], ys[i], xs[i2], ys[i2], xs[j], ys[j])
                d2 = o(xs[i], ys[i], xs[i2], ys[i2], xs[j2], ys[j2])
                d3 = o(xs[j], ys[j], xs[j2], ys[j2], xs[i], ys[i])
                d4 = o(xs[j], ys[j], xs[j2], ys[j2], xs[i2], ys[i2])
                if d1 * d2 < 0 and d3 * d4 < 0:
                    return True
                if d1 == 0 and d2 == 0:
                    lo_, hi_ = min(xs[i], xs[i2]), max(xs[i], xs[i2])
                    lo_y, hi_y = min(ys[i], ys[i2]), max(ys[i], ys[i2])
                    if (
                        min(xs[j], xs[j2]) < hi_ and max(xs[j], xs[j2]) > lo_
                    ) or (
                        min(ys[j], ys[j2]) < hi_y and max(ys[j], ys[j2]) > lo_y
                    ):
                        return True
        return False
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x1 = np.roll(x, -1)
    y1 = np.roll(y, -1)

    def orient(ax, ay, bx, by, cx, cy):
        return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))

    for i in range(n - 2):
        # segments j in [i+2, n) except the wrap-adjacent pair (0, n-1)
        j0 = i + 2
        j1 = n if i > 0 else n - 1
        if j1 <= j0:
            continue
        js = np.arange(j0, j1)
        d1 = orient(x[i], y[i], x1[i], y1[i], x[js], y[js])
        d2 = orient(x[i], y[i], x1[i], y1[i], x1[js], y1[js])
        d3 = orient(x[js], y[js], x1[js], y1[js], x[i], y[i])
        d4 = orient(x[js], y[js], x1[js], y1[js], x1[i], y1[i])
        proper = (d1 * d2 < 0) & (d3 * d4 < 0)
        if proper.any():
            return True
        # collinear touch: endpoint of one strictly inside the other
        col = (d1 == 0) & (d2 == 0)
        if col.any():
            cj = js[col]
            lo = np.minimum(x[i], x1[i])
            hi = np.maximum(x[i], x1[i])
            lo_y = np.minimum(y[i], y1[i])
            hi_y = np.maximum(y[i], y1[i])
            ov = (
                (np.minimum(x[cj], x1[cj]) < hi)
                & (np.maximum(x[cj], x1[cj]) > lo)
            ) | (
                (np.minimum(y[cj], y1[cj]) < hi_y)
                & (np.maximum(y[cj], y1[cj]) > lo_y)
            )
            if ov.any():
                return True
    return False


def _rings_cross(a: Ring, b: Ring) -> bool:
    """Any proper edge crossing between two rings (vectorized
    orientation tests, one row of a vs all edges of b)."""
    ax, ay = np.asarray(a[0], np.float64), np.asarray(a[1], np.float64)
    bx, by = np.asarray(b[0], np.float64), np.asarray(b[1], np.float64)
    ax1, ay1 = np.roll(ax, -1), np.roll(ay, -1)
    bx1, by1 = np.roll(bx, -1), np.roll(by, -1)

    def orient(px, py, qx, qy, rx, ry):
        return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

    for i in range(len(ax)):
        d1 = orient(ax[i], ay[i], ax1[i], ay1[i], bx, by)
        d2 = orient(ax[i], ay[i], ax1[i], ay1[i], bx1, by1)
        d3 = orient(bx, by, bx1, by1, ax[i], ay[i])
        d4 = orient(bx, by, bx1, by1, ax1[i], ay1[i])
        if ((d1 * d2 < 0) & (d3 * d4 < 0)).any():
            return True
    return False


def rings_need_cleaning(rings: list[Ring]) -> bool:
    """True when the polygon can't be proven valid cheaply.  Checks:
    every ring simple; ring pairs with overlapping bboxes don't cross;
    winding of each hole's vertex w.r.t. the other rings is exactly 1
    (properly parented) and of each outer's vertex exactly 0 (outers
    don't nest/overlap).  A polygon passing all of these is a fixpoint
    of clean_rings up to vertex rotation, so skipping the sweep is
    semantics-free."""
    if not rings:
        return False
    total = sum(len(r[0]) for r in rings)
    if total > 4096:
        return True  # pre-check would cost more than the sweep
    for x, y in rings:
        if ring_self_intersects(x, y):
            return True
    if len(rings) == 1:
        return signed_area(rings[0][0], rings[0][1]) < 0  # orphan hole
    boxes = [
        (r[0].min(), r[1].min(), r[0].max(), r[1].max()) for r in rings
    ]
    vsets = [set(zip(r[0].tolist(), r[1].tolist())) for r in rings]
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            bi, bj = boxes[i], boxes[j]
            if bi[0] > bj[2] or bj[0] > bi[2] or bi[1] > bj[3] or bj[1] > bi[3]:
                continue
            if vsets[i] & vsets[j]:
                # rings touching at a shared vertex or shared edge
                # (identical duplicates included) — wagyu unions these
                # into one boundary (coalesce_polygon, tile.cpp:691)
                return True
            if _rings_cross(rings[i], rings[j]):
                return True
    for i, (x, y) in enumerate(rings):
        others = [r for j, r in enumerate(rings) if j != i]
        w = int(
            point_winding(
                np.array([float(x[0])]), np.array([float(y[0])]), others
            )[0]
        )
        if signed_area(x, y) < 0:
            if w != 1:
                return True  # hole without exactly one parent outer
        else:
            if w != 0:
                return True  # nested/overlapping outers must union
    return False


# ---------------------------------------------------------------------------
# line ∩ polygon (clip_lines_poly, clip.cpp:490-505)
# ---------------------------------------------------------------------------

def point_winding(px: np.ndarray, py: np.ndarray, rings: list[Ring]) -> np.ndarray:
    """Winding number of points w.r.t. a ring set (nonzero-rule basis;
    the reference's pnpoly is even-odd, clip.cpp:1153-1215 — for cleaned
    polygons the two agree)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wind = np.zeros(len(px), dtype=np.int64)
    for rx, ry in rings:
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        nx = np.roll(rx, -1)
        ny = np.roll(ry, -1)
        for (ax, ay, bx, by) in zip(rx, ry, nx, ny):
            if ay == by:
                continue
            # upward (in value) edge contributes +1, downward -1, to
            # points strictly left of the edge at their y
            cross = (py >= min(ay, by)) & (py < max(ay, by))
            if not cross.any():
                continue
            t = (py[cross] - ay) / (by - ay)
            xi = ax + t * (bx - ax)
            # accumulate the weights of edges to the LEFT of the point,
            # matching the sweep's left-to-right accumulation
            sgn = 1 if by < ay else -1
            upd = np.zeros(len(px), dtype=np.int64)
            upd[np.flatnonzero(cross)[px[cross] > xi]] = sgn
            wind += upd
    return wind


def clip_lines_to_rings(
    lines: list[Ring], rings: list[Ring]
) -> list[Ring]:
    """Keep the sub-segments of each polyline that lie inside the
    positive-winding region of ``rings``."""
    out: list[Ring] = []
    for lx, ly in lines:
        lx = np.asarray(lx, dtype=np.float64)
        ly = np.asarray(ly, dtype=np.float64)
        cur_x: list[float] = []
        cur_y: list[float] = []
        for i in range(len(lx) - 1):
            ax, ay, bx, by = lx[i], ly[i], lx[i + 1], ly[i + 1]
            # split at every crossing with a ring edge
            ts = [0.0, 1.0]
            for rx, ry in rings:
                nx = np.roll(np.asarray(rx, dtype=np.float64), -1)
                ny = np.roll(np.asarray(ry, dtype=np.float64), -1)
                rxf = np.asarray(rx, dtype=np.float64)
                ryf = np.asarray(ry, dtype=np.float64)
                denom = (bx - ax) * (ny - ryf) - (by - ay) * (nx - rxf)
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (
                        (rxf - ax) * (ny - ryf) - (ryf - ay) * (nx - rxf)
                    ) / denom
                    u = ((rxf - ax) * (by - ay) - (ryf - ay) * (bx - ax)) / denom
                ok = (denom != 0) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
                ts.extend(t[ok].tolist())
            ts = sorted(set(ts))
            for t0, t1 in zip(ts, ts[1:]):
                tm = (t0 + t1) / 2.0
                mx = ax + tm * (bx - ax)
                my = ay + tm * (by - ay)
                if point_winding(np.array([mx]), np.array([my]), rings)[0] > 0:
                    p0 = (ax + t0 * (bx - ax), ay + t0 * (by - ay))
                    p1 = (ax + t1 * (bx - ax), ay + t1 * (by - ay))
                    if not cur_x or (cur_x[-1], cur_y[-1]) != p0:
                        if len(cur_x) > 1:
                            out.append(
                                (np.rint(cur_x).astype(np.int64),
                                 np.rint(cur_y).astype(np.int64))
                            )
                        cur_x, cur_y = [p0[0]], [p0[1]]
                    cur_x.append(p1[0])
                    cur_y.append(p1[1])
        if len(cur_x) > 1:
            out.append(
                (np.rint(cur_x).astype(np.int64), np.rint(cur_y).astype(np.int64))
            )
    return out
