"""Line simplification kernels (numpy) — T19/T20/T17/T18 of SURVEY §2.4.

- :func:`douglas_peucker`: stack-based DP with the reference's
  integer-stable squared-distance (semantics of douglas_peucker
  clip.cpp:909-1001 and distance_from_line clip.cpp:879-906: coordinates
  are downshifted until they fit 31 bits so the cross product cannot
  overflow; ties broken deterministically by taking the *first* farthest
  point).
- :func:`visvalingam`: min-heap effective-area elimination (-av,
  visvalingam.cpp semantics) with a tolerance expressed as area.
- :func:`tiny_polygon_reduce`: accumulator that replaces sub-pixel rings
  with a placeholder square once enough area accumulates
  (reduce_tiny_poly, clip.cpp:1048-1140).
- :func:`line_is_too_small`: drop lines under half a pixel
  (clip.cpp:1903-1924).
"""

from __future__ import annotations

import heapq

import numpy as np


def _downshift(vals: np.ndarray) -> int:
    """How many bits to shift off so |vals| fits in 31 bits (the
    reference's overflow guard in distance_from_line)."""
    m = int(np.abs(vals).max(initial=0))
    shift = 0
    while (m >> shift) >= (1 << 31):
        shift += 1
    return shift


def _sq_dist_to_segment(
    px: np.ndarray, py: np.ndarray, ax: int, ay: int, bx: int, by: int
) -> np.ndarray:
    """Squared perpendicular distance of points to segment AB, computed in
    float64 after an integer downshift for stability."""
    shift = _downshift(np.array([ax, ay, bx, by], dtype=np.int64))
    axs, ays, bxs, bys = ax >> shift, ay >> shift, bx >> shift, by >> shift
    pxs = (px >> shift).astype(np.float64)
    pys = (py >> shift).astype(np.float64)
    dx = float(bxs - axs)
    dy = float(bys - ays)
    seg2 = dx * dx + dy * dy
    if seg2 == 0.0:
        ddx = pxs - axs
        ddy = pys - ays
        return (ddx * ddx + ddy * ddy) * float(1 << shift) ** 2
    cross = (pxs - axs) * dy - (pys - ays) * dx
    return (cross * cross / seg2) * float(1 << shift) ** 2


def douglas_peucker(
    x: np.ndarray,
    y: np.ndarray,
    tolerance: float,
    keep: np.ndarray | None = None,
) -> np.ndarray:
    """Return a boolean keep-mask.  ``keep`` marks pre-required vertices
    (endpoints, tile-boundary nodes, shared nodes — the "necessary" marks
    of simplify_lines, geometry.cpp:219-313); they are always retained and
    the recursion runs between consecutive required vertices."""
    n = len(x)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if keep is None:
        keep = np.zeros(n, dtype=bool)
    else:
        keep = np.asarray(keep, dtype=bool).copy()
    keep[0] = keep[-1] = True
    out |= keep
    tol2 = float(tolerance) * float(tolerance)
    anchors = np.flatnonzero(keep)
    stack: list[tuple[int, int]] = [
        (int(a), int(b)) for a, b in zip(anchors[:-1], anchors[1:])
    ]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = slice(a + 1, b)
        d2 = _sq_dist_to_segment(x[seg], y[seg], int(x[a]), int(y[a]), int(x[b]), int(y[b]))
        far = int(np.argmax(d2))  # first max — deterministic tie-break
        if d2[far] > tol2:
            m = a + 1 + far
            out[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return out


def _triangle_area2(x0, y0, x1, y1, x2, y2) -> float:
    return abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))


def visvalingam(
    x: np.ndarray,
    y: np.ndarray,
    area_tolerance: float,
    keep: np.ndarray | None = None,
) -> np.ndarray:
    """Effective-area simplification (-av, visvalingam.cpp semantics):
    repeatedly remove the vertex whose triangle with its live neighbors has
    the smallest doubled-area, until every remaining area exceeds the
    tolerance.  Required vertices are never removed."""
    n = len(x)
    if n <= 2:
        return np.ones(n, dtype=bool)
    xf = np.asarray(x, dtype=np.float64)
    yf = np.asarray(y, dtype=np.float64)
    alive = np.ones(n, dtype=bool)
    if keep is None:
        required = np.zeros(n, dtype=bool)
    else:
        required = np.asarray(keep, dtype=bool).copy()
    required[0] = required[-1] = True
    prv = np.arange(n) - 1
    nxt = np.arange(n) + 1
    heap: list[tuple[float, int, int]] = []
    version = np.zeros(n, dtype=np.int64)

    def push(i: int) -> None:
        if required[i] or i <= 0 or i >= n - 1:
            return
        a, b = prv[i], nxt[i]
        ar = _triangle_area2(xf[a], yf[a], xf[i], yf[i], xf[b], yf[b])
        heapq.heappush(heap, (ar, int(version[i]), i))

    for i in range(1, n - 1):
        push(i)
    tol2 = 2.0 * float(area_tolerance)
    while heap:
        ar, ver, i = heapq.heappop(heap)
        if not alive[i] or required[i] or ver != version[i]:
            continue
        if ar > tol2:
            break
        alive[i] = False
        a, b = prv[i], nxt[i]
        nxt[a], prv[b] = b, a
        for j in (a, b):
            if 0 < j < n - 1 and alive[j] and not required[j]:
                version[j] += 1
                push(j)
    return alive


def line_is_too_small(x: np.ndarray, y: np.ndarray, res: float) -> bool:
    """True if every vertex fits inside one half-pixel box — such a line
    draws as nothing (clip.cpp:1903-1924)."""
    if len(x) == 0:
        return True
    half = res / 2.0
    return bool(
        (x.max() - x.min()) <= half and (y.max() - y.min()) <= half
    )


class TinyPolygonReducer:
    """Sequential accumulator for sub-pixel rings (reduce_tiny_poly,
    clip.cpp:1048-1140), reference-faithful: the caller decides WHICH
    rings reduce (outer with 0 < area <= pixel², or hole whose outer was
    itself reduced — see the included_last_outer walk in
    _simplify_nonpoint_cmds); consume() adds the SIGNED area to the
    running per-tile accumulator and, when an outer ring pushes it
    strictly past pixel², emits a pixel-sized placeholder square CENTERED
    on the ring's first vertex with C++ double→long long truncation
    (clip.cpp:1090-1097).  Must run in (index, seq) order within a tile
    (SURVEY §7 hard parts)."""

    def __init__(self, tiny_polygon_size: float):
        self.size = float(tiny_polygon_size)
        self.threshold2 = self.size ** 2
        self.accum = 0.0

    def consume(self, ring_area: float, x0: int, y0: int):
        """Accumulate one reduced ring's signed area.  Returns () when
        the ring just dissolves, or placeholder coords (x_arr, y_arr)
        when the accumulator crossed the pixel area."""
        self.accum += ring_area
        if ring_area > 0 and self.accum > self.threshold2:
            self.accum -= self.threshold2
            h = self.size / 2.0
            lo_x, lo_y = x0 - h, y0 - h
            xs = np.array(
                [int(lo_x), int(lo_x + self.size), int(lo_x + self.size), int(lo_x)],
                dtype=np.int64,
            )
            ys = np.array(
                [int(lo_y), int(lo_y), int(lo_y + self.size), int(lo_y + self.size)],
                dtype=np.int64,
            )
            return xs, ys
        return ()


def _get_area_ref(x: np.ndarray, y: np.ndarray) -> float:
    """get_area (clip.cpp:642-689): shoelace with the first vertex as the
    origin so 34-bit products stay exactly representable in doubles."""
    bx, by = int(x[0]), int(y[0])
    if len(x) <= 8:
        # scalar path: tiny rings dominate the tile stream and the numpy
        # roll/sum dispatch costs more than the arithmetic
        xs = [int(v) - bx for v in x]
        ys = [int(v) - by for v in y]
        n = len(xs)
        a = 0
        for i in range(n):
            j = i + 1 if i + 1 < n else 0
            a += xs[i] * ys[j] - ys[i] * xs[j]
        return 0.5 * a
    xs = (np.asarray(x, dtype=np.int64) - bx).astype(np.float64)
    ys = (np.asarray(y, dtype=np.int64) - by).astype(np.float64)
    return 0.5 * float(np.sum(xs * np.roll(ys, -1) - ys * np.roll(xs, -1)))


def reduce_tiny_poly_ref(
    rings: list[tuple[np.ndarray, np.ndarray]],
    z: int,
    detail: int,
    tiny_polygon_size: float,
    acc: "TinyPolygonReducer",
) -> tuple[list[tuple[np.ndarray, np.ndarray]], bool, bool]:
    """Reference-faithful reduce_tiny_poly (clip.cpp:1048-1140) over one
    feature's FULL-RES world-coordinate rings: outer rings with
    area <= pixel² are accumulated; when the running area crosses
    pixel², a pixel-sized placeholder square is emitted centered on the
    ring's first vertex.  Holes are de-accumulated unless their outer
    ring represented itself.  ``acc.accum`` carries the accumulator
    across the tile's features in stream order, exactly like the
    reference's per-tile accum_area.

    Returns (rings, still_needs_simplification, reduced_away) — the
    reference's two out-params: a feature is ``reduced`` (skips DP,
    tile.cpp:612-616,2256) iff nothing in it represented itself."""
    pixel = float(1 << (32 - detail - z)) * float(tiny_polygon_size)
    p2 = pixel * pixel
    out: list[tuple[np.ndarray, np.ndarray]] = []
    included_last_outer = False
    still_needs = False
    reduced_away = False
    for cx, cy in rings:
        area = _get_area_ref(cx, cy)
        if area == 0:
            continue
        if (area > 0 and area <= p2) or (area < 0 and not included_last_outer):
            acc.accum += area
            reduced_away = True
            if area > 0 and acc.accum > p2:
                # C++ double → long long conversion truncates toward zero
                x0, y0 = float(cx[0]), float(cy[0])
                h = pixel / 2
                xs = np.array(
                    [int(x0 - h), int(x0 - h + pixel), int(x0 - h + pixel), int(x0 - h)],
                    dtype=np.int64,
                )
                ys = np.array(
                    [int(y0 - h), int(y0 - h), int(y0 - h + pixel), int(y0 - h + pixel)],
                    dtype=np.int64,
                )
                out.append((xs, ys))
                acc.accum -= p2
            if area > 0:
                included_last_outer = False
        else:
            out.append((cx, cy))
            still_needs = True
            if area > 0:
                included_last_outer = True
    return out, still_needs, reduced_away


# crossing-segment count at or below which impose_tile_boundaries takes
# the scalar walk (the vectorized path's ~60 small-array numpy ops carry
# ~100us of fixed dispatch overhead; tests force 0 to fuzz both paths)
_IMPOSE_SCALAR_MAX = 24


def _impose_scalar(
    x: np.ndarray, y: np.ndarray, extent: int,
    segs: np.ndarray, req: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scalar twin of the vectorized crossing computation below — same
    boundary order, same t-stable ordering, same endpoint/duplicate
    drops — for the common few-crossing-segments case."""
    E = float(extent)
    n = len(x)
    ins: list[tuple[int, int, int]] = []
    for s in segs:
        s = int(s)
        x1 = float(x[s]); y1 = float(y[s])
        x2 = float(x[s + 1]); y2 = float(y[s + 1])
        pts: list[tuple[float, int, int]] = []
        for b in (0.0, E):
            if ((x1 < b) != (x2 < b)) and x1 != x2:
                t = (b - x1) / (x2 - x1)
                pts.append((t, int(b), round(y1 + t * (y2 - y1))))
        for b in (0.0, E):
            if ((y1 < b) != (y2 < b)) and y1 != y2:
                t = (b - y1) / (y2 - y1)
                pts.append((t, round(x1 + t * (x2 - x1)), int(b)))
        if not pts:
            continue
        pts.sort(key=lambda p: p[0])
        ix1 = int(x[s]); iy1 = int(y[s])
        ix2 = int(x[s + 1]); iy2 = int(y[s + 1])
        for _, px, py in pts:
            if (px == ix1 and py == iy1) or (px == ix2 and py == iy2):
                continue
            if ins and ins[-1] == (s, px, py):
                continue
            ins.append((s, px, py))
    k = len(ins)
    if k == 0:
        return x, y, req
    m = n + k
    pos = np.empty(k, dtype=np.int64)
    vx = np.empty(k, dtype=x.dtype)
    vy = np.empty(k, dtype=y.dtype)
    for i, (s, px, py) in enumerate(ins):
        pos[i] = s + 1 + i
        vx[i] = px
        vy[i] = py
    mask = np.ones(m, dtype=bool)
    mask[pos] = False
    nx = np.empty(m, dtype=x.dtype)
    ny = np.empty(m, dtype=y.dtype)
    nreq = np.zeros(m, dtype=bool)
    nx[mask] = x
    ny[mask] = y
    nx[pos] = vx
    ny[pos] = vy
    nreq[pos] = True
    return nx, ny, nreq


def impose_tile_boundaries(
    x: np.ndarray, y: np.ndarray, extent: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Insert an unsimplifiable vertex wherever a segment crosses the
    tile-proper boundary (impose_tile_boundaries, geometry.cpp:185-217):
    without it, simplification can move the crossing point and the
    feature edge jumps at the seam between adjacent tiles.

    Returns (nx, ny, required): the ring/line with boundary crossings
    inserted and a mask of vertices the simplifier must keep.  Only
    segments with an endpoint outside the tile proper can cross, so the
    scan touches a handful of boundary segments per feature."""
    n = len(x)
    req = np.zeros(n, dtype=bool)
    if n < 2:
        return x, y, req
    out = (x < 0) | (x > extent) | (y < 0) | (y > extent)
    if not out.any():
        return x, y, req
    # a segment crosses a boundary line iff one of the four half-plane
    # predicates flips across it — buffer-hugging runs (both endpoints
    # outside on the same side) are excluded up front
    lx0, lxE = x < 0, x < extent
    ly0, lyE = y < 0, y < extent
    cross = (
        (lx0[:-1] != lx0[1:])
        | (lxE[:-1] != lxE[1:])
        | (ly0[:-1] != ly0[1:])
        | (lyE[:-1] != lyE[1:])
    )
    segs = np.flatnonzero(cross)
    if not len(segs):
        return x, y, req
    if len(segs) <= _IMPOSE_SCALAR_MAX:
        # the overwhelmingly common shape (a clipped part re-enters the
        # tile proper a handful of times): the ~60 small-array numpy ops
        # of the vectorized path cost ~100us of fixed dispatch overhead;
        # a scalar walk over the few crossing segments is ~10x cheaper
        return _impose_scalar(x, y, extent, segs, req)
    E = float(extent)
    # vectorized crossing computation over the (few) crossing segments:
    # each of the 4 boundary lines contributes (t, px, py) per segment it
    # cuts; crossings sort by (segment, t), then endpoint-coincident and
    # corner-duplicate points drop (the reference's x1 != geom[i-1].x
    # guards), exactly like the scalar per-segment walk did
    x1 = x[segs].astype(np.float64)
    y1 = y[segs].astype(np.float64)
    x2 = x[segs + 1].astype(np.float64)
    y2 = y[segs + 1].astype(np.float64)
    rows_l, t_l, px_l, py_l = [], [], [], []
    for axis in (0, 1):
        c1, c2 = (x1, x2) if axis == 0 else (y1, y2)
        o1, o2 = (y1, y2) if axis == 0 else (x1, x2)
        for b in (0.0, E):
            hit = ((c1 < b) != (c2 < b)) & (c1 != c2)
            if not hit.any():
                continue
            t = (b - c1[hit]) / (c2[hit] - c1[hit])
            other = o1[hit] + t * (o2[hit] - o1[hit])
            const = np.full(len(t), b)
            rows_l.append(np.flatnonzero(hit))
            t_l.append(t)
            px_l.append(const if axis == 0 else other)
            py_l.append(other if axis == 0 else const)
    if not rows_l:
        return x, y, req
    rows = np.concatenate(rows_l)
    t = np.concatenate(t_l)
    pxi = np.rint(np.concatenate(px_l)).astype(np.int64)
    pyi = np.rint(np.concatenate(py_l)).astype(np.int64)
    order = np.lexsort((t, rows))
    rows, pxi, pyi = rows[order], pxi[order], pyi[order]
    e1x, e1y = x[segs[rows]], y[segs[rows]]
    e2x, e2y = x[segs[rows] + 1], y[segs[rows] + 1]
    keep = ~(((pxi == e1x) & (pyi == e1y)) | ((pxi == e2x) & (pyi == e2y)))
    rows, pxi, pyi = rows[keep], pxi[keep], pyi[keep]
    if len(rows) > 1:
        dup = np.zeros(len(rows), dtype=bool)
        dup[1:] = (
            (rows[1:] == rows[:-1])
            & (pxi[1:] == pxi[:-1])
            & (pyi[1:] == pyi[:-1])
        )
        if dup.any():
            rows, pxi, pyi = rows[~dup], pxi[~dup], pyi[~dup]
    if len(rows) == 0:
        return x, y, req
    ins_x = pxi
    ins_y = pyi
    # single-pass scatter instead of three np.insert calls (np.insert
    # re-derives the output layout per call; this path runs per edge-
    # touching feature per tile)
    k = len(rows)
    m = n + k
    pos = segs[rows] + 1 + np.arange(k, dtype=np.int64)
    mask = np.ones(m, dtype=bool)
    mask[pos] = False
    nx = np.empty(m, dtype=x.dtype)
    ny = np.empty(m, dtype=y.dtype)
    nreq = np.zeros(m, dtype=bool)
    nx[mask] = x
    ny[mask] = y
    nx[pos] = ins_x
    ny[pos] = ins_y
    nreq[pos] = True
    return nx, ny, nreq


def revive_polygon(
    area_world: float, z: int, detail: int, sx: int, sy: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Area-equivalent placeholder for a polygon that collapsed to
    nothing during scaling/cleaning (revive_polygon, tile.cpp:551-590):
    a ``width × height`` rectangle of the feature's world area converted
    to tile pixels, centered on the mean of its surviving vertices.
    Returns None when the area rounds away entirely."""
    divisor = 2.0 ** (32 - detail - z)
    area = area_world / (divisor * divisor)
    if area <= 0:
        return None
    height = int(np.ceil(np.sqrt(area)))
    if height == 0:
        return None
    width = int(round(area / height))
    if width == 0:
        width = 1
    x0 = sx - width // 2
    y0 = sy - height // 2
    xs = np.array([x0, x0 + width, x0 + width, x0], dtype=np.int64)
    ys = np.array([y0, y0, y0 + height, y0 + height], dtype=np.int64)
    return xs, ys


def stairstep(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-aL grid-low-zooms rasterization (stairstep, geometry.cpp:438-522):
    Bresenham-walk each segment on the (already scaled) pixel grid,
    merging consecutive steps in the same direction, with the reference's
    downward-normalized walk order (segments flipped so y0 >= y1, then the
    step list reversed back) for exact step-pattern parity."""
    if len(x) < 2:
        return x, y
    out_x: list[int] = [int(x[0])]
    out_y: list[int] = [int(y[0])]
    for i in range(1, len(x)):
        x0, y0 = int(x[i - 1]), int(y[i - 1])
        x1, y1 = int(x[i]), int(y[i])
        swap = y0 < y1
        if swap:
            x0, x1 = x1, x0
            y0, y1 = y1, y0
        xx, yy = x0, y0
        dx = abs(x1 - x0)
        sx = 1 if x0 < x1 else -1
        dy = abs(y1 - y0)
        sy = 1 if y0 < y1 else -1
        err = (dx if dx > dy else -dy) // 2
        last = -1
        tmp_x: list[int] = [xx]
        tmp_y: list[int] = [yy]
        while xx != x1 or yy != y1:
            e2 = err
            if e2 > -dx:
                err -= dy
                xx += sx
                if last == 1:
                    tmp_x[-1], tmp_y[-1] = xx, yy
                else:
                    tmp_x.append(xx)
                    tmp_y.append(yy)
                last = 1
            if e2 < dy:
                err += dx
                yy += sy
                if last == 2:
                    tmp_x[-1], tmp_y[-1] = xx, yy
                else:
                    tmp_x.append(xx)
                    tmp_y.append(yy)
                last = 2
        if swap:
            tmp_x, tmp_y = tmp_x[::-1], tmp_y[::-1]
        out_x.extend(tmp_x)
        out_y.extend(tmp_y)
    # dedupe consecutive duplicates (segment joints repeat the vertex)
    ox = np.array(out_x, dtype=np.int64)
    oy = np.array(out_y, dtype=np.int64)
    keep = np.ones(len(ox), dtype=bool)
    keep[1:] = (np.diff(ox) != 0) | (np.diff(oy) != 0)
    return ox[keep], oy[keep]

