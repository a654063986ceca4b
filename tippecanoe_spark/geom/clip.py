"""Clipping kernels (pure numpy / python — GEOS is unavailable here).

Semantics follow the reference (studied, not copied):

- line clip: Cohen–Sutherland segment clipping against an axis-aligned
  box (clip.cpp:106-228) — clipped runs become separate MOVETO runs.
- polygon clip: Sutherland–Hodgman against the 4 box edges in doubles,
  rounded back to ints (simple_clip_poly, clip.cpp:24-103,742-877).
- point-in-polygon: even-odd ray cast (pnpoly, W. R. Franklin form,
  clip.cpp:1153-1215), vectorized over many test points.
- bbox quick check: in/out/partial classification (geometry.cpp:147-174).

Coordinates are int64 world/tile coordinates throughout; intermediate
intersection math in float64 (exactly the reference's approach).
"""

from __future__ import annotations

import numpy as np

INSIDE, LEFT, RIGHT, BOTTOM, TOP = 0, 1, 2, 4, 8


def quick_check(minx, miny, maxx, maxy, x0, y0, x1, y1) -> int:
    """2 = fully inside, 0 = fully outside, 1 = partial (needs clip).
    Mirrors geometry.cpp:147-174."""
    if minx >= x0 and miny >= y0 and maxx <= x1 and maxy <= y1:
        return 2
    if maxx < x0 or maxy < y0 or minx > x1 or miny > y1:
        return 0
    return 1


def _outcode(x, y, x0, y0, x1, y1):
    code = np.zeros(len(x), dtype=np.int64)
    code |= np.where(x < x0, LEFT, 0)
    code |= np.where(x > x1, RIGHT, 0)
    code |= np.where(y < y0, BOTTOM, 0)
    code |= np.where(y > y1, TOP, 0)
    return code


def clip_segment(ax, ay, bx, by, x0, y0, x1, y1):
    """Cohen–Sutherland one segment (scalar floats).  Returns
    (keep, cax, cay, cbx, cby, a_moved, b_moved)."""
    a_code = (
        (LEFT if ax < x0 else 0)
        | (RIGHT if ax > x1 else 0)
        | (BOTTOM if ay < y0 else 0)
        | (TOP if ay > y1 else 0)
    )
    b_code = (
        (LEFT if bx < x0 else 0)
        | (RIGHT if bx > x1 else 0)
        | (BOTTOM if by < y0 else 0)
        | (TOP if by > y1 else 0)
    )
    a_moved = b_moved = False
    while True:
        if not (a_code | b_code):
            return True, ax, ay, bx, by, a_moved, b_moved
        if a_code & b_code:
            return False, ax, ay, bx, by, a_moved, b_moved
        out = a_code or b_code
        if out & TOP:
            x = ax + (bx - ax) * (y1 - ay) / (by - ay)
            y = y1
        elif out & BOTTOM:
            x = ax + (bx - ax) * (y0 - ay) / (by - ay)
            y = y0
        elif out & RIGHT:
            y = ay + (by - ay) * (x1 - ax) / (bx - ax)
            x = x1
        else:
            y = ay + (by - ay) * (x0 - ax) / (bx - ax)
            x = x0
        if out == a_code:
            ax, ay, a_moved = x, y, True
            a_code = (
                (LEFT if ax < x0 else 0)
                | (RIGHT if ax > x1 else 0)
                | (BOTTOM if ay < y0 else 0)
                | (TOP if ay > y1 else 0)
            )
        else:
            bx, by, b_moved = x, y, True
            b_code = (
                (LEFT if bx < x0 else 0)
                | (RIGHT if bx > x1 else 0)
                | (BOTTOM if by < y0 else 0)
                | (TOP if by > y1 else 0)
            )


def _as_int64(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype == np.int64:
        return a
    return np.round(a).astype(np.int64)


def clip_line(x: np.ndarray, y: np.ndarray, x0, y0, x1, y1) -> list[tuple[np.ndarray, np.ndarray]]:
    """Clip a polyline to a box.  Returns a list of kept runs (each a
    (x, y) int64 array pair) — runs split where the line exits the box."""
    x = np.asarray(x)
    y = np.asarray(y)
    if len(x) >= 2 and (
        x.min() >= x0 and x.max() <= x1 and y.min() >= y0 and y.max() <= y1
    ):
        # fully inside — the common case for walk-localized sub-geometry
        return [(_as_int64(x), _as_int64(y))]
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    runs: list[tuple[list, list]] = []
    cur_x: list = []
    cur_y: list = []
    for i in range(len(x) - 1):
        keep, ax, ay, bx, by, a_moved, b_moved = clip_segment(
            x[i], y[i], x[i + 1], y[i + 1], x0, y0, x1, y1
        )
        if not keep:
            if cur_x:
                runs.append((cur_x, cur_y))
                cur_x, cur_y = [], []
            continue
        if a_moved or not cur_x:
            if cur_x:
                runs.append((cur_x, cur_y))
            cur_x, cur_y = [ax], [ay]
        cur_x.append(bx)
        cur_y.append(by)
        if b_moved:
            runs.append((cur_x, cur_y))
            cur_x, cur_y = [], []
    if cur_x:
        runs.append((cur_x, cur_y))
    out = []
    for rx, ry in runs:
        ax = np.round(np.array(rx)).astype(np.int64)
        ay = np.round(np.array(ry)).astype(np.int64)
        if len(ax) >= 2:
            out.append((ax, ay))
    return out


def clip_ring(x: np.ndarray, y: np.ndarray, x0, y0, x1, y1) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland–Hodgman: clip one ring (unclosed vertex list) to a box.
    Returns the clipped ring (possibly empty).  Doubles inside, rounded
    back to int64 at the end (simple_clip_poly semantics,
    clip.cpp:24-103)."""
    x = np.asarray(x)
    y = np.asarray(y)
    if len(x) >= 3 and (
        x.min() >= x0 and x.max() <= x1 and y.min() >= y0 and y.max() <= y1
    ):
        # fully inside — no edge can cut; skip the per-edge python walk
        return _as_int64(x), _as_int64(y)
    px = np.asarray(x, dtype=np.float64)
    py = np.asarray(y, dtype=np.float64)
    for edge in range(4):
        if len(px) == 0:
            break
        if edge == 0:
            inside = px >= x0
        elif edge == 1:
            inside = px <= x1
        elif edge == 2:
            inside = py >= y0
        else:
            inside = py <= y1
        nx, ny = [], []
        n = len(px)
        for i in range(n):
            j = (i + 1) % n
            ci, cj = inside[i], inside[j]
            if ci:
                nx.append(px[i])
                ny.append(py[i])
            if ci != cj:
                if edge == 0:
                    t = (x0 - px[i]) / (px[j] - px[i])
                    ix, iy = x0, py[i] + t * (py[j] - py[i])
                elif edge == 1:
                    t = (x1 - px[i]) / (px[j] - px[i])
                    ix, iy = x1, py[i] + t * (py[j] - py[i])
                elif edge == 2:
                    t = (y0 - py[i]) / (py[j] - py[i])
                    ix, iy = px[i] + t * (px[j] - px[i]), y0
                else:
                    t = (y1 - py[i]) / (py[j] - py[i])
                    ix, iy = px[i] + t * (px[j] - px[i]), y1
                nx.append(ix)
                ny.append(iy)
        px = np.array(nx, dtype=np.float64)
        py = np.array(ny, dtype=np.float64)
    if len(px) < 3:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.round(px).astype(np.int64), np.round(py).astype(np.int64)


def pnpoly(
    ring_x: np.ndarray, ring_y: np.ndarray, px: np.ndarray, py: np.ndarray
) -> np.ndarray:
    """Even-odd ray cast of many points against one ring, vectorized over
    points (pnpoly semantics, clip.cpp:1153-1215).  Boundary behavior
    follows the classic half-open rule."""
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    n = len(rx)
    j = n - 1
    for i in range(n):
        cond = (ry[i] > py) != (ry[j] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (rx[j] - rx[i]) * (py - ry[i]) / (ry[j] - ry[i]) + rx[i]
        crossing = cond & (px < xs)
        inside ^= crossing
        j = i
    return inside


def point_in_polygon(
    rings: list[tuple[np.ndarray, np.ndarray]], px: np.ndarray, py: np.ndarray
) -> np.ndarray:
    """Multi-ring even-odd (XOR across rings — holes handled naturally,
    matching the reference's multipolygon XOR)."""
    inside = np.zeros(len(np.asarray(px)), dtype=bool)
    for rx, ry in rings:
        inside ^= pnpoly(rx, ry, px, py)
    return inside


def _round_half_away(a: np.ndarray) -> np.ndarray:
    """std::round semantics (half away from zero) — np.round is banker's."""
    a = np.asarray(a, dtype=np.float64)
    return np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)).astype(np.int64)


def clip_ring_ref(
    x: np.ndarray, y: np.ndarray, minx, miny, maxx, maxy
) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact Sutherland–Hodgman ring clip (clip_poly1 +
    simple_clip_poly, clip.cpp:742-877 with buffer box == tile box):
    edge order top/right/bottom/left, STRICT inside predicates (a vertex
    exactly on the clip line counts as outside, so geometry lying along
    the box edge is dropped, not kept), doubles end-to-end, the output
    ring closed and discarded when < 3 distinct points, and std::round
    (half away from zero) back to int64.  Input/output rings are
    UNCLOSED; the closing segment is handled internally."""
    x = np.asarray(x)
    y = np.asarray(y)
    if len(x) >= 3 and (
        x.min() > minx and x.max() < maxx and y.min() > miny and y.max() < maxy
    ):
        # strictly inside — no edge can cut
        if x.dtype == np.int64:
            return x, y
        return _round_half_away(x), _round_half_away(y)
    px = list(np.asarray(x, dtype=np.float64))
    py = list(np.asarray(y, dtype=np.float64))
    for edge in range(4):
        if not px:
            break
        nx: list[float] = []
        ny: list[float] = []
        sx, sy = px[-1], py[-1]
        if edge == 0:
            s_in = sy > miny
        elif edge == 1:
            s_in = sx < maxx
        elif edge == 2:
            s_in = sy < maxy
        else:
            s_in = sx > minx
        for ex, ey in zip(px, py):
            if edge == 0:
                e_in = ey > miny
            elif edge == 1:
                e_in = ex < maxx
            elif edge == 2:
                e_in = ey < maxy
            else:
                e_in = ex > minx
            if e_in != s_in:
                # intersect() exactly as clip.cpp:761-778
                if edge == 0:
                    ix, iy = sx + (ex - sx) * (miny - sy) / (ey - sy), float(miny)
                elif edge == 1:
                    ix, iy = float(maxx), sy + (ey - sy) * (maxx - sx) / (ex - sx)
                elif edge == 2:
                    ix, iy = sx + (ex - sx) * (maxy - sy) / (ey - sy), float(maxy)
                else:
                    ix, iy = float(minx), sy + (ey - sy) * (minx - sx) / (ex - sx)
                nx.append(ix)
                ny.append(iy)
            if e_in:
                nx.append(ex)
                ny.append(ey)
            sx, sy, s_in = ex, ey, e_in
        px, py = nx, ny
    if px:
        # close, then enforce the reference's >= 3 check on the CLOSED ring
        if px[0] != px[-1] or py[0] != py[-1]:
            px.append(px[0])
            py.append(py[0])
        if len(px) < 3:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        px = px[:-1]  # back to the unclosed convention
        py = py[:-1]
    if len(px) < 3:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return _round_half_away(np.array(px)), _round_half_away(np.array(py))
