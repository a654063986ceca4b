"""Polygon label anchors (P9) and checkerboard label repetition (P10).

Semantics follow the reference (studied, not copied):

- :func:`center_of_mass` — area-weighted ring centroid
  (centerOfMass, geometry.cpp:546-599).
- :func:`label_goodness` — how acceptable a candidate anchor is: 0 if
  outside the polygon, else its clamped distance to the nearest edge
  (label_goodness, geometry.cpp:636-686).
- :func:`polygon_to_anchor` — center of mass, then diagonal candidate
  pairs, then a coarse grid search, keeping the best-goodness point
  (polygon_to_anchor, geometry.cpp:766-945).
- :func:`checkerboard_anchors` — repeat a label anchor roughly every
  ``0.3·e^(1.2·ln z)`` tiles with odd columns offset half a period
  (checkerboard_anchors, geometry.cpp:947-1029) so long/large features
  get a label in every viewport.
"""

from __future__ import annotations

import numpy as np

from .clip import point_in_polygon


def center_of_mass(rings: list[tuple[np.ndarray, np.ndarray]]) -> tuple[float, float]:
    """Area-weighted centroid over all rings (holes contribute negative
    area via their winding)."""
    a_sum = 0.0
    cx = 0.0
    cy = 0.0
    for rx, ry in rings:
        x = np.asarray(rx, dtype=np.float64)
        y = np.asarray(ry, dtype=np.float64)
        x1 = np.roll(x, -1)
        y1 = np.roll(y, -1)
        cross = x * y1 - x1 * y
        a = cross.sum() / 2.0
        if a == 0:
            continue
        cx += float(((x + x1) * cross).sum())
        cy += float(((y + y1) * cross).sum())
        a_sum += a
    if a_sum == 0:
        # degenerate: mean of vertices
        allx = np.concatenate([np.asarray(r[0], dtype=np.float64) for r in rings])
        ally = np.concatenate([np.asarray(r[1], dtype=np.float64) for r in rings])
        return float(allx.mean()), float(ally.mean())
    return cx / (6.0 * a_sum), cy / (6.0 * a_sum)


def _dist_to_edges(rings, px: float, py: float) -> float:
    best = np.inf
    for rx, ry in rings:
        x = np.asarray(rx, dtype=np.float64)
        y = np.asarray(ry, dtype=np.float64)
        x1 = np.roll(x, -1)
        y1 = np.roll(y, -1)
        dx = x1 - x
        dy = y1 - y
        seg2 = dx * dx + dy * dy
        seg2[seg2 == 0] = 1.0
        t = np.clip(((px - x) * dx + (py - y) * dy) / seg2, 0.0, 1.0)
        qx = x + t * dx
        qy = y + t * dy
        d2 = (qx - px) ** 2 + (qy - py) ** 2
        best = min(best, float(d2.min()))
    return float(np.sqrt(best))


def label_goodness(rings, px: float, py: float, clamp: float = np.inf) -> float:
    """0 when outside the polygon; else distance to the nearest border,
    clamped (goodness ordering of geometry.cpp:636-686)."""
    inside = point_in_polygon(rings, np.array([px]), np.array([py]))[0]
    if not inside:
        return 0.0
    return min(_dist_to_edges(rings, px, py), clamp)


def polygon_to_anchor(
    rings: list[tuple[np.ndarray, np.ndarray]], grid: int = 8
) -> tuple[int, int]:
    """Best label point: center of mass if acceptable, else diagonal
    candidates between the centroid and bbox corners, else a grid search;
    highest goodness wins, ties to the earliest candidate."""
    cx, cy = center_of_mass(rings)
    best = (label_goodness(rings, cx, cy), int(round(cx)), int(round(cy)))
    if best[0] > 0:
        minx = min(float(np.min(r[0])) for r in rings)
        maxx = max(float(np.max(r[0])) for r in rings)
        miny = min(float(np.min(r[1])) for r in rings)
        maxy = max(float(np.max(r[1])) for r in rings)
        # good-enough early exit: centroid well inside
        if best[0] > 0.05 * max(maxx - minx, maxy - miny):
            return best[1], best[2]
    minx = min(float(np.min(r[0])) for r in rings)
    maxx = max(float(np.max(r[0])) for r in rings)
    miny = min(float(np.min(r[1])) for r in rings)
    maxy = max(float(np.max(r[1])) for r in rings)
    candidates = []
    for corner in ((minx, miny), (maxx, miny), (minx, maxy), (maxx, maxy)):
        for t in (0.25, 0.5, 0.75):
            candidates.append(
                (cx + (corner[0] - cx) * t, cy + (corner[1] - cy) * t)
            )
    for gx in range(1, grid):
        for gy in range(1, grid):
            candidates.append(
                (minx + (maxx - minx) * gx / grid, miny + (maxy - miny) * gy / grid)
            )
    for px, py in candidates:
        g = label_goodness(rings, px, py)
        if g > best[0]:
            best = (g, int(round(px)), int(round(py)))
    return best[1], best[2]


def checkerboard_anchors(
    minx: int, miny: int, maxx: int, maxy: int, z: int,
    anchor_x: int, anchor_y: int,
) -> list[tuple[int, int]]:
    """Repeat an anchor across a large feature's bbox on a checkerboard:
    period ≈ 0.3·e^(1.2·ln z) tiles (≥1), odd columns offset half a
    period.  Returns world-coordinate anchor points inside the bbox."""
    if z <= 0:
        return [(anchor_x, anchor_y)]
    tile_w = 1 << (32 - z)
    period_tiles = max(0.3 * np.exp(1.2 * np.log(z)), 1.0)
    period = int(period_tiles * tile_w)
    if (maxx - minx) < period and (maxy - miny) < period:
        return [(anchor_x, anchor_y)]
    out = []
    col0 = minx // period
    col1 = maxx // period + 1
    for c in range(col0, col1 + 1):
        x = c * period + (anchor_x % period)
        y_off = (period // 2) if (c % 2) else 0
        row0 = (miny - y_off) // period
        row1 = (maxy - y_off) // period + 1
        for r in range(row0, row1 + 1):
            y = r * period + y_off + (anchor_y % period)
            if minx <= x <= maxx and miny <= y <= maxy:
                out.append((x, y))
    return out or [(anchor_x, anchor_y)]
