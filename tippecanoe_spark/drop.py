"""Density / size dropping, clustering, and attribute accumulation —
T8-T16 + T33 of SURVEY §2.4.

All kernels operate on index-ordered per-tile arrays (the sequential
semantics of tile.cpp's write_tile loop: gap thinning, clustering and the
as-needed drops walk features in space-filling-curve order).  Threshold
*selection* is a quantile over sampled gaps/extents (choose_mingap /
choose_minextent, tile.cpp:754-857), monotone-bumped so zoom retries only
tighten (tile.cpp:3506-3571 feedback loop).
"""

from __future__ import annotations

import numpy as np

from . import proj

# dropped-state markers (serial.hpp:146-153 roles, simplified)
KEPT, DROPPED = 0, 1


def gaps_in_index_order(index: np.ndarray) -> np.ndarray:
    """gap[i] = curve-key distance to the previous feature in index order
    (the density signal of tile.cpp:1180-1199, computed on curve keys
    rather than squared planar distance — monotone-equivalent for
    thinning)."""
    index = np.asarray(index, dtype=np.int64)
    g = np.empty(len(index), dtype=np.float64)
    if len(index):
        g[0] = np.inf
        g[1:] = np.diff(index).astype(np.float64)
    return g


def planar_gaps(
    index: np.ndarray,
    geoms: np.ndarray,
    ox: int,
    oy: int,
    upshift: int,
    curve: str = "quadkey",
) -> np.ndarray:
    """The reference's exact per-tile gap signal (tile.cpp:1180-1199):
    gap[i] = MAX over feature i's vertices of the squared planar world
    distance to decode_index(previndex), where previndex is the previous
    streamed feature's curve key (starting at 0 — the world origin).  A
    feature at the same curve key as its predecessor keeps gap 0 (the
    duplicate is the first to thin).

    ``geoms`` are prepared tile-local (op, x, y) command tuples; px →
    world is ``ox + (px << upshift)`` (negative upshift for z + detail >
    32), so vertices carry the grid quantization — ≤ one px cell, noise
    relative to any density worth thinning."""
    from .proj import decode_index

    index = np.asarray(index, dtype=np.int64)
    n = len(index)
    g = np.zeros(n, dtype=np.float64)
    if n == 0:
        return g
    prev = np.empty(n, dtype=np.int64)
    prev[0] = 0
    prev[1:] = index[:-1]
    px_prev, py_prev = decode_index(prev, curve)

    def to_world(xs, ys):
        if upshift >= 0:
            return ox + (xs << upshift), oy + (ys << upshift)
        return ox + (xs >> -upshift), oy + (ys >> -upshift)

    # vectorized first-vertex distance (points — the overwhelming
    # majority — are done here); multi-vertex features refine below
    nv = np.fromiter((len(c) for c in geoms), dtype=np.int64, count=n)
    fx = np.fromiter(
        (c[0][1] if len(c) else 0 for c in geoms), dtype=np.int64, count=n
    )
    fy = np.fromiter(
        (c[0][2] if len(c) else 0 for c in geoms), dtype=np.int64, count=n
    )
    wx, wy = to_world(fx, fy)
    dx = px_prev.astype(np.float64) - wx
    dy = py_prev.astype(np.float64) - wy
    d2 = dx * dx + dy * dy
    multi = np.flatnonzero(nv > 1)
    if len(multi):
        # one flat vertex sweep + segment-max, no per-feature arrays
        from itertools import chain

        counts = np.fromiter(
            (sum(1 for c in geoms[i] if c[0] != 7) for i in multi),
            dtype=np.int64,
            count=len(multi),
        )
        ok = counts > 0
        multi, counts = multi[ok], counts[ok]
        if len(multi):
            total = int(counts.sum())
            xs = np.fromiter(
                chain.from_iterable(
                    (c[1] for c in geoms[i] if c[0] != 7) for i in multi
                ),
                dtype=np.int64,
                count=total,
            )
            ys = np.fromiter(
                chain.from_iterable(
                    (c[2] for c in geoms[i] if c[0] != 7) for i in multi
                ),
                dtype=np.int64,
                count=total,
            )
            vx, vy = to_world(xs, ys)
            fidx = np.repeat(np.arange(len(multi)), counts)
            ddx = px_prev[multi].astype(np.float64)[fidx] - vx
            ddy = py_prev[multi].astype(np.float64)[fidx] - vy
            starts = np.zeros(len(multi), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            d2[multi] = np.maximum.reduceat(ddx * ddx + ddy * ddy, starts)
    moved = (index != prev) & (nv > 0)
    g[moved] = d2[moved]
    return g


def gamma_thin(gap: np.ndarray, gamma: float, base_gap: float) -> np.ndarray:
    """Gamma micro-duplicate thinning (manage_gap, tile.cpp:720-750):
    keep a feature only if its gap to the previously *kept* feature
    exceeds base_gap**(1/gamma) — a running-accumulator scan."""
    n = len(gap)
    keep = np.ones(n, dtype=bool)
    if gamma <= 0.0 or n == 0:
        return keep
    threshold = float(base_gap) ** (1.0 / gamma) if base_gap > 0 else 0.0
    acc = np.inf
    for i in range(n):
        acc = gap[i] if np.isinf(gap[i]) else acc + gap[i]
        if acc >= threshold:
            keep[i] = True
            acc = 0.0
        else:
            keep[i] = False
    return keep


def drop_by_gap(gap: np.ndarray, mingap: float) -> np.ndarray:
    """Densest-as-needed (T11): drop features whose accumulated gap to the
    previous kept feature is below mingap (tile.cpp:2020-2064)."""
    n = len(gap)
    keep = np.ones(n, dtype=bool)
    if mingap <= 0 or n == 0:
        return keep
    acc = np.inf
    for i in range(n):
        acc = gap[i] if np.isinf(gap[i]) else acc + gap[i]
        if acc >= mingap:
            keep[i] = True
            acc = 0.0
        else:
            keep[i] = False
    return keep


def drop_by_extent(extent: np.ndarray, minextent: float) -> np.ndarray:
    """Smallest-as-needed (T12, tile.cpp:2065-2088)."""
    return np.asarray(extent, dtype=np.float64) > float(minextent)


def drop_sequence(feature_minzoom: np.ndarray, index: np.ndarray) -> np.ndarray:
    """Stable pseudo-random drop priority (T13): ~(minzoom<<59 |
    bit_reverse(index)) — calculate_drop_sequence, tile.cpp:859-864.
    Higher value = dropped earlier."""
    mz = np.minimum(np.asarray(feature_minzoom, dtype=np.uint64), np.uint64(31))
    ix = np.asarray(index, dtype=np.int64).astype(np.uint64)
    seq = ~(
        (mz << np.uint64(59))
        | (proj.bit_reverse64(ix) & ~(np.uint64(31) << np.uint64(59)))
    )
    return seq.astype(np.int64)


def drop_by_sequence(seq: np.ndarray, minseq: float) -> np.ndarray:
    """Fraction-as-needed (tile.cpp:2089-2109): keep features whose drop
    sequence is above the threshold."""
    return np.asarray(seq, dtype=np.float64) > float(minseq)


def drop_by_attribute(
    values: np.ndarray, threshold: float, descending: bool
) -> np.ndarray:
    """Drop-by-attribute-as-needed (T14, tile.cpp:2110-2144)."""
    v = np.asarray(values, dtype=np.float64)
    return v < threshold if descending else v > threshold


def choose_mingap(
    gap: np.ndarray, fraction_to_keep: float, previous: float
) -> float:
    """Threshold for the ACCUMULATING gap drop (:func:`drop_by_gap`):
    gaps accumulate until they reach mingap, so the kept count is
    ≈ (total index span) / mingap — NOT the quantile count.  Target
    mingap = span / target_keep, monotone-bumped past the previous
    threshold (choose_mingap, tile.cpp:754-795 semantics)."""
    finite = gap[np.isfinite(gap)]
    n = len(gap)
    if n == 0 or len(finite) == 0:
        return previous
    span = float(finite.sum())
    target = max(n * min(max(fraction_to_keep, 0.0), 1.0), 1.0)
    q = span / target
    if q <= previous:
        q = previous * 1.25 + 1e-9 if previous > 0 else q + 1e-9
    return q


def choose_sorted_threshold(
    sample: np.ndarray, fraction_to_keep: float, existing: float
) -> float:
    """The reference's exact chooser (choose_mingap / choose_minextent /
    choose_mindrop_sequence, tile.cpp:754-800): sort the sampled values
    ascending, take element ``(n-1)·(1-f)`` (size_t truncation), then
    bump the index past values <= the existing threshold so retries only
    tighten.  The survivor gate is ``value > threshold``."""
    s = np.sort(np.asarray(sample, dtype=np.float64))
    s = s[np.isfinite(s)]
    n = len(s)
    if n == 0:
        return existing
    ix = int((n - 1) * (1.0 - min(max(fraction_to_keep, 0.0), 1.0)))
    while ix + 1 < n and s[ix] <= existing:
        ix += 1
    return float(s[ix])


def choose_threshold(
    sample: np.ndarray, fraction_to_keep: float, previous: float
) -> float:
    """Quantile threshold chooser (choose_mingap/minextent,
    tile.cpp:754-857): pick the value below which (1 - fraction_to_keep)
    of the sample falls, monotone-bumped past the previous threshold so
    retries only tighten."""
    s = np.asarray(sample, dtype=np.float64)
    s = s[np.isfinite(s)]
    if len(s) == 0:
        return previous
    q = float(np.quantile(s, min(max(1.0 - fraction_to_keep, 0.0), 1.0)))
    if q <= previous:
        q = previous * 1.25 + 1e-9 if previous > 0 else float(s.max()) * 0.01 + 1e-9
    return q


# ---------------------------------------------------------------------------
# clustering (T10) — sequential in index order, running centroid
# ---------------------------------------------------------------------------

def cluster_points(
    x: np.ndarray, y: np.ndarray, cluster_dist2: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Greedy index-order clustering (tile.cpp:1993-2050): each feature
    within sqrt(cluster_dist2) of the current cluster lead merges into it;
    the lead's position becomes the running centroid average.

    Returns (lead_of: int64 cluster-lead position for every input,
    cx, cy: final centroid per input position — valid at lead positions,
    count: cluster size at lead positions)."""
    n = len(x)
    lead_of = np.arange(n, dtype=np.int64)
    cx = np.asarray(x, dtype=np.float64).copy()
    cy = np.asarray(y, dtype=np.float64).copy()
    count = np.ones(n, dtype=np.int64)
    cur = -1
    for i in range(n):
        if cur >= 0:
            dx = cx[i] - cx[cur]
            dy = cy[i] - cy[cur]
            if dx * dx + dy * dy <= cluster_dist2:
                lead_of[i] = cur
                count[cur] += 1
                # running centroid average (tile.cpp:2002-2012)
                cx[cur] += (cx[i] - cx[cur]) / count[cur]
                cy[cur] += (cy[i] - cy[cur]) / count[cur]
                continue
        cur = i
    return lead_of, cx, cy, count


def cluster_stream(
    index: np.ndarray,
    layer: np.ndarray,
    gt: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    mingap: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Reference-faithful -K clustering over the full tile stream
    (tile.cpp:1993-2027, 2311): a feature whose 1D index gap to the
    previous KEPT feature (``merge_previndex`` — merged features
    ``continue`` before the update at tile.cpp:2311, so only features
    that fall through set it) is below ``cluster_mingap`` merges onto
    the most recent kept feature of the same (layer, geom-type)
    (find_feature_to_accumulate_onto, tile.cpp:1576-1590).  The lead's
    position becomes the running centroid, truncated to integer at
    every step (the reference assigns the double mean back into a
    long long world coordinate, tile.cpp:2006-2012).

    Inputs are the tile's features in (index, seq) stream order; x/y are
    single-point coordinates (ignored for non-points).  Returns
    (lead_of, cx, cy, count) in the cluster_points contract."""
    n = len(index)
    lead_of = np.arange(n, dtype=np.int64)
    cx = np.asarray(x, dtype=np.float64).copy()
    cy = np.asarray(y, dtype=np.float64).copy()
    count = np.ones(n, dtype=np.int64)
    last_kept: dict[tuple, int] = {}
    merge_prev = 0
    for i in range(n):
        idx = int(index[i])
        merged = False
        if idx < merge_prev or idx - merge_prev < mingap:
            j = last_kept.get((layer[i], gt[i]))
            if j is not None:
                lead_of[i] = j
                count[j] += 1
                if gt[i] == 1:
                    # per-step truncating running mean (tile.cpp:2006-2012)
                    cx[j] = float(int(
                        (cx[j] * (count[j] - 1) + cx[i]) / count[j]
                    ))
                    cy[j] = float(int(
                        (cy[j] * (count[j] - 1) + cy[i]) / count[j]
                    ))
                merged = True
        if not merged:
            last_kept[(layer[i], gt[i])] = i
            merge_prev = idx
    return lead_of, cx, cy, count


def point_count_abbreviated(n: int) -> str:
    """Cluster size label: 1.2k / 3.4M style (tile.cpp:2420-2451)."""
    if n >= 10_000_000:
        return f"{n // 1_000_000}M"
    if n >= 1_000_000:
        return f"{n / 1_000_000:.1f}M"
    if n >= 10_000:
        return f"{n // 1000}k"
    if n >= 1_000:
        return f"{n / 1000:.1f}k"
    return str(n)


# ---------------------------------------------------------------------------
# attribute accumulation (T33, attribute.cpp:92-188)
# ---------------------------------------------------------------------------

def accumulate_attribute(op: str, values: list[str]) -> str:
    """Fold dropped-feature attribute values onto the survivor.  ``mean``
    carries (sum, count) like the reference's packed partial aggregate
    (serial.hpp:74-86) — here values arrive complete per group so the mean
    is direct.  Numeric parsing mirrors serial_val's everything-is-a-
    string representation."""
    # strip the serial_val string-type tag (sources/geojson.py) — the
    # accumulation sees the raw content either way.  mvt_null values
    # (NULL_TAG) never contribute (the nulls golden: the mean is over
    # the non-null members only)
    values = [
        v[1:] if v.startswith("\x02") else v
        for v in values
        if not v.startswith("\x00")
    ]
    if not values:
        return None
    if op == "count":
        return str(len(values))
    if op == "concat":
        # string ops stay mvt_string even when the result looks numeric
        from .mvt import ForcedString

        return ForcedString("".join(values))
    if op == "comma":
        from .mvt import ForcedString

        return ForcedString(",".join(values))
    nums = np.array([float(v) for v in values], dtype=np.float64)
    if op == "sum":
        out = float(nums.sum())
    elif op == "product":
        out = float(nums.prod())
    elif op == "mean":
        out = float(nums.mean())
    elif op == "max":
        out = float(nums.max())
    elif op == "min":
        out = float(nums.min())
    else:
        raise ValueError(f"unknown accumulate op {op!r}")
    if out == int(out):
        return str(int(out))
    return repr(out)
