"""Projection + space-filling-curve kernels (numpy, Arrow-batch friendly).

Semantics follow the reference implementation (cited for parity, not copied):

- world coordinates: the whole pipeline runs in a global integer Web-Mercator
  grid of 2**32 x 2**32 "zoom-32 pixels" (reference: projection.cpp:22-65);
  tile z/x/y coordinates are world coords right-shifted by ``32 - z``
  (reference: geometry.cpp:52-55).
- latitude is clamped to +/-89.9 degrees (reference: projection.cpp:32-35).
- quadkey = Morton interleave of the two 32-bit coords (projection.cpp:159-172);
  Hilbert is the ``-ah`` alternative (projection.cpp:106-157).

Deviation (documented): Spark's LongType is signed 64-bit, so full 64-bit
curve keys do not fit.  We compute curve keys at order 31 over ``x >> 1,
y >> 1`` which keeps every key < 2**62.  Keys are *sort/gap* keys only, so
dropping one bit of spatial precision (2 world units = 2 zoom-32 pixels)
is harmless; SURVEY.md §7 "hard parts" records this choice.

Everything here is plain numpy on arrays — called from Arrow-batched pandas
UDFs or driver-side planning code, never per row.
"""

from __future__ import annotations

import numpy as np

WORLD_BITS = 32
WORLD_SIZE = 1 << WORLD_BITS  # 2**32
CURVE_ORDER = 31  # see module docstring: signed-long-safe curve keys
MAX_LAT = 89.9

_R_EARTH = 6378137.0
_MERC_MAX = 20037508.342789244  # pi * R


def clamp_lat(lat: np.ndarray) -> np.ndarray:
    return np.clip(lat, -MAX_LAT, MAX_LAT)


def lonlat_to_world(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """Slippy-map projection into the 2**32 integer world grid.

    Mirrors lonlat2tile (reference: projection.cpp:22-65): lat clamped to
    +/-89.9; non-finite inputs pushed to the grid edge (reference pushes
    them off-plane; we clamp to the far corner so they sort last).
    Returns int64 arrays in [0, 2**32 - 1].
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = clamp_lat(np.asarray(lat, dtype=np.float64))
    # finite out-of-range longitudes are allowed out to ±360 and project
    # OFF-WORLD (x < 0 or x >= 2^32) like the reference — dateline
    # features keep their raw coordinates so the z0 duplication / twin
    # propagation can wrap them; non-finite goes far off-plane (lon 720)
    bad_lon = ~np.isfinite(lon)
    lon = np.where(bad_lon, 720.0, np.clip(lon, -360.0, 360.0))
    bad_lat = ~np.isfinite(lat)
    lat = np.where(bad_lat, MAX_LAT, lat)
    lat_r = np.radians(lat)
    n = float(WORLD_SIZE)
    x = (lon + 180.0) / 360.0 * n
    y = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    # C std::round (half away from zero), matching projection.cpp:60-61 —
    # floor here loses rate-drop order parity (the curve key differs by a
    # low bit for points that land exactly between grid lines)
    xi = _c_round(x)
    # y is NOT clamped into the world square: latitudes beyond ±85.05°
    # project off-plane (lat itself clamps at ±89.9 ⇒ y ∈ ±0.62 worlds,
    # projection.cpp:40-47) and the tile bbox check then excludes the
    # feature from every tile WITHOUT -E attribute preservation
    # (clip_to_tile quick==0, tile.cpp:974-1004) — the accumulate golden
    # depends on polar points vanishing rather than snapping to the edge.
    # Non-finite lat takes the same road (projection.cpp:29-31 sets
    # lat = 89.9): the csv-suite golden drops its nan/inf-latitude rows
    # because they land 0.62 worlds off-plane, not on the edge.
    yi = _c_round(y)
    return xi, yi


def _c_round(v: np.ndarray) -> np.ndarray:
    """C ``std::round`` — half away from zero (numpy's ``round`` is
    banker's rounding, which diverges on exact .5 values)."""
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int64)


def world_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`lonlat_to_world` (reference: projection.cpp:67-72)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = float(WORLD_SIZE)
    lon = x / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    return lon, lat


def epsg3857_to_world(mx, my) -> tuple[np.ndarray, np.ndarray]:
    """Linear rescale of EPSG:3857 meters (reference: projection.cpp:74-94)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    n = float(WORLD_SIZE)
    x = (mx + _MERC_MAX) / (2.0 * _MERC_MAX) * n
    y = (_MERC_MAX - my) / (2.0 * _MERC_MAX) * n
    xi = np.clip(_c_round(x).astype(np.float64), 0, n - 1).astype(np.int64)
    yi = np.clip(_c_round(y).astype(np.float64), 0, n - 1).astype(np.int64)
    return xi, yi


def tile_at(x, y, z: int) -> tuple[np.ndarray, np.ndarray]:
    """World coords → tile x/y at zoom z (reference: geometry.cpp:52-55)."""
    shift = WORLD_BITS - z
    return (
        np.asarray(x, dtype=np.int64) >> shift,
        np.asarray(y, dtype=np.int64) >> shift,
    )


# ---------------------------------------------------------------------------
# Morton (quadkey) interleave — magic-number bit spread, fully vectorized.
# Semantics of encode_quadkey (reference: projection.cpp:159-172).
# ---------------------------------------------------------------------------

def _spread_u32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unspread_u64(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(x, y) -> np.ndarray:
    """Interleave two coords (x bits even, y bits odd) → uint64 quadkey."""
    return _spread_u32(np.asarray(x)) | (_spread_u32(np.asarray(y)) << np.uint64(1))


def morton_decode(d) -> tuple[np.ndarray, np.ndarray]:
    d = np.asarray(d, dtype=np.uint64)
    return _unspread_u64(d), _unspread_u64(d >> np.uint64(1))


def quadkey_index(x, y) -> np.ndarray:
    """Signed-long-safe Morton index at order 31 (world coords >> 1).
    X occupies the HIGH bit of each 2-bit pair, matching the reference's
    encode_quadkey (projection.cpp:159-172: ``v = (x_bit << 1) | y_bit``)
    so the global feature order — and therefore rate-drop selection —
    agrees with tippecanoe."""
    x = np.asarray(x, dtype=np.int64) >> 1
    y = np.asarray(y, dtype=np.int64) >> 1
    return morton_encode(y, x).astype(np.int64)


# ---------------------------------------------------------------------------
# Hilbert curve — vectorized iterative rotate/flip, order 31.
# Semantics of hilbert_xy2d / hilbert_d2xy (reference: projection.cpp:106-157).
# ---------------------------------------------------------------------------

def hilbert_encode(x, y, order: int = CURVE_ORDER) -> np.ndarray:
    """(x, y) in [0, 2**order) → Hilbert distance d < 2**(2*order), int64-safe
    for order <= 31."""
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    one = np.uint64(1)
    for i in range(order - 1, -1, -1):
        s = np.uint64(1) << np.uint64(i)
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
    return d.astype(np.int64)


def hilbert_decode(d, order: int = CURVE_ORDER) -> tuple[np.ndarray, np.ndarray]:
    d = np.asarray(d, dtype=np.uint64).copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    one = np.uint64(1)
    for i in range(order):
        s = np.uint64(1) << np.uint64(i)
        rx = (d // np.uint64(2)) & one
        ry = (d ^ rx) & one
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x = x + s * rx
        y = y + s * ry
        d = d >> np.uint64(2)
    return x.astype(np.int64), y.astype(np.int64)


def hilbert_index(x, y) -> np.ndarray:
    """Signed-long-safe Hilbert index of world coords (order 31 on >>1)."""
    return hilbert_encode(
        np.asarray(x, dtype=np.int64) >> 1,
        np.asarray(y, dtype=np.int64) >> 1,
    )


def encode_index(x, y, curve: str = "quadkey") -> np.ndarray:
    """Spatial sort key of a representative point (serial.cpp:686-724 uses
    quadkey by default; ``-ah`` selects Hilbert, main.cpp:3682-3688)."""
    if curve == "hilbert":
        return hilbert_index(x, y)
    return quadkey_index(x, y)


def decode_index(d, curve: str = "quadkey") -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_index` → world (x, y) (the reference's
    decode_index, projection.cpp:174-196, used by the tile stream's
    planar-gap computation tile.cpp:1186).  Bit 0 of each world coord is
    lost to the signed-safe order-31 encoding — one world unit, far
    below any meaningful gap."""
    if curve == "hilbert":
        x, y = hilbert_decode(d)
    else:
        y, x = morton_decode(d)
    return x << 1, y << 1


def bit_reverse64(v) -> np.ndarray:
    """64-bit bit reversal (reference: text.cpp:319) — drop-sequence priority."""
    v = np.asarray(v, dtype=np.uint64)
    v = ((v >> np.uint64(1)) & np.uint64(0x5555555555555555)) | ((v & np.uint64(0x5555555555555555)) << np.uint64(1))
    v = ((v >> np.uint64(2)) & np.uint64(0x3333333333333333)) | ((v & np.uint64(0x3333333333333333)) << np.uint64(2))
    v = ((v >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)) | ((v & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4))
    v = ((v >> np.uint64(8)) & np.uint64(0x00FF00FF00FF00FF)) | ((v & np.uint64(0x00FF00FF00FF00FF)) << np.uint64(8))
    v = ((v >> np.uint64(16)) & np.uint64(0x0000FFFF0000FFFF)) | ((v & np.uint64(0x0000FFFF0000FFFF)) << np.uint64(16))
    v = (v >> np.uint64(32)) | (v << np.uint64(32))
    return v
