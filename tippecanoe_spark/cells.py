"""Discrete-global-grid cell indexing: S2 cell ids + hexagonal binning.

The north rule asks for H3/S2 cell encoding alongside z/x/y quadkeys.

- :func:`s2_cell_id` is a from-scratch vectorized implementation of the
  public S2 geometry cell-id scheme (cube-face + quadratic ST projection +
  Hilbert curve, 64-bit ids with trailing-1 sentinel), following the
  published algorithm (s2geometry.io docs / Hilbert-curve construction).
  Ids are canonical S2CellId values.

- :func:`hex_cell` is an H3-*style* axial hexagon binning over the Web
  Mercator plane.  The real libh3 (icosahedral aperture-7) is not available
  in this environment and re-deriving its exact ids is out of scope, so this
  is a deterministic hex partitioner with the same *role* (uniform-ish area
  bins, neighbor arithmetic), clearly not libh3-compatible.

All functions are numpy-vectorized; call them from Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# --- S2 constants (public scheme) ------------------------------------------
_S2_LOOKUP_BITS = 4
_SWAP = 0x01
_INVERT = 0x02
_MAX_LEVEL = 30

_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order: (0,0) (0,1) (1,1) (1,0)
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.uint32,
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.uint32)


def _build_lookups():
    # lookup_pos[(ij << 2) | orientation] = (pos << 2) | new_orientation
    lookup_pos = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.uint32)
    lookup_ij = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.uint32)

    def init(level, i, j, orig_orient, pos, orient):
        if level == _S2_LOOKUP_BITS:
            ij = (i << _S2_LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        for sub in range(4):
            ij = int(_POS_TO_IJ[orient][sub])
            init(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orient,
                pos + sub,
                orient ^ int(_POS_TO_ORIENT[sub]),
            )

    init(0, 0, 0, 0, 0, 0)
    init(0, 0, 0, _SWAP, 0, _SWAP)
    init(0, 0, 0, _INVERT, 0, _INVERT)
    init(0, 0, 0, _SWAP | _INVERT, 0, _SWAP | _INVERT)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + 3 * (
        np.where(face == 0, x, np.where(face == 1, y, z)) < 0
    ).astype(np.int64)
    # u/v per face (S2 canonical axes)
    m0 = face == 0
    m1 = face == 1
    m2 = face == 2
    m3 = face == 3
    m4 = face == 4
    m5 = face == 5
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [m0, m1, m2, m3, m4, m5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [m0, m1, m2, m3, m4, m5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face.astype(np.int64), u, v


def _uv_to_st(u):
    # S2's quadratic projection (area-uniforming), public formula.
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s):
    return np.clip((s * (1 << _MAX_LEVEL)).astype(np.int64), 0, (1 << _MAX_LEVEL) - 1)


def s2_cell_id(lon, lat, level: int = 12) -> np.ndarray:
    """Canonical 64-bit S2CellId at ``level`` for lon/lat arrays (int64).

    Follows the public FromFaceIJ construction: 4-bit Hilbert lookup per
    step, trailing-1 sentinel marking the level.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u)).astype(np.uint64)
    j = _st_to_ij(_uv_to_st(v)).astype(np.uint64)

    n = np.asarray(face, dtype=np.uint64) << np.uint64(60)
    bits = (np.asarray(face, dtype=np.uint64) & np.uint64(_SWAP)).astype(np.uint64)
    mask = np.uint64((1 << _S2_LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _S2_LOOKUP_BITS)
        ibits = (i >> shift) & mask
        jbits = (j >> shift) & mask
        idx = (((ibits << np.uint64(_S2_LOOKUP_BITS)) | jbits) << np.uint64(2)) | bits
        looked = _LOOKUP_POS[idx.astype(np.int64)].astype(np.uint64)
        if k >= 4:
            n |= (looked >> np.uint64(2)) << np.uint64((k - 4) * 8 + 32)
        else:
            n |= (looked >> np.uint64(2)) << np.uint64(k * 8)
        bits = looked & np.uint64(3)

    # full id at level 30: n has face(3) + 60 position bits; append sentinel
    cell = (n << np.uint64(1)) | np.uint64(1)
    if level < _MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
        cell = (cell & (~(lsb - np.uint64(1))).astype(np.uint64)) | lsb
    return cell.astype(np.int64)  # may be "negative" for faces 4-5; bit pattern is canonical


def s2_level(cell_id) -> np.ndarray:
    """Level of a cell id = 30 - (trailing zero count / 2)."""
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    tz = np.zeros_like(c, dtype=np.int64)
    v = lsb.copy()
    for b in (32, 16, 8, 4, 2, 1):
        big = (v & ((np.uint64(1) << np.uint64(b)) - np.uint64(1))) == 0
        m = big & (v != 0)
        tz = np.where(m, tz + b, tz)
        v = np.where(m, v >> np.uint64(b), v)
    return (_MAX_LEVEL - tz // 2).astype(np.int64)


def s2_parent(cell_id, level: int) -> np.ndarray:
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((c & (~(lsb - np.uint64(1))).astype(np.uint64)) | lsb).astype(np.int64)


# --- H3-style hex binning ---------------------------------------------------

_SQRT3 = np.sqrt(3.0)


def hex_cell(world_x, world_y, res: int = 7) -> np.ndarray:
    """Deterministic pointy-top axial hex bin over the Web-Mercator world
    plane.  ``res`` doubles hex density per step (hex edge = 2**32 / 2**res
    / sqrt(3) world units).  Returns int64 ``(q << 32) | (r & 0xffffffff)``
    packed axial coordinates.  NOT libh3-compatible (see module docstring).
    """
    x = np.asarray(world_x, dtype=np.float64)
    y = np.asarray(world_y, dtype=np.float64)
    size = float(1 << 32) / float(1 << res) / _SQRT3
    qf = (_SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    # cube rounding
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.round(xf)
    ry = np.round(yf)
    rz = np.round(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    q = rx.astype(np.int64)
    r = rz.astype(np.int64)
    return (q << np.int64(32)) | (r & np.int64(0xFFFFFFFF))


def hex_unpack(cell) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.int64)
    q = c >> np.int64(32)
    r = (c & np.int64(0xFFFFFFFF)).astype(np.int64)
    r = np.where(r >= (1 << 31), r - (1 << 32), r)
    return q, r
