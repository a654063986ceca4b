"""Unit tests for projection + space-filling-curve kernels (SURVEY §2.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tippecanoe_spark import cells, proj


def test_world_center():
    x, y = proj.lonlat_to_world([0.0], [0.0])
    assert x[0] == 2**31 and y[0] == 2**31


def test_world_corners():
    x, y = proj.lonlat_to_world([-180.0, 180.0], [85.0511, -85.0511])
    assert x[0] == 0
    # x is NOT clamped: the reference keeps off-world longitudes raw
    # (lonlat2tile allows lon to ±360) so dateline wrapping can work
    assert x[1] == 2**32
    assert y[0] < 2**20  # near top
    assert y[1] > 2**32 - 2**20  # near bottom


def test_offworld_longitudes_stay_raw():
    # dateline fixture semantics: lon < -180 projects to negative x
    x, _ = proj.lonlat_to_world([-203.0, 190.0], [40.0, 40.0])
    assert x[0] < 0
    assert x[1] > 2**32


def test_lat_clamp_matches_reference():
    # reference clamps to +/-89.9 (projection.cpp:32-35)
    x1, y1 = proj.lonlat_to_world([0.0], [89.95])
    x2, y2 = proj.lonlat_to_world([0.0], [89.9])
    assert y1[0] == y2[0]


def test_nonfinite_pushed_off_plane():
    # reference pushes NaN/inf lon to 720 and NaN/inf lat to 89.9 —
    # both land off-plane (x beyond a world; y NEGATIVE, 0.62 worlds
    # above the top edge) so the feature vanishes from every tile
    # (projection.cpp:26-47; csv-suite nan/inf-latitude golden rows)
    x, y = proj.lonlat_to_world([np.nan], [np.nan])
    assert x[0] > 2**32 and y[0] < 0


@given(
    st.lists(st.floats(-179.9, 179.9), min_size=1, max_size=50),
    st.floats(-84.9, 84.9),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_lonlat(lons, lat):
    lons = np.array(lons)
    lats = np.full(len(lons), lat)
    x, y = proj.lonlat_to_world(lons, lats)
    lon2, lat2 = proj.world_to_lonlat(x, y)
    assert np.abs(lon2 - lons).max() < 1e-4
    assert np.abs(lat2 - lats).max() < 1e-4


def test_morton_roundtrip_and_order():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**32, 500).astype(np.uint64)
    y = rng.integers(0, 2**32, 500).astype(np.uint64)
    d = proj.morton_encode(x, y)
    x2, y2 = proj.morton_decode(d)
    assert (x2 == x).all() and (y2 == y).all()
    # tile prefix property: top 2z bits of quadkey = interleave of tile coords
    z = 6
    tx, ty = proj.tile_at(x.astype(np.int64), y.astype(np.int64), z)
    top = d >> np.uint64(2 * (32 - z))
    assert (top == proj.morton_encode(tx.astype(np.uint64), ty.astype(np.uint64))).all()


def test_hilbert_roundtrip_and_adjacency():
    rng = np.random.default_rng(8)
    x = rng.integers(0, 2**31, 500)
    y = rng.integers(0, 2**31, 500)
    d = proj.hilbert_encode(x, y)
    assert (d >= 0).all()
    x2, y2 = proj.hilbert_decode(d)
    assert (x2 == x).all() and (y2 == y).all()
    hx, hy = proj.hilbert_decode(np.arange(4096))
    assert (np.abs(np.diff(hx)) + np.abs(np.diff(hy)) == 1).all()


def test_signed_long_safe_indexes():
    xs = np.array([0, 2**32 - 1], dtype=np.int64)
    ys = np.array([0, 2**32 - 1], dtype=np.int64)
    for curve in ("quadkey", "hilbert"):
        d = proj.encode_index(xs, ys, curve=curve)
        assert (d >= 0).all(), curve


def test_bit_reverse():
    assert proj.bit_reverse64(np.array([1]))[0] == np.uint64(1) << np.uint64(63)
    v = np.array([0x123456789ABCDEF0], dtype=np.uint64)
    assert proj.bit_reverse64(proj.bit_reverse64(v))[0] == v[0]


def test_s2_levels_and_parents():
    lon = np.array([-73.99, 2.35, 139.7, -0.1])
    lat = np.array([40.74, 48.85, 35.68, -51.7])
    c12 = cells.s2_cell_id(lon, lat, 12)
    assert (cells.s2_level(c12) == 12).all()
    c5 = cells.s2_cell_id(lon, lat, 5)
    assert (cells.s2_parent(c12, 5) == c5).all()
    # distinct places → distinct cells at level 12
    assert len(set(c12.tolist())) == 4


def test_s2_face_centers():
    # (0,0) lies on face 0; its level-0 cell id is the canonical face cell
    c = cells.s2_cell_id([0.0], [0.0], 0)
    assert np.uint64(c[0]) == np.uint64(0x1000000000000000)
    # antipode on face 3
    c = cells.s2_cell_id([180.0], [0.0], 0)
    assert (np.uint64(c[0]) >> np.uint64(61)) == 3


def test_hex_cells_deterministic_and_local():
    x, y = proj.lonlat_to_world([10.0, 10.001, 60.0], [45.0, 45.001, -30.0])
    h = cells.hex_cell(x, y, 7)
    assert h[0] == h[1]  # near points share a hex at coarse res
    assert h[0] != h[2]
    h2 = cells.hex_cell(x, y, 12)
    q, r = cells.hex_unpack(h2)
    assert (cells.hex_cell(x, y, 12) == h2).all()
