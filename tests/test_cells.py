import numpy as np
from tosidewalk_spark.kernel import cells


def test_cell_roundtrip_center():
    lat, lng = 47.6062, -122.3321
    c = cells.cell(lat, lng, 9)
    clat, clng = cells.cell_center(c)
    s = cells.cell_size_deg(9)
    assert abs(clat - lat) <= s and abs(clng - lng) <= s
    assert cells.cell_res(c) == 9


def test_cell_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    lats = rng.uniform(-80, 80, 100)
    lngs = rng.uniform(-179, 179, 100)
    vec = cells.cell(lats, lngs, 9)
    for k in range(100):
        assert vec[k] == cells.cell(float(lats[k]), float(lngs[k]), 9)


def test_parent_contains_child():
    c = cells.cell(47.6062, -122.3321, 9)
    p = cells.parent(c, 5)
    assert cells.cell_res(p) == 5
    clat, clng = cells.cell_center(c)
    assert cells.cell(clat, clng, 5) == p


def test_ring_disk_counts():
    c = cells.cell(47.6, -122.3, 9)
    assert len(cells.ring(c, 0)) == 1
    assert len(cells.ring(c, 1)) == 8
    assert len(cells.ring(c, 2)) == 16
    assert len(cells.disk(c, 2)) == 25
    d = set(cells.disk(c, 2).tolist())
    r = set(cells.ring(c, 0).tolist()) | set(cells.ring(c, 1).tolist()) | set(cells.ring(c, 2).tolist())
    assert d == r


def test_neighbors_are_adjacent_in_space():
    c = cells.cell(47.6, -122.3, 9)
    s = cells.cell_size_deg(9)
    for nb in cells.ring(c, 1):
        nlat, nlng = cells.cell_center(nb)
        clat, clng = cells.cell_center(c)
        assert abs(nlat - clat) <= 1.5 * s and abs(nlng - clng) <= 1.5 * s


def test_polyfill_covers_bbox():
    cover = cells.polyfill([47.600, 47.605], [-122.335, -122.330], 9)
    assert cells.cell(47.602, -122.332, 9) in set(cover.tolist())
    assert len(set(cover.tolist())) == len(cover)


def test_hash63_deterministic():
    assert cells.hash63("abc") == ((ord('a') * 31 + ord('b')) * 31 + ord('c')) % cells.HASH_P
    assert cells.hash63("") == 0
