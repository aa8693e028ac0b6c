import numpy as np
import pytest

from tosidewalk_spark.kernel import geom


def test_haversine_known_value():
    # Seattle -> Portland, ~233.5 km (public geodesic calculators)
    d = geom.haversine_m(47.6062, -122.3321, 45.5152, -122.6784)
    assert d == pytest.approx(233_000, rel=0.01)


def test_haversine_zero_and_symmetry():
    assert geom.haversine_m(47.6, -122.3, 47.6, -122.3) == 0.0
    a = geom.haversine_m(47.6, -122.3, 47.7, -122.4)
    b = geom.haversine_m(47.7, -122.4, 47.6, -122.3)
    assert a == pytest.approx(b, rel=1e-12)


def test_bearing_cardinals():
    assert geom.bearing_rad(0, 0, 1, 0) == pytest.approx(0.0, abs=1e-9)          # north
    assert geom.bearing_rad(0, 0, 0, 1) == pytest.approx(np.pi / 2, abs=1e-9)    # east
    assert geom.bearing_rad(0, 0, -1, 0) == pytest.approx(np.pi, abs=1e-9)       # south


def test_latlng_offset_roundtrip():
    lat, lng = geom.latlng_offset(47.6, -122.3, 100.0, 50.0)
    d = geom.haversine_m(47.6, -122.3, lat, lng)
    assert d == pytest.approx(np.hypot(100, 50), rel=0.01)


def test_offset_polyline_straight3():
    # FIXTURES.md 'straight3': 3 collinear vertices heading north, 100 m apart
    lats = np.array([47.600, 47.6009, 47.6018])
    lngs = np.array([-122.33, -122.33, -122.33])
    llat, llng, rlat, rlng = geom.offset_polyline(lats, lngs, 4.0)
    # heading north: left = west (smaller lng), right = east
    assert np.all(llng < lngs) and np.all(rlng > lngs)
    for k in range(3):
        assert geom.haversine_m(lats[k], lngs[k], llat[k], llng[k]) == pytest.approx(4.0, rel=0.01)
        assert geom.haversine_m(lats[k], lngs[k], rlat[k], rlng[k]) == pytest.approx(4.0, rel=0.01)
    # offsets parallel: same latitudes
    assert np.allclose(llat, lats, atol=1e-9)


def test_offset_polyline_bent3_bisector():
    # FIXTURES.md 'bent3': 90-degree bend; middle offset lies on the 45-degree bisector
    lats = np.array([47.600, 47.6009, 47.6009])
    lngs = np.array([-122.33, -122.33, -122.3287])  # north then east
    llat, llng, rlat, rlng = geom.offset_polyline(lats, lngs, 4.0)
    x, y = geom.equirect_xy(llat[1], llng[1], lats[1], lngs[1])
    # travel north->east; bisector direction (1,1)/sqrt2; left normal = (-1,1)/sqrt2
    assert x == pytest.approx(-4.0 / np.sqrt(2), abs=0.05)
    assert y == pytest.approx(4.0 / np.sqrt(2), abs=0.05)


def test_crosswalk_corners_four_way():
    # 4 arms N/E/S/W -> 4 corners on diagonals at CROSSWALK_OFFSET_M
    clat, clng = 47.6009, -122.33
    arm_lats = [clat + 9e-4, clat, clat - 9e-4, clat]
    arm_lngs = [clng, clng + 1.3e-3, clng, clng - 1.3e-3]
    klat, klng, order = geom.crosswalk_corners(clat, clng, arm_lats, arm_lngs)
    assert len(klat) == 4
    for k in range(4):
        d = geom.haversine_m(clat, clng, klat[k], klng[k])
        assert d == pytest.approx(geom.CROSSWALK_OFFSET_M, rel=0.01)
        x, y = geom.equirect_xy(klat[k], klng[k], clat, clng)
        assert abs(abs(x) - abs(y)) < 0.1  # on a diagonal


def test_crosswalk_corners_degenerate_opposite_arms():
    clat, clng = 47.6, -122.33
    arm_lats = [clat, clat]
    arm_lngs = [clng - 1e-3, clng + 1e-3]  # two opposite arms (straight road)
    klat, klng, _ = geom.crosswalk_corners(clat, clng, arm_lats, arm_lngs)
    d = geom.haversine_m(clat, clng, klat, klng)
    assert np.allclose(d, geom.CROSSWALK_OFFSET_M, rtol=0.01)


def test_douglas_peucker_zigzag():
    # FIXTURES.md 'zigzag_redundant': noise below tolerance collapses to endpoints
    n = 10
    lats = 47.6 + np.arange(n) * 1e-4
    lngs = -122.33 + np.where(np.arange(n) % 2 == 0, 0.0, 1e-9)  # ~0.07 mm wiggle
    keep = geom.douglas_peucker_mask(lats, lngs, tol_m=0.5)
    assert keep[0] and keep[-1] and keep.sum() == 2
    # a real corner survives
    lats2 = np.array([47.600, 47.6005, 47.601])
    lngs2 = np.array([-122.33, -122.3295, -122.33])
    keep2 = geom.douglas_peucker_mask(lats2, lngs2, tol_m=0.5)
    assert keep2.all()


def test_point_in_polygon_square():
    poly_lats = [47.600, 47.600, 47.601, 47.601]
    poly_lngs = [-122.331, -122.330, -122.330, -122.331]
    inside = geom.point_in_polygon(
        np.array([47.6005, 47.6005, 47.6015]),
        np.array([-122.3305, -122.3315, -122.3305]),
        poly_lats, poly_lngs)
    assert inside.tolist() == [True, False, False]


def test_buffer_segment_contains_midpoint_offsets():
    alat, alng, blat, blng = 47.600, -122.33, 47.601, -122.33
    plat, plng = geom.buffer_segment(alat, alng, blat, blng, 12.0)
    mid_lat = (alat + blat) / 2
    near_lat, near_lng = geom.latlng_offset(mid_lat, alng, 5.0, 0.0)
    far_lat, far_lng = geom.latlng_offset(mid_lat, alng, 20.0, 0.0)
    assert geom.point_in_polygon([near_lat], [near_lng], plat, plng)[0]
    assert not geom.point_in_polygon([far_lat], [far_lng], plat, plng)[0]


def test_point_segment_dist():
    # point 10 m east of a north-south segment midpoint
    alat, alng, blat, blng = 47.600, -122.33, 47.601, -122.33
    plat, plng = geom.latlng_offset(47.6005, -122.33, 10.0, 0.0)
    d = geom.point_segment_dist_m(plat, plng, alat, alng, blat, blng)
    assert d == pytest.approx(10.0, rel=0.01)
    # beyond endpoint: distance to the endpoint
    plat2, plng2 = geom.latlng_offset(47.602, -122.33, 0.0, 0.0)
    d2 = geom.point_segment_dist_m(plat2, plng2, alat, alng, blat, blng)
    assert d2 == pytest.approx(geom.haversine_m(plat2, plng2, blat, blng), rel=0.01)


def test_polyline_length():
    lats = [47.600, 47.6009, 47.6018]
    lngs = [-122.33, -122.33, -122.33]
    L = geom.polyline_length_m(lats, lngs)
    assert L == pytest.approx(2 * 0.0009 * geom.M_PER_DEG, rel=1e-6)
