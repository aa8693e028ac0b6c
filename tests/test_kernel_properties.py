"""Property-based tests (hypothesis) over the pure-numpy kernel — the
arithmetic every Spark SQL template and DuckDB oracle twin mirrors.
These run without a SparkSession: invariants that must hold for ALL
inputs, not just the golden fixtures (SURVEY.md §5 test strategy).
"""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tosidewalk_spark.kernel import cells, geom

# city-scale coordinates: the engine's domain (|lat| <= 60 keeps coslat
# well-conditioned; the reference pipeline operates on city extracts)
lat_st = st.floats(min_value=-60.0, max_value=60.0,
                   allow_nan=False, allow_infinity=False)
lng_st = st.floats(min_value=-179.0, max_value=179.0,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, lat_st, lng_st)
def test_haversine_metric_properties(la1, lo1, la2, lo2):
    d = float(geom.haversine_m(la1, lo1, la2, lo2))
    assert d >= 0.0
    assert d <= np.pi * geom.EARTH_R + 1e-6          # antipodal bound
    # symmetry, exactly (the formula is symmetric in its arguments)
    assert d == float(geom.haversine_m(la2, lo2, la1, lo1))
    assert float(geom.haversine_m(la1, lo1, la1, lo1)) == 0.0


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st,
       st.floats(min_value=1.0, max_value=200.0),
       st.sampled_from([(1, 0), (0, 1), (-1, 0), (0, -1)]))
def test_latlng_offset_moves_the_right_distance(lat, lng, d, direction):
    """R10: offsetting d meters along an axis must measure ~d meters by
    the R9 haversine — the meter->degree conversion and the geodesic
    must agree to local-frame accuracy (<1% at city scale)."""
    dx, dy = direction[0] * d, direction[1] * d
    nlat, nlng = geom.latlng_offset(lat, lng, dx, dy)
    got = float(geom.haversine_m(lat, lng, nlat, nlng))
    assert abs(got - d) <= 0.01 * d + 1e-6


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lat_st, lng_st), min_size=2, max_size=20),
       st.floats(min_value=0.1, max_value=50.0))
def test_douglas_peucker_guarantee(pts, tol):
    """R17: endpoints always kept, and every DROPPED vertex lies within
    tol of the simplified polyline (the defining DP guarantee), measured
    in the same local frame the implementation uses."""
    lats = np.array([p[0] for p in pts])
    lngs = np.array([p[1] for p in pts])
    keep = geom.douglas_peucker_mask(lats, lngs, tol_m=tol)
    assert keep[0] and keep[-1]
    if keep.all():
        return
    x, y = geom.equirect_xy(lats, lngs, lats[0], lngs[0])
    kx, ky = x[keep], y[keep]
    for i in np.nonzero(~keep)[0]:
        best = np.inf
        for a in range(kx.size - 1):
            ax, ay, bx, by = kx[a], ky[a], kx[a + 1], ky[a + 1]
            mx, my = bx - ax, by - ay
            seg2 = mx * mx + my * my
            if seg2 == 0.0:
                d2 = (x[i] - ax) ** 2 + (y[i] - ay) ** 2
            else:
                t = np.clip(((x[i] - ax) * mx + (y[i] - ay) * my) / seg2, 0.0, 1.0)
                d2 = (x[i] - ax - t * mx) ** 2 + (y[i] - ay - t * my) ** 2
            best = min(best, float(d2))
        assert best <= tol * tol * (1 + 1e-9) + 1e-9


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=2, max_value=12))
def test_cell_center_reencodes_to_same_cell(lat, lng, res):
    c = cells.cell(lat, lng, res)
    clat, clng = cells.cell_center(np.array([c]))
    assert cells.cell(float(clat[0]), float(clng[0]), res) == c
    assert int(cells.cell_res(np.array([c]))[0]) == res


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=4, max_value=12),
       st.integers(min_value=1, max_value=3))
def test_parent_commutes_with_encode(lat, lng, res, up):
    """G3 rollup invariant: coarsening the fine cell equals encoding at
    the coarse resolution directly (exact — floor/shift arithmetic)."""
    fine = cells.cell(lat, lng, res)
    assert cells.parent(fine, res - up) == cells.cell(lat, lng, res - up)


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st, st.integers(min_value=1, max_value=4))
def test_ring_disk_cardinalities(lat, lng, k):
    c = cells.cell(lat, lng, 9)
    r = cells.ring(c, k)
    d = cells.disk(c, k)
    assert r.size == 8 * k and np.unique(r).size == r.size
    assert d.size == (2 * k + 1) ** 2 and np.unique(d).size == d.size
    assert set(r) <= set(d) and c in set(d)
    # disk(k) = union of rings 0..k
    union = np.concatenate([cells.ring(c, q) for q in range(k + 1)])
    assert set(union) == set(d)


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_hash63_range_and_rolling_step(s):
    h = cells.hash63(s)
    assert 0 <= h < cells.HASH_P
    if s:
        # one-step rolling property: the fold is literally a*31 + code
        assert h == (cells.hash63(s[:-1]) * 31 + ord(s[-1])) % cells.HASH_P


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st,
       st.floats(min_value=0.001, max_value=0.2),
       st.floats(min_value=0.001, max_value=0.2),
       lat_st, lng_st)
def test_point_in_polygon_rectangle(lat0, lng0, h, w, plat, plng):
    """G4 ray-cast: for an axis-aligned CCW rectangle, membership equals
    the coordinate-interval test (away from edges, where the half-open
    boundary convention is allowed to tie-break either way)."""
    poly_lats = np.array([lat0, lat0, lat0 + h, lat0 + h])
    poly_lngs = np.array([lng0, lng0 + w, lng0 + w, lng0])
    eps_la, eps_lo = 1e-9 * max(1, abs(lat0)), 1e-9 * max(1, abs(lng0))
    strict_in = (lat0 + eps_la < plat < lat0 + h - eps_la
                 and lng0 + eps_lo < plng < lng0 + w - eps_lo)
    strict_out = (plat < lat0 - eps_la or plat > lat0 + h + eps_la
                  or plng < lng0 - eps_lo or plng > lng0 + w + eps_lo)
    got = bool(geom.point_in_polygon(
        np.array([plat]), np.array([plng]), poly_lats, poly_lngs)[0])
    if strict_in:
        assert got
    elif strict_out:
        assert not got
