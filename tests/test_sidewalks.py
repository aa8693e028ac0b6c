"""Sidewalk/crosswalk stage tests on FIXTURES.md micro-networks
(mirrors the reference's polyline-offset and network tests, BASELINE.json:6)."""
import json

import numpy as np
import pytest

from tosidewalk_spark.kernel import geom
from tosidewalk_spark.operators import network as N
from tosidewalk_spark.operators import sidewalks as SW
from tosidewalk_spark.sources import synth


def _gw(spark, name):
    nodes, ways = synth.micro_fixture(spark, name)
    return N.geom_ways(nodes, ways)


def test_make_sidewalks_straight3(spark):
    sw = SW.make_sidewalks(_gw(spark, "straight3"), offset_m=4.0).orderBy("side")
    rows = sw.collect()
    assert len(rows) == 2
    assert {r.side for r in rows} == {0, 1}
    assert rows[0].way_id == SW.SW_WAY_BASE + 2 and rows[1].way_id == SW.SW_WAY_BASE + 3
    street_lats = [47.600, 47.6009, 47.6018]
    for r in rows:
        assert len(r.node_ids) == 3
        # offset distance 4 m at every vertex, parallel (same lats)
        assert np.allclose(r.lats, street_lats, atol=1e-9)
        for k in range(3):
            d = geom.haversine_m(street_lats[k], -122.330, r.lats[k], r.lngs[k])
            assert d == pytest.approx(4.0, rel=0.01)
    # left/right on opposite sides
    assert (rows[0].lngs[0] - -122.330) * (rows[1].lngs[0] - -122.330) < 0


def test_make_sidewalks_sql_matches_pandas(spark):
    """r6: make_sidewalks was rewritten from applyInPandas to pure SQL for
    the per-session python-worker spawn cost — the SQL form must stay
    BIT-identical to the kernel-faithful pandas form on every geometry
    class (straight, bent, multi-vertex near-collinear, grid city)."""
    fixtures = ["straight3", "bent3", "zigzag_redundant", "split_street"]
    for name in fixtures:
        gw = _gw(spark, name)
        sql_rows = {r.way_id: r for r in SW.make_sidewalks(gw).collect()}
        pd_rows = {r.way_id: r for r in SW._make_sidewalks_pandas(gw).collect()}
        assert sql_rows.keys() == pd_rows.keys(), name
        for wid, a in sql_rows.items():
            b = pd_rows[wid]
            assert a.parent_way_id == b.parent_way_id and a.side == b.side
            assert list(a.node_ids) == list(b.node_ids), (name, wid)
            assert a.highway == b.highway
            # exact double equality — the whole point of the op-order mirror
            assert a.lats == b.lats, (name, wid)
            assert a.lngs == b.lngs, (name, wid)
    # grid city (the bench's buffers chain input)
    nodes, ways = synth.osm_grid(spark, g=6)
    gw = N.geom_ways(nodes, N.split_streets(N.filter_streets(ways)))
    sql_rows = {r.way_id: (list(r.node_ids), r.lats, r.lngs)
                for r in SW.make_sidewalks(gw).collect()}
    pd_rows = {r.way_id: (list(r.node_ids), r.lats, r.lngs)
               for r in SW._make_sidewalks_pandas(gw).collect()}
    assert sql_rows == pd_rows


def test_make_sidewalks_plan_has_no_python(spark):
    """The SQL rewrite's reason to exist: no python stage anywhere in the
    sidewalk synthesis plan (upstream geom_ways exchanges are unaffected)."""
    gw = _gw(spark, "bent3")
    plan = SW.make_sidewalks(gw)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                   "BatchEvalPython"):
        assert marker not in plan


def test_sidewalk_ids_deterministic_across_parallelism(spark):
    gw = _gw(spark, "bent3")
    a = {(r.way_id, tuple(r.node_ids)) for r in SW.make_sidewalks(gw.repartition(1)).collect()}
    b = {(r.way_id, tuple(r.node_ids)) for r in SW.make_sidewalks(gw.repartition(7)).collect()}
    assert a == b


def test_make_crosswalks_four_way(spark):
    nodes, ways = synth.micro_fixture(spark, "four_way")
    gw = N.geom_ways(nodes, ways)
    inter = N.intersections(ways)
    cw = SW.make_crosswalks(gw, inter)
    rows = cw.collect()
    assert len(rows) == 4  # 4 corners -> 4 ring ways
    assert all(r.intersection_node_id == 1 for r in rows)
    corners = SW.crosswalk_corner_nodes(cw).collect()
    assert len(corners) == 4
    for c in corners:
        d = geom.haversine_m(47.6009, -122.330, c.corner_lat, c.corner_lng)
        assert d == pytest.approx(geom.CROSSWALK_OFFSET_M, rel=0.02)


def test_make_crosswalks_t(spark):
    nodes, ways = synth.micro_fixture(spark, "t_intersection")
    gw = N.geom_ways(nodes, ways)
    cw = SW.make_crosswalks(gw, N.intersections(ways))
    assert cw.count() == 3  # 3 arms -> 3 corners -> 3 ring ways


def test_no_crosswalk_below_degree3(spark):
    nodes, ways = synth.micro_fixture(spark, "segmented_street")
    gw = N.geom_ways(nodes, ways)
    cw = SW.make_crosswalks(gw, N.intersections(ways))
    assert cw.count() == 0  # shared node has only 2 arms


def test_rewire_endpoints(spark):
    nodes, ways = synth.micro_fixture(spark, "four_way")
    gw = N.geom_ways(nodes, ways)
    inter = N.intersections(ways)
    segs = N.split_streets(ways, inter)
    gsegs = N.geom_ways(nodes, segs)
    sw = SW.make_sidewalks(gsegs)
    cw = SW.make_crosswalks(gw, inter)
    corners = SW.crosswalk_corner_nodes(cw)
    rewired = SW.rewire_sidewalk_endpoints(sw, corners, snap_m=8.0)
    rows = rewired.collect()
    assert len(rows) == sw.count()
    snapped = [r for r in rows
               if any(n >= SW.CW_NODE_BASE for n in r.node_ids)]
    assert len(snapped) > 0
    for r in snapped:
        # snapped endpoints carry corner coords exactly
        for pos in (0, -1):
            if r.node_ids[pos] >= SW.CW_NODE_BASE:
                d = geom.haversine_m(47.6009, -122.330, r.lats[pos], r.lngs[pos])
                assert d == pytest.approx(geom.CROSSWALK_OFFSET_M, rel=0.02)


def test_union_and_geojson(spark):
    nodes, ways = synth.micro_fixture(spark, "t_intersection")
    gw = N.geom_ways(nodes, ways)
    inter = N.intersections(ways)
    sw = SW.make_sidewalks(gw)
    cw = SW.make_crosswalks(gw, inter)
    net = SW.union_network(gw, sw, cw)
    assert net.count() == 3 + 6 + 3
    assert set(r.kind for r in net.select("kind").distinct().collect()) == {
        "street", "sidewalk", "crosswalk"}
    feats = SW.to_geojson_features(net).collect()
    f = json.loads(feats[0].feature)
    assert f["type"] == "Feature" and f["geometry"]["type"] == "LineString"
    assert len(f["geometry"]["coordinates"][0]) == 2
