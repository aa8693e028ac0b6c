"""Street-network stage tests on FIXTURES.md micro-networks."""
import numpy as np
import pytest

from tosidewalk_spark.operators import network as N
from tosidewalk_spark.sources import synth


def test_filter_streets_whitelist(spark):
    _, ways = synth.osm_grid(spark, g=4, with_noise_ways=True)
    kept = N.filter_streets(ways)
    assert kept.count() == 8  # 4 horiz + 4 vert, noise dropped
    assert kept.filter("highway IN ('footway','service')").count() == 0


def test_intersections_grid(spark):
    _, ways = synth.osm_grid(spark, g=4, with_noise_ways=False)
    inter = N.intersections(ways)
    # every grid node belongs to one horizontal + one vertical way
    assert inter.count() == 16
    assert inter.filter("n_ways != 2").count() == 0


def test_intersections_t(spark):
    _, ways = synth.micro_fixture(spark, "t_intersection")
    inter = N.intersections(ways)
    rows = inter.collect()
    assert len(rows) == 1 and rows[0].node_id == 2 and rows[0].n_ways == 3


def test_join_segmented_street(spark):
    _, ways = synth.micro_fixture(spark, "segmented_street")
    merged = N.join_segmented_ways(ways)
    rows = merged.collect()
    assert len(rows) == 1
    assert rows[0].way_id == 1
    assert rows[0].node_ids == [1, 2, 3]


def test_join_ways_no_merge_at_intersection(spark):
    # t_intersection: node 2 has 3 ways -> nothing merges
    _, ways = synth.micro_fixture(spark, "t_intersection")
    merged = N.join_segmented_ways(ways)
    assert merged.count() == 3


def test_connected_components_long_chain(spark):
    # diameter 199 >> MAX_CC_ROUNDS: the pointer-jumping rounds must
    # converge (plain min-propagation needed diameter rounds and silently
    # returned partial components — VERDICT.md r2 'What's wrong' #1)
    from pyspark.sql import functions as F
    edges = spark.range(199).selectExpr("id AS src", "id + 1 AS dst")
    comp = N.connected_components(edges)
    agg = comp.agg(F.countDistinct("component").alias("n"),
                   F.count("*").alias("c")).collect()[0]
    assert agg.n == 1 and agg.c == 200


def test_connected_components_match_union_find(spark):
    """r6: the pointer jump now goes through the PRE-round label vector
    (one checkpoint per round instead of two) — pin the converged labels
    against a driver-side union-find on a deterministic multi-component
    graph mixing chains, a star, a clique and singletonizing self-edges."""
    from pyspark.sql import functions as F
    pairs = []
    pairs += [(i, i + 1) for i in range(0, 40)]            # chain 0..40
    pairs += [(100, 100 + i) for i in range(1, 12)]        # star at 100
    pairs += [(200 + i, 200 + j) for i in range(6) for j in range(i + 1, 6)]
    pairs += [(300, 301), (301, 302), (302, 300)]          # triangle
    edges = spark.createDataFrame(pairs, "src long, dst long")
    comp = {r.id: r.component
            for r in N.connected_components(edges).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert comp == want


def test_connected_components_raises_on_non_convergence(spark):
    edges = spark.range(60).selectExpr("id AS src", "id + 1 AS dst")
    with pytest.raises(RuntimeError, match="did not converge"):
        N.connected_components(edges, max_rounds=1)


def test_join_ways_long_fragment_chain(spark):
    # 39-fragment rows (chain diameter 38, beyond the legacy 30-round
    # propagation budget) must merge back completely — VERDICT.md r2
    # 'Next round' #2
    ways = synth.segmented_grid_ways(spark, g=40)
    merged = N.join_segmented_ways(ways)
    rows = merged.collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r.node_ids) == 40
        j = r.way_id // 39
        assert r.way_id == j * 39
        assert list(r.node_ids) == [j * 40 + i for i in range(40)]


def test_split_street(spark):
    _, ways = synth.micro_fixture(spark, "split_street")
    segs = N.split_streets(ways).orderBy("way_id")
    main = segs.filter("parent_way_id = 1").orderBy("seg_no").collect()
    assert [r.node_ids for r in main] == [[1, 2], [2, 3, 4], [4, 5]]
    # stubs unsplit
    assert segs.filter("parent_way_id = 2").collect()[0].node_ids == [2, 6]


def test_split_grid_counts(spark):
    _, ways = synth.osm_grid(spark, g=4, with_noise_ways=False)
    segs = N.split_streets(ways)
    # each 4-vertex way -> 3 segments
    assert segs.count() == 8 * 3
    assert segs.filter("SIZE(node_ids) != 2").count() == 0


def test_merge_nodes(spark):
    nodes, ways = synth.micro_fixture(spark, "near_nodes")
    n2, w2 = N.merge_nodes(nodes, ways, threshold_m=5.0)
    assert n2.count() == 3  # node 3 collapsed into node 2
    rows = {r.way_id: r.node_ids for r in w2.collect()}
    assert rows[1] == [1, 2] and rows[2] == [2, 4]


def test_merge_nodes_gw_reference_position(spark):
    # R8 on the gw form (between parallel-merge and simplify, as the
    # reference orders it): ids AND inline coordinates rewrite
    nodes, ways = synth.micro_fixture(spark, "near_nodes")
    gw = N.geom_ways(nodes, ways)
    merged = N.merge_nodes_gw(gw, threshold_m=5.0)
    rows = {r.way_id: r for r in merged.collect()}
    assert rows[1].node_ids == [1, 2] and rows[2].node_ids == [2, 4]
    assert rows[2].lats[0] == rows[1].lats[1]
    assert rows[2].lngs[0] == rows[1].lngs[1]


def test_merge_nodes_noop(spark):
    nodes, ways = synth.micro_fixture(spark, "straight3")
    n2, w2 = N.merge_nodes(nodes, ways, threshold_m=5.0)
    assert n2.count() == 3 and w2.count() == 1


def test_simplify_zigzag(spark):
    nodes, ways = synth.micro_fixture(spark, "zigzag_redundant")
    slim = N.simplify_ways(nodes, ways, tol_m=0.5)
    rows = slim.collect()
    assert rows[0].node_ids == [1, 10]


def test_simplify_keeps_corner(spark):
    nodes, ways = synth.micro_fixture(spark, "bent3")
    slim = N.simplify_ways(nodes, ways, tol_m=0.5)
    assert slim.collect()[0].node_ids == [1, 2, 3]


def test_remove_short(spark):
    nodes, ways = synth.micro_fixture(spark, "shortstub")
    kept = N.remove_short_segments(nodes, ways, min_len_m=10.0)
    assert kept.count() == 0
    nodes2, ways2 = synth.micro_fixture(spark, "straight3")
    assert N.remove_short_segments(nodes2, ways2, min_len_m=10.0).count() == 1


def test_parallel_detect_and_merge(spark):
    nodes, ways = synth.micro_fixture(spark, "parallel_lanes")
    gw = N.geom_ways(nodes, ways)
    pairs = N.find_parallel_pairs(gw)
    prows = pairs.collect()
    assert len(prows) == 1
    assert {prows[0].way_a, prows[0].way_b} == {1, 2}
    assert prows[0].sep_m == pytest.approx(18.0, rel=0.05)
    merged = N.merge_parallel_pairs(gw, pairs)
    rows = merged.collect()
    assert len(rows) == 1 and rows[0].way_id == 1
    # centerline = midpoints: lng halfway between the two lanes
    lngs = np.array(rows[0].lngs)
    assert np.allclose(lngs, -122.330 + 9.0 / (111111.0 * np.cos(np.radians(47.6))), atol=1e-7)


def test_parallel_detect_ns_lng_separated(spark):
    # east-west separation straddling a res-11 cell column (ADVICE.md r1:
    # the round-1 lat-only cover silently missed these pairs)
    nodes, ways = synth.micro_fixture(spark, "parallel_lanes_ns")
    gw = N.geom_ways(nodes, ways)
    prows = N.find_parallel_pairs(gw).collect()
    assert len(prows) == 1
    assert {prows[0].way_a, prows[0].way_b} == {1, 2}
    assert prows[0].sep_m == pytest.approx(24.0, rel=0.05)


def test_parallel_ignores_perpendicular(spark):
    _, ways = synth.micro_fixture(spark, "t_intersection")
    nodes, _ = synth.micro_fixture(spark, "t_intersection")
    gw = N.geom_ways(nodes, ways)
    assert N.find_parallel_pairs(gw).count() == 0
