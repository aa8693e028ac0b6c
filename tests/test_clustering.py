"""Unit tests for fixed-point k-means (operators/clustering.py)."""
from tosidewalk_spark.operators import clustering

S = clustering.KM_SCALE


def _emb(spark, rows):
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")


def test_kmeans_separates_blobs_exact_dist(spark):
    # two obvious blobs, seeds 0/1 land one in each: converged after one
    # round, so every later round returns the identical assignment
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]),
            (2, [0.0, 0.5]), (3, [10.0, 9.5])]
    out = {r.vec_id: r for r in clustering.kmeans_assign(
        _emb(spark, rows), k=2, n_iter=1).collect()}
    assert out[0].cluster_id == out[2].cluster_id == 0
    assert out[1].cluster_id == out[3].cluster_id == 1
    # centroid A = mean((0,0),(0,0.5)) = (0, 0.25) -> (0, 250000) in
    # fixed point; dist(v0) = 250000^2 exactly
    assert out[0].dist_fx == 250_000 ** 2
    assert out[2].dist_fx == 250_000 ** 2
    for k in (2, 3):
        again = {r.vec_id: r.cluster_id for r in clustering.kmeans_assign(
            _emb(spark, rows), k=2, n_iter=k).collect()}
        assert again == {i: out[i].cluster_id for i in out}


def test_kmeans_tie_breaks_to_smaller_cluster_and_empty_keeps_centroid(spark):
    # identical seeds: every point ties between c0 and c1 in round 1 and
    # the struct-min sends them all to cluster 0; cluster 1 keeps its
    # (identical) centroid via the COALESCE fallback instead of vanishing
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])]
    out = {r.vec_id: r for r in clustering.kmeans_assign(
        _emb(spark, rows), k=2, n_iter=1).collect()}
    assert len(out) == 3
    # after round 1: c0 = mean of all three = (1/3, 1/3), c1 still (0,0);
    # the final assignment pulls the two zero-vectors to cluster 1
    assert out[0].cluster_id == 1 and out[1].cluster_id == 1
    assert out[0].dist_fx == 0
    assert out[2].cluster_id == 0


def test_semantic_dedup_groups_planted_copies(spark):
    # planted EXACT copies: identical vectors land in the same cluster by
    # the deterministic argmin (distances equal component-wise), share
    # every LSH bucket, and have cosine exactly 1.0 — each (orig, copy)
    # pair must share a group, the orig (min vec_id) is kept, the copy
    # dropped; group representatives are unique
    from pyspark.sql import functions as F
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    copies = emb.filter("vec_id % 10 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "embedding")
    out = {r.vec_id: r for r in clustering.semantic_dedup(
        emb.unionByName(copies), k=4, n_iter=2,
        cos_threshold=0.9).collect()}
    n = len(out)
    assert n == emb.count() + copies.count()
    orig_ids = [i for i in out if i < 100000]
    for i in orig_ids:
        if i % 10 == 0:
            assert out[i + 100000].group_id == out[i].group_id == i
            assert out[i].keep and not out[i + 100000].keep
    # keep-set = one representative per group
    groups = {}
    for r in out.values():
        groups.setdefault(r.group_id, []).append(r)
    for g, members in groups.items():
        assert sum(m.keep for m in members) == 1
        assert min(m.vec_id for m in members) == g


def test_kmeans_every_vector_assigned_once(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = clustering.kmeans_assign(emb, k=8, n_iter=2)
    n = emb.count()
    got = out.collect()
    assert len(got) == n
    assert len({r.vec_id for r in got}) == n
    assert all(0 <= r.cluster_id < 8 and r.dist_fx >= 0 for r in got)
