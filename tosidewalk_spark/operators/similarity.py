"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
(random-hyperplane signs) variant as the 100 TB scale path.

Dot products run JVM-side via ZIP_WITH/AGGREGATE (no UDF); cosine values
are rounded to 6 decimals so the DuckDB oracle twin hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# deterministic pseudo-random hyperplanes: component j of plane p is
# sign(((p * 1009 + j) * 2654435761) % 97 - 48)  — integer arithmetic only,
# reproducible in any engine.
N_PLANES = 8


def _as_double(col: str = "embedding") -> str:
    return f"TRANSFORM({col}, x -> CAST(x AS DOUBLE))"


def _norm(v: str) -> str:
    return f"SQRT(AGGREGATE({v}, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k: every query against every corpus vector, then a
    per-query top-k window.  The correctness baseline — at production scale
    the corpus side is pre-filtered (IVF/LSH below); here Catalyst
    broadcasts the smaller side and the dot product stays in codegen."""
    c = emb.select(F.col("vec_id").alias("corpus_id"), F.col("label"),
                   F.expr(_as_double()).alias("cv"))
    c = c.withColumn("cn", F.expr(_norm("cv")))
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.expr(_as_double()).alias("qv"))
    q = q.withColumn("qn", F.expr(_norm("qv")))
    dot = F.expr("AGGREGATE(ZIP_WITH(qv, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    scored = (q.crossJoin(c)
              .filter(F.col("query_id") != F.col("corpus_id"))
              .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "label", "cosine", "rank"))


def lsh_signature_expr(v: str, n_planes: int = N_PLANES, dim: int = 64) -> str:
    """Random-hyperplane sign signature as a bigint bucket id — integer
    hyperplane construction, so Spark and DuckDB agree exactly."""
    terms = []
    for p in range(n_planes):
        coef = (f"TRANSFORM(SEQUENCE(0, {dim - 1}), j -> "
                f"CAST((({p} * 1009 + j) * 2654435761) % 97 - 48 AS DOUBLE))")
        dot = (f"AGGREGATE(ZIP_WITH({v}, {coef}, (x, c) -> x * c), "
               f"CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
        terms.append(f"CASE WHEN {dot} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def lsh_topk_multiprobe(emb: DataFrame, queries: DataFrame, k: int = 5,
                        dim: int = 64) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket PLUS the
    n_planes Hamming-1-adjacent buckets (one hyperplane sign flipped) —
    recovering most of the recall single-probe LSH loses for vectors near
    a hyperplane, at ~(P+1)x probe cost but still ~2^P below brute force
    (VERDICT.md r1 flagged single-probe recall risk).  A corpus vector
    lives in exactly one bucket and the P+1 probe buckets are distinct,
    so no pair dedup is needed."""
    sig = lsh_signature_expr("cv", dim=dim)
    c = emb.select(F.col("vec_id").alias("corpus_id"), F.col("label"),
                   F.expr(_as_double()).alias("cv"))
    c = c.withColumn("cn", F.expr(_norm("cv"))).withColumn("bucket", F.expr(sig))
    qsig = lsh_signature_expr("qv", dim=dim)
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.expr(_as_double()).alias("qv"))
    q = q.withColumn("qn", F.expr(_norm("qv"))).withColumn("qsig", F.expr(qsig))
    probes = F.array(F.col("qsig"),
                     *[F.expr(f"qsig ^ {2 ** p}") for p in range(N_PLANES)])
    q = q.withColumn("bucket", F.explode(probes))
    dot = F.expr("AGGREGATE(ZIP_WITH(qv, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    scored = (q.join(c, "bucket")
              .filter(F.col("query_id") != F.col("corpus_id"))
              .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "label", "cosine", "rank"))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             dim: int = 64) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by the hyperplane-sign
    signature, search only within the query's bucket.  The scale path: the
    cross product shrinks by ~2^n_planes; recall is traded for throughput
    (rank among bucket-mates is exact)."""
    sig = lsh_signature_expr("cv", dim=dim)
    c = emb.select(F.col("vec_id").alias("corpus_id"), F.col("label"),
                   F.expr(_as_double()).alias("cv"))
    c = c.withColumn("cn", F.expr(_norm("cv"))).withColumn("bucket", F.expr(sig))
    qsig = lsh_signature_expr("qv", dim=dim)
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.expr(_as_double()).alias("qv"))
    q = q.withColumn("qn", F.expr(_norm("qv"))).withColumn("bucket", F.expr(qsig))
    dot = F.expr("AGGREGATE(ZIP_WITH(qv, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    scored = (q.join(c, "bucket")
              .filter(F.col("query_id") != F.col("corpus_id"))
              .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "label", "bucket", "cosine", "rank"))
