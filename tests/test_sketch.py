"""Unit tests for the sketch operators (HLL distinct, count-min top-k):
planted-data accuracy and estimator-structure properties.  Cross-engine
identity with the DuckDB twins is covered by tests/test_oracle.py
(hll_distinct / cm_topk registry pairs)."""
import math

import pytest
from pyspark.sql import functions as F

from tosidewalk_spark.operators import sketch


def _tz(w: int) -> int:
    """python twin of _rho_sql: 1-based lowest-set-bit position, RMAX at 0."""
    if w == 0:
        return sketch._HLL_RMAX
    return (w & -w).bit_length()


def test_rho_template_matches_python(spark):
    df = spark.range(0, 5000).selectExpr("CAST(id AS BIGINT) AS w")
    rows = df.select("w", F.expr(sketch._rho_sql("w")).alias("rho")).collect()
    for r in rows:
        assert r.rho == _tz(r.w), (r.w, r.rho, _tz(r.w))


def _docs_with_vocab(spark, n_distinct: int, reps: int = 3):
    """Documents whose union vocabulary is exactly n_distinct tokens
    (tok0..tokN-1), each appearing `reps`+ times across docs."""
    return spark.range(0, n_distinct * reps).selectExpr(
        "id AS doc_id", "'en' AS lang",
        f"CONCAT('tok', CAST(id % {n_distinct} AS STRING), ' ', "
        f"'tok', CAST((id * 7) % {n_distinct} AS STRING)) AS text")


def test_hll_accuracy_large_range(spark):
    # 3000 distinct tokens >> 2.5m = 160: the raw HLL branch must engage
    # (n_hit = 64) and land within ~2 sigma (sigma = 1.04/sqrt(64) = 13%)
    out = sketch.hll_distinct(_docs_with_vocab(spark, 3000)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_hit == sketch.HLL_M  # every register hit at 3000 >> 64
    rel = abs(r.est_distinct - 3000) / 3000
    assert rel < 0.26, (r.est_distinct, rel)


def test_hll_accuracy_small_range_linear_counting(spark):
    # 40 distinct < 2.5m: the linear-counting branch engages (empty
    # registers remain) and the estimate must be close — the raw branch
    # at this range was observed ~1.9x high before LC landed
    out = sketch.hll_distinct(_docs_with_vocab(spark, 40)).collect()
    r = out[0]
    assert r.n_hit < sketch.HLL_M
    rel = abs(r.est_distinct - 40) / 40
    assert rel < 0.25, (r.est_distinct, rel)


def test_hll_estimate_deterministic_and_dup_invariant(spark):
    # duplicates never move a register: 3 reps and 9 reps of the same
    # vocabulary give the IDENTICAL sketch row
    a = sketch.hll_distinct(_docs_with_vocab(spark, 500, reps=3)).collect()
    b = sketch.hll_distinct(_docs_with_vocab(spark, 500, reps=9)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cm_topk_overestimates_and_ranks_planted_heavy(spark):
    # one token planted at 4x any other's count; sample_mod=1 makes every
    # doc a candidate source so the exact-count comparison is total
    docs = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        "CONCAT('heavy heavy heavy heavy w', CAST(id % 97 AS STRING)) AS text")
    out = sketch.cm_topk(docs, k=10, sample_mod=1).collect()
    assert out[0].token == "heavy" and out[0].rank == 1
    assert [r.rank for r in out] == list(range(1, 11))
    exact = {r.tok: r.n for r in docs.select(
        F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n")).collect()}
    for r in out:
        # count-min is one-sided: estimate >= true count, always
        assert r.est_count >= exact[r.token], (r.token, r.est_count,
                                               exact[r.token])
    assert out[0].est_count >= 4 * 400


def test_hll_lc_table_is_exact_ln():
    # the CASE lookup embeds round(m*ln(m/V)) — spot-check the endpoints
    sql = sketch._hll_final_sql("nh", "si")
    for v in (1, 32, 63):
        expected = round(sketch.HLL_M * math.log(sketch.HLL_M / v))
        assert f"WHEN {v} THEN {expected}" in sql
