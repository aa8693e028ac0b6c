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

# --- log2-bucket quantile sketch -------------------------------------------

def test_qsk_bucket_rule_boundaries(spark):
    """bucket = floor(log2(v + 1)) — pin the power-of-two boundaries the
    BIN()-length template must honor (v = 0 -> 0, 2^b - 1 opens bucket b,
    2^(b+1) - 2 closes it)."""
    vals = [0, 1, 2, 3, 6, 7, 14, 15, 30, 1022, 1023, 2046, 2047]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    rows = df.select("v", F.expr(sketch._log2_bucket_sql("v"))
                     .alias("b")).collect()
    for r in rows:
        assert r.b == (r.v + 1).bit_length() - 1, (r.v, r.b)


def test_qsk_quantile_bounds_vs_exact(spark):
    """The sketch answer is the lower bound of the bucket holding the true
    quantile: for every group and q, p_lo <= exact_q <= 2*p_lo + 1 with
    exact_q the true ceil(q*n)-th smallest token count (the sketch's
    stated factor-2 guarantee, checked against a python-exact twin)."""
    docs = spark.range(0, 600).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
        # token counts spread over several octaves: 1 + id%50 words
        "CONCAT_WS(' ', TRANSFORM(SEQUENCE(0, CAST(id % 50 AS INT)), "
        "x -> CONCAT('w', CAST(x AS STRING)))) AS text")
    out = {r.lang: r for r in sketch.qsk_quantiles(docs).collect()}
    import math
    counts = {"en": [], "de": []}
    for i in range(600):
        counts["en" if i % 2 == 0 else "de"].append(i % 50 + 1)
    for lang, cs in counts.items():
        cs.sort()
        r = out[lang]
        assert r.n_docs == len(cs)
        for lb, num, den in sketch.QSK_QS:
            exact = cs[math.ceil(num * len(cs) / den) - 1]
            lo = getattr(r, f"{lb}_lo")
            assert lo <= exact <= 2 * lo + 1, (lang, lb, lo, exact)


def test_qsk_counters_bounded_and_additive(spark):
    """State-bound claim: the counter table never exceeds |groups| x 32
    rows, and counters over A union B equal counters(A) + counters(B)
    cell-wise (the additivity that makes the streaming fold converge)."""
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS doc_id", "'en' AS lang",
        "CONCAT_WS(' ', TRANSFORM(SEQUENCE(0, CAST(id % 23 AS INT)), "
        "x -> 'w')) AS text")
    fold = lambda d: {(r.grp, r.bucket): r.cnt for r in
                      sketch.qsk_cells(d).groupBy("grp", "bucket")
                      .agg(F.count("*").alias("cnt")).collect()}
    a, b = fold(mk(0, 300)), fold(mk(300, 500))
    u = fold(mk(0, 500))
    assert len(u) <= 32
    for k in u:
        assert u[k] == a.get(k, 0) + b.get(k, 0), k
