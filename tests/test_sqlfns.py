"""Cross-engine equality: numpy kernel == Spark SQL expr == DuckDB SQL."""
import duckdb
import numpy as np
import pandas as pd

from tosidewalk_spark.functions import sqlfns
from tosidewalk_spark.kernel import cells, geom

RNG = np.random.default_rng(7)
N = 200
LAT = RNG.uniform(47.55, 47.65, N)
LNG = RNG.uniform(-122.40, -122.25, N)
LAT2 = LAT + RNG.uniform(-0.01, 0.01, N)
LNG2 = LNG + RNG.uniform(-0.01, 0.01, N)
PDF = pd.DataFrame({"lat": LAT, "lng": LNG, "lat2": LAT2, "lng2": LNG2})


def _spark_eval(spark, expr_sql, as_type):
    df = spark.createDataFrame(PDF)
    return np.array(df.selectExpr(f"{expr_sql} AS v").toPandas()["v"], dtype=as_type)


def _duck_eval(expr_sql, as_type):
    return np.array(duckdb.sql(f"SELECT {expr_sql} AS v FROM PDF").df()["v"], dtype=as_type)


def test_cell_three_way(spark):
    want = cells.cell(LAT, LNG, 9)
    expr = sqlfns.cell_sql("lat", "lng", 9)
    got_s = _spark_eval(spark, expr, np.int64)
    got_d = _duck_eval(expr, np.int64)
    assert np.array_equal(want, got_s)
    assert np.array_equal(want, got_d)


def test_parent_three_way(spark):
    c9 = cells.cell(LAT, LNG, 9)
    want = cells.parent(c9, 5)
    expr = sqlfns.parent_sql(sqlfns.cell_sql("lat", "lng", 9), 9, 5)
    assert np.array_equal(want, _spark_eval(spark, expr, np.int64))
    assert np.array_equal(want, _duck_eval(expr, np.int64))


def test_haversine_three_way(spark):
    want = geom.haversine_m(LAT, LNG, LAT2, LNG2)
    expr = sqlfns.haversine_sql("lat", "lng", "lat2", "lng2")
    got_s = _spark_eval(spark, expr, np.float64)
    got_d = _duck_eval(expr, np.float64)
    assert np.allclose(want, got_s, rtol=1e-9, atol=1e-6)
    assert np.allclose(want, got_d, rtol=1e-9, atol=1e-6)


def test_seg_dist_three_way(spark):
    # segment = (lat,lng)->(lat2,lng2); probe point = midpoint offset
    plat, plng = LAT + 1e-4, LNG - 2e-4
    want = geom.point_segment_dist_m(plat, plng, LAT, LNG, LAT2, LNG2)
    pdf = PDF.assign(plat=plat, plng=plng)
    expr = sqlfns.seg_dist_sql("plat", "plng", "lat", "lng", "lat2", "lng2")
    got_s = np.array(spark.createDataFrame(pdf).selectExpr(f"{expr} AS v").toPandas()["v"])
    got_d = np.array(duckdb.sql(f"SELECT {expr} AS v FROM pdf").df()["v"])
    assert np.allclose(want, got_s, rtol=1e-9, atol=1e-9)
    assert np.allclose(want, got_d, rtol=1e-9, atol=1e-9)


def test_polyhash_three_way(spark):
    words = pd.DataFrame({"s": ["", "a", "abc", "hello world", "Straße-ascii", "q" * 50]})
    want = np.array([cells.hash63(w) for w in words["s"]], dtype=np.int64)
    got_s = np.array(spark.createDataFrame(words)
                     .selectExpr(f"{sqlfns.polyhash_spark('s')} AS v").toPandas()["v"], dtype=np.int64)
    got_d = np.array(duckdb.sql(f"SELECT {sqlfns.polyhash_duckdb('s')} AS v FROM words").df()["v"], dtype=np.int64)
    assert np.array_equal(want, got_s)
    assert np.array_equal(want, got_d)


def test_coslat_and_equirect_bit_identical(spark):
    want_cos = geom.coslat(LAT)
    expr = sqlfns.coslat_sql("lat")
    assert np.array_equal(want_cos, _spark_eval(spark, expr, np.float64))
    assert np.array_equal(want_cos, _duck_eval(expr, np.float64))
    want_d = geom.equirect_m(LAT, LNG, LAT2, LNG2)
    dexpr = sqlfns.equirect_dist_sql("lat", "lng", "lat2", "lng2")
    assert np.array_equal(want_d, _spark_eval(spark, dexpr, np.float64))
    assert np.array_equal(want_d, _duck_eval(dexpr, np.float64))


def test_zorder_three_way(spark):
    """Morton key: numpy kernel == Spark SQL == DuckDB SQL, including the
    interleave property (z of (i,0) uses only even bit positions, (0,j)
    only odd ones) and 16-bit boundary values."""
    i = np.concatenate([RNG.integers(0, 1 << 16, 100),
                        np.array([0, 1, 65535, 32768])]).astype(np.int64)
    j = np.concatenate([RNG.integers(0, 1 << 16, 100),
                        np.array([0, 65535, 1, 32768])]).astype(np.int64)
    want = cells.zorder(i, j)
    pdf = pd.DataFrame({"i": i, "j": j})
    expr = sqlfns.zorder_sql("i", "j")
    got_s = np.array(spark.createDataFrame(pdf).selectExpr(f"{expr} AS v")
                     .toPandas()["v"], dtype=np.int64)
    got_d = np.array(duckdb.sql(f"SELECT {expr} AS v FROM pdf").df()["v"],
                     dtype=np.int64)
    assert np.array_equal(want, got_s)
    assert np.array_equal(want, got_d)
    # bit-interleave identities
    assert cells.zorder(0b101, 0) == 0b010001
    assert cells.zorder(0, 0b101) == 0b100010
    assert cells.zorder(65535, 65535) == (1 << 32) - 1
