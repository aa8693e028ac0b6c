"""Cross-engine fuzz of the shared SQL templates: the SAME template
string evaluated by Spark and DuckDB, against the numpy kernel twin,
over seeded-random inputs.

This attacks the oracle-circularity risk from a third angle (VERDICT.md
r3 'What's wrong' #5): the fixture-based oracle pairs prove engine ==
oracle on the synthetic cities/corpora; this file proves the shared
arithmetic itself is bit-identical across all three evaluators for
RANDOM inputs — any engine-specific rounding, cast, or precedence
difference in the templates would surface here first.

Only the documented bit-identical templates are fuzzed (+-*/ sqrt and
the Horner poly-cos are IEEE exact-rounded everywhere); haversine_sql
intentionally is NOT — it uses libm SIN/ASIN whose ulp may differ, which
is why value-compared oracle queries round it or use poly-cos forms.
"""
import duckdb
import numpy as np
import pandas as pd

from tosidewalk_spark.functions import sqlfns
from tosidewalk_spark.kernel import cells, geom
from tosidewalk_spark.operators import dedup

N = 500
RNG = np.random.default_rng(20260817)


def _frame() -> pd.DataFrame:
    lat = RNG.uniform(-60, 60, N)
    lng = RNG.uniform(-179, 179, N)
    lat2 = lat + RNG.uniform(-0.02, 0.02, N)
    lng2 = lng + RNG.uniform(-0.02, 0.02, N)
    plat = lat + RNG.uniform(-0.01, 0.01, N)
    plng = lng + RNG.uniform(-0.01, 0.01, N)
    words = ["".join(RNG.choice(list("abcdefghijklmnopqrstuvwxyz0123456789 "),
                                size=RNG.integers(0, 60))) for _ in range(N)]
    return pd.DataFrame({"lat": lat, "lng": lng, "lat2": lat2, "lng2": lng2,
                         "plat": plat, "plng": plng, "s": words,
                         "i": np.arange(N, dtype=np.int64)})


EXPRS = {
    "cell9": sqlfns.cell_sql("lat", "lng", 9),
    "cell12": sqlfns.cell_sql("lat", "lng", 12),
    "par": sqlfns.parent_sql(sqlfns.cell_sql("lat", "lng", 12), 12, 7),
    "cl": sqlfns.coslat_sql("lat"),
    "eqd": sqlfns.equirect_dist_sql("lat", "lng", "lat2", "lng2"),
    "segd": sqlfns.seg_dist_sql("plat", "plng", "lat", "lng", "lat2", "lng2"),
}


def _norm(row) -> tuple:
    return tuple(repr(v) if isinstance(v, float) else int(v) for v in row)


def test_shared_templates_bit_identical_spark_duckdb_numpy(spark):
    pdf = _frame()
    sel = ", ".join(f"{e} AS {k}" for k, e in EXPRS.items())
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz")
    got_spark = [
        _norm((r.cell9, r.cell12, r.par, r.cl, r.eqd, r.segd))
        for r in spark.sql(f"SELECT {sel} FROM fuzz ORDER BY i").collect()]

    con = duckdb.connect()
    con.register("fuzz", pdf)
    got_duck = [_norm(r) for r in con.execute(
        f"SELECT {sel} FROM fuzz ORDER BY i").fetchall()]
    assert got_spark == got_duck

    # numpy kernel leg (where a twin exists)
    k_cell9 = cells.cell(pdf.lat.values, pdf.lng.values, 9)
    k_cell12 = cells.cell(pdf.lat.values, pdf.lng.values, 12)
    k_par = cells.parent(k_cell12, 7)
    k_cl = geom.coslat(pdf.lat.values)
    k_eqd = geom.equirect_m(pdf.lat.values, pdf.lng.values,
                            pdf.lat2.values, pdf.lng2.values)
    k_segd = geom.point_segment_dist_m(
        pdf.plat.values, pdf.plng.values, pdf.lat.values, pdf.lng.values,
        pdf.lat2.values, pdf.lng2.values)
    got_np = [
        _norm((int(a), int(b), int(c), float(d), float(e), float(f)))
        for a, b, c, d, e, f in zip(k_cell9, k_cell12, k_par, k_cl, k_eqd, k_segd)]
    assert got_spark == got_np


def test_hash_templates_bit_identical_spark_duckdb_python(spark):
    pdf = _frame()[["i", "s"]]
    exprs_spark = {
        "h31": sqlfns.polyhash_spark("s", mult=31),
        "h37": sqlfns.polyhash_spark("s", mult=37),
        "fp62": dedup.fingerprint62_sql("s"),
    }
    exprs_duck = {
        "h31": sqlfns.polyhash_duckdb("s", mult=31),
        "h37": sqlfns.polyhash_duckdb("s", mult=37),
        "fp62": dedup.fingerprint62_duckdb_sql("s"),
    }
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzzh")
    sel_s = ", ".join(f"{e} AS {k}" for k, e in exprs_spark.items())
    got_spark = [(r.h31, r.h37, r.fp62) for r in
                 spark.sql(f"SELECT {sel_s} FROM fuzzh ORDER BY i").collect()]

    con = duckdb.connect()
    con.register("fuzzh", pdf)
    sel_d = ", ".join(f"{e} AS {k}" for k, e in exprs_duck.items())
    got_duck = [tuple(int(x) for x in r) for r in con.execute(
        f"SELECT {sel_d} FROM fuzzh ORDER BY i").fetchall()]
    assert got_spark == got_duck

    # python kernel leg: hash63 is the base-31 fold
    def py31(s):
        return cells.hash63(s)
    for (h31, _h37, _fp), s in zip(got_spark, pdf.s.tolist()):
        assert h31 == py31(s)


def test_round4_templates_bit_identical_spark_duckdb_python(spark):
    """Fuzz the round-4-close templates: the BIN()-length log2 bucket
    (quantile sketch) over random BIGINTs including power-of-two
    boundaries, and the unrolled crossing-number polygon containment
    over random points against a fixed irregular polygon — Spark ==
    DuckDB == python on every row."""
    from tosidewalk_spark.operators import sketch, spatial

    vals = np.concatenate([
        RNG.integers(0, 2**31 - 2, 400),
        np.array([0, 1, 2, 3], dtype=np.int64),
        (2 ** RNG.integers(1, 30, 60)).astype(np.int64) - 1,
        (2 ** RNG.integers(1, 30, 36)).astype(np.int64),
    ]).astype(np.int64)
    poly = [(47.6012, -122.3417), (47.6133, -122.3291),
            (47.6066, -122.3137), (47.5933, -122.3179),
            (47.5912, -122.3368)]
    lat = RNG.uniform(47.585, 47.62, len(vals))
    lng = RNG.uniform(-122.35, -122.30, len(vals))
    pdf = pd.DataFrame({"i": np.arange(len(vals), dtype=np.int64),
                        "v": vals, "plat": lat, "plng": lng})
    exprs = {
        "bkt": sketch._log2_bucket_sql("v"),
        "inp": f"CAST({spatial.polygon_contains_sql('plat', 'plng', poly)}"
               f" AS INT)",
    }
    sel = ", ".join(f"{e} AS {k}" for k, e in exprs.items())
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz4")
    got_spark = [(r.bkt, r.inp) for r in
                 spark.sql(f"SELECT {sel} FROM fuzz4 ORDER BY i").collect()]
    con = duckdb.connect()
    con.register("fuzz4", pdf)
    got_duck = [(int(a), int(b)) for a, b in con.execute(
        f"SELECT {sel} FROM fuzz4 ORDER BY i").fetchall()]
    assert got_spark == got_duck

    def py_inside(py_, px_):
        n = len(poly); c = False
        for k in range(n):
            y1, x1 = poly[k]; y2, x2 = poly[(k + 1) % n]
            if (y1 > py_) != (y2 > py_) and \
                    px_ < x1 + (x2 - x1) * (py_ - y1) / (y2 - y1):
                c = not c
        return c

    for (bkt, inp), v, la, ln in zip(got_spark, vals, lat, lng):
        assert bkt == int(v + 1).bit_length() - 1, (v, bkt)
        assert inp == int(py_inside(la, ln)), (la, ln, inp)
    # non-vacuous: the random points straddle the polygon boundary
    assert 0 < sum(i for _, i in got_spark) < len(got_spark)


def test_round5_templates_bit_identical_spark_duckdb_python(spark):
    """Fuzz the round-5 templates.  (a) Full winnowing over TIE-DENSE
    random documents (2-letter word alphabet, plus all-identical-word
    docs where every gram hash collides): the encode/MIN-window/decode
    pipeline must agree Spark == DuckDB-oracle == a direct python
    winnower on the rightmost-min tie rule, the exact place an arg-min
    dialect difference would hide.  (b) The ccnet integer-division chain
    and the url_filter LENGTH/REPLACE substring-count identity over
    random values/strings."""
    from tosidewalk_spark.plans import registry as R

    words_pool = ["aa", "ab", "ba", "aa"]  # duplicates force hash ties
    texts = []
    for j in range(120):
        n = int(RNG.integers(0, 30))
        texts.append(" ".join(RNG.choice(words_pool, size=n)))
    texts += ["aa " * 12, "ab " * 7, "", "aa", "aa ab"]  # degenerate tails
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                        "text": [t.strip() for t in texts]})

    sdf = spark.createDataFrame(pdf)
    got_spark = {(r.doc_id, r.pos, r.gram_hash)
                 for r in dedup.winnowing(sdf, k=3, w=4).collect()}

    con = duckdb.connect()
    con.register("documents", pdf)
    got_duck = {(int(a), int(b), int(c)) for a, b, c in
                con.execute(R.o_winnowing()).fetchall()}
    assert got_spark == got_duck

    # python third leg (independent winnower, rightmost-min tie rule)
    P = 2147483647

    def h(s):
        a = 0
        for ch in s:
            a = (a * 31 + ord(ch)) % P
        return a

    want = set()
    for doc_id, t in zip(pdf.doc_id.tolist(), pdf.text.tolist()):
        ws = [x for x in t.split(" ") if x]
        grams = [h(" ".join(ws[i:i + 3])) for i in range(len(ws) - 2)]
        for s0 in range(max(len(grams) - 3, 1) if grams else 0):
            win = grams[s0:s0 + 4]
            m = min(win)
            j = max(i for i, g in enumerate(win) if g == m)
            want.add((doc_id, s0 + j + 1, m))
    assert got_spark == want
    # non-vacuous tie coverage: the all-'aa' doc selects the RIGHTMOST
    # gram of each window, so its selected positions step by one
    aa_doc = int(pdf.doc_id[pdf.text == ("aa " * 12).strip()].iloc[0])
    aa_pos = sorted(p for d, p, _ in got_spark if d == aa_doc)
    assert aa_pos == list(range(4, 11)), aa_pos

    # (b) integer-division chain + substring-count identity
    vals = pd.DataFrame({
        "i": np.arange(300, dtype=np.int64),
        "sf": RNG.integers(0, 10**15, 300),
        "nb": RNG.integers(1, 10**4, 300),
        "u": ["x" + "".join(RNG.choice(list("a7b13c"),
                                       size=RNG.integers(0, 40)))
              for _ in range(300)]})
    q = 244140625
    spark_sel = (f"(sf DIV nb) DIV {q} AS d2, "
                 f"((LENGTH(u) - LENGTH(REPLACE(u, '13', ''))) DIV 2) AS c13")
    duck_sel = (f"(sf // nb) // {q} AS d2, "
                f"((LENGTH(u) - LENGTH(REPLACE(u, '13', ''))) // 2) AS c13")
    spark.createDataFrame(vals).createOrReplaceTempView("fuzz5")
    got_s = [(r.d2, r.c13) for r in spark.sql(
        f"SELECT {spark_sel} FROM fuzz5 ORDER BY i").collect()]
    con2 = duckdb.connect()
    con2.register("fuzz5", vals)
    got_d = [(int(a), int(b)) for a, b in con2.execute(
        f"SELECT {duck_sel} FROM fuzz5 ORDER BY i").fetchall()]
    assert got_s == got_d
    for (d2, c13), sf, nb, u in zip(got_s, vals.sf, vals.nb, vals.u):
        assert d2 == (int(sf) // int(nb)) // q
        assert c13 == u.count("13")


def test_bm25_partial_bit_identical_spark_duckdb_python(spark):
    """Fuzz sqlfns.bm25_part_sql: ONE template string evaluated by Spark
    and DuckDB, against a python twin written with the SAME expression
    tree (python floats are IEEE doubles, so */ and / are exactly
    rounded identically) — any dialect difference in cast, precedence,
    or FLOOR semantics would break the exact BIGINT equality here.
    Inputs cover the saturation extremes: tf = 1 vs tf >> k1, df = 1
    (rarest) vs df = n_docs (idf numerator 0.5), dl far above/below
    avgdl, and fractional avgdl values with non-terminating binary
    expansions."""
    n_docs = 1000
    tf = RNG.integers(1, 50, 400).astype(np.int64)
    df = np.concatenate([RNG.integers(1, n_docs + 1, 396),
                         np.array([1, 1, n_docs, n_docs])]).astype(np.int64)
    dl = np.concatenate([RNG.integers(1, 500, 396),
                         np.array([1, 10000, 1, 10000])]).astype(np.int64)
    avgdl = np.concatenate([RNG.uniform(1.0, 400.0, 396),
                            np.array([3.7, 0.1, 117.31, 400.0])])
    pdf = pd.DataFrame({"tf": tf[:400], "df": df, "dl": dl,
                        "avgdl": avgdl, "n_docs": n_docs})

    tmpl = sqlfns.bm25_part_sql()
    got_spark = [r.fx for r in spark.createDataFrame(pdf)
                 .selectExpr(f"{tmpl} AS fx").collect()]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [int(x) for (x,) in
                con.execute(f"SELECT {tmpl} FROM t").fetchall()]

    import math
    want = []
    for r in pdf.itertuples():
        idf = (float(r.n_docs - r.df) + 0.5) / (float(r.df) + 0.5)
        num = float(r.tf) * 2.2
        den = float(r.tf) + 1.2 * (0.25 + 0.75 * (float(r.dl) / r.avgdl))
        want.append(math.floor(idf * num / den * 1.0e4 + 0.5))
    assert got_spark == want
    assert got_duck == want
    # non-vacuous: the quantized partials span several orders of magnitude
    assert max(want) > 100 * max(1, min(w for w in want if w > 0))
