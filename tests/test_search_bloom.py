"""Unit tests for the r4 third-wave operators: inverted index, tf-idf
retrieval, Bloom pre-screen dedup, per-domain top-k."""
from pyspark.sql import Window, functions as F

from tosidewalk_spark.operators import dedup, search, text


def test_inverted_index_tf_df(spark):
    d = spark.createDataFrame(
        [(1, "apple apple pear"), (2, "apple kiwi"), (3, "kiwi  kiwi")],
        "doc_id long, text string")
    rows = {(r.term, r.doc_id): (r.tf, r.df)
            for r in search.inverted_index(d).collect()}
    assert rows[("apple", 1)] == (2, 2)   # tf counts repeats, df counts docs
    assert rows[("apple", 2)] == (1, 2)
    assert rows[("pear", 1)] == (1, 1)
    assert rows[("kiwi", 3)] == (2, 2)    # double-space split yields no '' term
    assert len(rows) == 5


def test_tfidf_rare_term_outranks_common(spark):
    # 'rare' appears in one doc, 'common' in all four with equal tf:
    # idf = 1e6/df makes the rare-term doc win for a two-term query
    d = spark.createDataFrame(
        [(1, "common rare"), (2, "common x"), (3, "common y"),
         (4, "common z")],
        "doc_id long, text string")
    q = spark.createDataFrame([(7, "common"), (7, "rare")],
                              "query_id long, term string")
    top = search.tfidf_topk(d, q, k=4).orderBy("rank").collect()
    assert top[0].doc_id == 1 and top[0].n_terms_hit == 2
    # doc 1: 1e6/4 + 1e6/1 = 1250000; docs 2-4: 250000 each
    assert top[0].score_fx == 1_250_000
    assert {r.score_fx for r in top[1:]} == {250_000}
    # ties among docs 2-4 break by doc_id ascending
    assert [r.doc_id for r in top[1:]] == [2, 3, 4]


def test_tfidf_repeated_query_term_counts_once(spark):
    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    q = spark.createDataFrame([(1, "a"), (1, "a")],
                              "query_id long, term string")
    rows = search.tfidf_topk(d, q, k=1).collect()
    assert len(rows) == 1 and rows[0].n_terms_hit == 1


def test_bloom_contract_and_false_positives(spark):
    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i}") for i in range(40)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, "corpus doc 7"),      # exact dup
         (101, "genuinely new A"),
         (102, "genuinely new B")], "doc_id long, text string")
    # m_bits=8 with 40 corpus docs: essentially every bit set -> the new
    # docs are near-certain false positives; the dup must flag maybe=true
    rows = {r.doc_id: (r.bloom_maybe, r.exact_dup)
            for r in dedup.bloom_dedup(batch, corpus, m_bits=8).collect()}
    assert rows[100] == (True, True)
    # one-sided contract: bloom_maybe=false implies exact_dup=false
    assert all(maybe or not exact for maybe, exact in rows.values())
    assert any(maybe and not exact for maybe, exact in rows.values())


def test_bloom_no_false_negatives_large_m(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(200 + i, f"doc {i}") for i in range(0, 50, 7)] +
        [(300, "brand new")], "doc_id long, text string")
    rows = {r.doc_id: (r.bloom_maybe, r.exact_dup)
            for r in dedup.bloom_dedup(batch, corpus).collect()}
    # every exact dup MUST be bloom_maybe=true (no false negatives, ever)
    for doc_id, (maybe, exact) in rows.items():
        if exact:
            assert maybe, doc_id
    assert all(exact for d, (_, exact) in rows.items() if d != 300)
    # 2 x 50 positions in 2^20 bits: the new doc is ~never a false positive
    assert rows[300] == (False, False)


def test_domain_topk_matches_single_window(spark, docs_sf001=None):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    planted = docs.selectExpr(
        "doc_id",
        "CONCAT('s', CAST(doc_id % 3 AS STRING)) AS domain", "lang", "text")
    two_phase = {(r.domain, r.doc_id, r.rk)
                 for r in text.domain_topk(planted, k=4).collect()}
    q = text.quality_score(planted.select("doc_id", "lang", "text")).select(
        "doc_id", "quality")
    w = Window.partitionBy("domain").orderBy(F.desc("quality"), F.asc("doc_id"))
    single = (planted.select("domain", "doc_id").join(q, "doc_id")
              .withColumn("rk", F.row_number().over(w).cast("int"))
              .filter(F.col("rk") <= 4))
    expected = {(r.domain, r.doc_id, r.rk) for r in single.collect()}
    assert two_phase == expected and len(expected) == 12


def test_bm25_length_normalization_beats_term_stuffing(spark):
    """Two docs with the SAME tf for the query term: tf-idf scores them
    identically, BM25 ranks the shorter one first (b = 0.75 penalizes
    the padded doc).  Also pins tf saturation: 10x the tf in an
    equal-length doc buys < 10x the partial score."""
    pad = " ".join(f"pad{i}" for i in range(90))
    d = spark.createDataFrame(
        [(1, "zebra quick facts here now"),             # short, tf=1
         (2, f"zebra {pad}"),                           # long, tf=1
         (3, "zebra " * 10 + "x y z w v"),              # tf=10, short-ish
         (4, "unrelated filler content entirely")],
        "doc_id long, text string")
    q = spark.createDataFrame([(100, "zebra")], "query_id long, term string")
    r = {x.doc_id: x for x in search.bm25_topk(d, q, k=4).collect()}
    assert set(r) == {1, 2, 3}                          # doc4 never hits
    assert r[1].score_fx > r[2].score_fx                # same tf, shorter wins
    assert r[3].rank == 1                               # higher tf still wins
    # saturation: tf=10 partial < 10x the tf=1 partial at comparable length
    assert r[3].score_fx < 10 * r[1].score_fx
    # tfidf control: same tf => identical scores (what BM25 fixes)
    t = {x.doc_id: x for x in search.tfidf_topk(d, q, k=4).collect()}
    assert t[1].score_fx == t[2].score_fx


def test_bm25_multi_term_and_tie_break(spark):
    """Per-query DISTINCT terms, n_terms_hit counts matched terms, and
    exact-tie ranks break by doc_id ascending."""
    d = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple banana"), (3, "apple cherry")],
        "doc_id long, text string")
    q = spark.createDataFrame(
        [(9, "apple"), (9, "banana"), (9, "apple")],
        "query_id long, term string")
    out = sorted(search.bm25_topk(d, q, k=3).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in out] == [1, 2, 3]         # 1==2 tie -> doc_id
    assert out[0].score_fx == out[1].score_fx
    assert out[0].n_terms_hit == 2 and out[2].n_terms_hit == 1


def test_phrase_search_overlaps_chain_and_rank(spark):
    """3-term chains join consecutively; overlapping matches count each
    occurrence; ranking is (n_occur DESC, doc_id ASC)."""
    from tosidewalk_spark.operators import search
    docs = spark.createDataFrame(
        [(1, "a b c a b c"),        # "a b c" twice
         (2, "a b x a b"),          # "a b" twice, "a b c" never
         (3, "a a a"),              # overlapping "a a" twice
         (4, ""), (5, None)],
        "doc_id long, text string")
    out = [(r.doc_id, r.n_occur) for r in
           search.phrase_search(docs, ["a", "b", "c"], k=10).collect()]
    assert out == [(1, 2)]
    out2 = [(r.doc_id, r.n_occur) for r in
            search.phrase_search(docs, ["a", "b"], k=10).collect()]
    assert out2 == [(1, 2), (2, 2)]
    out3 = [(r.doc_id, r.n_occur) for r in
            search.phrase_search(docs, ["a", "a"], k=10).collect()]
    assert out3 == [(3, 2)]
