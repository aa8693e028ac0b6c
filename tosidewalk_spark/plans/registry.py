"""Query + DuckDB-oracle registry backing __spark_entry__.py.

Every SQL-expressible operator from SURVEY.md §2 gets a (Spark query,
DuckDB oracle) pair over the driver's read-only tables (documents,
embeddings, events, lineitem).  Design rules that make the driver's
row-count + schema + value-hash comparison pass:

- shared arithmetic: both sides evaluate the SAME template strings from
  functions/sqlfns.py (cell ids, haversine, seg-dist, polynomial hash);
- compared float columns are ROUND-ed in the query itself (6 decimals for
  geometry degrees/cosines, 4 for meters) so last-ulp libm differences
  between the JVM, numpy and DuckDB cannot flip the hash;
- ties in every row_number window are broken by a deterministic column;
- id-scheme-dependent columns are never compared — geometry keys
  (rounded midpoints) identify segments instead.

The geospatial queries run the REAL engine operators (split_streets,
make_sidewalks, street_buffers, pip_join, knn_join, coverage_tiles) on the
deterministic grid city; the oracle reproduces their closed-form geometry
relationally from range() — axis-aligned streets make the buffers exact
bboxes and the sidewalk offsets pure +-constant shifts, so the oracle is
simple while the engine path exercises the full UDF machinery.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import sqlfns
from ..kernel import geom
from ..operators import (dedup, network as N, sidewalks as SW, sketch,
                         spatial as SP, text)
from ..sources import synth

G = 8  # grid size for oracle-checked geospatial queries
LAT_STEP = synth.LAT_STEP
LNG_STEP = synth.LNG_STEP
CITY_LAT = synth.CITY_LAT
CITY_LNG = synth.CITY_LNG
OFF_M = geom.SIDEWALK_OFFSET_M
HW = geom.BUFFER_HALF_WIDTH_M
# bbox (+small margin) keeping kNN ring expansion short and both engines identical
LAT_LO = sqlfns.dlit(CITY_LAT - 0.0002)
LAT_HI = sqlfns.dlit(CITY_LAT + (G - 1) * LAT_STEP + 0.0002)
LNG_LO = sqlfns.dlit(CITY_LNG - 0.0002)
LNG_HI = sqlfns.dlit(CITY_LNG + (G - 1) * LNG_STEP + 0.0002)


# temp dirs created by fixture-building queries (catalog warehouses, WARC/
# JSONL round-trip shards, the staged-run output).  ADVICE r4: plain
# mkdtemp leaked full snapshot copies of the points/docs tables to /tmp on
# every correctness/audit run.  The returned DataFrames read these files
# LAZILY (the driver collects after the query function returns), so the
# earliest safe cleanup point is interpreter exit — register one atexit
# sweep and route every mkdtemp through it.
_TMP_DIRS: list = []


def _tmp_dir(prefix: str) -> str:
    import atexit
    import shutil
    import tempfile
    if not _TMP_DIRS:
        atexit.register(lambda: [shutil.rmtree(p, ignore_errors=True)
                                 for p in list(_TMP_DIRS)])
    p = tempfile.mkdtemp(prefix=prefix)
    _TMP_DIRS.append(p)
    return p


# --------------------------------------------------------------------------
# shared builders — Spark side
# --------------------------------------------------------------------------

def _points(spark: SparkSession, sf_dir: str, bbox: bool = False) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = synth.geo_entities_from_documents(docs)
    if bbox:
        pts = pts.filter(
            f"lat > {LAT_LO} AND lat < {LAT_HI} AND lng > {LNG_LO} AND lng < {LNG_HI}")
    return pts


_SEGMENT_CACHE: dict[int, DataFrame] = {}


def _grid_sidewalk_segments(spark: SparkSession) -> DataFrame:
    """Engine path: grid -> R1 filter -> R5 split -> R12/R13 sidewalks ->
    per-edge segments.  (No way-join / parallel-merge here: the oracle's
    closed form needs the plain grid; the full pipeline is exercised by
    entry() and pytest.)  Persisted once per session — several registry
    queries share this fixed build side."""
    key = id(spark)
    if key not in _SEGMENT_CACHE:
        nodes, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
        streets = N.filter_streets(ways)
        segs = N.split_streets(streets)
        gw = N.geom_ways(nodes, segs)
        sw = SW.make_sidewalks(gw, offset_m=OFF_M)
        cached = SP.street_segments(sw).persist()
        cached.count()
        _SEGMENT_CACHE.clear()
        _SEGMENT_CACHE[key] = cached
    return _SEGMENT_CACHE[key]


def _grid_buffers(spark: SparkSession, res: int = SP.PIP_COVER_RES) -> DataFrame:
    return SP.street_buffers(_grid_sidewalk_segments(spark), half_width_m=HW, res=res)


# --------------------------------------------------------------------------
# shared builders — DuckDB side (closed-form grid geometry)
# --------------------------------------------------------------------------

def _duck_points(bbox: bool = False) -> str:
    q = synth.geo_entities_duckdb_sql()
    if bbox:
        q = (f"SELECT * FROM ({q}) WHERE lat > {LAT_LO} AND lat < {LAT_HI} "
             f"AND lng > {LNG_LO} AND lng < {LNG_HI}")
    return q


def _duck_sidewalk_segments() -> str:
    """Closed-form sidewalk edges of the grid city: for every street edge,
    two parallel sidewalk edges offset +-4 m perpendicular.  Horizontal
    streets shift lat by OFF/111111; vertical streets shift lng by
    OFF/(111111*cos(radians(alat))), matching the engine's equirect
    anchor (= segment start vertex)."""
    dlat = sqlfns.dlit(OFF_M / 111111.0)
    dlng = f"({sqlfns.dlit(OFF_M)} / (111111.0 * {sqlfns.coslat_sql(f'47.6e0 + j * {sqlfns.dlit(LAT_STEP)}')}))"
    return f"""
    SELECT 47.6e0 + j * {sqlfns.dlit(LAT_STEP)} + s * {dlat} AS alat,
           -122.33e0 + k * {sqlfns.dlit(LNG_STEP)} AS alng,
           47.6e0 + j * {sqlfns.dlit(LAT_STEP)} + s * {dlat} AS blat,
           -122.33e0 + (k + 1) * {sqlfns.dlit(LNG_STEP)} AS blng
    FROM range(0, {G}) t(j), range(0, {G - 1}) u(k), (VALUES (1), (-1)) v(s)
    UNION ALL
    SELECT 47.6e0 + j * {sqlfns.dlit(LAT_STEP)} AS alat,
           -122.33e0 + k * {sqlfns.dlit(LNG_STEP)} + s * {dlng} AS alng,
           47.6e0 + (j + 1) * {sqlfns.dlit(LAT_STEP)} AS blat,
           -122.33e0 + k * {sqlfns.dlit(LNG_STEP)} + s * {dlng} AS blng
    FROM range(0, {G - 1}) t(j), range(0, {G}) u(k), (VALUES (1), (-1)) v(s)
    """


def _duck_pip_pairs() -> str:
    """Points x sidewalk buffers: the SAME rect-containment template the
    engine evaluates (sqlfns.rect_inside_sql) over the closed-form segment
    endpoints — bit-identical booleans by construction."""
    inside = sqlfns.rect_inside_sql("p.lat", "p.lng", "s.alat", "s.alng",
                                    "s.blat", "s.blng", HW)
    dist = sqlfns.seg_dist_sql("p.lat", "p.lng", "s.alat", "s.alng", "s.blat", "s.blng")
    return f"""
    SELECT p.url, p.entity, p.cell9,
           ROUND({dist}, 4) AS dist_r4,
           ROUND((s.alat + s.blat) / 2, 6) AS seg_mid_lat,
           ROUND((s.alng + s.blng) / 2, 6) AS seg_mid_lng
    FROM ({_duck_points(bbox=True)}) p, ({_duck_sidewalk_segments()}) s
    WHERE {inside}
    """


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_g3_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir)


def o_g3_cell_encode() -> str:
    return _duck_points()


def q_g3_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (pts.withColumn("cell5", F.expr(sqlfns.parent_sql("cell9", 9, 5)))
            .groupBy("cell5").agg(F.count("*").alias("n_points"),
                                  F.countDistinct("entity").alias("n_entities")))


def o_g3_parent_rollup() -> str:
    return (f"SELECT {sqlfns.parent_sql('cell9', 9, 5)} AS cell5, "
            f"COUNT(*) AS n_points, COUNT(DISTINCT entity) AS n_entities "
            f"FROM ({_duck_points()}) GROUP BY 1")


def q_r9_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 geodesic scalar (equirectangular planar metric — the poly-cos
    variant is bit-identical across engines, no rounding risk)."""
    pts = _points(spark, sf_dir)
    return pts.select(
        "url", "entity",
        F.expr(f"ROUND({sqlfns.equirect_dist_sql('lat', 'lng', '47.6', '-122.33')}, 6)")
        .alias("dist_center_m"))


def o_r9_distance() -> str:
    return (f"SELECT url, entity, "
            f"ROUND({sqlfns.equirect_dist_sql('lat', 'lng', '47.6', '-122.33')}, 6) AS dist_center_m "
            f"FROM ({_duck_points()})")


def q_r3_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
    return N.intersections(N.filter_streets(ways)).orderBy("node_id")


def o_r3_intersections() -> str:
    # every grid node is shared by exactly its row way and column way
    return (f"SELECT i AS node_id, CAST(2 AS BIGINT) AS n_ways, "
            f"CAST(2 AS BIGINT) AS n_refs FROM range(0, {G * G}) t(i)")


def q_r5_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
    segs = N.split_streets(N.filter_streets(ways))
    return segs.groupBy("parent_way_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.size("node_ids")).alias("n_vertex_refs"))


def o_r5_split_counts() -> str:
    # each g-vertex way splits into g-1 two-vertex segments
    return (f"SELECT i AS parent_way_id, CAST({G - 1} AS BIGINT) AS n_segments, "
            f"CAST({2 * (G - 1)} AS BIGINT) AS n_vertex_refs FROM range(0, {2 * G}) t(i)")


def q_r12_sidewalk_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = _grid_sidewalk_segments(spark)
    return segs.select(
        F.explode(F.array(
            F.struct(F.round("alat", 9).alias("vlat"), F.round("alng", 9).alias("vlng")),
            F.struct(F.round("blat", 9).alias("vlat"), F.round("blng", 9).alias("vlng")),
        )).alias("v")).select("v.vlat", "v.vlng").distinct()


def o_r12_sidewalk_vertices() -> str:
    return (f"SELECT DISTINCT ROUND(vlat, 9) AS vlat, ROUND(vlng, 9) AS vlng FROM ("
            f"SELECT alat AS vlat, alng AS vlng FROM ({_duck_sidewalk_segments()}) "
            f"UNION ALL SELECT blat, blng FROM ({_duck_sidewalk_segments()}))")


def q_g4_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir, bbox=True)
    out = SP.pip_join(pts, _grid_buffers(spark))
    bufs = _grid_buffers(spark).select(
        "segment_id",
        F.round((F.col("alat") + F.col("blat")) / 2, 6).alias("seg_mid_lat"),
        F.round((F.col("alng") + F.col("blng")) / 2, 6).alias("seg_mid_lng"))
    return (out.join(bufs, "segment_id")
            .select("url", "entity", "cell9", F.round("dist_m", 4).alias("dist_r4"),
                    "seg_mid_lat", "seg_mid_lng"))


def o_g4_pip_join() -> str:
    return _duck_pip_pairs()


def q_g5_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir, bbox=True)
    seg_cells = SP.segments_by_cell(_grid_buffers(spark, res=9))
    knn = SP.knn_join(pts, seg_cells, k=3, max_ring=6)
    return knn.select("url", "entity", "knn_rank", F.round("dist_m", 4).alias("dist_r4"))


def o_g5_knn() -> str:
    dist = sqlfns.seg_dist_sql("p.lat", "p.lng", "s.alat", "s.alng", "s.blat", "s.blng")
    return f"""
    SELECT url, entity, CAST(knn_rank AS INT) AS knn_rank, ROUND(dist_m, 4) AS dist_r4 FROM (
      SELECT p.url, p.entity, {dist} AS dist_m,
             ROW_NUMBER() OVER (PARTITION BY p.url, p.entity
                                ORDER BY {dist}, s.alat, s.alng, s.blat) AS knn_rank
      FROM ({_duck_points(bbox=True)}) p, ({_duck_sidewalk_segments()}) s
    ) WHERE knn_rank <= 3
    """


def q_g6_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir, bbox=True)
    matches = SP.pip_join(pts, _grid_buffers(spark))
    tiles = SP.coverage_tiles(pts, matches)
    return tiles.select(
        "cell9", "n_pages", "n_matched", "coverage",
        F.expr("CONCAT_WS(',', TRANSFORM(raster, x -> CAST(CAST(x AS BIGINT) AS STRING)))")
        .alias("raster_csv"))


def o_g6_tiles() -> str:
    s_sub = sqlfns.dlit(360.0 / float(2 ** (11 + 9)))
    sub_idx = (f"(CAST(FLOOR((lat + 90.0) / {s_sub}) AS BIGINT) % 4) * 4 "
               f"+ (CAST(FLOOR((lng + 180.0) / {s_sub}) AS BIGINT) % 4)")
    return f"""
    WITH pts AS (SELECT * FROM ({_duck_points(bbox=True)})),
    matched AS (SELECT DISTINCT url, entity FROM ({_duck_pip_pairs()})),
    flagged AS (
      SELECT p.cell9, {sub_idx} AS sub_idx,
             CASE WHEN m.url IS NULL THEN 0 ELSE 1 END AS is_matched
      FROM pts p LEFT JOIN matched m ON p.url = m.url AND p.entity = m.entity),
    per_sub AS (SELECT cell9, sub_idx, COUNT(*) AS n, CAST(SUM(is_matched) AS BIGINT) AS m
                FROM flagged GROUP BY 1, 2),
    cellz AS (SELECT cell9, CAST(SUM(n) AS BIGINT) AS n_pages,
                     CAST(SUM(m) AS BIGINT) AS n_matched FROM per_sub GROUP BY 1),
    raster AS (
      SELECT c.cell9, STRING_AGG(CAST(COALESCE(p.n, 0) AS VARCHAR), ',' ORDER BY r.i) AS raster_csv
      FROM cellz c CROSS JOIN range(0, 16) r(i)
      LEFT JOIN per_sub p ON p.cell9 = c.cell9 AND p.sub_idx = r.i
      GROUP BY c.cell9)
    SELECT c.cell9, c.n_pages, c.n_matched,
           ROUND(CAST(c.n_matched AS DOUBLE) / c.n_pages, 6) AS coverage, raster_csv
    FROM cellz c JOIN raster USING (cell9)
    """


def q_g6_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6b raster -> vector: run-length vectorization of the coverage
    rasters (operators/spatial.py::vectorize_tiles) — maximal horizontal
    runs of sub-cells with page count >= threshold."""
    pts = _points(spark, sf_dir, bbox=True)
    matches = SP.pip_join(pts, _grid_buffers(spark))
    tiles = SP.coverage_tiles(pts, matches)
    return SP.vectorize_tiles(tiles, threshold=2.0)


def o_g6_vectorize() -> str:
    s_sub = sqlfns.dlit(360.0 / float(2 ** (11 + 9)))
    sub_idx = (f"(CAST(FLOOR((lat + 90.0) / {s_sub}) AS BIGINT) % 4) * 4 "
               f"+ (CAST(FLOOR((lng + 180.0) / {s_sub}) AS BIGINT) % 4)")
    return f"""
    WITH pts AS (SELECT * FROM ({_duck_points(bbox=True)})),
    per_sub AS (SELECT cell9, {sub_idx} AS sub_idx, COUNT(*) AS n
                FROM pts GROUP BY 1, 2),
    f AS (SELECT cell9, CAST(sub_idx // 4 AS INT) AS r,
                 CAST(sub_idx % 4 AS INT) AS c, CAST(n AS DOUBLE) AS v
          FROM per_sub WHERE n >= 2),
    i AS (SELECT *, c - CAST(ROW_NUMBER() OVER
                 (PARTITION BY cell9, r ORDER BY c) AS INT) AS island
          FROM f)
    SELECT cell9, r, CAST(MIN(c) AS INT) AS c0, CAST(MAX(c) AS INT) AS c1,
           ROUND(SUM(v), 6) AS mass
    FROM i GROUP BY cell9, r, island
    """


# --- dedup / text / similarity ------------------------------------------------

def _duck_tokens(col: str = "text") -> str:
    return f"list_filter(string_split({col}, ' '), t -> length(t) > 0)"


def _duck_token_hashes(col: str = "text") -> str:
    return (f"list_transform(list_distinct({_duck_tokens(col)}), t -> "
            + sqlfns.polyhash_duckdb("t") + ")")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup(docs)


def o_exact_dedup() -> str:
    # GROUP BY the 62-bit fingerprint, mirroring the engine's 8-byte
    # shuffle key (fingerprint-first exact dedup, VERDICT.md r3 #3)
    return ("SELECT MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_dupes "
            f"FROM documents GROUP BY {dedup.fingerprint62_duckdb_sql('text')}")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.fingerprint(docs)


def o_fingerprint() -> str:
    return f"SELECT doc_id, {sqlfns.polyhash_duckdb('text')} AS fingerprint FROM documents"


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(docs)


def o_minhash_lsh(th: str | None = None) -> str:
    th = th or _duck_token_hashes()
    r = len(dedup.MINHASH_PERMS) // dedup.LSH_BANDS
    mins = ", ".join(
        f"{sqlfns.minhash_duckdb('th', a, b)} AS m{k}"
        for k, (a, b) in enumerate(dedup.MINHASH_PERMS))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bno} AS band_no, CONCAT_WS(',', "
        + ", ".join(f"CAST(m{bno * r + j} AS VARCHAR)" for j in range(r))
        + ") AS band_sig FROM sigs"
        for bno in range(dedup.LSH_BANDS))
    return f"""
    WITH sigs AS (SELECT doc_id, {mins} FROM (SELECT doc_id, {th} AS th FROM documents)),
    bands0 AS ({band_rows}),
    bands AS (SELECT * FROM bands0
              QUALIFY COUNT(*) OVER (PARTITION BY band_no, band_sig) <= {dedup.LSH_MAX_BUCKET})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
    FROM bands a JOIN bands b ON a.band_no = b.band_no AND a.band_sig = b.band_sig
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    """


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs)


def o_simhash() -> str:
    th = _duck_token_hashes()
    fp = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 16), b -> "
        f"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(th, h -> CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1 "
        f"THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), (a, x) -> a + x) > 0 "
        f"THEN CAST(POWER(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x)")
    return (f"SELECT doc_id, {fp} AS simhash FROM "
            f"(SELECT doc_id, {th} AS th FROM documents)")


def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.jaccard_pairs(docs, threshold=0.5)


def o_jaccard() -> str:
    """Candidates from MinHash LSH (same banded plan as the engine,
    VERDICT.md r1 'Next round' #4), exact Jaccard verify; BOTH sides filter
    on the rounded value (ADVICE.md r1)."""
    j = ("ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) "
         "/ (a.nt + b.nt - len(list_intersect(a.t, b.t))), 6)")
    return f"""
    WITH cand AS (SELECT doc_a, doc_b FROM ({o_minhash_lsh()})),
    toks AS (SELECT doc_id, list_sort(list_distinct({_duck_tokens()})) AS t,
                    len(list_distinct({_duck_tokens()})) AS nt FROM documents)
    SELECT doc_a, doc_b, {j} AS jaccard
    FROM cand JOIN toks a ON cand.doc_a = a.doc_id
              JOIN toks b ON cand.doc_b = b.doc_id
    WHERE {j} >= 0.5e0
    """


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold 0.4: the synthetic embeddings are near-orthogonal (max
    pairwise cosine at sf0.01 is ~0.513, within-bucket ~0.443), so the
    round-1 threshold of 0.9 matched the oracle vacuously at 0 rows
    (VERDICT.md r1 'What's wrong' #3).

    The round-4 move to the 16-plane near-dup bucket space (65,536
    buckets vs 500 sf0.01 vectors) makes near-orthogonal bucket-mates
    vanish too, so the query unions a deterministic 1.5x-scaled copy of
    every 5th vector: scaling preserves hyperplane signs and gives
    cosine ≈ 1.0 with the original, so each copy is a GENUINE near-dup
    pair and the check stays non-vacuous.  float32 multiply is IEEE
    round-to-nearest in both engines, so the copies are bit-identical
    to the DuckDB twin's."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = emb.filter("vec_id % 5 = 0").select(
        (F.col("vec_id") + F.lit(1000000000)).alias("vec_id"), "label",
        F.expr("TRANSFORM(embedding, x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT))"
               ).alias("embedding"))
    return dedup.embedding_neardup_pairs(emb.unionByName(copies),
                                         cos_threshold=0.4)


def _duck_dot(va: str, vb: str) -> str:
    prods = (f"list_transform(range(1, len({va}) + 1), "
             f"i -> CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE))")
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), (a, x) -> a + x)")


def _duck_norm(v: str) -> str:
    sq = f"list_transform(range(1, len({v}) + 1), i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE))"
    return f"SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {sq}), (a, x) -> a + x))"


def _duck_lsh_sig(v: str, n_planes: int | None = None) -> str:
    """Hyperplane-sign bucket in DuckDB — twin of
    similarity.lsh_signature_expr (same integer coefficients)."""
    from ..operators import similarity
    terms = []
    for p in range(n_planes or similarity.N_PLANES):
        coef = (f"list_transform(range(0, 64), j -> "
                f"CAST((({p} * 1009 + j) * 2654435761) % 97 - 48 AS DOUBLE))")
        prods = (f"list_transform(range(1, 65), i -> CAST({v}[i] AS DOUBLE) * ({coef})[i])")
        dot = f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), (a, x) -> a + x)"
        terms.append(f"CASE WHEN {dot} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    return "(" + " + ".join(terms) + ")"


def o_embedding_neardup() -> str:
    """16-plane bucket space + the max_bucket semi-join cap, mirroring the
    engine's near-dup scale shape (VERDICT.md r3 'What's wrong' #1)."""
    from ..operators import similarity
    cos = (f"ROUND({_duck_dot('a.embedding', 'b.embedding')}"
           f" / ({_duck_norm('a.embedding')} * {_duck_norm('b.embedding')}), 6)")
    return f"""
    WITH embx AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000000 AS vec_id,
             list_transform(embedding, x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % 5 = 0),
    sig0 AS (SELECT vec_id, embedding,
                  {_duck_lsh_sig('embedding', similarity.NEARDUP_PLANES)} AS bucket
                  FROM embx),
    sig AS (SELECT * FROM sig0
            QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= {dedup.LSH_MAX_BUCKET})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket, {cos} AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= 0.4e0
    """


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 25 = 0")
    return similarity.brute_force_topk(emb, queries, k=5)


def o_ann_topk() -> str:
    dot = _duck_dot("q.embedding", "c.embedding")
    nq, nc = _duck_norm("q.embedding"), _duck_norm("c.embedding")
    return f"""
    SELECT query_id, corpus_id, label, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, c.label,
             ROUND({dot} / ({nq} * {nc}), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY ROUND({dot} / ({nq} * {nc}), 6) DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 25 = 0
    ) WHERE rank <= 5
    """


def q_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched BLAS exact top-k (similarity.gemm_topk) — must equal
    the brute-force SQL-fold oracle exactly (same rounded cosines)."""
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 25 = 0")
    return similarity.gemm_topk(emb, queries, k=5)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-corpus dedup (dedup.incremental_dedup): docs
    with doc_id % 7 = 3 play the new crawl batch, the rest the corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.incremental_dedup(
        docs.filter("doc_id % 7 = 3"), docs.filter("doc_id % 7 != 3"))


def o_incremental_dedup() -> str:
    fp = dedup.fingerprint62_duckdb_sql("text")
    return f"""
    WITH fp AS (SELECT doc_id, {fp} AS fp FROM documents),
    newb AS (SELECT * FROM fp WHERE doc_id % 7 = 3),
    seen AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 7 <> 3)
    SELECT MIN(doc_id) AS doc_id, fp, COUNT(*) AS n_batch_dupes
    FROM newb WHERE fp NOT IN (SELECT fp FROM seen)
    GROUP BY fp
    """


_SAMPLE_QUOTAS = {"en": 250, "de": 1000, "fr": 500}


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.deterministic_sample(docs, _SAMPLE_QUOTAS)


def o_deterministic_sample() -> str:
    h = sqlfns.polyhash_duckdb("CAST(doc_id AS VARCHAR)")
    quota = ("CASE " + " ".join(
        f"WHEN lang = '{lg}' THEN {pm}"
        for lg, pm in sorted(_SAMPLE_QUOTAS.items())) + " ELSE 0 END")
    return f"SELECT * FROM documents WHERE ({h}) % 1000 < {quota}"


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.token_histogram(docs)


def o_token_histogram() -> str:
    n = f"len({_duck_tokens()})"
    return f"""
    SELECT lang,
           CASE WHEN {n} = 0 THEN -1
                ELSE CAST(FLOOR(LOG2(CAST({n} AS DOUBLE))) AS INT) END AS bucket,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1, 2
    """


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.token_stats(docs)


def o_token_stats() -> str:
    return (f"SELECT doc_id, len({_duck_tokens()}) AS n_tokens, "
            f"CAST(CEIL(length(text) / 4.0) AS BIGINT) AS n_bpe_est, "
            f"length(text) AS n_chars_measured FROM documents")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.quality_score(docs)


def o_quality() -> str:
    toks = _duck_tokens()
    stop = "['" + "','".join(text.STOPWORDS) + "']"
    return f"""
    SELECT doc_id, lang, len({toks}) AS n_tokens,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / GREATEST(len({toks}), 1), 6) AS mean_word_len,
           ROUND(CAST(len(list_filter({toks}, t -> list_contains({stop}, t))) AS DOUBLE)
                 / GREATEST(len({toks}), 1), 6) AS stopword_ratio,
           ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
                 / GREATEST(length(text), 1), 6) AS alpha_ratio,
           ROUND((ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
                        / GREATEST(length(text), 1), 6)
                  + LEAST(ROUND(CAST(len(list_filter({toks}, t -> list_contains({stop}, t))) AS DOUBLE)
                                / GREATEST(len({toks}), 1), 6) * 4, 1.0)) / 2, 6) AS quality
    FROM documents
    """


def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus construction (plans.pipeline.build_corpus):
    composed quality gate (C4 score AND gopher_rules keep AND
    repetition-signal thresholds — VERDICT r4 #4) -> exact dedup ->
    benchmark decontamination (every 97th doc plays the eval set) ->
    stratified sample -> per-lang summary, all §2 operators composed;
    the oracle re-derives the whole chain in one DuckDB query."""
    from . import pipeline
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pipeline.build_corpus(docs, quality_min=0.5,
                                 permille_by_lang=_SAMPLE_QUOTAS,
                                 benchmark=docs.filter("doc_id % 97 = 0"))


def _duck_shingle_hashes(col: str = "text", w: int = 3) -> str:
    """DuckDB twin of dedup._shingle_hashes (distinct w-gram hashes)."""
    return (f"list_transform(list_distinct({_duck_shingles(col, w)}), t -> "
            + sqlfns.polyhash_duckdb("t") + ")")


def _duck_contaminated(bench_pred: str = "doc_id % 97 = 0", w: int = 8) -> str:
    """CTE body: (doc_id, n_hits) of docs sharing >= 1 w-gram with the
    benchmark subset — twin of dedup.decontaminate."""
    th = _duck_shingle_hashes("text", w)
    return f"""
      SELECT doc_id, COUNT(*) AS n_hits FROM
        (SELECT doc_id, unnest({th}) AS gh FROM documents) dg
        JOIN (SELECT DISTINCT unnest({th}) AS gh FROM documents
              WHERE {bench_pred}) bh USING (gh)
      GROUP BY doc_id"""


def o_corpus_build() -> str:
    fp = dedup.fingerprint62_duckdb_sql("text")
    h = sqlfns.polyhash_duckdb("CAST(doc_id AS VARCHAR)")
    quota = ("CASE " + " ".join(
        f"WHEN lang = '{lg}' THEN {pm}"
        for lg, pm in sorted(_SAMPLE_QUOTAS.items())) + " ELSE 0 END")
    stop = "[" + ",".join(f"'{w}'" for w in text.STOPWORDS) + "]"
    toks = _duck_tokens()
    grams = ("CASE WHEN len(t) >= 2 THEN "
             "list_transform(range(0, len(t) - 1), "
             "i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')) "
             "ELSE [] END")
    return f"""
    WITH q AS ({o_quality()}),
    gph AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               CAST(len({toks}) AS BIGINT) AS n_words,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS swc,
               CAST(len(list_filter({toks},
                   t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS na,
               CAST(length(text) - length(replace(text, '#', ''))
                    + CAST((length(text) - length(replace(text, '...', '')))
                           / 3 AS BIGINT) AS BIGINT) AS ns,
               CAST(len(list_intersect(list_distinct({toks}), {stop}))
                    AS BIGINT) AS nsh
        FROM documents)
      WHERE n_words >= 20 AND n_words <= 100000
        AND swc >= 3 * n_words AND swc <= 10 * n_words
        AND na * 100 >= 80 * n_words AND ns * 100 <= 10 * n_words
        AND nsh >= 2),
    rep_s AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt,
                     CAST(len(list_distinct(t)) AS BIGINT) AS nu,
                     {grams} AS grams
              FROM (SELECT doc_id, {toks} AS t FROM documents)),
    rep_g AS (SELECT doc_id, unnest(grams) AS gram FROM rep_s),
    rep_c AS (SELECT doc_id, gram, COUNT(*) AS c FROM rep_g GROUP BY 1, 2),
    rep_a AS (SELECT doc_id, SUM(c) AS n2, MAX(c) AS mx,
                     SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
              FROM rep_c GROUP BY 1),
    rep AS (
      SELECT doc_id FROM (
        SELECT rep_s.doc_id,
               ROUND(CAST(nu AS DOUBLE) / GREATEST(nt, 1), 6) AS uf,
               ROUND(CAST(COALESCE(mx, 0) AS DOUBLE)
                     / GREATEST(COALESCE(n2, 0), 1), 6) AS tf,
               ROUND(CAST(COALESCE(dup, 0) AS DOUBLE)
                     / GREATEST(COALESCE(n2, 0), 1), 6) AS df
        FROM rep_s LEFT JOIN rep_a USING (doc_id))
      WHERE tf <= 0.1e0 AND df <= 0.2e0 AND uf >= 0.3e0),
    kept AS (
      SELECT d.doc_id, q.lang, d.text, q.n_tokens
      FROM documents d JOIN q ON d.doc_id = q.doc_id
      JOIN gph ON d.doc_id = gph.doc_id
      JOIN rep ON d.doc_id = rep.doc_id
      WHERE q.quality >= 0.5e0),
    surv AS (
      SELECT doc_id, lang, n_tokens
      FROM (SELECT *, {fp} AS fp FROM kept)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
    cont AS ({_duck_contaminated()}),
    clean AS (SELECT surv.* FROM surv
              WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
    samp AS (SELECT * FROM clean WHERE ({h}) % 1000 < {quota})
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM samp GROUP BY lang
    """


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.lang_id(docs)


def o_lang_id() -> str:
    toks = _duck_tokens()
    markers = {"en": ["the", "and", "of", "is"], "de": ["der", "und", "die", "ist"],
               "fr": ["le", "et", "la", "est"], "es": ["el", "y", "la", "es"]}
    score = {lg: f"len(list_filter({toks}, t -> list_contains(['"
             + "','".join(ws) + "'], t)))" for lg, ws in markers.items()}
    return f"""
    SELECT doc_id, lang AS lang_declared,
           CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred
    FROM (SELECT doc_id, lang, {score['en']} AS s_en, {score['de']} AS s_de,
                 {score['fr']} AS s_fr, {score['es']} AS s_es FROM documents)
    """


# --- generic relational validation ---------------------------------------------

def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sums in exact integer cents (value has 2 decimals in the
    generator) — window-sum implementations are free to reassociate floats,
    so integer arithmetic is the only hash-stable form."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.selectExpr(
        "event_id", "user_id", "event_type",
        "SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cents",
        "unix_micros(CAST(ts AS TIMESTAMP)) - LAG(unix_micros(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us",
    )


def o_events_window() -> str:
    return """
    SELECT event_id, user_id, event_type,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
    FROM events
    """


def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.selectExpr(
        "user_id",
        "CASE WHEN unix_micros(CAST(ts AS TIMESTAMP)) - LAG(unix_micros(CAST(ts AS TIMESTAMP))) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 OR "
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_start",
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents",
    ).groupBy("user_id").agg(
        F.sum("is_start").alias("n_sessions"),
        F.sum("cents").alias("total_cents"))


def o_events_sessionized() -> str:
    return """
    SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM (SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS is_start
          FROM events)
    GROUP BY user_id
    """


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary in exact integer cents."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.filter("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.expr("SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))").alias("sum_qty"),
                 F.expr("SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))").alias("sum_base_cents"),
                 F.expr("SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT))").alias("sum_disc_pct"),
                 F.count("*").alias("count_order")))


def o_tpch_q1() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_pct,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def q_extract_text_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 with a REAL SQL oracle (upgrading the rows-only identity check):
    the python Arrow extractor runs over synthesized html pages, and
    DuckDB re-derives the exact (url, text) in closed form — page
    synthesis (sources/synth.py::pages) is pure SQL, and byte-identical
    extraction means output text == the closed-form text column."""
    from ..operators import text as TX
    return TX.extract_text(synth.pages(spark, 500))


def o_extract_text_oracle() -> str:
    ne = synth.N_ENTITIES
    return f"""
    SELECT 'https://site' || CAST(id % 997 AS VARCHAR) || '.example/p/'
             || CAST(id AS VARCHAR) AS url,
           'visit poi_' || CAST((id * 7) % {ne} AS VARCHAR)
             || ' near block ' || CAST(id % 1000 AS VARCHAR)
             || ' in sector ' || CAST(id % 37 AS VARCHAR) || ' '
             || rtrim(repeat('filler segment ' || CAST(id % 97 AS VARCHAR)
                             || ' of page text corpus ', 60)) AS text
    FROM range(0, 500) t(id)
    """


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style top-10 orders by revenue (3-way join + agg + global
    top-k): per-row integer-cents rounding keeps the SUM associative and
    engine-exact; the top-k tie-breaks on l_orderkey so the LIMIT is
    deterministic."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter("c_mktsegment = 'BUILDING'")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderdate < TIMESTAMP '1998-03-15 00:00:00'")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        "l_shipdate > TIMESTAMP '1998-03-15 00:00:00'")
    cents = "SUM(CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 100, 0) AS BIGINT))"
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.expr(cents).alias("revenue_cents"))
            .orderBy(F.desc("revenue_cents"), "l_orderkey")
            .limit(10))


def o_tpch_q3() -> str:
    return """
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey
    LIMIT 10
    """


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue (6-table join): the two tiny
    dims broadcast explicitly, the customer/supplier co-nation predicate
    rides the join, AQE reorders the rest."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter("r_name = 'ASIA'")
    cents = "SUM(CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 100, 0) AS BIGINT))"
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, (o.o_custkey == c.c_custkey))
            .join(s, (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.expr(cents).alias("revenue_cents")))


def o_tpch_q5() -> str:
    return """
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """


def q_broadcast_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the small dims (the pattern the
    engine uses for remap/cell-cover tables)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.expr("SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))").alias("total_cents")))


def o_broadcast_star_join() -> str:
    return """
    SELECT n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """


# --------------------------------------------------------------------------

QUERIES = {
    "g3_cell_encode": (q_g3_cell_encode, o_g3_cell_encode),
    "g3_parent_rollup": (q_g3_parent_rollup, o_g3_parent_rollup),
    "r9_distance": (q_r9_distance, o_r9_distance),
    "r3_intersections": (q_r3_intersections, o_r3_intersections),
    "r5_split_counts": (q_r5_split_counts, o_r5_split_counts),
    "r12_sidewalk_vertices": (q_r12_sidewalk_vertices, o_r12_sidewalk_vertices),
    "g4_pip_join": (q_g4_pip_join, o_g4_pip_join),
    "g5_knn": (q_g5_knn, o_g5_knn),
    "g6_tiles": (q_g6_tiles, o_g6_tiles),
    "exact_dedup": (q_exact_dedup, o_exact_dedup),
    "fingerprint": (q_fingerprint, o_fingerprint),
    "minhash_lsh_pairs": (q_minhash_lsh, o_minhash_lsh),
    "simhash": (q_simhash, o_simhash),
    "jaccard_pairs": (q_jaccard, o_jaccard),
    "embedding_neardup": (q_embedding_neardup, o_embedding_neardup),
    "ann_topk": (q_ann_topk, o_ann_topk),
    "token_stats": (q_token_stats, o_token_stats),
    "quality_score": (q_quality, o_quality),
    "lang_id": (q_lang_id, o_lang_id),
    "events_window": (q_events_window, o_events_window),
    "events_sessionized": (q_events_sessionized, o_events_sessionized),
    "tpch_q1": (q_tpch_q1, o_tpch_q1),
    "tpch_q3": (q_tpch_q3, o_tpch_q3),
    "tpch_q5": (q_tpch_q5, o_tpch_q5),
    "extract_text_oracle": (q_extract_text_oracle, o_extract_text_oracle),
    "corpus_build": (q_corpus_build, o_corpus_build),
    "broadcast_star_join": (q_broadcast_star_join, o_broadcast_star_join),
}


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = dedup.minhash_signatures(docs)
    return sigs.select(
        "doc_id",
        F.expr("CONCAT_WS(',', TRANSFORM(sig, x -> CAST(x AS STRING)))").alias("sig_csv"))


def o_minhash_signatures() -> str:
    th = _duck_token_hashes()
    mins = ", ".join(
        f"CAST({sqlfns.minhash_duckdb('th', a, b)} AS VARCHAR)"
        for a, b in dedup.MINHASH_PERMS)
    return (f"SELECT doc_id, CONCAT_WS(',', {mins}) AS sig_csv FROM "
            f"(SELECT doc_id, {th} AS th FROM documents)")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_dup_pairs(docs)


def o_simhash_pairs() -> str:
    inner = o_simhash()
    return f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash
    FROM ({inner}) a JOIN ({inner}) b
    ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_topk(emb, emb.filter("vec_id % 25 = 0"), k=3)


def o_lsh_topk() -> str:
    from ..operators import similarity
    # hyperplane-sign bucket in DuckDB: same integer coefficients
    def sig(v):
        terms = []
        for p in range(similarity.N_PLANES):
            coef = (f"list_transform(range(0, 64), j -> "
                    f"CAST((({p} * 1009 + j) * 2654435761) % 97 - 48 AS DOUBLE))")
            prods = (f"list_transform(range(1, 65), i -> CAST({v}[i] AS DOUBLE) * ({coef})[i])")
            dot = f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), (a, x) -> a + x)"
            terms.append(f"CASE WHEN {dot} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
        return "(" + " + ".join(terms) + ")"
    dot = _duck_dot("q.embedding", "c.embedding")
    nq, nc = _duck_norm("q.embedding"), _duck_norm("c.embedding")
    return f"""
    SELECT query_id, corpus_id, label, bucket, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, c.label,
             {sig('q.embedding')} AS bucket,
             ROUND({dot} / ({nq} * {nc}), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY ROUND({dot} / ({nq} * {nc}), 6) DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c
        ON {sig('q.embedding')} = {sig('c.embedding')} AND q.vec_id != c.vec_id
      WHERE q.vec_id % 25 = 0
    ) WHERE rank <= 3
    """


def q_r18_way_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18's length aggregate over the split grid streets (equirect twin
    of way_length_expr for bit-stable comparison)."""
    _, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
    streets = N.filter_streets(ways)
    segs = N.split_streets(streets)
    nodes, _ = synth.osm_grid(spark, g=G, with_noise_ways=True)
    gw = N.geom_ways(nodes, segs)
    d = sqlfns.equirect_dist_sql("lats[0]", "lngs[0]", "lats[1]", "lngs[1]")
    # split ids are parent * SPLIT_FACTOR + seg_no (network.split_streets)
    return gw.select(
        F.expr(f"CAST(FLOOR(way_id / {N.SPLIT_FACTOR}) AS BIGINT)").alias("parent_way_id"),
        F.expr(f"way_id % {N.SPLIT_FACTOR}").alias("seg_no"),
        F.expr(f"ROUND({d}, 6)").alias("len_m"))


def o_r18_way_lengths() -> str:
    # horizontal edges: alat=blat, lng step; vertical: alng=blng, lat step
    dh = sqlfns.equirect_dist_sql(
        f"47.6e0 + j * {sqlfns.dlit(LAT_STEP)}", f"-122.33e0 + k * {sqlfns.dlit(LNG_STEP)}",
        f"47.6e0 + j * {sqlfns.dlit(LAT_STEP)}", f"-122.33e0 + (k + 1) * {sqlfns.dlit(LNG_STEP)}")
    dv = sqlfns.equirect_dist_sql(
        f"47.6e0 + k * {sqlfns.dlit(LAT_STEP)}", f"-122.33e0 + j * {sqlfns.dlit(LNG_STEP)}",
        f"47.6e0 + (k + 1) * {sqlfns.dlit(LAT_STEP)}", f"-122.33e0 + j * {sqlfns.dlit(LNG_STEP)}")
    return f"""
    SELECT j AS parent_way_id, k AS seg_no, ROUND({dh}, 6) AS len_m
    FROM range(0, {G}) t(j), range(0, {G - 1}) u(k)
    UNION ALL
    SELECT j + {G} AS parent_way_id, k AS seg_no, ROUND({dv}, 6) AS len_m
    FROM range(0, {G}) t(j), range(0, {G - 1}) u(k)
    """


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SQL oracle (upgraded from the r2 rows-only L1-sum check): the
    fake payload is REPEAT(last-8-chars(url), 16), so the numpy
    byte-histogram feature has the closed form
        f[j] = count of chars c in right(url, 8) with ascii(c) % 8 = j,
    normalized by 8 — and k/8 is exactly representable in binary, so the
    ROUND(.,6) in the UDF and the oracle cannot diverge for ANY value.
    Components are emitted as separate columns (f0..f7) so the driver's
    value hash compares every entry, not an aggregate of them."""
    from ..operators import multimodal
    pages = synth.pages(spark, 200)
    media = multimodal.synth_media(pages)
    feats = multimodal.extract_features(media)
    sel = [F.expr(f"ELEMENT_AT(feature, {j + 1})").alias(f"f{j}")
           for j in range(8)]
    return feats.select("url", "media_type", *sel)


def o_multimodal_features() -> str:
    comps = ",\n           ".join(
        f"ROUND(len(list_filter(range(1, 9), "
        f"k -> ascii(substr(r8, CAST(k AS INT), 1)) % 8 = {j})) / 8.0, 6) "
        f"AS f{j}" for j in range(8))
    return f"""
    WITH p AS (SELECT 'https://site' || CAST(id % 997 AS VARCHAR)
                      || '.example/p/' || CAST(id AS VARCHAR) AS url
               FROM range(0, 200) t(id)),
    m AS (SELECT url,
                 list_extract(['image','audio','video'],
                              CAST(length(url) % 3 AS INT) + 1) AS media_type,
                 right(url, 8) AS r8
          FROM p)
    SELECT url, media_type,
           {comps}
    FROM m
    """


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: G2 HTML->text extraction byte-identity — returns
    urls whose extracted text mismatches the input text column (must be 0
    rows... but rows-only checks need >=0; return per-lang match counts)."""
    pages = synth.pages(spark, 2000)
    from ..operators import text as T
    got = T.extract_text(pages).withColumnRenamed("text", "extracted")
    joined = got.join(pages.select("url", "text", "lang"), "url")
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.expr("CASE WHEN extracted = text THEN 1 ELSE 0 END")).alias("n_byte_identical"))


# --------------------------------------------------------------------------
# round-2 oracle entries: the six pytest-only §2 operators (VERDICT.md r1
# 'Next round' #3: R4, R6, R7, R8, R17, R20), the rotated-grid PIP oracle
# (#8), and the 62-bit banded-Hamming simhash (#7).  Each runs the REAL
# engine operator on an oracle-city whose geometry has a closed DuckDB form
# (sources/synth.py 'oracle-city generators').
# --------------------------------------------------------------------------

_CSV = "CONCAT_WS(',', TRANSFORM(node_ids, x -> CAST(x AS STRING)))"


def q_r4_way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ways = synth.segmented_grid_ways(spark, g=G)
    merged = N.join_segmented_ways(ways)
    return merged.select(
        "way_id", F.size("node_ids").cast("long").alias("n_vertices"),
        F.expr(_CSV).alias("nodes_csv"))


def o_r4_way_join() -> str:
    # each row of G-1 fragments merges into one G-vertex way, id = min
    # fragment id = j*(G-1), oriented from the smallest terminal node
    return (f"SELECT j * {G - 1} AS way_id, CAST({G} AS BIGINT) AS n_vertices, "
            f"array_to_string(list_transform(range(0, {G}), "
            f"i -> CAST(j * {G} + i AS VARCHAR)), ',') AS nodes_csv "
            f"FROM range(0, {G}) t(j)")


def q_r6_parallel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    gw = synth.parallel_city_gw(spark)
    return N.find_parallel_pairs(gw).select(
        "way_a", "way_b", F.round("sep_m", 4).alias("sep_r4"))


def o_r6_parallel_pairs() -> str:
    # pair p lanes are 4.5 + 2p meters apart in lng: detectable up to p=10
    # (24.5 m, a 0.5 m margin inside the 25 m threshold — ADVICE.md r2);
    # sep = min point-segment distance from lane a's middle vertex to lane
    # b's two segments — the SAME seg_dist template the engine runs
    dy = sqlfns.dlit(synth.PC_DY_DEG)
    la = synth.parallel_city_lng_sql("p", "0")
    lb = synth.parallel_city_lng_sql("p", "1")
    m_lat = f"(47.6e0 + 1 * {dy})"
    d0 = sqlfns.seg_dist_sql(m_lat, la, "47.6e0", lb, f"(47.6e0 + 1 * {dy})", lb)
    d1 = sqlfns.seg_dist_sql(m_lat, la, f"(47.6e0 + 1 * {dy})", lb,
                             f"(47.6e0 + 2 * {dy})", lb)
    return (f"SELECT 2 * p AS way_a, 2 * p + 1 AS way_b, "
            f"ROUND(LEAST({d0}, {d1}), 4) AS sep_r4 "
            f"FROM range(0, {synth.PC_PAIRS}) t(p) WHERE 4.5 + 2 * p <= 25")


def q_r7_parallel_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    gw = synth.parallel_city_gw(spark)
    merged = N.merge_parallel_pairs(gw, N.find_parallel_pairs(gw))
    return merged.select(
        "way_id", F.size("node_ids").cast("long").alias("n_vertices"),
        F.round(F.expr("lats[0]"), 9).alias("lat0"),
        F.round(F.expr("lngs[0]"), 9).alias("lng0"),
        F.round(F.expr("lngs[1]"), 9).alias("lng1"),
        F.round(F.expr("ELEMENT_AT(lats, -1)"), 9).alias("lat_end"))


def o_r7_parallel_merge() -> str:
    # merged centerline = pointwise midpoint: lng = (lng_a + lng_b) / 2
    # (equal-length aligned lanes resample to themselves exactly);
    # the undetected pair p=11 keeps both original lanes
    dy = sqlfns.dlit(synth.PC_DY_DEG)
    la = synth.parallel_city_lng_sql("p", "0")
    lb = synth.parallel_city_lng_sql("p", "1")
    mid = f"ROUND(({la} + {lb}) / 2.0e0, 9)"
    kept_lng = f"ROUND({synth.parallel_city_lng_sql('11', 's')}, 9)"
    return f"""
    SELECT 2 * p AS way_id, CAST(3 AS BIGINT) AS n_vertices,
           ROUND(47.6e0, 9) AS lat0, {mid} AS lng0, {mid} AS lng1,
           ROUND(47.6e0 + 2 * {dy}, 9) AS lat_end
    FROM range(0, {synth.PC_PAIRS}) t(p) WHERE 4.5 + 2 * p <= 25
    UNION ALL
    SELECT 22 + s AS way_id, CAST(3 AS BIGINT), ROUND(47.6e0, 9),
           {kept_lng}, {kept_lng}, ROUND(47.6e0 + 2 * {dy}, 9)
    FROM (VALUES (0), (1)) v(s)
    """


def q_r8_node_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, ways = synth.twin_grid(spark, g=G)
    n2, w2 = N.merge_nodes(nodes, ways)
    ws = w2.select("way_id", F.size("node_ids").cast("long").alias("n_vertices"),
                   F.expr(_CSV).alias("nodes_csv"))
    summary = (n2.agg(F.count("*").alias("n_vertices"))
               .select(F.lit(-1).cast("long").alias("way_id"), "n_vertices",
                       F.lit("").alias("nodes_csv")))
    return ws.unionByName(summary)


def o_r8_node_merge() -> str:
    # twins collapse into originals: horizontal ways unchanged, vertical
    # ways rewritten to original ids; surviving node count = G*G (the -1 row)
    return f"""
    SELECT j AS way_id, CAST({G} AS BIGINT) AS n_vertices,
           array_to_string(list_transform(range(0, {G}),
             i -> CAST(j * {G} + i AS VARCHAR)), ',') AS nodes_csv
    FROM range(0, {G}) t(j)
    UNION ALL
    SELECT {G} + i, CAST({G} AS BIGINT),
           array_to_string(list_transform(range(0, {G}),
             j -> CAST(j * {G} + i AS VARCHAR)), ',')
    FROM range(0, {G}) t(i)
    UNION ALL
    SELECT -1, CAST({G * G} AS BIGINT), ''
    """


def q_r17_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, ways = synth.zigzag_city(spark)
    slim = N.simplify_ways(nodes, ways, tol_m=geom.DP_TOLERANCE_M)
    return slim.select(
        "way_id", F.size("node_ids").cast("long").alias("n_vertices"),
        F.expr(_CSV).alias("nodes_csv"))


def o_r17_simplify() -> str:
    # every wiggle is ~7.5e-5 m << the 0.5 m tolerance: only endpoints stay
    return (f"SELECT w AS way_id, CAST(2 AS BIGINT) AS n_vertices, "
            f"CAST(w * {synth.ZZ_M} AS VARCHAR) || ',' || "
            f"CAST(w * {synth.ZZ_M} + {synth.ZZ_M - 1} AS VARCHAR) AS nodes_csv "
            f"FROM range(0, {synth.ZZ_WAYS}) t(w)")


def q_r20_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
    gw = N.geom_ways(nodes, N.filter_streets(ways)).withColumn("kind", F.lit("street"))
    return SW.to_geojson_canonical(gw).select("way_id", "feature")


def o_r20_geojson() -> str:
    # canonical Feature JSON with %.6f fixed-point floats — printf in
    # DuckDB == format_string in Spark (C-printf semantics on both)
    lat_h = f"47.6e0 + j * {sqlfns.dlit(LAT_STEP)}"
    lng_h = f"-122.33e0 + k * {sqlfns.dlit(LNG_STEP)}"
    lat_v = f"47.6e0 + k * {sqlfns.dlit(LAT_STEP)}"
    lng_v = f"-122.33e0 + j * {sqlfns.dlit(LNG_STEP)}"
    hw = ("CASE j % 4 WHEN 0 THEN 'residential' WHEN 1 THEN 'primary' "
          "WHEN 2 THEN 'secondary' ELSE 'tertiary' END")

    def coords(lat: str, lng: str) -> str:
        return (f"array_to_string(list_transform(range(0, {G}), k -> "
                f"'[' || printf('%.6f', {lng}) || ',' || printf('%.6f', {lat}) || ']'), ',')")

    def feature(way_id: str, cs: str) -> str:
        return (f"'{{\"type\":\"Feature\",\"properties\":{{\"id\":' || CAST({way_id} AS VARCHAR) || "
                f"',\"kind\":\"street\",\"highway\":\"' || {hw} || "
                f"'\"}},\"geometry\":{{\"type\":\"LineString\",\"coordinates\":[' || {cs} || ']}}}}'")

    return f"""
    SELECT j AS way_id, {feature('j', coords(lat_h, lng_h))} AS feature
    FROM range(0, {G}) t(j)
    UNION ALL
    SELECT j + {G} AS way_id, {feature(f'j + {G}', coords(lat_v, lng_v))} AS feature
    FROM range(0, {G}) t(j)
    """


def q_simhash64_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_neardup_pairs(docs, max_hamming=3)


def o_simhash64_neardup(src: str = "documents") -> str:
    th = _duck_token_hashes()
    th2 = (f"list_transform(list_distinct({_duck_tokens()}), t -> "
           + sqlfns.polyhash_duckdb("t", mult=37) + ")")

    def fp(col: str, lo: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 31), b -> "
            f"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform({col}, h -> "
            f"CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), (a, x) -> a + x) > 0 "
            f"THEN CAST(POWER(2, b + {lo}) AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
            f"(a, x) -> a + x)")

    return f"""
    WITH s AS (SELECT doc_id, ({fp('th', 0)}) + ({fp('th2', 31)}) AS sh FROM
               (SELECT doc_id, {th} AS th, {th2} AS th2 FROM {src})),
    bands0 AS (SELECT doc_id, sh, q AS band_no, (sh >> (q * 16)) % 65536 AS band_val
               FROM s, range(0, 4) r(q)),
    bands AS (SELECT * FROM bands0
              QUALIFY COUNT(*) OVER (PARTITION BY band_no, band_val) <= {dedup.LSH_MAX_BUCKET}),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.sh AS sa, b.sh AS sb
             FROM bands a JOIN bands b USING (band_no, band_val)
             WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: banded simhash64 pair graph closed under
    transitivity via the R4 connected-components operator reused on graft
    data (dedup.dedup_clusters); singletons keep their own id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dedup_clusters(docs)


def o_dedup_clusters() -> str:
    """Transitive closure by recursive CTE (min reachable id = cluster) —
    fine at oracle scale; the engine side uses log-diameter pointer
    jumping instead.  Mirrors the r4 pre-collapse: exact duplicates fold
    to their min-doc_id representative by 62-bit fingerprint BEFORE the
    banded pair graph, and every doc inherits its rep's cluster
    (ADVICE.md r3 — a giant identical-text group can no longer lose all
    its edges to the band-bucket cap)."""
    fp62 = dedup.fingerprint62_duckdb_sql("text")
    return f"""
    WITH RECURSIVE
    fps AS (SELECT doc_id, text, {fp62} AS fp FROM documents),
    reps AS (SELECT MIN(doc_id) AS doc_id, MIN(text) AS text, fp
             FROM fps GROUP BY fp),
    p AS (SELECT doc_a, doc_b FROM ({o_simhash64_neardup('reps')})),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM p
              UNION ALL SELECT doc_b, doc_a FROM p),
    reach(node, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a),
    comp AS (SELECT node AS rep_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    repc AS (SELECT rp.fp, COALESCE(c.cluster_id, rp.doc_id) AS cluster_id
             FROM reps rp LEFT JOIN comp c ON rp.doc_id = c.rep_id),
    allc AS (SELECT f.doc_id, rc.cluster_id
             FROM fps f JOIN repc rc ON f.fp IS NOT DISTINCT FROM rc.fp)
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM allc
    """


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain stats over synthesized pages; the oracle re-derives the
    url scheme in closed form (page synthesis is pure SQL)."""
    return text.domain_stats(synth.pages(spark, 3000))


def o_domain_stats() -> str:
    return """
    WITH p AS (
      SELECT 'site' || CAST(id % 997 AS VARCHAR) || '.example' AS domain,
             list_extract(['en','de','fr','es'], CAST(id % 4 AS INT) + 1) AS lang
      FROM range(0, 3000) t(id))
    SELECT domain, COUNT(*) AS n_pages, COUNT(DISTINCT lang) AS n_langs
    FROM p GROUP BY domain
    """


def q_r19_union_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19 over the FULL inference pipeline (filter -> R4 join -> R5 split
    -> R6/R7 -> R8 -> R17 -> R18 -> R12/13 sidewalks -> R14/15/16
    crosswalks -> union): per-kind way and vertex-ref counts on the G=8
    grid city."""
    from . import pipeline
    nodes, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
    net = pipeline.build_network(nodes, ways)
    return (net.groupBy("kind")
            .agg(F.count("*").alias("n_ways"),
                 F.sum(F.size("node_ids")).cast("long").alias("n_vertex_refs")))


def o_r19_union_kinds() -> str:
    """Closed-form counts, derived not observed: R4 merges exactly two
    same-highway corner pairs (H0+V0 at node 0, H7+V7 at node 63 — the
    only corner nodes where both incident ways share a highway class),
    producing two 15-vertex L-ways.  Each L-way's corner vertex is no
    longer an intersection (one distinct way), so R5 splits it into 12
    two-vertex segments + one 3-vertex corner segment: streets = 6*7 + 6*7
    + 2*13 = 110 ways, refs = 84 + 84 + 2*27 = 222.  Sidewalks double
    that (two per street).  Crosswalks: 36 interior intersections keep 4
    arms, 24 border non-corner nodes keep 3 (corner nodes drop to 2 after
    the merges and are ineligible): 36*4 + 24*3 = 216 two-vertex rings."""
    return """
    SELECT * FROM (VALUES
      ('street',    CAST(110 AS BIGINT), CAST(222 AS BIGINT)),
      ('sidewalk',  CAST(220 AS BIGINT), CAST(444 AS BIGINT)),
      ('crosswalk', CAST(216 AS BIGINT), CAST(432 AS BIGINT))
    ) t(kind, n_ways, n_vertex_refs)
    """


def q_r1_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: highway-tag whitelist filter — per-class way counts after the
    filter (the grid's footway/service noise ways must vanish)."""
    _, ways = synth.osm_grid(spark, g=G, with_noise_ways=True)
    return (N.filter_streets(ways)
            .groupBy("highway").agg(F.count("*").alias("n_ways")))


def o_r1_whitelist() -> str:
    # 8 H + 8 V ways, class = HIGHWAYS[id % 4] with id 0..7 on each axis
    # => 4 ways per class; the 8 footway/service noise ways are dropped
    return """
    SELECT * FROM (VALUES
      ('residential', CAST(4 AS BIGINT)), ('primary', CAST(4 AS BIGINT)),
      ('secondary', CAST(4 AS BIGINT)), ('tertiary', CAST(4 AS BIGINT))
    ) t(highway, n_ways)
    """


def q_r15_crosswalk_corners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14 (CCW angular sort) + R15 (bisector corner placement) + R16a
    (ring construction) on the single 4-way cross_city intersection."""
    gw = synth.cross_city_gw(spark)
    cw = SW.make_crosswalks(gw, None)
    return cw.select(
        "way_id", "intersection_node_id",
        F.round(F.expr("lats[0]"), 9).alias("lat_a"),
        F.round(F.expr("lngs[0]"), 9).alias("lng_a"),
        F.round(F.expr("lats[1]"), 9).alias("lat_b"),
        F.round(F.expr("lngs[1]"), 9).alias("lng_b"))


def o_r15_crosswalk_corners() -> str:
    """Closed form: exactly-axis-aligned arms give EXACT unit vectors, so
    corner k (CCW from the SE quadrant — argsort of atan2 angles
    -pi/2, 0, pi/2, pi puts S,E,N,W in that order) sits at
    center + (sx, sy) * ((1/sqrt(2)) * 5.657) meters, with the same
    divide-then-multiply op order the numpy kernel uses.  Way k connects
    corner k to corner (k+1) % 4."""
    s = "((1.0e0 / SQRT(2.0e0)) * 5.657e0)"
    cs = sqlfns.coslat_sql("47.6e0")
    lat = f"ROUND(47.6e0 + (sy * {s}) / 111111.0e0, 9)"
    lng = f"ROUND(-122.33e0 + (sx * {s}) / (111111.0e0 * {cs}), 9)"
    lat2 = lat.replace("sy", "sy2")
    lng2 = lng.replace("sx", "sx2")
    return f"""
    WITH c(k, sx, sy) AS (VALUES (0, 1.0e0, -1.0e0), (1, 1.0e0, 1.0e0),
                                 (2, -1.0e0, 1.0e0), (3, -1.0e0, -1.0e0)),
    n AS (SELECT k, sx AS sx2, sy AS sy2 FROM c)
    SELECT CAST(2000000000 + 100 + c.k AS BIGINT) AS way_id,
           CAST(1 AS BIGINT) AS intersection_node_id,
           {lat} AS lat_a, {lng} AS lng_a, {lat2} AS lat_b, {lng2} AS lng_b
    FROM c JOIN n ON n.k = (c.k + 1) % 4
    """


def q_lsh_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_topk_multiprobe(emb, emb.filter("vec_id % 25 = 0"), k=3)


def o_lsh_topk_multiprobe() -> str:
    from ..operators import similarity
    dot = _duck_dot("q.embedding", "c.embedding")
    nq, nc = _duck_norm("q.embedding"), _duck_norm("c.embedding")
    sq, sc = _duck_lsh_sig("q.embedding"), _duck_lsh_sig("c.embedding")
    probe = (f"(CASE WHEN p = 0 THEN {sq} "
             f"ELSE xor({sq}, CAST(POWER(2, p - 1) AS BIGINT)) END)")
    return f"""
    SELECT query_id, corpus_id, label, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, c.label,
             ROUND({dot} / ({nq} * {nc}), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY ROUND({dot} / ({nq} * {nc}), 6) DESC, c.vec_id) AS rank
      FROM embeddings q
      CROSS JOIN range(0, {similarity.N_PLANES + 1}) t(p)
      JOIN embeddings c ON {probe} = {sc} AND q.vec_id != c.vec_id
      WHERE q.vec_id % 25 = 0
    ) WHERE rank <= 3
    """


def q_g4_pip_rot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-axis-aligned PIP oracle: diagonal streets make the buffers
    rotated rectangles, so ray-casting is exercised on edges where a bbox
    test would NOT be equivalent (VERDICT.md r1 'What's wrong' #7)."""
    pts = _points(spark, sf_dir, bbox=True)
    gw = synth.diag_city_gw(spark)
    bufs = SP.street_buffers(SP.street_segments(gw), half_width_m=HW,
                             res=SP.PIP_COVER_RES)
    out = SP.pip_join(pts, bufs, cover_res=SP.PIP_COVER_RES)
    mids = bufs.select(
        "segment_id",
        F.round((F.col("alat") + F.col("blat")) / 2, 6).alias("seg_mid_lat"),
        F.round((F.col("alng") + F.col("blng")) / 2, 6).alias("seg_mid_lng"))
    return (out.join(mids, "segment_id")
            .select("url", "entity", "cell9", F.round("dist_m", 4).alias("dist_r4"),
                    "seg_mid_lat", "seg_mid_lng"))


def o_g4_pip_rot() -> str:
    lng0 = f"({synth.DIAG_LNG0} + w * {sqlfns.dlit(synth.DIAG_STEP_LNG_DEG)})"
    alat, alng = "47.5995e0", lng0
    blat = f"(47.5995e0 + {sqlfns.dlit(synth.DIAG_LEN_DEG)})"
    blng = f"({lng0} + {sqlfns.dlit(synth.DIAG_LEN_LNG_DEG)})"
    inside = sqlfns.rect_inside_sql("p.lat", "p.lng", alat, alng, blat, blng, HW)
    dist = sqlfns.seg_dist_sql("p.lat", "p.lng", alat, alng, blat, blng)
    return f"""
    SELECT p.url, p.entity, p.cell9, ROUND({dist}, 4) AS dist_r4,
           ROUND(({alat} + {blat}) / 2, 6) AS seg_mid_lat,
           ROUND(({alng} + {blng}) / 2, 6) AS seg_mid_lng
    FROM ({_duck_points(bbox=True)}) p, range(0, {synth.DIAG_WAYS}) t(w)
    WHERE {inside}
    """


# --------------------------------------------------------------------------
# round-3 oracle entries: the last four §2 operators without a direct
# CORRECTNESS row (VERDICT.md r2 'Next round' #3) — R16b sidewalk-endpoint
# rewiring, G7 per-partition lineage, R21 staged CLI + resume, G1 catalog
# manifest.
# --------------------------------------------------------------------------


def q_r16_rewire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16b (swap_nodes): endpoint splice onto the nearest crosswalk corner
    within 8 m, on the rewire oracle city — start corners 2..6 m away snap
    (unique nearest, 30 m to the next candidate), every third way's corner
    sits 9.5 m away and must NOT snap, odd ways have no end corner at all
    (the left-join null path)."""
    sw = synth.rewire_city_sidewalks(spark)
    corners = synth.rewire_city_corners(spark)
    out = SW.rewire_sidewalk_endpoints(sw, corners)
    return out.select(
        "way_id",
        F.element_at("node_ids", 1).alias("first_node"),
        F.element_at("node_ids", -1).alias("last_node"),
        F.round(F.expr("lats[0]"), 9).alias("lat_first"),
        F.round(F.expr("ELEMENT_AT(lats, -1)"), 9).alias("lat_last"),
        F.round(F.expr("lngs[0]"), 9).alias("lng_first"))


def o_r16_rewire() -> str:
    dy = sqlfns.dlit(synth.RW_DY_DEG)
    s_lat = synth.rewire_city_start_corner_lat_sql("w")
    e_lat = synth.rewire_city_end_corner_lat_sql("w")
    return f"""
    SELECT w AS way_id,
           CAST(CASE WHEN w % 3 = 2 THEN w * 10 ELSE 5000 + w END AS BIGINT) AS first_node,
           CAST(CASE WHEN w % 2 = 0 THEN 6000 + w ELSE w * 10 + 2 END AS BIGINT) AS last_node,
           ROUND(CASE WHEN w % 3 = 2 THEN 47.6e0 ELSE {s_lat} END, 9) AS lat_first,
           ROUND(CASE WHEN w % 2 = 0 THEN {e_lat} ELSE 47.6e0 + 2 * {dy} END, 9) AS lat_last,
           ROUND({synth.rewire_city_lng_sql('w')}, 9) AS lng_first
    FROM range(0, {synth.RW_WAYS}) t(w)
    """


# one staged run (fresh + resumed) shared by the G7 and R21 entries;
# buffers total below: the g=8 full-pipeline network has 220 sidewalk ways
# with 444 vertex refs (o_r19_union_kinds closed form), so segments =
# refs - ways = 224 buffer rows.
_STAGED_BUFFER_ROWS = 224
_STAGED_CACHE: dict = {}


def _staged_run(spark: SparkSession, sf_dir: str):
    import tempfile

    from . import pipeline
    key = (id(spark), sf_dir)
    if key not in _STAGED_CACHE:
        out_dir = _tmp_dir(prefix="staged_oracle_")
        c1 = pipeline.run_staged(spark, sf_dir, out_dir, grid=G, resume=True)
        c2 = pipeline.run_staged(spark, sf_dir, out_dir, grid=G, resume=True)
        _STAGED_CACHE.clear()
        _STAGED_CACHE[key] = (out_dir, c1, c2)
    return _STAGED_CACHE[key]


def q_g7_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: per-partition lineage rows recorded by the staged run — exact
    per-part_id row counts for the points and tiles stages (closed form:
    pmod(cell9, 32) over the documents-derived points) plus the buffers
    stage total."""
    from ..operators import lineage
    out_dir, _, _ = _staged_run(spark, sf_dir)
    m = lineage.stage_metrics(spark, out_dir)
    per_part = (m.filter(F.col("stage").isin(["points", "tiles"]))
                .select("stage", "part_id", F.col("rows").alias("n_rows")))
    buf = (m.filter("stage = 'buffers'").agg(F.sum("rows").alias("n_rows"))
           .select(F.lit("buffers").alias("stage"),
                   F.lit(-1).cast("long").alias("part_id"), "n_rows"))
    return per_part.unionByName(buf)


def o_g7_lineage() -> str:
    return f"""
    WITH pts AS (SELECT * FROM ({_duck_points()}))
    SELECT 'points' AS stage, cell9 % 32 AS part_id, COUNT(*) AS n_rows
    FROM pts GROUP BY 2
    UNION ALL
    SELECT 'tiles' AS stage, cell9 % 32 AS part_id, COUNT(DISTINCT cell9) AS n_rows
    FROM pts GROUP BY 2
    UNION ALL
    SELECT 'buffers', CAST(-1 AS BIGINT), CAST({_STAGED_BUFFER_ROWS} AS BIGINT)
    """


def q_r21_staged_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21: the staged spark-submit entry run twice into the same output
    dir — the resumed run must anti-join every completed partition away and
    return identical per-stage counts (driver-side literals are fine here:
    the compared values ARE the two runs' scalar counts)."""
    _, c1, c2 = _staged_run(spark, sf_dir)
    rows = [(s, int(c1[s]), int(c2[s])) for s in ("points", "buffers", "tiles")]
    return spark.createDataFrame(
        rows, "stage string, n_rows_first bigint, n_rows_resumed bigint")


def o_r21_staged_resume() -> str:
    b = _STAGED_BUFFER_ROWS
    return f"""
    WITH pts AS (SELECT * FROM ({_duck_points()}))
    SELECT 'points' AS stage, COUNT(*) AS n_rows_first, COUNT(*) AS n_rows_resumed FROM pts
    UNION ALL
    SELECT 'buffers', CAST({b} AS BIGINT), CAST({b} AS BIGINT)
    UNION ALL
    SELECT 'tiles', COUNT(DISTINCT cell9), COUNT(DISTINCT cell9) FROM pts
    """


def q_g1_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: catalog write -> manifest snapshot -> load round-trip.  One
    writer task (coalesce(1)) + partitionBy(lang) makes the file count
    deterministic: exactly one parquet file per distinct lang."""
    import tempfile

    from ..sources.catalog import Catalog
    root = _tmp_dir(prefix="g1_catalog_")
    cat = Catalog(spark, root)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cat.write("docs_by_lang", docs.coalesce(1), partition_by=["lang"])
    man = cat.manifest("docs_by_lang")
    n_rows = cat.load("docs_by_lang").count()
    rows = [(man["table"], len(man["files"]), ",".join(man["partition_spec"]),
             len(man["schema"]["fields"]), int(n_rows),
             cat.tables() == ["docs_by_lang"])]
    return spark.createDataFrame(
        rows, "table_name string, n_files bigint, partition_cols string, "
              "n_schema_fields bigint, n_rows bigint, listed boolean")


def o_g1_manifest() -> str:
    return """
    SELECT 'docs_by_lang' AS table_name, COUNT(DISTINCT lang) AS n_files,
           'lang' AS partition_cols, CAST(5 AS BIGINT) AS n_schema_fields,
           COUNT(*) AS n_rows, TRUE AS listed
    FROM documents
    """


def q_g1_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1c: snapshot append + time travel — write the even docs as snapshot
    0, append the odd docs as snapshot 1, then read BOTH snapshots back;
    the oracle recomputes each snapshot's row and file counts (one file
    per lang per snapshot: coalesce(1) + partitionBy(lang)) from
    `documents` in closed form."""
    import tempfile

    from ..sources.catalog import Catalog
    cat = Catalog(spark, _tmp_dir(prefix="g1_tt_"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cat.write("docs", docs.filter("doc_id % 2 = 0").coalesce(1),
              partition_by=["lang"])
    cat.write("docs", docs.filter("doc_id % 2 = 1").coalesce(1),
              partition_by=["lang"], mode="append")
    rows = [
        (0, int(cat.load("docs", snapshot_id=0).count()),
         len(cat.manifest("docs", snapshot_id=0)["files"])),
        (1, int(cat.load("docs").count()), len(cat.manifest("docs")["files"])),
    ]
    return spark.createDataFrame(
        rows, "snapshot_id int, n_rows bigint, n_files bigint")


def o_g1_time_travel() -> str:
    return """
    SELECT CAST(0 AS INT) AS snapshot_id,
           (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0) AS n_rows,
           (SELECT COUNT(DISTINCT lang) FROM documents WHERE doc_id % 2 = 0) AS n_files
    UNION ALL
    SELECT CAST(1 AS INT),
           (SELECT COUNT(*) FROM documents),
           (SELECT COUNT(DISTINCT lang) FROM documents WHERE doc_id % 2 = 0)
           + (SELECT COUNT(DISTINCT lang) FROM documents WHERE doc_id % 2 = 1)
    """


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivf_topk(emb, emb.filter("vec_id % 17 = 0"), k=5)


def o_ivf_topk() -> str:
    dot_cm = _duck_dot("c.embedding", "m.embedding")
    dot_qm = _duck_dot("q.embedding", "m.embedding")
    dot_qc = _duck_dot("q.embedding", "c.embedding")
    nc, nm = _duck_norm("c.embedding"), _duck_norm("m.embedding")
    nq = _duck_norm("q.embedding")
    return f"""
    WITH cent AS (SELECT centroid_id, embedding FROM (
                    SELECT vec_id AS centroid_id, embedding,
                           ROW_NUMBER() OVER (ORDER BY
                             ((vec_id % 1000003) * 2654435761) % 1000003,
                             vec_id) AS rn
                    FROM embeddings) WHERE rn <= 32),
    assigned AS (
      SELECT corpus_id, label, centroid_id FROM (
        SELECT c.vec_id AS corpus_id, c.label, m.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 ROUND({dot_cm} / ({nc} * {nm}), 6) DESC, m.centroid_id) AS rn
        FROM embeddings c CROSS JOIN cent m) WHERE rn = 1),
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.vec_id AS query_id, m.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 ROUND({dot_qm} / ({nq} * {nm}), 6) DESC, m.centroid_id) AS rn
        FROM embeddings q CROSS JOIN cent m WHERE q.vec_id % 17 = 0) WHERE rn <= 3)
    SELECT query_id, corpus_id, label, centroid_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT p.query_id, a.corpus_id, a.label, a.centroid_id,
             ROUND({dot_qc} / ({nq} * {nc}), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
               ROUND({dot_qc} / ({nq} * {nc}), 6) DESC, a.corpus_id) AS rank
      FROM probes p JOIN assigned a USING (centroid_id)
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings c ON c.vec_id = a.corpus_id
      WHERE p.query_id != a.corpus_id) WHERE rank <= 5
    """


def _duck_shingles(col: str = "text", w: int = 3) -> str:
    """DuckDB twin of dedup._shingles (list_slice bounds are 1-based
    INCLUSIVE: i+1 .. i+w = w elements starting at 0-based index i, exactly
    Spark's SLICE(t, i+1, w))."""
    t = _duck_tokens(col)
    return (f"CASE WHEN len({t}) >= {w} THEN "
            f"list_transform(range(0, len({t}) - {w} + 1), "
            f"i -> array_to_string(list_slice({t}, i + 1, i + {w}), ' ')) "
            f"ELSE {t} END")


def q_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.shingle_jaccard_pairs(docs, threshold=0.5)


def o_shingle_jaccard() -> str:
    sh = _duck_shingles()
    th = (f"list_transform(list_distinct({sh}), t -> "
          + sqlfns.polyhash_duckdb("t") + ")")
    j = ("ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) "
         "/ (a.nt + b.nt - len(list_intersect(a.t, b.t))), 6)")
    return f"""
    WITH cand AS (SELECT doc_a, doc_b FROM ({o_minhash_lsh(th)})),
    toks AS (SELECT doc_id, list_sort(list_distinct({sh})) AS t,
                    len(list_distinct({sh})) AS nt FROM documents)
    SELECT doc_a, doc_b, {j} AS jaccard
    FROM cand JOIN toks a ON cand.doc_a = a.doc_id
              JOIN toks b ON cand.doc_b = b.doc_id
    WHERE {j} >= 0.5e0
    """


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize with a REAL SQL oracle: the sandbox fake decode
    (payload = utf-8 bytes of REPEAT(first-8-chars, 16), tiled row-major
    over the declared 64x48 grid) is SQL-derivable, so the numpy
    nearest-neighbor gather has the closed form
        pixel(pos) = ascii(s[(((pos DIV 7)*48 DIV 5)*64
                              + ((pos % 7)*64 DIV 7)) % len(s)])
    for the 5x7 output used below.  The /255 rounding
    is bit-identical cross-engine for all 256 byte values (verified in
    tests/test_dedup_text.py).  ASCII-only guard: rows where the 8-char
    prefix has multi-byte chars are excluded in BOTH engines (LENGTH vs
    OCTET_LENGTH would desync the byte-index math)."""
    from ..operators import multimodal
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id % 5 = 0 AND n_chars >= 8")
            .filter("OCTET_LENGTH(SUBSTRING(text, 1, 8)) = 8"))
    media = docs.select(
        F.expr("CONCAT('doc://', CAST(doc_id AS STRING))").alias("url"),
        F.lit("image").alias("media_type"),
        F.expr("CAST(REPEAT(SUBSTRING(text, 1, 8), 16) AS BINARY)").alias("payload"),
        F.lit(64).alias("width"), F.lit(48).alias("height"),
        F.lit(1).alias("n_frames"))
    # out 7x5 (not 8x6): with the payload's repeat period of 8, an 8-wide
    # output samples only source columns ≡ 0 (mod 8) — every pixel equals
    # s[0] and the oracle is near-vacuous (review r3).  Width 7 makes the
    # sampled column set {0,9,18,27,36,45,54}, i.e. all residues 0..6, so
    # transposed/mis-strided gathers change the output.
    resized = multimodal.resize_images(media, out_w=7, out_h=5)
    return resized.select("url", F.posexplode("raster").alias("pos", "val"))


def o_multimodal_resize() -> str:
    # src pixel for output (i=pos//7, j=pos%7): row (i*48)//5, col (j*64)//7
    src = "(((pos // 7) * 48 // 5) * 64 + ((pos % 7) * 64 // 7))"
    return f"""
    WITH m AS (
      SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
             SUBSTRING(text, 1, 8) AS s
      FROM documents
      WHERE doc_id % 5 = 0 AND n_chars >= 8
        AND strlen(SUBSTRING(text, 1, 8)) = 8  -- strlen = byte length
    )
    SELECT url, CAST(pos AS INT) AS pos,
           ROUND(ascii(SUBSTRING(s, CAST({src} % length(s) AS INT) + 1, 1))
                 / 255.0, 6) AS val
    FROM m CROSS JOIN (SELECT UNNEST(generate_series(0, 34)) AS pos) p
    """


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1b: WARC container round-trip with a closed-form oracle — pages
    derived from `documents` are written through the distributed WARC sink
    (sources/warc.py), scanned back via the length-prefixed shredder, and
    re-extracted with the G2 byte-identity extractor.  The oracle
    recomputes every output column from `documents` in pure SQL: url and
    timestamp are id-derived, n_bytes = strlen(text) + 33 (the fixed
    `<html><body><p>`/`</p></body></html>` wrapper), and the extracted
    text must equal the original text byte-for-byte (documents text is
    single-spaced ASCII with no markup; guarded identically in both
    engines)."""
    import tempfile

    from ..operators import text as TX
    from ..sources import warc
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(_ROUNDTRIP_SAFE_SPARK))
    pages = docs.select(
        F.expr("CONCAT('doc://', CAST(doc_id AS STRING))").alias("url"),
        F.expr("TIMESTAMP '2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id)").alias("warc_ts"),
        F.expr("CAST(CONCAT('<html><body><p>', text, '</p></body></html>') AS BINARY)").alias("html"))
    d = _tmp_dir(prefix="warc_rt_")
    warc.write_warc(pages, d, shards=4).collect()  # materialize the sink manifest
    got = warc.scan_warc(spark, d)
    ext = TX.extract_text(got)
    return (got.join(ext, "url")
            .select("url", "warc_ts",
                    F.expr("CAST(OCTET_LENGTH(html) AS BIGINT)").alias("n_bytes"),
                    "text"))


_ROUNDTRIP_SAFE_SPARK = ("doc_id % 5 = 0 AND text NOT LIKE '%  %' AND "
                         "text NOT LIKE '%<%' AND text NOT LIKE '% ' AND "
                         "text NOT LIKE ' %' AND OCTET_LENGTH(text) = LENGTH(text)")
_ROUNDTRIP_SAFE_DUCK = ("doc_id % 5 = 0 AND text NOT LIKE '%  %' AND "
                        "text NOT LIKE '%<%' AND text NOT LIKE '% ' AND "
                        "text NOT LIKE ' %' AND strlen(text) = length(text)")


def o_warc_roundtrip() -> str:
    return f"""
    SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
           TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id) AS warc_ts,
           CAST(strlen(text) + 33 AS BIGINT) AS n_bytes,
           text
    FROM documents WHERE {_ROUNDTRIP_SAFE_DUCK}
    """


QUERIES.update({
    "minhash_signatures": (q_minhash_signatures, o_minhash_signatures),
    "multimodal_resize": (q_multimodal_resize, o_multimodal_resize),
    "warc_roundtrip": (q_warc_roundtrip, o_warc_roundtrip),
    "g6_vectorize": (q_g6_vectorize, o_g6_vectorize),
    "gemm_topk": (q_gemm_topk, o_ann_topk),  # exact op, same oracle as brute force
    "g1_time_travel": (q_g1_time_travel, o_g1_time_travel),
    "dedup_clusters": (q_dedup_clusters, o_dedup_clusters),
    "domain_stats": (q_domain_stats, o_domain_stats),
    "incremental_dedup": (q_incremental_dedup, o_incremental_dedup),
    "deterministic_sample": (q_deterministic_sample, o_deterministic_sample),
    "token_histogram": (q_token_histogram, o_token_histogram),
    "simhash_pairs": (q_simhash_pairs, o_simhash_pairs),
    "lsh_topk": (q_lsh_topk, o_lsh_topk),
    "r18_way_lengths": (q_r18_way_lengths, o_r18_way_lengths),
    "multimodal_features": (q_multimodal_features, o_multimodal_features),
    "extract_text_identity": (q_extract_text, None),
    "r4_way_join": (q_r4_way_join, o_r4_way_join),
    "r6_parallel_pairs": (q_r6_parallel_pairs, o_r6_parallel_pairs),
    "r7_parallel_merge": (q_r7_parallel_merge, o_r7_parallel_merge),
    "r8_node_merge": (q_r8_node_merge, o_r8_node_merge),
    "r17_simplify": (q_r17_simplify, o_r17_simplify),
    "r20_geojson": (q_r20_geojson, o_r20_geojson),
    "simhash64_neardup": (q_simhash64_neardup, o_simhash64_neardup),
    "g4_pip_join_rot": (q_g4_pip_rot, o_g4_pip_rot),
    "lsh_topk_multiprobe": (q_lsh_topk_multiprobe, o_lsh_topk_multiprobe),
    "r19_union_kinds": (q_r19_union_kinds, o_r19_union_kinds),
    "r15_crosswalk_corners": (q_r15_crosswalk_corners, o_r15_crosswalk_corners),
    "r1_whitelist": (q_r1_whitelist, o_r1_whitelist),
    "r16_rewire": (q_r16_rewire, o_r16_rewire),
    "g7_lineage": (q_g7_lineage, o_g7_lineage),
    "r21_staged_resume": (q_r21_staged_resume, o_r21_staged_resume),
    "g1_manifest": (q_g1_manifest, o_g1_manifest),
    "ivf_topk": (q_ivf_topk, o_ivf_topk),
    "shingle_jaccard_pairs": (q_shingle_jaccard, o_shingle_jaccard),
})


# --- G1d/G1e: metadata file-skipping + copy-on-write merge/delete -------------
# Z-ordered layout + per-file min/max stats (sources/catalog.py) are the
# Iceberg-metadata half of the 100 TB scan story: a rectangle query plans
# against the manifest JSON and reads a handful of files.  The ORACLE proves
# the correctness boundary (pruned scan + residual filter == plain SQL
# filter); the prune-actually-happens claim is pinned by tests/test_catalog
# (layout-dependent file counts are not oracle material — repartitionByRange
# samples its boundaries).

_FS_RES = 9
_FS_S = 360.0 / 2 ** (_FS_RES + 9)
_FS_CI_BASE = math.floor((-122.33 + 180.0) / _FS_S) - 32
_FS_CJ_BASE = math.floor((47.60 + 90.0) / _FS_S) - 32
# local coords land in [32-8, 32+8]; (0..32, 0..32) = south-west quadrant
_FS_RANGES = {"ci": (0, 32), "cj": (0, 32)}
_FS_CI = f"((cell9 % {sqlfns.POW2_28}) - {_FS_CI_BASE})"
_FS_CJ = (f"(CAST(FLOOR((cell9 % {sqlfns.POW2_56}) / {sqlfns.POW2_28}) "
          f"AS BIGINT) - {_FS_CJ_BASE})")


def q_g1_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.catalog import Catalog
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = synth.geo_entities_from_documents(docs).selectExpr(
        "url", "entity", "cell9",
        f"{_FS_CI} AS ci", f"{_FS_CJ} AS cj")
    cat = Catalog(spark, _tmp_dir(prefix="g1_fskip_"))
    cat.write("points", pts, zorder_by=("ci", "cj"), target_files=8)
    return cat.scan("points", _FS_RANGES).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("entity").alias("n_entities"),
        F.expr(f"CAST(SUM(cell9 % {_AUDIT_SQ_MOD}) AS BIGINT)").alias("sm_cell"))


def o_g1_file_skip() -> str:
    (ci_lo, ci_hi), (cj_lo, cj_hi) = _FS_RANGES["ci"], _FS_RANGES["cj"]
    return f"""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT entity) AS n_entities,
           CAST(SUM(cell9 % {_AUDIT_SQ_MOD}) AS BIGINT) AS sm_cell
    FROM (SELECT *, {_FS_CI} AS ci, {_FS_CJ} AS cj
          FROM ({synth.geo_entities_duckdb_sql()}))
    WHERE ci >= {ci_lo} AND ci <= {ci_hi} AND cj >= {cj_lo} AND cj <= {cj_hi}
    """


_MD_DEL_LO, _MD_DEL_HI = 0, 199


def q_g1_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1e: COW upsert (modify every doc_id%13==5, insert shifted new ids)
    then COW range-delete — final state read back through the file-ref
    manifest and aggregated per lang.  Base files are doc_id-ranged so the
    key stats are selective (the file-reuse counters are pinned in pytest,
    not here: file counts depend on sampled range boundaries)."""
    import tempfile

    from ..sources.catalog import Catalog
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "n_chars"))
    cat = Catalog(spark, _tmp_dir(prefix="g1_md_"))
    cat.write("docs", docs.repartitionByRange(4, "doc_id")
              .sortWithinPartitions("doc_id"))
    ups = (docs.filter("doc_id % 13 = 5")
           .selectExpr("doc_id", "lang", "n_chars + 1000000 AS n_chars")
           .unionByName(docs.filter("doc_id % 50 = 0").selectExpr(
               "doc_id + 10000000 AS doc_id", "'xx' AS lang",
               "doc_id % 100 AS n_chars")))
    cat.merge("docs", ups, "doc_id")
    cat.delete_where("docs", {"doc_id": (_MD_DEL_LO, _MD_DEL_HI)})
    return (cat.load("docs").groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("sum_chars"),
        F.expr("CAST(SUM(doc_id) AS BIGINT)").alias("sum_id")))


def o_g1_merge_delete() -> str:
    return f"""
    WITH ups AS (
      SELECT doc_id, lang, n_chars + 1000000 AS n_chars
      FROM documents WHERE doc_id % 13 = 5
      UNION ALL
      SELECT doc_id + 10000000, 'xx', doc_id % 100
      FROM documents WHERE doc_id % 50 = 0),
    merged AS (
      SELECT b.doc_id, b.lang, b.n_chars FROM documents b
      WHERE b.doc_id NOT IN (SELECT doc_id FROM ups)
      UNION ALL SELECT * FROM ups)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id
    FROM merged
    WHERE NOT COALESCE(doc_id >= {_MD_DEL_LO} AND doc_id <= {_MD_DEL_HI}, FALSE)
    GROUP BY lang
    """


# the grid city occupies local lattice ci 32..38, cj 32..36 (anchor cell
# = 32 by construction of _FS_*_BASE); this rectangle is its WEST HALF —
# selective against the full entity cloud (local [24, 40]^2) so the
# z-order layout actually prunes, while still containing street buffers
# so the downstream PIP join has real matches to verify
_CP_RANGES = {"ci": (32, 35), "cj": (32, 36)}


def q_g1_catalog_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule composition (BASELINE.json): the PIP spatial join runs
    OVER a catalog table, not raw parquet — pages-derived geo points are
    written once to a Z-ordered (Morton ci,cj) snapshot, the city
    rectangle is planned against per-file min/max stats (only overlapping
    files are read), and the join + exact refine consume the pruned scan.
    At 10^12 pages this metadata step is the difference between a
    full-table scan and a handful of file reads BEFORE the join starts;
    correctness is oracle-exact because scan() re-applies the rectangle
    as a residual filter over the kept files."""
    import tempfile

    from ..sources.catalog import Catalog
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = synth.geo_entities_from_documents(docs).selectExpr(
        "url", "entity", "lat", "lng", "cell9",
        f"{_FS_CI} AS ci", f"{_FS_CJ} AS cj")
    cat = Catalog(spark, _tmp_dir(prefix="g1_cpip_"))
    cat.write("pages_points", pts, zorder_by=("ci", "cj"), target_files=8)
    city = cat.scan("pages_points", _CP_RANGES)
    out = SP.pip_join(city, _grid_buffers(spark))
    bufs = _grid_buffers(spark).select(
        "segment_id",
        F.round((F.col("alat") + F.col("blat")) / 2, 6).alias("seg_mid_lat"),
        F.round((F.col("alng") + F.col("blng")) / 2, 6).alias("seg_mid_lng"))
    return (out.join(bufs, "segment_id")
            .select("url", "entity", "cell9",
                    F.round("dist_m", 4).alias("dist_r4"),
                    "seg_mid_lat", "seg_mid_lng"))


def o_g1_catalog_pip() -> str:
    (ci_lo, ci_hi), (cj_lo, cj_hi) = _CP_RANGES["ci"], _CP_RANGES["cj"]
    pts = (f"SELECT * FROM (SELECT *, {_FS_CI} AS ci, {_FS_CJ} AS cj "
           f"FROM ({synth.geo_entities_duckdb_sql()})) "
           f"WHERE ci >= {ci_lo} AND ci <= {ci_hi} "
           f"AND cj >= {cj_lo} AND cj <= {cj_hi}")
    inside = sqlfns.rect_inside_sql("p.lat", "p.lng", "s.alat", "s.alng",
                                    "s.blat", "s.blng", HW)
    dist = sqlfns.seg_dist_sql("p.lat", "p.lng",
                               "s.alat", "s.alng", "s.blat", "s.blng")
    return f"""
    SELECT p.url, p.entity, p.cell9,
           ROUND({dist}, 4) AS dist_r4,
           ROUND((s.alat + s.blat) / 2, 6) AS seg_mid_lat,
           ROUND((s.alng + s.blng) / 2, 6) AS seg_mid_lng
    FROM ({pts}) p, ({_duck_sidewalk_segments()}) s
    WHERE {inside}
    """


QUERIES.update({
    "g1_file_skip": (q_g1_file_skip, o_g1_file_skip),
    "g1_merge_delete": (q_g1_merge_delete, o_g1_merge_delete),
    "g1_catalog_pip": (q_g1_catalog_pip, o_g1_catalog_pip),
})


# --- r4 training-pipeline additions -------------------------------------------

def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.pack_sequences(docs, budget_tokens=1024, n_shards=64)


def o_sequence_packing() -> str:
    h = sqlfns.polyhash_duckdb("CAST(doc_id AS VARCHAR)")
    nt = f"CAST(len({_duck_tokens()}) AS BIGINT)"
    return f"""
    WITH base AS (
      SELECT doc_id,
             lang || '/' || CAST(({h}) % 64 AS VARCHAR) AS shard,
             {nt} AS n_tokens
      FROM documents),
    cum AS (
      SELECT doc_id, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS BIGINT)) AS start_tok
      FROM base)
    SELECT doc_id, shard, n_tokens,
           CAST(start_tok // 1024 AS BIGINT) AS seq_id,
           CAST(start_tok % 1024 AS BIGINT) AS seq_offset
    FROM cum
    """


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 97th doc plays the held-out benchmark.  w=4 here (the
    operator default is the published w=8 convention): the synthetic
    near-dups edit tokens frequently enough that no 8-gram survives
    across documents — at w=8 the only hits are the benchmark docs'
    self-overlap — while w=4 also catches 8 genuine non-benchmark
    contaminated docs at sf0.01, so BOTH behaviors (self-drop and
    cross-doc contamination) are exercised non-vacuously."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.decontaminate(docs, docs.filter("doc_id % 97 = 0"), w=4)


def o_decontaminate() -> str:
    return f"SELECT * FROM ({_duck_contaminated(w=4)})"


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.ngram_counts(docs, w=2, top_k=100)


def o_ngram_counts() -> str:
    t = _duck_tokens()
    grams = (f"CASE WHEN len({t}) >= 2 THEN "
             f"list_transform(range(0, len({t}) - 1), "
             f"i -> array_to_string(list_slice({t}, i + 1, i + 2), ' ')) "
             f"ELSE [] END")
    return f"""
    WITH ex AS (SELECT doc_id, unnest({grams}) AS ngram FROM documents),
    agg AS (SELECT ngram, COUNT(*) AS n_total,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM ex GROUP BY ngram)
    SELECT ngram, n_total, n_docs FROM agg
    QUALIFY ROW_NUMBER() OVER (ORDER BY n_total DESC, n_docs DESC, ngram) <= 100
    """


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic documents carry no PII, so the query plants
    deterministic email + phone strings on every 10th doc (identical
    construction in the oracle) — the scrub and both counters exercise
    real matches, not a vacuous all-zeros pass."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.expr("CASE WHEN doc_id % 10 = 0 THEN CONCAT(text, "
               "' call 555-123-4567 or mail u', CAST(doc_id AS STRING), "
               "'@mail.example now') ELSE text END").alias("text"))
    return text.pii_scrub(planted)


def o_pii_scrub() -> str:
    em, ph = text.PII_EMAIL_RE, text.PII_PHONE_RE
    return f"""
    WITH d2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' call 555-123-4567 or mail u'
                  || CAST(doc_id AS VARCHAR) || '@mail.example now'
                  ELSE text END AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{em}', '[EMAIL]', 'g'),
                          '{ph}', '[PHONE]', 'g') AS text_scrubbed,
           CAST(len(regexp_extract_all(text, '{em}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{ph}')) AS INT) AS n_phones
    FROM d2
    """


def q_incremental_dedup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental_dedup against the BUCKETED on-disk corpus fingerprint
    table — identical semantics (same DuckDB oracle as incremental_dedup)
    but the corpus side joins exchange-free off its bucket layout; the
    plan property is asserted in tests/test_dedup_text.py."""
    import os
    import tempfile
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # per-invocation path + table name: a shared fixed path would let two
    # concurrent sessions (driver + pytest) overwrite each other's bucket
    # files mid-scan (review r4).  The table name is the FULL mkdtemp
    # basename — tempfile's suffix alphabet includes '_', so slicing at
    # '_' could truncate the unique part or collide on a degenerate name
    # (second review pass); basename chars are all identifier-legal.
    # One tiny dir + catalog entry intentionally outlives the call: the
    # returned DataFrame reads the table lazily, so it cannot be dropped
    # here (bounded: one per driver/pytest invocation).
    path = _tmp_dir(prefix="fp_corpus_oracle_")
    table = os.path.basename(path)
    dedup.write_fingerprint_corpus(
        docs.filter("doc_id % 7 != 3"), table, path, n_buckets=16)
    return dedup.incremental_dedup_vs_table(
        docs.filter("doc_id % 7 = 3"), spark, table)


# planted URL variants: four syntactic forms of the same canonical page
# url derived from doc_id (identical construction in the oracle) — the
# operator must fold case on scheme+host and strip query/fragment
_URL_VARIANT_SPARK = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN CONCAT('https://site', CAST(doc_id % 50 AS STRING),
                         '.example/p/', CAST(doc_id % 200 AS STRING))
      WHEN 1 THEN CONCAT('https://SITE', CAST(doc_id % 50 AS STRING),
                         '.EXAMPLE/p/', CAST(doc_id % 200 AS STRING), '?utm_source=feed')
      WHEN 2 THEN CONCAT('HTTPS://Site', CAST(doc_id % 50 AS STRING),
                         '.Example?utm=home#section')
      ELSE CONCAT('https://site', CAST(doc_id % 50 AS STRING),
                  '.example/p/', CAST(doc_id % 200 AS STRING), '?ref=a#b')
    END"""

_URL_VARIANT_DUCK = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
                  || '.example/p/' || CAST(doc_id % 200 AS VARCHAR)
      WHEN 1 THEN 'https://SITE' || CAST(doc_id % 50 AS VARCHAR)
                  || '.EXAMPLE/p/' || CAST(doc_id % 200 AS VARCHAR) || '?utm_source=feed'
      WHEN 2 THEN 'HTTPS://Site' || CAST(doc_id % 50 AS VARCHAR)
                  || '.Example?utm=home#section'
      ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
           || '.example/p/' || CAST(doc_id % 200 AS VARCHAR) || '?ref=a#b'
    END"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(F.expr(_URL_VARIANT_SPARK).alias("url"))
    return text.url_dedup(pages)


def o_url_dedup() -> str:
    host = "regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1)"
    rest = f"SUBSTRING(url, LENGTH({host}) + 1)"
    canon = f"LOWER({host}) || regexp_replace({rest}, '[?#].*', '', 'g')"
    return f"""
    WITH p AS (SELECT ({_URL_VARIANT_DUCK}) AS url FROM documents)
    SELECT {canon} AS canonical_url, COUNT(*) AS n_variants,
           MIN(url) AS first_url
    FROM p GROUP BY 1
    """


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every third doc gets uppercase + punctuation planted so the fold
    and strip paths are exercised non-vacuously."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.expr("CASE WHEN doc_id % 3 = 0 THEN CONCAT(UPPER(text), '!! (End-Of-Doc)') "
               "ELSE text END").alias("text"))
    return text.normalize_text(planted)


def o_normalize_text() -> str:
    norm = ("TRIM(regexp_replace(regexp_replace(LOWER(text), "
            "'[^a-z0-9 ]', ' ', 'g'), '  *', ' ', 'g'))")
    return f"""
    WITH d2 AS (SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN UPPER(text) || '!! (End-Of-Doc)'
                     ELSE text END AS text FROM documents)
    SELECT doc_id, {norm} AS norm_text,
           CAST(LENGTH({norm}) AS BIGINT) AS n_norm_chars
    FROM d2
    """


QUERIES.update({
    "sequence_packing": (q_sequence_packing, o_sequence_packing),
    "decontaminate": (q_decontaminate, o_decontaminate),
    "ngram_counts": (q_ngram_counts, o_ngram_counts),
    "pii_scrub": (q_pii_scrub, o_pii_scrub),
    "incremental_dedup_bucketed": (q_incremental_dedup_bucketed, o_incremental_dedup),
    "url_dedup": (q_url_dedup, o_url_dedup),
    "normalize_text": (q_normalize_text, o_normalize_text),
})


# --- r4 second-wave additions --------------------------------------------------

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.repetition_stats(docs)


def o_repetition_stats() -> str:
    t = _duck_tokens()
    grams = (f"CASE WHEN len(t) >= 2 THEN "
             f"list_transform(range(0, len(t) - 1), "
             f"i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')) "
             f"ELSE [] END")
    return f"""
    WITH b AS (SELECT doc_id, {t} AS t FROM documents),
    s AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt,
                 CAST(len(list_distinct(t)) AS BIGINT) AS nu,
                 {grams} AS grams FROM b),
    g AS (SELECT doc_id, unnest(grams) AS gram FROM s),
    gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
    ga AS (SELECT doc_id, SUM(c) AS n2, MAX(c) AS mx,
                  SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
           FROM gc GROUP BY 1)
    SELECT s.doc_id, nt AS n_tokens,
           ROUND(CAST(nu AS DOUBLE) / GREATEST(nt, 1), 6) AS uniq_token_frac,
           ROUND(CAST(COALESCE(mx, 0) AS DOUBLE)
                 / GREATEST(COALESCE(n2, 0), 1), 6) AS top_2gram_frac,
           ROUND(CAST(COALESCE(dup, 0) AS DOUBLE)
                 / GREATEST(COALESCE(n2, 0), 1), 6) AS dup_2gram_frac
    FROM s LEFT JOIN ga USING (doc_id)
    """


# planted page structure for the boilerplate stripper: every doc in a
# domain shares a nav header + copyright footer (df = domain size), every
# 2nd doc shares a promo line (df >> min_docs), and the 'rare-' line pairs
# docs 250 apart — SAME domain (250 % 5 = 0) with df below min_docs at
# sf0.01, so the threshold boundary is exercised from both sides.
_BL_SPARK = ("CONCAT('nav: site', CAST(doc_id % 5 AS STRING), CHR(10), "
             "CASE WHEN doc_id % 2 = 0 THEN CONCAT('promo line', CHR(10)) "
             "ELSE '' END, "
             "'body: ', text, CHR(10), "
             "'rare-', CAST(doc_id % 250 AS STRING), CHR(10), "
             "'(c) site', CAST(doc_id % 5 AS STRING))")
_BL_DUCK = ("'nav: site' || CAST(doc_id % 5 AS VARCHAR) || chr(10) || "
            "CASE WHEN doc_id % 2 = 0 THEN 'promo line' || chr(10) "
            "ELSE '' END || "
            "'body: ' || text || chr(10) || "
            "'rare-' || CAST(doc_id % 250 AS VARCHAR) || chr(10) || "
            "'(c) site' || CAST(doc_id % 5 AS VARCHAR)")


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic documents are single-line, so the query plants the line
    structure (identical construction in the oracle): domain-wide nav +
    footer lines, a half-corpus promo line, and a df=2 'rare-' line that
    must SURVIVE the min_docs=3 threshold."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.selectExpr(
        "doc_id",
        "CONCAT('site', CAST(doc_id % 5 AS STRING), '.example') AS domain",
        f"{_BL_SPARK} AS text")
    return text.remove_boilerplate(planted, min_docs=3)


def o_remove_boilerplate() -> str:
    lines = "string_split(p.text, chr(10))"
    kept = ("list_filter(" + lines + ", x -> NOT COALESCE("
            "list_contains(bl.bl, x), FALSE))")
    return f"""
    WITH p AS (
      SELECT doc_id,
             'site' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS domain,
             {_BL_DUCK} AS text
      FROM documents),
    l AS (SELECT doc_id, domain, unnest(string_split(text, chr(10))) AS line
          FROM p),
    f AS (SELECT domain, line FROM l GROUP BY domain, line
          HAVING COUNT(DISTINCT doc_id) >= 3),
    bl AS (SELECT domain, list(line) AS bl FROM f GROUP BY domain)
    SELECT p.doc_id, p.domain,
           array_to_string({kept}, chr(10)) AS clean_text,
           CAST(len({kept}) AS INT) AS n_lines_kept,
           CAST(len({lines}) - len({kept}) AS INT) AS n_lines_dropped
    FROM p LEFT JOIN bl USING (domain)
    """


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (click -> latest preceding view per user):
    the union-marker single-shuffle plan vs DuckDB's NATIVE ASOF LEFT
    JOIN — an oracle that is not a re-derivation of our own template.
    (user_id, ts) is unique in the generator at every SF, so the match
    is deterministic without the tiebreak; the tiebreak column is still
    passed to pin Spark-side determinism."""
    from ..operators import temporal
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "event_id", "user_id", "ts",
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents")
    views = ev.filter("event_type = 'view'").selectExpr(
        "event_id AS view_event_id", "user_id", "ts",
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS view_cents")
    j = temporal.asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        payload={"view_event_id": "view_event_id", "ts": "view_ts",
                 "view_cents": "view_cents"},
        tiebreak="view_event_id")
    return j.select("event_id", "user_id", "ts", "cents",
                    "view_event_id", "view_ts", "view_cents")


def o_asof_join() -> str:
    return """
    WITH c AS (SELECT event_id, user_id, ts,
                      CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
               FROM events WHERE event_type = 'click'),
    v AS (SELECT event_id AS view_event_id, user_id, ts,
                 CAST(ROUND(value * 100, 0) AS BIGINT) AS view_cents
          FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, c.ts, c.cents,
           v.view_event_id, v.ts AS view_ts, v.view_cents
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """


def q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dedup_keep(docs)


def o_dedup_keep() -> str:
    return (f"SELECT doc_id, cluster_size AS n_collapsed FROM "
            f"({o_dedup_clusters()}) WHERE doc_id = cluster_id")


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (clicks landing inside 30-minute error
    windows per user) via the time-bucket equi-join plan; the DuckDB
    oracle is the straight theta join — again an INDEPENDENT derivation,
    not our own template re-run."""
    from ..operators import temporal
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "event_id", "user_id", "ts")
    errors = ev.filter("event_type = 'error'").selectExpr(
        "event_id AS err_event_id", "user_id", "ts AS err_start",
        "ts + INTERVAL 30 MINUTES AS err_end")
    j = temporal.interval_join(clicks, errors, on=["user_id"],
                               left_ts="ts", right_start="err_start",
                               right_end="err_end", bucket_s=1800)
    return j.select("event_id", "user_id", "ts",
                    "err_event_id", "err_start")


def o_interval_join() -> str:
    return """
    SELECT c.event_id, c.user_id, c.ts,
           e.event_id AS err_event_id, e.ts AS err_start
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND e.event_type = 'error'
    """


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.cdc_chunks(docs, w=8, mod=16)


def o_cdc_chunks() -> str:
    ph = sqlfns.polyhash_duckdb("substr(t, CAST(p - 7 AS INT), 8)")
    fp = sqlfns.polyhash_duckdb("sub")
    return f"""
    WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
    b AS (SELECT doc_id, t,
                 list_filter(range(8, length(t) + 1),
                             p -> ({ph}) % 16 = 0) AS bounds
          FROM d),
    c0 AS (SELECT doc_id, t,
                  list_prepend(CAST(0 AS BIGINT), bounds) AS cuts0 FROM b),
    c AS (SELECT doc_id, t,
                 CASE WHEN cuts0[-1] = length(t) THEN cuts0
                      ELSE list_append(cuts0, CAST(length(t) AS BIGINT))
                 END AS cuts
          FROM c0),
    ch AS (SELECT doc_id, t, cuts, unnest(range(1, len(cuts))) AS i FROM c),
    s AS (SELECT doc_id, i,
                 substr(t, CAST(cuts[CAST(i AS INT)] + 1 AS INT),
                        CAST(cuts[CAST(i AS INT) + 1]
                             - cuts[CAST(i AS INT)] AS INT)) AS sub
          FROM ch)
    SELECT doc_id, CAST(i - 1 AS INT) AS chunk_no,
           CAST(length(sub) AS BIGINT) AS chunk_len,
           CAST({fp} AS BIGINT) AS chunk_fp
    FROM s
    """


QUERIES.update({
    "repetition_stats": (q_repetition_stats, o_repetition_stats),
    "remove_boilerplate": (q_remove_boilerplate, o_remove_boilerplate),
    "asof_join": (q_asof_join, o_asof_join),
    "dedup_keep": (q_dedup_keep, o_dedup_keep),
    "interval_join": (q_interval_join, o_interval_join),
    "cdc_chunks": (q_cdc_chunks, o_cdc_chunks),
})


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=6: the synthetic corpus has ~24 docs sharing a duplicated 6-gram
    at sf0.01 (k=8 catches the same set; k=4 touches ~half the corpus),
    so both the removal and the pass-through paths are exercised."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.substring_dedup(docs, k=6)


def o_substring_dedup() -> str:
    k = 6
    t = _duck_tokens("COALESCE(text, '')")
    gram = (f"array_to_string(list_slice(t, CAST(p AS INT), "
            f"CAST(p + {k - 1} AS INT)), ' ')")
    gh = sqlfns.polyhash_duckdb("g")
    return f"""
    WITH d AS (SELECT doc_id, {t} AS t FROM documents),
    pos AS (SELECT doc_id, t,
                   CASE WHEN len(t) >= {k} THEN range(1, len(t) - {k} + 2)
                        ELSE [] END AS ps
            FROM d),
    occ0 AS (SELECT doc_id, t, unnest(ps) AS p FROM pos),
    occ AS (SELECT doc_id, p, {gram} AS g,
                   doc_id * 1048576 + p AS okey
            FROM occ0),
    oh AS (SELECT doc_id, p, okey, CAST({gh} AS BIGINT) AS gh FROM occ),
    dup AS (SELECT gh, MIN(okey) AS keep_key
            FROM oh GROUP BY gh HAVING COUNT(*) >= 2),
    rem AS (SELECT o.doc_id, o.p
            FROM oh o JOIN dup USING (gh) WHERE o.okey <> dup.keep_key),
    cov AS (SELECT doc_id,
                   list_distinct(flatten(list(range(p, p + {k})))) AS cv
            FROM rem GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(d.t) AS BIGINT) AS n_words,
           CAST(COALESCE(len(cov.cv), 0) AS BIGINT) AS n_words_removed,
           COALESCE(array_to_string(
             list_transform(
               list_filter(range(1, len(d.t) + 1),
                           i -> NOT COALESCE(list_contains(cov.cv, i), FALSE)),
               i -> d.t[CAST(i AS INT)]), ' '), '') AS clean_text
    FROM d LEFT JOIN cov USING (doc_id)
    """


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.quantize_embeddings(emb, bits=8)


def o_quantize_embeddings() -> str:
    qmax = 127
    v = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    code = f"CAST(FLOOR(x / s * {qmax} + 0.5) AS INT)"
    recon = f"(x - CAST({code} AS DOUBLE) * s / {qmax})"
    return f"""
    WITH e AS (SELECT vec_id, {v} AS v FROM embeddings),
    sc AS (SELECT vec_id, v,
                  GREATEST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(v, x -> ABS(x))),
                       (a, x) -> GREATEST(a, x)), 1e-30) AS s
           FROM e)
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           ROUND(s, 6) AS scale,
           list_min(list_transform(v, x -> {code})) AS code_min,
           list_max(list_transform(v, x -> {code})) AS code_max,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(v, x -> CAST({code} AS BIGINT))),
               (a, x) -> a + x) AS code_sum,
           ROUND(SQRT(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(v, x -> {recon} * {recon})),
               (a, x) -> a + x) / GREATEST(len(v), 1)), 6) AS rmse
    FROM sc
    """


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse int8-code search + exact float re-rank
    (similarity.quantized_topk); every arithmetic step of the coarse
    ranking is engine-exact, so the shortlist SET (not just the final
    ranks) is pinned by the twin."""
    from ..operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.quantized_topk(emb, emb.filter("vec_id % 25 = 0"),
                                     k=5, shortlist=4)


def o_quantized_topk() -> str:
    qmax, k, short = 127, 5, 20
    v = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    scale = ("GREATEST(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
             "list_transform(v, x -> ABS(x))), (a, x) -> GREATEST(a, x)), 1e-30)")
    codes = f"list_transform(v, x -> CAST(FLOOR(x / s * {qmax} + 0.5) AS BIGINT))"
    int_dot = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
               "list_transform(range(1, len(q.codes) + 1), "
               "i -> q.codes[i] * c.codes[i])), (a, x) -> a + x)")
    dot = _duck_dot("fq.v", "fc.v")
    return f"""
    WITH e AS (SELECT vec_id, label, {v} AS v FROM embeddings),
    sc AS (SELECT vec_id, label, v, {scale} AS s FROM e),
    coded AS (SELECT vec_id, label, {codes} AS codes, s,
                     GREATEST({_duck_norm('v')}, 1e-30) AS n
              FROM sc),
    coarse AS (
      SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, c.label,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY CAST({int_dot} AS DOUBLE) * c.s / c.n DESC,
                        c.vec_id) AS crank
      FROM coded q JOIN coded c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 25 = 0),
    short AS (SELECT query_id, corpus_id, label FROM coarse
              WHERE crank <= {short})
    SELECT query_id, corpus_id, label, cosine, CAST(rank AS INT) AS rank
    FROM (
      SELECT s.query_id, s.corpus_id, s.label,
             ROUND({dot} / (GREATEST({_duck_norm('fq.v')}, 1e-30)
                            * GREATEST({_duck_norm('fc.v')}, 1e-30)), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY s.query_id
               ORDER BY ROUND({dot} / (GREATEST({_duck_norm('fq.v')}, 1e-30)
                            * GREATEST({_duck_norm('fc.v')}, 1e-30)), 6) DESC,
                        s.corpus_id) AS rank
      FROM short s
      JOIN e fq ON fq.vec_id = s.query_id
      JOIN e fc ON fc.vec_id = s.corpus_id
    ) WHERE rank <= {k}
    """


_STRAT_QUOTAS = {"en": 100, "fr": 40, "zh": 20, "de": 1000}  # de > stratum: whole-stratum path


def q_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum budgets under the deterministic (hash, doc_id)
    order (text.stratified_quota) — prefilter on, so the driver row also
    exercises the result-invariance of the monotone hash cutoff."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.stratified_quota(docs, _STRAT_QUOTAS)


def o_stratified_quota() -> str:
    h = sqlfns.polyhash_duckdb("CAST(doc_id AS VARCHAR)")
    quota = ("CASE " + " ".join(
        f"WHEN lang = '{lg}' THEN {q}"
        for lg, q in sorted(_STRAT_QUOTAS.items())) + " ELSE 0 END")
    return f"""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {h}, doc_id) AS rk
      FROM documents WHERE ({quota}) > 0
    ) WHERE rk <= ({quota})
    """


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-lang length quantiles (text.length_quantiles): the
    (n-1)*p interpolation written as ONE shared SQL template so both
    engines perform identical IEEE roundings — bit-exact, not approx."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.length_quantiles(docs)


def o_length_quantiles() -> str:
    cols = []
    for p in (0.25, 0.5, 0.75):
        tag = str(p).replace("0.", "q")
        idx = f"(CAST(n - 1 AS DOUBLE) * {p!r})"
        lo = (f"MAX(CASE WHEN rk - 1 = CAST(FLOOR({idx}) AS BIGINT) "
              f"THEN CAST(n_chars AS DOUBLE) END)")
        hi = (f"MAX(CASE WHEN rk - 1 = CAST(CEIL({idx}) AS BIGINT) "
              f"THEN CAST(n_chars AS DOUBLE) END)")
        frac = f"MAX(({idx} - FLOOR({idx})))"
        cols.append(f"{lo} + {frac} * ({hi} - {lo}) AS {tag}")
    return f"""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs, {", ".join(cols)}
    FROM ranked GROUP BY lang
    """


def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus-wide shuffle (text.global_shuffle): every doc
    gets a deterministic (shard, pos) so shard-order reading is a fixed
    pseudo-random permutation — no RNG, no sampled range boundaries."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.global_shuffle(docs, n_shards=16)


def o_global_shuffle() -> str:
    h = sqlfns.polyhash_duckdb("CAST(doc_id AS VARCHAR)")
    p = sqlfns.HASH_P
    return f"""
    SELECT doc_id,
           CAST((CAST(16 AS BIGINT) * h) // {p} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY (CAST(16 AS BIGINT) * h) // {p}
               ORDER BY h, doc_id) AS INT) AS pos
    FROM (SELECT doc_id, {h} AS h FROM documents)
    """


QUERIES.update({
    "substring_dedup": (q_substring_dedup, o_substring_dedup),
    "quantize_embeddings": (q_quantize_embeddings, o_quantize_embeddings),
    "quantized_topk": (q_quantized_topk, o_quantized_topk),
    "stratified_quota": (q_stratified_quota, o_stratified_quota),
    "global_shuffle": (q_global_shuffle, o_global_shuffle),
    "length_quantiles": (q_length_quantiles, o_length_quantiles),
})

# --- r4 third wave: retrieval + bloom pre-screen + per-domain top-k -----------

def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import search
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return search.inverted_index(docs)


def o_inverted_index() -> str:
    t = _duck_tokens()
    return f"""
    WITH ex AS (SELECT doc_id, unnest({t}) AS term FROM documents),
    tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
           FROM ex GROUP BY 1, 2)
    SELECT term, doc_id, tf,
           CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
    FROM tf
    """


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queries = the first 8 tokens of every 97th doc, so every query term
    is guaranteed at least one corpus hit and rare-vs-common term weighting
    is exercised against the full corpus (scores are raw tf·idf sums, not
    length-normalized, so the source doc need not rank first)."""
    from ..operators import search
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = docs.filter("doc_id % 97 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.expr(f"SLICE({text._tokens()}, 1, 8)")).alias("term"))
    return search.tfidf_topk(docs, queries, k=5)


def o_tfidf_topk() -> str:
    t = _duck_tokens()
    part = ("CAST(FLOOR(CAST(tf AS DOUBLE) * (1e6 / CAST(df AS DOUBLE))"
            " + 0.5e0) AS BIGINT)")
    return f"""
    WITH ex AS (SELECT doc_id, unnest({t}) AS term FROM documents),
    tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
           FROM ex GROUP BY 1, 2),
    idx AS (SELECT term, doc_id, tf,
                   CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
            FROM tf),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id, unnest(list_slice({t}, 1, 8)) AS term
            FROM documents WHERE doc_id % 97 = 0)),
    sc AS (SELECT q.query_id, idx.doc_id,
                  SUM({part}) AS score_fx,
                  CAST(COUNT(*) AS BIGINT) AS n_terms_hit
           FROM idx JOIN q USING (term) GROUP BY 1, 2)
    SELECT query_id, doc_id, score_fx, n_terms_hit, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score_fx DESC, doc_id) AS rank FROM sc)
    WHERE rank <= 5
    """


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same batch/corpus split as incremental_dedup, plus PLANTED exact
    duplicates: every 97th corpus doc is re-keyed (doc_id + 10^6) into the
    batch with its text unchanged, so all three reachable verdicts appear
    at sf0.01 — (true, true) planted dups, (true, false) bloom false
    positives (m_bits=1024 puts ~half the bits set), (false, false)
    genuinely new.  (false, true) is impossible by the Bloom contract and
    its absence is asserted in tests/test_search_bloom.py."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 7 != 3")
    batch = docs.filter("doc_id % 7 = 3").select("doc_id", "text").unionByName(
        corpus.filter("doc_id % 97 = 1").selectExpr(
            "doc_id + 1000000 AS doc_id", "text"))
    return dedup.bloom_dedup(batch, corpus, m_bits=1024)


def o_bloom_dedup() -> str:
    m = 1024
    h1 = sqlfns.polyhash_duckdb("text", mult=31)
    h2 = sqlfns.polyhash_duckdb("text", mult=37)
    p1 = (f"(CASE WHEN text IS NULL THEN CAST(0 AS BIGINT) "
          f"ELSE ({h1}) % {m} END)")
    p2 = (f"(CASE WHEN text IS NULL THEN CAST(0 AS BIGINT) "
          f"ELSE ({h2}) % {m} END)")
    fp = dedup.fingerprint62_duckdb_sql("text")
    return f"""
    WITH c AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 != 3),
    b AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM c
          WHERE doc_id % 97 = 1),
    bits AS (SELECT DISTINCT pos FROM
               (SELECT unnest([{p1}, {p2}]) AS pos FROM c)),
    seen AS (SELECT DISTINCT {fp} AS fp FROM c),
    pr AS (SELECT doc_id, {fp} AS fp, unnest([{p1}, {p2}]) AS pos FROM b),
    hit AS (SELECT pr.doc_id, pr.fp,
                   COUNT(DISTINCT CASE WHEN bits.pos IS NOT NULL
                                       THEN pr.pos END)
                     = COUNT(DISTINCT pr.pos) AS bloom_maybe
            FROM pr LEFT JOIN bits ON pr.pos = bits.pos
            GROUP BY 1, 2)
    SELECT hit.doc_id, hit.bloom_maybe, (seen.fp IS NOT NULL) AS exact_dup
    FROM hit LEFT JOIN seen ON hit.fp = seen.fp
    """


def q_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven planted domains over the corpus; k=3 with the salted
    two-phase plan — identical output to a single domain window."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.selectExpr(
        "doc_id",
        "CONCAT('site', CAST(doc_id % 7 AS STRING), '.example') AS domain",
        "lang", "text")
    return text.domain_topk(planted, k=3)


def o_domain_topk() -> str:
    return f"""
    WITH qual AS ({o_quality()}),
    p AS (SELECT doc_id,
                 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS domain
          FROM documents)
    SELECT domain, doc_id, quality, CAST(rk AS INT) AS rk
    FROM (SELECT p.domain, q.doc_id, q.quality,
                 ROW_NUMBER() OVER (PARTITION BY p.domain
                   ORDER BY q.quality DESC, q.doc_id) AS rk
          FROM qual q JOIN p USING (doc_id))
    WHERE rk <= 3
    """


QUERIES.update({
    "inverted_index": (q_inverted_index, o_inverted_index),
    "tfidf_topk": (q_tfidf_topk, o_tfidf_topk),
    "bloom_dedup": (q_bloom_dedup, o_bloom_dedup),
    "domain_topk": (q_domain_topk, o_domain_topk),
})


# --- r4 fourth wave: web-graph PageRank + LM fluency scoring ------------------

def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 exact fixed-point power-iteration rounds over the deterministic
    3-fanout link graph; ranks are BIGINT so the vector is bit-identical
    at any parallelism and vs the unrolled DuckDB twin."""
    from ..operators import graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.pagerank(graph.link_graph(docs), n_iter=5)


def o_pagerank() -> str:
    from ..operators import graph
    edges = """
    SELECT src, dst FROM (
      SELECT doc_id AS src,
             unnest([CAST((doc_id * 17 + 1) % _n AS BIGINT),
                     CAST((doc_id * 31 + 7) % _n AS BIGINT),
                     CAST((doc_id * 2 + 3) % _n AS BIGINT)]) AS dst
      FROM documents,
           (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM documents))
    WHERE src != dst
    """
    return graph.pagerank_duckdb_sql(edges, n_iter=5)


def q_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference corpus = every 5th doc, candidates = the rest — the CCNet
    split shape (trusted reference LM scores the crawl)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.lm_fluency(docs.filter("doc_id % 5 != 0"),
                           docs.filter("doc_id % 5 = 0"))


def o_lm_fluency() -> str:
    t = _duck_tokens()
    grams = (f"CASE WHEN len({t}) >= 2 THEN "
             f"list_transform(range(1, len({t})), "
             f"i -> {t}[i] || ' ' || {t}[i + 1]) ELSE [] END")
    scale = text.LM_SCALE
    return f"""
    WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
    cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
    rg AS (SELECT unnest({grams}) AS bigram FROM ref),
    c2 AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c2
           FROM rg GROUP BY 1),
    c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
                  CAST(COUNT(*) AS BIGINT) AS c1
           FROM rg GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS _v
          FROM (SELECT unnest({t}) AS tok FROM ref)),
    dg AS (SELECT doc_id, unnest({grams}) AS bigram FROM cand),
    sc AS (SELECT dg.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                  CAST(COALESCE(SUM(CASE WHEN c2.c2 IS NULL
                                         THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS n_oov,
                  CAST(COALESCE(SUM(CAST(FLOOR(
                      CAST({scale} AS BIGINT)
                      * (CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
                         / CAST(COALESCE(c1.c1, 0) + _v AS DOUBLE))
                      + 0.5e0) AS BIGINT)), 0) AS BIGINT) AS score_fx
           FROM dg
           LEFT JOIN c2 USING (bigram)
           LEFT JOIN c1 ON string_split(dg.bigram, ' ')[1] = c1.w1
           CROSS JOIN v
           GROUP BY dg.doc_id)
    SELECT cand.doc_id,
           COALESCE(sc.n_bigrams, 0) AS n_bigrams,
           COALESCE(sc.n_oov, 0) AS n_oov,
           COALESCE(sc.score_fx, 0) AS score_fx
    FROM cand LEFT JOIN sc ON cand.doc_id = sc.doc_id
    """


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target = every 11th doc (the trusted
    split), raw candidates = the whole table (DSIR fits q on the raw
    corpus itself and scores every raw doc)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.dsir_weights(docs, docs.filter("doc_id % 11 = 0"))


def o_dsir_weights() -> str:
    td = _duck_tokens()
    bis = (f"CASE WHEN len({td}) >= 2 THEN "
           f"list_transform(range(1, len({td})), "
           f"i -> {td}[i] || ' ' || {td}[i + 1]) ELSE [] END")
    grams = f"list_concat({td}, {bis})"
    bkt = f"(({sqlfns.polyhash_duckdb('gram')}) % {text.DSIR_BUCKETS})"
    b = text.DSIR_BUCKETS
    ratio = (
        f"CAST(FLOOR(CAST({text.DSIR_SCALE} AS BIGINT) * "
        f"((CAST(COALESCE(tg.ct, 0) + 1 AS DOUBLE) / "
        f"CAST(tt._tt + {b} AS DOUBLE)) / "
        f"(CAST(rg.cr + 1 AS DOUBLE) / "
        f"CAST(rt._rt + {b} AS DOUBLE))) + 0.5e0) AS BIGINT)")
    return f"""
    WITH tgt AS (SELECT text FROM documents WHERE doc_id % 11 = 0),
    tg AS (SELECT {bkt} AS bucket, CAST(COUNT(*) AS BIGINT) AS ct
           FROM (SELECT unnest({grams}) AS gram FROM tgt) GROUP BY 1),
    rg AS (SELECT {bkt} AS bucket, CAST(COUNT(*) AS BIGINT) AS cr
           FROM (SELECT unnest({grams}) AS gram FROM documents) GROUP BY 1),
    tt AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS _tt FROM tg),
    rt AS (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS _rt FROM rg),
    model AS (SELECT rg.bucket,
                     CAST(COALESCE(tg.ct, 0) AS BIGINT) AS ct,
                     {ratio} AS ratio_fx
              FROM rg LEFT JOIN tg USING (bucket)
              CROSS JOIN tt CROSS JOIN rt),
    dg AS (SELECT doc_id, {bkt} AS bucket
           FROM (SELECT doc_id, unnest({grams}) AS gram FROM documents)),
    sc AS (SELECT dg.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_grams,
                  CAST(COALESCE(SUM(CASE WHEN m.ct > 0 THEN 1 ELSE 0 END),
                                0) AS BIGINT) AS n_target_hit,
                  CAST(COALESCE(SUM(m.ratio_fx), 0) AS BIGINT) AS score_fx
           FROM dg LEFT JOIN model m USING (bucket)
           GROUP BY dg.doc_id)
    SELECT d.doc_id,
           COALESCE(sc.n_grams, 0) AS n_grams,
           COALESCE(sc.n_target_hit, 0) AS n_target_hit,
           COALESCE(sc.score_fx, 0) AS score_fx
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    """


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 exact Lloyd rounds, k=8, over the fixed-point embedding codes;
    the assignment (not just stats) matches the unrolled DuckDB twin
    row-for-row."""
    from ..operators import clustering
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return clustering.kmeans_assign(emb, k=8, n_iter=3)


def o_kmeans_assign() -> str:
    from ..operators import clustering
    return clustering.kmeans_assign_duckdb_sql("embeddings", k=8, n_iter=3)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end with the SAME planted 1.5x-scaled copies as
    embedding_neardup (cosine ~1.0 with their originals, bit-identical
    float32 construction in both engines) so the dedup groups are
    non-vacuous; threshold 0.4 for the same near-orthogonality reason."""
    from ..operators import clustering
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = emb.filter("vec_id % 5 = 0").select(
        (F.col("vec_id") + F.lit(1000000000)).alias("vec_id"), "label",
        F.expr("TRANSFORM(embedding, x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT))"
               ).alias("embedding"))
    return clustering.semantic_dedup(emb.unionByName(copies),
                                     k=8, n_iter=3, cos_threshold=0.4)


def o_semantic_dedup() -> str:
    from ..operators import clustering, dedup as dd, similarity
    cos = (f"ROUND({_duck_dot('a.embedding', 'b.embedding')}"
           f" / ({_duck_norm('a.embedding')} * {_duck_norm('b.embedding')}), 6)")
    km = clustering.kmeans_assign_duckdb_sql("embx", k=8, n_iter=3)
    return f"""
    WITH RECURSIVE
    embx AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000000 AS vec_id,
             list_transform(embedding, x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % 5 = 0),
    asg AS MATERIALIZED ({km}),
    sig0 AS (SELECT e.vec_id, e.embedding, asg.cluster_id,
                    {_duck_lsh_sig('embedding', similarity.NEARDUP_PLANES)} AS bucket
             FROM embx e JOIN asg ON e.vec_id = asg.vec_id),
    sig AS (SELECT * FROM sig0
            QUALIFY COUNT(*) OVER (PARTITION BY cluster_id, bucket)
                    <= {dd.LSH_MAX_BUCKET}),
    p AS (SELECT a.vec_id AS va, b.vec_id AS vb
          FROM sig a JOIN sig b
            ON a.cluster_id = b.cluster_id AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id
          WHERE {cos} >= 0.4e0),
    edges AS (SELECT va AS a, vb AS b FROM p
              UNION ALL SELECT vb, va FROM p),
    reach(node, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.node, e2.b FROM reach JOIN edges e2 ON reach.r = e2.a),
    comp AS (SELECT node, MIN(r) AS group_id FROM reach GROUP BY node)
    SELECT s.vec_id, s.cluster_id,
           COALESCE(c.group_id, s.vec_id) AS group_id,
           (s.vec_id = COALESCE(c.group_id, s.vec_id)) AS keep
    FROM sig0 s LEFT JOIN comp c ON s.vec_id = c.node
    """


QUERIES.update({
    "pagerank": (q_pagerank, o_pagerank),
    "lm_fluency": (q_lm_fluency, o_lm_fluency),
    "dsir_weights": (q_dsir_weights, o_dsir_weights),
    "kmeans_assign": (q_kmeans_assign, o_kmeans_assign),
    "semantic_dedup": (q_semantic_dedup, o_semantic_dedup),
})


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) per-language sampling weights and
    per-epoch quotas over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.mixture_weights(docs, by="lang", budget=1000)


def o_mixture_weights() -> str:
    # the SAME isqrt + ratio templates, run verbatim on DuckDB
    s = text._isqrt_sql(f"n_docs * {text.MIX_SQRT_SCALE ** 2}")
    ratio = "(CAST(sqrt_fx AS DOUBLE) / CAST(_tot AS DOUBLE))"
    return f"""
    WITH c AS (SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    s AS (SELECT stratum, n_docs, CAST({s} AS BIGINT) AS sqrt_fx FROM c),
    t AS (SELECT CAST(SUM(sqrt_fx) AS BIGINT) AS _tot FROM s)
    SELECT stratum, n_docs, sqrt_fx,
           CAST(FLOOR({text.MIX_WEIGHT_SCALE} * {ratio} + 0.5e0) AS BIGINT)
             AS weight_fx,
           CAST(FLOOR(1000 * {ratio} + 0.5e0) AS BIGINT) AS quota
    FROM s CROSS JOIN t
    """


def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed signed bag-of-words embeddings as the sparse
    (doc_id, dim_id, val) relation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.hash_embed(docs)


def o_hash_embed() -> str:
    ph31 = sqlfns.polyhash_duckdb("tok", mult=31)
    ph37 = sqlfns.polyhash_duckdb("tok", mult=37)
    d = text.HASH_EMBED_DIM
    return f"""
    WITH toks AS (SELECT doc_id, unnest({_duck_tokens()}) AS tok
                  FROM documents),
    agg AS (SELECT doc_id,
                   CAST({ph31} % {d} AS INT) AS dim_id,
                   CAST(SUM(CASE WHEN {ph37} % 2 = 0 THEN 1 ELSE -1 END)
                        AS BIGINT) AS val
            FROM toks GROUP BY 1, 2)
    SELECT doc_id, dim_id, val FROM agg WHERE val != 0
    """


def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by exact perceptual-hash (dHash) match over the same
    SQL-derivable fake media as multimodal_resize: payload = utf-8 bytes
    of REPEAT(first-8-chars, 16) tiled over a 64x48 grid.  The period-8
    payload makes every resized ROW identical, so the numpy dHash has the
    closed form phash = rowbyte * (2^56 - 1)/255 with rowbyte a function
    of 8 adjacent-character comparisons of the 8-char prefix — real
    perceptual collapses at sf0.01 (distinct prefixes sharing a comparison
    pattern map to one phash), so keep/n_copies are non-vacuous.  Same
    ASCII guard as multimodal_resize (byte-index math desyncs on
    multi-byte chars)."""
    from ..operators import multimodal
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id % 5 = 0 AND n_chars >= 8")
            .filter("OCTET_LENGTH(SUBSTRING(text, 1, 8)) = 8"))
    media = docs.select(
        F.expr("CONCAT('doc://', CAST(doc_id AS STRING))").alias("url"),
        F.lit("image").alias("media_type"),
        F.expr("CAST(REPEAT(SUBSTRING(text, 1, 8), 16) AS BINARY)")
        .alias("payload"),
        F.lit(64).alias("width"), F.lit(48).alias("height"),
        F.lit(1).alias("n_frames"))
    return multimodal.image_phash_dedup(media)


def o_image_phash_dedup() -> str:
    from ..operators import multimodal
    w, h = multimodal.PHASH_W, multimodal.PHASH_H
    # sampled source columns mod the payload period 8 (width 64):
    # cm[j] = ((j * 64) // w) % 8; bit j set iff s[cm[j]] > s[cm[j+1]]
    cm = [((j * 64) // w) % 8 for j in range(w)]
    bits = " + ".join(
        f"(CASE WHEN ascii(substr(s, {cm[j] + 1}, 1)) > "
        f"ascii(substr(s, {cm[j + 1] + 1}, 1)) THEN {1 << j} ELSE 0 END)"
        for j in range(w - 1))
    rep = ((1 << (8 * h)) - 1) // 255  # identical rows: sum of 2^(8i), i<h
    return f"""
    WITH m AS (
      SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
             SUBSTRING(text, 1, 8) AS s
      FROM documents
      WHERE doc_id % 5 = 0 AND n_chars >= 8
        AND strlen(SUBSTRING(text, 1, 8)) = 8
    ),
    ph AS (SELECT url, CAST(({bits}) * {rep} AS BIGINT) AS phash FROM m),
    g AS (SELECT phash, MIN(url) AS _keep, CAST(COUNT(*) AS BIGINT)
            AS n_copies FROM ph GROUP BY phash)
    SELECT ph.url, ph.phash, g.n_copies, ph.url = g._keep AS keep
    FROM ph JOIN g USING (phash)
    """


def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token windows (32-token chunks, 8-token
    overlap) over every document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.chunk_windows(docs, chunk_tokens=32, overlap=8)


def o_chunk_windows() -> str:
    td = _duck_tokens()
    chunk, stride = 32, 24
    return f"""
    WITH d AS (SELECT doc_id, {td} AS toks FROM documents),
    st AS (SELECT doc_id, toks,
                  unnest(range(0, CAST(len(toks) AS BIGINT), {stride}))
                    AS start_tok
           FROM d WHERE len(toks) > 0)
    SELECT doc_id,
           CAST(start_tok // {stride} AS INT) AS chunk_no,
           CAST(start_tok AS INT) AS start_tok,
           CAST(len(list_slice(toks, CAST(start_tok + 1 AS BIGINT),
                CAST(LEAST(start_tok + {chunk}, len(toks)) AS BIGINT)))
             AS INT) AS n_tokens,
           array_to_string(list_slice(toks, CAST(start_tok + 1 AS BIGINT),
                CAST(LEAST(start_tok + {chunk}, len(toks)) AS BIGINT)), ' ')
             AS chunk_text
    FROM st
    """


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink -> source round-trip (the LLM-corpus interchange format):
    write every 3rd document through the deterministic-shard native JSON
    writer, read it back with the explicit schema + FAILFAST, and return
    the rows — the oracle is the identical selection straight from the
    parquet table, so any escaping, NULL-field, or type drift in either
    direction breaks the hash."""
    import tempfile

    from ..sources import jsonl
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id % 3 = 0")
            .select("doc_id", "lang", "text"))
    d = _tmp_dir(prefix="jsonl_rt_")
    jsonl.write_jsonl(docs, d, shards=8)
    return jsonl.scan_jsonl(spark, d)


def o_jsonl_roundtrip() -> str:
    return ("SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0")


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE subword tokenization with the FIXED shipped merge table
    (operators/text.py BPE_MERGES) — exact token counts + tokenized text,
    one codegen projection, zero shuffles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.bpe_tokenize(docs)


def o_bpe_tokenize() -> str:
    chain = text.bpe_chain_sql("text", "duck")
    toks = _duck_tokens("COALESCE(text, '')")
    return f"""
    WITH s AS (SELECT doc_id,
                      {chain} AS s,
                      CAST(len({toks}) AS BIGINT) AS n_words,
                      CAST(length(replace(COALESCE(text, ''), ' ', ''))
                        AS BIGINT) AS nc
               FROM documents),
    t AS (SELECT doc_id, n_words, nc, s,
                 CAST((length(s) - length(replace(s, '|', ''))) / 2
                   AS BIGINT) AS n_tokens
          FROM s)
    SELECT doc_id, n_words, n_tokens, nc - n_tokens AS n_merged,
           replace(replace(s, '||', '/'), '|', '') AS tok_text
    FROM t
    """


def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE tokenizer TRAINING over the documents table: learn the
    top BPE_LEARN_MERGES merges by adjacent-pair frequency, argmax fully
    in-plan (TakeOrderedAndProject + 1-row broadcast join per round)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.bpe_learn(docs)


def o_bpe_learn() -> str:
    # the same greedy rounds UNROLLED as a CTE chain: per round the pair
    # counting, the (count DESC, pair) argmax, and the LEFT-JOIN-ON-TRUE
    # COALESCE(chr(1)) no-op guard are verbatim the Spark plan's math
    K = text.BPE_LEARN_MERGES
    ctes = [f"s0 AS (SELECT {text._sentinel_sql('text', 'duck')} AS s "
            f"FROM documents)"]
    for k in range(1, K + 1):
        i = k - 1
        ctes.append(
            f"p{k} AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count"
            f" FROM (SELECT unnest(CASE WHEN len(sy) < 2 THEN"
            f" CAST([] AS VARCHAR[]) ELSE list_transform(range(1, len(sy)),"
            f" x -> sy[x] || chr(2) || sy[x + 1]) END) AS pair"
            f" FROM (SELECT string_split(substr(w, 2, length(w) - 2), '||')"
            f" AS sy FROM (SELECT unnest(list_filter(string_split(s, ' '),"
            f" w -> len(w) > 0)) AS w FROM s{i}))) GROUP BY 1)")
        ctes.append(
            f"m{k} AS (SELECT CAST({k} AS INTEGER) AS merge_no,"
            f" split_part(pair, chr(2), 1) AS a,"
            f" split_part(pair, chr(2), 2) AS b, pair_count"
            f" FROM p{k} ORDER BY pair_count DESC, pair LIMIT 1)")
        if k < K:
            ctes.append(
                f"s{k} AS (SELECT replace(s,"
                f" COALESCE('|' || a || '||' || b || '|', chr(1)),"
                f" COALESCE('|' || a || b || '|', '')) AS s"
                f" FROM s{i} LEFT JOIN m{k} ON TRUE)")
    union = "\nUNION ALL ".join(
        f"SELECT * FROM m{k}" for k in range(1, K + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + union


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.hll_distinct(docs)


def o_hll_distinct() -> str:
    return sketch.hll_distinct_oracle()


def q_cm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.cm_topk(docs)


def o_cm_topk() -> str:
    return sketch.cm_topk_oracle()


def q_qsk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.qsk_quantiles(docs)


def o_qsk_quantiles() -> str:
    return sketch.qsk_quantiles_oracle()


_COMPACT_RECT = (101, 138, 53, 82)  # misaligned res-9 rectangle: partial
# quads on every edge, complete quads inside => genuinely mixed-res output


def _compact_rect_cells(spark: SparkSession) -> DataFrame:
    """37 x 29 res-9 cell rectangle (a polyfill stand-in) — tiny generator
    cross join, documented small side."""
    i0, i1, j0, j1 = _COMPACT_RECT
    return (spark.range(i0, i1).selectExpr("id AS i")
            .crossJoin(spark.range(j0, j1).selectExpr("id AS j"))
            .selectExpr(f"CAST(9 * {sqlfns.POW2_56} + j * {sqlfns.POW2_28}"
                        f" + i AS LONG) AS cell"))


def _compact_rect_sql() -> str:
    i0, i1, j0, j1 = _COMPACT_RECT
    return (f"SELECT CAST(9 * {sqlfns.POW2_56} + jj.j * {sqlfns.POW2_28}"
            f" + ii.i AS BIGINT) AS cell"
            f" FROM range({i0}, {i1}) ii(i), range({j0}, {j1}) jj(j)")


def q_g3_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style compact of the rectangle covering: minimal mixed-res set."""
    return SP.compact_cells(_compact_rect_cells(spark), res=9, min_res=6)


def o_g3_compact() -> str:
    """DuckDB twin: the identical promote-complete-quads rounds unrolled
    as a CTE chain (9->8->7->6), same parent arithmetic (sqlfns.parent_sql
    is dialect-portable)."""
    res_of = f"CAST(FLOOR(cell / {sqlfns.POW2_56}) AS INT)"
    ctes = [f"c9 AS ({_compact_rect_sql()})"]
    cur = "c9"
    for r in range(9, 6, -1):
        p = sqlfns.parent_sql("cell", r, r - 1)
        ctes.append(f"""par_{r} AS (
          SELECT cell, {p} AS p FROM {cur} WHERE {res_of} = {r})""")
        ctes.append(f"""cnt_{r} AS (
          SELECT p, COUNT(*) AS n FROM par_{r} GROUP BY p)""")
        ctes.append(f"""nxt_{r} AS (
          SELECT p AS cell FROM cnt_{r} WHERE n = 4
          UNION ALL
          SELECT par_{r}.cell FROM par_{r}
          JOIN cnt_{r} USING (p) WHERE cnt_{r}.n < 4
          UNION ALL
          SELECT cell FROM {cur} WHERE {res_of} <> {r})""")
        cur = f"nxt_{r}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT cell, {res_of} AS cell_res FROM {cur}")


def q_g3_uncompact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uncompact(compact(S), 9) must be EXACTLY S — the pair's defining
    identity, with the plain rectangle as the closed-form oracle."""
    compacted = SP.compact_cells(_compact_rect_cells(spark), res=9,
                                 min_res=6)
    return SP.uncompact_cells(compacted.select("cell"), res=9)


def o_g3_uncompact_roundtrip() -> str:
    return _compact_rect_sql()


_POLYFILL_PENTAGON = [(47.601, -122.341), (47.613, -122.329),
                      (47.6065, -122.3135), (47.5932, -122.3178),
                      (47.5911, -122.3369)]  # non-grid-aligned vertices:
# no cell center lies on an edge, so the zero-measure boundary caveat of
# the crossing-number template never engages


def q_g3_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 polygonToCells analog: res-9 cells whose center is inside the
    pentagon (center-containment, H3's default mode)."""
    return SP.polyfill_cells(spark, _POLYFILL_PENTAGON, res=9)


def o_g3_polyfill() -> str:
    """DuckDB twin: identical bbox integer bounds, identical center
    arithmetic, identical unrolled crossing-number expression (the
    template is dialect-portable)."""
    from ..kernel import cells as C
    import math
    poly = _POLYFILL_PENTAGON
    s = C.cell_size_deg(9)
    j0 = math.floor((min(p[0] for p in poly) + 90.0) / s)
    j1 = math.floor((max(p[0] for p in poly) + 90.0) / s)
    i0 = math.floor((min(p[1] for p in poly) + 180.0) / s)
    i1 = math.floor((max(p[1] for p in poly) + 180.0) / s)
    clat = f"((j + 0.5e0) * {sqlfns.dlit(s)} - 90.0e0)"
    clng = f"((i + 0.5e0) * {sqlfns.dlit(s)} - 180.0e0)"
    inside = SP.polygon_contains_sql(clat, clng, poly)
    return f"""
    SELECT CAST(9 AS BIGINT) * {sqlfns.POW2_56} + j * {sqlfns.POW2_28} + i
             AS cell
    FROM range({i0}, {i1 + 1}) ii(i), range({j0}, {j1 + 1}) jj(j)
    WHERE {inside}
    """


def q_g3_cells_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covering export: GeoJSON Polygon features for the COMPACTED
    rectangle covering (mixed resolutions exercise the per-row size
    lookup and the exact corner math at every level)."""
    compacted = SP.compact_cells(_compact_rect_cells(spark), res=9,
                                 min_res=6)
    return SP.cells_to_geojson(compacted.select("cell"))


def o_g3_cells_geojson() -> str:
    """DuckDB twin: the compact chain (o_g3_compact verbatim, as a derived
    table) + the identical corner arithmetic with printf (the
    FORMAT_STRING C-contract pair, same as the R20 canonical export)."""
    res = f"CAST(FLOOR(cell / {sqlfns.POW2_56}) AS INT)"
    j = f"CAST(FLOOR((cell % {sqlfns.POW2_56}) / {sqlfns.POW2_28}) AS BIGINT)"
    i = f"(cell % {sqlfns.POW2_28})"
    from ..kernel import cells as C
    s = ("(CASE " + " ".join(
        f"WHEN {res} = {r} THEN {sqlfns.dlit(C.cell_size_deg(r))}"
        for r in range(20)) + " END)")
    f6 = lambda x: f"printf('%.6f', {x})"
    lat0, lat1 = f"({j} * {s} - 90.0e0)", f"(({j} + 1) * {s} - 90.0e0)"
    lng0, lng1 = f"({i} * {s} - 180.0e0)", f"(({i} + 1) * {s} - 180.0e0)"
    ring_pts = [(lng0, lat0), (lng1, lat0), (lng1, lat1), (lng0, lat1),
                (lng0, lat0)]
    ring = " || ',' || ".join(
        f"('[' || {f6(x)} || ',' || {f6(y)} || ']')" for x, y in ring_pts)
    feature = (
        "'{\"type\":\"Feature\",\"properties\":{\"cell\":' || "
        "CAST(cell AS VARCHAR) || ',\"res\":' || CAST(" + res +
        " AS VARCHAR) || '},\"geometry\":{\"type\":\"Polygon\","
        "\"coordinates\":[[' || " + ring + " || ']]}}'")
    return (f"SELECT cell, {feature} AS feature FROM "
            f"({o_g3_compact()}) src")


def q_g3_focal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 focal sum over the per-cell9 entity-point counts: the density
    smoothing pass a hotspot map runs on the G3 encode output."""
    counts = (_points(spark, sf_dir)
              .groupBy(F.col("cell9").alias("cell"))
              .agg(F.count("*").alias("n")))
    return SP.focal_sum(counts, k=1)


def o_g3_focal_sum() -> str:
    """DuckDB twin: the shared point-derivation CTE, the same per-cell
    count, and the identical scatter-as-gather 9-offset expansion."""
    j = f"CAST(FLOOR((cell % {sqlfns.POW2_56}) / {sqlfns.POW2_28}) AS BIGINT)"
    i = f"(cell % {sqlfns.POW2_28})"
    return f"""
    WITH pts AS ({_duck_points()}),
    counts AS (SELECT cell9 AS cell, COUNT(*) AS n FROM pts GROUP BY cell9),
    scattered AS (
      SELECT CAST(9 AS BIGINT) * {sqlfns.POW2_56}
               + ({j} + dj.dj) * {sqlfns.POW2_28} + ({i} + di.di) AS cell,
             n
      FROM counts,
           (SELECT unnest([-1, 0, 1]) AS di) di,
           (SELECT unnest([-1, 0, 1]) AS dj) dj
      WHERE ({i} + di.di) >= 0 AND ({i} + di.di) < {sqlfns.POW2_28}
        AND ({j} + dj.dj) >= 0 AND ({j} + dj.dj) < {sqlfns.POW2_28})
    SELECT cell, CAST(SUM(n) AS BIGINT) AS focal_sum
    FROM scattered GROUP BY cell
    """


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.gopher_rules(docs)


def o_gopher_rules() -> str:
    """DuckDB twin: identical tokenizer, counts and integer-crossmultiplied
    rule booleans (no float thresholds anywhere on either engine)."""
    stop = "[" + ",".join(f"'{w}'" for w in text.STOPWORDS) + "]"
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '),
                         t -> length(t) > 0) AS toks
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(length(toks) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS BIGINT)
               AS sum_word_chars,
             CAST(length(list_filter(toks,
                 t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
               AS n_alpha_words,
             CAST(length(text) - length(replace(text, '#', ''))
                  + CAST((length(text) - length(replace(text, '...', '')))
                         / 3 AS BIGINT) AS BIGINT) AS n_symbols,
             CAST(length(list_intersect(list_distinct(toks), {stop}))
                  AS BIGINT) AS n_stop_hits
      FROM t)
    SELECT *,
           (ok_words AND ok_mean_len AND ok_alpha AND ok_symbols
            AND ok_stop) AS keep
    FROM (
      SELECT *,
             (n_words >= 50 AND n_words <= 100000) AS ok_words,
             (sum_word_chars >= 3 * n_words AND
              sum_word_chars <= 10 * n_words) AS ok_mean_len,
             (n_alpha_words * 100 >= 80 * n_words) AS ok_alpha,
             (n_symbols * 100 <= 10 * n_words) AS ok_symbols,
             (n_stop_hits >= 2) AS ok_stop
      FROM c)
    """


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling over synthesized pages; the oracle re-derives
    the url/host scheme in closed form (page synthesis is pure SQL)."""
    return text.fetch_schedule(synth.pages(spark, 3000), per_slot=2)


def o_fetch_schedule() -> str:
    return """
    WITH p AS (
      SELECT 'https://site' || CAST(id % 997 AS VARCHAR) || '.example/p/'
               || CAST(id AS VARCHAR) AS url,
             'site' || CAST(id % 997 AS VARCHAR) || '.example' AS host
      FROM range(0, 3000) t(id)),
    r AS (
      SELECT url, host,
             CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
                  AS INT) AS rank_in_host
      FROM p)
    SELECT url, host, rank_in_host,
           CAST(FLOOR((rank_in_host - 1) / 2) AS INT) AS slot
    FROM r
    """


QUERIES.update({
    "mixture_weights": (q_mixture_weights, o_mixture_weights),
    "hash_embed": (q_hash_embed, o_hash_embed),
    "image_phash_dedup": (q_image_phash_dedup, o_image_phash_dedup),
    "jsonl_roundtrip": (q_jsonl_roundtrip, o_jsonl_roundtrip),
    "chunk_windows": (q_chunk_windows, o_chunk_windows),
    "bpe_tokenize": (q_bpe_tokenize, o_bpe_tokenize),
    "bpe_learn": (q_bpe_learn, o_bpe_learn),
    "hll_distinct": (q_hll_distinct, o_hll_distinct),
    "cm_topk": (q_cm_topk, o_cm_topk),
    "qsk_quantiles": (q_qsk_quantiles, o_qsk_quantiles),
    "fetch_schedule": (q_fetch_schedule, o_fetch_schedule),
    "g3_compact": (q_g3_compact, o_g3_compact),
    "g3_uncompact_roundtrip": (q_g3_uncompact_roundtrip,
                               o_g3_uncompact_roundtrip),
    "g3_polyfill": (q_g3_polyfill, o_g3_polyfill),
    "g3_cells_geojson": (q_g3_cells_geojson, o_g3_cells_geojson),
    "g3_focal_sum": (q_g3_focal_sum, o_g3_focal_sum),
    "gopher_rules": (q_gopher_rules, o_gopher_rules),
})


# --- round-5 additions: CCNet buckets, URL filtering, winnowing ---------------

def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/middle/tail split of the candidate corpus against the same
    doc_id%5 reference split lm_fluency uses."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.ccnet_buckets(docs.filter("doc_id % 5 != 0"),
                              docs.filter("doc_id % 5 = 0"))


def o_ccnet_buckets() -> str:
    t = _duck_tokens()
    grams = (f"CASE WHEN len({t}) >= 2 THEN "
             f"list_transform(range(1, len({t})), "
             f"i -> {t}[i] || ' ' || {t}[i + 1]) ELSE [] END")
    scale, n_q = text.LM_SCALE, 4096
    return f"""
    WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
    cand AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 5 != 0),
    rg AS (SELECT unnest({grams}) AS bigram FROM ref),
    c2 AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c2 FROM rg GROUP BY 1),
    c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
                  CAST(COUNT(*) AS BIGINT) AS c1 FROM rg GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS _v
          FROM (SELECT unnest({t}) AS tok FROM ref)),
    dg AS (SELECT doc_id, unnest({grams}) AS bigram FROM cand),
    sc AS (SELECT dg.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                  CAST(COALESCE(SUM(CAST(FLOOR(
                      CAST({scale} AS BIGINT)
                      * (CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
                         / CAST(COALESCE(c1.c1, 0) + _v AS DOUBLE))
                      + 0.5e0) AS BIGINT)), 0) AS BIGINT) AS score_fx
           FROM dg
           LEFT JOIN c2 USING (bigram)
           LEFT JOIN c1 ON string_split(dg.bigram, ' ')[1] = c1.w1
           CROSS JOIN v
           GROUP BY dg.doc_id),
    scored AS (SELECT cand.doc_id, cand.lang,
                      CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                      CASE WHEN COALESCE(sc.n_bigrams, 0) = 0
                           THEN CAST(0 AS BIGINT)
                           ELSE (sc.score_fx // sc.n_bigrams)
                                // {scale // n_q} END AS qscore
               FROM cand LEFT JOIN sc USING (doc_id)),
    hist AS (SELECT lang, qscore, CAST(COUNT(*) AS BIGINT) AS c
             FROM scored GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(c) AS n FROM hist GROUP BY 1),
    cum AS (SELECT h.lang, h.qscore, t.n,
                   SUM(c) OVER (PARTITION BY h.lang ORDER BY h.qscore
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
            FROM hist h JOIN tot t USING (lang)),
    thr AS (SELECT lang,
                   MIN(CASE WHEN cum * 3 >= n THEN qscore END) AS t1,
                   MIN(CASE WHEN cum * 3 >= 2 * n THEN qscore END) AS t2
            FROM cum GROUP BY 1)
    SELECT s.doc_id, s.lang, s.n_bigrams, s.qscore,
           CASE WHEN s.qscore <= t.t1 THEN 'tail'
                WHEN s.qscore <= t.t2 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM scored s JOIN thr t USING (lang)
    """


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist + bad-substring filtering over synthesized pages; the
    40-domain blocklist is itself a deterministic relation both engines
    re-derive (range -> id*31 % 997)."""
    pages = synth.pages(spark, 3000)
    bl = spark.range(40).selectExpr(
        "CONCAT('site', CAST(id * 31 % 997 AS STRING), '.example') AS domain")
    return text.url_filter(pages, bl, bad_words=["7", "13"], max_bad=2)


def o_url_filter() -> str:
    n7 = "((LENGTH(url) - LENGTH(REPLACE(url, '7', ''))) // 1)"
    n13 = "((LENGTH(url) - LENGTH(REPLACE(url, '13', ''))) // 2)"
    return f"""
    WITH p AS (
      SELECT 'https://site' || CAST(id % 997 AS VARCHAR) || '.example/p/'
               || CAST(id AS VARCHAR) AS url,
             'site' || CAST(id % 997 AS VARCHAR) || '.example' AS domain
      FROM range(0, 3000) t(id)),
    bl AS (SELECT DISTINCT 'site' || CAST(id * 31 % 997 AS VARCHAR)
                    || '.example' AS domain
           FROM range(0, 40) t(id)),
    m AS (SELECT p.url, p.domain,
                 (bl.domain IS NOT NULL) AS blocked,
                 CAST({n7} + {n13} AS BIGINT) AS n_bad_words
          FROM p LEFT JOIN bl USING (domain))
    SELECT url, domain, blocked, n_bad_words,
           (NOT blocked AND n_bad_words <= 2) AS keep
    FROM m
    """


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.winnowing(docs, k=3, w=4)


def o_winnowing() -> str:
    k, w = 3, 4
    lim = 1 << dedup._WINNOW_POS_BITS
    gh = sqlfns.polyhash_duckdb("gram")
    return f"""
    WITH d AS (SELECT doc_id,
                      list_filter(string_split(text, ' '),
                                  t -> length(t) > 0) AS toks
               FROM documents),
    g0 AS (SELECT doc_id, len(toks) - {k} + 1 AS m, toks
           FROM d WHERE len(toks) >= {k}),
    g AS (SELECT doc_id, m, unnest(range(1, m + 1)) AS pos, toks FROM g0),
    h AS (SELECT doc_id, m, pos,
                 array_to_string(toks[pos:pos + {k - 1}], ' ') AS gram
          FROM g),
    e AS (SELECT doc_id, m, pos,
                 ({gh}) * CAST({lim} AS BIGINT) + ({lim} - 1 - pos) AS enc
          FROM h),
    wmin AS (SELECT doc_id, m, pos,
                    MIN(enc) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW
                                   AND {w - 1} FOLLOWING) AS mn
             FROM e)
    SELECT DISTINCT doc_id,
           CAST({lim} - 1 - (mn % {lim}) AS BIGINT) AS pos,
           mn // {lim} AS gram_hash
    FROM wmin WHERE pos <= GREATEST(m - {w} + 1, 1)
    """


_CENTER_CELL9 = 648545242768778250  # kernel.cells.cell(47.60, -122.33, 9)


def q_grid_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straight-line cell paths from every distinct entity's res-9 cell
    to the city-center cell — one path per entity, H3 gridPathCells
    shape.  The center-cell literal is pinned from kernel.cells (twin
    asserted in tests)."""
    pts = _points(spark, sf_dir)
    pairs = (pts.select(F.col("entity").alias("pair_id"),
                        F.expr(sqlfns.cell_sql("lat", "lng", 9))
                        .alias("cell_a"),
                        F.lit(_CENTER_CELL9).alias("cell_b"))
             .distinct())
    return SP.grid_paths(pairs)


def o_grid_paths() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    cell9 = sqlfns.cell_sql("lat", "lng", 9)
    off = (lambda ad: f"(CASE WHEN grid_dist = 0 THEN 0 ELSE "
           f"(2 * {ad} * step + grid_dist) // (2 * grid_dist) END)")
    return f"""
    WITH p AS ({_duck_points()}),
    e AS (SELECT DISTINCT entity AS pair_id, {cell9} AS cell_a,
                 CAST({_CENTER_CELL9} AS BIGINT) AS cell_b FROM p),
    m AS (SELECT pair_id, cell_a,
                 ABS((cell_b % {P28}) - (cell_a % {P28})) AS adi,
                 ABS(((cell_b % {P56}) // {P28})
                     - ((cell_a % {P56}) // {P28})) AS adj,
                 CASE WHEN (cell_b % {P28}) >= (cell_a % {P28})
                      THEN 1 ELSE -1 END AS si,
                 CASE WHEN ((cell_b % {P56}) // {P28})
                           >= ((cell_a % {P56}) // {P28})
                      THEN 1 ELSE -1 END AS sj
          FROM e),
    g AS (SELECT *, GREATEST(adi, adj) AS grid_dist FROM m),
    s AS (SELECT pair_id, cell_a, adi, adj, si, sj, grid_dist,
                 unnest(range(0, grid_dist + 1)) AS step FROM g)
    SELECT pair_id, grid_dist, step,
           (cell_a // {P56}) * {P56}
           + (((cell_a % {P56}) // {P28}) + sj * {off('adj')}) * {P28}
           + ((cell_a % {P28}) + si * {off('adi')}) AS cell
    FROM s
    """


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.containment_pairs(docs, threshold=0.6)


def o_containment_pairs() -> str:
    sh = _duck_shingles()
    ph = sqlfns.polyhash_duckdb("s")
    inter = "CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)"
    return f"""
    WITH toks AS (SELECT doc_id, list_sort(list_distinct({sh})) AS t,
                         len(list_distinct({sh})) AS nt FROM documents),
    ex AS (SELECT doc_id, unnest(list_transform(t, s -> {ph})) AS gh
           FROM toks),
    rare AS (SELECT gh FROM ex GROUP BY gh HAVING COUNT(*) <= 64),
    exk AS (SELECT ex.doc_id, ex.gh FROM ex
            WHERE ex.gh IN (SELECT gh FROM rare)),
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM exk x JOIN exk y
               ON x.gh = y.gh AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b,
           ROUND({inter} / a.nt, 6) AS cont_ab,
           ROUND({inter} / b.nt, 6) AS cont_ba
    FROM cand JOIN toks a ON cand.doc_a = a.doc_id
              JOIN toks b ON cand.doc_b = b.doc_id
    WHERE GREATEST(ROUND({inter} / a.nt, 6),
                   ROUND({inter} / b.nt, 6)) >= 0.6e0
    """


_LINES_PER = 8  # tokens per synthetic line (multi-line view of documents)


def _multiline_spark() -> str:
    """SQL template: documents.text re-wrapped into CHR(10)-joined lines
    of _LINES_PER tokens — the driver's documents table is single-line
    token text, and line_dedup's grain needs real lines.  Shared-vocab
    token streams make verbatim 8-token lines recur across docs, so the
    dedup actually fires at sf0.01.  DuckDB twin below."""
    t = dedup._tokens("text")
    n = _LINES_PER
    return (f"CASE WHEN SIZE({t}) = 0 THEN '' ELSE "
            f"ARRAY_JOIN(TRANSFORM(SEQUENCE(CAST(1 AS BIGINT), "
            f"CAST(CEIL(SIZE({t}) / {n}.0e0) AS BIGINT)), "
            f"i -> CONCAT_WS(' ', SLICE({t}, CAST((i - 1) * {n} + 1 AS INT), {n}))), "
            f"CHR(10)) END")


def _multiline_duckdb() -> str:
    t = _duck_tokens("text")
    n = _LINES_PER
    return (f"CASE WHEN len({t}) = 0 THEN '' ELSE "
            f"array_to_string(list_transform("
            f"range(1, CAST(CEIL(len({t}) / {n}.0e0) AS BIGINT) + 1), "
            f"i -> array_to_string(list_slice({t}, (i - 1) * {n} + 1, "
            f"(i - 1) * {n} + {n}), ' ')), chr(10)) END")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ml = docs.selectExpr("doc_id", f"{_multiline_spark()} AS text")
    return dedup.line_dedup(ml)


def o_line_dedup() -> str:
    lh = sqlfns.polyhash_duckdb("s")
    return f"""
    WITH m AS (SELECT doc_id, {_multiline_duckdb()} AS text FROM documents),
    l AS (SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS ls
          FROM m),
    e AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS p FROM l),
    occ AS (SELECT doc_id, p, ls[p] AS s,
                   doc_id * 1048576 + p AS okey FROM e),
    h AS (SELECT doc_id, p, okey, ({lh}) AS lh FROM occ),
    dup AS (SELECT lh, MIN(okey) AS keep_key FROM h
            GROUP BY lh HAVING COUNT(*) >= 2),
    rem AS (SELECT doc_id, list(p) AS ps FROM h JOIN dup USING (lh)
            WHERE okey != keep_key GROUP BY doc_id)
    SELECT l.doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(COALESCE(len(ps), 0) AS BIGINT) AS n_lines_removed,
           COALESCE(array_to_string(list_transform(
               list_filter(range(1, len(ls) + 1),
                           i -> NOT list_contains(COALESCE(ps, []), i)),
               i -> ls[i]), chr(10)), '') AS clean_text
    FROM l LEFT JOIN rem ON l.doc_id = rem.doc_id
    """


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query set as tfidf_topk (first 8 tokens of every 97th doc) so
    the two scorers are directly comparable; BM25's length normalization
    re-ranks long token-stuffed docs DOWN relative to tf-idf."""
    from ..operators import search
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = docs.filter("doc_id % 97 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.expr(f"SLICE({text._tokens()}, 1, 8)")).alias("term"))
    return search.bm25_topk(docs, queries, k=5)


def o_bm25_topk() -> str:
    t = _duck_tokens()
    part = sqlfns.bm25_part_sql()
    return f"""
    WITH d AS (SELECT doc_id, {t} AS t FROM documents),
    ex AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term
           FROM d),
    tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
           FROM ex GROUP BY 1, 2),
    idx AS (SELECT term, doc_id, tf, dl,
                   CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
            FROM tf),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(len(t)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  AS avgdl FROM d),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id, unnest(list_slice({t}, 1, 8)) AS term
            FROM documents WHERE doc_id % 97 = 0)),
    sc AS (SELECT q.query_id, idx.doc_id,
                  SUM({part}) AS score_fx,
                  CAST(COUNT(*) AS BIGINT) AS n_terms_hit
           FROM idx JOIN q USING (term), st GROUP BY 1, 2)
    SELECT query_id, doc_id, CAST(score_fx AS BIGINT) AS score_fx,
           n_terms_hit, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score_fx DESC, doc_id) AS rank FROM sc)
    WHERE rank <= 5
    """


def q_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events as mobility pings: each (user_id, event_id % 7) pair
    hash-geocodes to one of 7 deterministic anchor positions per user,
    so trajectories really MOVE (repeat visits, returns, zero-length
    steps all occur).  Cell encode via the shared templates — the DuckDB
    twin reproduces every ping bit-for-bit."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ent = ("CONCAT('loc_', CAST(user_id AS STRING), '_', "
           "CAST(event_id % 7 AS STRING))")
    lat, lng = synth.entity_latlng_sql(ent)
    pts = ev.selectExpr("user_id AS traj_id", "ts", "event_id",
                        f"{sqlfns.cell_sql(lat, lng, 9)} AS cell")
    return SP.trajectory_stats(pts)


def o_trajectory_stats() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    ent = ("CONCAT('loc_', CAST(user_id AS VARCHAR), '_', "
           "CAST(event_id % 7 AS VARCHAR))")
    lat, lng = synth.entity_latlng_sql_duckdb(ent)
    cell = sqlfns.cell_sql(lat, lng, 9)
    i, j = f"(cell % {P28})", f"((cell % {P56}) // {P28})"
    pi, pj = f"(pc % {P28})", f"((pc % {P56}) // {P28})"
    si, sj = f"(start_cell % {P28})", f"((start_cell % {P56}) // {P28})"
    ei, ej = f"(end_cell % {P28})", f"((end_cell % {P56}) // {P28})"
    w = "PARTITION BY traj_id ORDER BY ts, event_id"
    return f"""
    WITH p AS (SELECT user_id AS traj_id, ts, event_id,
                      CAST({cell} AS BIGINT) AS cell FROM events),
    s AS (SELECT traj_id, cell, LAG(cell) OVER ({w}) AS pc,
                 ROW_NUMBER() OVER ({w}) AS rn,
                 COUNT(*) OVER (PARTITION BY traj_id) AS n FROM p),
    st AS (SELECT traj_id,
                  CASE WHEN pc IS NULL THEN 0 ELSE
                       GREATEST(ABS({i} - {pi}), ABS({j} - {pj})) END AS step,
                  CASE WHEN rn = 1 THEN cell END AS s0,
                  CASE WHEN rn = n THEN cell END AS s1 FROM s),
    agg AS (SELECT traj_id, CAST(COUNT(*) AS BIGINT) AS n_points,
                   CAST(SUM(CASE WHEN step > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_moves,
                   CAST(SUM(step) AS BIGINT) AS total_dist,
                   CAST(MAX(step) AS BIGINT) AS max_step,
                   MAX(s0) AS start_cell, MAX(s1) AS end_cell
            FROM st GROUP BY traj_id)
    SELECT *, CAST(GREATEST(ABS({ei} - {si}), ABS({ej} - {sj})) AS BIGINT)
              AS net_dist
    FROM agg
    """


def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clusters over the geocoded entity points at res 9
    (min_pts = 5 keeps ~29 of 31 occupied cells dense at sf0.01, so the
    CC stage runs on a real multi-cell component)."""
    pts = _points(spark, sf_dir)
    return SP.grid_dbscan(
        pts.selectExpr(f"{sqlfns.cell_sql('lat', 'lng', 9)} AS cell"),
        min_pts=5)


def o_grid_dbscan() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    cell = sqlfns.cell_sql("lat", "lng", 9)
    return f"""
    WITH RECURSIVE p AS ({_duck_points()}),
    c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM p GROUP BY 1),
    dense AS (SELECT * FROM c WHERE n_points >= 5),
    e AS (SELECT a.cell AS src, b.cell AS dst FROM dense a JOIN dense b
          ON ABS((a.cell % {P28}) - (b.cell % {P28})) <= 1
          AND ABS(((a.cell % {P56}) // {P28})
                  - ((b.cell % {P56}) // {P28})) <= 1
          AND a.cell != b.cell),
    r(root, node) AS (
        SELECT cell, cell FROM dense
        UNION
        SELECT r.root, e.dst FROM r JOIN e ON r.node = e.src),
    lab AS (SELECT node AS cell, MIN(root) AS cluster_id FROM r
            GROUP BY node)
    SELECT d.cell, lab.cluster_id, d.n_points
    FROM dense d JOIN lab ON d.cell = lab.cell
    """


def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OD flows between res-7 zones from the trajectory_stats ping set
    (same 7-anchor geocode, so real inter-zone transitions occur)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ent = ("CONCAT('loc_', CAST(user_id AS STRING), '_', "
           "CAST(event_id % 7 AS STRING))")
    lat, lng = synth.entity_latlng_sql(ent)
    pings = ev.selectExpr("user_id AS traj_id", "ts", "event_id",
                          f"{sqlfns.cell_sql(lat, lng, 9)} AS cell")
    return SP.od_matrix(pings, parent_res=7, res=9)


def o_od_matrix() -> str:
    ent = ("CONCAT('loc_', CAST(user_id AS VARCHAR), '_', "
           "CAST(event_id % 7 AS VARCHAR))")
    lat, lng = synth.entity_latlng_sql_duckdb(ent)
    cell = sqlfns.cell_sql(lat, lng, 9)
    o = sqlfns.parent_sql("pc", 9, 7)
    d = sqlfns.parent_sql("cell", 9, 7)
    w = "PARTITION BY traj_id ORDER BY ts, event_id"
    return f"""
    WITH p AS (SELECT user_id AS traj_id, ts, event_id,
                      CAST({cell} AS BIGINT) AS cell FROM events),
    s AS (SELECT traj_id, cell, LAG(cell) OVER ({w}) AS pc FROM p),
    t AS (SELECT traj_id, {o} AS o_zone, {d} AS d_zone FROM s
          WHERE pc IS NOT NULL)
    SELECT o_zone, d_zone, CAST(COUNT(*) AS BIGINT) AS n_trans,
           CAST(COUNT(DISTINCT traj_id) AS BIGINT) AS n_trajs
    FROM t GROUP BY 1, 2
    """


def q_hotspot_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gi* over the per-cell entity counts at res 9 (g3_focal_sum's
    raster upgraded to a significance score); z rounded in-query to 6
    so the value-hash compare is engine-proof."""
    pts = _points(spark, sf_dir)
    cnt = (pts.selectExpr(f"{sqlfns.cell_sql('lat', 'lng', 9)} AS cell")
           .groupBy("cell").agg(F.count("*").alias("n")))
    return SP.hotspot_gi(cnt, k=1).select(
        "cell", "v", "focal_sum", "w",
        F.round("z", 6).alias("z_r6"))


def o_hotspot_gi() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    cell = sqlfns.cell_sql("lat", "lng", 9)
    z = sqlfns.gi_z_sql()
    return f"""
    WITH p AS ({_duck_points()}),
    c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS v
          FROM p GROUP BY 1),
    f AS (SELECT a.cell, CAST(SUM(b.v) AS BIGINT) AS focal_sum,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM c a JOIN c b
          ON ABS((a.cell % {P28}) - (b.cell % {P28})) <= 1
          AND ABS(((a.cell % {P56}) // {P28})
                  - ((b.cell % {P56}) // {P28})) <= 1
          GROUP BY a.cell),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                  CAST(SUM(v) AS BIGINT) AS sum_x,
                  CAST(SUM(v * v) AS BIGINT) AS sum_x2 FROM c)
    SELECT c.cell, c.v, f.focal_sum, f.w, ROUND({z}, 6) AS z_r6
    FROM c JOIN f ON c.cell = f.cell, st
    """


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-sample 100 docs by DSIR weight (same target split as
    dsir_weights)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.dsir_sample(docs, docs.filter("doc_id % 11 = 0"), k=100)


def o_dsir_sample() -> str:
    u = (f"(({sqlfns.polyhash_duckdb('CAST(doc_id AS VARCHAR)')}) "
         f"% 1000003) + 1")
    pr = "CAST(score_fx + 1 AS DOUBLE) / CAST(u AS DOUBLE)"
    return f"""
    WITH dw AS (SELECT * FROM ({o_dsir_weights()}) t),
    s AS (SELECT doc_id, score_fx, {u} AS u FROM dw)
    SELECT doc_id, score_fx, u, ROUND({pr}, 6) AS pr_r6
    FROM s ORDER BY {pr} DESC, doc_id LIMIT 100
    """


def q_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I over the same per-cell entity counts hotspot_gi
    scores locally; the BIGINT num/den are part of the output so the
    oracle pins the exact integer reduction, not just the ratio."""
    pts = _points(spark, sf_dir)
    cnt = (pts.selectExpr(f"{sqlfns.cell_sql('lat', 'lng', 9)} AS cell")
           .groupBy("cell").agg(F.count("*").alias("n")))
    return SP.moran_i(cnt, k=1).select(
        "n_cells", "w_sum", "num", "den",
        F.round("moran_i", 6).alias("moran_r6"))


def o_moran_i() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    cell = sqlfns.cell_sql("lat", "lng", 9)
    return f"""
    WITH p AS ({_duck_points()}),
    c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS v
          FROM p GROUP BY 1),
    f AS (SELECT a.cell, CAST(SUM(b.v) AS BIGINT) AS fs,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM c a JOIN c b
          ON ABS((a.cell % {P28}) - (b.cell % {P28})) <= 1
          AND ABS(((a.cell % {P56}) // {P28})
                  - ((b.cell % {P56}) // {P28})) <= 1
          GROUP BY a.cell),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                  CAST(SUM(v) AS BIGINT) AS sum_x FROM c),
    per AS (SELECT n_cells,
                   n_cells * v - sum_x AS dev,
                   n_cells * (fs - v) - (w - 1) * sum_x AS lagdev,
                   w - 1 AS wi
            FROM c JOIN f ON c.cell = f.cell, st),
    agg AS (SELECT n_cells, CAST(SUM(wi) AS BIGINT) AS w_sum,
                   CAST(SUM(dev * lagdev) AS BIGINT) AS num,
                   CAST(SUM(dev * dev) AS BIGINT) AS den
            FROM per GROUP BY 1)
    SELECT n_cells, w_sum, num, den,
           ROUND(CASE WHEN w_sum > 0 AND den > 0 THEN
                 (CAST(n_cells AS DOUBLE) * CAST(num AS DOUBLE)) /
                 (CAST(w_sum AS DOUBLE) * CAST(den AS DOUBLE))
                 ELSE NULL END, 6) AS moran_r6
    FROM agg
    """


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the deterministic 3-fanout link
    graph (degree-oriented wedge closure; same edge derivation as
    pagerank, so the DuckDB twin reuses o_pagerank's edge SQL)."""
    from ..operators import graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.triangle_count(graph.link_graph(docs))


def o_triangle_count() -> str:
    # UNION ALL, not o_pagerank's unnest form: a COUNT/aggregate over the
    # unnest subquery trips a DuckDB internal binder error ("Failed to
    # bind column reference dst") in this duckdb build; the three affine
    # maps are identical either way
    maps = ["(src * 17 + 1)", "(src * 31 + 7)", "(src * 2 + 3)"]
    edges = "\n    UNION ALL\n".join(
        f"""    SELECT src, CAST({m} % _n AS BIGINT) AS dst
    FROM (SELECT doc_id AS src FROM documents),
         (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM documents)"""
        for m in maps)
    lower = "(da < db OR (da = db AND a < b))"
    return f"""
    WITH ed AS (SELECT * FROM ({edges}) WHERE src != dst),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ed),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS node FROM und
                  UNION ALL SELECT b AS node FROM und)
            GROUP BY 1),
    e AS (SELECT und.a AS a, und.b AS b, da.deg AS da, db.deg AS db
          FROM und JOIN deg da ON da.node = und.a
          JOIN deg db ON db.node = und.b),
    o AS (SELECT CASE WHEN {lower} THEN a ELSE b END AS src,
                 CASE WHEN {lower} THEN b ELSE a END AS dst,
                 CASE WHEN {lower} THEN db ELSE da END AS ddst
          FROM e),
    wg AS (SELECT e1.src AS u, e1.dst AS x, e2.dst AS y
           FROM o e1 JOIN o e2 ON e1.src = e2.src
           AND (e1.ddst < e2.ddst
                OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))),
    -- inner join (not EXISTS) is a faithful semi-join here: oriented
    -- edges are unique (und is DISTINCT), so at most one closing match
    t AS (SELECT wg.u, wg.x, wg.y FROM wg
          JOIN o ON o.src = wg.x AND o.dst = wg.y),
    corners AS (SELECT unnest([u, x, y]) AS node FROM t)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM corners GROUP BY 1
    """


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization of the events stream; gap = 4 h (the synthetic
    per-user median gap is ~7 h, so sessions genuinely mix sizes)."""
    from ..operators import temporal
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.sessionize(ev, gap_s=14400)


def o_sessionize() -> str:
    return """
    WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq
               FROM events),
    m AS (SELECT user_id, ts_us, seq,
                 CASE WHEN LAG(ts_us) OVER w IS NULL
                      OR ts_us - LAG(ts_us) OVER w > 14400000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, seq)),
    s AS (SELECT user_id, ts_us,
                 SUM(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, seq
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM m)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM s GROUP BY 1, 2
    """


def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map matching of the in-coverage mobility pings (trajectory_stats'
    ping derivation + the g5 bbox filter) onto the grid-city sidewalk
    segments.  Segment identity in the OUTPUT is the rounded midpoint —
    the oracle's closed-form segment relation has no engine ids, and
    midpoints are bijective with segments on the grid (the
    _duck_pip_pairs identity trick)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ent = ("CONCAT('loc_', CAST(user_id AS STRING), '_', "
           "CAST(event_id % 7 AS STRING))")
    lat, lng = synth.entity_latlng_sql(ent)
    pings = (ev.selectExpr("user_id AS traj_id", "event_id", "ts",
                           f"{lat} AS lat", f"{lng} AS lng")
             .filter(f"lat > {LAT_LO} AND lat < {LAT_HI} "
                     f"AND lng > {LNG_LO} AND lng < {LNG_HI}")
             .selectExpr("traj_id", "event_id", "ts", "lat", "lng",
                         f"{sqlfns.cell_sql('lat', 'lng', 9)} AS cell9"))
    seg_cells = SP.segments_by_cell(_grid_buffers(spark, res=9))
    mm = SP.map_match(pings, seg_cells, max_ring=6)
    segs = _grid_sidewalk_segments(spark)
    return (mm.join(segs.select("segment_id", "alat", "alng",
                                "blat", "blng"), "segment_id")
            .selectExpr("traj_id", "traversal_id", "n_pings",
                        "enter_us", "leave_us",
                        "ROUND((alat + blat) / 2, 6) AS seg_mid_lat",
                        "ROUND((alng + blng) / 2, 6) AS seg_mid_lng"))


def o_map_match() -> str:
    ent = ("CONCAT('loc_', CAST(user_id AS VARCHAR), '_', "
           "CAST(event_id % 7 AS VARCHAR))")
    lat, lng = synth.entity_latlng_sql_duckdb(ent)
    dist = sqlfns.seg_dist_sql("p.lat", "p.lng", "s.alat", "s.alng",
                               "s.blat", "s.blng")
    return f"""
    WITH raw AS (SELECT user_id AS traj_id, event_id, epoch_us(ts) AS ts_us,
                        {lat} AS lat, {lng} AS lng FROM events),
    p AS (SELECT * FROM raw WHERE lat > {LAT_LO} AND lat < {LAT_HI}
          AND lng > {LNG_LO} AND lng < {LNG_HI}),
    sn AS (SELECT p.traj_id, p.event_id, p.ts_us,
                  ROUND((s.alat + s.blat) / 2, 6) AS seg_mid_lat,
                  ROUND((s.alng + s.blng) / 2, 6) AS seg_mid_lng,
                  ROW_NUMBER() OVER (PARTITION BY p.traj_id, p.event_id
                       ORDER BY {dist}, s.alat, s.alng, s.blat) AS rn
           FROM p, ({_duck_sidewalk_segments()}) s),
    m AS (SELECT traj_id, event_id, ts_us, seg_mid_lat, seg_mid_lng
          FROM sn WHERE rn = 1),
    r AS (SELECT *, CASE WHEN LAG(seg_mid_lat) OVER w
                              IS DISTINCT FROM seg_mid_lat
                         OR LAG(seg_mid_lng) OVER w
                              IS DISTINCT FROM seg_mid_lng
                    THEN 1 ELSE 0 END AS nr
          FROM m WINDOW w AS (PARTITION BY traj_id ORDER BY ts_us, event_id)),
    s2 AS (SELECT *, SUM(nr) OVER (PARTITION BY traj_id
                                   ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS traversal_id
           FROM r)
    SELECT traj_id, CAST(traversal_id AS BIGINT) AS traversal_id,
           CAST(COUNT(*) AS BIGINT) AS n_pings,
           MIN(ts_us) AS enter_us, MAX(ts_us) AS leave_us,
           seg_mid_lat, seg_mid_lng
    FROM s2 GROUP BY traj_id, traversal_id, seg_mid_lat, seg_mid_lng
    """


def _duck_link_edges() -> str:
    """link_graph's 3 affine maps as UNION ALL (o_triangle_count's form —
    the unnest shape trips a DuckDB binder bug under aggregates)."""
    maps = ["(src * 17 + 1)", "(src * 31 + 7)", "(src * 2 + 3)"]
    inner = "\n    UNION ALL\n".join(
        f"""    SELECT src, CAST({m} % _n AS BIGINT) AS dst
    FROM (SELECT doc_id AS src FROM documents),
         (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM documents)"""
        for m in maps)
    return f"SELECT * FROM ({inner}) WHERE src != dst"


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 exact L1-normalized HITS rounds over the link graph; scores
    BIGINT so the vectors are bit-identical at any parallelism and vs
    the unrolled DuckDB twin."""
    from ..operators import graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.hits(graph.link_graph(docs), n_iter=5)


def o_hits() -> str:
    from ..operators import graph
    return graph.hits_duckdb_sql(_duck_link_edges(), n_iter=5)


def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-round multi-source BFS over the link graph, seeds = every
    101st page — exact integer hop distances, frontier-only rounds."""
    from ..operators import graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seeds = docs.filter("doc_id % 101 = 0").selectExpr(
        "doc_id AS node_id")
    return graph.bfs_distances(graph.link_graph(docs), seeds, n_rounds=5)


def o_bfs_distances() -> str:
    from ..operators import graph
    return graph.bfs_duckdb_sql(
        _duck_link_edges(),
        "SELECT doc_id AS node_id FROM documents WHERE doc_id % 101 = 0",
        n_rounds=5)


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 deterministic LPA rounds over the link graph — most-frequent
    in-neighbor label, ties by smallest label."""
    from ..operators import graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.label_propagation(graph.link_graph(docs), n_rounds=5)


def o_label_propagation() -> str:
    from ..operators import graph
    return graph.lpa_duckdb_sql(_duck_link_edges(), n_rounds=5)


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TextRank keywords: pagerank over the adjacent-token
    co-occurrence graph, top 25 terms by (rank_fx DESC, term ASC)."""
    from ..operators import graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.textrank_keywords(docs, k=25, n_iter=5)


def o_textrank() -> str:
    from ..operators import graph
    # the same window-2 graph: adjacent token pairs per document, both
    # directions, self-pairs dropped; lateral UNNEST walks each token
    # array once, exactly like the Spark side's shifted-slice zip
    adj = """
      SELECT t[u.i] AS w1, t[u.i + 1] AS w2
      FROM (SELECT list_filter(string_split(text, ' '),
                               x -> length(x) > 0) AS t FROM documents),
           UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      WHERE t[u.i] != t[u.i + 1]
    """
    edges = (f"SELECT w1 AS src, w2 AS dst FROM ({adj}) "
             f"UNION ALL SELECT w2 AS src, w1 AS dst FROM ({adj})")
    pr = graph.pagerank_duckdb_sql(edges, n_iter=5)
    return (f"SELECT node_id AS term, rank_fx FROM ({pr}) "
            f"ORDER BY rank_fx DESC, term ASC LIMIT 25")


PHRASE = ["order", "fast"]  # a genuinely frequent synthetic-corpus bigram


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact positional phrase query, top 20 docs by occurrence count."""
    from ..operators import search
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return search.phrase_search(docs, PHRASE, k=20)


def o_phrase_search() -> str:
    from ..operators import search
    return search.phrase_duckdb_sql(PHRASE, k=20)


def q_ts_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-reset-aware increase/rate between consecutive samples."""
    from ..operators import temporal
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.ts_rate(ev)


def o_ts_rate() -> str:
    return """
    WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq,
                      value AS v FROM events),
    l AS (SELECT user_id, ts_us,
                 ts_us - LAG(ts_us) OVER w AS dt_us,
                 CASE WHEN v >= LAG(v) OVER w THEN v - LAG(v) OVER w
                      ELSE v END AS increase
          FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, seq))
    SELECT user_id, ts_us, dt_us, increase,
           CASE WHEN dt_us = 0 THEN NULL
                ELSE increase / (dt_us / 1000000.0) END AS rate_per_s
    FROM l WHERE dt_us IS NOT NULL
    """


TSR_BIN_S = 21600  # 6 h bins over the 30-day synthetic event stream


def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 6-hour resample of the event stream with LOCF values
    (the time_bucket_gapfill + locf rollup)."""
    from ..operators import temporal
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return temporal.ts_resample(ev, bin_s=TSR_BIN_S)


def o_ts_resample() -> str:
    bin_us = TSR_BIN_S * 1_000_000
    return f"""
    WITH b AS (SELECT user_id, epoch_us(ts) // {bin_us} AS bin_no,
                      epoch_us(ts) AS ts_us, event_id AS seq, value AS v
               FROM events),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, bin_no
                     ORDER BY ts_us DESC, seq DESC) AS rn FROM b),
    binned AS MATERIALIZED (
        SELECT user_id, bin_no, CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(CASE WHEN rn = 1 THEN v END) AS v_last
        FROM rk GROUP BY 1, 2),
    spans AS (SELECT user_id, MIN(bin_no) AS b_lo, MAX(bin_no) AS b_hi
              FROM binned GROUP BY 1),
    grid AS (SELECT user_id, UNNEST(generate_series(b_lo, b_hi)) AS bin_no
             FROM spans),
    filled AS (SELECT g.user_id, g.bin_no,
                      COALESCE(n.n_events, CAST(0 AS BIGINT)) AS n_events,
                      n.v_last
               FROM grid g LEFT JOIN binned n
               ON g.user_id = n.user_id AND g.bin_no = n.bin_no)
    SELECT user_id, bin_no * CAST({bin_us} AS BIGINT) AS bin_us, n_events,
           LAST_VALUE(v_last IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bin_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
    FROM filled
    """


# zonal_stats zones: lattice rectangles around the synthetic city center
# (kernel cell_ij of _CENTER_CELL9 = (41994, 100197) at res 9): a core
# rectangle, a wider ring-shaped overlap, and a deliberately EMPTY far
# rectangle that pins the every-zone-appears contract
_ZONES = [
    ("core", 41990, 41998, 100193, 100201),
    ("wide", 41980, 42008, 100183, 100211),
    ("empty", 60000, 60004, 10000, 10004),
]


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics of the per-cell entity counts over three fixed
    lattice rectangles (overlapping + one empty)."""
    pts = _points(spark, sf_dir)
    cnt = (pts.selectExpr(f"{sqlfns.cell_sql('lat', 'lng', 9)} AS cell")
           .groupBy("cell").agg(F.count("*").cast("long").alias("v")))
    zones = spark.createDataFrame(
        _ZONES, "zone_id string, i_lo long, i_hi long, j_lo long, j_hi long")
    return SP.zonal_stats(cnt, zones)


def o_zonal_stats() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    cell = sqlfns.cell_sql("lat", "lng", 9)
    zrows = " UNION ALL ".join(
        f"SELECT '{z}' AS zone_id, CAST({a} AS BIGINT) AS i_lo, "
        f"CAST({b} AS BIGINT) AS i_hi, CAST({c} AS BIGINT) AS j_lo, "
        f"CAST({d} AS BIGINT) AS j_hi"
        for z, a, b, c, d in _ZONES)
    return f"""
    WITH p AS ({_duck_points()}),
    c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS v
          FROM p GROUP BY 1),
    zs AS ({zrows}),
    hit AS (SELECT zone_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(v) AS BIGINT) AS v_sum,
                   MIN(v) AS v_min, MAX(v) AS v_max
            FROM c JOIN zs
            ON (c.cell % {P28}) >= zs.i_lo AND (c.cell % {P28}) <= zs.i_hi
            AND ((c.cell % {P56}) // {P28}) >= zs.j_lo
            AND ((c.cell % {P56}) // {P28}) <= zs.j_hi
            GROUP BY zone_id)
    SELECT zs.zone_id, COALESCE(n_cells, CAST(0 AS BIGINT)) AS n_cells,
           COALESCE(v_sum, CAST(0 AS BIGINT)) AS v_sum, v_min, v_max
    FROM zs LEFT JOIN hit ON zs.zone_id = hit.zone_id
    """


def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-time MK trend over the mobility pings: per-(cell, day)
    counts at res 9, focal-summed per day, MK statistic per cell over
    the ~30 daily slices — every step BIGINT."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ent = ("CONCAT('loc_', CAST(user_id AS STRING), '_', "
           "CAST(event_id % 7 AS STRING))")
    lat, lng = synth.entity_latlng_sql(ent)
    cb = (ev.selectExpr(
            f"{sqlfns.cell_sql(lat, lng, 9)} AS cell",
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 "
            "AS BIGINT) AS bin")
          .groupBy("cell", "bin").agg(F.count("*").alias("v")))
    return SP.emerging_hotspots(cb, k=1)


def o_emerging_hotspots() -> str:
    P56, P28 = sqlfns.POW2_56, sqlfns.POW2_28
    ent = ("CONCAT('loc_', CAST(user_id AS VARCHAR), '_', "
           "CAST(event_id % 7 AS VARCHAR))")
    lat, lng = synth.entity_latlng_sql_duckdb(ent)
    cell = sqlfns.cell_sql(lat, lng, 9)
    return f"""
    WITH cb AS (SELECT CAST({cell} AS BIGINT) AS cell,
                       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS bin,
                       CAST(COUNT(*) AS BIGINT) AS v
                FROM events GROUP BY 1, 2),
    cells AS (SELECT DISTINCT cell FROM cb),
    -- receiving set = occupied cells x EVERY bin where a disk neighbor
    -- is occupied (the engine's scatter reaches a cell in bins where
    -- only its neighbors have mass; the cell's own v that bin is 0)
    f AS (SELECT a.cell, b.bin, CAST(SUM(b.v) AS BIGINT) AS fs
          FROM cells a JOIN cb b
          ON ABS((a.cell % {P28}) - (b.cell % {P28})) <= 1
          AND ABS(((a.cell % {P56}) // {P28})
                  - ((b.cell % {P56}) // {P28})) <= 1
          GROUP BY 1, 2),
    rng AS (SELECT MIN(bin) AS b0, MAX(bin) AS b1 FROM cb),
    dense AS (SELECT cells.cell,
                     unnest(generate_series(rng.b0, rng.b1)) AS bin
              FROM cells, rng),
    ts_series AS (SELECT d.cell, d.bin, COALESCE(f.fs, 0) AS fs
                  FROM dense d LEFT JOIN f
                  ON f.cell = d.cell AND f.bin = d.bin),
    pr AS (SELECT d1.cell,
                  CASE WHEN d2.fs > d1.fs THEN 1
                       WHEN d2.fs < d1.fs THEN -1 ELSE 0 END AS sg
           FROM ts_series d1 JOIN ts_series d2
           ON d1.cell = d2.cell AND d2.bin > d1.bin)
    SELECT cell, CAST(SUM(sg) AS BIGINT) AS s_mk,
           CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           (SELECT CAST(b1 - b0 + 1 AS BIGINT) FROM rng) AS n_bins
    FROM pr GROUP BY cell
    """


QUERIES.update({
    "ccnet_buckets": (q_ccnet_buckets, o_ccnet_buckets),
    "url_filter": (q_url_filter, o_url_filter),
    "winnowing": (q_winnowing, o_winnowing),
    "grid_paths": (q_grid_paths, o_grid_paths),
    "containment_pairs": (q_containment_pairs, o_containment_pairs),
    "line_dedup": (q_line_dedup, o_line_dedup),
    "bm25_topk": (q_bm25_topk, o_bm25_topk),
    "trajectory_stats": (q_trajectory_stats, o_trajectory_stats),
    "grid_dbscan": (q_grid_dbscan, o_grid_dbscan),
    "od_matrix": (q_od_matrix, o_od_matrix),
    "hotspot_gi": (q_hotspot_gi, o_hotspot_gi),
    "dsir_sample": (q_dsir_sample, o_dsir_sample),
    "moran_i": (q_moran_i, o_moran_i),
    "triangle_count": (q_triangle_count, o_triangle_count),
    "sessionize": (q_sessionize, o_sessionize),
    "map_match": (q_map_match, o_map_match),
    "emerging_hotspots": (q_emerging_hotspots, o_emerging_hotspots),
    "hits": (q_hits, o_hits),
    "bfs_distances": (q_bfs_distances, o_bfs_distances),
    "label_propagation": (q_label_propagation, o_label_propagation),
    "textrank": (q_textrank, o_textrank),
    "ts_resample": (q_ts_resample, o_ts_resample),
    "phrase_search": (q_phrase_search, o_phrase_search),
    "ts_rate": (q_ts_rate, o_ts_rate),
    "zonal_stats": (q_zonal_stats, o_zonal_stats),
})


# --- wave-2 composed audits (driver-visible rows for tail operators) ----------
# The driver evaluates only the FIRST 50 QUERIES entries, and round 4 added 19
# real training-pipeline operators past that window (pytest-oracle-green but
# invisible to CORRECTNESS_r{N}.json — exactly the r3 failure mode, VERDICT.md
# 'Next round' #1, recurring at the next scale).  Each audit entry below runs a
# GROUP of tail operators end-to-end and reduces every output column of each
# one to engine-pinned BIGINT checksums — row count, per-column null count,
# SUM and SUM-of-squares for integers, length-sum and content-polyhash-sum for
# strings, and a fixed-point SUM (floor(x*1e6+0.5), the engine-agreed tie
# rule) for the already-bit-identical rounded doubles.  The DuckDB twin is the
# UNION ALL of the operators' EXISTING oracle SQL wrapped in the identical
# metric template, so a single flipped value, dropped row, or NULL anywhere in
# any grouped operator's full output changes at least one audit row.  The
# full-fidelity row-by-row comparison still runs for every grouped operator in
# tests/test_oracle.py (all registry pairs); the audits make the same
# verdict land in the driver's 50-entry window at a cost of 4 slots instead
# of 19.  Timestamp columns are skipped with a bijection argument: in
# asof_join/interval_join every compared event id functionally determines its
# timestamp in the generator, so hashing the ids pins the timestamps.
#
# Round-4 second pass: the 15 remaining oracle-backed tail entries (the
# r1-r3 variants the window reorder demoted — fingerprint, simhash,
# minhash_signatures, jaccard_pairs, ann/lsh_topk, tpch_q1/q5, ...) join
# the same groups, so EVERY oracle-backed registry entry now lands a
# driver-visible row; the only rows-only entry left outside is
# extract_text_identity, whose oracle-backed sibling extract_text_oracle
# sits directly in the window.

_AUDIT_SPECS: dict[str, list[tuple[str, str]]] = {
    # op -> [(column, kind)]; kind: i=integer, s=string, d=rounded double,
    # h=wide integer (62/64-bit hashes: fingerprints, simhashes, cell ids —
    # folded mod _AUDIT_SQ_MOD before SUM because a raw SUM of 500 62-bit
    # values overflows int64; Spark and DuckDB agree on % for negatives,
    # both truncate toward zero)
    "normalize_text": [("doc_id", "i"), ("norm_text", "s"),
                       ("n_norm_chars", "i")],
    "pii_scrub": [("doc_id", "i"), ("text_scrubbed", "s"),
                  ("n_emails", "i"), ("n_phones", "i")],
    "url_dedup": [("canonical_url", "s"), ("n_variants", "i"),
                  ("first_url", "s")],
    "remove_boilerplate": [("doc_id", "i"), ("domain", "s"),
                           ("clean_text", "s"), ("n_lines_kept", "i"),
                           ("n_lines_dropped", "i")],
    "ngram_counts": [("ngram", "s"), ("n_total", "i"), ("n_docs", "i")],
    "substring_dedup": [("doc_id", "i"), ("n_words", "i"),
                        ("n_words_removed", "i"), ("clean_text", "s")],
    "cdc_chunks": [("doc_id", "i"), ("chunk_no", "i"), ("chunk_len", "i"),
                   ("chunk_fp", "i")],
    "dedup_keep": [("doc_id", "i"), ("n_collapsed", "i")],
    "decontaminate": [("doc_id", "i"), ("n_hits", "i")],
    "repetition_stats": [("doc_id", "i"), ("n_tokens", "i"),
                         ("uniq_token_frac", "d"), ("top_2gram_frac", "d"),
                         ("dup_2gram_frac", "d")],
    "sequence_packing": [("doc_id", "i"), ("shard", "s"), ("n_tokens", "i"),
                         ("seq_id", "i"), ("seq_offset", "i")],
    "stratified_quota": [("doc_id", "i"), ("lang", "s"), ("rk", "i")],
    "global_shuffle": [("doc_id", "i"), ("shard", "i"), ("pos", "i")],
    "length_quantiles": [("lang", "s"), ("n_docs", "i"), ("q25", "d"),
                         ("q5", "d"), ("q75", "d")],
    "asof_join": [("event_id", "i"), ("user_id", "i"), ("cents", "i"),
                  ("view_event_id", "i"), ("view_cents", "i")],
    "interval_join": [("event_id", "i"), ("user_id", "i"),
                      ("err_event_id", "i")],
    "quantize_embeddings": [("vec_id", "i"), ("n_dims", "i"), ("scale", "d"),
                            ("code_min", "i"), ("code_max", "i"),
                            ("code_sum", "i"), ("rmse", "d")],
    "quantized_topk": [("query_id", "i"), ("corpus_id", "i"), ("label", "i"),
                       ("cosine", "d"), ("rank", "i")],
    "inverted_index": [("term", "s"), ("doc_id", "i"), ("tf", "i"),
                       ("df", "i")],
    "tfidf_topk": [("query_id", "i"), ("doc_id", "i"), ("score_fx", "i"),
                   ("n_terms_hit", "i"), ("rank", "i")],
    "bloom_dedup": [("doc_id", "i"), ("bloom_maybe", "b"),
                    ("exact_dup", "b")],
    "domain_topk": [("domain", "s"), ("doc_id", "i"), ("quality", "d"),
                    ("rk", "i")],
    "pagerank": [("node_id", "i"), ("rank_fx", "i"), ("out_deg", "i")],
    "lm_fluency": [("doc_id", "i"), ("n_bigrams", "i"), ("n_oov", "i"),
                   ("score_fx", "i")],
    "dsir_weights": [("doc_id", "i"), ("n_grams", "i"),
                     ("n_target_hit", "i"), ("score_fx", "i")],
    "kmeans_assign": [("vec_id", "i"), ("cluster_id", "i"),
                      ("dist_fx", "i")],
    "semantic_dedup": [("vec_id", "i"), ("cluster_id", "i"),
                       ("group_id", "i"), ("keep", "b")],
    "mixture_weights": [("stratum", "s"), ("n_docs", "i"), ("sqrt_fx", "i"),
                        ("weight_fx", "i"), ("quota", "i")],
    "hash_embed": [("doc_id", "i"), ("dim_id", "i"), ("val", "i")],
    "chunk_windows": [("doc_id", "i"), ("chunk_no", "i"), ("start_tok", "i"),
                      ("n_tokens", "i"), ("chunk_text", "s")],
    "bpe_tokenize": [("doc_id", "i"), ("n_words", "i"), ("n_tokens", "i"),
                     ("n_merged", "i"), ("tok_text", "s")],
    "bpe_learn": [("merge_no", "i"), ("a", "s"), ("b", "s"),
                  ("pair_count", "i")],
    "jsonl_roundtrip": [("doc_id", "i"), ("lang", "s"), ("text", "s")],
    "image_phash_dedup": [("url", "s"), ("phash", "i"), ("n_copies", "i"),
                          ("keep", "b")],
    # --- second pass: demoted r1-r3 window entries -------------------------
    "fingerprint": [("doc_id", "i"), ("fingerprint", "h")],
    "simhash": [("doc_id", "i"), ("simhash", "h")],
    "simhash_pairs": [("doc_a", "i"), ("doc_b", "i"), ("simhash", "h")],
    "minhash_signatures": [("doc_id", "i"), ("sig_csv", "s")],
    "jaccard_pairs": [("doc_a", "i"), ("doc_b", "i"), ("jaccard", "d")],
    "incremental_dedup_bucketed": [("doc_id", "i"), ("fp", "h"),
                                   ("n_batch_dupes", "i")],
    "ann_topk": [("query_id", "i"), ("corpus_id", "i"), ("label", "i"),
                 ("cosine", "d"), ("rank", "i")],
    "lsh_topk": [("query_id", "i"), ("corpus_id", "i"), ("label", "i"),
                 ("bucket", "h"), ("cosine", "d"), ("rank", "i")],
    "g4_pip_join_rot": [("url", "s"), ("entity", "s"), ("cell9", "h"),
                        ("dist_r4", "d"), ("seg_mid_lat", "d"),
                        ("seg_mid_lng", "d")],
    "multimodal_features": [("url", "s"), ("media_type", "s"),
                            ("f0", "d"), ("f1", "d"), ("f2", "d"),
                            ("f3", "d"), ("f4", "d"), ("f5", "d"),
                            ("f6", "d"), ("f7", "d")],
    "deterministic_sample": [("doc_id", "i"), ("text", "s"), ("lang", "s"),
                             ("source", "s"), ("n_chars", "i")],
    "token_histogram": [("lang", "s"), ("bucket", "i"), ("n_docs", "i")],
    "tpch_q1": [("l_returnflag", "s"), ("l_linestatus", "s"),
                ("sum_qty", "i"), ("sum_base_cents", "i"),
                ("sum_disc_pct", "i"), ("count_order", "i")],
    "tpch_q5": [("n_name", "s"), ("revenue_cents", "i")],
    "broadcast_star_join": [("n_name", "s"), ("n_orders", "i"),
                            ("total_cents", "i")],
    # sketches (round-4 additions, registered past the window)
    "hll_distinct": [("lang", "s"), ("n_hit", "i"), ("sum_inv", "i"),
                     ("est_distinct", "i")],
    "cm_topk": [("token", "s"), ("est_count", "i"), ("rank", "i")],
    "qsk_quantiles": [("lang", "s"), ("n_docs", "i"), ("p25_lo", "i"),
                      ("p50_lo", "i"), ("p90_lo", "i"), ("p99_lo", "i")],
    "fetch_schedule": [("url", "s"), ("host", "s"), ("rank_in_host", "i"),
                       ("slot", "i")],
    "g3_compact": [("cell", "h"), ("cell_res", "i")],
    "g3_uncompact_roundtrip": [("cell", "h")],
    "g3_polyfill": [("cell", "h")],
    "g3_cells_geojson": [("cell", "h"), ("feature", "s")],
    "g3_focal_sum": [("cell", "h"), ("focal_sum", "i")],
    "gopher_rules": [("doc_id", "i"), ("n_words", "i"),
                     ("sum_word_chars", "i"), ("n_alpha_words", "i"),
                     ("n_symbols", "i"), ("n_stop_hits", "i"),
                     ("ok_words", "b"), ("ok_mean_len", "b"),
                     ("ok_alpha", "b"), ("ok_symbols", "b"),
                     ("ok_stop", "b"), ("keep", "b")],
    # catalog metadata ops (already aggregated outputs; kinds are plain)
    "g1_file_skip": [("n_rows", "i"), ("n_entities", "i"), ("sm_cell", "i")],
    "g1_merge_delete": [("lang", "s"), ("n_docs", "i"), ("sum_chars", "i"),
                        ("sum_id", "i")],
    "g1_catalog_pip": [("url", "s"), ("entity", "s"), ("cell9", "h"),
                       ("dist_r4", "d"), ("seg_mid_lat", "d"),
                       ("seg_mid_lng", "d")],
    # round-5 additions
    "ccnet_buckets": [("doc_id", "i"), ("lang", "s"), ("n_bigrams", "i"),
                      ("qscore", "i"), ("bucket", "s")],
    "url_filter": [("url", "s"), ("domain", "s"), ("blocked", "b"),
                   ("n_bad_words", "i"), ("keep", "b")],
    "winnowing": [("doc_id", "i"), ("pos", "i"), ("gram_hash", "h")],
    "grid_paths": [("pair_id", "s"), ("grid_dist", "i"), ("step", "i"),
                   ("cell", "h")],
    "containment_pairs": [("doc_a", "i"), ("doc_b", "i"),
                          ("cont_ab", "d"), ("cont_ba", "d")],
    "line_dedup": [("doc_id", "i"), ("n_lines", "i"),
                   ("n_lines_removed", "i"), ("clean_text", "s")],
    "bm25_topk": [("query_id", "i"), ("doc_id", "i"), ("score_fx", "i"),
                  ("n_terms_hit", "i"), ("rank", "i")],
    "trajectory_stats": [("traj_id", "i"), ("n_points", "i"),
                         ("n_moves", "i"), ("total_dist", "i"),
                         ("max_step", "i"), ("start_cell", "h"),
                         ("end_cell", "h"), ("net_dist", "i")],
    "grid_dbscan": [("cell", "h"), ("cluster_id", "h"), ("n_points", "i")],
    "od_matrix": [("o_zone", "h"), ("d_zone", "h"), ("n_trans", "i"),
                  ("n_trajs", "i")],
    "hotspot_gi": [("cell", "h"), ("v", "i"), ("focal_sum", "i"),
                   ("w", "i"), ("z_r6", "d")],
    "moran_i": [("n_cells", "i"), ("w_sum", "i"), ("num", "h"),
                ("den", "h"), ("moran_r6", "d")],
    "triangle_count": [("node", "i"), ("n_tri", "i")],
    "sessionize": [("user_id", "i"), ("session_id", "i"),
                   ("n_events", "i"), ("start_us", "h"), ("end_us", "h"),
                   ("duration_us", "h")],
    "hits": [("node_id", "i"), ("hub_fx", "i"), ("auth_fx", "i")],
    "bfs_distances": [("node_id", "i"), ("dist", "i")],
    "label_propagation": [("node_id", "i"), ("label", "i")],
    "textrank": [("term", "s"), ("rank_fx", "i")],
    "ts_resample": [("user_id", "i"), ("bin_us", "h"), ("n_events", "i"),
                    ("v_locf", "d")],
    "phrase_search": [("doc_id", "i"), ("n_occur", "i")],
    "ts_rate": [("user_id", "i"), ("ts_us", "h"), ("dt_us", "h"),
                ("increase", "d"), ("rate_per_s", "d")],
    "zonal_stats": [("zone_id", "s"), ("n_cells", "i"), ("v_sum", "i"),
                    ("v_min", "i"), ("v_max", "i")],
    "emerging_hotspots": [("cell", "h"), ("s_mk", "i"), ("n_pos", "i"),
                          ("n_neg", "i"), ("n_bins", "i")],
    "map_match": [("traj_id", "i"), ("traversal_id", "i"),
                  ("n_pings", "i"), ("enter_us", "h"), ("leave_us", "h"),
                  ("seg_mid_lat", "d"), ("seg_mid_lng", "d")],
    "dsir_sample": [("doc_id", "i"), ("score_fx", "i"), ("u", "i"),
                    ("pr_r6", "d")],
}

# overflow headroom (int64 max ~9.2e18): polyhash < 2^31, so the hash SUM
# holds to ~4e9 rows; the squared term is reduced mod 1000003 first, so
# SUM((c%m)^2) <= 1e12 * rows holds to ~9e6 rows — far above the sf0.01
# driver scale and asserted cheap here rather than discovered in ANSI mode.
_AUDIT_SQ_MOD = 1000003


def _audit_metrics(spec: list[tuple[str, str]], engine: str) -> list[tuple[str, str]]:
    """(metric_name, SQL) pairs — IDENTICAL math on both engines; only the
    string-polyhash template is dialect-specific (the fuzz-tested pair in
    functions/sqlfns.py)."""
    ph = sqlfns.polyhash_spark if engine == "spark" else sqlfns.polyhash_duckdb
    ms: list[tuple[str, str]] = []
    m = _AUDIT_SQ_MOD
    for col, kind in spec:
        if kind == "i":
            ms.append((f"sum_{col}",
                       f"CAST(COALESCE(SUM({col}), 0) AS BIGINT)"))
            ms.append((f"sq_{col}",
                       f"CAST(COALESCE(SUM(({col} % {m}) * ({col} % {m})), 0)"
                       f" AS BIGINT)"))
        elif kind == "h":
            # wide (62/64-bit) hash columns: raw SUM overflows int64 at a
            # few hundred rows, so the linear fold is mod-reduced too; both
            # engines' % truncates toward zero, so negatives agree
            ms.append((f"sm_{col}",
                       f"CAST(COALESCE(SUM({col} % {m}), 0) AS BIGINT)"))
            ms.append((f"sq_{col}",
                       f"CAST(COALESCE(SUM(({col} % {m}) * ({col} % {m})), 0)"
                       f" AS BIGINT)"))
        elif kind == "s":
            ms.append((f"len_{col}",
                       f"CAST(COALESCE(SUM(CAST(LENGTH({col}) AS BIGINT)), 0)"
                       f" AS BIGINT)"))
            ms.append((f"ph_{col}",
                       f"CAST(COALESCE(SUM({ph(col)}), 0) AS BIGINT)"))
        elif kind == "b":
            ms.append((f"nt_{col}",
                       f"CAST(COALESCE(SUM(CAST({col} AS INT)), 0)"
                       f" AS BIGINT)"))
        else:  # "d": in-query-rounded double, bit-identical across engines,
            # fixed-point folded with the floor(x*1e6+0.5) tie rule (ROUND
            # is HALF_UP-on-BigDecimal in Spark but not DuckDB)
            ms.append((f"fx_{col}",
                       f"CAST(COALESCE(SUM(CAST(FLOOR({col} * 1e6 + 0.5e0)"
                       f" AS BIGINT)), 0) AS BIGINT)"))
        ms.append((f"nn_{col}", f"CAST(COUNT({col}) AS BIGINT)"))
    ms.append(("n_rows", "CAST(COUNT(*) AS BIGINT)"))
    return ms


def _audit_spark(df: DataFrame, op: str) -> DataFrame:
    ms = _audit_metrics(_AUDIT_SPECS[op], "spark")
    wide = df.agg(*[F.expr(sql).alias(name) for name, sql in ms])
    pairs = ", ".join(f"'{name}', {name}" for name, _ in ms)
    return wide.selectExpr(
        f"'{op}' AS op", f"stack({len(ms)}, {pairs}) AS (metric, value)")


def _audit_group_query(ops: list[str]):
    qfns = {op: QUERIES[op][0] for op in ops}

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for op in ops:
            part = _audit_spark(qfns[op](spark, sf_dir), op)
            out = part if out is None else out.unionByName(part)
        return out

    return q


def _audit_group_oracle(ops: list[str]):
    ofns = {op: QUERIES[op][1] for op in ops}

    def o() -> str:
        ctes, branches = [], []
        for op in ops:
            ms = _audit_metrics(_AUDIT_SPECS[op], "duck")
            agg = ", ".join(f"{sql} AS {name}" for name, sql in ms)
            # MATERIALIZED: the UNION ALL below reads a_<op> once per
            # metric — without it DuckDB may inline the whole operator
            # twin into every branch
            ctes.append(f"r_{op} AS MATERIALIZED ({ofns[op]()})")
            ctes.append(f"a_{op} AS MATERIALIZED (SELECT {agg} FROM r_{op})")
            branches.extend(
                f"SELECT '{op}' AS op, '{name}' AS metric, {name} AS value"
                f" FROM a_{op}" for name, _ in ms)
        return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(branches)

    return o


_AUDIT_GROUPS = {
    "wave2_text_audit": ["normalize_text", "pii_scrub", "url_dedup",
                         "remove_boilerplate", "ngram_counts",
                         "fetch_schedule", "gopher_rules",
                         "inverted_index", "tfidf_topk", "domain_topk",
                         "lm_fluency", "dsir_weights", "hash_embed",
                         "chunk_windows", "jsonl_roundtrip",
                         "bpe_tokenize", "bpe_learn",
                         # round-5: CCNet buckets + RefinedWeb URL filter
                         # + BM25 length-normalized retrieval
                         "ccnet_buckets", "url_filter", "bm25_topk"],
    "wave2_dedup_audit": ["substring_dedup", "cdc_chunks", "dedup_keep",
                          "decontaminate", "repetition_stats",
                          "bloom_dedup", "image_phash_dedup",
                          # second pass: demoted dedup-family variants
                          "fingerprint", "simhash", "simhash_pairs",
                          "minhash_signatures", "jaccard_pairs",
                          "incremental_dedup_bucketed",
                          # round-5: winnowing sketch + asymmetric
                          # containment + CCNet line-grain dedup
                          "winnowing", "containment_pairs", "line_dedup"],
    "wave2_mixing_audit": ["sequence_packing", "stratified_quota",
                           "global_shuffle", "length_quantiles",
                           "mixture_weights",
                           # second pass: sampling/stats + relational aggs
                           "deterministic_sample", "token_histogram",
                           "tpch_q1", "tpch_q5", "broadcast_star_join",
                           # corpus-stats sketches
                           "hll_distinct", "cm_topk", "qsk_quantiles",
                           # round-5: DSIR priority resampling + gap
                           # sessionization (clickstream rollup shape)
                           "dsir_sample", "sessionize",
                           # catalog metadata ops (file-skip scan, COW
                           # merge/delete) — driver-visible via this group
                           "g1_file_skip", "g1_merge_delete"],
    # graph rides here: like the ANN ops it is an id-keyed fixed-point op
    "wave2_temporal_ann_audit": ["asof_join", "interval_join",
                                 "quantize_embeddings", "quantized_topk",
                                 "pagerank", "kmeans_assign",
                                 "semantic_dedup",
                                 # second pass: ANN/spatial variants
                                 "ann_topk", "lsh_topk", "g4_pip_join_rot",
                                 "multimodal_features",
                                 # catalog-backed spatial join (north-rule
                                 # composition: z-order scan feeds PIP)
                                 "g1_catalog_pip",
                                 # H3-style coverage compaction pair +
                                 # true-polygon polyfill
                                 "g3_compact", "g3_uncompact_roundtrip",
                                 "g3_polyfill", "g3_cells_geojson",
                                 "g3_focal_sum",
                                 # round-5: H3 gridPathCells analog +
                                 # per-trajectory movement rollup +
                                 # density clustering + OD flows
                                 "grid_paths", "trajectory_stats",
                                 "grid_dbscan", "od_matrix", "hotspot_gi",
                                 # round-5 wave 2: global autocorrelation +
                                 # trajectory->segment map matching + the
                                 # degree-oriented webgraph triangle count
                                 "moran_i", "map_match", "triangle_count",
                                 "emerging_hotspots", "hits",
                                 # round-5: landmark BFS + TextRank
                                 # keywords + gapfill/LOCF resample
                                 "bfs_distances", "textrank",
                                 "ts_resample", "label_propagation",
                                 "phrase_search", "ts_rate",
                                 "zonal_stats"],
}
for _g, _gops in _AUDIT_GROUPS.items():
    assert all(op in _AUDIT_SPECS and op in QUERIES for op in _gops), _g
    QUERIES[_g] = (_audit_group_query(_gops), _audit_group_oracle(_gops))


def audit_diagnose(spark: SparkSession, sf_dir: str,
                   group: str | None = None) -> list[dict]:
    """Member attribution for a red ``wave2_*_audit`` row (VERDICT r4 #8).

    A driver CORRECTNESS mismatch on an audit group names the GROUP, not
    the operator — each group checksums 13-17 members.  This runs the
    same Spark group query and DuckDB group oracle side by side and
    joins them on (op, metric), returning one dict per disagreeing
    metric: ``{"group", "op", "metric", "spark", "duck"}`` — the ``op``
    field IS the failing member.  Empty list = all members agree.

    Diagnostic-only (never in a hot path): two full group evaluations,
    driver-collected metric rows (#metrics ≤ ~250 per group)."""
    import duckdb

    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    groups = [group] if group else sorted(_AUDIT_GROUPS)
    out: list[dict] = []
    for g in groups:
        qfn, ofn = QUERIES[g]
        got = {(r["op"], r["metric"]): r["value"]
               for r in qfn(spark, sf_dir).collect()}
        con = duckdb.connect()
        try:
            for t in tables:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{sf_dir}/{t}.parquet')")
            want = {(op, m): v for op, m, v in con.execute(ofn()).fetchall()}
        finally:
            con.close()
        for key in sorted(set(got) | set(want)):
            if got.get(key) != want.get(key):
                out.append({"group": g, "op": key[0], "metric": key[1],
                            "spark": got.get(key), "duck": want.get(key)})
    return out


# --- driver correctness window ordering ---------------------------------------
# The round-3 driver evaluated only the FIRST 50 QUERIES entries in insertion
# order, silently skipping the 11 past that point — including four SURVEY §2
# operators (r16_rewire, r21_staged_resume, g7_lineage, g1_manifest) and three
# entries that were driver-green in round 2 (VERDICT.md r3 'Next round' #1).
# Rebuild the dict with the 11 REDUNDANT variants at the tail so every §2
# operator and every primary LLM-pipeline operator sits inside the window:
#   fingerprint            31-bit variant; fingerprint62 is composite-covered
#                          by exact_dedup + incremental_dedup (both in window)
#   minhash_signatures     composite inside minhash_lsh_pairs
#   simhash_pairs          identity-pair variant of simhash64_neardup
#   jaccard_pairs          token-level variant of shingle_jaccard_pairs
#                          (same LSH-candidates + exact-verify plan family)
#   ann_topk               brute-force baseline; gemm_topk (in window) is
#                          checked against the IDENTICAL DuckDB oracle
#   lsh_topk               single-probe variant of lsh_topk_multiprobe
#   g4_pip_join_rot        rotated variant of g4_pip_join
#   tpch_q1                agg-only; tpch_q3/q5 cover agg+join shapes
#   broadcast_star_join    join shape covered by tpch_q3/q5
#   multimodal_features    full closed-form oracle since r4 (histogram
#                          components vs right-8-chars closed form);
#                          multimodal_resize carries the pixel oracle
#   extract_text_identity  rows-only; extract_text_oracle carries the
#                          full oracle
# The r4 training-pipeline additions sit past the window as full-fidelity
# entries, but each is ALSO driver-visible through its wave2_*_audit group
# (above) — the audits buy 32 operators' checksummed driver rows for 4
# window slots.  Four more variants were demoted to fund those slots:
#   tpch_q5                tpch_q3 (in window) covers the agg+join shape;
#                          q5's wider star join stays pytest-verified
#   token_histogram        bucketed-count variant of token_stats (in
#                          window); two-key agg shape covered by
#                          domain_stats (in window)
#   deterministic_sample   composite inside corpus_build's sample stage
#                          (in window)
#   simhash                32-bit signature variant; simhash64_neardup (in
#                          window) covers signature + banding + verify
# ALL entries remain registered — the tail entries stay oracle-verified
# by the in-repo pytest harness (tests/test_oracle.py runs EVERY pair).
_TAIL = [
    "fingerprint", "minhash_signatures", "simhash_pairs", "jaccard_pairs",
    "ann_topk", "lsh_topk", "g4_pip_join_rot", "tpch_q1",
    "broadcast_star_join", "multimodal_features", "extract_text_identity",
    "tpch_q5", "token_histogram", "deterministic_sample", "simhash",
    "sequence_packing", "decontaminate", "ngram_counts", "pii_scrub",
    "incremental_dedup_bucketed", "url_dedup", "normalize_text",
    "repetition_stats", "remove_boilerplate", "asof_join", "dedup_keep",
    "interval_join", "cdc_chunks", "substring_dedup", "quantize_embeddings",
    "quantized_topk", "stratified_quota", "global_shuffle",
    "length_quantiles", "inverted_index", "tfidf_topk", "bloom_dedup",
    "domain_topk", "pagerank", "lm_fluency", "kmeans_assign",
    "semantic_dedup", "dsir_weights", "mixture_weights", "hash_embed",
    "image_phash_dedup", "jsonl_roundtrip", "chunk_windows", "bpe_tokenize",
    "bpe_learn", "hll_distinct", "cm_topk", "qsk_quantiles",
    "fetch_schedule", "g3_compact", "g3_uncompact_roundtrip", "g3_polyfill",
    "g3_cells_geojson", "g3_focal_sum", "gopher_rules",
    "g1_file_skip", "g1_merge_delete", "g1_catalog_pip",
    "ccnet_buckets", "url_filter", "winnowing", "grid_paths",
    "containment_pairs", "line_dedup", "bm25_topk", "trajectory_stats",
    "grid_dbscan", "od_matrix", "hotspot_gi", "dsir_sample",
    "moran_i", "triangle_count", "sessionize", "map_match",
    "emerging_hotspots", "hits", "bfs_distances", "textrank",
    "ts_resample", "label_propagation", "phrase_search", "ts_rate",
    "zonal_stats",
]
assert set(_TAIL) <= set(QUERIES), sorted(set(_TAIL) - set(QUERIES))
# the invariant that actually broke in round 3: every non-tail entry must
# fit the driver's 50-entry window — registering a new operator without
# extending _TAIL must fail HERE, not silently drop the 51st entry from
# the driver's correctness run (review r4)
assert len(QUERIES) - len(_TAIL) <= 50, (
    f"{len(QUERIES) - len(_TAIL)} non-tail registry entries exceed the "
    f"driver's 50-entry correctness window — demote a redundant variant "
    f"to _TAIL")
QUERIES = {**{k: v for k, v in QUERIES.items() if k not in _TAIL},
           **{k: QUERIES[k] for k in _TAIL}}
