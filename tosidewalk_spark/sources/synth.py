"""Deterministic synthetic sources, generated Spark-natively.

Everything here is built from ``spark.range(n)`` + JVM-side expressions
(no driver-side lists, no RNG) so the same code scales from the 1k-row
smoke tables to the 10^12-row production shape: generation is a narrow
map over a splittable range, Catalyst prunes and pushes down as usual.

Shapes follow FIXTURES.md §1 exactly; the pages table matches the
input_hint schema (url, warc_ts, html, text, lang) verbatim
[BASELINE.json:16].
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import sqlfns

CITY_LAT = 47.60
CITY_LNG = -122.33
GRID_SPACING_M = 90.0
LAT_STEP = GRID_SPACING_M / 111111.0
LNG_STEP = GRID_SPACING_M / (111111.0 * math.cos(math.radians(CITY_LAT)))
HIGHWAYS = ["residential", "primary", "secondary", "tertiary"]
N_ENTITIES = 400  # distinct poi_k entities

# Deterministic id-space bases (SURVEY.md §7 hard part 2: the reference used
# mutable counters; we freeze a stable scheme instead).
SW_WAY_BASE = 1_000_000_000
SW_NODE_BASE = 1_000_000_000_000
CW_WAY_BASE = 2_000_000_000
CW_NODE_BASE = 2_000_000_000_000


def pages(spark: SparkSession, n: int, filler_repeats: int = 60) -> DataFrame:
    """Common-Crawl-style pages table (FIXTURES.md §1 'pages').  The body
    carries ~1.5 KB of deterministic filler so per-page work (extraction,
    tokenization) is representative of real web pages, not 60-byte stubs."""
    ent = f"CONCAT('poi_', CAST((id * 7) % {N_ENTITIES} AS STRING))"
    filler = (f"RTRIM(REPEAT(CONCAT('filler segment ', CAST(id % 97 AS STRING), "
              f"' of page text corpus '), {filler_repeats}))")
    text = (f"CONCAT('visit ', {ent}, ' near block ', CAST(id % 1000 AS STRING), "
            f"' in sector ', CAST(id % 37 AS STRING), ' ', {filler})")
    return spark.range(n).select(
        F.expr("CONCAT('https://site', CAST(id % 997 AS STRING), '.example/p/', CAST(id AS STRING))").alias("url"),
        F.expr("TIMESTAMP '2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, id * 137)").alias("warc_ts"),
        F.expr(f"CAST(CONCAT('<html><body><p>', {text}, '</p></body></html>') AS BINARY)").alias("html"),
        F.expr(text).alias("text"),
        F.expr("ELEMENT_AT(ARRAY('en','de','fr','es'), CAST(id % 4 AS INT) + 1)").alias("lang"),
    )


def entity_latlng_sql(entity: str) -> tuple[str, str]:
    """Deterministic geocode of an entity string (FIXTURES.md §1):
    lat/lng = city center +- hash-derived jitter within ~0.01 deg."""
    h1 = sqlfns.polyhash_spark(entity)
    h2 = sqlfns.polyhash_spark(f"CONCAT({entity}, 'x')")
    lat = f"(47.60e0 + ((({h1}) % 20000) - 10000) * 1e-6)"
    lng = f"(-122.33e0 + ((({h2}) % 20000) - 10000) * 1e-6)"
    return lat, lng


def entity_latlng_sql_duckdb(entity: str) -> tuple[str, str]:
    h1 = sqlfns.polyhash_duckdb(entity)
    h2 = sqlfns.polyhash_duckdb(f"CONCAT({entity}, 'x')")
    lat = f"(47.60e0 + ((({h1}) % 20000) - 10000) * 1e-6)"
    lng = f"(-122.33e0 + ((({h2}) % 20000) - 10000) * 1e-6)"
    return lat, lng


def _geocode_from_entity(df: DataFrame) -> DataFrame:
    """(url, entity) -> + lat, lng, cell9.  Staged projections: the
    expensive polynomial hash is computed ONCE per row in its own Project
    (Catalyst keeps non-cheap expressions un-inlined across projects);
    inlining the full templates into one select re-evaluates the hash 4x —
    measured 10x slower.  Values are identical to the inline DuckDB twin."""
    h = df.select(
        "url", "entity",
        F.expr(sqlfns.polyhash_spark("entity")).alias("h1"),
        F.expr(sqlfns.polyhash_spark("CONCAT(entity, 'x')")).alias("h2"))
    lat = "(47.60e0 + ((h1 % 20000) - 10000) * 1e-6)"
    lng = "(-122.33e0 + ((h2 % 20000) - 10000) * 1e-6)"
    return h.selectExpr(
        "url", "entity", f"{lat} AS lat", f"{lng} AS lng",
        f"{sqlfns.cell_sql(lat, lng, 9)} AS cell9")


def geo_entities(spark: SparkSession, pages_df: DataFrame) -> DataFrame:
    """Extract entity mentions from page text and geocode them (G3).
    Deterministic hash-geocoder; cell id via the shared SQL template so the
    DuckDB oracle can reproduce it bit-for-bit."""
    ent_df = pages_df.select(
        "url", F.expr("REGEXP_EXTRACT(text, 'poi_[0-9]+', 0)").alias("entity"))
    return _geocode_from_entity(ent_df)


def geo_entities_from_documents(docs: DataFrame) -> DataFrame:
    """Pages-proxy geo entities derived from the driver's read-only
    ``documents`` table (FIXTURES.md §4): url/entity/lat/lng/cell9 are all
    pure SQL functions of doc_id, so the DuckDB oracle can reproduce every
    row bit-for-bit (geo_entities_duckdb_sql below is the twin)."""
    ent_df = docs.select(
        F.expr("CONCAT('https://site', CAST(doc_id % 997 AS STRING), '.example/p/', CAST(doc_id AS STRING))").alias("url"),
        F.expr(f"CONCAT('poi_', CAST((doc_id * 7) % {N_ENTITIES} AS STRING))").alias("entity"),
    )
    return _geocode_from_entity(ent_df)


def geo_entities_duckdb_sql() -> str:
    """DuckDB twin of geo_entities_from_documents: a SELECT over the
    pre-registered ``documents`` view producing identical rows."""
    ent = f"CONCAT('poi_', CAST((doc_id * 7) % {N_ENTITIES} AS VARCHAR))"
    lat, lng = entity_latlng_sql_duckdb(ent)
    return (
        f"SELECT CONCAT('https://site', CAST(doc_id % 997 AS VARCHAR), '.example/p/', CAST(doc_id AS VARCHAR)) AS url, "
        f"{ent} AS entity, {lat} AS lat, {lng} AS lng, "
        f"{sqlfns.cell_sql(lat, lng, 9)} AS cell9 FROM documents"
    )


def osm_grid(spark: SparkSession, g: int = 8, with_noise_ways: bool = True
             ) -> tuple[DataFrame, DataFrame]:
    """Grid-city street network (FIXTURES.md §1 'osm_nodes/osm_ways'):
    g x g intersections spaced 90 m; one long way per row and per column
    (so R5 must split them at interior intersections); a sprinkling of
    footway/service ways the R1 whitelist filter must drop.

    node_id = j * g + i;  horizontal way j has id j, vertical way i has
    id g + i; noise ways get ids >= 2 * g.  All Spark-native.
    """
    nodes = spark.range(g * g).select(
        F.col("id").alias("node_id"),
        (F.lit(CITY_LAT) + (F.col("id") / g).cast("bigint") * F.lit(LAT_STEP)).alias("lat"),
        (F.lit(CITY_LNG) + (F.col("id") % g) * F.lit(LNG_STEP)).alias("lng"),
        F.create_map(F.lit("src"), F.lit("grid")).alias("tags"),
    )
    hw = F.element_at(F.array(*[F.lit(h) for h in HIGHWAYS]), (F.col("id") % 4 + 1).cast("int"))
    horiz = spark.range(g).select(
        F.col("id").alias("way_id"),
        F.expr(f"TRANSFORM(SEQUENCE(0, {g - 1}), i -> id * {g} + i)").alias("node_ids"),
        hw.alias("highway"),
        F.create_map(F.lit("name"), F.concat(F.lit("H-"), F.col("id").cast("string"))).alias("tags"),
    )
    vert = spark.range(g).select(
        (F.col("id") + g).alias("way_id"),
        F.expr(f"TRANSFORM(SEQUENCE(0, {g - 1}), j -> j * {g} + id)").alias("node_ids"),
        hw.alias("highway"),
        F.create_map(F.lit("name"), F.concat(F.lit("V-"), F.col("id").cast("string"))).alias("tags"),
    )
    ways = horiz.unionByName(vert)
    if with_noise_ways:
        noise = spark.range(g).select(
            (F.col("id") + 2 * g).alias("way_id"),
            F.expr(f"ARRAY(id * {g}, id * {g} + 1)").alias("node_ids"),
            F.expr("ELEMENT_AT(ARRAY('footway','service'), CAST(id % 2 AS INT) + 1)").alias("highway"),
            F.create_map(F.lit("name"), F.lit("noise")).alias("tags"),
        )
        ways = ways.unionByName(noise)
    return nodes, ways


def micro_fixture(spark: SparkSession, name: str) -> tuple[DataFrame, DataFrame]:
    """Tiny hand-built networks mirroring the reference test families
    (FIXTURES.md §2).  Test-only — driver-side literals are fine here."""
    def mk(nodes, ways):
        ndf = spark.createDataFrame(nodes, "node_id bigint, lat double, lng double")
        ndf = ndf.withColumn("tags", F.create_map(F.lit("src"), F.lit(name)))
        wdf = spark.createDataFrame(ways, "way_id bigint, node_ids array<bigint>, highway string")
        wdf = wdf.withColumn("tags", F.create_map(F.lit("name"), F.lit(name)))
        return ndf, wdf

    lat0, lng0 = 47.600, -122.330
    dy, dx = 0.0009, 0.00133  # ~100 m steps
    if name == "straight3":
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0), (3, lat0 + 2 * dy, lng0)],
                  [(1, [1, 2, 3], "residential")])
    if name == "bent3":
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0), (3, lat0 + dy, lng0 + dx)],
                  [(1, [1, 2, 3], "residential")])
    if name == "t_intersection":
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0), (3, lat0 + 2 * dy, lng0),
                   (4, lat0 + dy, lng0 + dx)],
                  [(1, [1, 2], "residential"), (2, [2, 3], "residential"),
                   (3, [2, 4], "primary")])
    if name == "four_way":
        return mk([(1, lat0 + dy, lng0), (2, lat0, lng0), (3, lat0 + 2 * dy, lng0),
                   (4, lat0 + dy, lng0 - dx), (5, lat0 + dy, lng0 + dx)],
                  [(1, [2, 1], "residential"), (2, [1, 3], "residential"),
                   (3, [4, 1], "primary"), (4, [1, 5], "primary")])
    if name == "segmented_street":
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0), (3, lat0 + 2 * dy, lng0)],
                  [(1, [1, 2], "residential"), (2, [2, 3], "residential")])
    if name == "split_street":
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0), (3, lat0 + 2 * dy, lng0),
                   (4, lat0 + 3 * dy, lng0), (5, lat0 + 4 * dy, lng0),
                   (6, lat0 + dy, lng0 + dx), (7, lat0 + 3 * dy, lng0 + dx)],
                  [(1, [1, 2, 3, 4, 5], "primary"),
                   (2, [2, 6], "residential"), (3, [4, 7], "residential")])
    if name == "parallel_lanes":
        off = 18.0 / (111111.0 * math.cos(math.radians(lat0)))
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0), (3, lat0 + 2 * dy, lng0),
                   (4, lat0, lng0 + off), (5, lat0 + dy, lng0 + off), (6, lat0 + 2 * dy, lng0 + off)],
                  [(1, [1, 2, 3], "primary"), (2, [4, 5, 6], "primary")])
    if name == "near_nodes":
        eps = 3.0 / 111111.0
        return mk([(1, lat0, lng0), (2, lat0 + dy, lng0),
                   (3, lat0 + dy + eps, lng0), (4, lat0 + 2 * dy, lng0)],
                  [(1, [1, 2], "residential"), (2, [3, 4], "residential")])
    if name == "shortstub":
        eps = 4.0 / 111111.0
        return mk([(1, lat0, lng0), (2, lat0 + eps, lng0)],
                  [(1, [1, 2], "residential")])
    if name == "zigzag_redundant":
        rows, wig = [], 1e-9
        for k in range(10):
            rows.append((k + 1, lat0 + k * 1e-4, lng0 + (wig if k % 2 else 0.0)))
        return mk(rows, [(1, [k + 1 for k in range(10)], "residential")])
    raise KeyError(name)
