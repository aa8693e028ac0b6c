"""Web-scale graft spatial operators (SURVEY.md §2B G3-G6).

These are the operators the north rule adds on top of the reference
pipeline [BASELINE.json:14]: cell encoding of geocoded page entities,
point-in-polygon join of entity points against street-buffer polygons,
kNN matching to the nearest inferred sidewalk segment via cell-ring
expansion, and per-cell raster coverage tiles.

Scale design:
- The spatial join is compiled to a cell equi-join (build side: polyfill
  of each buffer, exploded; probe side: the point's cell9) + an exact
  vectorized ray-casting refine — Catalyst picks broadcast vs SMJ, AQE
  handles skew coarsely, and dense-cell skew is handled explicitly by the
  salted aggregation in G6/G7.
- kNN is a driver-side ring-expansion fixpoint: each round is one
  equi-join at Chebyshev ring r; a point finishes when its k-th candidate
  distance is provably below the next ring's lower bound, so results are
  EXACTLY the brute-force top-k (the DuckDB oracle checks this).
- All per-row geometry is numpy over Arrow batches (mapInPandas), and the
  only driver-side loop is the bounded ring expansion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from ..functions import sqlfns
from ..kernel import cells, geom

SEG_FACTOR = 1024  # segment_id = way_id * 1024 + edge index


def street_segments(net: DataFrame) -> DataFrame:
    """Explode network polylines into single edges:
    (way_id, segment_id, alat, alng, blat, blng).  Pure SQL (codegen)."""
    return net.select(
        "way_id",
        F.posexplode(F.expr(
            "TRANSFORM(SEQUENCE(0, SIZE(lats) - 2), k -> "
            "STRUCT(lats[k] AS alat, lngs[k] AS alng, lats[k + 1] AS blat, lngs[k + 1] AS blng))"
        )).alias("edge_no", "e"),
    ).select(
        "way_id",
        (F.col("way_id") * SEG_FACTOR + F.col("edge_no")).alias("segment_id"),
        F.col("e.alat").alias("alat"), F.col("e.alng").alias("alng"),
        F.col("e.blat").alias("blat"), F.col("e.blng").alias("blng"),
    )


_BUF_SCHEMA = T.StructType([
    T.StructField("way_id", T.LongType()),
    T.StructField("segment_id", T.LongType()),
    T.StructField("alat", T.DoubleType()), T.StructField("alng", T.DoubleType()),
    T.StructField("blat", T.DoubleType()), T.StructField("blng", T.DoubleType()),
    T.StructField("poly_lats", T.ArrayType(T.DoubleType())),
    T.StructField("poly_lngs", T.ArrayType(T.DoubleType())),
    T.StructField("cells", T.ArrayType(T.LongType())),
])


PIP_COVER_RES = 11  # 38 m cells: tight cover for 12 m buffers, ~8x fewer
                    # join candidates than the res-9 tiling cells


def street_buffers(segments: DataFrame,
                   half_width_m: float = geom.BUFFER_HALF_WIDTH_M,
                   res: int = cells.DEFAULT_RES) -> DataFrame:
    """Buffered rectangle polygon + conservative cell cover per segment —
    the build side of the PIP join (SURVEY.md §1.2 'street_buffers').
    Vectorized numpy over Arrow batches.  ``res`` picks the cover
    granularity: PIP_COVER_RES for the PIP join (tight cover, small
    candidate fan-out), DEFAULT_RES (9) for the kNN ring index whose
    distance bounds are calibrated to res-9 cell edges."""

    def build(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = pdf[["way_id", "segment_id", "alat", "alng", "blat", "blng"]].copy()
            plats, plngs, ccells = [], [], []
            for r in pdf.itertuples():
                bl, bg = geom.buffer_segment(r.alat, r.alng, r.blat, r.blng, half_width_m)
                plats.append(bl.tolist())
                plngs.append(bg.tolist())
                ccells.append(cells.polyfill(bl, bg, res).tolist())
            out["poly_lats"], out["poly_lngs"], out["cells"] = plats, plngs, ccells
            yield out

    return segments.mapInPandas(build, _BUF_SCHEMA)


_PIP_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("entity", T.StringType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lng", T.DoubleType()),
    T.StructField("cell9", T.LongType()),
    T.StructField("way_id", T.LongType()),
    T.StructField("segment_id", T.LongType()),
    T.StructField("dist_m", T.DoubleType()),
])


def pip_join(points: DataFrame, buffers: DataFrame,
             cover_res: int | None = None) -> DataFrame:
    """G4: point-in-polygon spatial join compiled to relational ops:
    explode(buffer cell cover) -> equi-join on the point's cell at the
    cover resolution -> exact ray-casting refine (vectorized over the 4
    rectangle edges across the whole Arrow batch — no per-row Python
    loop).  The probe key is derived from lat/lng at the SAME resolution
    the buffers were covered with (detected from the first cover cell if
    not given), so candidate fan-out tracks the buffer size, not the
    coarser res-9 tiling cells."""
    if cover_res is None:
        first = buffers.select(F.expr(f"CAST(cells[0] / {sqlfns.POW2_56} AS INT)").alias("r")).first()
        cover_res = int(first.r) if first else cells.DEFAULT_RES
    build_side = buffers.select(
        "way_id", "segment_id", "alat", "alng", "blat", "blng",
        "poly_lats", "poly_lngs", F.explode("cells").alias("cell"))
    probe = points.select(
        "url", "entity", "lat", "lng", "cell9",
        F.expr(sqlfns.cell_sql("lat", "lng", cover_res)).alias("cell"))
    cand = probe.join(build_side, "cell")

    def refine(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            plat = pdf["lat"].to_numpy()
            plng = pdf["lng"].to_numpy()
            vlat = np.stack(pdf["poly_lats"].to_numpy())  # (n, 4)
            vlng = np.stack(pdf["poly_lngs"].to_numpy())
            inside = np.zeros(len(pdf), dtype=bool)
            jj = 3
            for ii in range(4):
                vy_i, vy_j = vlat[:, ii], vlat[:, jj]
                vx_i, vx_j = vlng[:, ii], vlng[:, jj]
                cond = (vy_i > plat) != (vy_j > plat)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (vx_j - vx_i) * (plat - vy_i) / (vy_j - vy_i) + vx_i
                inside ^= cond & (plng < xint)
                jj = ii
            hit = pdf[inside]
            if len(hit) == 0:
                continue
            d = geom.point_segment_dist_m(
                hit["lat"].to_numpy(), hit["lng"].to_numpy(),
                hit["alat"].to_numpy(), hit["alng"].to_numpy(),
                hit["blat"].to_numpy(), hit["blng"].to_numpy())
            out = hit[["url", "entity", "lat", "lng", "cell9", "way_id", "segment_id"]].copy()
            out["dist_m"] = d
            yield out

    return cand.mapInPandas(refine, _PIP_SCHEMA)


# --- G5: kNN via cell-ring expansion -----------------------------------------

def segments_by_cell(buffers: DataFrame) -> DataFrame:
    """Segment cover keyed by cell — the reusable build side for kNN."""
    return buffers.select(
        "way_id", "segment_id", "alat", "alng", "blat", "blng",
        F.explode("cells").alias("cell")).dropDuplicates(["segment_id", "cell"])


def _probe_cells_expr(res: int, r_hi: int) -> F.Column:
    """(2*r_hi+1)^2 probe cells (Chebyshev disk) around the point's cell at
    ``res``, derived from lat/lng so the probe resolution is decoupled from
    the stored cell9 tiling resolution."""
    s = sqlfns.dlit(cells.cell_size_deg(res))
    j = f"CAST(FLOOR((lat + 90.0e0) / {s}) AS BIGINT)"
    i = f"CAST(FLOOR((lng + 180.0e0) / {s}) AS BIGINT)"
    offs = [(di, dj) for di in range(-r_hi, r_hi + 1) for dj in range(-r_hi, r_hi + 1)]
    return F.array(*[
        F.expr(f"CAST({res} AS BIGINT) * {sqlfns.POW2_56} "
               f"+ ({j} + {dj}) * {sqlfns.POW2_28} + ({i} + {di})")
        for di, dj in offs])


def knn_join(points: DataFrame, seg_cells: DataFrame, k: int = 1,
             max_ring: int = 8, first_radius: int = 2,
             res: int = cells.DEFAULT_RES) -> DataFrame:
    """G5: for each point, the k nearest segments by point-to-segment
    distance.  Exact: equals brute-force top-k (ties broken by
    (dist, way_id, segment_id)) whenever the k-th neighbor lies within
    disk(max_ring); points with fewer candidates there return what exists.

    Two-phase declarative plan (VERDICT.md round-1 'What's wrong' #1 — the
    old driver-side ring fixpoint re-windowed and localCheckpoint-ed the
    FULL accumulated candidate set every round):

    - Phase 1 probes every point's Chebyshev disk(first_radius) in ONE cell
      equi-join and ranks candidates; a point is settled when it has k
      candidates and its k-th distance is <= first_radius * (minimum cell
      edge), so no unexplored segment can beat it.  At realistic density
      this settles ~all points.
    - Phase 2 re-probes only the stragglers with disk(max_ring) in one more
      join.  With zero stragglers the phase-2 subtree is an empty join —
      no driver-side loop, no isEmpty() action, no checkpoint; the whole
      operator is a single Catalyst plan (AQE broadcasts the tiny settled-
      key side of the semi/anti joins at runtime).

    Only phase-1's top-k rows (<= k per point) are persisted for reuse
    across the three consumers — never the raw candidate set."""
    s = cells.cell_size_deg(res)
    # conservative meters-per-cell lower bound (lng edge at |lat|<=60)
    edge_min_m = s * geom.M_PER_DEG * 0.5
    pts = points.select("url", "entity", "lat", "lng", "cell9")
    dist_expr = F.expr(sqlfns.seg_dist_sql("lat", "lng", "alat", "alng", "blat", "blng"))
    wd = Window.partitionBy("url", "entity").orderBy("segment_id")
    wk = Window.partitionBy("url", "entity").orderBy("dist_m", "way_id", "segment_id")
    cols = ["url", "entity", "lat", "lng", "cell9",
            "way_id", "segment_id", "dist_m", "knn_rank"]

    def topk(src: DataFrame, r_hi: int) -> DataFrame:
        cand = (src.withColumn("cell", F.explode(_probe_cells_expr(res, r_hi)))
                .join(seg_cells, "cell")
                .select("url", "entity", "lat", "lng", "cell9",
                        "way_id", "segment_id", dist_expr.alias("dist_m")))
        # ONE shuffle on (url, entity) serves both the per-segment dedup (a
        # segment covering several probed cells appears once per cell; the
        # duplicate rows are identical) and the rank window — the second
        # window re-sorts within partitions but does not re-shuffle.
        dedup = (cand.withColumn("_prev", F.lag("segment_id").over(wd))
                 .filter(F.col("_prev").isNull()
                         | (F.col("_prev") != F.col("segment_id")))
                 .drop("_prev"))
        return (dedup.withColumn("knn_rank", F.row_number().over(wk))
                .filter(F.col("knn_rank") <= k))

    phase1 = topk(pts, first_radius).persist()
    bound = first_radius * edge_min_m
    settled = (phase1.groupBy("url", "entity")
               .agg(F.max("dist_m").alias("kth"), F.count("*").alias("n"))
               .filter((F.col("n") == k) & (F.col("kth") <= bound))
               .select("url", "entity"))
    done = phase1.join(settled, ["url", "entity"], "left_semi")
    stragglers = pts.join(settled, ["url", "entity"], "left_anti")
    phase2 = topk(stragglers, max(max_ring, first_radius))
    return done.select(*cols).unionByName(phase2.select(*cols))


# --- G6: raster coverage tiles -------------------------------------------------

def coverage_tiles(points: DataFrame, matches: DataFrame,
                   n_sub: int = 4, salt_buckets: int = 16) -> DataFrame:
    """G6 (+G7 salting): per res-9 cell — page count, matched count
    (matched = point appeared in the PIP join output), coverage ratio, and
    an n_sub x n_sub sub-cell raster histogram (row-major array<double>).

    Skew: dense urban cells concentrate keys, so the aggregation runs in
    two phases — partial agg on (cell9, salt = pmod(hash(url), B)), final
    agg on cell9 — a map-side-combine-friendly plan that survives hot
    cells at any scale [BASELINE.json:14 'salted skew handling']."""
    res = cells.DEFAULT_RES
    sub_res = res + 2  # 4x per axis
    s_sub = repr(cells.cell_size_deg(sub_res))
    sub_idx = (
        f"(CAST(FLOOR((lat + 90.0) / {s_sub}) AS BIGINT) % {n_sub}) * {n_sub} "
        f"+ (CAST(FLOOR((lng + 180.0) / {s_sub}) AS BIGINT) % {n_sub})")
    # page counts: salted two-phase hash agg over the full points table;
    # matched counts: distinct-page agg over the (already filtered) match
    # rows, which carry their own lat/lng — NO wide (url, entity) join of
    # the full points table against the match set (that join was the
    # dominant shuffle at scale; two narrow aggs + a tiny per-cell join
    # replace it)
    pts = (points
           .withColumn("sub_idx", F.expr(sub_idx))
           .withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))))
    partial = pts.groupBy("cell9", "salt", "sub_idx").agg(F.count("*").alias("pn"))
    n_side = partial.groupBy("cell9", "sub_idx").agg(F.sum("pn").alias("n"))
    m_side = (matches
              .withColumn("sub_idx", F.expr(sub_idx))
              .groupBy("cell9", "sub_idx")
              .agg(F.countDistinct("url", "entity").alias("m")))
    per_sub = n_side.join(m_side, ["cell9", "sub_idx"], "left") \
                    .withColumn("m", F.coalesce("m", F.lit(0)))
    tiles = per_sub.groupBy("cell9").agg(
        F.sum("n").alias("n_pages"),
        F.sum("m").alias("n_matched"),
        F.sort_array(F.collect_list(F.struct("sub_idx", "n"))).alias("hist"))
    raster = F.expr(
        f"TRANSFORM(SEQUENCE(0, {n_sub * n_sub - 1}), i -> "
        f"CAST(COALESCE(ELEMENT_AT(MAP_FROM_ENTRIES(hist), CAST(i AS BIGINT)), 0) AS DOUBLE))")
    return tiles.select(
        "cell9", "n_pages", "n_matched",
        F.round(F.col("n_matched") / F.col("n_pages"), 6).alias("coverage"),
        raster.alias("raster"))
