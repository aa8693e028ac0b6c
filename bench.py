"""Benchmark harness — headline spatial-join + sidewalk-tiling throughput
(pages/sec, BASELINE.json metric) plus per-query timings, with the
two-parallelism scaling evidence mandated by BASELINE.md (no real cluster
in this sandbox: same job at local[8] and local[32], efficiency =
T8 / T32 clock ratio vs the 4x core ratio).

Prints ONE JSON line:
  {"metric": "...", "value": <flagship sec at local[CPUS]>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "pages_per_sec": ...,
   "scaling": {"local8_sec":..., "local32_sec":..., "efficiency":...}}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_PAGES (default 200000),
SPARK_GRAFT_BENCH_SCALING=0 to skip the second (local[8]) run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tosidewalk_spark.operators import dedup, network as N, sidewalks as SW  # noqa: E402
from tosidewalk_spark.operators import similarity, spatial as SP, text  # noqa: E402
from tosidewalk_spark.plans import pipeline  # noqa: E402
from tosidewalk_spark.session import get_spark  # noqa: E402
from tosidewalk_spark.sources import synth  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
GRID = 24  # ~2.1 km city; hash-geocoded points span ~2.2 km
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"


def flagship_pages_job(spark) -> int:
    """The headline job: pages -> extract text -> geocode entities -> cell
    encode -> sidewalk network -> PIP join -> kNN -> coverage tiles.
    Returns number of pages processed (for pages/sec)."""
    pages = synth.pages(spark, N_PAGES)
    extracted = text.extract_text(pages)
    points = synth.geo_entities(spark, extracted)
    nodes, ways = synth.osm_grid(spark, g=GRID)
    streets = N.filter_streets(ways)
    segs = N.split_streets(streets)
    gw = N.geom_ways(nodes, segs)
    sw = SW.make_sidewalks(gw)
    buffers = SP.street_buffers(SP.street_segments(sw))
    join_out = SP.pip_join(points, buffers)
    tiles = SP.coverage_tiles(points, join_out)
    tiles.write.mode("overwrite").format("noop").save()
    return N_PAGES


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def run_queries(spark) -> dict[str, float]:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timings: dict[str, float] = {}

    def bench(name, df_fn):
        _, secs = _timed(lambda: df_fn().write.mode("overwrite").format("noop").save())
        timings[name] = secs

    pts = synth.geo_entities_from_documents(docs)
    nodes, ways = synth.osm_grid(spark, g=GRID)
    gw = N.geom_ways(nodes, N.split_streets(N.filter_streets(ways)))
    sw = SW.make_sidewalks(gw)
    buffers = SP.street_buffers(SP.street_segments(sw)).persist()
    buffers.count()

    bench("g4_pip_join", lambda: SP.pip_join(pts, buffers))
    seg_cells = SP.segments_by_cell(buffers).persist()
    seg_cells.count()
    bench("g5_knn", lambda: SP.knn_join(pts, seg_cells, k=1, max_ring=4))
    bench("g6_tiles", lambda: SP.coverage_tiles(pts, SP.pip_join(pts, buffers)))
    bench("minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs))
    bench("jaccard_pairs", lambda: dedup.jaccard_pairs(docs, 0.8))
    bench("simhash", lambda: dedup.simhash(docs))
    bench("ann_topk", lambda: similarity.brute_force_topk(emb, emb.filter("vec_id % 25 = 0"), k=5))
    bench("lsh_topk", lambda: similarity.lsh_topk(emb, emb.filter("vec_id % 25 = 0"), k=5))
    bench("quality_score", lambda: text.quality_score(docs))
    bench("extract_text_100k", lambda: text.extract_text(synth.pages(spark, 100_000)))
    buffers.unpersist()
    seg_cells.unpersist()
    return timings


def main() -> None:
    spark = get_spark("bench", cpus=CPUS)
    _, warm = _timed(lambda: spark.range(1000).count())  # JVM warmup
    n_pages, flag_sec = _timed(lambda: flagship_pages_job(spark))
    queries = run_queries(spark)
    spark.stop()

    scaling = None
    if RUN_SCALING:
        s8 = get_spark("bench8", cpus=8, shuffle_partitions=8)
        _, sec8 = _timed(lambda: flagship_pages_job(s8))
        s8.stop()
        s32 = get_spark("bench32", cpus=32, shuffle_partitions=32)
        _, sec32 = _timed(lambda: flagship_pages_job(s32))
        s32.stop()
        # efficiency of the 8 -> 32 core (N -> 4N) scale-up
        eff = round(sec8 / (4.0 * sec32), 3)
        scaling = {"local8_sec": sec8, "local32_sec": sec32,
                   "speedup": round(sec8 / sec32, 3), "efficiency": eff}

    out = {
        "metric": "spatial_join_tiling_wall_sec",
        "value": flag_sec,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pages": n_pages,
        "pages_per_sec": round(n_pages / flag_sec, 1),
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
