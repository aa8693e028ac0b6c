"""Round-6 measurement harness (guide §1: measure first, noop-sink
isolation, labeled jobs).  bench.py is FROZEN for driver measurement;
everything exploratory lives here.

Usage:
  python bench_extra.py headline [N_PAGES]   # headline phase decomposition
  python bench_extra.py queries [names...]   # per-query timings (1 warm + 1 timed)
  python bench_extra.py leg SPEC PAGES       # one scaling leg, decomposed
  python bench_extra.py plans [names...]     # dump .explain("formatted") per query
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:42s} {dt:8.3f} s", flush=True)
    return out, dt


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def headline(n_pages: int) -> None:
    import bench
    from tosidewalk_spark.operators import spatial as SP
    from tosidewalk_spark.session import get_spark
    from tosidewalk_spark.sources import synth

    spark, _ = _t("get_spark", lambda: get_spark(
        "bx-headline", cpus=CPUS, shuffle_partitions=2 * CPUS))
    buffers, _ = _t("build_buffers", lambda: bench.build_buffers(spark))
    _t("warmup 200k", lambda: bench.pages_throughput_job(spark, buffers, 200_000))
    for _ in range(2):
        _t(f"pages_throughput_job {n_pages}",
           lambda: bench.pages_throughput_job(spark, buffers, n_pages))
    # decomposition with noop sinks
    pages = synth.pages(spark, n_pages)
    pts_plain = synth.geo_entities(spark, pages)
    _t("gen+geocode noop (no persist)", lambda: _noop(pts_plain))
    pts = synth.geo_entities(spark, pages).persist()
    _t("gen+geocode persist+count", pts.count)
    join_out = SP.pip_join(pts, buffers, cover_res=SP.PIP_COVER_RES)
    _t("pip_join noop (from cache)", lambda: _noop(join_out))
    _t("coverage_tiles noop (from cache)", lambda: _noop(
        SP.coverage_tiles(pts, SP.pip_join(pts, buffers,
                                           cover_res=SP.PIP_COVER_RES))))
    pts.unpersist()
    spark.stop()


def leg(spec: str, n_pages: int) -> None:
    import bench
    from tosidewalk_spark.session import get_spark
    cores = bench._parse_cores(spec)
    os.sched_setaffinity(0, set(cores))
    n = len(cores)
    spark, _ = _t("get_spark", lambda: get_spark(
        f"bx-leg{spec}", cpus=n, shuffle_partitions=2 * n))
    buffers, _ = _t("build_buffers", lambda: bench.build_buffers(spark))
    _t("warmup 200k", lambda: bench.pages_throughput_job(spark, buffers, 200_000))
    for _ in range(2):
        _t(f"sample {n_pages}",
           lambda: bench.pages_throughput_job(spark, buffers, n_pages))
    spark.stop()


def _query_fns(spark, buffers):
    """Replicate bench.run_queries' query list as (name -> df_fn) without
    the timing machinery, so legs can be timed/explained individually."""
    import bench

    fns: dict = {}

    real_timed = bench._timed

    def capture(name, df_fn):
        fns[name] = df_fn

    # monkeypatch-lite: reuse run_queries' body by intercepting bench()
    # is invasive; instead call run_queries but stub the sampling to zero
    # cost is high.  Simplest robust route: run run_queries with samples
    # suppressed via env knob is absent — so just re-run it fully when
    # timing, and for plans rebuild the small set by hand below.
    return fns


def queries(names: list[str]) -> None:
    import bench
    from tosidewalk_spark.session import get_spark
    spark = get_spark("bx-queries", cpus=CPUS, shuffle_partitions=2 * CPUS)
    buffers = bench.build_buffers(spark)
    t0 = time.perf_counter()
    timings = bench.run_queries(spark, buffers)
    wall = time.perf_counter() - t0
    print(json.dumps({"phase_wall_s": round(wall, 1),
                      "sum_min_s": round(sum(timings.values()), 1),
                      "timings": dict(sorted(timings.items(),
                                             key=lambda kv: -kv[1]))},
                     indent=1))
    spark.stop()


def plans(names: list[str]) -> None:
    """Dump .explain('formatted') for the registry's declared queries."""
    from tosidewalk_spark.plans import registry
    from tosidewalk_spark.session import get_spark
    spark = get_spark("bx-plans", cpus=CPUS, shuffle_partitions=2 * CPUS)
    os.makedirs("plans/r06", exist_ok=True)
    wanted = names or list(registry.QUERIES)
    for name in wanted:
        if name not in registry.QUERIES:
            print(f"skip {name}: not in registry")
            continue
        fn = registry.QUERIES[name][0]
        try:
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {e}"
        out = f"plans/r06/{name}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if cmd == "headline":
        headline(int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000)
    elif cmd == "leg":
        leg(sys.argv[2], int(sys.argv[3]))
    elif cmd == "queries":
        queries(sys.argv[2:])
    elif cmd == "plans":
        plans(sys.argv[2:])
    else:
        raise SystemExit(f"unknown command {cmd}")
