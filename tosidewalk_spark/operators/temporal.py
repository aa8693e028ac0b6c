"""Temporal joins Spark does not ship natively: the as-of join.

The reference pipeline has no temporal operators (SURVEY.md §2A "not
present" list — no as-of/interval joins); this module ADDS the one a
web-crawl training pipeline keeps reaching for: match every left row to
the LATEST right row at-or-before its timestamp per key (snapshot
attribution — "which page version / which preceding view does this
event see?").

Spark has no ASOF JOIN operator (SPARK-22947 is the long-open ask), and
the naive theta-join `l.ts >= r.ts` + per-left-row max is a cross
product per key.  The scale-correct DataFrame expression is the
union-marker plan:

  1. align both sides into one relation with a `_side` marker
     (right = 0, left = 1) and the right-side payload packed into ONE
     struct column (NULL on left rows);
  2. a single window per key ordered by (ts, _side, right-tiebreak):
     `LAST(payload IGNORE NULLS)` over UNBOUNDED PRECEDING..CURRENT ROW
     carries the most recent right payload forward onto every left row;
  3. keep the left rows.

Cost: ONE shuffle of left ∪ right on the join key — no per-key cross
product, no range explosion, partial ordering done by the sort within
each hash partition.  Skewed keys salt exactly like any other window
(the caller can pre-bucket ts into the key for pathological single-key
streams).  `_side` = 0-before-1 at equal timestamps gives `right.ts <=
left.ts` semantics, matching DuckDB's `ASOF LEFT JOIN ... ON r.ts <=
l.ts` (the oracle twin in plans/registry.py).  The payload struct keeps
the match ATOMIC: all carried columns come from the same right row even
when several right rows share a timestamp (broken by `tiebreak`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload: dict[str, str] | None = None,
              tiebreak: str | None = None) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of
    join, LEFT semantics: unmatched left rows keep NULL payload).

    ``payload`` maps right-side column -> output alias; defaults to every
    right column except the key and timestamp.  ``tiebreak`` names a
    right column that deterministically orders right rows sharing
    (key, ts) — the LARGEST wins, matching "latest snapshot wins".
    """
    if payload is None:
        skip = set(on) | {right_ts}
        payload = {c: c for c in right.columns if c not in skip}
    pay_struct = F.struct(*[F.col(c).alias(a) for c, a in payload.items()])

    left_cols = [c for c in left.columns]
    r_rows = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        pay_struct.alias("_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols if c not in on])
    l_rows = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_rows.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r_rows.schema["_pay"].dataType).alias("_pay"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in on])

    w = (Window.partitionBy(*on)
         .orderBy(F.col("_ts"), F.col("_side"), F.col("_tb").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (r_rows.unionByName(l_rows)
               .withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    out = [F.col(c) for c in on]
    out += [F.col(f"_l_{c}").alias(c) for c in left_cols if c not in on]
    out += [F.col(f"_match.{a}").alias(a) for a in payload.values()]
    return carried.select(*out)


def interval_join(left: DataFrame, right: DataFrame, on: list[str],
                  left_ts: str, right_start: str, right_end: str,
                  bucket_s: int = 3600) -> DataFrame:
    """Point-in-interval join: every (left, right) pair on the same key
    with ``right_start <= left_ts <= right_end`` — the other temporal
    join Spark lacks (an ON-clause range predicate alone degenerates to
    a per-key cross product + filter).

    Scale plan — time-bucket equi-join: each right interval explodes to
    the fixed-width buckets it touches (`sequence` of epoch // bucket_s,
    pure codegen), each left row maps to exactly ONE bucket, and the join
    runs as a plain hash equi-join on (key..., bucket) with the exact
    range predicate as a post-filter.  Each qualifying pair is produced
    exactly once (one bucket per left row), so no dedup pass.  The
    shuffle key gains the bucket, which simultaneously SPREADS a hot key
    over its time range — the salt falls out of the plan.  Explosion is
    bounded by interval_length / bucket_s; pick ``bucket_s`` near the
    typical interval length so most intervals land in 1–2 buckets.

    Both timestamp columns may be TIMESTAMP or numeric epoch seconds;
    right columns whose names collide with left's must be aliased by the
    caller beforehand (the output carries all columns of both sides)."""
    def _epoch(col: str, df: DataFrame) -> F.Column:
        if str(df.schema[col].dataType).startswith("Timestamp"):
            # cast through TIMESTAMP: unix_micros rejects TIMESTAMP_NTZ
            # (the type parquet event times arrive as)
            return F.unix_micros(F.col(col).cast("timestamp")) / 1_000_000.0
        return F.col(col).cast("double")

    l = left.withColumn(
        "_bucket", F.floor(_epoch(left_ts, left) / bucket_s).cast("long"))
    r = right.withColumn(
        "_bucket", F.explode(F.sequence(
            F.floor(_epoch(right_start, right) / bucket_s).cast("long"),
            F.floor(_epoch(right_end, right) / bucket_s).cast("long"))))
    joined = l.join(r, on + ["_bucket"])
    return (joined.filter((F.col(left_ts) >= F.col(right_start))
                          & (F.col(left_ts) <= F.col(right_end)))
            .drop("_bucket"))


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               seq_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization — the canonical clickstream/crawl-log
    rollup (the GoogleAnalytics/Adobe 30-minute rule): a user's events
    ordered by time split into sessions wherever the gap to the previous
    event exceeds ``gap_s`` seconds.  Output: one row per session —
    (user_id, session_id, n_events, start_us, end_us, duration_us) with
    session_id numbering a user's sessions 1..m in time order and
    timestamps as exact integer micros (unix_micros here / epoch_us in
    the DuckDB twin — no float seconds, no sub-second drift between
    engines).

    Plan: ONE shuffle on the user key serves the boundary-detection
    window (LAG + running SUM, the gap-and-island shape shared with
    vectorize_tiles/map_match); the per-session rollup is a hash agg on
    (user, session) — map-side combinable, so the second exchange
    carries ~one row per session, not per event.  The window partition
    is bounded by a single user's event count (same per-key bound as
    fetch_schedule: a user IS the natural unit of work; a key with 10^8
    events is a bot to filter upstream, not a skew case to engineer
    around).  Streaming twin: Structured Streaming's session_window
    performs this rollup incrementally; this is the batch/backfill
    shape."""
    gap_us = int(gap_s) * 1_000_000
    # cast through TIMESTAMP: unix_micros rejects TIMESTAMP_NTZ (the type
    # parquet event times arrive as); sessions pin UTC (session.py), so
    # the NTZ->TZ cast is identity and matches DuckDB's epoch_us
    base = events.selectExpr(
        f"{user_col} AS user_id",
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) AS ts_us",
        f"{seq_col} AS seq")
    w = Window.partitionBy("user_id").orderBy("ts_us", "seq")
    marked = base.withColumn(
        "new_sess",
        F.expr(f"CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id "
               f"ORDER BY ts_us, seq) IS NULL OR ts_us - LAG(ts_us) OVER "
               f"(PARTITION BY user_id ORDER BY ts_us, seq) > {gap_us} "
               f"THEN 1 ELSE 0 END"))
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.min("ts_us").alias("start_us"),
                 F.max("ts_us").alias("end_us"))
            .withColumn("duration_us",
                        F.expr("end_us - start_us")))


def ts_resample(events: DataFrame, bin_s: int = 3600,
                user_col: str = "user_id", ts_col: str = "ts",
                seq_col: str = "event_id",
                value_col: str = "value") -> DataFrame:
    """Per-key time-series resampling with gap fill + LOCF — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape, the rollup a
    metrics/observability pipeline runs over raw event streams: bucket a
    key's events into fixed ``bin_s``-second bins, emit EVERY bin between
    the key's first and last observation (gaps included), and carry the
    last observed value forward across empty bins.

    Output: (user_id, bin_us, n_events, v_locf) — bin_us the bin start
    in exact integer micros, n_events = 0 on gap bins, v_locf the value
    of the key's latest event at-or-before the bin's end.  "Latest" is
    deterministic: events order by (ts, seq) and the winner's stored
    double is carried verbatim — no float arithmetic, so values match
    the DuckDB twin bit-for-bit (the same reason asof_join packs a
    payload struct instead of aggregating it).

    Plan: ONE shuffle on the key serves everything — the per-(key, bin)
    rollup is a map-side-combinable hash agg (MAX of a (ts, seq, value)
    struct picks the bin's last event without a sort), the gap bins come
    from a SEQUENCE over the key's own [min_bin, max_bin] span (no
    driver action, no global calendar join), and LOCF is a
    LAST(v IGNORE NULLS) running window per key.  Partitions are bounded
    by a single key's bin span — span/bin_s rows per key, the caller's
    knob; the first bin always holds an observation, so v_locf is never
    NULL.  The global-calendar variant (fill every key to a common
    range) is the same plan with the span agg swapped for a 1-row
    broadcast global range."""
    bin_us = int(bin_s) * 1_000_000
    base = events.selectExpr(
        f"{user_col} AS user_id",
        f"(unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {bin_us})"
        " AS bin_no",
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) AS ts_us",
        f"{seq_col} AS seq", f"{value_col} AS v")
    binned = (base.groupBy("user_id", "bin_no")
              .agg(F.count("*").cast("long").alias("n_events"),
                   F.expr("MAX(STRUCT(ts_us, seq, v)).v").alias("v_last")))
    spans = (binned.groupBy("user_id")
             .agg(F.min("bin_no").alias("b_lo"), F.max("bin_no").alias("b_hi")))
    grid = spans.select(
        "user_id", F.explode(F.expr("SEQUENCE(b_lo, b_hi)")).alias("bin_no"))
    filled = (grid.join(binned, ["user_id", "bin_no"], "left")
              .select("user_id", "bin_no",
                      F.expr("COALESCE(n_events, CAST(0 AS BIGINT))")
                      .alias("n_events"), "v_last"))
    w = (Window.partitionBy("user_id").orderBy("bin_no")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (filled
            .withColumn("v_locf", F.last("v_last", ignorenulls=True).over(w))
            .select("user_id",
                    F.expr(f"bin_no * CAST({bin_us} AS BIGINT)")
                    .alias("bin_us"),
                    "n_events", "v_locf"))


def ts_rate(events: DataFrame, user_col: str = "user_id",
            ts_col: str = "ts", seq_col: str = "event_id",
            value_col: str = "value") -> DataFrame:
    """Per-key counter increase + rate between consecutive samples —
    the PromQL increase()/rate() primitive over raw samples, counter-
    reset aware: if a sample is LOWER than its predecessor the counter
    restarted, and the whole new value counts as the increase (the
    Prometheus reset rule).  Output: one row per consecutive pair —
    (user_id, ts_us, dt_us, increase, rate_per_s); a key's first sample
    emits nothing.

    Determinism: samples order by (ts, seq); increase is one IEEE
    subtraction of two stored doubles and rate one division by the
    exact integer dt seconds — single-expression float math with no
    reassociation, so both engines agree bit-for-bit (the same
    contract as ts_resample's carried values; zero-dt pairs emit NULL
    rate rather than inf).

    Plan: ONE key shuffle, one LAG window, codegen everything — the
    same single-exchange discipline as sessionize."""
    base = events.selectExpr(
        f"{user_col} AS user_id",
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) AS ts_us",
        f"{seq_col} AS seq", f"{value_col} AS v")
    w = "PARTITION BY user_id ORDER BY ts_us, seq"
    return (base.selectExpr(
        "user_id", "ts_us",
        f"ts_us - LAG(ts_us) OVER ({w}) AS dt_us",
        f"CASE WHEN v >= LAG(v) OVER ({w}) THEN v - LAG(v) OVER ({w})"
        f" ELSE v END AS increase")
        .filter("dt_us IS NOT NULL")
        .selectExpr("user_id", "ts_us", "dt_us", "increase",
                    "CASE WHEN dt_us = 0 THEN NULL"
                    " ELSE increase / (dt_us / 1000000.0) END"
                    " AS rate_per_s"))
