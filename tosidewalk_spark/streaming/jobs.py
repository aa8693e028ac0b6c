"""Structured Streaming jobs.

The reference has NO streaming surface (SURVEY.md §2A tail note) — this
module exists for the graft's continuous-ingest shape: a pages/events
stream -> watermarked event-time windows -> per-window cell/tile
aggregates, the streaming twin of the batch G6 aggregation.

Patterns used: readStream over a file source with a fixed schema,
withWatermark for bounded state, window() aggregation in append mode
(only closed windows emit — deterministic, replayable), and
foreachBatch for sinks that need batch-only features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F



def _set_event_timeout(state, want_ms: int) -> None:
    """setTimeoutTimestamp with the watermark clamp: a key whose last
    event is older than (watermark - idle window) would ask for a
    timeout in the past, which Spark rejects (INVALID_TIMEOUT_TIMESTAMP)
    — the state is ALREADY expired, so arm it to fire in the very next
    micro-batch instead (watermark + 1 ms).  Semantics unchanged: the
    timed-out branch runs exactly as if the original timestamp had
    fired."""
    state.setTimeoutTimestamp(max(want_ms, state.getCurrentWatermarkMs() + 1))


def stream_events(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source event stream (one parquet dir; availableNow triggers in
    tests drain it deterministically)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time windowed counts + value sums per event_type with a
    watermark bounding state — the streaming analog of the batch G6 tile
    aggregation.  Append output mode => only finalized windows emit."""
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("total_cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_cents"))


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30,
                        watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    gap-based sessionization — the canonical case the built-in windowed
    aggregates can't express (session boundaries depend on the previous
    event's time, not a fixed grid).

    State per user = (open-session start, last event ts, count, cents);
    an event later than ``gap_minutes`` after the last one closes the open
    session and emits it; the event-time timeout (watermark-driven) closes
    and emits a session when the stream goes quiet.  Emitted rows are
    append-mode final — the batch twin (registry events_sessionized
    semantics, same 1800 s gap) must agree on every closed session."""
    import pandas as pd  # local: only the python workers need it
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = ("user_id bigint, session_start timestamp, session_end timestamp, "
                  "n_events bigint, total_cents bigint")
    state_schema = "start_us bigint, last_us bigint, n bigint, cents bigint"

    def fn(key, pdf_iter, state):
        uid = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [uid],
                                "session_start": [pd.Timestamp(start_us, unit="us")],
                                "session_end": [pd.Timestamp(last_us, unit="us")],
                                "n_events": [n], "total_cents": [cents]})
            return
        rows = []
        cur = state.get if state.exists else None
        chunks = list(pdf_iter)  # a group may span Arrow batches: sort ONCE
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts", kind="stable")
            for ts, cents in zip(pdf["ts"], pdf["cents"]):
                us = int(pd.Timestamp(ts).value // 1000)
                if cur is None:
                    cur = (us, us, 1, int(cents))
                elif us - cur[1] > gap_us:
                    rows.append(cur)
                    cur = (us, us, 1, int(cents))
                else:
                    cur = (cur[0], us, cur[2] + 1, cur[3] + int(cents))
        if cur is not None:
            state.update(cur)
            _set_event_timeout(state,
                               cur[1] // 1000 + gap_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame({
                "user_id": [uid] * len(rows),
                "session_start": [pd.Timestamp(r[0], unit="us") for r in rows],
                "session_end": [pd.Timestamp(r[1], unit="us") for r in rows],
                "n_events": [r[2] for r in rows],
                "total_cents": [r[3] for r in rows]})

    prepared = (events
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withColumn("cents", F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
                .withWatermark("ts", watermark)
                .select("user_id", "ts", "cents"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)


def streaming_exact_dedup(pages: DataFrame, key: str = "text",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch exact_dedup (operators.dedup): emit the
    first page seen per ``key`` and drop every later duplicate — the
    continuous-ingest dedup shape an LLM-data pipeline runs in front of a
    training corpus.  dropDuplicatesWithinWatermark bounds the dedup state
    to the watermark horizon (exactly-once per key within it; a duplicate
    arriving later than the horizon would re-emit, which is the standard
    bounded-state trade-off at 10^12-doc scale — unbounded key state cannot
    exist on any cluster).  Batch-twin contract (pytest): the set of
    emitted keys over an availableNow drain equals the batch distinct-key
    set, and every emitted row is a genuine input row."""
    return (pages
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark([key]))


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str,
                      output_mode: str = "append"):
    """Drain everything currently available and stop — the deterministic
    test/batch-replay mode; production runs the same query continuously.
    ``output_mode='complete'`` is for the small-bounded-state sketch jobs
    whose whole output table is the state (e.g. HLL registers)."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def streaming_hll_registers(pages: DataFrame,
                            group_col: str = "lang") -> DataFrame:
    """Streaming HyperLogLog register table: per-(group, bucket) MAX(rho)
    over the token stream — the streaming twin of the batch
    operators/sketch.py hll_distinct register fold (hll_rho is shared, so
    the hash/scramble/rho arithmetic is IDENTICAL and the drained register
    table equals the batch one bit-for-bit; pytest pins this).

    Why this is the one distinct-count that works on an UNBOUNDED stream:
    every other distinct/dedup shape needs a watermark to bound its state
    (dropDuplicatesWithinWatermark forgets keys older than the horizon, so
    its 'distinct count' drifts once duplicates span it).  The HLL register
    state is |groups| x 64 rows FOREVER — bounded by the key space, not by
    time — and MAX-merge is monotone/idempotent, so replays and
    availableNow restarts converge to the same registers.  Complete output
    mode emits the whole (tiny) register table per trigger; the estimate is
    a read-side fold (sketch.hll_estimate) over the sink table, kept out of
    the streaming query because chained streaming aggregations would need a
    second stateful operator for zero benefit at 64 rows/group."""
    from ..operators.sketch import hll_rho
    return (hll_rho(pages, group_col, spread=False)
            .groupBy("grp", "bucket").agg(F.max("rho").alias("r")))


def streaming_cm_counters(pages: DataFrame, width: int = 1024) -> DataFrame:
    """Streaming count-min counter table: per-(row_base, cell) COUNT over
    the token stream — the streaming twin of the batch cm_topk counter
    fold (operators/sketch.py cm_cells is shared, so the hashes and cell
    assignment are IDENTICAL and the drained counters equal the batch
    ones bit-for-bit; pytest pins this).  Same unbounded-stream story as
    streaming_hll_registers: state is <= 2 x width rows FOREVER with no
    watermark (bounded by the cell space, not by time), and COUNT-merge
    is additive so availableNow restarts over the same checkpoint
    converge to the counters of the full union.  The tagged-union single
    groupBy exists precisely for this job — two independent aggs (the
    naive batch shape) would be two stateful streaming operators.
    Heavy-hitter read side: sketch.cm_estimate over the sink table plus a
    candidate sample."""
    from ..operators.sketch import cm_cells
    return (cm_cells(pages, width, spread=False)
            .groupBy("row_base", "cell").agg(F.count("*").alias("n")))


def streaming_qsk_counters(pages: DataFrame,
                           group_col: str = "lang") -> DataFrame:
    """Streaming quantile-sketch counter table: per-(group, log2-bucket)
    COUNT over the doc stream — the streaming twin of the batch
    qsk_quantiles counter fold (operators/sketch.py qsk_cells is shared,
    so the tokenize/bucket arithmetic is IDENTICAL and the drained
    counters equal the batch ones bit-for-bit; pytest pins this).  Third
    member of the bounded-no-watermark sketch family: state is
    <= |groups| x 32 rows FOREVER (bounded by the bucket space, not by
    time) and COUNT-merge is additive, so availableNow restarts over the
    same checkpoint converge to the counters of the full union.  Quantile
    read side: sketch.qsk_estimate over the sink table."""
    from ..operators.sketch import qsk_cells
    return (qsk_cells(pages, group_col, spread=False)
            .groupBy("grp", "bucket").agg(F.count("*").alias("cnt")))


def streaming_focal_counts(points: DataFrame, k: int = 1) -> DataFrame:
    """Streaming hotspot counter: per-cell focal (Chebyshev-k disk) point
    counts over a geocoded point stream — the streaming twin of the batch
    spatial.focal_sum over per-cell counts (spatial.scatter_disk is
    shared, so the neighbor arithmetic is IDENTICAL, and by linearity of
    SUM the drained counters equal focal_sum of the batch per-cell counts
    bit-for-bit; pytest pins this).  Same bounded-no-watermark family as
    the HLL/CM/quantile sketches, with a geographic twist: state is one
    COUNT per non-empty disk cell — bounded by the DATA's footprint
    (cells a point ever landed near), not by time — and COUNT-merge is
    additive, so availableNow restarts over a shared checkpoint converge
    to the counts of the full union."""
    from ..operators.spatial import scatter_disk
    if k < 1:
        raise ValueError("k must be >= 1")
    pts = points.select(F.col("cell9").cast("long").alias("cell"))
    return (scatter_disk(pts, k)
            .groupBy("cell").agg(F.count("*").alias("focal_sum")))


def streaming_pip_tiles(points: DataFrame, buffers: DataFrame,
                        window: str = "10 minutes",
                        watermark: str = "30 minutes") -> DataFrame:
    """Stream-static spatial join + windowed tile counts: geocoded entity
    points arrive as a stream (url, entity, lat, lng, cell9, ts) while
    the street-buffer build side is STATIC (the city network does not
    grow with traffic).  The G4 PIP join is stateless — explode cover,
    equi-join on cell, codegen containment refine (operators/spatial.py)
    — so the exact batch operator runs unchanged on the stream; only the
    downstream per-(window, cell9) count is stateful, bounded by the
    watermark.  Append mode => closed windows only, deterministic and
    equal to the batch twin over the same input."""
    from ..operators import spatial as SP
    matches = SP.pip_join(points.withWatermark("ts", watermark), buffers,
                          passthrough=("ts",))
    return (matches
            .groupBy(F.window("ts", window).alias("w"), F.col("cell9"))
            .agg(F.count("*").alias("n_matches"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "cell9", "n_matches"))


def streaming_incremental_dedup(pages: DataFrame, corpus: DataFrame,
                                key: str = "text",
                                watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch incremental_dedup (operators/dedup.py):
    new pages stream in, the historical corpus is STATIC — a stream-static
    LEFT ANTI join on the 62-bit content fingerprint drops everything the
    corpus already has (stateless: the static side is just a lookup), then
    dropDuplicatesWithinWatermark keeps the first occurrence per
    fingerprint WITHIN the stream with watermark-bounded state.  The shape
    a continuous-ingest training-data pipeline actually runs."""
    from ..operators.dedup import _spread, fingerprint62_sql
    fp = fingerprint62_sql(key)
    seen = _spread(corpus).select(F.expr(fp).alias("fp")).distinct()
    fresh = (pages.withColumn("fp", F.expr(fp))
             .join(seen, "fp", "left_anti"))
    return (fresh.withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["fp"]))


def streaming_decontaminate(pages: DataFrame, benchmark: DataFrame,
                            w: int = 8, text_col: str = "text") -> DataFrame:
    """Streaming twin of dedup.decontaminate: pages stream in, the
    benchmark/eval set is STATIC, and any page sharing a word w-gram with
    it is dropped before reaching the corpus sink.  STATELESS: the
    benchmark's distinct w-gram hashes are a broadcast lookup and the
    per-page gram explode + semi-probe + anti-decision happens within the
    page's own row group — no watermark, no state store, so this filter
    composes in front of streaming_incremental_dedup at line rate.

    A page survives iff NONE of its w-grams appear in the benchmark (the
    batch operator returns the flagged complement; tests assert the twin
    relationship).  The verdict must be ROW-LOCAL to stay stateless — an
    explode + semi-join + distinct + self-anti-join is not runnable on a
    stream in append mode — so the benchmark collapses to a single-row
    collect_set of gram hashes, broadcast-cross-joined onto the stream,
    and the page's own gram array tests membership via arrays_overlap in
    codegen.  The one-row array is the right size trade for an EVAL set
    (thousands-to-millions of 8-byte hashes); a benchmark too large for
    one broadcast row belongs in the batch operator's semi-join shape."""
    from ..operators.dedup import _shingle_hashes, _spread
    bench_arr = (_spread(benchmark)
                 .select(F.explode(F.expr(_shingle_hashes(text_col, w)))
                         .alias("gh"))
                 .agg(F.collect_set("gh").alias("bench_ghs")))
    keep = ~F.arrays_overlap(F.col("_ghs"), F.col("bench_ghs"))
    return (pages.withColumn("_ghs", F.expr(_shingle_hashes(text_col, w)))
            .crossJoin(F.broadcast(bench_arr))
            # NULL text has no grams to match: keep it (coalesce, or the
            # NULL verdict would silently drop the row)
            .filter(F.coalesce(keep, F.lit(True)))
            .drop("_ghs", "bench_ghs"))


def catalog_ingest_batch(cat, table: str):
    """foreachBatch body for EXACTLY-ONCE streaming appends into a
    ``sources.catalog.Catalog`` table (the streaming-ingest-into-Iceberg
    shape: micro-batch -> immutable snapshot).

    Exactly-once, precisely: Structured Streaming replays a failed
    micro-batch under the SAME epoch_id, so the sink must be idempotent
    per epoch.  Snapshot publish (atomic manifest os.replace) is the LAST
    step of Catalog.write, so 'a snapshot recording this epoch exists'
    proves the previous attempt fully succeeded -> skip the replay.  A
    crash BEFORE publish leaves only an unpublished orphan snap dir; the
    replay re-allocates the same snap id (MAX(manifests)+1) and its
    mode=overwrite parquet write replaces the orphan bytes, so no
    double-count is possible on either side of the publish point.  The
    epoch scan is O(snapshots) manifest reads — the retention story is
    expire_snapshots, which keeps that list short in production."""
    def fn(batch_df, epoch_id: int):
        if cat.exists(table):
            for man in cat.snapshots(table):
                if man.get("stream_epoch") == epoch_id:
                    return  # this epoch already published — replay no-op
            cat.write(table, batch_df, mode="append",
                      extra={"stream_epoch": epoch_id})
        else:
            cat.write(table, batch_df, mode="overwrite",
                      extra={"stream_epoch": epoch_id})
    return fn


def stream_catalog_ingest(pages: DataFrame, cat, table: str,
                          checkpoint: str) -> dict:
    """Drain the currently-available stream into catalog ``table`` (one
    snapshot per micro-batch, exactly-once via catalog_ingest_batch) and
    return the resulting current manifest.  Production runs the same
    query continuously; availableNow makes tests and backfills
    deterministic.  Restarting with the same checkpoint ingests only
    files the source has not yet committed — the file-source offset log
    and the per-epoch snapshot guard compose to end-to-end exactly-once."""
    q = (pages.writeStream
         .foreachBatch(catalog_ingest_batch(cat, table))
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return cat.manifest(table)


def streaming_od_transitions(points: DataFrame, parent_res: int = 7,
                             watermark: str = "2 hours",
                             idle_minutes: int = 240) -> DataFrame:
    """Streaming twin of spatial.od_matrix's transition stream: per
    trajectory, each arriving ping paired with the previous one emits an
    (o_zone, d_zone) transition at ``parent_res`` — the live OD feed a
    mobility dashboard consumes (downstream: a windowed count agg, the
    od_matrix rollup on a clock).

    Custom stateful operator (applyInPandasWithState, the sessionize
    pattern): state per trajectory = (last_us, last_event_id, last_cell)
    — 24 bytes, evicted by an event-time timeout after ``idle_minutes``
    of event-time silence, so state is bounded by ACTIVE trajectories,
    not ever-seen ones.  Input: (traj_id, ts, event_id, cell).  Output
    (append mode): (traj_id, ts, o_zone, d_zone), ts = the destination
    ping's event time, ready for window() aggregation.

    Ordering contract (documented, tested): pings are sorted by
    (ts, event_id) INSIDE each micro-batch; a cross-batch straggler
    older than the trajectory's last emitted ping (late but inside the
    watermark, so not dropped upstream) is DISCARDED rather than
    emitted out of order — the stream equals the batch twin exactly
    for per-trajectory-ordered feeds (the crawl/telemetry pipeline's
    natural per-source order)."""
    import numpy as np  # local: only the python workers need these
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..kernel import cells as KC

    out_schema = ("traj_id bigint, ts timestamp, o_zone bigint, "
                  "d_zone bigint")
    state_schema = "last_us bigint, last_eid bigint, last_cell bigint"
    idle_ms = idle_minutes * 60 * 1000

    def fn(key, pdf_iter, state):
        tid = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdf_iter)
        cur = state.get if state.exists else None
        if chunks:
            pdf = (pd.concat(chunks)
                   .sort_values(["ts", "event_id"], kind="stable"))
            us = pdf["ts"].astype("int64").to_numpy() // 1000
            eid = pdf["event_id"].to_numpy()
            cells_ = pdf["cell"].to_numpy()
            o_z, d_z, t_out = [], [], []
            for k in range(len(us)):
                if cur is not None and (int(us[k]), int(eid[k])) <= (cur[0], cur[1]):
                    continue  # cross-batch straggler: drop, never reorder
                if cur is not None:
                    o_z.append(int(KC.parent(cur[2], parent_res)))
                    d_z.append(int(KC.parent(int(cells_[k]), parent_res)))
                    t_out.append(int(us[k]))
                cur = (int(us[k]), int(eid[k]), int(cells_[k]))
            if cur is not None:
                state.update(cur)
                _set_event_timeout(state, cur[0] // 1000 + idle_ms)
            if o_z:
                yield pd.DataFrame({
                    "traj_id": np.full(len(o_z), tid, dtype=np.int64),
                    "ts": pd.to_datetime(np.array(t_out, dtype="int64"),
                                         unit="us"),
                    "o_zone": np.array(o_z, dtype=np.int64),
                    "d_zone": np.array(d_z, dtype=np.int64)})
        elif cur is not None:
            state.update(cur)
            _set_event_timeout(state, cur[0] // 1000 + idle_ms)

    prepared = (points
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withWatermark("ts", watermark)
                .select("traj_id", "ts", "event_id",
                        F.col("cell").cast("long").alias("cell")))
    return prepared.groupBy("traj_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)


def streaming_ts_rate(samples: DataFrame, watermark: str = "2 hours",
                      idle_minutes: int = 1440) -> DataFrame:
    """Streaming twin of temporal.ts_rate: each arriving sample paired
    with its key's previous one emits the counter-reset-aware increase
    and per-second rate — the live metrics feed (PromQL rate() shape)
    whose batch twin is the backfill.

    Custom stateful operator (the streaming_od_transitions pattern):
    state per key = (last_us, last_seq, last_v) — 24 bytes, evicted by
    event-time timeout after ``idle_minutes`` of silence, so state is
    bounded by ACTIVE series.  Input: (user_id, ts, event_id, value).
    Output (append): (user_id, ts, dt_us, increase, rate_per_s) with
    the batch twin's exact arithmetic — one IEEE subtraction and two
    sequential divisions in python are the same exact-rounded double
    ops as the codegen expressions, so stream == batch bit-for-bit.

    Ordering contract (same as od/sessionize twins): in-batch sort by
    (ts, event_id); cross-batch stragglers older than the key's last
    emitted sample are discarded, never reordered."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("user_id bigint, ts timestamp, dt_us bigint, "
                  "increase double, rate_per_s double")
    state_schema = "last_us bigint, last_seq bigint, last_v double"
    idle_ms = idle_minutes * 60 * 1000

    def fn(key, pdf_iter, state):
        uid = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdf_iter)
        cur = state.get if state.exists else None
        if chunks:
            pdf = (pd.concat(chunks)
                   .sort_values(["ts", "event_id"], kind="stable"))
            us = pdf["ts"].astype("int64").to_numpy() // 1000
            seq = pdf["event_id"].to_numpy()
            vs = pdf["value"].to_numpy()
            t_out, dts, incs, rates = [], [], [], []
            for k in range(len(us)):
                u, q, v = int(us[k]), int(seq[k]), float(vs[k])
                if cur is not None and (u, q) <= (cur[0], cur[1]):
                    continue  # cross-batch straggler: drop, never reorder
                if cur is not None:
                    dt = u - cur[0]
                    inc = v - cur[2] if v >= cur[2] else v
                    t_out.append(u)
                    dts.append(dt)
                    incs.append(inc)
                    rates.append(None if dt == 0
                                 else inc / (dt / 1000000.0))
                cur = (u, q, v)
            if cur is not None:
                state.update(cur)
                _set_event_timeout(state, cur[0] // 1000 + idle_ms)
            if t_out:
                yield pd.DataFrame({
                    "user_id": np.full(len(t_out), uid, dtype=np.int64),
                    "ts": pd.to_datetime(np.array(t_out, dtype="int64"),
                                         unit="us"),
                    "dt_us": np.array(dts, dtype=np.int64),
                    "increase": np.array(incs, dtype=np.float64),
                    # object dtype: a zero-dt pair's rate is None and
                    # must reach Spark as NULL (a float64 numpy array
                    # would coerce it to NaN, which Spark treats as a
                    # VALUE — the batch twin emits NULL)
                    "rate_per_s": pd.Series(rates, dtype="object")})
        elif cur is not None:
            state.update(cur)
            _set_event_timeout(state, cur[0] // 1000 + idle_ms)

    prepared = (samples
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withWatermark("ts", watermark)
                .select("user_id", "ts", "event_id", "value"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
