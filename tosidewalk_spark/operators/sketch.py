"""Sketch operators: HyperLogLog-style distinct counting and count-min
heavy hitters — the two sketches a 100 TB corpus pipeline reaches for when
exact distinct/frequency tables stop fitting anywhere.

Both sketches are built from the repo's shared polynomial hash
(functions/sqlfns.py, mod 2^31-1) with INTEGER-ONLY estimator arithmetic
(fixed-point, generated CASE lookup tables instead of POWER/LOG — libm
calls diverge by ulps across engines, see the cross-engine fuzz note in
functions/sqlfns.py), so the DuckDB twins reproduce every register, every
counter cell, and every estimate bit-for-bit.  That is the same
engine-exactness contract as the rest of the registry: the sketch is
deterministic, so "approximate" means approximate w.r.t. the TRUE
distinct/frequency values, not w.r.t. reruns or engines.

Scale story (the reason these exist):

* ``hll_distinct``: per-group register table is GROUP BY (lang, bucket) →
  MAX(rho) — map-side combine caps each task's output at |groups| x m
  rows, the exchange carries at most |groups| x m = a few thousand rows
  regardless of corpus size.  Exact COUNT(DISTINCT token) at the same
  grain shuffles the full token stream.
* ``cm_topk``: the counter table is two GROUP BY cell COUNT(*) aggs of
  fixed width w (map-side combined to <= 2w rows per task); candidates
  come from a deterministic doc sample, and the estimate join broadcasts
  the 2w-row sketch.  No full-vocabulary shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import sqlfns
from .dedup import _spread

# --- HyperLogLog (m = 64 registers, alpha_64 = 0.709 from the HLL paper) --
HLL_M = 64
_HASH_P = 2147483647  # = sqlfns/kernel HASH_P (2^31 - 1, prime)


def _scramble_sql(h: str) -> str:
    """Two Lehmer/MINSTD multiplicative-congruential steps
    (x -> x*48271 % p, then *69621 % p) over the polyhash value.  The raw
    polyhash of SHORT tokens never wraps p (31^5*122 barely exceeds it),
    so it is pure affine in the char codes and its low bits are heavily
    structured — measured: HLL over 'tok0'..'tok2999' estimated 663
    (-78%) without this.  The forced multiply+wrap decorrelates the low
    bits (MINSTD's spectral quality is sufficient for a 13%-sigma
    sketch); products < 2^31 * 70k < 2^48, no ANSI overflow, and the
    template is dialect-portable (* and % only)."""
    return f"(((({h}) * 48271) % {_HASH_P}) * 69621 % {_HASH_P})"
_HLL_W_BITS = 25          # h < 2^31-1, h DIV 64 < 2^25
_HLL_RMAX = _HLL_W_BITS + 1
_HLL_SCALE = 26           # fixed-point denominator 2^26 for 2^-rho sums
_ALPHA_NUM, _ALPHA_DEN = 709, 1000  # alpha_64 = 0.709


def _rho_sql(w: str) -> str:
    """1-based position of the lowest set bit of ``w`` (rho in HLL), RMAX
    for w = 0.  One template string valid in BOTH dialects: lowest set bit
    via w & (0 - w), then a literal CASE lookup — no LOG/POWER."""
    arms = " ".join(f"WHEN {1 << k} THEN {k + 1}" for k in range(_HLL_W_BITS))
    return (f"(CASE WHEN ({w}) = 0 THEN {_HLL_RMAX} "
            f"ELSE CASE (({w}) & (0 - ({w}))) {arms} END END)")


def _inv_pow2_sql(r: str) -> str:
    """2^(_HLL_SCALE - r) as a literal CASE lookup (r in 1.._HLL_RMAX)."""
    arms = " ".join(f"WHEN {k} THEN {1 << (_HLL_SCALE - k)}"
                    for k in range(1, _HLL_RMAX + 1))
    return f"(CASE ({r}) {arms} END)"


def _hll_est_sql(sum_inv: str) -> str:
    """alpha_m * m^2 / Z with Z = sum_inv / 2^SCALE, as FLOOR(double-div)
    of two exact-in-double integers (num < 2^48, den < 2^43): IEEE
    division + FLOOR is bit-identical across engines even when the true
    quotient rounds, which is all the twin contract needs."""
    num = _ALPHA_NUM * HLL_M * HLL_M * (1 << _HLL_SCALE)
    return (f"CAST(FLOOR({num} / ({_ALPHA_DEN} * ({sum_inv}))) AS BIGINT)")


def _hll_final_sql(n_hit: str, sum_inv: str) -> str:
    """The full HLL estimator including the paper's small-range (linear
    counting) correction: when the raw estimate <= 5m/2 and empty
    registers remain, use m*ln(m/V) with V = empty registers.  ln would be
    a libm call (1-ulp cross-engine divergence, see the POWER(x,2) fuzz
    finding) — but V has only 63 possible values, so the whole LC branch
    is a python-precomputed integer CASE lookup; the SQL stays
    engine-exact."""
    import math as _m
    lc_arms = " ".join(
        f"WHEN {v} THEN {round(HLL_M * _m.log(HLL_M / v))}"
        for v in range(1, HLL_M))
    raw = _hll_est_sql(sum_inv)
    return (f"(CASE WHEN ({n_hit}) < {HLL_M} AND {raw} <= {5 * HLL_M // 2} "
            f"THEN CASE ({HLL_M} - ({n_hit})) {lc_arms} END "
            f"ELSE {raw} END)")


def hll_rho(docs: DataFrame, group_col: str = "lang",
            spread: bool = True) -> DataFrame:
    """The pre-aggregation HLL observable stream: one (grp, bucket, rho)
    row per token occurrence.  Shared by the batch estimator
    (hll_distinct) and the streaming register job
    (streaming/jobs.py streaming_hll_registers) so both fold the
    IDENTICAL hash/scramble/rho pipeline.  ``spread=False`` skips the
    _spread inputFiles() probe, which a streaming DataFrame cannot
    answer (the stream's own micro-batch planning sets parallelism)."""
    h = sqlfns.polyhash_spark("tok")
    src = _spread(docs) if spread else docs
    ex = (src
          .select(F.col(group_col).alias("grp"),
                  F.explode(F.expr("FILTER(SPLIT(text, ' '), "
                                   "t -> LENGTH(t) > 0)")).alias("tok"))
          .select("grp", F.expr(_scramble_sql(h)).alias("h"))
          .select("grp",
                  F.expr(f"h % {HLL_M}").alias("bucket"),
                  F.expr(f"CAST(FLOOR(h / {HLL_M}) AS BIGINT)").alias("w")))
    return ex.select("grp", "bucket", F.expr(_rho_sql("w")).alias("rho"))


def hll_estimate(regs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Fold a (grp, bucket, r) register table into the final estimate row
    per group — the read side of the sketch.  Registers are tiny
    (|groups| x 64 rows) whether they came from the batch MAX-agg or a
    drained streaming register table; the estimator is the same
    fixed-point integer arithmetic either way."""
    per = (regs.groupBy("grp")
           .agg(F.count("*").alias("n_hit"),
                F.sum(F.expr(_inv_pow2_sql("r"))).alias("inv_hit")))
    return (per.select(
        F.col("grp").alias(group_col),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.expr(f"CAST(inv_hit + ({HLL_M} - n_hit) * {1 << _HLL_SCALE} "
               f"AS BIGINT)").alias("sum_inv"))
        .withColumn("est_distinct",
                    F.expr(_hll_final_sql("n_hit", "sum_inv"))))


def hll_distinct(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-``group_col`` HyperLogLog estimate of the DISTINCT whitespace
    token count — the sketch behind vocabulary-size tracking, per-language
    coverage dashboards, and dedup-rate monitoring at corpus scale.

    Register update: h = scramble(polyhash(token)) in [0, 2^31-1) (see
    _scramble_sql for why the raw polyhash cannot feed rho); bucket = h % 64;
    rho = lowest-set-bit position of h DIV 64 (uniform-bit geometric, the
    HLL observable); register = MAX(rho) per (group, bucket).  Estimator:
    alpha_64 * m^2 / sum_j 2^-M_j with empty registers contributing 2^0,
    folded in fixed point (denominator 2^26) so both engines agree
    exactly, plus the paper's small-range linear-counting branch
    (m*ln(m/V) when raw est <= 5m/2 and V empty registers remain) as a
    precomputed integer lookup.  Standard error ~1.04/sqrt(64) = 13%.
    Token-hash collisions (2^31 space) under-count by <0.05% at 10^6
    vocab — negligible next to the 13% sketch error.

    Output: (group, n_hit, sum_inv, est_distinct), all integers.
    """
    regs = (hll_rho(docs, group_col)
            .groupBy("grp", "bucket").agg(F.max("rho").alias("r")))
    return hll_estimate(regs, group_col)


def hll_distinct_oracle(group_col: str = "lang",
                        docs_rel: str = "documents") -> str:
    """DuckDB twin of hll_distinct: identical hash, identical register
    fold, identical fixed-point estimator."""
    h = sqlfns.polyhash_duckdb("tok")
    return f"""
    WITH ex AS (
      SELECT {group_col} AS grp,
             unnest(list_filter(string_split(text, ' '),
                                t -> length(t) > 0)) AS tok
      FROM {docs_rel}),
    exh AS (SELECT grp, {_scramble_sql(h)} AS h FROM ex),
    hw AS (
      SELECT grp, h % {HLL_M} AS bucket,
             CAST(FLOOR(h / {HLL_M}) AS BIGINT) AS w
      FROM exh),
    regs AS (
      SELECT grp, bucket, MAX({_rho_sql('w')}) AS r
      FROM hw GROUP BY grp, bucket),
    per AS (
      SELECT grp, COUNT(*) AS n_hit, SUM({_inv_pow2_sql('r')}) AS inv_hit
      FROM regs GROUP BY grp),
    perf AS (
      SELECT grp, CAST(n_hit AS BIGINT) AS n_hit,
             CAST(inv_hit + ({HLL_M} - n_hit) * {1 << _HLL_SCALE} AS BIGINT)
               AS sum_inv
      FROM per)
    SELECT grp AS {group_col}, n_hit, sum_inv,
           {_hll_final_sql("n_hit", "sum_inv")} AS est_distinct
    FROM perf
    """


# --- count-min sketch heavy hitters (d = 2 rows, width w) ------------------
CM_WIDTH = 1024


def cm_cells(docs: DataFrame, width: int = CM_WIDTH,
             spread: bool = True) -> DataFrame:
    """The pre-aggregation count-min observable stream: one (row_base,
    cell) row per token occurrence per hash row — both rows tagged by
    their hash base (31/37) so ONE groupBy covers the whole sketch.
    Shared by the batch cm_topk fold and the streaming counter job
    (streaming/jobs.py streaming_cm_counters); a single grouped COUNT is
    the shape Structured Streaming can run (two independent aggs would be
    two stateful operators).  Cost note: the tagged union scans the input
    once per hash row, exactly what the previous two-independent-aggs
    plan did — the exchange still carries <= 2 x width combined rows per
    task either way."""
    h31 = sqlfns.polyhash_spark("tok", 31)
    h37 = sqlfns.polyhash_spark("tok", 37)
    src = _spread(docs) if spread else docs
    ex = src.select(F.explode(F.expr("FILTER(SPLIT(text, ' '), "
                                     "t -> LENGTH(t) > 0)")).alias("tok"))
    return (ex.select(F.lit(31).alias("row_base"),
                      F.expr(f"({h31}) % {width}").alias("cell"))
            .unionAll(ex.select(F.lit(37).alias("row_base"),
                                F.expr(f"({h37}) % {width}").alias("cell"))))


def cm_estimate(counters: DataFrame, docs: DataFrame,
                width: int = CM_WIDTH, k: int = 50,
                sample_mod: int = 20) -> DataFrame:
    """Read-side top-k fold over a (row_base, cell, n) counter table —
    whether it came from the batch cm_cells COUNT or a drained streaming
    counter sink, the candidate/estimate/top-k arithmetic is identical.
    ``docs`` supplies the candidate sample (a sketch alone cannot be
    enumerated; candidates come from data)."""
    h31 = sqlfns.polyhash_spark("tok", 31)
    h37 = sqlfns.polyhash_spark("tok", 37)
    row31 = (counters.filter("row_base = 31")
             .select(F.col("cell").alias("c31"), F.col("n").alias("n31")))
    row37 = (counters.filter("row_base = 37")
             .select(F.col("cell").alias("c37"), F.col("n").alias("n37")))
    cand = (_spread(docs).filter(f"doc_id % {int(sample_mod)} = 0")
            .select(F.explode(F.expr("FILTER(SPLIT(text, ' '), "
                                     "t -> LENGTH(t) > 0)")).alias("tok"))
            .distinct()
            .select("tok",
                    F.expr(f"({h31}) % {width}").alias("c31"),
                    F.expr(f"({h37}) % {width}").alias("c37")))
    est = (cand.join(F.broadcast(row31), "c31")
           .join(F.broadcast(row37), "c37")
           .select(F.col("tok").alias("token"),
                   F.least("n31", "n37").alias("est_count")))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("est_count"), F.asc("token"))
    return (est.orderBy(F.desc("est_count"), "token").limit(k)
            .withColumn("rank", F.row_number().over(w)))


def cm_topk(docs: DataFrame, width: int = CM_WIDTH, k: int = 50,
            sample_mod: int = 20) -> DataFrame:
    """Heavy-hitter tokens via a count-min sketch: two independent-base
    (31/37) hash rows of ``width`` counters over EVERY token occurrence,
    then candidate tokens (distinct tokens of the deterministic
    ``doc_id % sample_mod = 0`` sample — a true heavy hitter is present in
    any few-percent sample) estimated as MIN over the two rows and
    top-k'ed.  CM guarantees est >= true count (one-sided error), so the
    top-k by estimate never silently drops a sufficiently-heavy token;
    the unit test pins est >= exact per candidate.

    Plan: token explode -> two fixed-width COUNT aggs (map-side combined,
    exchange <= 2 x width rows total) -> candidate distinct over the
    sample -> two BROADCAST joins against the 2-row sketch -> global
    top-k via TakeOrderedAndProject (est desc, token asc: a total order).

    Output: (token, est_count, rank).
    """
    counters = (cm_cells(docs, width)
                .groupBy("row_base", "cell").agg(F.count("*").alias("n")))
    return cm_estimate(counters, docs, width, k, sample_mod)


def cm_topk_oracle(width: int = CM_WIDTH, k: int = 50,
                   sample_mod: int = 20,
                   docs_rel: str = "documents") -> str:
    """DuckDB twin of cm_topk — identical hashes, counters, and top-k
    total order."""
    h31 = sqlfns.polyhash_duckdb("tok", 31)
    h37 = sqlfns.polyhash_duckdb("tok", 37)
    return f"""
    WITH ex AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                t -> length(t) > 0)) AS tok
      FROM {docs_rel}),
    row31 AS (
      SELECT ({h31}) % {width} AS c31, COUNT(*) AS n31 FROM ex GROUP BY 1),
    row37 AS (
      SELECT ({h37}) % {width} AS c37, COUNT(*) AS n37 FROM ex GROUP BY 1),
    cand0 AS (
      SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
                                         t -> length(t) > 0)) AS tok
      FROM {docs_rel} WHERE doc_id % {int(sample_mod)} = 0),
    cand AS (
      SELECT tok, ({h31}) % {width} AS c31, ({h37}) % {width} AS c37
      FROM cand0),
    est AS (
      SELECT cand.tok AS token, LEAST(row31.n31, row37.n37) AS est_count
      FROM cand
      JOIN row31 USING (c31)
      JOIN row37 USING (c37))
    SELECT token, est_count,
           CAST(ROW_NUMBER() OVER (ORDER BY est_count DESC, token)
                AS INT) AS rank
    FROM est
    QUALIFY ROW_NUMBER() OVER (ORDER BY est_count DESC, token) <= {k}
    """


# --- log2-bucket quantile sketch -------------------------------------------
# The third sketch a corpus dashboard needs next to distinct (HLL) and
# frequency (count-min): length/size QUANTILES.  Exact per-group quantiles
# (operators/text.py length_quantiles) need every value co-located — a full
# shuffle of one row per document.  The sketch below is the mergeable,
# bounded-state path: bucket every value by floor(log2(v + 1)) into <= 32
# buckets, keep one COUNT per (group, bucket), and answer quantile queries
# from the cumulative bucket histogram.  Guarantee: the returned value is
# the LOWER BOUND (2^b - 1) of the bucket containing the true q-quantile,
# so true_q in [answer, 2*answer + 1) — a factor-2 value guarantee with
# state that never exceeds |groups| x 32 rows no matter the corpus size.
# Like the HLL registers (MAX-merge) and CM counters (COUNT-merge), the
# bucket counts are additive, so the same fold runs as a Structured
# Streaming aggregation with bounded no-watermark state
# (streaming/jobs.py streaming_qsk_counters) and drained streaming
# counters equal the batch ones bit-for-bit.
QSK_MAX_BITS = 32  # values < 2^32 - 1 (token counts; web docs are far below)


def _log2_bucket_sql(v: str) -> str:
    """floor(log2(v + 1)) via the length of the binary rendering — BIN()
    renders BIGINT without leading zeros identically on both engines
    (no libm LOG call, same engine-exactness rule as the HLL/CM
    templates).  v = 0 lands in bucket 0; bucket b holds
    v in [2^b - 1, 2^(b+1) - 2]."""
    return f"CAST(LENGTH(BIN(CAST({v} AS BIGINT) + 1)) - 1 AS INT)"


def _pow2m1_sql(b: str) -> str:
    """2^b - 1 as a literal CASE lookup (b in 0..QSK_MAX_BITS-1) — one
    dialect-portable template, no shift-operator syntax differences."""
    arms = " ".join(f"WHEN {k} THEN {(1 << k) - 1}"
                    for k in range(QSK_MAX_BITS))
    return f"(CASE ({b}) {arms} END)"


# quantiles reported: (label, numerator, denominator) — exact rationals so
# the rank test is integer cross-multiplication (cum * den >= n * num),
# never a float threshold
QSK_QS = (("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def qsk_cells(docs: DataFrame, group_col: str = "lang",
              spread: bool = True) -> DataFrame:
    """The pre-aggregation observable stream: one (grp, bucket) row per
    document, bucket = floor(log2(token_count + 1)).  Shared by the batch
    estimator (qsk_quantiles) and the streaming counter job so both fold
    the IDENTICAL tokenize/bucket pipeline; ``spread=False`` skips the
    inputFiles() probe a streaming DataFrame cannot answer."""
    n = "SIZE(FILTER(SPLIT(text, ' '), t -> LENGTH(t) > 0))"
    src = _spread(docs) if spread else docs
    return src.select(F.col(group_col).alias("grp"),
                      F.expr(_log2_bucket_sql(n)).alias("bucket"))


def qsk_estimate(counters: DataFrame, group_col: str = "lang") -> DataFrame:
    """Read-side quantile fold over a (grp, bucket, cnt) counter table —
    batch agg or drained streaming sink alike.  Cumulative count per
    bucket via a window (the counter table is <= |groups| x 32 rows, the
    window shuffle is metadata-sized), quantile rank by integer
    cross-multiplication, answer = the containing bucket's lower bound.

    Output: (group, n_docs, p25_lo, p50_lo, p90_lo, p99_lo) — all BIGINT,
    each p*_lo <= true quantile < 2 * p*_lo + 1."""
    from pyspark.sql import Window
    w = (Window.partitionBy("grp").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    c = (counters.withColumn("cum", F.sum("cnt").over(w))
         .withColumn("n", F.sum("cnt").over(Window.partitionBy("grp"))))
    aggs = [F.sum("cnt").cast("long").alias("n_docs")]
    for label, num, den in QSK_QS:
        aggs.append(F.min(F.when(
            F.expr(f"cum * {den} >= n * {num}"), F.col("bucket")))
            .alias(f"b_{label}"))
    per = c.groupBy("grp").agg(*aggs)
    sel = [F.col("grp").alias(group_col), "n_docs"]
    sel += [F.expr(f"CAST({_pow2m1_sql('b_' + lb)} AS BIGINT)")
            .alias(f"{lb}_lo") for lb, _, _ in QSK_QS]
    return per.select(*sel)


def qsk_quantiles(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-``group_col`` approximate token-count quantiles from the
    log2-bucket sketch: bucket each doc's exact whitespace token count,
    COUNT per (group, bucket) — map-side combined, exchange carries at
    most |groups| x 32 rows regardless of corpus size — then fold the
    cumulative histogram into p25/p50/p90/p99 lower bounds.  The exact
    twin (length_quantiles) shuffles one row per document; this is what
    replaces it when the dashboard runs hourly over 10^12 docs."""
    counters = (qsk_cells(docs, group_col)
                .groupBy("grp", "bucket").agg(F.count("*").alias("cnt")))
    return qsk_estimate(counters, group_col)


def qsk_quantiles_oracle(group_col: str = "lang",
                         docs_rel: str = "documents") -> str:
    """DuckDB twin of qsk_quantiles: identical tokenizer, bucket rule,
    cumulative fold, and integer rank arithmetic."""
    n = ("length(list_filter(string_split(text, ' '), "
         "t -> length(t) > 0))")
    qcols = ", ".join(
        f"MIN(CASE WHEN cum * {den} >= n * {num} THEN bucket END) AS b_{lb}"
        for lb, num, den in QSK_QS)
    pcols = ", ".join(
        f"CAST({_pow2m1_sql('b_' + lb)} AS BIGINT) AS {lb}_lo"
        for lb, _, _ in QSK_QS)
    return f"""
    WITH cells AS (
      SELECT {group_col} AS grp, {_log2_bucket_sql(n)} AS bucket
      FROM {docs_rel}),
    counters AS (
      SELECT grp, bucket, COUNT(*) AS cnt FROM cells GROUP BY grp, bucket),
    cum AS (
      SELECT grp, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY grp) AS n
      FROM counters),
    per AS (
      SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_docs, {qcols}
      FROM cum GROUP BY grp)
    SELECT grp AS {group_col}, n_docs, {pcols}
    FROM per
    """
