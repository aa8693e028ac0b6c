"""Shared SQL expression templates — the bridge between the Spark engine
and the DuckDB oracle.

Each template here is a single ANSI-SQL string formatted with column
references and used BOTH as a Spark ``F.expr(...)`` (JVM-side, whole-stage
codegen — the fast path per the north rule) and verbatim inside the
``oracle_sql()`` strings that DuckDB runs.  One template, two engines =>
bit-identical arithmetic, which is what makes the driver's value-hash
comparison pass without tolerance hacks.

Kernel twins: cells.cell == CELL_TPL, geom.haversine_m == HAVERSINE_TPL,
geom.point_segment_dist_m == SEG_DIST_TPL, cells.hash63 == polyhash.
Unit tests in tests/test_sqlfns.py check numpy-vs-Spark-vs-DuckDB equality.
"""

from __future__ import annotations

from ..kernel import cells as _cells

POW2_56 = 72057594037927936  # 2**56
POW2_28 = 268435456          # 2**28
HASH_P = _cells.HASH_P


def dlit(x: float) -> str:
    """Emit a float as a DOUBLE literal valid in both Spark and DuckDB.
    Plain fractional literals parse as DECIMAL in both engines (and chained
    DECIMAL multiplication overflows DuckDB's max scale), so force exponent
    notation — exponent literals are DOUBLE everywhere."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


M = "111111.0e0"
EARTH_R = "6371009.0e0"


def cell_sql(lat: str, lng: str, res: int = 9) -> str:
    """Cell id at resolution ``res`` — mirror of kernel.cells.cell."""
    s = dlit(360.0 / float(2 ** (res + 9)))
    return (
        f"(CAST({res} AS BIGINT) * {POW2_56} "
        f"+ CAST(FLOOR(({lat} + 90.0e0) / {s}) AS BIGINT) * {POW2_28} "
        f"+ CAST(FLOOR(({lng} + 180.0e0) / {s}) AS BIGINT))"
    )


def parent_sql(cell: str, res: int, parent_res: int) -> str:
    """Parent cell id — mirror of kernel.cells.parent.  Integer shifts are
    spelled FLOOR(x / 2**n) because Spark's DIV is not DuckDB SQL and
    DuckDB's // is not Spark SQL; all values < 2**52 so doubles are exact."""
    d = 2 ** (res - parent_res)
    j = f"CAST(FLOOR((({cell}) % {POW2_56}) / {POW2_28}) AS BIGINT)"
    i = f"(({cell}) % {POW2_28})"
    return (
        f"(CAST({parent_res} AS BIGINT) * {POW2_56} "
        f"+ CAST(FLOOR({j} / {d}) AS BIGINT) * {POW2_28} "
        f"+ CAST(FLOOR({i} / {d}) AS BIGINT))"
    )


def zorder_sql(i: str, j: str, bits: int = 16) -> str:
    """Z-order (Morton) key of two NON-NEGATIVE integer lattice columns —
    mirror of kernel.cells.zorder.  Spelled as FLOOR-division + modulo
    arithmetic (no engine-specific bit operators) so the identical string
    runs in Spark and DuckDB; every intermediate < 2**(2*bits) <= 2**52,
    exact in BIGINT and in the doubles FLOOR sees."""
    terms = []
    for b in range(bits):
        terms.append(f"(CAST(FLOOR(({i}) / {2 ** b}) AS BIGINT) % 2) * {2 ** (2 * b)}")
        terms.append(f"(CAST(FLOOR(({j}) / {2 ** b}) AS BIGINT) % 2) * {2 ** (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """Great-circle meters — mirror of kernel.geom.haversine_m."""
    return (
        f"(2.0e0 * {EARTH_R} * ASIN(SQRT("
        f"POWER(SIN(RADIANS(({lat2}) - ({lat1})) / 2.0e0), 2) "
        f"+ COS(RADIANS({lat1})) * COS(RADIANS({lat2})) "
        f"* POWER(SIN(RADIANS(({lng2}) - ({lng1})) / 2.0e0), 2))))"
    )


RAD = "0.017453292519943295e0"


def coslat_sql(lat: str) -> str:
    """cos(radians(lat)) as the shared degree-8 Horner polynomial — twin of
    kernel.geom.coslat.  +-* only, so Spark, DuckDB and numpy produce the
    SAME double bit-for-bit (libm cos does not guarantee that)."""
    t = f"(({lat}) * {RAD})"
    t2 = f"({t} * {t})"
    return (f"(1.0e0 + {t2} * (-0.5e0 + {t2} * (0.041666666666666664e0 "
            f"+ {t2} * (-0.001388888888888889e0 + {t2} * 2.48015873015873e-05))))")


def equirect_dist_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """Planar equirectangular meters anchored at point 1 — twin of
    kernel.geom.equirect_m; bit-identical across engines (poly cos)."""
    dx = f"((({lng2}) - ({lng1})) * {coslat_sql(lat1)} * {M})"
    dy = f"((({lat2}) - ({lat1})) * {M})"
    return f"(SQRT({dx} * {dx} + {dy} * {dy}))"


def seg_dist_sql(plat: str, plng: str, alat: str, alng: str,
                 blat: str, blng: str) -> str:
    """Point-to-segment meters — mirror of kernel.geom.point_segment_dist_m.

    Equirectangular frame anchored at the segment start; clamp the
    projection parameter to [0, 1].  The tiny denominator epsilon guards
    zero-length segments identically in both engines.  Uses the shared
    polynomial cos so all three engines agree bit-for-bit."""
    c = f"({coslat_sql(alat)} * {M})"
    mx = f"((({blng}) - ({alng})) * {c})"
    my = f"((({blat}) - ({alat})) * {M})"
    px = f"((({plng}) - ({alng})) * {c})"
    py = f"((({plat}) - ({alat})) * {M})"
    seg2 = f"({mx} * {mx} + {my} * {my} + 1e-300)"
    t = f"LEAST(GREATEST(({px} * {mx} + {py} * {my}) / {seg2}, 0.0e0), 1.0e0)"
    # (e)*(e), NOT POWER(e, 2): libm pow is not exact-rounded and Spark
    # vs DuckDB disagreed by 1 ulp on fuzzed inputs (caught by
    # tests/test_cross_engine_fuzz.py); multiplication is IEEE
    # exact-rounded everywhere and matches the numpy twin's ex*ex.
    # Codegen/CSE dedupes the repeated subexpression.
    ex = f"({px} - ({t}) * {mx})"
    ey = f"({py} - ({t}) * {my})"
    return f"(SQRT({ex} * {ex} + {ey} * {ey}))"


def buffer_corners_sql(alat: str, alng: str, blat: str, blng: str,
                       half_width_m: float) -> tuple[list[str], list[str]]:
    """The 4 corner coordinates (CCW, flat caps) of the rectangle buffering
    segment a->b by half_width_m each side — twin of
    kernel.geom.buffer_segment (which uses sqrt(dx*dx + dy*dy), not hypot,
    precisely so this template is bit-identical in Spark, DuckDB and numpy).
    Returns ([4 lat exprs], [4 lng exprs])."""
    hw = dlit(half_width_m)
    cm = f"({coslat_sql(alat)} * {M})"
    mx = f"((({blng}) - ({alng})) * {cm})"
    my = f"((({blat}) - ({alat})) * {M})"
    L = (f"(CASE WHEN SQRT({mx} * {mx} + {my} * {my}) = 0.0e0 THEN 1.0e0 "
         f"ELSE SQRT({mx} * {mx} + {my} * {my}) END)")
    nx = f"(-(({my}) / {L}) * {hw})"
    ny = f"((({mx}) / {L}) * {hw})"
    lats = [f"(({alat}) + {ny} / {M})",
            f"(({alat}) + ({my} + {ny}) / {M})",
            f"(({alat}) + ({my} - {ny}) / {M})",
            f"(({alat}) + (-{ny}) / {M})"]
    lngs = [f"(({alng}) + {nx} / {cm})",
            f"(({alng}) + ({mx} + {nx}) / {cm})",
            f"(({alng}) + ({mx} - {nx}) / {cm})",
            f"(({alng}) + (-{nx}) / {cm})"]
    return lats, lngs


def rect_inside_sql(plat: str, plng: str, alat: str, alng: str,
                    blat: str, blng: str, half_width_m: float) -> str:
    """Strict containment of a point in the flat-capped rectangle buffering
    segment a->b by half_width_m each side: 0 < t < 1 along the segment and
    squared perpendicular distance < hw^2, in the same equirectangular
    frame as seg_dist_sql (anchored at a, poly cos).  Identical template in
    Spark and DuckDB => bit-identical booleans.

    Why not ray-casting over the 4 corners: that expression is so large
    that Spark's generated code blows the JIT method limit and the whole
    stage falls back to interpreted evaluation — measured 50 us/row vs
    <1 us for this ~30-op form.  Semantics differ from corner ray-casting
    only ON the zero-measure boundary (exact cap/edge hits).  The tiny
    seg2 epsilon makes zero-length segments test false in both engines."""
    hw = dlit(half_width_m)
    c = f"({coslat_sql(alat)} * {M})"
    mx = f"((({blng}) - ({alng})) * {c})"
    my = f"((({blat}) - ({alat})) * {M})"
    px = f"((({plng}) - ({alng})) * {c})"
    py = f"((({plat}) - ({alat})) * {M})"
    seg2 = f"({mx} * {mx} + {my} * {my} + 1e-300)"
    t = f"(({px} * {mx} + {py} * {my}) / {seg2})"
    ex = f"({px} - {t} * {mx})"
    ey = f"({py} - {t} * {my})"
    return (f"(({t}) > 0.0e0 AND ({t}) < 1.0e0 "
            f"AND ({ex} * {ex} + {ey} * {ey}) < ({hw} * {hw}))")


def polyhash_spark(s: str, mult: int = 31) -> str:
    """Polynomial string hash, Spark flavor — mirror of kernel.cells.hash63.
    ``mult`` picks the polynomial base: a second hash with a DIFFERENT base
    (e.g. 37) is genuinely independent of the base-31 one — unlike a
    suffix-salted variant of the same base, which is an affine function of
    it (ADVICE.md r2: any two tokens colliding on base-31 collided on the
    salted variant too).

    r6 form: ONE SPLIT(s, '') pass to per-character strings, then a
    direct AGGREGATE fold.  The previous per-index form
    (AGGREGATE(TRANSFORM(SEQUENCE(1, LENGTH(s)), k -> ASCII(SUBSTRING(
    s, k, 1))) ...)) re-scanned the UTF-8 bytes from position 0 on EVERY
    SUBSTRING call — O(n²) per string, measured 4.2x slower on ~1 KB
    document fingerprints and ~20% slower on short tokens.  Values are
    bit-identical: Spark's SPLIT is code-point based (surrogate pairs
    are NOT split — verified against SUBSTRING/ASCII on astral-plane
    chars), ASCII returns the same code point, and the fold order is
    unchanged.  The FILTER drops the empty-string artifact an
    empty-pattern regex split can append; interior elements of a
    ''-split are single characters, never ''.  CASE keeps the NULL/empty
    sentinel at 0."""
    return (
        f"(CASE WHEN {s} IS NULL OR LENGTH({s}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE AGGREGATE(FILTER(SPLIT({s}, ''), c -> c != ''), "
        f"CAST(0 AS BIGINT), (a, c) -> (a * {mult} + ASCII(c)) % {HASH_P}) "
        f"END)"
    )


def polyhash_duckdb(s: str, mult: int = 31) -> str:
    """Polynomial string hash, DuckDB flavor — same fold as polyhash_spark
    (list_prepend(0, ...) + list_reduce == aggregate with 0 init)."""
    return (
        f"(CASE WHEN {s} IS NULL THEN CAST(0 AS BIGINT) ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({s}) + 1), "
        f"k -> CAST(ascii(substr({s}, k, 1)) AS BIGINT))), "
        f"(a, x) -> (a * {mult} + x) % {HASH_P}) END)"
    )


def polyhash_unrolled(s: str, max_len: int = 12) -> str:
    """Polynomial hash of a SHORT (<= max_len chars) string as pure nested
    arithmetic (no higher-order functions) — identical fold and values as
    polyhash_spark/duckdb.  MEASURED SLOWER than the lambda fold (2.7x at
    10M rows: per-char SUBSTRING slicing + the 78-branch CASE dispatch cost
    more than the HOF interpreter) — kept as the documented experiment and
    for engines/contexts where lambdas are unavailable; the engine's hot
    paths use polyhash_spark.  One template string, valid in both Spark
    and DuckDB.  Strings longer than max_len return -1 (a loud sentinel).

    Shape note: the fold is dispatched on LENGTH(s) at the TOP so each
    branch is a straight-line fold of exactly n chars — wrapping each fold
    STEP in its own CASE duplicates the accumulator per level and builds a
    2^max_len-node tree (measured 100x slower; ``s`` must be a plain
    column reference, staged by the caller)."""
    branches = []
    for n in range(1, max_len + 1):
        acc = "CAST(0 AS BIGINT)"
        for i in range(1, n + 1):
            c = f"CAST(ASCII(SUBSTRING({s}, {i}, 1)) AS BIGINT)"
            acc = f"(({acc} * 31 + {c}) % {HASH_P})"
        branches.append(f"WHEN {n} THEN {acc}")
    return (f"(CASE LENGTH({s}) WHEN 0 THEN CAST(0 AS BIGINT) "
            + " ".join(branches) + " ELSE CAST(-1 AS BIGINT) END)")


def minhash_spark(hashes_col: str, a: int, b: int) -> str:
    """min over ((a*h + b) % P) of an array<bigint> column, Spark flavor."""
    return (
        f"ARRAY_MIN(TRANSFORM({hashes_col}, "
        f"h -> ({a} * h + {b}) % {HASH_P}))"
    )


def minhash_duckdb(hashes_col: str, a: int, b: int) -> str:
    return (
        f"list_min(list_transform({hashes_col}, "
        f"h -> ({a} * h + {b}) % {HASH_P}))"
    )


def bm25_part_sql(tf: str = "tf", df: str = "df", dl: str = "dl",
                  n_docs: str = "n_docs", avgdl: str = "avgdl") -> str:
    """Per-(term, doc) BM25 partial, quantized to BIGINT — ONE template
    valid in both Spark SQL and DuckDB (the shared-template discipline:
    identical expression tree => identical IEEE doubles => identical
    FLOOR quantization on both engines).

    Rational-idf BM25 (k1 = 1.2, b = 0.75): the standard
    ln((N - df + 0.5)/(df + 0.5) + 1) idf is replaced by the rational
    factor (N - df + 0.5)/(df + 0.5) itself — LN is libm and drifts by
    ulps between engines (the POWER(x,2) lesson, BENCH/BASELINE.md),
    while +,-,*,/ are exactly rounded.  Rankings differ from log-BM25
    only in how multi-term scores mix (rare terms weigh relatively
    more); the saturation/length-normalization behavior BM25 exists for
    lives in the tf term, which is exact Robertson-Sparck Jones.

    The partial is scaled 1e4 and FLOOR(x + 0.5)-quantized BEFORE the
    per-(query, doc) SUM so the aggregate is an order-free BIGINT sum —
    deterministic at any parallelism (tfidf_topk's discipline)."""
    idf = (f"((CAST({n_docs} - {df} AS DOUBLE) + 0.5e0) / "
           f"(CAST({df} AS DOUBLE) + 0.5e0))")
    num = f"(CAST({tf} AS DOUBLE) * 2.2e0)"
    den = (f"(CAST({tf} AS DOUBLE) + 1.2e0 * "
           f"(0.25e0 + 0.75e0 * (CAST({dl} AS DOUBLE) / {avgdl})))")
    return f"CAST(FLOOR({idf} * {num} / {den} * 1.0e4 + 0.5e0) AS BIGINT)"


def gi_z_sql(S: str = "focal_sum", w: str = "w", n: str = "n_cells",
             sum_x: str = "sum_x", sum_x2: str = "sum_x2") -> str:
    """Getis-Ord Gi* z-score, ONE template valid in both Spark SQL and
    DuckDB (the bm25_part_sql discipline): binary disk weights, study
    area = the OCCUPIED cells of the sparse raster.

        z = (S - xbar*w) / (s * SQRT((n*w - w^2) / (n - 1)))

    with xbar/s the mean/population-sd of the occupied-cell values.
    Every operand is a BIGINT cast to DOUBLE (exact while the sums stay
    below 2^53 — the mixture_weights headroom note applies) and the
    operators are +,-,*,/ and SQRT, all IEEE exact-rounded on both
    engines, evaluated in one fixed tree.  Degenerate inputs yield NULL
    instead of garbage: n = 1 (no variance denominator), zero variance
    (constant raster), and w = n (disk covers the whole study area, a
    toy-raster case where the Gi* denominator is 0)."""
    nd = f"CAST({n} AS DOUBLE)"
    xbar = f"(CAST({sum_x} AS DOUBLE) / {nd})"
    var = f"(CAST({sum_x2} AS DOUBLE) / {nd} - {xbar} * {xbar})"
    u = f"(({nd} * CAST({w} AS DOUBLE) - CAST({w} AS DOUBLE) * CAST({w} AS DOUBLE)) / ({nd} - 1.0e0))"
    return (f"CASE WHEN {n} > 1 AND {var} > 0.0e0 AND {w} < {n} THEN "
            f"(CAST({S} AS DOUBLE) - {xbar} * CAST({w} AS DOUBLE)) / "
            f"(SQRT({var}) * SQRT({u})) ELSE NULL END")
