"""Deduplication operators for large-scale training-data pipelines —
first-class graft components alongside the spatial stages.

All hashing is the shared polynomial hash (kernel.cells.hash63 ==
sqlfns.polyhash_*), computed JVM-side with array lambdas (whole-stage
codegen, no Python in the hot path), so every operator here has an exact
DuckDB oracle twin.

Scale notes: each dedup is a hash-partitioned groupBy/self-join on a
derived key (text hash, minhash band, simhash bucket) — uniform keys by
construction, map-side combine on the aggregations; LSH candidate pairs
are bounded by band-bucket sizes, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import sqlfns

# fixed affine permutations for minhash: (a_k * h + b_k) % P
MINHASH_PERMS = [(1 + 2 * k, 12289 + 7 * k * k) for k in range(16)]
LSH_BANDS = 4  # 16 minhashes -> 4 bands of 4


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's core count when the input arrives in
    fewer partitions (e.g. one small parquet file) so CPU-heavy per-row
    derivations parallelize; a no-op at real data scale where the scan
    already yields >= cores partitions."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def _tokens(col: str = "text") -> str:
    return f"FILTER(SPLIT({col}, ' '), t -> LENGTH(t) > 0)"


def _token_hashes(col: str = "text") -> str:
    """array<bigint> of per-token polynomial hashes (distinct tokens)."""
    return (f"TRANSFORM(ARRAY_DISTINCT({_tokens(col)}), t -> "
            + sqlfns.polyhash_spark("t") + ")")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: hash-groupBy on full text; returns one row
    per text with the canonical (min) doc_id and the duplicate count."""
    return (docs.groupBy("text")
            .agg(F.min("doc_id").alias("canonical_doc_id"),
                 F.count("*").alias("n_dupes"))
            .select("canonical_doc_id", "n_dupes"))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """16-permutation minhash signature per document over distinct-token
    hashes — array<bigint> column 'sig'.  The token-hash array is
    materialized ONCE as a column before the 16 permutation mins (inlining
    it would make Catalyst evaluate the per-char hash fold 16x)."""
    th_col = _spread(docs).select("doc_id", F.expr(_token_hashes()).alias("th"))
    sig = F.array(*[F.expr(sqlfns.minhash_spark("th", a, b)) for a, b in MINHASH_PERMS])
    return th_col.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs: band the signature
    (4 bands x 4 rows), bucket-join on (band_no, band signature), emit
    doc pairs sharing >= 1 band.  Returns (doc_a, doc_b, n_bands)."""
    sigs = minhash_signatures(docs)
    r = len(MINHASH_PERMS) // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.expr(f"CONCAT_WS(',', TRANSFORM(SLICE(sig, {b * r + 1}, {r}), x -> CAST(x AS STRING)))")
            for b in range(LSH_BANDS)])).alias("band_no", "band_sig"))
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_no", "band_sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_no", "band_sig")
    return (a.join(b, ["band_no", "band_sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_bands")))


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash fingerprint over distinct-token hashes: bit b of the
    fingerprint is 1 iff more token hashes have bit b set than not.
    Pure SQL (aggregate over a sequence of bit positions); the token-hash
    array is materialized once, not re-derived per bit."""
    fp = (
        f"AGGREGATE(SEQUENCE(0, {bits - 1}), CAST(0 AS BIGINT), (acc, b) -> "
        f"acc + CASE WHEN AGGREGATE(th, CAST(0 AS BIGINT), "
        f"(s, h) -> s + CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)")
    return _spread(docs).select("doc_id", F.expr(_token_hashes()).alias("th")) \
               .select("doc_id", F.expr(fp).alias("simhash"))


def simhash_dup_pairs(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Documents with IDENTICAL simhash fingerprints (bucket join on the
    fingerprint — the scalable degenerate case of hamming-radius search)."""
    s = simhash(docs, bits)
    a = s.select(F.col("doc_id").alias("doc_a"), "simhash")
    b = s.select(F.col("doc_id").alias("doc_b"), "simhash")
    return a.join(b, "simhash").filter(F.col("doc_a") < F.col("doc_b")) \
            .select("doc_a", "doc_b", "simhash")


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  length_band_pct: float = 0.5) -> DataFrame:
    """Word-level Jaccard near-dup pairs above ``threshold``.

    Candidate generation buckets by (lang, token-count band) so the
    self-join is an equi-join; the exact |A n B| / |A u B| runs as array
    intersection JVM-side.  Jaccard is rounded to 6 decimals for stable
    cross-engine comparison."""
    toks = _spread(docs).select(
        "doc_id", "lang",
        F.expr(f"ARRAY_SORT(ARRAY_DISTINCT({_tokens()}))").alias("toks"))
    toks = toks.withColumn("nt", F.size("toks"))
    # length band: |A n B| >= t*|A u B| requires |B| within [t*|A|, |A|/t]
    band = F.explode(F.sequence(
        F.floor(F.log2(F.col("nt") * F.lit(threshold))).cast("int"),
        F.floor(F.log2(F.col("nt") / F.lit(threshold))).cast("int")))
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("lang"),
                    F.col("toks").alias("toks_a"), F.col("nt").alias("nt_a"),
                    F.floor(F.log2("nt")).cast("int").alias("band"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("lang"),
                    F.col("toks").alias("toks_b"), F.col("nt").alias("nt_b"),
                    band.alias("band"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.col("nt_a") + F.col("nt_b") - F.col("inter")
    return (a.join(b, ["lang", "band"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("inter", inter)
            .withColumn("jaccard", F.round(F.col("inter") / union, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def embedding_neardup_pairs(emb: DataFrame, cos_threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within the same label bucket
    (label acts as the coarse LSH bucket; brute force within bucket).
    Dot products via zip_with/aggregate — JVM-side, no UDF."""
    e = _spread(emb).select(
        "vec_id", "label",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    e = e.withColumn("norm", F.expr(
        "SQRT(AGGREGATE(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
    a = e.select(F.col("vec_id").alias("vec_a"), "label",
                 F.col("v").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), "label",
                 F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.expr("AGGREGATE(ZIP_WITH(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    return (a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
            .filter(F.col("cosine") >= cos_threshold)
            .select("vec_a", "vec_b", "label", "cosine"))
