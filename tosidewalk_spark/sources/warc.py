"""G1b: WARC source/sink — Common Crawl's native container format
(ISO 28500 / WARC 1.0, public spec).  The north star's input is a
"Common-Crawl-style web pages" table [BASELINE.json:16]; real Common Crawl
ships as ~100k WARC segment files of ~1 GB, so the cluster-scale read
strategy is FILE-GRAINED parallelism: one file = one task, zero shuffle —
`spark.read.format("binaryFile")` over the segment glob, then a
mapInPandas shredder per file.  (WARC has no splittable compression; the
whole industry processes it per-file, which is exactly the partitioning
binaryFile gives us.  At 100 TB that is ~100k tasks over any executor
count — ideal elasticity, no custom InputFormat needed.)

Record framing is length-prefixed (Content-Length header), NOT delimiter
scanning — a page body containing the literal string "WARC/1.0" must not
break parsing (tested).  Non-`response` records (warcinfo, request,
metadata) are skipped, like every production CC reader.

Sink: `write_warc` is a distributed writer — repartition by url hash, one
deterministic .warc shard per partition via mapInPandas (rows sorted by
url inside the shard so file bytes are reproducible at any parallelism),
returning a manifest DataFrame (path, n_records, n_bytes) the caller
materializes.  That makes the sink resumable/verifiable the same way the
G1 catalog manifest is.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
])

_MANIFEST_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("n_records", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])


# ---------------------------------------------------------------- serialize

def record_bytes(url: str, ts_iso: str, body: bytes) -> bytes:
    """One WARC `response` record: WARC headers + an HTTP/1.1 response
    block as the payload, Content-Length-framed at both layers."""
    http = (b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=UTF-8" + _CRLF
            + b"Content-Length: " + str(len(body)).encode() + _CRLF
            + _CRLF + body)
    hdr = (WARC_VERSION + _CRLF
           + b"WARC-Type: response" + _CRLF
           + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
           + b"WARC-Date: " + ts_iso.encode() + _CRLF
           + b"Content-Type: application/http; msgtype=response" + _CRLF
           + b"Content-Length: " + str(len(http)).encode() + _CRLF
           + _CRLF)
    return hdr + http + _CRLF + _CRLF


def warcinfo_bytes(shard: str) -> bytes:
    info = (b"software: tosidewalk-spark warc sink" + _CRLF
            + b"shard: " + shard.encode() + _CRLF)
    hdr = (WARC_VERSION + _CRLF
           + b"WARC-Type: warcinfo" + _CRLF
           + b"Content-Type: application/warc-fields" + _CRLF
           + b"Content-Length: " + str(len(info)).encode() + _CRLF
           + _CRLF)
    return hdr + info + _CRLF + _CRLF


# ------------------------------------------------------------------- parse

def iter_records(blob: bytes):
    """Yield (headers: dict[bytes, bytes], payload: bytes) per record.
    Length-prefixed walk: after each record, skip exactly Content-Length
    bytes — payload content can never be mistaken for a record boundary."""
    i = 0
    n = len(blob)
    while i < n:
        if not blob.startswith(WARC_VERSION, i):
            # tolerate trailing garbage / inter-record padding: resync to
            # the next record marker (absent in well-formed files)
            j = blob.find(_CRLF + _CRLF + WARC_VERSION, i)
            if j < 0:
                return
            i = j + 4
            continue
        hdr_end = blob.find(_CRLF + _CRLF, i)
        if hdr_end < 0:
            return
        headers = {}
        for line in blob[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        clen_raw = headers.get(b"content-length", b"0").strip()
        if not clen_raw.isdigit():
            # malformed Content-Length: skip the record and resync to the
            # next record marker, matching the URI-less/garbage tolerance
            # above instead of raising and killing the whole file's batch
            # (ADVICE.md r3)
            j = blob.find(_CRLF + _CRLF + WARC_VERSION, hdr_end)
            if j < 0:
                return
            i = j + 4
            continue
        clen = int(clen_raw)
        payload = blob[hdr_end + 4:hdr_end + 4 + clen]
        yield headers, payload
        i = hdr_end + 4 + clen + 4  # skip the two record-terminating CRLFs


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response header block from a response payload."""
    k = payload.find(_CRLF + _CRLF)
    return payload[k + 4:] if k >= 0 else payload


# -------------------------------------------------------------------- scan

def scan_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC glob -> pages(url, warc_ts, html).  binaryFile gives one input
    split per .warc file (the CC-standard parallelism grain); the shredder
    runs once per file inside an Arrow batch.  Filter pushdown happens at
    the FILE level (pathGlobFilter / modifiedAfter options upstream);
    row-level predicates apply post-shred as normal Catalyst filters."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc")
             .load(path_glob)
             .select("path", "content"))

    def run(it):
        for pdf in it:
            urls, tss, bodies = [], [], []
            for blob in pdf["content"]:
                for headers, payload in iter_records(bytes(blob)):
                    if headers.get(b"warc-type") != b"response":
                        continue
                    uri = headers.get(b"warc-target-uri")
                    if uri is None:  # malformed record: skip, don't kill the task
                        continue
                    urls.append(uri.decode("utf-8"))
                    tss.append(headers.get(b"warc-date", b"").decode("ascii"))
                    bodies.append(_http_body(payload))
            # ISO8601 parse: real archives carry fractional seconds (legal
            # in WARC 1.1) which a strict %H:%M:%SZ format would reject;
            # errors="coerce" turns an unparseable date into NaT instead of
            # failing the whole file's batch.
            ts = pd.to_datetime(pd.Series(tss, dtype="object"),
                                format="ISO8601", utc=True, errors="coerce")
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": ts.dt.tz_localize(None) if len(ts) else ts,
                "html": pd.Series(bodies, dtype="object")})

    return files.mapInPandas(run, PAGES_SCHEMA)


def pages_from_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Full input-hint pages schema (url, warc_ts, html, text, lang):
    WARC scan -> G2 byte-identity extractor -> n-gram lang id."""
    from ..operators import text as TX
    raw = scan_warc(spark, path_glob)
    extracted = TX.extract_text(raw)
    scored = TX.lang_id(extracted.select(
        F.col("url").alias("doc_id"),
        F.lit(None).cast("string").alias("lang"), "text"))
    langs = scored.select(F.col("doc_id").alias("url"),
                          F.col("lang_pred").alias("lang"))
    return (raw.join(extracted, "url").join(langs, "url")
            .select("url", "warc_ts", "html", "text", "lang"))


# -------------------------------------------------------------------- sink

def write_warc(pages: DataFrame, out_dir: str, shards: int = 8) -> DataFrame:
    """Distributed WARC sink: hash-repartition by url into `shards`
    writer tasks; each writes ONE deterministic shard (rows sorted by url
    inside the shard, so bytes are identical at any parallelism) and emits
    a manifest row.  The caller materializes the returned manifest — the
    write happens task-side, no driver collect.

    LOCAL-MODE PRIMITIVE: shards are written with plain ``open()`` to
    ``out_dir``, which is only a SHARED path in local mode or on a
    cluster whose executors mount a common filesystem (NFS/FUSE).  For
    the cluster-correct sink use ``write_warc_committed`` below (VERDICT
    r4 #5): attempt-unique task writes + a driver-side atomic commit
    through the JVM Hadoop FileSystem API — partitioning, per-shard
    determinism and the manifest contract are identical."""
    os.makedirs(out_dir, exist_ok=True)

    def run(it):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        rows = [pdf for pdf in it if len(pdf)]
        name = f"part-{pid:05d}.warc"
        path = os.path.join(out_dir, name)
        if not rows:
            yield pd.DataFrame({"path": [], "n_records": [], "n_bytes": []})
            return
        allr = pd.concat(rows).sort_values("url")
        buf = [warcinfo_bytes(name)]
        for r in allr.itertuples():
            ts_iso = pd.Timestamp(r.warc_ts).strftime("%Y-%m-%dT%H:%M:%SZ")
            buf.append(record_bytes(r.url, ts_iso, bytes(r.html)))
        blob = b"".join(buf)
        tmp = path + ".inprogress"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish, same as the catalog sink
        yield pd.DataFrame({"path": [path], "n_records": [len(allr)],
                            "n_bytes": [len(blob)]})

    cols = pages.select("url", "warc_ts", "html")
    return cols.repartition(shards, "url").mapInPandas(run, _MANIFEST_SCHEMA)


def write_warc_committed(pages: DataFrame, out_dir: str,
                         shards: int = 8) -> list:
    """Cluster-correct WARC sink (VERDICT r4 #5 — fills the filesystem
    seam): the v1 OutputCommitter pattern over the same shard writer.

    Two stages, split exactly where PySpark's architecture splits:

    1. TASK side (distributed, python workers): each writer task builds
       its deterministic shard bytes (identical to ``write_warc``) and
       writes them to an ATTEMPT-UNIQUE temp file
       ``_temporary/part-NNNNN-attempt-K.warc``.  Python workers have no
       JVM gateway, so raw bytes physically leave a task either through
       a locally-reachable path (local mode, NFS/FUSE mounts — the
       built-in ``open``) or a python filesystem client (fsspec/boto3 —
       the documented swap for object stores).  Attempt-unique names
       make speculative / retried tasks safe: losers are never renamed.

    2. DRIVER side (O(shards) metadata ops only, no data through the
       driver): each winning temp shard is published with ONE atomic
       ``rename`` through the JVM Hadoop FileSystem API
       (``org.apache.hadoop.fs.FileSystem.get(uri, hadoopConf)``), which
       resolves any scheme Spark itself can write to (file://, hdfs://,
       s3a://...) with that filesystem's rename semantics — the same
       commit mechanism Spark's own FileOutputCommitter uses.  The
       ``_temporary`` dir is removed through the same API afterwards.

    Materializes the manifest (one row per shard — a documented small
    driver action, same class as the catalog merge guard) and returns
    the committed rows with final paths."""
    spark = pages.sparkSession
    tmp_rel = "_temporary"
    os.makedirs(os.path.join(out_dir, tmp_rel), exist_ok=True)

    def run(it):
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid, att = tc.partitionId(), tc.taskAttemptId()
        rows = [pdf for pdf in it if len(pdf)]
        if not rows:
            yield pd.DataFrame({"path": [], "n_records": [], "n_bytes": []})
            return
        name = f"part-{pid:05d}.warc"
        allr = pd.concat(rows).sort_values("url")
        buf = [warcinfo_bytes(name)]
        for r in allr.itertuples():
            ts_iso = pd.Timestamp(r.warc_ts).strftime("%Y-%m-%dT%H:%M:%SZ")
            buf.append(record_bytes(r.url, ts_iso, bytes(r.html)))
        blob = b"".join(buf)
        tmp = os.path.join(out_dir, tmp_rel, f"part-{pid:05d}-attempt-{att}.warc")
        with open(tmp, "wb") as f:  # the python-side byte seam (see above)
            f.write(blob)
        yield pd.DataFrame({"path": [tmp], "n_records": [len(allr)],
                            "n_bytes": [len(blob)]})

    manifest = (pages.select("url", "warc_ts", "html")
                .repartition(shards, "url")
                .mapInPandas(run, _MANIFEST_SCHEMA).collect())
    # driver-side commit through the JVM Hadoop FileSystem
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        HPath(out_dir).toUri(), conf)
    committed = []
    for row in sorted(manifest, key=lambda r: r.path):
        base = os.path.basename(row.path).split("-attempt-")[0] + ".warc"
        final = os.path.join(out_dir, base)
        if not fs.rename(HPath(row.path), HPath(final)):
            raise IOError(f"Hadoop FS rename failed: {row.path} -> {final}")
        committed.append({"path": final, "n_records": row.n_records,
                          "n_bytes": row.n_bytes})
    fs.delete(HPath(os.path.join(out_dir, tmp_rel)), True)
    return committed
