"""JSONL source/sink — the de-facto interchange format for LLM training
corpora (one JSON object per line; what tokenizer/trainer toolchains and
public corpus releases consume and publish).

Both directions are Spark-NATIVE (`DataFrameWriter.json` /
`DataFrameReader.json`), so at 100 TB they inherit the text-file scan's
line-splittable parallelism, predicate/column handling at the parse layer,
and the committer's atomic output protocol — unlike the WARC container,
nothing custom is needed here; the module exists to pin the two decisions
that go wrong at scale:

1. **Never infer the schema.** `spark.read.json(path)` without an explicit
   schema runs a FULL extra pass over the input just to sample types —
   at 100 TB that silently doubles the job.  `scan_jsonl` requires the
   schema (defaulting to DOCS_SCHEMA) and sets FAILFAST so a corrupt line
   kills the task loudly instead of materializing as a row of NULLs
   (PERMISSIVE's default) that would flow into dedup/quality stages as a
   fake empty document.
2. **Deterministic shard layout.** `write_jsonl` hash-repartitions on a
   key and sorts within each shard, so output file CONTENT is reproducible
   at any parallelism (the same property the WARC sink and global_shuffle
   pin); gzip-free by default because .json.gz is not splittable — at
   scale you want many plain shards, compressed by parquet/zstd only once
   the data re-enters the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("text", T.StringType()),
])


def write_jsonl(df: DataFrame, path: str, shards: int = 32,
                key: str = "doc_id") -> None:
    """Write ``df`` as ``shards`` deterministic JSONL files under ``path``.
    Hash-repartition on ``key`` + in-shard sort makes each file's contents
    a pure function of the data, independent of input partitioning."""
    (df.repartition(shards, key)
       .sortWithinPartitions(key)
       .write.mode("overwrite").json(path))


def scan_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCS_SCHEMA) -> DataFrame:
    """Read JSONL with an EXPLICIT schema (no inference pass) and FAILFAST
    corruption handling — a malformed line is a loud task failure, not a
    silent NULL row."""
    return (spark.read.schema(schema)
            .option("mode", "FAILFAST")
            .json(path))
