"""G1: Iceberg-style table catalog abstraction.

Production target is an Iceberg catalog (`spark.read.format('iceberg')`)
per BASELINE.json:16; this sandbox has no Iceberg jar and no network
(SURVEY.md §1.2), so the same interface is backed by partitioned Parquet
plus a JSON manifest capturing the snapshot's schema, partition spec and
file listing — the pieces of the Iceberg metadata model the engine relies
on (snapshot isolation at the manifest level, partition pruning keys).

Swap in production: replace PartitionedParquetTable with a thin
`spark.read.format('iceberg').load(name)` — every caller goes through
``Catalog.load`` and is agnostic to the backend.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Minimal table catalog: name -> path, manifest-tracked snapshots."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self._dir(name), "_manifest.json")

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        path = self._dir(name)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        files = []
        for dirpath, _, fnames in os.walk(path):
            files.extend(os.path.relpath(os.path.join(dirpath, f), path)
                         for f in fnames if f.endswith(".parquet"))
        manifest = {
            "table": name,
            "snapshot_ts": time.time(),
            "schema": df.schema.jsonValue(),
            "partition_spec": partition_by or [],
            "files": sorted(files),
        }
        with open(self._manifest(name), "w") as fh:
            json.dump(manifest, fh)

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(name))

    def manifest(self, name: str) -> dict:
        with open(self._manifest(name)) as fh:
            return json.load(fh)

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(self._manifest(d)))
