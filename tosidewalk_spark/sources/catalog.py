"""G1: Iceberg-style table catalog abstraction.

Production target is an Iceberg catalog (`spark.read.format('iceberg')`)
per BASELINE.json:16; this sandbox has no Iceberg jar and no network
(SURVEY.md §1.2), so the same interface is backed by partitioned Parquet
plus JSON manifests capturing each snapshot's schema, partition spec and
file listing — the pieces of the Iceberg metadata model the engine relies
on: immutable data files, snapshot isolation at the manifest level,
APPEND as a new snapshot referencing prior files, and TIME TRAVEL by
reading an older manifest.

Layout per table:
    <root>/<name>/snap-<n>/...parquet      immutable data of snapshot n
    <root>/<name>/_manifest-<n>.json       manifest of snapshot n
    <root>/<name>/_manifest.json           current-pointer (copy of latest)

Swap in production: replace this class with thin
`spark.read.format('iceberg').option('snapshot-id', ...)` calls — every
caller goes through ``Catalog.load`` and is agnostic to the backend.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Minimal table catalog: name -> path, manifest-tracked snapshots,
    append + time travel."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str, snapshot_id: int | None = None) -> str:
        fn = "_manifest.json" if snapshot_id is None else f"_manifest-{snapshot_id}.json"
        return os.path.join(self._dir(name), fn)

    def _snap_files(self, name: str, snap: str) -> list[str]:
        path = self._dir(name)
        out = []
        for dirpath, _, fnames in os.walk(os.path.join(path, snap)):
            out.extend(os.path.relpath(os.path.join(dirpath, f), path)
                       for f in fnames if f.endswith(".parquet"))
        return sorted(out)

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
              mode: str = "overwrite", extra: dict | None = None) -> dict:
        """Write a new snapshot.  `overwrite` starts a fresh file lineage;
        `append` adds a snap dir and carries the parent's dirs forward —
        the parent snapshot stays readable (immutable files, Iceberg-style).
        ``extra`` fields merge into the manifest BEFORE it publishes (so
        e.g. compaction lineage is atomic with the snapshot, not a second
        non-atomic re-publish — review r4).  Returns the new manifest."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        parent = None
        if os.path.exists(self._manifest(name)):
            parent = self.manifest(name)
        # allocate from MAX(existing snapshot manifests) + 1, not
        # parent + 1: a crash between publishing _manifest-<n>.json and
        # updating the current pointer leaves the pointer stale, and
        # parent+1 would reuse id n and silently overwrite the orphaned —
        # supposedly immutable — snapshot (ADVICE.md r3)
        ids = self._snapshot_ids(name)
        snap_id = 0 if not ids else ids[-1] + 1
        snap = f"snap-{snap_id}"
        path = self._dir(name)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(path, snap))
        dirs = [snap]
        if mode == "append" and parent is not None:
            if (partition_by or []) != parent["partition_spec"]:
                raise ValueError("append must keep the parent partition spec")
            dirs = parent["snap_dirs"] + [snap]
        manifest = {
            "table": name,
            "snapshot_id": snap_id,
            "parent_id": None if parent is None or mode == "overwrite"
                         else parent["snapshot_id"],
            "snapshot_ts": time.time(),
            "schema": df.schema.jsonValue(),
            "partition_spec": partition_by or [],
            "snap_dirs": dirs,
            "files": sorted(f for d in dirs for f in self._snap_files(name, d)),
        }
        clash = set(extra or {}) & set(manifest)
        if clash:
            # an extra key shadowing a core field would publish a manifest
            # whose id/file-listing disagrees with what was written —
            # corrupt at read time with no error at write time (review r4)
            raise ValueError(f"extra keys collide with manifest fields: {sorted(clash)}")
        manifest.update(extra or {})
        tmp = self._manifest(name, snap_id) + ".inprogress"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest(name, snap_id))
        with open(self._manifest(name) + ".inprogress", "w") as fh:
            json.dump(manifest, fh)
        os.replace(self._manifest(name) + ".inprogress", self._manifest(name))
        return manifest

    def load(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        """Read the current snapshot, or TIME-TRAVEL to `snapshot_id`.
        Each snap dir is a self-contained partitioned dataset, so partition
        columns and pruning survive; multi-dir snapshots union by name."""
        man = self.manifest(name, snapshot_id)
        path = self._dir(name)
        dfs = [self.spark.read.parquet(os.path.join(path, d))
               for d in man["snap_dirs"]]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def manifest(self, name: str, snapshot_id: int | None = None) -> dict:
        with open(self._manifest(name, snapshot_id)) as fh:
            return json.load(fh)

    def _snapshot_ids(self, name: str) -> list[int]:
        path = self._dir(name)
        if not os.path.isdir(path):
            return []
        return sorted(int(f[len("_manifest-"):-len(".json")])
                      for f in os.listdir(path)
                      if f.startswith("_manifest-") and f.endswith(".json"))

    def snapshots(self, name: str) -> list[dict]:
        """All manifests of a table, snapshot_id ascending."""
        return [self.manifest(name, i) for i in self._snapshot_ids(name)]

    def tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(self._manifest(d)))

    def compact(self, name: str) -> dict:
        """Snapshot COMPACTION (Iceberg's rewrite_data_files analog): fold
        the current snapshot's multi-dir append chain into ONE new snap
        dir and publish it as the next snapshot.  Append chains grow one
        dir (and its small files) per nightly batch; at 100 TB the
        accumulated small files dominate scan planning time, so periodic
        compaction is part of table maintenance, not an optimization.

        The rewrite is a normal snapshot write: prior snapshots keep
        their manifests and immutable files, so TIME TRAVEL to
        pre-compaction snapshots still works; only the CURRENT pointer
        moves to the single-dir layout.  Readers of the current snapshot
        see identical rows (Spark re-writes through the same partition
        spec).  The manifest records ``compacted_from`` for lineage —
        merged in BEFORE the snapshot publishes, so a crash can never
        leave a published compaction without its lineage field."""
        parent = self.manifest(name)
        df = self.load(name)
        return self.write(name, df, partition_by=parent["partition_spec"] or None,
                          mode="overwrite",
                          extra={"compacted_from": parent["snapshot_id"]})
