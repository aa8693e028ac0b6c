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
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_JSONABLE = (int, float, str, bool)


def _coerce_part_value(v: str):
    """Hive partition path values are strings; recover int/float when the
    text round-trips exactly so stats-pruning compares like types."""
    for t in (int, float):
        try:
            if str(t(v)) == v:
                return t(v)
        except ValueError:
            pass
    return v


def _cmp_lt(a, b) -> bool | None:
    """a < b when the two are comparable (num/num or str/str); None =
    unknown type mix -> caller must NOT prune on it."""
    num = lambda x: isinstance(x, (int, float)) and not isinstance(x, bool)
    if num(a) and num(b):
        return a < b
    if isinstance(a, str) and isinstance(b, str):
        return a < b
    return None


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _range_pred(ranges: dict) -> str | None:
    """Conjunctive closed-interval predicate (ANSI, runs on both engines);
    None when every bound is open."""
    parts = []
    for col, (lo, hi) in sorted(ranges.items()):
        if lo is not None:
            parts.append(f"{col} >= {_sql_lit(lo)}")
        if hi is not None:
            parts.append(f"{col} <= {_sql_lit(hi)}")
    return " AND ".join(parts) if parts else None


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

    def _next_snap_id(self, name: str) -> int:
        # allocate from MAX(existing snapshot manifests) + 1, not
        # parent + 1: a crash between publishing _manifest-<n>.json and
        # updating the current pointer leaves the pointer stale, and
        # parent+1 would reuse id n and silently overwrite the orphaned —
        # supposedly immutable — snapshot (ADVICE.md r3)
        ids = self._snapshot_ids(name)
        return 0 if not ids else ids[-1] + 1

    def _publish(self, name: str, manifest: dict, extra: dict | None) -> dict:
        clash = set(extra or {}) & set(manifest)
        if clash:
            # an extra key shadowing a core field would publish a manifest
            # whose id/file-listing disagrees with what was written —
            # corrupt at read time with no error at write time (review r4)
            raise ValueError(f"extra keys collide with manifest fields: {sorted(clash)}")
        manifest.update(extra or {})
        snap_id = manifest["snapshot_id"]
        tmp = self._manifest(name, snap_id) + ".inprogress"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest(name, snap_id))
        with open(self._manifest(name) + ".inprogress", "w") as fh:
            json.dump(manifest, fh)
        os.replace(self._manifest(name) + ".inprogress", self._manifest(name))
        return manifest

    def _collect_stats(self, name: str, relpaths: list[str]) -> dict:
        """Per-file row count + column min/max/null-count, lifted from the
        parquet FOOTERS (metadata-only — no data pass) plus hive partition
        path segments.  This is the Iceberg manifest-metrics analog; in
        production the writer tasks emit these with the data files, here the
        driver reads footers after the write (footer reads are O(files) tiny
        metadata IO, the same cost profile as Iceberg's manifest scan).
        Only int/float/str/bool stats are kept (JSON-safe, comparable on
        both engines); columns whose chunks lack stats are omitted."""
        import pyarrow.parquet as pq
        path = self._dir(name)
        out = {}
        for rel in relpaths:
            md = pq.ParquetFile(os.path.join(path, rel)).metadata
            names = [md.schema.column(c).name for c in range(md.num_columns)]
            mins: dict = {}
            maxs: dict = {}
            nulls: dict = {}
            bad: set = set()
            for rg in range(md.num_row_groups):
                for c, nm in enumerate(names):
                    st = md.row_group(rg).column(c).statistics
                    if (st is None or not st.has_min_max
                            or not isinstance(st.min, _JSONABLE)
                            or not isinstance(st.max, _JSONABLE)):
                        bad.add(nm)
                        continue
                    mins[nm] = st.min if nm not in mins else min(mins[nm], st.min)
                    maxs[nm] = st.max if nm not in maxs else max(maxs[nm], st.max)
                    nulls[nm] = nulls.get(nm, 0) + (st.null_count or 0)
            for nm in bad:
                mins.pop(nm, None)
                maxs.pop(nm, None)
                nulls.pop(nm, None)
            for seg in rel.split("/"):
                if "=" in seg:  # hive partition dir: exact single value
                    k, v = seg.split("=", 1)
                    mins[k] = maxs[k] = _coerce_part_value(v)
                    nulls[k] = 0
            out[rel] = {"rows": md.num_rows, "min": mins, "max": maxs,
                        "nulls": nulls}
        return out

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
              mode: str = "overwrite", extra: dict | None = None,
              zorder_by: tuple[str, str] | None = None,
              target_files: int = 16) -> dict:
        """Write a new snapshot.  `overwrite` starts a fresh file lineage;
        `append` adds a snap dir and carries the parent's FILES forward —
        the parent snapshot stays readable (immutable files, Iceberg-style).
        ``extra`` fields merge into the manifest BEFORE it publishes (so
        e.g. compaction lineage is atomic with the snapshot, not a second
        non-atomic re-publish — review r4).

        ``zorder_by=(icol, jcol)``: range-partition + sort the rows by the
        Morton key of the two non-negative integer columns into
        ``target_files`` output tasks before writing.  Each file then covers
        a compact 2-D block of the (i, j) lattice, so the per-file min/max
        stats this method records make ``scan`` rectangle predicates skip
        most files — the data-layout half of Iceberg-style metadata pruning.

        PRECONDITION (ADVICE r4): both z-order columns must be < 2**16 —
        zorder_sql interleaves only the low 16 bits, so larger coordinates
        collide in the Morton key and the layout is quietly useless (the
        scan stays CORRECT because it re-applies the residual filter, but
        no file gets skipped).  Enforced after the write from the parquet
        footer max stats this method collects anyway: a violating write
        raises instead of publishing.  Returns the new manifest."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        parent = None
        if os.path.exists(self._manifest(name)):
            parent = self.manifest(name)
        snap_id = self._next_snap_id(name)
        snap = f"snap-{snap_id}"
        path = self._dir(name)
        if zorder_by is not None:
            from ..functions import sqlfns
            zk = F.expr(sqlfns.zorder_sql(zorder_by[0], zorder_by[1]))
            # range-partition on the z-key: file boundaries come from a
            # sampled sort, so LAYOUT varies run-to-run but content and
            # every scan() result are layout-independent
            df = (df.repartitionByRange(target_files, zk)
                    .sortWithinPartitions(zk))
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(path, snap))
        new_files = self._snap_files(name, snap)
        dirs = [snap]
        files = list(new_files)
        stats = self._collect_stats(name, new_files)
        if zorder_by is not None:
            # loud guard instead of a quietly useless layout: zorder_sql
            # drops bits above bit 15, so coords >= 2**16 collide in the
            # Morton key (ADVICE r4).  Footer max stats are already in
            # hand — metadata-only check, no extra data pass.
            for col in zorder_by:
                worst = max((fs.get("max", {}).get(col, 0)
                             for fs in stats.values()), default=0)
                if isinstance(worst, int) and worst >= 1 << 16:
                    raise ValueError(
                        f"zorder_by column {col!r} has max {worst} >= 2**16; "
                        f"zorder_sql interleaves 16 bits per axis, so this "
                        f"layout would not skip any files — rescale the "
                        f"coordinates or z-order a coarser derived column")
        if mode == "append" and parent is not None:
            if (partition_by or []) != parent["partition_spec"]:
                raise ValueError("append must keep the parent partition spec")
            dirs = parent["snap_dirs"] + [snap]
            # carry the parent's FILE LIST, not its dirs: after a COW
            # merge/delete the parent references a subset of its dirs'
            # files, and dir-walking would resurrect the rewritten ones
            files = parent["files"] + new_files
            stats = {**parent.get("file_stats", {}), **stats}
        manifest = {
            "table": name,
            "snapshot_id": snap_id,
            "parent_id": None if parent is None or mode == "overwrite"
                         else parent["snapshot_id"],
            "snapshot_ts": time.time(),
            "schema": df.schema.jsonValue(),
            "partition_spec": partition_by or [],
            "snap_dirs": dirs,
            "files": sorted(files),
            "file_stats": stats,
        }
        return self._publish(name, manifest, extra)

    def _read_files(self, name: str, relpaths: list[str], man: dict) -> DataFrame:
        """Read an explicit file list.  Files group by their snap dir, each
        group reads with basePath=<snap dir> so hive partition columns
        survive; Catalyst still partition-prunes and row-group-prunes within
        the listed files.  Empty list -> empty DataFrame with the snapshot
        schema (a fully-pruned scan is a valid plan, not an error)."""
        if not relpaths:
            schema = StructType.fromJson(man["schema"])
            return self.spark.createDataFrame([], schema)
        path = self._dir(name)
        by_dir: dict[str, list[str]] = {}
        for rel in sorted(relpaths):
            by_dir.setdefault(rel.split("/", 1)[0], []).append(rel)
        out = None
        for d, rels in sorted(by_dir.items()):
            df = (self.spark.read.option("basePath", os.path.join(path, d))
                  .parquet(*[os.path.join(path, r) for r in rels]))
            out = df if out is None else out.unionByName(df)
        return out

    def load(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        """Read the current snapshot, or TIME-TRAVEL to `snapshot_id`.
        Reads the manifest's FILE LIST (not its dirs): after a copy-on-write
        merge/delete a snapshot references only the surviving subset of its
        parents' files, and dir-walking would resurrect rewritten rows."""
        man = self.manifest(name, snapshot_id)
        return self._read_files(name, man["files"], man)

    def plan_scan(self, name: str, ranges: dict,
                  snapshot_id: int | None = None) -> dict:
        """Metadata-only scan planning (Iceberg manifest-pruning analog):
        ``ranges`` is {col: (lo, hi)} with closed inclusive bounds (None =
        open side).  A file is skipped when its recorded min/max prove no
        row can satisfy some conjunct; files lacking stats for a column are
        conservatively kept.  Returns the kept file list + counts — at
        100 TB this planning step touches only the manifest JSON, never the
        data, which is exactly why a selective predicate over a Z-ordered
        layout costs a handful of file reads instead of a full-table scan."""
        man = self.manifest(name, snapshot_id)
        stats = man.get("file_stats", {})
        kept = []
        for f in man["files"]:
            fs = stats.get(f)
            keep = True
            if fs:
                for col, (lo, hi) in ranges.items():
                    mn = fs["min"].get(col)
                    mx = fs["max"].get(col)
                    if mn is None or mx is None:
                        continue
                    if lo is not None and _cmp_lt(mx, lo):
                        keep = False
                        break
                    if hi is not None and _cmp_lt(hi, mn):
                        keep = False
                        break
            if keep:
                kept.append(f)
        return {"files_total": len(man["files"]), "files_kept": kept,
                "files_pruned": len(man["files"]) - len(kept)}

    def scan(self, name: str, ranges: dict,
             snapshot_id: int | None = None) -> DataFrame:
        """File-skipping read: prune via ``plan_scan`` then apply the SAME
        range predicate as a residual filter (pruning is a superset
        guarantee, the filter is the correctness boundary — rows with NULL
        in a bounded column are excluded, standard SQL WHERE semantics)."""
        man = self.manifest(name, snapshot_id)
        plan = self.plan_scan(name, ranges, snapshot_id)
        df = self._read_files(name, plan["files_kept"], man)
        pred = _range_pred(ranges)
        return df.filter(pred) if pred else df

    def merge(self, name: str, updates: DataFrame, key: str) -> dict:
        """Copy-on-write MERGE (Iceberg upsert analog): target rows whose
        ``key`` appears in ``updates`` are replaced, unmatched update rows
        are inserted.  Only files whose key-column stats overlap the
        updates' key range are rewritten; every other file is carried into
        the new snapshot BY REFERENCE — at 100 TB a merge touching one
        day's keys rewrites that day's files, not the table.

        One small driver action (documented): a 1-row aggregate over
        ``updates`` for key bounds + a duplicate/NULL-key guard — the merge
        is ill-defined if two update rows share a key, and that must fail
        loudly before any file is rewritten."""
        man = self.manifest(name)
        b = updates.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi"),
            F.count("*").alias("n"), F.count(key).alias("nk"),
            F.countDistinct(key).alias("nd")).first()
        if b["n"] == 0:
            return man
        if b["nk"] != b["n"]:
            raise ValueError(f"merge updates contain NULL {key} keys")
        if b["nd"] != b["n"]:
            raise ValueError(
                f"merge updates contain duplicate {key} keys "
                f"({b['n']} rows, {b['nd']} distinct) — replace-by-key is "
                f"ill-defined; dedup the updates first")
        stats = man.get("file_stats", {})
        cand, carried = [], []
        for f in man["files"]:
            fs = stats.get(f)
            mn = fs["min"].get(key) if fs else None
            mx = fs["max"].get(key) if fs else None
            disjoint = (mn is not None and mx is not None
                        and (_cmp_lt(mx, b["lo"]) or _cmp_lt(b["hi"], mn)))
            (carried if disjoint else cand).append(f)
        cols = [f["name"] for f in man["schema"]["fields"]]
        kept = (self._read_files(name, cand, man)
                .join(updates.select(key), on=key, how="left_anti"))
        out = kept.select(*cols).unionByName(updates.select(*cols))
        snap_id = self._next_snap_id(name)
        snap = f"snap-{snap_id}"
        path = self._dir(name)
        w = out.write.mode("overwrite")
        if man["partition_spec"]:
            w = w.partitionBy(*man["partition_spec"])
        w.parquet(os.path.join(path, snap))
        new_files = self._snap_files(name, snap)
        manifest = {
            "table": name,
            "snapshot_id": snap_id,
            "parent_id": man["snapshot_id"],
            "snapshot_ts": time.time(),
            "schema": man["schema"],
            "partition_spec": man["partition_spec"],
            "snap_dirs": sorted({r.split("/", 1)[0] for r in carried} | {snap}),
            "files": sorted(carried + new_files),
            "file_stats": {**{f: stats[f] for f in carried if f in stats},
                           **self._collect_stats(name, new_files)},
        }
        return self._publish(name, manifest, {
            "merged_keys": b["n"], "rewritten_files": len(cand),
            "carried_files": len(carried)})

    def delete_where(self, name: str, ranges: dict) -> dict:
        """Copy-on-write DELETE of rows matching a conjunctive range
        predicate.  Three file classes, decided from stats alone:
        fully-matching files (every pred column has stats, zero NULLs, and
        [min,max] inside [lo,hi]) are DROPPED without being read; disjoint
        files are carried by reference; only boundary-straddling files are
        rewritten with the negated predicate (NULL rows survive — a NULL
        bound comparison is not a match, standard DELETE WHERE)."""
        man = self.manifest(name)
        pred = _range_pred(ranges)
        if pred is None:
            return man
        stats = man.get("file_stats", {})
        carried, dropped, rewrite = [], [], []
        for f in man["files"]:
            fs = stats.get(f)
            disjoint = False
            inside = fs is not None
            for col, (lo, hi) in ranges.items():
                mn = fs["min"].get(col) if fs else None
                mx = fs["max"].get(col) if fs else None
                nn = fs["nulls"].get(col) if fs else None
                if mn is None or mx is None:
                    inside = False  # no stats: cannot prove full match
                    continue
                if (lo is not None and _cmp_lt(mx, lo)) or \
                        (hi is not None and _cmp_lt(hi, mn)):
                    disjoint = True
                    break
                # fully-matching needs provable lo <= min AND max <= hi
                # (comparable types: _cmp_lt returning None means unknown)
                # AND zero NULLs (stats ignore NULL rows, which never match)
                if nn is None or nn > 0 \
                        or (lo is not None and _cmp_lt(mn, lo) is not False) \
                        or (hi is not None and _cmp_lt(hi, mx) is not False):
                    inside = False
            if disjoint:
                carried.append(f)
            elif inside:
                dropped.append(f)
            else:
                rewrite.append(f)
        survivors = (self._read_files(name, rewrite, man)
                     .filter(f"NOT COALESCE({pred}, FALSE)"))
        snap_id = self._next_snap_id(name)
        snap = f"snap-{snap_id}"
        path = self._dir(name)
        w = survivors.write.mode("overwrite")
        if man["partition_spec"]:
            w = w.partitionBy(*man["partition_spec"])
        w.parquet(os.path.join(path, snap))
        new_files = self._snap_files(name, snap)
        manifest = {
            "table": name,
            "snapshot_id": snap_id,
            "parent_id": man["snapshot_id"],
            "snapshot_ts": time.time(),
            "schema": man["schema"],
            "partition_spec": man["partition_spec"],
            "snap_dirs": sorted({r.split("/", 1)[0] for r in carried} | {snap}),
            "files": sorted(carried + new_files),
            "file_stats": {**{f: stats[f] for f in carried if f in stats},
                           **self._collect_stats(name, new_files)},
        }
        return self._publish(name, manifest, {
            "deleted_pred": pred, "dropped_files": len(dropped),
            "rewritten_files": len(rewrite), "carried_files": len(carried)})

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

    def exists(self, name: str) -> bool:
        """True when the table has a published current manifest (a snap dir
        without one is an unpublished orphan, not a table)."""
        return os.path.exists(self._manifest(name))

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

    def expire_snapshots(self, name: str, keep_last: int = 2) -> dict:
        """Retention GC (Iceberg expire_snapshots + remove_orphan_files in
        one pass): keep the newest ``keep_last`` snapshot manifests (the
        CURRENT pointer's snapshot is kept unconditionally, even if a
        crashed later write left a higher orphaned id), delete the older
        manifests, then delete every data file under the table dir that no
        KEPT manifest references.  Copy-on-write makes this the only way
        space is ever reclaimed: merge/delete/compact never remove files,
        they just stop referencing them.

        Two deletion classes fall out of the same referenced-set walk:
        files referenced only by expired snapshots, and orphans from
        crashed writes (a snap dir with no published manifest).  A snap
        dir left with no referenced files is removed whole; a dir that a
        COW merge partially carried keeps exactly its referenced files.

        SINGLE-WRITER assumption (same as write/merge): running this
        concurrently with an in-flight write would GC the writer's
        yet-unpublished files.  Time travel to an expired snapshot raises
        FileNotFoundError — the documented contract, as in Iceberg."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        ids = self._snapshot_ids(name)
        current = self.manifest(name)["snapshot_id"]
        keep = set(ids[-keep_last:]) | {current}
        referenced: set = set()
        for i in sorted(keep):
            referenced.update(self.manifest(name, i)["files"])
        expired = [i for i in ids if i not in keep]
        for i in expired:
            os.remove(self._manifest(name, i))
        path = self._dir(name)
        deleted_files, freed = 0, 0
        for d in sorted(os.listdir(path)):
            full = os.path.join(path, d)
            if not d.startswith("snap-") or not os.path.isdir(full):
                continue
            kept_any = False
            for root, _dirs, fnames in os.walk(full):
                for f in fnames:
                    fp = os.path.join(root, f)
                    rel = os.path.relpath(fp, path)
                    if rel in referenced:
                        kept_any = True
                    elif f.endswith(".parquet"):
                        freed += os.path.getsize(fp)
                        os.remove(fp)
                        deleted_files += 1
            if not kept_any:
                import shutil
                shutil.rmtree(full)
        return {"table": name, "expired_snapshots": expired,
                "kept_snapshots": sorted(keep), "deleted_files": deleted_files,
                "freed_bytes": freed}
