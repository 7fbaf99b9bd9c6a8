"""Iceberg-layout table format: snapshots, manifests, partition and
min/max file pruning, time travel — over plain Parquet data files.

The north rule's input is "Iceberg tables of Common-Crawl-style web
pages".  The real Iceberg runtime (iceberg-spark-runtime jar) is not
deployable in this environment, so this module implements the Iceberg
TABLE-FORMAT SEMANTICS from the public spec directly:

- ``metadata/v{N}.metadata.json``  — table metadata: schema, partition
  spec, snapshot log, current snapshot pointer (spec §"Table Metadata").
- ``metadata/version-hint.text``   — the catalog-less HadoopTable
  current-version pointer, updated atomically (os.replace).
- ``metadata/manifest-*.parquet``  — manifest files: one row per data
  file with partition values, record count, and per-column min/max
  stats (spec §"Manifests"; encoded as Parquet rather than Avro — the
  spark-avro module is absent; the planning semantics are the same).
- ``data/...``                     — immutable Parquet data files,
  hive-style partition directories.

Supported table ops: create / append / overwrite (each makes a new
snapshot), scan with snapshot or as-of-timestamp time travel, partition
pruning, and min/max-stats file skipping for equality/range predicates.
Commits are optimistic: writers stage a new metadata version and then
atomically flip version-hint — concurrent readers always see a complete
snapshot (same failure model as Iceberg's HadoopCatalog).

At 100TB these metadata structures are exactly what makes planning
cheap: a scan with ``lang = 'en'`` reads only the manifest rows, prunes
non-matching files, and hands Spark a file list — no directory listing
of the data lake, no footer reads of skipped files.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_STATTYPES = ("long", "integer", "double", "float", "string", "timestamp", "date")


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _read_version(path: str) -> int:
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    with open(hint) as fh:
        return int(fh.read().strip())


def _load_metadata(path: str, version: int | None = None) -> dict:
    v = version if version is not None else _read_version(path)
    with open(os.path.join(_meta_dir(path), f"v{v}.metadata.json")) as fh:
        return json.load(fh)


def _file_stats(local_path: str, stat_cols: list[str]) -> tuple[int, dict]:
    """Record count + per-column {min, max} from the Parquet footer —
    no Spark job, mirroring Iceberg's write-time stats collection."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(local_path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in stat_cols or not col.is_stats_set:
                continue
            st = col.statistics
            if st.min is not None:
                mn = st.min.decode() if isinstance(st.min, bytes) else st.min
                mx = st.max.decode() if isinstance(st.max, bytes) else st.max
                mins[name] = mn if name not in mins else min(mins[name], mn)
                maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    stats = {c: {"min": mins[c], "max": maxs[c]} for c in mins}
    return md.num_rows, stats


_MANIFEST_FIELDS = ("file_path", "partition", "record_count", "file_size", "col_stats")


def _write_manifest(path_abs: str, entries: list[tuple]) -> None:
    """Manifest I/O is METADATA-layer work (driver-side, tiny — one row
    per data file), mirroring real Iceberg where manifests are written
    by the commit path, not by a distributed job.  A Spark
    createDataFrame+write here cost ~8 s of pure job overhead per
    commit; pyarrow writes the same parquet in milliseconds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*entries)) if entries else [[]] * len(_MANIFEST_FIELDS)
    types = {
        "file_path": pa.string(),
        "partition": pa.string(),
        "record_count": pa.int64(),
        "file_size": pa.int64(),
        "col_stats": pa.string(),
    }
    pq.write_table(
        pa.table(
            {
                name: pa.array(list(vals), types[name])
                for name, vals in zip(_MANIFEST_FIELDS, cols)
            }
        ),
        path_abs,
    )


def _read_manifest(path_abs: str) -> list[dict]:
    """Read a manifest written by ``_write_manifest`` (single file) or
    by an older Spark-written commit (directory of part files)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path_abs):
        parts = sorted(glob.glob(os.path.join(path_abs, "*.parquet")))
        t = pa.concat_tables([pq.read_table(p) for p in parts])
    else:
        t = pq.read_table(path_abs)
    return t.to_pylist()


class IcebergishTable:
    """Handle to a table directory; classmethods create/load."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    # -- write path ---------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
    ) -> "IcebergishTable":
        os.makedirs(_meta_dir(path), exist_ok=False)
        t = cls(spark, path)
        t._commit(df, partition_by or [], operation="create", parent=None)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IcebergishTable":
        if not os.path.exists(os.path.join(_meta_dir(path), "version-hint.text")):
            raise FileNotFoundError(f"not an Icebergish table: {path}")
        return cls(spark, path)

    def append(self, df: DataFrame) -> None:
        meta = _load_metadata(self.path)
        self._commit(
            df,
            meta["partition-spec"],
            operation="append",
            parent=meta["current-snapshot-id"],
            carry_manifests=self._current_manifests(meta),
        )

    def overwrite(self, df: DataFrame) -> None:
        meta = _load_metadata(self.path)
        self._commit(
            df,
            meta["partition-spec"],
            operation="overwrite",
            parent=meta["current-snapshot-id"],
        )

    def _current_manifests(self, meta: dict) -> list[str]:
        snap_id = meta["current-snapshot-id"]
        for s in meta["snapshots"]:
            if s["snapshot-id"] == snap_id:
                return list(s["manifests"])
        return []

    def _commit(
        self,
        df: DataFrame,
        partition_by: list[str],
        operation: str,
        parent: int | None,
        carry_manifests: list[str] | None = None,
    ) -> None:
        commit_uuid = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.path, "data", f"commit-{commit_uuid}")
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        # manifest: one row per data file, with partition values parsed
        # from the hive path and footer stats for prunable columns
        stat_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in _STATTYPES and f.name not in partition_by
        ]
        entries = []
        for root, _dirs, files in os.walk(data_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, self.path)
                part_vals = {}
                for seg in os.path.relpath(root, data_dir).split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        part_vals[k] = v
                nrows, stats = _file_stats(full, stat_cols)
                entries.append(
                    (
                        rel,
                        json.dumps(part_vals, sort_keys=True),
                        nrows,
                        os.path.getsize(full),
                        json.dumps(stats, sort_keys=True, default=str),
                    )
                )
        manifest_name = f"manifest-{commit_uuid}.parquet"
        manifest_rel = os.path.join("metadata", manifest_name)
        _write_manifest(os.path.join(self.path, manifest_rel), entries)

        manifests = list(carry_manifests or []) + [manifest_rel]
        snapshot_id = int(time.time() * 1000) * 1000 + int(commit_uuid[:4], 16) % 1000
        version = (_read_version(self.path) + 1) if parent is not None else 1
        prev = _load_metadata(self.path) if parent is not None else None
        snapshots = (prev["snapshots"] if prev else []) + [
            {
                "snapshot-id": snapshot_id,
                "parent-snapshot-id": parent,
                "timestamp-ms": int(time.time() * 1000),
                "operation": operation,
                "manifests": manifests,
                "summary": {
                    "added-files": len(entries),
                    "added-records": sum(e[2] for e in entries),
                },
            }
        ]
        # schema evolution (Iceberg-style additive): the table schema is
        # the previous schema plus any NEW columns this commit introduces;
        # older data files simply lack the new columns and read as null
        schema_fields = list(prev["schema"]["fields"]) if prev else []
        known = {f["name"] for f in schema_fields}
        for f in json.loads(df.schema.json())["fields"]:
            if f["name"] not in known:
                schema_fields.append(f)
        meta = {
            "format-version": 2,
            "table-uuid": prev["table-uuid"] if prev else str(uuid.uuid4()),
            "location": self.path,
            "schema": {"type": "struct", "fields": schema_fields},
            "partition-spec": partition_by,
            "current-snapshot-id": snapshot_id,
            "snapshots": snapshots,
        }
        mpath = os.path.join(_meta_dir(self.path), f"v{version}.metadata.json")
        with open(mpath, "w") as fh:
            json.dump(meta, fh, indent=1)
        tmp = os.path.join(_meta_dir(self.path), f".hint-{commit_uuid}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(_meta_dir(self.path), "version-hint.text"))

    # -- maintenance (Iceberg rewrite_data_files / expire_snapshots) --
    def compact(self, target_file_rows: int = 1_000_000) -> None:
        """Rewrite the CURRENT snapshot's data into large files — the
        small-files maintenance pass (Iceberg's ``rewrite_data_files``).
        Commits a new ``replace`` snapshot holding only the rewritten
        files; older snapshots keep referencing the original files, so
        time travel is intact until ``expire_snapshots`` reclaims them.

        Partitioned tables rewrite to one task per partition value
        (one file per value); unpartitioned tables target
        ``target_file_rows`` rows per file.
        """
        meta = _load_metadata(self.path)
        cur = meta["current-snapshot-id"]
        part_by = list(meta["partition-spec"])
        total = sum(f["record_count"] for f in self.plan_files())
        df = self.scan()
        if part_by:
            df = df.repartition(*[F.col(c) for c in part_by])
        else:
            df = df.repartition(max(1, -(-total // max(target_file_rows, 1))))
        self._commit(df, part_by, operation="replace", parent=cur)

    def expire_snapshots(self, keep_last: int = 1) -> None:
        """Drop all but the newest ``keep_last`` snapshots and DELETE
        manifests + data files referenced only by the expired ones
        (Iceberg's ``expire_snapshots`` — the step that actually
        reclaims storage after compaction/overwrites).  Time travel to
        an expired snapshot subsequently raises ``KeyError``.  The new
        metadata version is committed via the same atomic version-hint
        replace as every other commit."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        meta = _load_metadata(self.path)
        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return
        keep, expired = snaps[-keep_last:], snaps[:-keep_last]
        if not any(s["snapshot-id"] == meta["current-snapshot-id"] for s in keep):
            raise ValueError("expire_snapshots would drop the current snapshot")
        keep_manifests = {m for s in keep for m in s["manifests"]}
        keep_files = {
            r["file_path"]
            for m in keep_manifests
            for r in _read_manifest(os.path.join(self.path, m))
        }
        # COMMIT FIRST, delete after (Iceberg order): once the
        # version-hint flips, no reader can plan an expired snapshot, so
        # the deletes below are invisible; a crash between commit and
        # delete leaves only orphaned files (retryable), never a live
        # metadata version pointing at missing ones.
        version = _read_version(self.path) + 1
        meta["snapshots"] = keep
        mpath_meta = os.path.join(_meta_dir(self.path), f"v{version}.metadata.json")
        with open(mpath_meta, "w") as fh:
            json.dump(meta, fh, indent=1)
        tmp = os.path.join(_meta_dir(self.path), f".hint-expire-{version}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(_meta_dir(self.path), "version-hint.text"))
        for s in expired:
            for m in s["manifests"]:
                if m in keep_manifests:
                    continue
                mpath = os.path.join(self.path, m)
                if not os.path.exists(mpath):
                    continue
                for r in _read_manifest(mpath):
                    if r["file_path"] not in keep_files:
                        fp = os.path.join(self.path, r["file_path"])
                        if os.path.exists(fp):
                            os.remove(fp)
                if os.path.isdir(mpath):
                    import shutil

                    shutil.rmtree(mpath)
                else:
                    os.remove(mpath)

    # -- read path ----------------------------------------------------
    def history(self) -> list[dict]:
        return [
            {k: s[k] for k in ("snapshot-id", "parent-snapshot-id",
                               "timestamp-ms", "operation", "summary")}
            for s in _load_metadata(self.path)["snapshots"]
        ]

    def _snapshot(self, snapshot_id: int | None, as_of_ms: int | None) -> dict:
        meta = _load_metadata(self.path)
        snaps = meta["snapshots"]
        if snapshot_id is not None:
            for s in snaps:
                if s["snapshot-id"] == snapshot_id:
                    return s
            raise KeyError(f"unknown snapshot {snapshot_id}")
        if as_of_ms is not None:
            eligible = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
            if not eligible:
                raise KeyError(f"no snapshot at or before {as_of_ms}")
            return eligible[-1]
        cur = meta["current-snapshot-id"]
        return next(s for s in snaps if s["snapshot-id"] == cur)

    def plan_files(
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        partition_filter: dict | None = None,
        stats_filter: dict | None = None,
    ) -> list[dict]:
        """Manifest-driven scan planning: returns surviving data-file
        entries after partition pruning (equality on partition values)
        and min/max stats pruning (``{col: (lo, hi)}`` range overlap).
        Reads only manifest files — never lists or opens data files."""
        snap = self._snapshot(snapshot_id, as_of_ms)
        out: list[dict] = []
        for m in snap["manifests"]:
            rows = _read_manifest(os.path.join(self.path, m))
            for r in rows:
                part = json.loads(r["partition"])
                if partition_filter and any(
                    k in part and part[k] != str(v)
                    for k, v in partition_filter.items()
                ):
                    continue
                stats = json.loads(r["col_stats"])
                if stats_filter:
                    skip = False
                    for col, (lo, hi) in stats_filter.items():
                        if col in stats:
                            mn, mx = stats[col]["min"], stats[col]["max"]
                            if (hi is not None and mn > hi) or (
                                lo is not None and mx < lo
                            ):
                                skip = True
                                break
                    if skip:
                        continue
                out.append(
                    {
                        "file_path": r["file_path"],
                        "partition": part,
                        "record_count": r["record_count"],
                    }
                )
        return out

    def scan(
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        partition_filter: dict | None = None,
        stats_filter: dict | None = None,
    ) -> DataFrame:
        """DataFrame over the pruned file list of one snapshot.  The
        partition columns are re-attached as literal columns (they are
        encoded in the path, Iceberg-style identity partitioning)."""
        meta = _load_metadata(self.path)
        schema = StructType.fromJson(meta["schema"])
        part_cols = meta["partition-spec"]
        files = self.plan_files(snapshot_id, as_of_ms, partition_filter, stats_filter)
        if not files:
            return self.spark.createDataFrame([], schema)
        data_schema = StructType(
            [f for f in schema.fields if f.name not in part_cols]
        )
        # group files by partition tuple so literals can be re-attached
        groups: dict[tuple, list[str]] = {}
        for f in files:
            key = tuple(f["partition"].get(c) for c in part_cols)
            groups.setdefault(key, []).append(
                os.path.join(self.path, f["file_path"])
            )
        result: DataFrame | None = None
        for key, paths in sorted(groups.items()):
            df = self.spark.read.schema(data_schema).parquet(*paths)
            for c, v in zip(part_cols, key):
                field = next(f for f in schema.fields if f.name == c)
                df = df.withColumn(c, F.lit(v).cast(field.dataType))
            df = df.select(*[f.name for f in schema.fields])
            result = df if result is None else result.unionByName(df)
        return result
