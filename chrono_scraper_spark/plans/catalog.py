"""Snapshot-versioned table catalog (the Iceberg surface of the engine).

The production design is Iceberg (north_rule): `pages`, `frontier`,
`url_seen`, `fetch_log`, `page_index`, `inverted_terms`, `crawl_rounds` are
Iceberg tables; dedup-insert is ``MERGE INTO … WHEN NOT MATCHED THEN INSERT``;
resume reads the last committed snapshot; lineage hangs off snapshot metadata.
This container has no Iceberg runtime jar, so the same contract is provided
over plain parquet with an explicit manifest chain — one JSON manifest per
snapshot, an atomically-replaced ``_current`` pointer, full time-travel reads.
Every method documents its Iceberg equivalent; swapping the backend is a
catalog-config change, not an engine change.

Commit protocol (crash-safe): write the new snapshot's data directory, then
its manifest file, then ``os.replace`` the ``_current`` pointer. A crash
before the pointer swap leaves the previous snapshot current — exactly
Iceberg's metadata-pointer semantics.

Scale notes: snapshots here are copy-on-write full rewrites, fine for tables
that are small per-round deltas at test scale. On a cluster the url_seen
table is Iceberg format-v2 merge-on-read: MERGE writes only delta files, and
the 10^10-key seen set never rewrites. The engine code paths are identical —
``merge_not_matched`` takes the delta DataFrame either way.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_current"
_MANIFESTS = "_manifests"


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str, version: int) -> str:
        return os.path.join(self._tdir(table), _MANIFESTS, f"v{version:07d}.json")

    def _data_dir(self, table: str, version: int) -> str:
        return os.path.join(self._tdir(table), "data", f"v{version:07d}")

    # -- snapshot chain ----------------------------------------------------
    def current_version(self, table: str) -> int | None:
        p = os.path.join(self._tdir(table), _CURRENT)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, table: str, version: int | None = None) -> dict | None:
        version = version if version is not None else self.current_version(table)
        if version is None:
            return None
        with open(self._manifest_path(table, version)) as f:
            return json.load(f)

    def snapshots(self, table: str) -> list[dict]:
        """All committed manifests, oldest first (Iceberg: snapshots metadata
        table)."""
        mdir = os.path.join(self._tdir(table), _MANIFESTS)
        if not os.path.isdir(mdir):
            return []
        out = []
        for name in sorted(os.listdir(mdir)):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
        cur = self.current_version(table)
        return [m for m in out if m["version"] <= (cur if cur is not None else -1)]

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    # -- reads ---------------------------------------------------------------
    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Current (or time-travel) snapshot read. Iceberg:
        ``spark.read.option("snapshot-id", …).table(table)``."""
        version = version if version is not None else self.current_version(table)
        if version is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        return self.spark.read.parquet(self._data_dir(table, version))

    def read_or_empty(self, table: str, schema: str) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], schema)

    # -- commits -------------------------------------------------------------
    def commit(self, table: str, df: DataFrame, *, operation: str,
               properties: dict | None = None,
               partition_by: list[str] | None = None,
               row_count: int | None = None) -> dict:
        """Write ``df`` as the table's next snapshot. Iceberg:
        ``df.writeTo(table).overwritePartitions()`` / ``append`` under one
        snapshot commit.

        ``row_count``: caller-provided when already known; -1 (unknown)
        otherwise — recounting would cost one extra job per commit, and
        Iceberg gets snapshot record counts from file metadata for free."""
        prev = self.current_version(table)
        version = (prev or 0) + 1
        data_dir = self._data_dir(table, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        if row_count is None:
            row_count = -1
        manifest = {
            "table": table,
            "version": version,
            "parent_version": prev,
            "snapshot_id": uuid.uuid4().hex,
            "operation": operation,
            "row_count": row_count,
            "committed_at_unix": time.time(),
            "properties": properties or {},
        }
        mpath = self._manifest_path(table, version)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        # atomic current-pointer swap — the actual commit point
        cur = os.path.join(self._tdir(table), _CURRENT)
        tmpc = cur + f".tmp-{uuid.uuid4().hex}"
        with open(tmpc, "w") as f:
            f.write(str(version))
        os.replace(tmpc, cur)
        return manifest

    def append(self, table: str, df: DataFrame, *, operation: str = "append",
               properties: dict | None = None) -> dict:
        """Append = previous ∪ new (Iceberg fast-append; here CoW union)."""
        if self.exists(table):
            df = self.read(table).unionByName(df, allowMissingColumns=True)
        return self.commit(table, df, operation=operation, properties=properties)

    def merge_not_matched(self, table: str, new_rows: DataFrame,
                          keys: list[str], *, operation: str = "merge",
                          properties: dict | None = None,
                          assume_unique: bool = False) -> dict:
        """``MERGE INTO table USING new ON keys WHEN NOT MATCHED THEN INSERT``
        (reference semantics: ON CONFLICT DO NOTHING,
        cdx_deduplication_service.py:229-238).

        ``assume_unique=True`` skips the delta-side key dedup shuffle when
        the caller guarantees key uniqueness (e.g. output of a groupBy on
        the keys)."""
        if not assume_unique:
            new_rows = new_rows.dropDuplicates(keys)
        if self.exists(table):
            existing = self.read(table)
            fresh = new_rows.join(existing.select(*keys), keys, "left_anti")
            merged = existing.unionByName(fresh, allowMissingColumns=True)
        else:
            merged = new_rows
        return self.commit(table, merged, operation=operation,
                           properties=properties)

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
