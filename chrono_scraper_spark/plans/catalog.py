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

Scale notes: commits are DELTA-APPEND (Iceberg fast-append / format-v2
merge-on-read semantics): ``append`` and ``merge_not_matched`` write ONLY the
delta rows as a new parquet fragment, and the manifest lists the snapshot's
fragment set; a read is the union of the listed fragments. Commit cost is
O(delta), never O(accumulated table) — the 10^10-key ``url_seen`` table is
never rewritten, round over round. ``commit`` (overwrite) replaces the
fragment set; ``compact`` folds the fragment chain back into one file when
fragment count grows (Iceberg rewrite_data_files analog).
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
# sentinel: distinguishes "no expect_version supplied" from "expected no
# table yet" (None) in merge_not_matched
_UNSET = object()


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
    def _fragments(self, table: str, version: int) -> list[str]:
        """Absolute fragment paths for a snapshot (manifest-listed; falls
        back to the snapshot's own data dir for pre-fragment manifests)."""
        m = self.manifest(table, version)
        rels = m.get("fragments") if m else None
        if rels is None:
            return [self._data_dir(table, version)]
        return [os.path.join(self.root, r) for r in rels]

    def _fragment_row_count(self, frag_abs: str) -> int:
        """Row count of one fragment dir from parquet FOOTERS only — a local
        metadata read, no Spark job (Iceberg stores per-file record counts in
        its manifests; parquet footers carry the same number)."""
        import pyarrow.parquet as pq

        total = 0
        for dirpath, _dirs, files in os.walk(frag_abs):
            for name in files:
                if name.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(dirpath, name)).metadata.num_rows
        return total

    def row_count(self, table: str, version: int | None = None) -> int:
        """Snapshot record count WITHOUT a Spark count job: the manifest's
        ``row_count`` when the committer recorded it, else the sum of the
        snapshot fragments' parquet-footer counts (pure metadata — O(#files)
        local reads, never O(rows)). Iceberg analog: snapshot summary's
        ``total-records``."""
        version = version if version is not None else self.current_version(table)
        if version is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        m = self.manifest(table, version)
        rc = m.get("row_count", -1) if m else -1
        if rc is not None and rc >= 0:
            return rc
        return sum(self._fragment_row_count(p)
                   for p in self._fragments(table, version))

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Current (or time-travel) snapshot read = union of the manifest's
        fragment files. Iceberg:
        ``spark.read.option("snapshot-id", …).table(table)``."""
        version = version if version is not None else self.current_version(table)
        if version is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        frags = self._fragments(table, version)
        reader = self.spark.read
        if len(frags) > 1:
            # fragments may differ in schema across rounds (column adds) —
            # Iceberg resolves by schema id; plain parquet needs mergeSchema
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*frags)

    def read_incremental(self, table: str, from_version: int,
                         to_version: int | None = None) -> DataFrame:
        """T10/CDC: ONLY the rows added after ``from_version`` up to
        ``to_version`` (default current) — the Iceberg incremental read
        (``spark.read.option("start-snapshot-id", …)``). With delta-fragment
        manifests this is a pure metadata diff: read the fragments present
        in ``to`` but not in ``from``; no data comparison, no full scan.
        Exact for append/merge snapshots; an overwrite/compact inside the
        range re-baselines the table (same caveat as Iceberg incremental
        reads, which require append-only history)."""
        to_version = (to_version if to_version is not None
                      else self.current_version(table))
        if to_version is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        old = set(self._fragments(table, from_version)) \
            if from_version is not None else set()
        new = [p for p in self._fragments(table, to_version) if p not in old]
        if not new:
            return self.read(table, to_version).limit(0)
        reader = self.spark.read
        if len(new) > 1:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*new)

    def read_or_empty(self, table: str, schema: str) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], schema)

    # -- commits -------------------------------------------------------------
    def _write_fragment(self, table: str, version: int, df: DataFrame,
                        partition_by: list[str] | None = None) -> str:
        """Write one fragment dir for the snapshot; returns its root-relative
        path (what the manifest stores)."""
        data_dir = self._data_dir(table, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        return os.path.relpath(data_dir, self.root)

    def _delta_row_count(self, table: str, prev: int | None,
                         new_frag_rel: str) -> int:
        """Cumulative record count for a delta commit: parent snapshot count
        (manifest-recorded, or footer-summed once for legacy snapshots) plus
        the new fragment's footer count. O(#new files) local metadata reads
        in steady state — never a Spark job."""
        base = self.row_count(table, prev) if prev is not None else 0
        return base + self._fragment_row_count(
            os.path.join(self.root, new_frag_rel))

    def _commit_manifest(self, table: str, fragments: list[str], *,
                         version: int, prev: int | None, operation: str,
                         properties: dict | None,
                         row_count: int | None) -> dict:
        """Manifest write + atomic ``_current`` pointer swap — the actual
        commit point (a crash before the swap leaves the parent current)."""
        manifest = {
            "table": table,
            "version": version,
            "parent_version": prev,
            "snapshot_id": uuid.uuid4().hex,
            "operation": operation,
            "row_count": -1 if row_count is None else row_count,
            "committed_at_unix": time.time(),
            "fragments": fragments,
            "properties": properties or {},
        }
        mpath = self._manifest_path(table, version)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        cur = os.path.join(self._tdir(table), _CURRENT)
        tmpc = cur + f".tmp-{uuid.uuid4().hex}"
        with open(tmpc, "w") as f:
            f.write(str(version))
        os.replace(tmpc, cur)
        return manifest

    def commit(self, table: str, df: DataFrame, *, operation: str,
               properties: dict | None = None,
               partition_by: list[str] | None = None,
               row_count: int | None = None) -> dict:
        """OVERWRITE commit: ``df`` becomes the table's entire next snapshot
        (one fragment). Iceberg: ``df.writeTo(table).overwritePartitions()``.

        ``row_count``: caller-provided when already known; otherwise read
        from the written fragment's parquet footers — a local metadata read,
        no extra Spark job (Iceberg gets snapshot record counts from file
        metadata the same way)."""
        prev = self.current_version(table)
        version = (prev or 0) + 1
        frag = self._write_fragment(table, version, df, partition_by)
        if row_count is None:
            row_count = self._fragment_row_count(os.path.join(self.root, frag))
        return self._commit_manifest(table, [frag], version=version,
                                     prev=prev, operation=operation,
                                     properties=properties,
                                     row_count=row_count)

    def append(self, table: str, df: DataFrame, *, operation: str = "append",
               properties: dict | None = None) -> dict:
        """DELTA append (Iceberg fast-append): write ONLY ``df`` as a new
        fragment; the new manifest lists parent fragments + the new one.
        Cost is O(delta) regardless of accumulated table size."""
        prev = self.current_version(table)
        version = (prev or 0) + 1
        frag = self._write_fragment(table, version, df)
        prev_frags = self._fragments(table, prev) if prev is not None else []
        rel_prev = [os.path.relpath(p, self.root) for p in prev_frags]
        return self._commit_manifest(table, rel_prev + [frag],
                                     version=version, prev=prev,
                                     operation=operation,
                                     properties=properties,
                                     row_count=self._delta_row_count(
                                         table, prev, frag))

    def merge_not_matched(self, table: str, new_rows: DataFrame,
                          keys: list[str], *, operation: str = "merge",
                          properties: dict | None = None,
                          assume_unique: bool = False,
                          expect_version: "int | None" = _UNSET) -> dict:
        """``MERGE INTO table USING new ON keys WHEN NOT MATCHED THEN INSERT``
        (reference semantics: ON CONFLICT DO NOTHING,
        cdx_deduplication_service.py:229-238) as a MERGE-ON-READ delta: the
        anti-join keeps only genuinely-new keys, and ONLY those rows are
        written (one new fragment). The accumulated table is read (for the
        key check) but never rewritten — commit cost stays O(delta) as the
        table grows, matching Iceberg format-v2 merge-on-read.

        ``assume_unique=True`` skips the delta-side key dedup shuffle when
        the caller guarantees key uniqueness (e.g. output of a groupBy on
        the keys).

        ``expect_version``: the snapshot version (or None for "no table
        yet") the caller computed the delta AGAINST, when that computation
        already proves key-newness — e.g. the crawl round's url_seen delta
        is the survivors of an anti-join on exactly that pinned snapshot.
        If the table is still at ``expect_version``, the existing-key scan
        is skipped entirely and commit cost is strictly O(delta) — the
        per-round full-table probe (O(10^10 rows) at target scale) is gone.
        If the table has ADVANCED (a torn-round replay re-running the
        commit), the guarantee no longer covers the gap and the exact
        anti-join runs as before — same idempotency, fast path only when
        provably safe. Iceberg analog: a MERGE whose snapshot-id check
        passes can fast-append validated-new rows."""
        if not assume_unique:
            new_rows = new_rows.dropDuplicates(keys)
        prev = self.current_version(table)
        if prev is not None:
            if expect_version is not _UNSET and expect_version == prev:
                fresh = new_rows
            else:
                existing = self.read(table)
                fresh = new_rows.join(existing.select(*keys), keys,
                                      "left_anti")
        else:
            fresh = new_rows
        version = (prev or 0) + 1
        frag = self._write_fragment(table, version, fresh)
        prev_frags = self._fragments(table, prev) if prev is not None else []
        rel_prev = [os.path.relpath(p, self.root) for p in prev_frags]
        return self._commit_manifest(table, rel_prev + [frag],
                                     version=version, prev=prev,
                                     operation=operation,
                                     properties=properties,
                                     row_count=self._delta_row_count(
                                         table, prev, frag))

    def compact(self, table: str, *, properties: dict | None = None) -> dict:
        """Fold the fragment chain into one fragment (Iceberg
        rewrite_data_files). Run occasionally — e.g. every N rounds or when
        ``len(manifest['fragments'])`` crosses a threshold — never per-commit."""
        df = self.read(table)
        return self.commit(table, df, operation="compact",
                           properties=properties)

    def compact_collapse(self, table: str, key_cols: tuple, ts_col: str,
                         *, properties: dict | None = None) -> dict:
        """Latest-wins rewrite: compact an append-only latest-wins table
        (validators, revalidate_log-style logs read through a
        newest-row-per-key collapse) down to ONE row per key — the newest
        by ``ts_col``, ties broken by the remaining columns' struct order
        exactly like every read-side collapse (operators.dedup.
        latest_captures, shared code). Readers see identical results
        before and after; superseded rows stop costing scan time and
        disk. The Iceberg analog: rewrite_data_files with an
        equality-delete-style dedup folded in. History stays
        time-travelable until ``expire_snapshots`` reclaims it.

        Without this, a validators table grows one row per URL per
        check — linear in checks at 10^10-URL scale; collapsed it is
        O(distinct urls)."""
        from chrono_scraper_spark.operators.dedup import latest_captures

        collapsed = latest_captures(self.read(table),
                                    key_cols=tuple(key_cols),
                                    ts_col=ts_col)
        return self.commit(table, collapsed, operation="compact_collapse",
                           properties=properties)

    def expire_snapshots(self, table: str, *, keep_last: int = 2) -> dict:
        """Iceberg ``expire_snapshots`` analog: drop all but the newest
        ``keep_last`` manifests and DELETE fragment directories no retained
        manifest references (after a ``compact`` the whole pre-compaction
        chain becomes unreferenced — this is what actually reclaims disk).
        Time travel to an expired version raises, exactly like Iceberg.
        Safe ordering: manifests are removed first, data files second, so a
        crash mid-expire can strand unreferenced files (re-run to finish)
        but can never leave a manifest pointing at deleted data.

        Run OFFLINE, between crawl runs: a crawl round's lineage row pins
        the previous round's versions for torn-round replay, so expiring
        versions a potential replay still needs would break resume — the
        same writer/maintenance separation Iceberg prescribes."""
        import shutil

        versions = sorted(s["version"] for s in self.snapshots(table))
        drop, keep = versions[:-keep_last], versions[-keep_last:]
        if not drop:
            return {"expired_versions": [], "deleted_fragments": []}
        keep_frags = set()
        for v in keep:
            keep_frags.update(self._fragments(table, v))
        doomed = set()
        for v in drop:
            doomed.update(f for f in self._fragments(table, v)
                          if f not in keep_frags)
        for v in drop:
            os.remove(self._manifest_path(table, v))
        for frag in doomed:
            shutil.rmtree(frag, ignore_errors=True)
        return {"expired_versions": drop,
                "deleted_fragments": sorted(doomed)}

    def rollback(self, table: str, version: int) -> dict:
        """Iceberg ``rollback_to_snapshot`` analog: commit a NEW snapshot
        whose fragment list is a byte-for-byte copy of ``version``'s — the
        table's current state becomes the old state, but history is
        preserved (the rolled-back-over snapshots stay time-travelable
        until ``expire_snapshots``), exactly like Iceberg's rollback, which
        is itself a new snapshot with the old snapshot's manifest list."""
        m = self.manifest(table, version)
        if m is None:
            raise FileNotFoundError(f"{table} has no snapshot v{version}")
        prev = self.current_version(table)
        new_version = (prev or 0) + 1
        return self._commit_manifest(
            table, list(m["fragments"]), version=new_version, prev=prev,
            operation="rollback",
            properties={"rolled_back_to": version},
            row_count=m.get("row_count", -1))

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
