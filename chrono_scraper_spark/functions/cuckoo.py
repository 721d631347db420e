"""Distributed cuckoo filter for the URL-seen set (Fan et al. 2014,
"Cuckoo Filter: Practically Better Than Bloom").

Why a second approximate-membership structure next to ``functions/bloom``:
the cuckoo filter supports DELETION — the Bloom filter cannot retract a key
without rebuilding. The crawl frontier needs retraction in one real case:
a URL marked seen by an optimistic round that later dead-letters terminally
can be re-opened for a future recrawl without rebuilding the 10^10-key
filter. Same safety contract as the Bloom path: the filter only PREfilters
(false positives re-checked by the exact anti-join; false negatives
impossible for resident keys), so the downstream seen-set semantics are
exact either way.

Layout (standard 4-slot bucketized cuckoo filter):
- table: ``uint16[n_buckets, 4]``; fingerprint 0 marks an empty slot, so
  fingerprints are forced nonzero (16-bit fp ⇒ ~0.03% fp rate/lookup at
  4 slots × 2 buckets).
- for key hash ``h`` (computed JVM-side, ``xxhash64(key, 7)``):
  ``fp = top 16 bits of h (or 1)``, ``i1 = h mod n_buckets``,
  ``i2 = i1 XOR mix(fp)`` — an involution, so either bucket recovers the
  other without the key.
- insert: try both buckets; if full, evict a resident fingerprint and
  re-home it in ITS alternate bucket (cuckoo kicking), bounded kicks. An
  insert that still fails lands in a tiny exact overflow list (serialized
  with the table) — membership stays false-negative-free at any load.

Distributed shape — cuckoo tables do NOT union like Bloom bitmaps (slots
collide), but tables over DISJOINT key shards compose trivially: shard by
``h mod n_shards``, build one independent table per shard executor-side
(``applyInPandas``), and either
- ``build_cuckoo``: ship each shard's packed bytes to the driver
  (~2.9 bytes/key at 0.84 load — comparable to a 4-bit/key Bloom, never
  the raw keys) and broadcast the shard list: the "partitioned URL-seen
  filter, broadcast-merged per micro-batch" frontier pattern; or
- ``build_cuckoo_partitioned``: write ``shard_{i}.cuckoo`` files to shared
  storage (the same Iceberg-puffin pattern as bloom.py) and probe / DELETE
  shard-locally — the 10^10-key path where no single filter broadcasts.

All hot paths are numpy-vectorized over Arrow batches; the kick loop only
runs for the residue that two vectorized placement passes leave behind
(empirically <2% of inserts below 0.9 load).
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SLOTS = 4
_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing constant
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def optimal_buckets(n_items: int, load: float = 0.84) -> int:
    """Power-of-two bucket count for ``n_items`` at target occupancy.
    4-slot tables sustain ~95% occupancy (Fan et al. §5); 0.84 leaves
    kicking headroom so the overflow list stays empty in practice."""
    n_items = max(n_items, 1)
    need = int(math.ceil(n_items / (_SLOTS * load)))
    return max(4, 1 << (need - 1).bit_length())


def _hash_col(key: Column) -> Column:
    # seed 7: independent of bloom.py's 0/1/2 seeds and the shard hash
    return F.xxhash64(key, F.lit(7))


def _derive(h: np.ndarray, mask: np.uint64):
    """(fp uint16, i1, i2) from raw signed-int64 hashes. ``mix(fp)`` keys
    the XOR so i1↔i2 is an involution independent of the key."""
    u = h.astype(np.uint64)
    fp = ((u >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    i1 = u & mask
    fph = (fp.astype(np.uint64) * _MIX) & _U64
    fph ^= fph >> np.uint64(29)
    i2 = (i1 ^ fph) & mask
    return fp, i1.astype(np.int64), i2.astype(np.int64)


def _mix_scalar(fp: int, mask: int) -> int:
    x = (fp * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 29
    return x & mask


class NumpyCuckoo:
    """Mutable bucketized cuckoo filter over numpy, with exact overflow."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None,
                 overflow: set[int] | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = (table if table is not None
                      else np.zeros((n_buckets, _SLOTS), dtype=np.uint16))
        self.overflow: set[int] = overflow or set()

    # -- vectorized bulk insert ------------------------------------------
    def _bulk_place(self, idx: np.ndarray, fp: np.ndarray,
                    todo: np.ndarray) -> None:
        """Place each still-todo key into the first free slot of its bucket
        ``idx``, giving the r-th key of a bucket (stable order) the bucket's
        (r+1)-th free slot — hole-safe after deletions. Clears ``todo`` bits
        for placed keys. One argsort + one table gather, no Python loop."""
        sel = np.flatnonzero(todo)
        if not len(sel):
            return
        order = sel[np.argsort(idx[sel], kind="stable")]
        bi = idx[order]
        # rank of each key within its bucket group
        starts = np.zeros(len(bi), dtype=np.int64)
        if len(bi) > 1:
            bounds = np.flatnonzero(bi[1:] != bi[:-1]) + 1
            starts[bounds] = bounds
            np.maximum.accumulate(starts, out=starts)
        rank = np.arange(len(bi)) - starts
        free = self.table[bi] == 0                       # (n, SLOTS)
        nth_free = np.cumsum(free, axis=1)               # 1-based
        hit = free & (nth_free == (rank + 1)[:, None])
        ok = hit.any(axis=1)
        slot = hit.argmax(axis=1)
        self.table[bi[ok], slot[ok]] = fp[order[ok]]
        todo[order[ok]] = False

    def _insert_kick(self, fp: int, i: int, max_kicks: int = 500) -> bool:
        """Cuckoo eviction chain with ROLLBACK on failure: a failed chain
        restores every displaced fingerprint (otherwise the last victim —
        a different, already-resident key — would silently lose residency
        and membership would gain a false negative). The caller then parks
        only the ORIGINAL key in the exact overflow list."""
        imask = self.n_buckets - 1
        trail: list[tuple[int, int, int]] = []
        cur = fp
        for n in range(max_kicks):
            row = self.table[i]
            z = np.flatnonzero(row == 0)
            if len(z):
                row[z[0]] = cur
                return True
            victim = (cur + n) % _SLOTS                  # deterministic
            trail.append((i, victim, cur))
            cur, row[victim] = int(row[victim]), cur
            i = (i ^ _mix_scalar(cur, imask)) & imask
        for i_, slot, in_fp in reversed(trail):
            self.table[i_][slot], cur = cur, in_fp
        return False

    def add_hashes(self, h: np.ndarray) -> None:
        """Insert raw int64 hashes. Callers dedupe keys first (the seen set
        is distinct by construction); duplicate fingerprints are legal but
        waste slots. Never loses a key: kick-failures go to ``overflow``."""
        fp, i1, i2 = _derive(h, self.mask)
        todo = np.ones(len(h), dtype=bool)
        self._bulk_place(i1, fp, todo)
        self._bulk_place(i2, fp, todo)
        for j in np.flatnonzero(todo):
            if not self._insert_kick(int(fp[j]), int(i1[j])):
                self.overflow.add(int(h[j]))

    def might_contain_hashes(self, h: np.ndarray) -> np.ndarray:
        fp, i1, i2 = _derive(h, self.mask)
        out = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        if self.overflow:
            ov = np.fromiter(self.overflow, dtype=np.int64,
                             count=len(self.overflow))
            out |= np.isin(h, ov)
        return out

    def delete_hashes(self, h: np.ndarray) -> np.ndarray:
        """Remove one resident fingerprint per key (the Bloom-impossible
        operation). Returns per-key success. Scalar loop: retraction is a
        rare administrative event, never the per-row hot path."""
        fp, i1, i2 = _derive(h, self.mask)
        out = np.zeros(len(h), dtype=bool)
        for j in range(len(h)):
            hv = int(h[j])
            if hv in self.overflow:
                self.overflow.discard(hv)
                out[j] = True
                continue
            for i in (int(i1[j]), int(i2[j])):
                row = self.table[i]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    row[hit[0]] = 0
                    out[j] = True
                    break
        return out

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        ov = np.array(sorted(self.overflow), dtype=np.int64)
        head = struct.pack("<QQ", self.n_buckets, len(ov))
        return head + self.table.tobytes() + ov.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "NumpyCuckoo":
        n_buckets, n_ov = struct.unpack_from("<QQ", data, 0)
        off = 16
        tbl_bytes = n_buckets * _SLOTS * 2
        table = np.frombuffer(
            data, dtype=np.uint16, count=n_buckets * _SLOTS, offset=off
        ).reshape(n_buckets, _SLOTS).copy()
        ov = np.frombuffer(data, dtype=np.int64, count=n_ov,
                           offset=off + tbl_bytes)
        return cls(int(n_buckets), table, set(int(x) for x in ov))


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

def _shard_col(key: Column, n_shards: int) -> Column:
    # seed 0 (bloom.py's bucket seed) keeps shards independent of seed 7
    return F.pmod(F.xxhash64(key, F.lit(0)), F.lit(n_shards)).cast("int")


def build_cuckoo(df: DataFrame, key: Column, n_items: int,
                 n_shards: int = 8, load: float = 0.84) -> dict:
    """Broadcast variant: shard keys executor-side, build one independent
    table per shard, collect only the packed tables (~2.9 bytes/key), and
    return ``{shard: NumpyCuckoo}`` ready to broadcast. The driver never
    sees raw keys — each shard task ships its table, exactly the Bloom
    per-partition-bitmap economics but mergeable by disjointness."""
    per_shard = optimal_buckets(max(n_items // n_shards, 1), load)
    hashed = df.select(_shard_col(key, n_shards).alias("s"),
                       _hash_col(key).alias("h"))

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        filt = NumpyCuckoo(per_shard)
        filt.add_hashes(pdf["h"].to_numpy(np.int64))
        return pd.DataFrame({"shard": [int(pdf["s"].iloc[0])],
                             "packed": [filt.to_bytes()]})

    rows = (hashed.groupBy("s")
            .applyInPandas(_build, "shard int, packed binary").collect())
    return {"n_shards": n_shards,
            "shards": {r.shard: NumpyCuckoo.from_bytes(bytes(r.packed))
                       for r in rows}}


def with_cuckoo_probe(df: DataFrame, key: Column, filters: dict,
                      out_col: str = "maybe_seen") -> DataFrame:
    """Membership column from a broadcast shard dict (``build_cuckoo``).
    Absent shard ⇒ no seen key hashed there ⇒ definitely new."""
    spark = df.sparkSession
    n_shards = filters["n_shards"]
    bc = spark.sparkContext.broadcast(
        {s: f.to_bytes() for s, f in filters["shards"].items()})

    @F.pandas_udf("boolean")
    def _probe(s: pd.Series, h: pd.Series) -> pd.Series:  # pragma: no cover
        packed = bc.value
        sv = s.to_numpy(np.int64)
        hv = h.to_numpy(np.int64)
        out = np.zeros(len(hv), dtype=bool)
        for shard in np.unique(sv):
            blob = packed.get(int(shard))
            if blob is None:
                continue
            m = sv == shard
            filt = NumpyCuckoo.from_bytes(blob)
            out[m] = filt.might_contain_hashes(hv[m])
        return pd.Series(out)

    return df.withColumn(out_col,
                         _probe(_shard_col(key, n_shards), _hash_col(key)))


def build_cuckoo_partitioned(df: DataFrame, key: Column, out_dir: str,
                             n_items: int, n_shards: int = 16,
                             load: float = 0.84) -> dict:
    """10^10-key variant: each shard task writes ``shard_{s}.cuckoo`` to
    shared storage; the driver receives only (shard, n) counters. Probe and
    delete run shard-locally against the matching file."""
    os.makedirs(out_dir, exist_ok=True)
    per_shard = optimal_buckets(max(n_items // n_shards, 1), load)
    hashed = df.select(_shard_col(key, n_shards).alias("s"),
                       _hash_col(key).alias("h"))

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["s"].iloc[0])
        filt = NumpyCuckoo(per_shard)
        filt.add_hashes(pdf["h"].to_numpy(np.int64))
        tmp = os.path.join(out_dir, f".shard_{s}.cuckoo.tmp")
        with open(tmp, "wb") as fh:
            fh.write(filt.to_bytes())
        os.replace(tmp, os.path.join(out_dir, f"shard_{s}.cuckoo"))
        return pd.DataFrame({"shard": [s], "n": [len(pdf)]})

    hashed.groupBy("s").applyInPandas(_build, "shard int, n long").collect()
    return {"n_shards": n_shards, "dir": out_dir}


def _shard_local(df: DataFrame, key: Column, meta: dict, out_col: str,
                 op: str) -> DataFrame:
    """Shared shard-local pass: repartition on shard id, one filter file
    resident per task at a time; ``op`` = probe (read-only) or delete
    (rewrite mutated shards — cuckoo's headline capability)."""
    n_shards, d = meta["n_shards"], meta["dir"]
    cols = df.columns
    hashed = df.withColumns({
        "__s": _shard_col(key, n_shards),
        "__h": _hash_col(key),
    }).repartition(F.col("__s"))
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + \
        f", {out_col} boolean"

    def _run(batches):
        cache: dict = {}

        def _flush():
            for s, filt in cache.items():
                if filt is not None and op == "delete":
                    tmp = os.path.join(d, f".shard_{s}.cuckoo.tmp")
                    with open(tmp, "wb") as fh:
                        fh.write(filt.to_bytes())
                    os.replace(tmp, os.path.join(d, f"shard_{s}.cuckoo"))
            cache.clear()

        for pdf in batches:
            out = np.zeros(len(pdf), dtype=bool)
            for s in pdf["__s"].unique():
                s = int(s)
                if s not in cache:
                    _flush()  # one shard resident at a time
                    path = os.path.join(d, f"shard_{s}.cuckoo")
                    if os.path.exists(path):
                        with open(path, "rb") as fh:
                            cache[s] = NumpyCuckoo.from_bytes(fh.read())
                    else:
                        cache[s] = None
                filt = cache[s]
                mask = (pdf["__s"] == s).to_numpy()
                if filt is not None:
                    hv = pdf.loc[mask, "__h"].to_numpy(np.int64)
                    out[mask] = (filt.might_contain_hashes(hv)
                                 if op == "probe"
                                 else filt.delete_hashes(hv))
            res = pdf.drop(columns=["__s", "__h"])
            res[out_col] = out
            yield res
        _flush()

    return hashed.mapInPandas(_run, schema).select(*cols, out_col)


def with_cuckoo_probe_partitioned(df: DataFrame, key: Column, meta: dict,
                                  out_col: str = "maybe_seen") -> DataFrame:
    return _shard_local(df, key, meta, out_col, "probe")


def delete_cuckoo_partitioned(df: DataFrame, key: Column, meta: dict,
                              out_col: str = "deleted") -> DataFrame:
    """Retract ``df``'s keys from the shard files in place (rewrite only
    touched shards). Returns per-row success; an eager action is required
    to apply (caller collects/counts, as with any Spark write)."""
    return _shard_local(df, key, meta, out_col, "delete")
