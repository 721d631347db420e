"""Distributed Bloom filter with vectorized (Arrow) membership probes.

Why not ``df.stat.bloomFilter``: the returned handle wraps a JVM object that
cannot be broadcast through the Python serializer, and probing it from Python
would be a row-at-a-time round trip. Here the two hash values are computed
JVM-side with ``xxhash64`` (whole-stage codegen), the bit array is a plain
numpy buffer built per-partition with ``mapInPandas`` and OR-merged, and the
membership probe is a numpy-vectorized pandas UDF over the broadcast buffer.

Double hashing (Kirsch-Mitzenmacher): bit_i(key) = (h1 + i·h2) mod m for
i < k — standard construction, false-positive rate ≈ (1 - e^{-kn/m})^k.

Scale note (10^10 keys): a single global filter at 10 bits/key is ~12 GB —
too big to broadcast, and even OR-merging per-partition bitmaps on the
driver is a 12 GB driver allocation. ``build_bloom_partitioned`` is the
cluster path: keys group by url-hash bucket, EACH EXECUTOR builds its
bucket's filter and writes it to a shared-storage file (the Iceberg puffin-
file pattern) — the driver never holds bits. The probe side repartitions
candidates by the same bucket id, and each task memory-maps ONLY its
bucket's file (~total/n_buckets, ~100 MB at 10^10 keys with 128 buckets).
Both variants reuse the same hash/bit kernels, and a false negative is
impossible in either, so the exact anti-join downstream stays correct.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for n items at target false-positive rate."""
    n_items = max(n_items, 1)
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    # round bits up to a multiple of 64 for clean word packing
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, min(k, 16)


def _hash_cols(key: Column) -> tuple[Column, Column]:
    # two independent 64-bit hashes, JVM-side
    return F.xxhash64(key, F.lit(1)), F.xxhash64(key, F.lit(2))


def _bit_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> Iterator[np.ndarray]:
    # unsigned view so the modulo is well-defined
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64)
    for i in range(k):
        yield ((u1 + np.uint64(i) * u2) % np.uint64(m)).astype(np.int64)


class NumpyBloom:
    """Immutable bit-array Bloom filter (uint64 word packing)."""

    def __init__(self, bits: np.ndarray, m: int, k: int):
        self.bits = bits  # uint64[m/64]
        self.m = m
        self.k = k

    @classmethod
    def empty(cls, m: int, k: int) -> "NumpyBloom":
        return cls(np.zeros(m // 64, dtype=np.uint64), m, k)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        for pos in _bit_positions(h1, h2, self.k, self.m):
            np.bitwise_or.at(self.bits, pos >> 6,
                             np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))

    def might_contain_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.ones(len(h1), dtype=bool)
        for pos in _bit_positions(h1, h2, self.k, self.m):
            word = self.bits[pos >> 6]
            mask = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
            out &= (word & mask) != 0
        return out

    def merge(self, other: "NumpyBloom") -> "NumpyBloom":
        assert self.m == other.m and self.k == other.k
        return NumpyBloom(self.bits | other.bits, self.m, self.k)


def build_bloom(df: DataFrame, key: Column, n_items: int, fpp: float = 0.01) -> NumpyBloom:
    """One pass over ``df``: per-partition bitmaps via mapInPandas, OR-merged
    on the driver. Each partition ships back m/8 bytes, not its rows."""
    m, k = optimal_params(n_items, fpp)
    h1c, h2c = _hash_cols(key)
    hashed = df.select(h1c.alias("h1"), h2c.alias("h2"))

    def _partition_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bloom = NumpyBloom.empty(m, k)
        saw = False
        for pdf in batches:
            if len(pdf):
                saw = True
                bloom.add_hashes(pdf["h1"].to_numpy(np.int64),
                                 pdf["h2"].to_numpy(np.int64))
        if saw:
            yield pd.DataFrame({"bits": [bloom.bits.tobytes()]})

    parts = hashed.mapInPandas(_partition_bitmap, "bits binary").collect()
    bloom = NumpyBloom.empty(m, k)
    for row in parts:
        bloom.bits |= np.frombuffer(row.bits, dtype=np.uint64)
    return bloom


def _bucket_col(key: Column, n_buckets: int) -> Column:
    # seed 0 keeps the bucket hash independent of the h1/h2 member hashes
    return F.pmod(F.xxhash64(key, F.lit(0)), F.lit(n_buckets)).cast("int")


def build_bloom_partitioned(df: DataFrame, key: Column, out_dir: str,
                            n_items: int, n_buckets: int = 16,
                            fpp: float = 0.01) -> dict:
    """Per-bucket Bloom build, executor-side end to end: keys shuffle once on
    ``bucket = xxhash64(key) % n_buckets``; each group task builds its
    bucket's bitmap and writes ``{out_dir}/bucket_{b}.bloom`` directly
    (shared storage on a cluster — the Iceberg puffin-file pattern). The
    driver receives only (bucket, n) rows, never bits. Returns
    ``{"m": bits_per_bucket, "k": hashes, "n_buckets": …, "dir": out_dir}``.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    m, k = optimal_params(max(n_items // n_buckets, 1), fpp)
    h1c, h2c = _hash_cols(key)
    hashed = df.select(_bucket_col(key, n_buckets).alias("b"),
                       h1c.alias("h1"), h2c.alias("h2"))

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["b"].iloc[0])
        bloom = NumpyBloom.empty(m, k)
        bloom.add_hashes(pdf["h1"].to_numpy(np.int64),
                         pdf["h2"].to_numpy(np.int64))
        tmp = os.path.join(out_dir, f".bucket_{b}.bloom.tmp")
        with open(tmp, "wb") as f:
            f.write(bloom.bits.tobytes())
        os.replace(tmp, os.path.join(out_dir, f"bucket_{b}.bloom"))
        return pd.DataFrame({"bucket": [b], "n": [len(pdf)]})

    built = hashed.groupBy("b").applyInPandas(_build, "bucket int, n long")
    built.collect()  # materialize = write all bucket files
    return {"m": m, "k": k, "n_buckets": n_buckets, "dir": out_dir}


def with_bloom_probe_partitioned(df: DataFrame, key: Column, meta: dict,
                                 out_col: str = "maybe_seen") -> DataFrame:
    """Bucket-local probe: candidates repartition on the same bucket id, and
    each task loads ONLY the bucket files its partition contains (one file
    resident at a time — memory per task ≈ total_filter_size/n_buckets).
    A missing bucket file means no seen key hashes there ⇒ definitely new."""
    import os

    m, k, n_buckets, d = meta["m"], meta["k"], meta["n_buckets"], meta["dir"]
    cols = df.columns
    hashed = df.withColumns({
        "__b": _bucket_col(key, n_buckets),
        "__h1": _hash_cols(key)[0],
        "__h2": _hash_cols(key)[1],
    }).repartition(F.col("__b"))

    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + \
        f", {out_col} boolean"

    def _probe(batches):
        cache: dict = {}
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=bool)
            for b in pdf["__b"].unique():
                b = int(b)
                if b not in cache:
                    cache.clear()  # one bucket resident at a time
                    path = os.path.join(d, f"bucket_{b}.bloom")
                    if os.path.exists(path):
                        with open(path, "rb") as f:
                            bits = np.frombuffer(f.read(), dtype=np.uint64)
                        cache[b] = NumpyBloom(bits, m, k)
                    else:
                        cache[b] = None
                filt = cache[b]
                mask = (pdf["__b"] == b).to_numpy()
                if filt is not None:
                    out[mask] = filt.might_contain_hashes(
                        pdf.loc[mask, "__h1"].to_numpy(np.int64),
                        pdf.loc[mask, "__h2"].to_numpy(np.int64))
            res = pdf.drop(columns=["__b", "__h1", "__h2"])
            res[out_col] = out
            yield res

    return hashed.mapInPandas(_probe, schema).select(*cols, out_col)


def with_bloom_probe(df: DataFrame, key: Column, bloom: NumpyBloom,
                     out_col: str = "maybe_seen") -> DataFrame:
    """Add a boolean column: True ⇒ key possibly in the built set (false
    positives possible, false negatives impossible)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((bloom.bits, bloom.m, bloom.k))

    @F.pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:  # pragma: no cover
        bits, m, k = bc.value
        filt = NumpyBloom(bits, m, k)
        return pd.Series(
            filt.might_contain_hashes(h1.to_numpy(np.int64), h2.to_numpy(np.int64))
        )

    h1c, h2c = _hash_cols(key)
    return df.withColumn(out_col, _probe(h1c, h2c))
