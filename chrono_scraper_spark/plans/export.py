"""Training-corpus export job: the pipeline a 100 TB webtext corpus runs
between "crawled pages" and "tokenizer-ready shards".

Composes the LLM-data operators into one deterministic plan:

1. **Quality gate** — Gopher/MassiveText rules (``quality.gopher_signals``),
   zero-shuffle projection.
2. **Exact dedup** — md5 fingerprint collapse, keep lowest id
   (``text_dedup.exact_duplicates``).
3. **Near-dup representative selection** — MinHash-LSH candidates →
   connected components → quality-aware keep (longest doc per cluster,
   ``text_dedup.dedup_keep_best``).
4. **Shard assignment** — byte-offset prefix sum → fixed-size shard ids
   (``quality.assign_shards``), then ONE write where every output task owns
   whole shards: ``repartition(shard)`` + ``partitionBy(shard)``.

Reference parity: this is the batch analog of the reference's
project-export path (chrono-scraper exports a project's pages as a
flat corpus; backend/app/services — project page dumps), re-expressed as
the dedup→filter→shard pipeline a training-data consumer needs.

Scale notes: stages 1-2 shuffle only fingerprints; stage 3's candidate
space is banded (shuffle ∝ candidate pairs, never n²); stage 4 is one
range exchange + one hash exchange on the shard id. Nothing collects rows
to the driver (the prefix-sum collect is O(#partitions)).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import quality as Q
from ..operators import text_dedup as TD


@dataclass
class ExportStats:
    """Row accounting per stage — the lineage record an export commits
    alongside its shards (counters, not row collects)."""
    n_input: int = 0
    n_quality_pass: int = 0
    n_after_exact: int = 0
    n_after_neardup: int = 0
    n_shards: int = 0
    by_stage: dict = field(default_factory=dict)


def export_corpus(docs: DataFrame, out_dir: str, *,
                  shard_bytes: int = 1 << 20,
                  minhash_hashes: int = 12, minhash_bands: int = 6,
                  jaccard_threshold: float = 0.5,
                  quality_gate: bool = True,
                  id_col: str = "doc_id", text_col: str = "text",
                  ) -> ExportStats:
    """Run the full export pipeline and write ``out_dir`` as parquet
    partitioned by ``shard``. Deterministic end-to-end: same input ⇒ same
    surviving doc set, same shard assignment, same bytes.

    Returns per-stage row counts (aggregates only — no row collects)."""
    stats = ExportStats(n_input=docs.count())

    # 1. quality gate (zero-shuffle projection)
    if quality_gate:
        gated = (Q.gopher_signals(docs, text_col=text_col)
                 .filter(F.col("passes_gopher"))
                 .select(id_col, text_col))
    else:
        gated = docs.select(id_col, text_col)
    stats.n_quality_pass = gated.count()

    # 2. exact dedup: fingerprint collapse, keep lowest id per digest
    exact = TD.exact_duplicates(gated, id_col=id_col, text_col=text_col)
    kept_exact = (gated.join(
        exact.filter(~F.col("is_canonical")).select(id_col),
        id_col, "left_anti"))
    stats.n_after_exact = kept_exact.count()

    # 3. near-dup clusters → keep the longest doc per cluster
    pairs = TD.minhash_near_duplicates(
        kept_exact, n_hashes=minhash_hashes, bands=minhash_bands,
        threshold=jaccard_threshold, id_col=id_col, text_col=text_col)
    keep = TD.dedup_keep_best(
        kept_exact.withColumn("quality", F.length(text_col)),
        pairs, quality_col="quality", id_col=id_col)
    survivors = (kept_exact
                 .join(keep.filter(F.col("keep")).select(id_col),
                       id_col, "left_semi"))
    stats.n_after_neardup = survivors.count()

    # 4. deterministic sharding + whole-shard output tasks
    sharded = Q.assign_shards(survivors, shard_bytes=shard_bytes,
                              id_col=id_col, text_col=text_col)
    out = (survivors.join(sharded.select(id_col, "shard"), id_col)
           .repartition(F.col("shard")))
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    if getattr(sharded, "_pack_cache", None) is not None:
        sharded._pack_cache.unpersist()

    written = out.sparkSession.read.parquet(out_dir)
    stats.n_shards = written.select("shard").distinct().count()
    stats.by_stage = {
        "input": stats.n_input,
        "quality_pass": stats.n_quality_pass,
        "after_exact_dedup": stats.n_after_exact,
        "after_neardup": stats.n_after_neardup,
        "shards": stats.n_shards,
    }
    return stats
