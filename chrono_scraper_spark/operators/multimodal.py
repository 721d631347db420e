"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED in this
container (no image/audio libs — each stub raises ``NotImplementedError``
unless the deterministic fake is requested), but the Spark-side plumbing is
real and tested: schema, batch shape, partition sizing, and the UDF
signatures are exactly what a PIL/ffmpeg-backed kernel would drop into.

Scale notes: MB-scale payloads mean Arrow batches must stay small
(maxRecordsPerBatch=256, session.py) and partitions should target
~128 MB of payload — ``repartition_for_payload`` computes the partition
count from the actual byte volume instead of guessing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, sample_rate:int, "
                "n_frames:int, codec:string>")

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "byte_entropy double, header_hex string")


def synth_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id —
    stands in for WARC-extracted images/audio until real corpora exist."""
    df = spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.encode(
            F.concat(F.lit("PAYLOAD:"),
                     F.sha2(F.col("id").cast("string"), 256)),
            "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("id"), F.lit(8)) * 160 + 160).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(5)) * 120 + 120).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id"), F.lit(30)) + 1).cast("int").alias("n_frames"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )
    return df


def repartition_for_payload(df: DataFrame, payload_col: str = "payload",
                            target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Partition count from measured payload volume (one cheap agg), so a
    decode stage's partitions hold ~target_bytes regardless of row width."""
    total = df.agg(F.sum(F.length(payload_col))).first()[0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)


def decode_image(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real kernel: PIL.Image.open(BytesIO(payload)) → pixel array.
    Not available in this container."""
    raise NotImplementedError("image decode requires PIL — stubbed")


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas.

    ``fake=True`` computes deterministic byte-level features (length,
    entropy proxy, header bytes) — the real decode slot is the same
    iterator shape with ``decode_image`` swapped in. Batches arrive
    Arrow-sized; each yielded frame mirrors one input batch.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode kernels unavailable in this container")
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                b = bytes(payload or b"")
                counts: dict = {}
                for x in b:
                    counts[x] = counts.get(x, 0) + 1
                n = max(len(b), 1)
                ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
                feats.append((mid, kind, len(b), round(ent, 6),
                              b[:4].hex()))
            yield pd.DataFrame(
                feats, columns=["media_id", "kind", "n_bytes",
                                "byte_entropy", "header_hex"])

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plumbing: explode frame indices 0..n_frames-1 step
    ``every_n`` per video row (JVM-side); the per-frame decode slot is a
    downstream mapInPandas exactly like ``extract_features``."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1,
                       F.lit(every_n))).alias("frame_idx"),
        "payload",
    )
