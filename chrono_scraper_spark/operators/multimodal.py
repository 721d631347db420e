"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages.

Decode kernels: ``decode_image`` is a REAL dependency-free 24-bpp BMP
parser and ``decode_audio`` a REAL PCM WAV parser (struct-module only —
this container has no PIL/ffmpeg, and these two formats need none). Video
decode has no dependency-free container format worth hand-rolling; it stays
a declared stub and ``decode_features`` dead-letters those rows with
``decode_status='unsupported'`` instead of failing the stage. Swapping in
PIL/ffmpeg later replaces the two kernel functions; schema, batch shape,
partition sizing and UDF signatures are unchanged.

Scale notes: MB-scale payloads mean Arrow batches must stay small
(maxRecordsPerBatch, session.py) and partitions should target
~128 MB of payload — ``repartition_for_payload`` computes the partition
count from the actual byte volume instead of guessing.
"""

from __future__ import annotations

import re
import struct
import subprocess as _subprocess
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


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]
               ) -> bytes:
    """Minimal 24-bpp uncompressed BMP writer (row-major, top-to-bottom
    input; BMP stores bottom-up). Used by synth_media_decodable and tests."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    img = b""
    for y in range(height - 1, -1, -1):  # bottom-up
        row = b"".join(
            struct.pack("<BBB", *reversed(pixels[y * width + x]))  # BGR
            for x in range(width))
        img += row + b"\x00" * pad
    header_size = 14 + 40
    file_size = header_size + len(img)
    return (b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(img), 2835, 2835, 0, 0)
            + img)


def decode_image(payload: bytes) -> dict:
    """Dependency-free 24-bpp BMP decode: header-validated dimensions +
    per-channel pixel means. (A PIL-backed kernel drops in here for other
    formats; the signature and output dict are the contract.)"""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr, width, height, planes, bpp) = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp} (24-bpp kernel)")
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    tot = [0, 0, 0]
    n = 0
    for y in range(abs(height)):
        base = pixel_off + y * (row_bytes + pad)
        for x in range(width):
            b, g, r = payload[base + 3 * x: base + 3 * x + 3]
            tot[0] += r
            tot[1] += g
            tot[2] += b
            n += 1
    return {"width": width, "height": abs(height),
            "mean_r": round(tot[0] / n, 4), "mean_g": round(tot[1] / n, 4),
            "mean_b": round(tot[2] / n, 4)}


def encode_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Minimal PCM16 mono WAV writer."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_audio(payload: bytes) -> dict:
    """Dependency-free PCM16 WAV decode: header fields + amplitude stats."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    (_sz, fmt, channels, rate, _br, _ba, bits) = struct.unpack_from(
        "<IHHIIHH", payload, 16)
    if fmt != 1 or bits != 16:
        raise ValueError("PCM16 kernel only")
    data_off = payload.find(b"data", 12)
    n_bytes = struct.unpack_from("<I", payload, data_off + 4)[0]
    raw = payload[data_off + 8: data_off + 8 + n_bytes]
    samples = [struct.unpack_from("<h", raw, i)[0]
               for i in range(0, len(raw) - 1, 2)]
    n = max(len(samples), 1)
    rms = (sum(s * s for s in samples) / n) ** 0.5
    return {"sample_rate": rate, "channels": channels,
            "n_samples": len(samples), "rms": round(rms, 4)}


def ffmpeg_available() -> bool:
    """Binary-gated (mirrors real_extractors' import gating): the real
    video kernel activates only when an ``ffmpeg`` binary is on PATH."""
    import shutil

    return shutil.which("ffmpeg") is not None


_FFMPEG_DIMS = re.compile(r", (\d{1,5})x(\d{1,5})[ ,\[]")


def _run_ffmpeg(payload: bytes) -> tuple[bytes, bytes]:  # pragma: no cover
    """One first-frame grayscale decode through a piped ffmpeg process.
    Isolated so tests can substitute a deterministic fake kernel — the
    container ships no ffmpeg (TESTDATA.md environment contract)."""
    import subprocess

    proc = subprocess.run(
        ["ffmpeg", "-v", "info", "-i", "pipe:0", "-f", "rawvideo",
         "-pix_fmt", "gray", "-frames:v", "1", "pipe:1"],
        input=payload, capture_output=True, timeout=30)
    return proc.stdout, proc.stderr


def decode_video(payload: bytes, *, runner=None) -> dict:
    """ffmpeg-backed video kernel (VERDICT r4 stretch #9): decode the first
    frame to 8-bit grayscale via a piped ffmpeg run, parse the stream
    dimensions from the demuxer banner, and reduce the frame to a mean-luma
    scalar — the video analog of ``decode_image``'s ``mean_r``.

    Gated on ``ffmpeg_available()`` by ``decode_features``; calling it with
    no ffmpeg on PATH (and no injected ``runner``) raises the declared
    ``NotImplementedError`` so dead-letter semantics are unchanged.
    ``runner`` injects the process boundary for deterministic unit tests.
    """
    if runner is None:
        if not ffmpeg_available():
            raise NotImplementedError("video decode requires ffmpeg — gated")
        runner = _run_ffmpeg
    if payload is None or len(payload) == 0:
        raise ValueError("empty video payload")
    frame, banner = runner(bytes(payload))
    m = _FFMPEG_DIMS.search(banner.decode("utf-8", "replace"))
    if m is None or not frame:
        raise ValueError("ffmpeg produced no decodable stream")
    width, height = int(m.group(1)), int(m.group(2))
    if len(frame) < width * height:
        raise ValueError("short frame read")
    px = frame[: width * height]
    return {"width": width, "height": height,
            "mean_luma": round(sum(px) / len(px), 4)}


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Byte-level feature extraction over media payloads via mapInPandas
    (length, entropy, header bytes) — format-agnostic, works on opaque
    payloads; the FORMAT-AWARE decode stage is ``decode_features`` (real
    BMP/WAV kernels). ``fake=True`` is kept for the oracle contract query,
    whose payloads are sha256-derived strings DuckDB can regenerate.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "use decode_features for format-aware extraction")
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


def synth_media_decodable(spark, n: int = 32, partitions: int = 4
                          ) -> DataFrame:
    """Deterministic media table whose image/audio payloads are REAL BMP /
    WAV bytes (decodable by the kernels above); video payloads stay opaque.
    Built with an Arrow mapInPandas over the id range (binary synthesis is
    Python, like a WARC media extraction stage would be)."""
    base = spark.range(0, n, 1, partitions).select(F.col("id"))

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    w, h = 4 + i % 4, 2 + i % 3
                    px = [((x * 37 + i) % 256, (y * 91 + i) % 256,
                           (x * y + i) % 256)
                          for y in range(h) for x in range(w)]
                    payload = encode_bmp(w, h, px)
                elif kind == "audio":
                    payload = encode_wav(
                        [((i * 131 + j * 977) % 2048) - 1024
                         for j in range(16 + i % 16)])
                else:
                    payload = b"OPAQUE_VIDEO:" + str(i).encode() * 4
                rows.append((i, kind, payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return base.mapInPandas(_synth, "media_id long, kind string, payload binary")


DECODE_SCHEMA = ("media_id long, kind string, decode_status string, "
                 "width int, height int, mean_r double, sample_rate int, "
                 "n_samples int, rms double")


def decode_features(media: DataFrame, *, video_runner=None) -> DataFrame:
    """REAL decode stage over mapInPandas: BMP images → dimensions + channel
    means; WAV audio → rate/length/RMS; video → the ffmpeg-gated kernel when
    an ffmpeg binary is on PATH (first-frame mean luma lands in ``mean_r``),
    else a dead-letter row with ``decode_status='unsupported'`` — malformed
    payloads dead-letter with the error class instead of failing the stage
    (E12 semantics applied to media). ``video_runner`` injects a fake
    process boundary for unit tests (container ships no ffmpeg)."""
    use_video = video_runner is not None or ffmpeg_available()

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                mid = int(mid)
                b = bytes(payload or b"")
                try:
                    if kind == "image":
                        d = decode_image(b)
                        rows.append((mid, kind, "ok", d["width"],
                                     d["height"], d["mean_r"], None, None,
                                     None))
                    elif kind == "audio":
                        d = decode_audio(b)
                        rows.append((mid, kind, "ok", None, None, None,
                                     d["sample_rate"], d["n_samples"],
                                     d["rms"]))
                    elif kind == "video" and use_video:
                        d = decode_video(b, runner=video_runner)
                        rows.append((mid, kind, "ok", d["width"],
                                     d["height"], d["mean_luma"], None,
                                     None, None))
                    else:
                        rows.append((mid, kind, "unsupported", None, None,
                                     None, None, None, None))
                except (ValueError, NotImplementedError, OSError,
                        _subprocess.SubprocessError) as e:
                    # OSError/SubprocessError: ffmpeg missing on THIS
                    # executor or a hostile payload hitting the pipe
                    # timeout — one bad row must not fail the stage
                    rows.append((mid, kind, f"error:{type(e).__name__}",
                                 None, None, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "decode_status", "width",
                               "height", "mean_r", "sample_rate",
                               "n_samples", "rms"])

    return media.mapInPandas(_decode, DECODE_SCHEMA)


# --------------------------------------------------------------------------
# Image near-duplicate detection: 64-bit dHash (difference hash) over the
# real BMP kernel, Hamming-bucketed candidate join (pigeonhole-complete).
# --------------------------------------------------------------------------

def bmp_gray_grid(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """24-bpp BMP → integer luma grid ((299r+587g+114b)//1000 — exact
    identity on grayscale pixels since the weights sum to 1000), row-major
    TOP-to-bottom (BMP positive height stores rows bottom-up; negative
    height is already top-down)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    (_hdr, width, height, _planes, bpp) = struct.unpack_from(
        "<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp} (24-bpp kernel)")
    h = abs(height)
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    grid = []
    for y in range(h):
        sy = (h - 1 - y) if height > 0 else y
        base = pixel_off + sy * (row_bytes + pad)
        row = []
        for x in range(width):
            b, g, r = payload[base + 3 * x: base + 3 * x + 3]
            row.append((299 * r + 587 * g + 114 * b) // 1000)
        grid.append(row)
    return width, h, grid


def dhash64(payload: bytes, grid_w: int = 9, grid_h: int = 8) -> int:
    """64-bit difference hash of a BMP payload: block-mean downsample to a
    ``grid_w × grid_h`` luma grid (integer floor means — identity when the
    image is exactly grid-sized), then bit ``y*(grid_w-1)+x`` = 1 iff
    ``cell[y][x] > cell[y][x+1]``. Returned as a two's-complement int64.
    Perceptually-similar images (crops aside) differ in few bits — the
    standard image-dedup signature for media-rich crawls."""
    w, h, grid = bmp_gray_grid(payload)
    if w < grid_w or h < grid_h:
        raise ValueError(f"image {w}x{h} smaller than {grid_w}x{grid_h}")
    cells = []
    for cy in range(grid_h):
        y0, y1 = cy * h // grid_h, (cy + 1) * h // grid_h
        row = []
        for cx in range(grid_w):
            x0, x1 = cx * w // grid_w, (cx + 1) * w // grid_w
            s = sum(grid[y][x] for y in range(y0, y1) for x in range(x0, x1))
            row.append(s // ((y1 - y0) * (x1 - x0)))
        cells.append(row)
    hsh = 0
    for cy in range(grid_h):
        for cx in range(grid_w - 1):
            if cells[cy][cx] > cells[cy][cx + 1]:
                hsh |= 1 << (cy * (grid_w - 1) + cx)
    return hsh - (1 << 64) if hsh >= (1 << 63) else hsh


def synth_dhash_images(spark, n: int = 96, partitions: int = 4) -> DataFrame:
    """Deterministic REAL-BMP image table for the dHash contract: ``n``
    9×8 grayscale images in 8 clusters of ``n//8`` variants. Cluster =
    ``media_id % 8`` (its own base pattern); variant ``v = media_id // 8``
    ≥ 1 perturbs ONE last-column pixel (+128 mod 256), which feeds exactly
    one dHash comparison — so same-cluster pairs sit ≤ 2 bits apart and
    cross-cluster pairs ≥ 22 (measured). The arithmetic pixel definition is
    re-computable in SQL, giving the encode→decode→hash path a full oracle."""
    base = spark.range(0, n, 1, partitions)

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                gid, v = i % 8, i // 8
                px = []
                for y in range(8):
                    for x in range(9):
                        g = (17 * gid * (x + 1) + 31 * x * x + 57 * y
                             + 13 * x * y + 29 * gid * y) % 256
                        if v >= 1 and x == 8 and y == (v - 1) % 8:
                            g = (g + 128) % 256
                        px.append((g, g, g))
                rows.append((i, encode_bmp(9, 8, px)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return base.mapInPandas(_synth, "media_id long, payload binary")


DHASH_SCHEMA = "media_id long, dhash long, decode_status string"


def image_dhash(media: DataFrame, grid_w: int = 9, grid_h: int = 8
                ) -> DataFrame:
    """dHash stage over mapInPandas (one Arrow crossing; payloads never
    shuffle — the hash is 8 bytes/row from here on). Malformed payloads
    dead-letter with ``decode_status`` (E12 semantics), null hash."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rows.append((int(mid),
                                 dhash64(bytes(payload or b""),
                                         grid_w, grid_h), "ok"))
                except ValueError as e:
                    rows.append((int(mid), None,
                                 f"error:{type(e).__name__}"))
            yield pd.DataFrame(
                rows, columns=["media_id", "dhash", "decode_status"])

    return media.mapInPandas(_hash, DHASH_SCHEMA)


def dhash_near_dups(hashes: DataFrame, max_hamming: int = 3,
                    n_bands: int = 4, id_col: str = "media_id",
                    hash_col: str = "dhash") -> DataFrame:
    """Near-dup image pairs within ``max_hamming`` bits, found WITHOUT the
    n² cross join: split each 64-bit hash into ``n_bands`` equal bands and
    self-join on (band, value) buckets — the pigeonhole principle makes
    this EXACT (not approximate) when ``max_hamming < n_bands``: a pair
    differing in < n_bands bits must agree on ≥ 1 whole band. Candidates
    then verify with one codegen ``bit_count(a ^ b)``. Shuffle cost ∝
    bucket collisions, not n²; same shape as SimHash's pigeonhole join
    (text_dedup.py). All JVM-side after the hash stage."""
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})")
    width = 64 // n_bands
    mask = (1 << width) - 1
    ok = hashes.filter(F.col(hash_col).isNotNull()).select(id_col, hash_col)
    banded = ok.select(
        F.col(id_col), F.col(hash_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftright(F.col(hash_col), k * width)
                .bitwiseAND(F.lit(mask)).alias("val"))
            for k in range(n_bands)])).alias("bv"),
    ).select(id_col, hash_col, "bv.band", "bv.val")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.val") == F.col("b.val"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias(f"{id_col}_a"),
                F.col(f"b.{id_col}").alias(f"{id_col}_b"),
                F.col(f"a.{hash_col}").alias("_ha"),
                F.col(f"b.{hash_col}").alias("_hb"))
        .distinct())
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (cands.select(f"{id_col}_a", f"{id_col}_b",
                         ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


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
