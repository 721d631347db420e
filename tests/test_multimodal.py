"""Multimodal plumbing: schema, batching, payload-aware partitioning,
frame sampling; decode stub contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators import multimodal as MM


def test_synth_media_schema(spark):
    df = MM.synth_media(spark, 30)
    assert df.count() == 30
    assert dict(df.dtypes)["payload"] == "binary"
    assert {r["kind"] for r in df.select("kind").distinct().collect()} == \
        {"image", "audio", "video"}


def test_extract_features_fake_kernel(spark):
    media = MM.synth_media(spark, 30)
    feats = MM.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    one = {r["media_id"]: r for r in rows}[0]
    assert one["n_bytes"] == len("PAYLOAD:") + 64  # sha2-256 hex
    assert 0 < one["byte_entropy"] < math.log2(256)
    assert one["header_hex"] == "5041594c"  # 'PAYL'


def test_extract_features_real_kernel_stubbed(spark):
    media = MM.synth_media(spark, 4)
    with pytest.raises(Exception) as ei:
        MM.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_repartition_for_payload(spark):
    media = MM.synth_media(spark, 64)
    out = MM.repartition_for_payload(media, target_bytes=500)
    assert out.rdd.getNumPartitions() > 1
    assert out.count() == 64


def test_sample_frames(spark):
    media = MM.synth_media(spark, 30)
    frames = MM.sample_frames(media, every_n=5)
    per = frames.groupBy("media_id").count()
    joined = per.join(media.select("media_id", "meta.n_frames"), "media_id")
    bad = joined.filter(
        F.col("count") != F.floor((F.col("n_frames") - 1) / 5) + 1).count()
    assert bad == 0


def test_bmp_kernel_roundtrip():
    from chrono_scraper_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
    )

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    d = decode_image(encode_bmp(2, 2, px))
    assert (d["width"], d["height"]) == (2, 2)
    assert d["mean_r"] == round((255 + 0 + 0 + 10) / 4, 4)
    assert d["mean_b"] == round((0 + 0 + 255 + 30) / 4, 4)


def test_wav_kernel_roundtrip():
    from chrono_scraper_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    d = decode_audio(encode_wav([0, 100, -100, 0], sample_rate=8000))
    assert d["sample_rate"] == 8000 and d["n_samples"] == 4
    assert d["rms"] == round((2 * 100 * 100 / 4) ** 0.5, 4)


def test_decode_features_stage(spark):
    from chrono_scraper_spark.operators.multimodal import (
        decode_features,
        synth_media_decodable,
    )

    media = synth_media_decodable(spark, 24)
    out = decode_features(media).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["decode_status"] == "ok" for r in by_kind["image"])
    assert all(r["width"] >= 4 and r["mean_r"] is not None
               for r in by_kind["image"])
    assert all(r["decode_status"] == "ok" and r["rms"] is not None
               for r in by_kind["audio"])
    # video dead-letters instead of failing the stage
    assert all(r["decode_status"] == "unsupported" for r in by_kind["video"])
    assert len(out) == 24


def test_dhash_identity_and_block_mean():
    """dHash on a grid-sized image is the raw comparison hash; a 2×-upscaled
    image (each cell → constant 2×2 block) hashes IDENTICALLY through the
    block-mean downsample — the scale-invariance dHash exists to provide."""
    import random

    from chrono_scraper_spark.operators.multimodal import dhash64, encode_bmp

    rng = random.Random(7)
    cells = [[rng.randrange(256) for _ in range(9)] for _ in range(8)]
    small = encode_bmp(9, 8, [(g, g, g) for row in cells for g in row])
    big = encode_bmp(18, 16, [(cells[y // 2][x // 2],) * 3
                              for y in range(16) for x in range(18)])
    expect = 0
    for y in range(8):
        for x in range(8):
            if cells[y][x] > cells[y][x + 1]:
                expect |= 1 << (y * 8 + x)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert dhash64(small) == expect
    assert dhash64(big) == expect


def test_dhash_luma_matches_grayscale():
    """Color pixels hash through the integer luma; a grayscale image built
    from each color pixel's luma value hashes identically."""
    import random

    from chrono_scraper_spark.operators.multimodal import dhash64, encode_bmp

    rng = random.Random(11)
    color = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(9 * 8)]
    gray = [((299 * r + 587 * g + 114 * b) // 1000,) * 3
            for (r, g, b) in color]
    assert dhash64(encode_bmp(9, 8, color)) == dhash64(encode_bmp(9, 8, gray))


def test_dhash_near_dups_planted_clusters(spark):
    """End-to-end: the 8 planted clusters (12 variants each) produce exactly
    the C(12,2)*8 = 528 same-cluster pairs, hamming ≤ 2, zero cross-cluster
    pairs; a malformed payload dead-letters and never reaches the join."""
    from pyspark.sql import functions as F

    from chrono_scraper_spark.operators.multimodal import (
        dhash_near_dups,
        image_dhash,
        synth_dhash_images,
    )

    media = synth_dhash_images(spark, 96)
    broken = spark.createDataFrame([(999, b"not a bmp")],
                                   "media_id long, payload binary")
    hashes = image_dhash(media.unionByName(broken))
    assert hashes.filter("media_id = 999").first()["decode_status"] \
        == "error:ValueError"
    pairs = dhash_near_dups(hashes).collect()
    assert len(pairs) == 528
    assert all(r["media_id_a"] % 8 == r["media_id_b"] % 8 for r in pairs)
    assert all(r["hamming"] <= 2 for r in pairs)
    assert not any(999 in (r["media_id_a"], r["media_id_b"]) for r in pairs)
    # pigeonhole guard rails
    import pytest

    with pytest.raises(ValueError, match="max_hamming < n_bands"):
        dhash_near_dups(hashes, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="divide 64"):
        dhash_near_dups(hashes, n_bands=5)


# ---------------------------------------------------------------------------
# ffmpeg-gated video decode (VERDICT r4 stretch #9)
# ---------------------------------------------------------------------------

def _fake_ffmpeg_runner(payload: bytes):
    """Deterministic stand-in for the piped ffmpeg process: a 4x2 gray
    frame whose luma ramps with the payload length, plus a banner line in
    ffmpeg's demuxer format. Module-level so the mapInPandas closure
    pickles."""
    frame = bytes((len(payload) + i) % 256 for i in range(8))
    banner = b"Stream #0:0: Video: h264 (High), yuv420p, 4x2 [SAR 1:1], 30 fps"
    return frame, banner


def test_decode_video_gated_without_ffmpeg():
    """No ffmpeg on PATH and no injected runner: the declared stub raises
    (dead-letter parity preserved)."""
    import pytest as _pytest

    from chrono_scraper_spark.operators.multimodal import (
        decode_video,
        ffmpeg_available,
    )

    if ffmpeg_available():  # pragma: no cover - container has no ffmpeg
        _pytest.skip("ffmpeg present: gate open")
    with _pytest.raises(NotImplementedError):
        decode_video(b"OPAQUE_VIDEO:123")


def test_decode_video_fake_kernel_parses_banner_and_frame():
    from chrono_scraper_spark.operators.multimodal import decode_video

    d = decode_video(b"OPAQUE_VIDEO:7", runner=_fake_ffmpeg_runner)
    assert (d["width"], d["height"]) == (4, 2)
    # frame bytes are (14+i) % 256 for i in 0..7 → mean = 14 + 3.5
    assert d["mean_luma"] == 17.5


def test_decode_video_rejects_bannerless_stream():
    import pytest as _pytest

    from chrono_scraper_spark.operators.multimodal import decode_video

    with _pytest.raises(ValueError):
        decode_video(b"x", runner=lambda p: (b"", b"no stream here"))
    with _pytest.raises(ValueError):
        decode_video(b"", runner=_fake_ffmpeg_runner)  # empty payload


def test_decode_features_video_rows_with_injected_kernel(spark):
    """With the process boundary injected, video rows decode to 'ok' with
    width/height/mean_r populated; image/audio paths are untouched."""
    from chrono_scraper_spark.operators.multimodal import (
        decode_features,
        synth_media_decodable,
    )

    media = synth_media_decodable(spark, n=12, partitions=2)
    out = decode_features(media, video_runner=_fake_ffmpeg_runner).collect()
    vids = [r for r in out if r["kind"] == "video"]
    assert vids and all(r["decode_status"] == "ok" for r in vids)
    assert all((r["width"], r["height"]) == (4, 2) for r in vids)
    assert all(r["mean_r"] is not None for r in vids)
    imgs = [r for r in out if r["kind"] == "image"]
    assert imgs and all(r["decode_status"] == "ok" for r in imgs)


def test_decode_features_video_deadletters_when_gated(spark):
    """Gate closed (no ffmpeg, no runner): byte-identical to the declared
    stub behavior — video rows dead-letter as 'unsupported'."""
    from chrono_scraper_spark.operators.multimodal import (
        decode_features,
        ffmpeg_available,
        synth_media_decodable,
    )

    if ffmpeg_available():  # pragma: no cover
        import pytest as _pytest

        _pytest.skip("ffmpeg present: gate open")
    media = synth_media_decodable(spark, n=9, partitions=2)
    out = decode_features(media).collect()
    vids = [r for r in out if r["kind"] == "video"]
    assert vids and all(r["decode_status"] == "unsupported" for r in vids)
