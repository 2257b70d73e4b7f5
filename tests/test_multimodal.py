"""Multimodal plumbing tests: binary columns + typed metadata, Arrow
batch shapes, one-to-many frame expansion, partition preservation. The
decode kernel is a documented stub (no image libs in this container); the
Spark-side machinery under test is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType

from eprints_to_hyku_data_tool_spark.functions import multimodal as mm
from eprints_to_hyku_data_tool_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media(load_table(spark, sf_dir, "documents")).cache()


def test_media_schema(media):
    assert isinstance(media.schema["payload"].dataType, BinaryType)
    meta = media.schema["meta"].dataType
    assert isinstance(meta, StructType)
    assert [f.name for f in meta.fields] == [
        "mime",
        "width",
        "height",
        "n_frames",
        "sample_rate",
    ]


def test_decode_features_deterministic(spark, media):
    out = mm.decode_images(media)
    assert out.count() == media.count()
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    again = mm.decode_images(media).filter(F.col("doc_id") == 0).collect()[0]
    assert row["mean_pixel"] == again["mean_pixel"]
    assert sum(row["histogram"]) == row["width"] * row["height"]
    # payload bytes are printable utf-8 text -> every pixel in bin 0-127
    assert row["histogram"][2] == row["histogram"][3] == 0


def test_resize_shapes(media):
    resized = mm.resize_images(media, 16, 8)
    rows = resized.select("meta.width", "meta.height", F.length("payload").alias("n")).distinct().collect()
    assert {(r["width"], r["height"], r["n"]) for r in rows} == {(16, 8, 128)}
    # downstream decode works on resized payloads unchanged
    feats = mm.decode_images(resized)
    assert feats.count() == resized.count()


def test_frame_sampling_counts(media):
    frames = mm.sample_frames(media, every_n=2)
    got = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(media.select("doc_id", "meta.n_frames"), "doc_id")
        .collect()
    )
    for r in got:
        assert r["n"] == (r["n_frames"] + 1) // 2  # every 2nd frame, 0-based
    # frames are non-overlapping slices of the payload
    one = frames.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    assert len({r["frame_idx"] for r in one}) == len(one)


def test_partition_preservation(media):
    repart = media.repartition(7)
    decoded = mm.decode_images(repart)
    assert decoded.rdd.getNumPartitions() == 7


def test_compressed_audio_without_codec_raises(spark, media):
    # fixture payloads are raw text bytes (not RIFF): the non-WAV path
    # needs soundfile, absent here -> NotImplementedError from the
    # executor, surfaced as a PythonException
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="soundfile"):
        mm.extract_audio_features(media).collect()


# ---------------------------------------------------------------------------
# REAL decode kernels (round 3): pure-numpy PPM / BMP / WAV parsers with
# deterministic spec-built fixtures and exact expected statistics.
# ---------------------------------------------------------------------------

def _ppm_bytes() -> bytes:
    # 4x2 RGB, pixel values 0..23 row-major; header exercises comments
    return b"P6\n# fixture gradient\n4 2\n255\n" + bytes(range(24))


def _bmp_bytes() -> bytes:
    # 3x2 24-bit bottom-up BMP with 3-byte row padding (row stride 12)
    import struct

    w, h = 3, 2
    row = (w * 3 + 3) & ~3
    # pixel (x, y) = RGB (10x+1, 10x+2, 10x+3) + 100*y, stored BGR bottom-up
    def px(x, y):
        r, g, b = 10 * x + 1 + 100 * y, 10 * x + 2 + 100 * y, 10 * x + 3 + 100 * y
        return bytes([b, g, r])

    raster = b"".join(
        b"".join(px(x, y) for x in range(w)) + b"\x00" * (row - w * 3)
        for y in reversed(range(h))
    )
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


def _wav_bytes() -> bytes:
    # PCM16 mono 8 kHz square wave: +1000/-1000 alternating, 200 samples
    import struct

    import numpy as np

    samples = np.tile(np.array([1000, -1000], dtype="<i2"), 100)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_parse_pnm_exact():
    raster = mm._parse_pnm(_ppm_bytes())
    assert raster.shape == (2, 4, 3)
    assert raster.ravel().tolist() == list(range(24))


def test_parse_bmp_exact():
    raster = mm._parse_bmp(_bmp_bytes())
    assert raster.shape == (2, 3, 3)
    # bottom-up storage unflipped: raster[0] is the top row (y=0)
    assert raster[0, :, 0].tolist() == [1, 11, 21]  # top row, R channel
    assert raster[1, :, 2].tolist() == [103, 113, 123]  # bottom row, B channel


def test_parse_wav_exact():
    samples, rate = mm._parse_wav_pcm(_wav_bytes())
    assert rate == 8000 and samples.shape == (200, 1)
    assert samples[0, 0] == 1000 and samples[1, 0] == -1000


def _media_df(spark, payload: bytes, mime: str):
    return spark.createDataFrame(
        [(0, bytearray(payload), (mime, 4, 2, 2, 8000))], mm.MEDIA_SCHEMA
    )


def test_decode_images_real_ppm_through_spark(spark):
    row = mm.decode_images(_media_df(spark, _ppm_bytes(), "image/x-ppm")).collect()[0]
    # dimensions come from the FILE header, not meta
    assert (row["width"], row["height"]) == (4, 2)
    assert row["mean_pixel"] == pytest.approx(11.5)
    assert row["histogram"] == [24, 0, 0, 0]  # all values < 64


def test_decode_images_real_bmp_through_spark(spark):
    row = mm.decode_images(_media_df(spark, _bmp_bytes(), "image/bmp")).collect()[0]
    assert (row["width"], row["height"]) == (3, 2)
    expected = sum(
        10 * x + c + 100 * y for x in range(3) for y in range(2) for c in (1, 2, 3)
    ) / 18.0
    assert row["mean_pixel"] == pytest.approx(expected)


def test_audio_features_real_wav_through_spark(spark):
    row = mm.extract_audio_features(
        _media_df(spark, _wav_bytes(), "audio/wav")
    ).collect()[0]
    assert row["sample_rate"] == 8000
    assert row["n_channels"] == 1
    assert row["n_samples"] == 200
    assert row["duration_s"] == pytest.approx(0.025)
    assert row["rms"] == pytest.approx(1000.0)
    assert row["peak"] == 1000
    assert row["zero_crossing_rate"] == pytest.approx(1.0)
