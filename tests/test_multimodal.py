"""Multimodal plumbing tests: binary columns + typed metadata, Arrow
batch shapes, one-to-many frame expansion, partition preservation, and
the REAL pure-numpy decode kernels (PPM/BMP/WAV) — including the full
disk -> binaryFile source -> media schema -> decode path. Compressed
codecs (JPEG/MP3) remain behind try-imports and are tested to raise."""

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
    # Output payloads are self-describing binary PNM (code-review r15):
    # P5 header "P5 16 8 255\n" (12 bytes) + the 16x8 grayscale raster.
    rows = resized.select(
        "meta.width", "meta.height", "meta.mime",
        F.length("payload").alias("n"),
    ).distinct().collect()
    assert {
        (r["width"], r["height"], r["mime"], r["n"]) for r in rows
    } == {(16, 8, "image/x-pgm", 12 + 128)}
    # downstream decode works on resized payloads unchanged
    feats = mm.decode_images(resized)
    assert feats.count() == resized.count()


def test_resize_preserves_rgb_channels(spark):
    """code-review r15 (confirmed by execution): resize stored the raw
    (h, w, 3) tobytes() raster with channel-less meta and the original
    mime, so a re-decode read ONE THIRD of an RGB payload as grayscale —
    mean_pixel silently wrong for every real PPM/BMP input. The payload
    is now self-describing P6, and the round-tripped mean must equal the
    resized raster's true mean."""
    import numpy as np

    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    ppm = b"P6 4 2 255\n" + rgb.tobytes()
    media = spark.createDataFrame(
        [(1, bytearray(ppm), ("image/x-ppm", 4, 2, 1, 0))],
        mm.MEDIA_SCHEMA,
    )
    resized = mm.resize_images(media, 4, 2)  # identity-size resize
    meta = resized.select("meta.mime").collect()[0]["mime"]
    assert meta == "image/x-ppm"
    feat = mm.decode_images(resized).collect()[0]
    assert feat["mean_pixel"] == float(rgb.mean())
    assert (feat["width"], feat["height"]) == (4, 2)


def test_zero_dim_pnm_raises(spark):
    """code-review r15: a corrupt header declaring a 0x0 raster decoded
    to an empty array whose mean() is a silent NaN — the faked-result
    class the module forbids. The parser must raise instead."""
    from pyspark.errors.exceptions.captured import PythonException

    bad = b"P5 0 0 255\n"
    media = spark.createDataFrame(
        [(1, bytearray(bad), ("image/x-pgm", 0, 0, 1, 0))],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(PythonException, match="corrupt PNM header"):
        mm.decode_images(media).collect()


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


# ---------------------------------------------------------------------------
# X31 binaryFile ingestion: disk files -> media schema -> real decoders
# ---------------------------------------------------------------------------

def test_binaryfile_source_to_decode(spark, tmp_path):
    """End-to-end media ingestion: write real PPM/BMP/WAV files to disk,
    read them with the Spark binaryFile source, bridge into MEDIA_SCHEMA,
    and run the real decode kernels — the full disk-to-features path."""
    from eprints_to_hyku_data_tool_spark.sources.io import read_binary_files

    (tmp_path / "a.ppm").write_bytes(_ppm_bytes())
    (tmp_path / "b.bmp").write_bytes(_bmp_bytes())
    (tmp_path / "c.wav").write_bytes(_wav_bytes())
    (tmp_path / "notes.txt").write_text("not media")

    files = read_binary_files(spark, str(tmp_path), glob="*.{ppm,bmp,wav}")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in files.collect()}
    assert set(rows) == {"a.ppm", "b.bmp", "c.wav"}
    assert rows["a.ppm"]["length"] == len(_ppm_bytes())
    assert bytes(rows["c.wav"]["content"]) == _wav_bytes()

    media = mm.media_from_files(files)
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,"
        "meta:struct<mime:string,width:int,height:int,n_frames:int,"
        "sample_rate:int>>"
    )
    by_mime = {r["meta"]["mime"]: r["doc_id"] for r in media.collect()}
    assert set(by_mime) == {"image/x-ppm", "image/bmp", "audio/wav"}
    # doc_id is a stable function of path: re-reading yields the same ids
    again = {r["meta"]["mime"]: r["doc_id"] for r in mm.media_from_files(
        read_binary_files(spark, str(tmp_path), glob="*.{ppm,bmp,wav}")
    ).collect()}
    assert again == by_mime

    imgs = mm.decode_images(
        media.filter(F.col("meta.mime").startswith("image/"))
    ).collect()
    stats = {(r["width"], r["height"]): r["mean_pixel"] for r in imgs}
    assert stats[(4, 2)] == pytest.approx(11.5)  # the PPM gradient
    assert (3, 2) in stats  # the BMP

    wav = mm.extract_audio_features(
        media.filter(F.col("meta.mime") == "audio/wav")
    ).collect()[0]
    assert wav["sample_rate"] == 8000 and wav["n_samples"] == 200


def test_text_source(spark, tmp_path):
    from eprints_to_hyku_data_tool_spark.sources.io import read_text

    (tmp_path / "x.txt").write_text("alpha\nbeta\n")
    (tmp_path / "y.txt").write_text("gamma\n")
    lines = read_text(spark, str(tmp_path / "*.txt"))
    assert sorted(r["value"] for r in lines.collect()) == [
        "alpha", "beta", "gamma"]
    whole = read_text(spark, str(tmp_path / "x.txt"), whole_text=True)
    assert whole.collect()[0]["value"] == "alpha\nbeta\n"


def test_unknown_format_without_dims_raises(spark):
    """code-review r13: an unrecognized magic with the zero-dim
    media_from_files meta must raise, not fake an empty (0,0) raster
    with NaN features."""
    import pytest

    import eprints_to_hyku_data_tool_spark.functions.multimodal as mm

    with pytest.raises(NotImplementedError, match="no ?\\n?.*declared"):
        mm._decode_raster(b"GIF89a....", 0, 0)


def test_assert_unique_doc_ids(spark):
    import pytest

    import eprints_to_hyku_data_tool_spark.functions.multimodal as mm

    ok = spark.createDataFrame([(1,), (2,)], "doc_id long")
    mm.assert_unique_doc_ids(ok)  # no raise
    dup = spark.createDataFrame([(1,), (1,)], "doc_id long")
    with pytest.raises(ValueError, match="doc_id collision"):
        mm.assert_unique_doc_ids(dup)


def test_to_pnm_rejects_non_rgb_uint8(spark):
    """code-review r15 (second pass): an RGBA or 16-bit raster (possible
    via the PIL dispatch) would serialize to a P6 whose re-decode reads
    w*h*3 bytes from a LARGER buffer — silently wrong pixels. The
    serializer must refuse anything but uint8 gray/RGB."""
    import numpy as np

    with pytest.raises(ValueError, match="binary PNM"):
        mm._to_pnm(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA
    with pytest.raises(ValueError, match="binary PNM"):
        mm._to_pnm(np.zeros((2, 2, 3), dtype=np.uint16))  # 16-bit
    payload, mime = mm._to_pnm(np.zeros((2, 2, 3), dtype=np.uint8))
    assert payload.startswith(b"P6") and mime == "image/x-ppm"
