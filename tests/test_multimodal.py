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


def test_audio_stub_raises(media):
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm.extract_audio_features(media)
