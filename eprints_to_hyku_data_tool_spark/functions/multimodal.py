"""Multimodal (image/audio/video) column plumbing (assignment mandate).

Real decoders (PIL/ffmpeg/soundfile) are NOT in this container, so the
DECODE KERNELS are stubbed: `_decode_raster` derives a deterministic fake
raster from the payload bytes, and the library-backed paths raise
NotImplementedError behind an import-try. Everything AROUND the kernel is
real and tested — binary columns with typed metadata, Arrow batch shapes,
mapInPandas one-to-many frame expansion, partition-preserving execution —
so swapping in a real decoder is a one-function change.

Design for 100 TB:
- media is an opaque `binary` column + a typed `meta` struct; filters and
  joins run on metadata columns so pruning happens without touching bytes;
- decode/resize/extract are mapInPandas stages (Arrow-batched, one python
  process per partition — never per-row round trips);
- frame sampling is the one row-multiplying stage and is bounded by
  meta.n_frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<mime:string, width:int, height:int, n_frames:int, sample_rate:int>"
)

DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, mean_pixel double, histogram array<bigint>"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def synthesize_media(docs: DataFrame, mime: str = "image/fake") -> DataFrame:
    """Derive a deterministic binary `payload` + typed `meta` from the
    documents fixture (payload = utf-8 text bytes; dimensions from
    n_chars). Stands in for reading real media files; the downstream
    plumbing neither knows nor cares."""
    width = F.least(F.col("n_chars").cast("int"), F.lit(64))
    height = (F.col("n_chars").cast("int") / width).cast("int") + 1
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            width.alias("width"),
            height.alias("height"),
            (F.col("doc_id") % 8 + 2).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_raster(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODE KERNEL — deterministic fake: interpret payload bytes as
    a row-major uint8 grayscale raster, zero-padded/truncated to
    (height, width). A real implementation would be:
        from PIL import Image; np.asarray(Image.open(io.BytesIO(payload)))
    (PIL is not installed in this container).
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if len(buf) < need:
        buf = np.pad(buf, (0, need - len(buf)))
    return buf[:need].reshape(height, width)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per image: mean pixel and a 4-bin
    histogram. One Arrow batch -> one numpy pass per image; output schema
    is fixed (DECODED_SCHEMA) regardless of decoder."""

    def gen(batches):
        for pdf in batches:
            out = {
                "doc_id": [],
                "width": [],
                "height": [],
                "mean_pixel": [],
                "histogram": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                raster = _decode_raster(payload, meta["width"], meta["height"])
                out["doc_id"].append(doc_id)
                out["height"].append(raster.shape[0])
                out["width"].append(raster.shape[1])
                out["mean_pixel"].append(float(raster.mean()))
                out["histogram"].append(
                    np.histogram(raster, bins=4, range=(0, 256))[0].tolist()
                )
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "width": "int32", "height": "int32"}
            )

    return media.mapInPandas(gen, DECODED_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on the (fake) raster; returns new payloads
    with updated meta. The resampling math is real numpy — only the
    decode kernel is stubbed."""

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "payload": [], "meta": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                raster = _decode_raster(payload, meta["width"], meta["height"])
                ys = (np.arange(out_h) * raster.shape[0] // out_h).clip(
                    0, raster.shape[0] - 1
                )
                xs = (np.arange(out_w) * raster.shape[1] // out_w).clip(
                    0, raster.shape[1] - 1
                )
                resized = raster[np.ix_(ys, xs)]
                rows["doc_id"].append(doc_id)
                rows["payload"].append(resized.tobytes())
                rows["meta"].append(
                    {
                        "mime": meta["mime"],
                        "width": out_w,
                        "height": out_h,
                        "n_frames": meta["n_frames"],
                        "sample_rate": meta["sample_rate"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Treat the payload as meta.n_frames equal slices ('video') and emit
    every n-th slice — the one-to-many frame-sampling stage (bounded by
    n_frames, the only row multiplier in the media path)."""

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                n = max(int(meta["n_frames"]), 1)
                step = max(len(payload) // n, 1)
                for idx in range(0, n, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(payload[idx * step : (idx + 1) * step])
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_idx": "int32"}
            )

    return media.mapInPandas(gen, FRAME_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction requires a real codec — NOT stubbed with a
    fake because fake spectral features would be misleading. Raises unless
    soundfile is installed (it is not, in this container)."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode needs the 'soundfile' package (not available in "
            "this environment); image-style plumbing in decode_images shows "
            "the intended mapInPandas shape"
        ) from exc
    raise NotImplementedError("real audio path not implemented yet")
