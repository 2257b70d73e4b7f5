"""Multimodal (image/audio/video) column plumbing (assignment mandate).

Decode kernels (round 3 — now REAL for uncompressed formats): pure-numpy
parsers for PPM/PGM (P6/P5 binary), 24-bit uncompressed BMP, and PCM16
RIFF/WAVE audio — dependency-free, format-sniffed from magic bytes.
Compressed formats (JPEG/PNG/MP3/...) dispatch to PIL / soundfile behind
try-imports and raise NotImplementedError when the library is absent
(those codecs are not reimplementable here and faking them would be
misleading). Payloads with no recognizable magic fall back to the
raw-raster interpretation used by the synthesized fixture media.

Design for 100 TB:
- media is an opaque `binary` column + a typed `meta` struct; filters and
  joins run on metadata columns so pruning happens without touching bytes;
- decode/resize/extract are mapInPandas stages (Arrow-batched, one python
  process per partition — never per-row round trips);
- frame sampling is the one row-multiplying stage and is bounded by
  meta.n_frames.

Arrow batch-size contract (code-review r15): Arrow's binary columns use
int32 offsets, so ONE batch's payload column is hard-capped at 2 GiB —
and ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10000)
bounds RECORDS, not bytes. On the INPUT side callers feeding real media
must size that conf to their payloads (10000 x >215 KB average blows the
cap); the session factory cannot know media sizes, so this is a
documented deployment knob. On the OUTPUT side the payload-emitting
stages below (resize_images, sample_frames) re-batch BY BYTES
(_MAX_OUT_BATCH_BYTES per yielded frame) because each yielded DataFrame
becomes one Arrow record batch and resize can GROW payloads past
whatever the input batching allowed.
"""

from __future__ import annotations

import sys

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
    # greatest(..., 1): an empty document (n_chars = 0) would make
    # width 0 and the height division a DIVIDE_BY_ZERO under Spark 4's
    # default ANSI mode, killing the whole job for one empty doc.
    width = F.greatest(
        F.least(F.col("n_chars").cast("int"), F.lit(64)), F.lit(1)
    )
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


_EXT_MIME = {
    "ppm": "image/x-ppm",
    "pgm": "image/x-pgm",
    "bmp": "image/bmp",
    "wav": "audio/wav",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "mp3": "audio/mpeg",
}


def media_from_files(files: DataFrame) -> DataFrame:
    """Map X31 ``binaryFile`` rows (path, modificationTime, length,
    content) into MEDIA_SCHEMA. doc_id is a stable 64-bit hash of the
    file path (deterministic across reruns and listing order); mime is
    sniffed from the extension; width/height/sample_rate are left 0 —
    the decode kernels read the authoritative values from each file's
    own header, so ingestion never parses payload bytes (the metadata-
    only pruning contract holds: a filter on length/mime/path prunes
    before any byte is touched).

    SCALE CAVEAT (code-review r13): a 64-bit path hash has a real
    birthday-collision probability past ~10^8 files (~35% at 4x10^9,
    the 100 TB-of-small-media count) — colliding files would silently
    merge under one doc_id. Run :func:`assert_unique_doc_ids` once per
    ingest at that scale (one metadata-only agg), and key joins on the
    file path itself if it ever fires."""
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mime = F.lit("application/octet-stream")
    for e, m in _EXT_MIME.items():
        mime = F.when(ext == e, m).otherwise(mime)
    return files.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def assert_unique_doc_ids(media: DataFrame) -> None:
    """Loud collision check for the 64-bit path-hash doc_id: one
    metadata-only aggregate (payload bytes never read thanks to column
    pruning). At fixture scale this never fires; at 10^8+ files it is
    the difference between a crashed ingest and silently merged media
    documents (code-review r13)."""
    row = media.agg(
        F.count(F.lit(1)).alias("files"),
        F.count_distinct("doc_id").alias("ids"),
    ).first()
    if row["ids"] != row["files"]:
        raise ValueError(
            f"doc_id collision: {row['files']} files hash to "
            f"{row['ids']} distinct 64-bit ids — key downstream joins "
            "on the file path instead"
        )


def _parse_pnm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) decoder, pure numpy. Handles the full
    header grammar: whitespace-separated tokens with '#' comments, one
    whitespace byte after maxval, then the raw raster. Returns (h, w) for
    PGM, (h, w, 3) for PPM; maxval must fit uint8."""
    idx = 0

    def token() -> bytes:
        nonlocal idx
        while idx < len(payload):
            c = payload[idx : idx + 1]
            if c.isspace():
                idx += 1
            elif c == b"#":
                while idx < len(payload) and payload[idx : idx + 1] not in (b"\n", b"\r"):
                    idx += 1
            else:
                break
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        return payload[start:idx]

    magic = token()
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM: {magic!r}")
    w, h, maxval = int(token()), int(token()), int(token())
    if w <= 0 or h <= 0:
        # A truncated/corrupt header declaring zero dims would decode to
        # an EMPTY raster whose mean() is a silent NaN — the faked-result
        # class this module forbids (code-review r15).
        raise ValueError(f"corrupt PNM header: {w}x{h} raster")
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    idx += 1  # exactly one whitespace byte separates header and raster
    ch = 3 if magic == b"P6" else 1
    a = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=idx)
    return a.reshape(h, w, 3) if ch == 3 else a.reshape(h, w)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP decoder, pure numpy: BITMAPFILEHEADER +
    BITMAPINFOHEADER, BGR triples, 4-byte-aligned rows, bottom-up unless
    height is negative. Returns (h, w, 3) RGB uint8."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        # Same silent-NaN class as the PNM guard (code-review r15).
        raise ValueError(f"corrupt BMP header: {w}x{h} raster")
    row_bytes = (w * 3 + 3) & ~3
    a = np.frombuffer(payload, np.uint8, count=row_bytes * h, offset=data_off)
    a = a.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR->RGB
    return a[::-1] if bottom_up else a


def _parse_wav_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 decoder, pure numpy: walks the chunk list (word-
    aligned), reads 'fmt ' and 'data'. Returns ((n_samples, n_channels)
    int16 array, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    idx, fmt, data = 12, None, None
    while idx + 8 <= len(payload):
        cid = payload[idx : idx + 4]
        size = struct.unpack_from("<I", payload, idx + 4)[0]
        body = payload[idx + 8 : idx + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        idx += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, "<i2")
    return samples.reshape(-1, n_ch), rate


def _decode_raster(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a payload to a uint8 raster (grayscale (h, w) or RGB
    (h, w, 3)). Dispatch by magic bytes:

    - ``P5``/``P6``  -> real PNM decode (dims come from the file header);
    - ``BM``         -> real 24-bit BMP decode;
    - JPEG/PNG magic -> PIL behind a try-import (absent here -> raises);
    - anything else  -> raw-raster fallback: row-major uint8 grayscale
      padded/truncated to (height, width) from the meta struct — the
      deterministic path for the synthesized fixture media.
    """
    if payload[:2] in (b"P5", b"P6"):
        return _parse_pnm(payload)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "JPEG/PNG decode needs PIL (not available in this "
                "environment); PPM/PGM/BMP decode natively"
            ) from exc
        return np.asarray(Image.open(io.BytesIO(payload)))
    need = width * height
    if need <= 0:
        # An unknown format with no declared raster dims (the
        # media_from_files zero-dim meta) would fall through to an
        # empty (0, 0) raster — NaN mean, all-zero histogram — a FAKED
        # result, which this module's policy forbids: undecodable
        # formats must raise loudly (code-review r13).
        raise NotImplementedError(
            f"unknown image format (magic {payload[:4]!r}) with no "
            "declared raster dims; native decoders cover P5/P6/BM, "
            "JPEG/PNG need PIL"
        )
    buf = np.frombuffer(payload, dtype=np.uint8)
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


# One yielded DataFrame = one Arrow record batch; binary columns carry
# int32 offsets (2 GiB hard cap per batch). Flush well below it.
_MAX_OUT_BATCH_BYTES = 128 << 20


def _to_pnm(raster: np.ndarray) -> tuple[bytes, str]:
    """Serialize a uint8 raster as a self-describing binary PNM payload:
    P5 for grayscale (h, w), P6 for RGB (h, w, 3) — so a re-decode reads
    dimensions AND channel count from the file's own header. Storing the
    raw ``tobytes()`` raster lost the channel axis: an RGB resize output
    re-decoded as grayscale over one third of its bytes, silently, with
    a meta.mime still claiming the original format (code-review r15,
    confirmed by execution on a real P6 fixture)."""
    if raster.dtype != np.uint8 or raster.ndim not in (2, 3) or (
        raster.ndim == 3 and raster.shape[2] != 3
    ):
        # RGBA/16-bit rasters (possible via the PIL dispatch) would
        # serialize to a P6 whose re-decode reads the right COUNT of
        # bytes from a larger buffer — silently wrong pixels, the very
        # class this serializer exists to eliminate (code-review r15,
        # second pass). Binary PNM is 8-bit gray or 8-bit RGB; anything
        # else must be converted by the caller, not guessed at here.
        raise ValueError(
            f"_to_pnm: cannot represent dtype={raster.dtype} "
            f"shape={raster.shape} as binary PNM (P5 gray / P6 RGB, "
            "uint8 only) — convert the raster first"
        )
    if raster.ndim == 3:
        h, w, _ = raster.shape
        return b"P6 %d %d 255\n" % (w, h) + raster.tobytes(), "image/x-ppm"
    h, w = raster.shape
    return b"P5 %d %d 255\n" % (w, h) + raster.tobytes(), "image/x-pgm"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; returns new payloads with updated meta.
    Output payloads are self-describing binary PNM (P5/P6 per the input
    raster's channel count) with the mime updated to match — see
    :func:`_to_pnm`. Output batches are re-sliced by BYTES, not records:
    resize can GROW payloads (out_w*out_h*3 > input), so even an input
    batching tuned to the source media could overflow Arrow's 2 GiB
    per-batch binary cap on the way out (code-review r15)."""

    def gen(batches):
        rows = {"doc_id": [], "payload": [], "meta": []}
        acc = 0
        for pdf in batches:
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
                out_payload, out_mime = _to_pnm(resized)
                rows["doc_id"].append(doc_id)
                rows["payload"].append(out_payload)
                rows["meta"].append(
                    {
                        "mime": out_mime,
                        "width": out_w,
                        "height": out_h,
                        "n_frames": meta["n_frames"],
                        "sample_rate": meta["sample_rate"],
                    }
                )
                acc += len(out_payload)
                if acc >= _MAX_OUT_BATCH_BYTES:
                    yield pd.DataFrame(rows)
                    rows = {"doc_id": [], "payload": [], "meta": []}
                    acc = 0
        if rows["doc_id"]:
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Treat the payload as meta.n_frames equal slices ('video') and emit
    every n-th slice — the one-to-many frame-sampling stage (bounded by
    n_frames, the only row multiplier in the media path)."""

    def gen(batches):
        out = {"doc_id": [], "frame_idx": [], "frame": []}
        acc = 0

        def flush():
            return pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_idx": "int32"}
            )

        for pdf in batches:
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                n = max(int(meta["n_frames"]), 1)
                step = max(len(payload) // n, 1)
                for idx in range(0, n, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    # The LAST frame extends to the payload end: with
                    # len(payload) % n != 0 a fixed-step slice would
                    # silently drop the tail bytes from every frame
                    # partition ('n_frames equal slices' contract).
                    hi = (
                        len(payload)
                        if idx == n - 1
                        else (idx + 1) * step
                    )
                    frame = payload[idx * step : hi]
                    out["frame"].append(frame)
                    acc += len(frame)
                # Byte-bounded output batches (module docstring): this
                # is the row-MULTIPLYING stage, so a record-count bound
                # alone cannot keep one Arrow batch's binary column
                # under its int32-offset cap.
                if acc >= _MAX_OUT_BATCH_BYTES:
                    yield flush()
                    out = {"doc_id": [], "frame_idx": [], "frame": []}
                    acc = 0
        if out["doc_id"]:
            yield flush()

    return media.mapInPandas(gen, FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "duration_s double, rms double, peak int, zero_crossing_rate double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over PCM16 WAV payloads — REAL decode via
    the pure-numpy RIFF parser (_parse_wav_pcm): per clip sample counts,
    RMS, peak, and zero-crossing rate, one Arrow batch -> one numpy pass.
    Non-WAV payloads (MP3/OGG/...) need a real codec: they dispatch to
    soundfile behind a try-import and raise NotImplementedError when it
    is absent — compressed audio is NOT faked."""

    def decode_one(payload: bytes):
        if payload[:4] == b"RIFF":
            return _parse_wav_pcm(payload)
        try:
            import io

            import soundfile
        except ImportError as exc:
            raise NotImplementedError(
                "non-WAV audio decode needs the 'soundfile' package (not "
                "available in this environment); PCM16 WAV decodes natively"
            ) from exc
        data, rate = soundfile.read(io.BytesIO(payload), dtype="int16")
        return np.atleast_2d(data.T).T, rate

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_channels", "n_samples",
                "duration_s", "rms", "peak", "zero_crossing_rate",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_one(payload)
                mono = samples.astype(np.float64).mean(axis=1)
                n = len(mono)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_channels"].append(samples.shape[1])
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate if rate else 0.0)
                out["rms"].append(float(np.sqrt(np.mean(mono**2))) if n else 0.0)
                # Widen before abs: np.abs(int16 -32768) overflows back
                # to -32768, silently reporting a wrong (possibly
                # negative) peak for full-scale negative samples.
                out["peak"].append(
                    int(np.abs(samples.astype(np.int64)).max()) if n else 0
                )
                out["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else 0.0
                )
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "sample_rate": "int32",
                    "n_channels": "int32",
                    "n_samples": "int64",
                    "peak": "int32",
                }
            )

    return media.mapInPandas(gen, AUDIO_SCHEMA)


# The mapInPandas closures above reference this module's parser functions;
# cloudpickle serializes module-level functions BY REFERENCE, which would
# require the package on every executor's sys.path. Registering the module
# for by-value pickling ships the (dependency-free) kernels inside the
# task closure instead — decode works from any driver cwd / deployment
# without --py-files.
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older pickle layouts
    pass
