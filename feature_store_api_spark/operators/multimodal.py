"""Multimodal (image/audio/video) column operators.

Driver-mandated extension beyond the reference surface: treat media as
opaque ``binary`` columns with typed metadata, and run decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over ``mapInPandas``. Image and WAV-audio decoding are REAL
and stdlib-only (:mod:`image_codec`): PNG/GIF/BMP/JPEG headers from
magic bytes, full pixel decode for 8-bit PNG and 24/32-bit BMP,
nearest-neighbor resize, RIFF/WAV header + PCM-16 sample decode.
Compressed codecs (JPEG pixels, MP3, video containers — no libraries
in this container) stay behind ``set_decoder`` with a deterministic
fake, with the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) real and tested.

Scale notes (100 TB of media):
- media bytes ride in parquet binary columns; ``maxPartitionBytes``
  bounds per-task memory, and ``mapInPandas`` streams Arrow batches so
  a task never materializes its whole partition.
- decode outputs are fixed-size feature vectors / thumbnails, orders of
  magnitude smaller than inputs — emitted schema drops the raw bytes by
  default so downstream shuffles move features, not media.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# schema: binary payload + typed metadata
# ---------------------------------------------------------------------------

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
        T.StructField("duration_ms", T.LongType(), True),     # audio/video
        T.StructField("n_frames", T.IntegerType(), True),     # video
    ]
)


def media_schema(extra_fields: Optional[Sequence[T.StructField]] = None) -> T.StructType:
    """Canonical schema for a multimodal table: id, raw bytes, metadata."""
    fields = [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_METADATA_TYPE, True),
    ]
    return T.StructType(fields + list(extra_fields or []))


def attach_basic_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap, codec-free metadata: byte length + content hash — pure
    Column expressions, evaluated at scan speed."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))).withColumn(
        "content_sha1", F.sha1(F.col(content_col))
    )


# ---------------------------------------------------------------------------
# decoder registry — the stub boundary
# ---------------------------------------------------------------------------

_DECODERS: Dict[str, Callable[[bytes, dict], dict]] = {}


def set_decoder(media_type: str, fn: Callable[[bytes, dict], dict]) -> None:
    """Register a real decoder (e.g. PIL/librosa-backed) for a media
    type. ``fn(content: bytes, meta: dict) -> dict`` returning any of
    the output fields of :func:`decode_features`."""
    _DECODERS[media_type] = fn


def _fake_decode(content: bytes, meta: dict) -> dict:
    """Deterministic stand-in for a codec: derives a stable
    pseudo-feature vector and shape from the bytes themselves, so tests
    exercise the full Spark plumbing with reproducible outputs.

    A real deployment calls ``set_decoder("image", pil_decoder)``; this
    fake raises nothing and never imports a codec library.
    """
    if content is None:
        raise NotImplementedError("no content to decode")
    digest = hashlib.sha256(content).digest()
    # 16 floats in [0,1) unpacked from the digest — stable per content
    vec = [
        struct.unpack(">H", digest[2 * i : 2 * i + 2])[0] / 65536.0
        for i in range(16)
    ]
    return {
        "feature_vec": vec,
        "decoded_width": (meta or {}).get("width") or 1 + digest[0] % 64,
        "decoded_height": (meta or {}).get("height") or 1 + digest[1] % 64,
    }


def decode_image(content: bytes, meta: dict) -> dict:
    """Default image decoder — REAL, stdlib-only (no PIL):

    - header parse from magic bytes for PNG/GIF/BMP/JPEG (dimensions,
      channel count, format) via :mod:`image_codec`;
    - full pixel decode for non-interlaced 8-bit PNG and uncompressed
      24/32-bit BMP, emitting per-channel mean intensities as the
      feature vector;
    - header-only formats (GIF, JPEG — pixel decode needs LZW/DCT
      codecs this container doesn't ship) return real metadata with
      ``feature_vec=None``.

    Unrecognized/corrupt bytes raise ``ValueError``, which
    :func:`decode_features` records per-row as ``decode_error``.
    """
    from . import image_codec as ic

    hdr = ic.parse_image_header(content)
    vec = None
    try:
        _, rows = ic.decode_pixels(content)
        vec = [float(x) for x in ic.channel_means(rows, hdr["n_channels"])]
    except ValueError:
        pass  # header-only format: metadata is still genuinely decoded
    return {
        "feature_vec": vec,
        "decoded_width": hdr["width"],
        "decoded_height": hdr["height"],
        "n_channels": hdr["n_channels"],
        "format": hdr["format"],
    }


def decode_audio(content: bytes, meta: dict) -> dict:
    """Default audio decoder — REAL for RIFF/WAV (stdlib): header parse
    (channels, sample rate, bit depth, duration) for any WAV; full
    PCM-16 sample decode with per-channel RMS as the feature vector.
    Non-PCM codecs (mp3/aac/…) raise ``ValueError`` → ``decode_error``.
    """
    from . import image_codec as ic

    hdr = ic.parse_wav_header(content)
    vec = None
    try:
        _, chans = ic.decode_wav_samples(content)
        vec = [
            float((sum(v * v for v in c) / len(c)) ** 0.5) if c else 0.0
            for c in chans
        ]
    except ValueError:
        pass  # header-only codec: metadata is still genuinely decoded
    return {
        "feature_vec": vec,
        "n_channels": hdr["n_channels"],
        "format": hdr["format"],
        "sample_rate": hdr["sample_rate"],
        "duration_ms": hdr["duration_ms"],
    }


def _resize_codec(content: bytes, meta: dict) -> dict:
    """Default image resizer: nearest-neighbor over really-decoded
    pixels (PNG/BMP), re-encoded as PNG — stdlib only."""
    from . import image_codec as ic

    return ic.resize_nearest(content, meta["width"], meta["height"])


_DECODERS.setdefault("image", decode_image)
_DECODERS.setdefault("audio", decode_audio)
_DECODERS.setdefault("image_resize", _resize_codec)


_DECODE_OUT = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature_vec", T.ArrayType(T.FloatType()), True),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: Optional[str] = "meta",
    media_type: str = "image",
    batch_hint: Optional[int] = None,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``.

    Arrow streams batches of (id, bytes, meta) into Python; each batch
    emits fixed-width features only — raw bytes never leave the stage,
    so the downstream plan shuffles ~100 B/row instead of media blobs.
    Decode failures land in ``decode_error`` instead of failing the
    job (a 100 TB decode run always contains corrupt files).
    """
    decoder = _DECODERS.get(media_type, _fake_decode)
    cols = [id_col, content_col] + ([meta_col] if meta_col else [])
    src = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fields = [
            "feature_vec", "decoded_width", "decoded_height",
            "n_channels", "format", "sample_rate", "duration_ms",
        ]
        for pdf in batches:
            out: Dict[str, list] = {"media_id": [], "decode_error": []}
            for f in fields:
                out[f] = []
            # column-wise zip, not iterrows(): ~5-10x less per-row overhead
            # on Arrow batches
            ids = pdf[id_col].tolist()
            contents = pdf[content_col].tolist()
            metas = pdf[meta_col].tolist() if meta_col else [None] * len(ids)
            for rid, content, raw_meta in zip(ids, contents, metas):
                out["media_id"].append(rid)
                meta = dict(raw_meta) if raw_meta is not None else {}
                try:
                    dec = decoder(content, meta)
                    for f in fields:
                        out[f].append(dec.get(f))
                    out["decode_error"].append(None)
                except NotImplementedError as e:
                    for f in fields:
                        out[f].append(None)
                    out["decode_error"].append(str(e) or "decode not implemented")
                except Exception as e:  # corrupt input — record, don't fail
                    for f in fields:
                        out[f].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_DECODE_OUT)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Resize stub: real implementation needs an image codec. The
    Spark contract (schema + mapInPandas shape) is live; the pixel work
    raises ``NotImplementedError`` unless a decoder is registered under
    ``image_resize``."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    resizer = _DECODERS.get("image_resize")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "image resize requires a codec; register one via "
                    "set_decoder('image_resize', fn)"
                )
            rows = {"media_id": [], "content": [], "width": [], "height": []}
            for rid, content in zip(pdf[id_col].tolist(), pdf[content_col].tolist()):
                res = resizer(
                    content, {"width": target_width, "height": target_height}
                )
                rows["media_id"].append(rid)
                rows["content"].append(res["content"])
                rows["width"].append(target_width)
                rows["height"].append(target_height)
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_nth: int = 30,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (flatMap shape —
    mapInPandas yields more rows than it consumes). Frame extraction is
    stubbed as fixed-offset byte windows standing in for codec output;
    the row-explosion plumbing, schema, and per-frame ids are real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame_content", T.BinaryType(), True),
        ]
    )
    extractor = _DECODERS.get("video_frame")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame_content": []}
            for rid, content, raw_meta in zip(
                pdf[id_col].tolist(), pdf[content_col].tolist(), pdf[meta_col].tolist()
            ):
                meta = dict(raw_meta) if raw_meta is not None else {}
                n_frames = int(meta.get("n_frames") or 0)
                for fi in range(0, max(n_frames, 1), every_nth):
                    if extractor is not None:
                        frame = extractor(content, {"frame": fi})["content"]
                    else:
                        # deterministic fake frame: a byte window keyed
                        # by frame index
                        raw = content or b""
                        start = (fi * 17) % max(len(raw), 1)
                        frame = raw[start : start + 64]
                    rows["media_id"].append(rid)
                    rows["frame_index"].append(fi)
                    rows["frame_content"].append(frame)
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col, meta_col).mapInPandas(run, schema=out_schema)
