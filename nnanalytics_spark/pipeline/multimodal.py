"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture — schema, partition-aware batch iteration
(mapInPandas with Arrow batches), typed metadata struct — plus REAL
decode kernels for two modalities: PNG images and WAV audio are parsed
by the pure-Python codecs in codecs.py (chunk/CRC-verified PNG inflate +
unfilter; struct-parsed RIFF/PCM), so image/audio feature extraction is
a genuine decode, not a fake. Only video decode remains a documented
stub (no video container parser exists in the stdlib); swapping it for
pyav/ffmpeg changes one function, not the plan. The operator is shaped
for 100 TB regardless of kernel: binary payloads never shuffle; decode
and feature extraction are map-side only; outputs are small typed
columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nnanalytics_spark.pipeline import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, checksum long, feature array<double>"


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake decode for VIDEO only: 8 bucket-counts over raw
    byte values. Image and audio use the real codecs below; video has no
    stdlib container parser, so this stays a documented stub — real
    deployment swaps in pyav/ffmpeg frame decode + model features."""
    if payload is None:
        return [0.0] * 8
    counts = [0] * 8
    for byte in payload:
        counts[byte >> 5] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def _decode_image(payload: bytes, kind: str) -> list[float]:
    """Real PNG decode (codecs.decode_png: CRC-verified inflate +
    unfilter) → normalized 8-bin intensity histogram of the pixels."""
    if payload is None:
        return [0.0] * 8
    return codecs.png_features(payload)


def _decode_audio(payload: bytes, kind: str) -> list[float]:
    """Real WAV decode (codecs.decode_wav: struct-parsed RIFF/PCM) →
    per-segment RMS of the centered signal."""
    if payload is None:
        return [0.0] * 8
    return codecs.wav_features(payload)


DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_stub}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps each binary batch inside one Python worker — no
    shuffle of payload bytes, output is narrow (id + small feature vector).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            features = [
                DECODERS[kind](payload, kind)
                for kind, payload in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        zlib.crc32(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": features,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    "sample_rate int, n_channels int, duration_ms int, n_data int"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode container metadata from real payloads — the deterministic
    contract surface for the correctness gate.

    Every output column is computable from the source bytes without
    knowing the codec's compression internals (PNG IDAT size is not
    predictable, but width/height/pixel-count are), so an external SQL
    oracle can verify the full decode round-trip:

    - image: width, height from the parsed IHDR; n_data = width*height
      reconstructed pixels (zero-padded last row).
    - audio: sample_rate, n_channels, duration_ms from the parsed fmt
      chunk; n_data = PCM sample count.

    Arrow-batched mapInPandas, map-side only; payloads never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "kind", "n_bytes", "width", "height",
                "sample_rate", "n_channels", "duration_ms", "n_data",
            )}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"], row["kind"] = mid, kind
                row["n_bytes"] = len(payload) if payload is not None else 0
                if payload is None:
                    pass
                elif kind == "image":
                    meta = codecs.decode_png(payload)
                    row["width"], row["height"] = meta["width"], meta["height"]
                    row["n_data"] = meta["width"] * meta["height"]
                elif kind == "audio":
                    meta = codecs.decode_wav(payload)
                    row["sample_rate"] = meta["sample_rate"]
                    row["n_channels"] = meta["n_channels"]
                    row["duration_ms"] = meta["duration_ms"]
                    row["n_data"] = meta["n_samples"]
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", "payload").mapInPandas(run, DECODED_SCHEMA)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic real-media table derived from a documents table:
    even doc_ids become 8-bit grayscale PNGs (text bytes as pixels, width
    64, zero-padded last row), odd doc_ids become 8-bit mono 8 kHz WAVs
    (text bytes as PCM samples). Because the mapping from text length to
    decoded dimensions is arithmetic, an external SQL oracle can predict
    every decode_media column — this is what upgrades the multimodal
    component from rows-only to a hash-checked contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for mid, txt in zip(pdf["media_id"], pdf["text"]):
                data = txt.encode("utf-8")
                if mid % 2 == 0:
                    kinds.append("image")
                    payloads.append(codecs.encode_png(data, width=codecs.PNG_WIDTH))
                else:
                    kinds.append("audio")
                    payloads.append(codecs.encode_wav(data, sample_rate=codecs.WAV_RATE))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": kinds, "payload": payloads}
            )

    src = docs.select(F.col(id_col).alias("media_id"), F.col(text_col).alias("text"))
    return src.mapInPandas(run, "media_id long, kind string, payload binary")


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int"
)


def resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize to width×height — Arrow-batched, map-side only.

    Image payloads take the REAL path: PNG decode (codecs.decode_png),
    nearest-neighbor resample with a vectorized numpy index grid, PNG
    re-encode — output payloads are valid PNGs of the target geometry.
    Non-image kinds fall back to a deterministic byte-stride downsample
    (kept so audio/video payloads still produce fixed-size thumbnails of
    their raw bytes). Either way: binary in → binary out, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height

        def stride_kernel(payload: bytes | None) -> bytes:
            if not payload:
                return b"\x00" * target
            n = len(payload)
            return bytes(payload[(i * n) // target] for i in range(target))

        def image_kernel(payload: bytes | None) -> bytes:
            if not payload:
                return codecs.encode_png(b"\x00" * target, width=width)
            px = codecs.decode_png(payload)["pixels"]
            src_h, src_w = px.shape
            ys = (np.arange(height) * src_h) // height
            xs = (np.arange(width) * src_w) // width
            resized = px[np.ix_(ys, xs)]
            return codecs.encode_png(resized.tobytes(), width=width)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        image_kernel(p) if k == "image" else stride_kernel(p)
                        for k, p in zip(pdf["kind"], pdf["payload"])
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, payload binary"


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frames from video payloads every `every_ms` — a one-to-many
    mapInPandas (each video row yields duration/every_ms frame rows).

    Stub kernel: frame k is a fixed-width byte slice at the proportional
    offset; a real deployment swaps in pyav/ffmpeg seek+decode. Output rows
    are narrow (frame payloads only), so the explode happens AFTER decode
    on the map side — full videos never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for mid, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or not duration:
                    continue
                n_frames = max(int(duration) // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for k in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(k * every_ms)
                    out["payload"].append(payload[k * step : k * step + min(step, 64)])
            yield pd.DataFrame(out)

    src = df.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(run, FRAME_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests. Image/audio payloads are REAL
    containers (seeded bytes wrapped as PNG pixels / WAV PCM via codecs);
    video payloads stay seeded raw bytes for the documented stub path."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        data = bytes(((i * 131 + j * 17) % 256) for j in range(256 + i))
        if kind == "image":
            payload = codecs.encode_png(data, width=16)
            h = (len(data) + 15) // 16
            meta = ("image/png", 16, h, None)
        elif kind == "audio":
            payload = codecs.encode_wav(data)
            meta = ("audio/wav", None, None, len(data) * 1000 // codecs.WAV_RATE)
        else:
            payload = data
            meta = ("application/octet-stream", 16, 16, 1000)
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
