"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` payload columns plus a typed metadata struct —
the layout that scales: payloads stay in parquet binary pages (no JVM
object blow-up), metadata is columnar and prunable, and all per-item work
runs in Arrow-batched ``mapInPandas`` so Python touches each batch once.

The actual codecs (PIL/libav/ffmpeg) are NOT in this container, so the
decode kernels are deterministic fakes behind an import-try — clearly
marked below. Everything Spark-side is real and tested: schemas, batch
shapes, UDF signatures, partition behavior. Swap ``_decode_*_batch`` for
real codec calls and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real codec path — not present in this environment
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int, modality: str = "image") -> DataFrame:
    """Deterministic fake media table: payload = sha256 stream keyed on
    media_id (64 bytes·(1+id%4)), metadata derived from the id."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = {
                "media_id": [],
                "modality": [],
                "payload": [],
                "meta": [],
            }
            for i in ids:
                blocks = 1 + (i % 4)
                payload = b"".join(
                    hashlib.sha256(f"{modality}-{i}-{b}".encode()).digest()
                    for b in range(blocks * 2)
                )
                rows["media_id"].append(i)
                rows["modality"].append(modality)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "width": 16 * (1 + int(i) % 8),
                        "height": 16 * (1 + int(i) % 5),
                        "sample_rate": 16000 if modality == "audio" else None,
                        "duration_s": float(i % 30) if modality != "image" else None,
                        "format": {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                    }
                )
            yield pd.DataFrame(rows)

    # size partitions to the row count — a tiny synthetic table on 32
    # default partitions would spin up 32 Python workers per mapInPandas
    # stage for a handful of rows each
    num_parts = max(2, min(32, n // 100))
    return spark.range(0, n, 1, num_parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, dim: int) -> list[float]:
    """STUB DECODE — deterministic byte-bucket fold standing in for a real
    pixel/spectrogram featurizer. Real implementation would decode the
    payload (PIL/soundfile) and pool; this folds raw bytes into ``dim``
    buckets so outputs are stable, schema-correct, and testable."""
    acc = [0.0] * dim
    cnt = [0] * dim
    for j, byte in enumerate(payload):
        acc[j % dim] += byte
        cnt[j % dim] += 1
    return [round(a / c, 6) if c else 0.0 for a, c in zip(acc, cnt)]


def decode_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract over image payloads via ``mapInPandas``.

    Arrow ships each partition to Python in pandas batches; one Python
    crossing per batch, not per row. With a real codec installed
    (``HAVE_PIL``) this is where pixels would be read — the fake keeps
    identical schema and batch mechanics.
    """
    if HAVE_PIL:  # pragma: no cover - codec not present in this container
        raise NotImplementedError(
            "real PIL decode path intentionally not implemented here; "
            "plug Image.open(...) into the batch loop below"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mean_byte": [
                        round(sum(p) / len(p), 6) if len(p) else 0.0
                        for p in pdf["payload"]
                    ],
                    "features": [
                        _fake_decode_features(p, dim) for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return df.filter(F.col("modality") == "image").mapInPandas(
        decode, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata updated Catalyst-side; payload re-encode is the
    stubbed step (a real pipeline re-encodes in the same mapInPandas
    pattern as ``decode_image_features``). Keeping the metadata change in
    native expressions means no Python crossing at all for the fake."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_s").alias("duration_s"),
            F.col("meta.format").alias("format"),
        ),
    )


def sample_frames(df: DataFrame, frame_bytes: int = 32, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads: split each payload into
    ``frame_bytes`` chunks (the fake 'frames'), keep every ``every_n``-th.
    One row in → many rows out, the real fan-out shape of frame
    extraction; partitioning carries over from the input."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                chunks = [
                    payload[o : o + frame_bytes]
                    for o in range(0, len(payload), frame_bytes)
                ]
                for k, chunk in enumerate(chunks):
                    if k % every_n == 0:
                        ids.append(mid)
                        idxs.append(k)
                        frames.append(bytes(chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return df.filter(F.col("modality") == "video").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_windows", T.IntegerType(), False),
        T.StructField("window_energy", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_audio_features(df: DataFrame, window_bytes: int = 64) -> DataFrame:
    """Windowed audio feature extraction over audio payloads: split each
    payload into fixed ``window_bytes`` windows and emit per-window energy
    (the fake: mean absolute byte value; a real pipeline computes RMS /
    spectrogram bands over decoded PCM in this exact batch loop —
    ``soundfile``/``librosa`` are the codecs that are not in this
    container). Same mapInPandas shape as the image path: one Python
    crossing per Arrow batch, schema declared, partitioning preserved."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "sample_rate": [], "duration_s": [],
                "n_windows": [], "window_energy": [],
            }
            for mid, meta, payload in zip(
                pdf["media_id"], pdf["meta"], pdf["payload"]
            ):
                windows = [
                    payload[o : o + window_bytes]
                    for o in range(0, len(payload), window_bytes)
                ]
                energy = [
                    round(sum(w) / len(w), 6) if len(w) else 0.0 for w in windows
                ]
                rows["media_id"].append(mid)
                rows["sample_rate"].append(meta["sample_rate"])
                rows["duration_s"].append(meta["duration_s"])
                rows["n_windows"].append(len(windows))
                rows["window_energy"].append(energy)
            yield pd.DataFrame(rows)

    return df.filter(F.col("modality") == "audio").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )
