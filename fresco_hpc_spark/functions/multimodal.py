"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` payload columns plus a typed metadata struct —
the layout that scales: payloads stay in parquet binary pages (no JVM
object blow-up), metadata is columnar and prunable, and all per-item work
runs in Arrow-batched ``mapInPandas`` so Python touches each batch once.

The image/video codecs (PIL/libav/ffmpeg) are NOT in this container, so
those decode kernels are deterministic fakes behind an import-try —
clearly marked below. AUDIO IS REAL: WAV/PCM needs no external codec
(stdlib ``wave`` + ``struct``), so ``synthetic_media`` emits genuine
RIFF/WAVE payloads and ``extract_audio_features`` computes RMS energy
from decoded samples. Everything Spark-side is real and tested: schemas,
batch shapes, UDF signatures, partition behavior. Swap the remaining
fake kernels for real codec calls and nothing else changes.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
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


_WAV_SR = 8000


def _wav_payload(media_id: int) -> bytes:
    """A real, deterministic 16-bit mono PCM WAV: a sine at
    200 + (id%10)·100 Hz, amplitude 0.5, 400 + (id%4)·200 samples
    (50–125 ms at 8 kHz). Decodes with stdlib ``wave`` — no codec."""
    freq = 200.0 + (media_id % 10) * 100.0
    n_samp = 400 + (media_id % 4) * 200
    frames = b"".join(
        struct.pack(
            "<h", int(0.5 * 32767 * math.sin(2.0 * math.pi * freq * t / _WAV_SR))
        )
        for t in range(n_samp)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_SR)
        w.writeframes(frames)
    return buf.getvalue()


def synthetic_media(spark: SparkSession, n: int, modality: str = "image") -> DataFrame:
    """Deterministic media table: audio payloads are REAL RIFF/WAVE PCM
    (``_wav_payload``); image/video payloads are sha256 streams keyed on
    media_id (64 bytes·(1+id%4)) standing in for encoded frames;
    metadata derived from the id/payload."""
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
                if modality == "audio":
                    payload = _wav_payload(int(i))
                    n_samp = 400 + (int(i) % 4) * 200
                    duration = n_samp / float(_WAV_SR)
                    sr = _WAV_SR
                else:
                    blocks = 1 + (i % 4)
                    payload = b"".join(
                        hashlib.sha256(f"{modality}-{i}-{b}".encode()).digest()
                        for b in range(blocks * 2)
                    )
                    duration = float(i % 30) if modality != "image" else None
                    sr = None
                rows["media_id"].append(i)
                rows["modality"].append(modality)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "width": 16 * (1 + int(i) % 8),
                        "height": 16 * (1 + int(i) % 5),
                        "sample_rate": sr,
                        "duration_s": duration,
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


def _decode_wav(payload: bytes) -> tuple[int, list[float]]:
    """REAL PCM decode (stdlib ``wave`` + ``struct`` — no external
    codec): returns (sample_rate, mono samples normalized to [-1, 1)).
    Multi-channel audio is mixed down by per-frame channel mean; only
    16-bit PCM is handled (the overwhelmingly common WAV layout)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw != 2:
        raise ValueError(f"only 16-bit PCM WAV supported, got sampwidth={sw}")
    ints = struct.unpack(f"<{len(raw) // 2}h", raw)
    if ch > 1:
        ints = [
            sum(ints[f * ch : (f + 1) * ch]) / ch for f in range(len(ints) // ch)
        ]
    return sr, [s / 32768.0 for s in ints]


def extract_audio_features(df: DataFrame, window_samples: int = 256) -> DataFrame:
    """Windowed audio feature extraction over audio payloads — a REAL
    decode path: RIFF/WAVE payloads are decoded to PCM samples with the
    stdlib ``wave`` module and each fixed ``window_samples`` window emits
    its RMS energy. ``sample_rate``/``duration_s`` come from the decoded
    header, not trusted metadata. Non-WAV payloads (e.g. opaque synthetic
    blobs for formats whose codecs are absent) fall back to byte-window
    mean energy so the pipeline stays total. Same mapInPandas shape as
    the image path: one Python crossing per Arrow batch, schema declared,
    partitioning preserved."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "sample_rate": [], "duration_s": [],
                "n_windows": [], "window_energy": [],
            }
            for mid, meta, payload in zip(
                pdf["media_id"], pdf["meta"], pdf["payload"]
            ):
                payload = bytes(payload)
                if payload[:4] == b"RIFF":
                    sr, samples = _decode_wav(payload)
                    duration = len(samples) / sr if sr else None
                    windows = [
                        samples[o : o + window_samples]
                        for o in range(0, len(samples), window_samples)
                    ]
                    energy = [
                        round(math.sqrt(sum(s * s for s in w) / len(w)), 6)
                        for w in windows
                        if w
                    ]
                else:  # fallback: opaque payload, byte-bucket energy
                    sr = meta["sample_rate"]
                    duration = meta["duration_s"]
                    bw = [
                        payload[o : o + window_samples]
                        for o in range(0, len(payload), window_samples)
                    ]
                    energy = [
                        round(sum(w) / len(w) / 255.0, 6) for w in bw if len(w)
                    ]
                rows["media_id"].append(mid)
                rows["sample_rate"].append(sr)
                rows["duration_s"].append(duration)
                rows["n_windows"].append(len(energy))
                rows["window_energy"].append(energy)
            yield pd.DataFrame(rows)

    return df.filter(F.col("modality") == "audio").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )
