"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` payload columns plus a typed metadata struct —
the layout that scales: payloads stay in parquet binary pages (no JVM
object blow-up), metadata is columnar and prunable, and all per-item work
runs in Arrow-batched ``mapInPandas`` so Python touches each batch once.

ALL THREE MODALITIES DECODE FOR REAL — no external codec needed:

- AUDIO: RIFF/WAVE PCM via stdlib ``wave`` + ``struct``;
  ``extract_audio_features`` computes RMS energy from decoded samples.
- IMAGE: PNG (stdlib zlib) and 24-bit BMP via the pure-Python codecs in
  ``functions/codecs.py``; ``synthetic_media`` emits genuine PNGs and
  ``decode_image_features`` pools features from decoded PIXELS.
- VIDEO: a deterministic concatenated-BMP container (each BMP header
  carries its own byte length, so frame boundaries are parsed, not
  guessed); ``sample_frames`` yields individually decodable BMP frames.

A production pipeline swaps these kernels for SIMD codecs
(PIL/libav/ffmpeg) — the Spark-side contract (schemas, Arrow batch
shapes, UDF signatures, partition behavior) is identical either way.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fresco_hpc_spark.functions.codecs import (
    decode_image,
    encode_bmp,
    encode_png,
    split_bmp_frames,
)

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
        # exact per-strip Σ(r+g+b) over decoded pixels — integer, so an
        # external oracle can recompute it bit-for-bit (no float-sum
        # order ambiguity); features[i] == lum3_sums[i] / (3 · strip px)
        T.StructField("lum3_sums", T.ArrayType(T.LongType()), False),
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


def _media_dims(media_id: int) -> tuple[int, int]:
    return 16 * (1 + media_id % 8), 16 * (1 + media_id % 5)


def media_frame_count(media_id: int) -> int:
    """Frames in the synthetic video container for ``media_id`` —
    exported so tests/oracles can predict the fan-out."""
    return 2 * (1 + media_id % 4)


def _image_rgb(media_id: int, width: int, height: int, frame: int = 0) -> bytes:
    """Deterministic gradient pixels (top-down RGB): closed-form per
    channel, so tests can assert exact channel means without decoding."""
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    r = (3 * x + 7 * y + media_id + 11 * frame) % 256
    g = (5 * x + y + 2 * media_id + 13 * frame) % 256
    b = (x + 2 * y + 3 * media_id + 17 * frame) % 256
    return (
        np.stack(np.broadcast_arrays(r, g, b), axis=-1)
        .astype(np.uint8)
        .tobytes()
    )


def _video_payload(media_id: int) -> bytes:
    """Concatenated-BMP container: ``media_frame_count`` real 24-bit BMP
    frames back to back. Frame boundaries are recoverable from each
    frame's own header (codecs.split_bmp_frames) — a parseable container,
    not fixed-stride byte slicing."""
    w, h = _media_dims(media_id)
    return b"".join(
        encode_bmp(w, h, _image_rgb(media_id, w, h, frame=k))
        for k in range(media_frame_count(media_id))
    )


def synthetic_media(spark: SparkSession, n: int, modality: str = "image") -> DataFrame:
    """Deterministic media table — every payload is REAL and decodable:
    audio is RIFF/WAVE PCM (``_wav_payload``), images are PNGs of a
    deterministic gradient (``encode_png``), videos are concatenated-BMP
    containers (``_video_payload``). Metadata mirrors the encoded
    content."""
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
                i = int(i)
                w, h = _media_dims(i)
                if modality == "audio":
                    payload = _wav_payload(i)
                    n_samp = 400 + (i % 4) * 200
                    duration = n_samp / float(_WAV_SR)
                    sr = _WAV_SR
                elif modality == "image":
                    payload = encode_png(w, h, _image_rgb(i, w, h))
                    duration = None
                    sr = None
                elif modality == "video":
                    payload = _video_payload(i)
                    # 4 fps nominal: duration tracks the frame count
                    duration = media_frame_count(i) / 4.0
                    sr = None
                else:
                    raise ValueError(f"unknown modality {modality!r}")
                rows["media_id"].append(i)
                rows["modality"].append(modality)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "width": w,
                        "height": h,
                        "sample_rate": sr,
                        "duration_s": duration,
                        "format": {"image": "png", "audio": "wav", "video": "bmps"}[modality],
                    }
                )
            yield pd.DataFrame(rows)

    # size partitions to the row count — a tiny synthetic table on 32
    # default partitions would spin up 32 Python workers per mapInPandas
    # stage for a handful of rows each
    num_parts = max(2, min(32, n // 100))
    return spark.range(0, n, 1, num_parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _pixel_features(
    rgb: bytes, width: int, height: int, dim: int
) -> tuple[float, list[float], list[int]]:
    """(mean over all RGB bytes, per-strip luminance means, per-strip
    integer Σ(r+g+b)): the image is cut into ``dim`` horizontal strips
    and each strip contributes the mean of its pixels' (r+g+b)/3
    luminance — a real (if simple) pooled feature computed from decoded
    pixels. The integer sums are the exact-arithmetic twin of the float
    features (feature = sum / (3 · strip pixel count))."""
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    lum = arr.astype(np.float64).mean(axis=2)  # (h, w)
    lum3 = arr.astype(np.int64).sum(axis=2)  # (h, w) exact r+g+b
    strips = [
        slice((s * height) // dim, ((s + 1) * height) // dim)
        for s in range(dim)
    ]
    feats = [
        round(float(lum[sl].mean()), 6) if lum[sl].size else 0.0
        for sl in strips
    ]
    sums = [int(lum3[sl].sum()) for sl in strips]
    return round(float(arr.mean()), 6), feats, sums


def decode_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """REAL decode + feature-extract over image payloads via
    ``mapInPandas``: PNG/BMP payloads are decoded to pixels with the
    pure-Python codecs (functions/codecs.py), ``width``/``height`` come
    from the DECODED header (not trusted metadata), ``mean_byte`` is the
    mean decoded RGB value, and ``features`` are per-strip luminance
    means. Arrow ships each partition to Python in pandas batches; one
    Python crossing per batch, not per row. A production pipeline swaps
    ``decode_image`` for a SIMD codec — schema and batch mechanics are
    identical."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means, feats, sums = [], [], [], [], []
            for p in pdf["payload"]:
                p = bytes(p)
                w, h, rgb = decode_image(p)
                m, f, s3 = _pixel_features(rgb, w, h, dim)
                widths.append(w)
                heights.append(h)
                means.append(m)
                feats.append(f)
                sums.append(s3)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "mean_byte": means,
                    "features": feats,
                    "lum3_sums": sums,
                }
            )

    return df.filter(F.col("modality") == "image").mapInPandas(
        decode, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize: decode the payload, nearest-neighbor resample to
    ``width``×``height``, re-encode in the same container (PNG in, PNG
    out), and update the metadata struct to match — all in one
    ``mapInPandas`` crossing per Arrow batch."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for p, m, modality in zip(
                pdf["payload"], pdf["meta"], pdf["modality"]
            ):
                p = bytes(p)
                if modality != "image":
                    # non-image rows pass through untouched: a mixed
                    # media table must not hit the image decoder
                    payloads.append(p)
                    metas.append(dict(m))
                    continue
                w0, h0, rgb = decode_image(p)
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h0, w0, 3)
                ys = (np.arange(height) * h0) // height
                xs = (np.arange(width) * w0) // width
                resized = arr[ys][:, xs].tobytes()
                enc = encode_bmp if p[:2] == b"BM" else encode_png
                payloads.append(enc(width, height, resized))
                meta = dict(m)
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


FRAME_DESCRIPTOR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("pix_sum3", T.LongType(), False),
    ]
)


def describe_frames(frames: DataFrame) -> DataFrame:
    """Scalar descriptors for sampled frames: decode each BMP frame and
    emit (width, height, byte length, exact Σ(r+g+b) over decoded
    pixels). Downstream aggregation/ordering then shuffles a handful of
    integers per frame instead of the raw pixel payload — at scale the
    payload stays pinned to its input partition and only descriptors
    move. ``pix_sum3`` is integer-exact, so an external oracle can
    recompute it from a known source image without any float-sum-order
    ambiguity."""

    def describe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_index": [], "width": [],
                "height": [], "n_bytes": [], "pix_sum3": [],
            }
            for mid, k, frame in zip(
                pdf["media_id"], pdf["frame_index"], pdf["frame_payload"]
            ):
                frame = bytes(frame)
                w, h, rgb = decode_image(frame)
                s3 = int(
                    np.frombuffer(rgb, dtype=np.uint8).astype(np.int64).sum()
                )
                rows["media_id"].append(mid)
                rows["frame_index"].append(k)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_bytes"].append(len(frame))
                rows["pix_sum3"].append(s3)
            yield pd.DataFrame(rows)

    return frames.mapInPandas(describe, schema=FRAME_DESCRIPTOR_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads: PARSE the concatenated-BMP
    container into its real frames (each frame's byte length comes from
    its own BMP header — codecs.split_bmp_frames raises on truncation
    rather than yielding garbage), keep every ``every_n``-th frame. Each
    emitted ``frame_payload`` is a complete, individually decodable BMP.
    One row in → many rows out, the real fan-out shape of frame
    extraction; partitioning carries over from the input."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for k, frame in enumerate(split_bmp_frames(bytes(payload))):
                    if k % every_n == 0:
                        ids.append(mid)
                        idxs.append(k)
                        frames.append(frame)
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
        # exact per-window Σ sample² over the decoded 16-bit PCM ints —
        # integer, so an external oracle can recompute it bit-for-bit;
        # window_energy[i] == sqrt(energy_sums[i] / n_i) / 32768
        T.StructField("energy_sums", T.ArrayType(T.LongType()), False),
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
                "n_windows": [], "window_energy": [], "energy_sums": [],
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
                    # recover the exact PCM ints: s was produced by
                    # int/32768.0, a power-of-two divide, so s*32768 is
                    # exact for mono; multi-channel mixdowns round
                    sums = [
                        sum(int(round(s * 32768.0)) ** 2 for s in w)
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
                    sums = [sum(b * b for b in w) for w in bw if len(w)]
                rows["media_id"].append(mid)
                rows["sample_rate"].append(sr)
                rows["duration_s"].append(duration)
                rows["n_windows"].append(len(energy))
                rows["window_energy"].append(energy)
                rows["energy_sums"].append(sums)
            yield pd.DataFrame(rows)

    return df.filter(F.col("modality") == "audio").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _avg_hash_bits(rgb: bytes, w: int, h: int, grid: int = 8) -> int:
    """64-bit average hash: luminance → ``grid×grid`` block means → bit i
    set when block i exceeds the global block mean. The classic
    perceptual hash: robust to re-encoding, resizing, and small pixel
    edits; Hamming distance ranks visual similarity."""
    arr = np.frombuffer(rgb, dtype=np.uint8).astype(np.float64).reshape(h, w, 3)
    lum = arr @ np.array([0.299, 0.587, 0.114])
    # ADVICE r4: a width or height below the grid would make some block
    # slices empty (mean() -> NaN, every comparison False, hash 0 — all
    # tiny images would pair as Hamming-0 duplicates). Clamp to an
    # effective grid so every block holds >= 1 pixel.
    grid = max(1, min(grid, w, h))
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    blocks = np.empty((grid, grid))
    for by in range(grid):
        for bx in range(grid):
            blocks[by, bx] = lum[ys[by]:ys[by + 1], xs[bx]:xs[bx + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # keep inside signed-64 non-negative range: fold bit 63 into bit 62's
    # neighborhood is WRONG (loses information) — instead store the raw
    # 64-bit pattern as Python int and let two's-complement wrap to
    # signed; Hamming via XOR is sign-agnostic
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def image_perceptual_hash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Per-image 64-bit perceptual (average) hash over DECODED pixels —
    the multimodal near-dup key: re-encoded, resized, or slightly edited
    copies of an image land within a few bits of each other, which pure
    byte-level dedup (md5 of payload) can never see. One Arrow-batched
    ``mapInPandas`` crossing; non-image rows are filtered out (same
    contract as decode_image_features)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_hash = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(p))
                out_ids.append(int(mid))
                out_hash.append(_avg_hash_bits(rgb, w, h, grid))
            yield pd.DataFrame({"media_id": out_ids, "phash": out_hash})

    return df.filter(F.col("modality") == "image").mapInPandas(
        kernel, schema=PHASH_SCHEMA
    )


def _phash_banded(hashes: DataFrame, id_col: str, sig_col: str) -> DataFrame:
    """Pigeonhole banding for 64-bit hashes: four 16-bit chunks — any
    pair within Hamming distance 3 must agree on at least one full
    chunk, so (chunk index, chunk value) is a lossless candidate key."""
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col(sig_col), 16 * c).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ]
    )
    return hashes.select(
        F.col(id_col).alias("doc"),
        F.col(sig_col).alias("_sig"),
        F.posexplode(chunks).alias("band", "band_val"),
    )


def phash_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    sig_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs from 64-bit perceptual hashes by the
    SimHash pigeonhole: candidates join on (chunk index, chunk value),
    exact Hamming filters. Same scale shape as simhash_dup_pairs:
    equi-join on bucket keys, no cartesian product, candidates ∝
    collisions not n². Composable with the hash relation stored/bucketed
    like the MinHash band index."""
    banded = _phash_banded(hashes, id_col, sig_col)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a._sig").bitwiseXOR(F.col("b._sig"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias(f"{id_col}_a"),
            F.col("b.doc").alias(f"{id_col}_b"),
            hamming.cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates([f"{id_col}_a", f"{id_col}_b"])
        .orderBy(f"{id_col}_a", f"{id_col}_b")
    )


def phash_dup_pairs_between(
    index: DataFrame,
    incoming: DataFrame,
    id_col: str = "media_id",
    sig_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Cross-relation phash near-dup pairs: ``index`` is the stored hash
    relation of everything previously accepted (media ids + 64-bit
    phash — 16 B/image, the corpus's raw pixels are never re-read);
    ``incoming`` is a new batch's hash relation. Output pairs
    (``{id}_a`` from the index, ``{id}_b`` incoming) within the Hamming
    budget — the incremental form of :func:`phash_dup_pairs`, mirroring
    minhash_dup_pairs_between for text. Equi-join on the pigeonhole
    chunk key; candidates ∝ cross-collisions, not |index|·|batch|."""
    a = _phash_banded(index, id_col, sig_col).alias("a")
    b = _phash_banded(incoming, id_col, sig_col).alias("b")
    hamming = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .select(
            F.col("a.doc").alias(f"{id_col}_a"),
            F.col("b.doc").alias(f"{id_col}_b"),
            hamming.cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates([f"{id_col}_a", f"{id_col}_b"])
    )
