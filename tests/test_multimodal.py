"""Multimodal binary-column plumbing: schemas, mapInPandas batch shapes,
determinism, and fan-out semantics. Decode kernels are deterministic fakes
(codecs absent in this container); the Spark-side plumbing under test is
real.
"""

from __future__ import annotations

from fresco_hpc_spark.functions.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_schema_and_determinism(spark):
    m1 = synthetic_media(spark, 20)
    assert m1.schema == MEDIA_SCHEMA
    rows1 = {r.media_id: bytes(r.payload) for r in m1.collect()}
    rows2 = {r.media_id: bytes(r.payload) for r in synthetic_media(spark, 20).collect()}
    assert rows1 == rows2  # deterministic payloads
    lens = {len(p) for p in rows1.values()}
    assert lens == {64, 128, 192, 256}  # 32-byte digests * 2 * (1 + id%4)


def test_decode_image_features(spark):
    media = synthetic_media(spark, 16, modality="image").repartition(4)
    feats = decode_image_features(media, dim=8)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 16
    for r in rows:
        assert len(r.features) == 8
        assert 0.0 <= r.mean_byte <= 255.0
        assert r.n_bytes in (64, 128, 192, 256)
    # deterministic across runs / partitionings
    again = {r.media_id: r.features for r in decode_image_features(media.coalesce(1), dim=8).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_decode_filters_non_images(spark):
    audio = synthetic_media(spark, 5, modality="audio")
    assert decode_image_features(audio).count() == 0


def test_resize_updates_meta_only(spark):
    media = synthetic_media(spark, 4)
    resized = resize_images(media, 224, 224)
    assert resized.schema.fieldNames() == MEDIA_SCHEMA.fieldNames()
    assert [f.name for f in resized.schema["meta"].dataType.fields] == [
        f.name for f in MEDIA_SCHEMA["meta"].dataType.fields
    ]
    for r in resized.collect():
        assert r.meta.width == 224 and r.meta.height == 224
        assert r.meta.format == "png"


def test_sample_frames_fanout(spark):
    video = synthetic_media(spark, 6, modality="video")
    frames = sample_frames(video, frame_bytes=32, every_n=2)
    assert frames.schema == FRAME_SCHEMA
    got = frames.collect()
    # payload length 64/128/192/256 → 2/4/6/8 chunks → every 2nd kept
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r.frame_index)
    payload_len = {r.media_id: len(bytes(r.payload)) for r in video.collect()}
    for mid, idxs in by_id.items():
        expected = [k for k in range(payload_len[mid] // 32) if k % 2 == 0]
        assert sorted(idxs) == expected


def test_audio_features_windows(spark):
    from fresco_hpc_spark.functions import extract_audio_features, synthetic_media

    audio = synthetic_media(spark, 20, modality="audio")
    feats = extract_audio_features(audio, window_samples=200)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        # sample_rate/duration come from the DECODED WAV header
        assert r["sample_rate"] == 8000
        n_samp = 400 + (r["media_id"] % 4) * 200
        assert abs(r["duration_s"] - n_samp / 8000.0) < 1e-9
        assert r["n_windows"] == n_samp // 200
        assert r["n_windows"] == len(r["window_energy"])
        # amplitude-0.5 sine, whole periods per window -> RMS ~ 0.5/sqrt(2)
        for e in r["window_energy"]:
            assert abs(e - 0.5 / 2 ** 0.5) < 0.01
    # determinism: same media_id -> same energies on recompute
    again = {r["media_id"]: r["window_energy"] for r in feats.collect()}
    assert all(again[r["media_id"]] == r["window_energy"] for r in rows)


def test_audio_rms_known_signal(spark):
    """A hand-built square wave has constant |sample| = A, so every
    window RMS must be exactly A/32768 (round-6)."""
    import io as _io
    import struct as _struct
    import wave as _wave

    from fresco_hpc_spark.functions import extract_audio_features

    amp = 8192
    frames = b"".join(
        _struct.pack("<h", amp if t % 2 == 0 else -amp) for t in range(512)
    )
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(4000)
        w.writeframes(frames)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()), (None, None, None, None, "wav"))],
        schema="media_id bigint, modality string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_s:double,format:string>",
    )
    rows = extract_audio_features(df, window_samples=128).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sample_rate"] == 4000
    assert abs(r["duration_s"] - 512 / 4000.0) < 1e-9
    assert r["n_windows"] == 4
    expected = round(amp / 32768.0, 6)
    assert all(e == expected for e in r["window_energy"])


def test_audio_non_wav_payload_falls_back(spark):
    from fresco_hpc_spark.functions import extract_audio_features

    df = spark.createDataFrame(
        [(2, "audio", bytearray(b"\x10" * 64), (None, None, 16000, 1.0, "ogg"))],
        schema="media_id bigint, modality string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_s:double,format:string>",
    )
    r = extract_audio_features(df, window_samples=32).collect()[0]
    assert r["sample_rate"] == 16000 and r["n_windows"] == 2
    assert all(e == round(0x10 / 255.0, 6) for e in r["window_energy"])
