"""Audio/video multimodal plumbing: opaque binary columns + typed
metadata, Arrow-batched feature extraction, frame sampling feeding the
existing image operators. Decode for REAL formats is explicitly gated
(NotImplementedError) per the deterministic-fake codec pattern."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.datagen import generate_audio, generate_videos
from airbyte_spark.functions.multimodal import (
    audio_features,
    decode_audio,
    encode_audio,
    encode_video,
    iter_video_frames,
    sample_frames,
    video_frame_features,
)


def test_audio_codec_roundtrip_and_gate():
    pcm = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
    data = encode_audio(pcm, 16000)
    back, rate = decode_audio(data)
    assert rate == 16000 and np.array_equal(back, pcm)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03fake-mp3-payload")


def test_video_codec_gate():
    with pytest.raises(NotImplementedError):
        list(iter_video_frames(b"\x00\x00\x00\x18ftypmp42"))


def test_audio_features_batch(spark):
    clips = generate_audio(spark, 24, num_partitions=4)
    feats = audio_features(clips)
    rows = feats.collect()
    assert len(rows) == 24
    for r in rows:
        assert 0.0 < r["rms"] <= r["peak"] <= 1.0
        assert 0.0 <= r["zero_cross_rate"] <= 1.0
    # deterministic: same seed -> same values
    again = {r["clip_id"]: r["rms"] for r in audio_features(
        generate_audio(spark, 24, num_partitions=2)
    ).collect()}
    assert again == {r["clip_id"]: r["rms"] for r in rows}


def test_frame_sampling_shapes_and_counts(spark):
    vids = generate_videos(spark, 10, num_partitions=2)
    meta = {r["video_id"]: r["n_frames"] for r in vids.collect()}
    frames = sample_frames(vids, every_k=2)
    got = frames.groupBy("video_id").count().collect()
    for r in got:
        expect = -(-meta[r["video_id"]] // 2)  # ceil(n/2)
        assert r["count"] == expect
    # frame payloads are REAL SPNG: the image codec decodes them
    from airbyte_spark.codecs import decode_image

    one = frames.first()
    px = decode_image(one["frame_bytes"])
    assert px.shape == (one["h"], one["w"], 3)


def test_video_frame_phash_pipeline(spark):
    vids = generate_videos(spark, 6, num_partitions=2)
    feats = video_frame_features(vids, every_k=3)
    rows = feats.collect()
    assert rows and all(r["phash"] is not None for r in rows)
    # frames of one video share the drifting pattern -> near-but-not-equal
    # hashes; frames of DIFFERENT videos differ (sanity, not exhaustive)
    by_vid: dict = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], set()).add(r["phash"])
    assert len(by_vid) == 6
