"""Multimodal plumbing: schema, Arrow batch shapes, deterministic fake
featurizer, pure-SQL frame sampling."""

from relex_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    sample_frames,
    synthesize_media,
)


def test_media_synthesis_deterministic(spark):
    a = synthesize_media(spark, 64).collect()
    b = synthesize_media(spark, 64).orderBy("media_id").collect()
    a = sorted(a, key=lambda r: r["media_id"])
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
    assert all(len(bytes(r["payload"])) == 128 for r in a)
    assert {r["kind"] for r in a} == {"image", "audio", "video"}


def test_decode_features_shapes_and_determinism(spark):
    media = synthesize_media(spark, 48)
    f1 = decode_features(media, dim=16).orderBy("media_id").collect()
    f2 = decode_features(media, dim=16).orderBy("media_id").collect()
    assert len(f1) == 48
    assert all(len(r["features"]) == 16 for r in f1)
    assert all(r["n_bytes"] == 128 for r in f1)
    assert [list(r["features"]) for r in f1] == [list(r["features"]) for r in f2]


def test_decode_features_stub_raises_without_fake(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    media = synthesize_media(spark, 4)
    with pytest.raises(Exception) as exc:
        decode_features(media, allow_fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "no codec" in str(exc.value)


def test_sample_frames_pure_sql(spark):
    media = synthesize_media(spark, 60)
    frames = sample_frames(media, every=2)
    rows = frames.collect()
    assert rows, "no video frames sampled"
    assert all(r["frame_no"] % 2 == 0 for r in rows)
    # frame bytes = floor(128 / n_frames) each
    vids = {r["media_id"]: r for r in media.where("kind = 'video'").collect()}
    for r in rows:
        n = vids[r["media_id"]]["meta"]["frames"]
        assert r["frame_bytes"] == 128 // n
    assert frames.schema["frame"].dataType.typeName() == "binary"
