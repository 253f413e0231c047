"""Multimodal plumbing: schema, Arrow batch shapes, real-codec feature
array, pure-SQL frame sampling."""

from relex_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    sample_frames,
    synthesize_media,
    synthesize_real_media,
)


def test_media_synthesis_deterministic(spark):
    a = synthesize_media(spark, 64).collect()
    b = synthesize_media(spark, 64).orderBy("media_id").collect()
    a = sorted(a, key=lambda r: r["media_id"])
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
    assert all(len(bytes(r["payload"])) == 128 for r in a)
    assert {r["kind"] for r in a} == {"image", "audio", "video"}


def test_decode_features_array_contract(spark):
    """The features-ARRAY API is a pure projection of the real decode:
    [d1, d2, f1, f2, f3] position-for-position, deterministic, over real
    WAV/BMP payloads."""
    from relex_spark.operators.multimodal import decode_features_real

    media = synthesize_real_media(spark, 48)
    f1 = decode_features(media).orderBy("media_id").collect()
    f2 = decode_features(media).orderBy("media_id").collect()
    real = {
        r["media_id"]: r
        for r in decode_features_real(media).collect()
    }
    assert len(f1) == 48
    assert all(len(r["features"]) == 5 for r in f1)
    assert [list(r["features"]) for r in f1] == [list(r["features"]) for r in f2]
    for r in f1:
        g = real[r["media_id"]]
        assert r["n_bytes"] == g["n_bytes"]
        assert list(r["features"]) == [g["d1"], g["d2"], g["f1"], g["f2"], g["f3"]]


def test_decode_features_rejects_kinds_without_codec(spark):
    import pytest

    media = synthesize_media(spark, 6).where("kind = 'video'")
    with pytest.raises(Exception) as exc:
        decode_features(media).collect()
    assert "no real codec" in str(exc.value)


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


def test_real_codec_roundtrip_against_ground_truth(spark):
    """WAV/BMP bytes generated, decoded, and feature-extracted through the
    full Spark path must match features computed directly from the
    generator's ground-truth arrays (a true codec roundtrip: any header,
    padding, channel-order, or row-order bug breaks equality)."""
    import numpy as np

    from relex_spark.operators.multimodal import (
        _bmp_dims,
        _bmp_pixels,
        _wav_params,
        decode_features_real,
        synthesize_real_media,
        wav_bytes,
        decode_wav,
    )

    media = synthesize_real_media(spark, n=24)
    rows = {r["media_id"]: r for r in decode_features_real(media).collect()}
    assert len(rows) == 24
    for mid, r in rows.items():
        if mid % 2:  # audio
            n, freq, amp = _wav_params(mid)
            _, x = decode_wav(wav_bytes(mid))
            xf = x.astype(np.float64) / 32768.0
            assert r["kind"] == "audio"
            assert r["n_bytes"] == 44 + 2 * n
            assert r["d1"] == 8000.0 and r["d2"] == float(n)
            assert abs(r["f1"] - np.sqrt(np.mean(xf * xf))) < 1e-12
            assert abs(r["f3"] - np.max(np.abs(xf))) < 1e-12
        else:  # image
            w, h = _bmp_dims(mid)
            px = _bmp_pixels(mid, w, h).astype(np.float64)
            row_len = (w * 3 + 3) & ~3
            assert r["kind"] == "image"
            assert r["n_bytes"] == 54 + row_len * h
            assert (r["d1"], r["d2"]) == (float(w), float(h))
            for j, f in enumerate(("f1", "f2", "f3")):
                assert abs(r[f] - px[:, :, j].mean()) < 1e-12


def test_wav_decoder_matches_stdlib_wave(spark):
    """Independent-decoder check: Python's stdlib wave module reads the
    generated files and yields identical samples."""
    import io
    import wave

    import numpy as np

    from relex_spark.operators.multimodal import decode_wav, wav_bytes

    for mid in (1, 9, 63):
        wf = wave.open(io.BytesIO(wav_bytes(mid)))
        assert (wf.getframerate(), wf.getnchannels(), wf.getsampwidth()) == (
            8000, 1, 2,
        )
        ind = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
        rate, own = decode_wav(wav_bytes(mid))
        assert rate == 8000 and (ind == own).all()


def test_resize_images_nearest_neighbor_replay(spark):
    """resize_images vs an explicit per-pixel loop replay of the documented
    mapping src = floor(dst * src_dim / dst_dim), on real decoded BMPs —
    including an upscale (src_h == 8 -> dst 16) and a downscale."""
    from relex_spark.operators.multimodal import (
        bmp_bytes,
        decode_bmp,
        resize_images,
        synthesize_real_media,
    )

    media = synthesize_real_media(spark, n=8)
    for dw, dh in ((8, 8), (4, 16)):
        got = {
            r["media_id"]: r.asDict()
            for r in resize_images(media, dst_w=dw, dst_h=dh).collect()
        }
        assert set(got) == {0, 2, 4, 6}
        for mid in got:
            px = decode_bmp(bmp_bytes(mid))
            h, w = px.shape[:2]
            sr = sg = sb = ph = 0
            for y in range(dh):
                for x in range(dw):
                    r, g, b = (
                        int(v) for v in px[(y * h) // dh, (x * w) // dw]
                    )
                    sr, sg, sb = sr + r, sg + g, sb + b
                    ph += (r * 65536 + g * 256 + b) * (x + y * dw + 1)
            row = got[mid]
            assert (row["src_w"], row["src_h"]) == (w, h)
            assert (row["dst_w"], row["dst_h"]) == (dw, dh)
            assert (row["sum_r"], row["sum_g"], row["sum_b"]) == (sr, sg, sb)
            assert row["pix_hash"] == ph


def test_decimate_audio_numpy_replay(spark):
    """decimate_audio vs a direct numpy replay (decode + x[::k]) — pins
    the decimated CONTENT (rms/peak) the SQL oracle cannot (libm sin is
    not bit-portable), plus the header fields it can."""
    import numpy as np

    from relex_spark.operators.multimodal import (
        decimate_audio,
        decode_wav,
        synthesize_real_media,
        wav_bytes,
    )

    media = synthesize_real_media(spark, n=8)
    got = {
        r["media_id"]: r.asDict()
        for r in decimate_audio(media, factor=4).collect()
    }
    assert set(got) == {1, 3, 5, 7}
    for mid in got:
        rate, x = decode_wav(wav_bytes(mid))
        d = x[::4].astype(np.float64) / 32768.0
        row = got[mid]
        assert row["rate_out"] == rate // 4
        assert row["n_out"] == len(d)
        assert row["rms_u6"] == int(
            np.floor(np.sqrt(np.mean(d * d)) * 1_000_000 + 0.5)
        )
        assert row["peak"] == int(np.max(np.abs(x[::4])))


def test_zero_sample_and_full_scale_wavs_are_handled(spark):
    """Edge WAVs the public API must survive (review findings, r5): a
    zero-length data chunk yields 0-valued features instead of
    NaN/ValueError, and a full-scale -32768 sample yields a positive peak
    (int64 widening before abs)."""
    import struct

    from relex_spark.operators.multimodal import (
        decimate_audio,
        decode_features,
    )

    def wav(data: bytes) -> bytes:
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data

    empty = wav(b"")
    fullscale = wav(struct.pack("<4h", -32768, 32767, -32768, 5))
    media = spark.createDataFrame(
        [(0, "audio", bytearray(empty)), (1, "audio", bytearray(fullscale))],
        "media_id bigint, kind string, payload binary",
    )

    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    assert feats[0]["features"][1] == 0.0            # n_samples
    assert feats[0]["features"][2:] == [0.0, 0.0, 0.0]  # rms/zcr/peak, no NaN
    assert feats[1]["features"][4] == 1.0            # |-32768|/32768, positive

    dec = {r["media_id"]: r for r in decimate_audio(media, factor=2).collect()}
    assert dec[0]["n_out"] == 0 and dec[0]["rms_u6"] == 0 and dec[0]["peak"] == 0
    assert dec[1]["peak"] == 32768                   # widened, not -32768
