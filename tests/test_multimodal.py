"""Multimodal plumbing: schemas, batch fan-out, determinism, stub seams."""

from __future__ import annotations

import pytest

from blurrily_spark.sources.multimodal import (
    _EMB_DIM,
    decode_audio_features,
    decode_image_features,
    generate_media,
    sample_video_frames,
)


def test_image_features_schema_and_determinism(spark):
    media = generate_media(spark, n=30, seed=3)
    feats = decode_image_features(media)
    rows = feats.collect()
    assert feats.columns == ["media_id", "width", "height", "embedding"]
    assert len(rows) == media.where("kind = 'image'").count()
    assert all(len(r["embedding"]) == _EMB_DIM for r in rows)
    again = {r["media_id"]: r["embedding"] for r in decode_image_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["embedding"]


def test_audio_features(spark):
    media = generate_media(spark, n=30, seed=3)
    rows = decode_audio_features(media).collect()
    assert len(rows) == media.where("kind = 'audio'").count()
    assert all(r["duration_ms"] is not None for r in rows)


def test_video_frame_fanout(spark):
    media = generate_media(spark, n=30, seed=3)
    frames = sample_video_frames(media, every_ms=400)
    rows = frames.collect()
    vids = {r["media_id"]: r["meta"]["duration_ms"]
            for r in media.where("kind = 'video'").collect()}
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    for vid, duration in vids.items():
        expected = len(range(0, duration, 400))
        assert len(by_vid[vid]) == expected
        assert sorted(x["frame_idx"] for x in by_vid[vid]) == list(range(expected))


def test_ppm_roundtrip_bytes_exact():
    import numpy as np

    from blurrily_spark.sources.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    w, h, got = decode_ppm(encode_ppm(px))
    assert (w, h) == (64, 48)
    assert (got == px).all()
    # header grammar: comments between tokens
    with_comment = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    w, h, got = decode_ppm(with_comment)
    assert (w, h, got.shape) == (2, 1, (1, 2, 3))
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 1\n255\n" + bytes(2))


def test_wav_roundtrip_samples_exact():
    import numpy as np

    from blurrily_spark.sources.multimodal import decode_wav, encode_wav

    samples = (np.arange(-500, 500, dtype=np.int16) * 33).astype(np.int16)
    rate, got = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert (got == samples).all()


def test_real_image_decode_end_to_end(spark):
    """real=True over a mix of real PNG and PPM payloads: width/height come
    from the decoded header and the embedding is the grid-pooled grayscale
    of the actual pixels (cross-checked against a local numpy decode)."""
    import numpy as np

    from blurrily_spark.sources.multimodal import _image_embedding, decode_image

    media = generate_media(spark, n=12, seed=3, codec="real")
    rows = {r["media_id"]: r for r in decode_image_features(media, real=True).collect()}
    metas = {r["media_id"]: (r["meta"], bytes(r["payload"]))
             for r in media.where("kind = 'image'").collect()}
    assert set(rows) == set(metas)
    for mid, (meta, payload) in metas.items():
        assert rows[mid]["width"] == meta["width"]
        assert rows[mid]["height"] == meta["height"]
        _, _, px = decode_image(payload)
        expected = _image_embedding(px)
        assert np.allclose(rows[mid]["embedding"], expected)
    # the table really mixes both formats (dispatcher exercised end-to-end)
    codecs = {m["codec"] for m, _ in metas.values()}
    assert codecs == {"png", "ppm"}


def test_real_audio_decode_end_to_end(spark):
    import numpy as np

    from blurrily_spark.sources.multimodal import _audio_energies, decode_wav

    media = generate_media(spark, n=12, seed=3, codec="real")
    rows = {r["media_id"]: r for r in decode_audio_features(media, real=True).collect()}
    for r in media.where("kind = 'audio'").collect():
        got = rows[r["media_id"]]
        # duration re-derived from the real frame count (1 ms quantization)
        assert abs(got["duration_ms"] - r["meta"]["duration_ms"]) <= 1
        _, samples = decode_wav(bytes(r["payload"]))
        assert np.allclose(got["mfcc"], _audio_energies(samples))


def test_y4m_roundtrip_frames_exact():
    import numpy as np

    from blurrily_spark.sources.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(7, 24, 32), dtype=np.uint8)
    w, h, fps, got = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (w, h, fps) == (32, 24, (30, 1))
    assert (got == frames).all()
    # only mono colorspace is supported; compressed containers refused
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\nFRAME\n" + bytes(6))
    with pytest.raises(ValueError):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42")


def test_real_video_decode_end_to_end(spark):
    """real=True demuxes Y4M payloads: duration from the real frame count,
    embeddings from the actual luma planes (cross-checked locally)."""
    import numpy as np

    from blurrily_spark.sources.multimodal import _gray_embedding, decode_y4m

    media = generate_media(spark, n=12, seed=3, codec="real")
    rows = sample_video_frames(media, every_ms=400, real=True).collect()
    by_vid: dict[int, list] = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    vids = {r["media_id"]: bytes(r["payload"])
            for r in media.where("kind = 'video'").collect()}
    assert set(by_vid) == set(vids)
    for mid, payload in vids.items():
        _, _, (num, den), frames = decode_y4m(payload)
        duration = int(len(frames) * 1000 * den / num)
        sampled = sorted(by_vid[mid], key=lambda r: r["frame_idx"])
        assert len(sampled) == len(range(0, duration, 400))
        for idx, r in enumerate(sampled):
            ms = idx * 400
            src = min(int(round(ms * num / (1000 * den))), len(frames) - 1)
            assert np.allclose(r["frame"], _gray_embedding(frames[src]))


def test_real_decode_on_foreign_payloads_fails_loudly(spark):
    """real=True on non-PPM / non-Y4M payloads raises a clear error --
    compressed containers are the declared ffmpeg seam."""
    media = generate_media(spark, n=6, seed=3)  # fake payloads
    with pytest.raises(Exception) as exc:
        sample_video_frames(media, real=True).collect()
    assert "YUV4MPEG2" in str(exc.value)
    with pytest.raises(Exception) as exc:
        decode_image_features(media, real=True).collect()
    assert "PPM" in str(exc.value)


def test_png_roundtrip_all_filters():
    """Round-4 verdict #6: dependency-free PNG. Encoding with each of the
    five scanline filters must reconstruct bit-identical pixels, covering
    every unfilter path (None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from blurrily_spark.sources.multimodal import decode_png, encode_png

    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    for ftype in range(5):
        payload = encode_png(px, filter_type=ftype)
        w, h, got = decode_png(payload)
        assert (w, h) == (31, 23), ftype
        assert np.array_equal(got, px), f"filter {ftype} not lossless"


def test_png_colortypes_and_guards():
    """Greyscale and alpha variants land in the RGB kernel shape; palette /
    16-bit / corrupt files fail loudly."""
    import zlib

    import numpy as np
    import pytest

    from blurrily_spark.sources.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_image,
        decode_png,
        encode_png,
    )

    def make_png(raw_rows, width, height, color_type, depth=8):
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        raw = b"".join(b"\x00" + r.tobytes() for r in raw_rows)
        ihdr = (
            width.to_bytes(4, "big")
            + height.to_bytes(4, "big")
            + bytes([depth, color_type, 0, 0, 0])
        )
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(5)
    # greyscale -> replicated channels
    g = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    w, h, px = decode_png(make_png(list(g), 6, 4, color_type=0))
    assert (w, h) == (6, 4)
    assert np.array_equal(px, np.repeat(g[:, :, None], 3, axis=2))
    # RGBA -> alpha dropped
    rgba = rng.integers(0, 256, size=(3, 5, 4), dtype=np.uint8)
    _, _, px = decode_png(make_png(list(rgba), 5, 3, color_type=6))
    assert np.array_equal(px, rgba[:, :, :3])
    # grey+alpha -> grey replicated
    ga = rng.integers(0, 256, size=(2, 4, 2), dtype=np.uint8)
    _, _, px = decode_png(make_png(list(ga), 4, 2, color_type=4))
    assert np.array_equal(px, np.repeat(ga[:, :, :1], 3, axis=2))
    # palette and 16-bit refuse with the documented error
    pal = rng.integers(0, 2, size=(2, 2), dtype=np.uint8)
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(make_png(list(pal), 2, 2, color_type=3))
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(make_png(list(g), 6, 4, color_type=0, depth=16))
    # CRC corruption is caught
    good = bytearray(encode_png(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)))
    good[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|PNG"):
        decode_png(bytes(good))
    # the dispatcher sniffs magics and rejects foreign payloads
    with pytest.raises(ValueError, match="PNG or P6"):
        decode_image(b"GIF89a not supported")
