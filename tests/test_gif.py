"""GIF codec suite: LZW round-trips across width boundaries and the
4096-entry clear-reset, still/interlace/palette-size coverage, animation
compositing (transparency + disposal methods), malformed rejection, and
the Spark paths (extract_features still image, frame_features animation).
"""

import numpy as np
import pytest

from valentine_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames,
)


@pytest.mark.parametrize(
    "mcs,n",
    [(2, 50_000), (3, 20_000), (8, 70_000), (4, 4_097), (2, 1), (2, 12_288)],
)
def test_lzw_roundtrip_random(mcs, n):
    rng = np.random.default_rng(mcs * 1000 + n)
    idx = rng.integers(0, 1 << mcs, size=n).astype(np.uint8)
    assert _lzw_decode(_lzw_encode(idx, mcs), mcs, n) == idx.tobytes()


@pytest.mark.parametrize("mcs", [2, 5])
def test_lzw_roundtrip_repetitive(mcs):
    # long runs drive maximal dictionary chains and the KwKwK case
    idx = np.tile(np.arange(1 << mcs, dtype=np.uint8), 3000)[:40_000]
    assert _lzw_decode(_lzw_encode(idx, mcs), mcs, len(idx)) == idx.tobytes()
    flat = np.zeros(30_000, np.uint8)
    assert _lzw_decode(_lzw_encode(flat, mcs), mcs, len(flat)) == flat.tobytes()


def _random_image(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    return palette[rng.integers(0, n_colors, size=(h, w))]


@pytest.mark.parametrize("n_colors", [2, 5, 64, 256])
def test_still_roundtrip_palette_sizes(n_colors):
    img = _random_image(37, 53, n_colors, n_colors)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlaced_roundtrip():
    img = _random_image(41, 23, 16, 99)
    raw = encode_gif(img, interlace=True)
    assert np.array_equal(decode_gif(raw), img)
    assert raw != encode_gif(img)  # row order actually differs on the wire


def test_animation_composites_transparency():
    f1 = np.full((20, 30, 3), (10, 20, 30), np.uint8)
    f2 = f1.copy()
    f2[5:10, 5:10] = (200, 100, 50)
    tc = (1, 2, 3)
    f2t = f2.copy()
    f2t[0:3, 0:3] = tc  # transparent hole: frame 1 must show through
    frames = list(gif_frames(encode_gif([f1, f2t], transparent_color=tc)))
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    expect = f2.copy()
    expect[0:3, 0:3] = f1[0:3, 0:3]
    assert np.array_equal(frames[1], expect)
    # decode_gif = first frame
    assert np.array_equal(
        decode_gif(encode_gif([f1, f2t], transparent_color=tc)), f1
    )


@pytest.mark.parametrize("disposal", [2, 3])
def test_animation_disposal_restores_canvas(disposal):
    # disposal 2 restores the painted rect to BACKGROUND (palette[0]),
    # disposal 3 restores what was there BEFORE the frame drew
    f1 = np.full((8, 8, 3), (10, 20, 30), np.uint8)
    f2 = f1.copy()
    f2[2:4, 2:4] = (200, 0, 0)
    f3 = np.full((8, 8, 3), (0, 0, 200), np.uint8)
    frames = list(gif_frames(encode_gif([f1, f2, f3], disposal=disposal)))
    assert len(frames) == 3
    assert np.array_equal(frames[1], f2)
    assert np.array_equal(frames[2], f3)  # full-rect frame 3 overwrites all


def test_256_color_cap_enforced():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 40, 3)).astype(np.uint8)
    assert len({tuple(p) for p in img.reshape(-1, 3)}) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_malformed_inputs_raise():
    good = encode_gif(_random_image(9, 9, 4, 1))
    for bad in [b"", b"GIF89a", b"GIF89a" + b"\x00" * 7, good[:-5]]:
        with pytest.raises(ValueError):
            decode_gif(bad)
    # missing trailer: decode_gif legitimately returns the first frame
    # (it never reads past it), but full iteration must notice
    with pytest.raises(ValueError, match="trailer"):
        list(gif_frames(good[:-1]))


def test_extract_features_real_gif_decode(spark):
    from valentine_spark.operators.multimodal import extract_features, image_features

    img = _random_image(24, 16, 8, 7)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_gif(img)), 16, 24, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    [row] = extract_features(df).collect()
    assert row["feature"] == pytest.approx(image_features(img).tolist(), abs=1e-6)


def test_frame_features_animated_gif(spark):
    from valentine_spark.operators.multimodal import frame_features, image_features

    frames = [_random_image(12, 18, 6, s) for s in range(5)]
    raw = encode_gif(frames)
    df = spark.createDataFrame(
        [(7, "image", bytearray(raw), 18, 12, 0),
         (8, "image", bytearray(b"not a gif"), 0, 0, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    rows = frame_features(df, every_n=2, max_frames_per_video=2).collect()
    got = {(r["media_id"], r["frame_index"]): r for r in rows}
    # every_n=2 samples frames 0 and 2; max_frames caps at 2
    assert set(got) == {(7, 0), (7, 2), (8, -1)}
    assert got[(7, 0)]["decoded"] and got[(7, 2)]["decoded"]
    assert not got[(8, -1)]["decoded"]
    assert got[(7, 2)]["feature"] == pytest.approx(
        image_features(frames[2]).tolist(), abs=1e-6
    )


def test_probe_gif_metadata_only():
    from valentine_spark.functions.gif import probe_gif

    frames = [_random_image(11, 13, 4, s) for s in range(3)]
    meta = probe_gif(encode_gif(frames, delay_cs=25))
    assert meta == {
        "container": "gif", "width": 13, "height": 11, "duration_ms": 750,
        "n_frames": 3, "fps": 4.0, "codec": "gif-lzw",
    }
    still = probe_gif(encode_gif(frames[0]))
    assert (still["n_frames"], still["duration_ms"], still["fps"]) == (1, 0, None)
    with pytest.raises(ValueError):
        probe_gif(encode_gif(frames)[:-1])  # missing trailer


def test_probe_metadata_routes_gif(spark):
    from valentine_spark.operators.multimodal import probe_metadata

    raw = encode_gif([_random_image(6, 8, 4, s) for s in range(2)], delay_cs=10)
    df = spark.createDataFrame(
        [(1, "image", bytearray(raw), 8, 6, 0),
         (2, "image", bytearray(b"junk"), 0, 0, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    rows = {r["media_id"]: r for r in probe_metadata(df).collect()}
    assert rows[1]["container"] == "gif" and rows[1]["n_frames"] == 2
    assert rows[1]["duration_ms"] == 200 and rows[1]["codec"] == "gif-lzw"
    assert rows[2]["container"] is None
