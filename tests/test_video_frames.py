"""MJPEG AVI frame extraction + decode (functions/video_frames.py,
functions/jpeg.py standard tables / DHT splice, multimodal.frame_features).

Reference parity: the reference has no media surface (SURVEY.md §2
"multimodal: new construction"); these tests pin the round-trip contracts
of the bundled pure-Python path the 100-TB media tier plugs real codecs
into.
"""

import numpy as np
import pytest

from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg, ensure_dht
from valentine_spark.functions.video_frames import (
    decode_avi_frames,
    encode_avi_mjpeg,
    iter_avi_frames,
)
from valentine_spark.functions.video_meta import VideoMetaError, probe_video


def _frames(n=3, h=24, w=32, seed=11):
    """Smooth gradient frames (JPEG's design regime) that differ per index."""
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 200, w)
    out = []
    for i in range(n):
        img = np.clip(
            np.dstack(
                [
                    np.add.outer(np.linspace(0, 50 + 40 * i, h), base),
                    np.tile(base, (h, 1)) + 20 * i,
                    rng.integers(0, 30, size=(h, w)) + 30 * i,
                ]
            ),
            0,
            255,
        ).astype(np.uint8)
        out.append(img)
    return out


def test_standard_tables_roundtrip_q100():
    """Annex-K entropy coding is a pure re-coding of the same coefficients:
    quality-100 round-trip error matches the fixed-table bound, and the
    standard-table payload carries a DHT the splice must not touch."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=100, tables="standard")
    assert ensure_dht(data) == data  # tables present -> passthrough
    out = decode_jpeg(data)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 6 and diff.mean() < 2.0, (diff.max(), diff.mean())


def test_mjpeg_dht_splice_restores_exact_bitstream():
    """A table-less MJPEG frame fails the strict decoder, and splicing the
    Annex-K tables back yields the SAME pixels as the with-DHT encoding —
    the entropy bits are identical, only the declaration was missing."""
    img = _frames(1)[0]
    with_dht = encode_jpeg(img, quality=90, tables="standard")
    without = encode_jpeg(img, quality=90, tables="standard", omit_dht=True)
    assert len(without) < len(with_dht)
    with pytest.raises((ValueError, KeyError)):
        decode_jpeg(without)
    assert np.array_equal(decode_jpeg(ensure_dht(without)), decode_jpeg(with_dht))


def test_encode_jpeg_rejects_bad_table_options():
    img = _frames(1)[0]
    with pytest.raises(ValueError):
        encode_jpeg(img, tables="arithmetic")
    with pytest.raises(ValueError):
        encode_jpeg(img, omit_dht=True)  # fixed tables cannot be omitted


def test_avi_mjpeg_roundtrip_and_probe():
    frames = _frames(3)
    raw = encode_avi_mjpeg(frames, fps=10, quality=95)
    meta = probe_video(raw)
    assert meta["container"] == "avi" and meta["codec"] == "MJPG"
    assert meta["n_frames"] == 3 and meta["fps"] == 10.0
    assert (meta["width"], meta["height"]) == (32, 24)

    payloads = list(iter_avi_frames(raw))
    assert len(payloads) == 3
    assert all(p[:2] == b"\xff\xd8" for p in payloads)
    assert all(b"\xff\xc4" not in p[: p.find(b"\xff\xda")] for p in payloads)

    decoded = dict(decode_avi_frames(raw))
    assert sorted(decoded) == [0, 1, 2]
    for i, f in enumerate(frames):
        err = np.abs(decoded[i].astype(int) - f.astype(int)).mean()
        assert decoded[i].shape == f.shape and err < 12.0, (i, err)
    # frames genuinely differ (no accidental frame aliasing in the walk)
    assert not np.array_equal(decoded[0], decoded[2])


def test_avi_frame_sampling_and_bounds():
    raw = encode_avi_mjpeg(_frames(5), fps=25)
    assert [i for i, _ in decode_avi_frames(raw, every_n=2)] == [0, 2, 4]
    assert [i for i, _ in decode_avi_frames(raw, max_frames=2)] == [0, 1]
    with pytest.raises(ValueError):
        list(decode_avi_frames(raw, every_n=0))


def test_avi_frame_decode_rejects_non_mjpeg():
    """A vids stream with a different fourcc routes to the stub path via
    VideoMetaError, never a silent wrong decode."""
    raw = bytearray(encode_avi_mjpeg(_frames(1)))
    idx = raw.find(b"vids" + b"MJPG")
    raw[idx + 4 : idx + 8] = b"H264"
    with pytest.raises(VideoMetaError):
        list(decode_avi_frames(bytes(raw)))
    with pytest.raises(VideoMetaError):
        list(iter_avi_frames(b"\x00" * 64))


def test_frame_features_mapinpandas(spark):
    """Spark plumbing: one real MJPEG AVI fans out to per-frame feature
    rows (decoded=true), dirty video bytes and non-video rows emit one
    stub row each — the same no-job-kill contract as decode_media."""
    from valentine_spark.operators.multimodal import frame_features

    avi = encode_avi_mjpeg(_frames(3), fps=10)
    rows = [
        (1, "video", bytearray(avi), 32, 24, 300),
        (2, "video", bytearray(b"garbage-not-a-container"), 0, 0, 0),
        (3, "image", bytearray(b"\x89PNG-truncated"), 8, 8, 0),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, "
              "height int, duration_ms int",
    )
    out = {
        (r["media_id"], r["frame_index"]): r
        for r in frame_features(media, every_n=2).collect()
    }
    assert sorted(out) == [(1, 0), (1, 2), (2, -1), (3, -1)]
    assert out[(1, 0)]["decoded"] and out[(1, 2)]["decoded"]
    assert not out[(2, -1)]["decoded"] and not out[(3, -1)]["decoded"]
    for key in ((1, 0), (1, 2)):
        feat = out[key]["feature"]
        assert len(feat) == 8
        # w/4096, h/4096 lead the image_features vector
        assert abs(feat[0] - 32 / 4096) < 1e-6 and abs(feat[1] - 24 / 4096) < 1e-6
    # frame 0 and frame 2 content differs -> features differ
    assert out[(1, 0)]["feature"] != out[(1, 2)]["feature"]
