"""FLAC codec suite: lossless round-trips through every subframe type
(CONSTANT / VERBATIM / FIXED / LPC), bit depths, stereo, CRC enforcement,
malformed rejection, and the Spark audio path."""

import numpy as np
import pytest

from valentine_spark.functions.flac import decode_flac, encode_flac


def _sig(n=9000):
    t = np.linspace(0, 1, n, endpoint=False)
    return 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1337 * t)


def _quant(x, bits):
    full = 1 << (bits - 1)
    return (np.clip(np.round(x * full), -full, full - 1) / full).astype(np.float32)


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("mode", ["fixed", "verbatim", "lpc"])
def test_roundtrip_lossless(bits, mode):
    sig = _sig()
    dec, rate = decode_flac(encode_flac(sig, 44100, bits=bits, mode=mode))
    assert rate == 44100
    assert np.array_equal(dec[:, 0], _quant(sig, bits))


def test_fixed_mode_actually_compresses():
    sig = _sig()
    raw = encode_flac(sig, 44100, bits=16, mode="fixed")
    assert len(raw) < 0.9 * len(sig) * 2  # beats raw 16-bit PCM


def test_constant_blocks_and_stereo():
    sig = _sig()
    st = np.stack([sig, np.zeros_like(sig)], axis=1)
    dec, rate = decode_flac(encode_flac(st, 8000, bits=16))
    assert rate == 8000 and dec.shape == (9000, 2)
    assert np.all(dec[:, 1] == 0)
    assert np.array_equal(dec[:, 0], _quant(sig, 16))


def test_incompressible_noise_roundtrips():
    noise = np.random.default_rng(1).uniform(-1, 1, 5000)
    dec, _ = decode_flac(encode_flac(noise, 22050, bits=16))
    assert np.array_equal(dec[:, 0], _quant(noise, 16))


def test_short_and_odd_block_sizes():
    sig = _sig(777)
    dec, _ = decode_flac(encode_flac(sig, 8000, bits=16, block_frames=100))
    assert dec.shape == (777, 1)
    assert np.array_equal(dec[:, 0], _quant(sig, 16))
    tiny = np.array([0.1, -0.2, 0.3])
    dec, _ = decode_flac(encode_flac(tiny, 8000, bits=16))
    assert dec.shape == (3, 1)


def test_crc_catches_payload_corruption():
    # verbatim frames are fixed-length coded, so a bit flip keeps the
    # stream aligned and MUST be caught by the frame CRC-16 specifically
    good = bytearray(encode_flac(_sig(2000), 8000, bits=16, mode="verbatim"))
    good[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(good))
    # rice-coded frames may desync instead — any ValueError is a catch,
    # silence is the only failure
    rice = bytearray(encode_flac(_sig(2000), 8000, bits=16, mode="fixed"))
    rice[-10] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(rice))


def test_malformed_inputs_raise():
    good = encode_flac(_sig(2000), 8000, bits=16)
    for bad in [b"", b"fLaC", good[:50], good[:-3], b"fLaX" + good[4:]]:
        with pytest.raises(ValueError):
            decode_flac(bad)


def test_decode_media_routes_flac(spark):
    from valentine_spark.functions.wav import audio_features
    from valentine_spark.operators.multimodal import extract_features

    sig = _sig(4000)
    raw = encode_flac(sig, 16000, bits=16)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(raw), 0, 0, 250)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    [row] = extract_features(df).collect()
    expect = audio_features(_quant(sig, 16)[:, None], 16000)
    assert row["feature"] == pytest.approx(expect.tolist(), abs=1e-6)
