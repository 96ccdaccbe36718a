"""Pure-Python WAV (RIFF/PCM) decoder — the audio analogue of the bundled
BMP/PNG image codecs (``bmp.py``, ``png.py``): upgrades the multimodal audio
path from a documented stub to a real decode using only the stdlib + numpy
(the container has no soundfile/librosa; on a real cluster swap the decoder,
keep the identical Spark plumbing).

Supported: canonical RIFF/WAVE files with PCM (format tag 1: unsigned 8-bit,
signed 16/24/32-bit little-endian) or IEEE-float (format tag 3: float32/
float64) samples, any channel count and sample rate, plus WAVE_FORMAT_
EXTENSIBLE (tag 0xFFFE) wrapping either.  Chunks other than ``fmt `` and
``data`` (LIST, fact, cue, ...) are skipped per the RIFF spec's
word-alignment rule.  Output is float32 in [-1, 1], shape (n_frames,
n_channels) — the normalization every audio pipeline starts from.

Format layout is public knowledge (the Microsoft/IBM RIFF WAVE spec, also
restated in the CPython ``wave`` module docs); the implementation here is
original.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def decode_wav(raw: bytes) -> Tuple[np.ndarray, int]:
    """Decode WAV bytes -> (samples float32 (n_frames, n_channels) in
    [-1, 1], sample_rate).  Raises :class:`WavError` on anything that is not
    a decodable RIFF/WAVE payload."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos, size = 12, len(raw)
    fmt = None
    data = None
    while pos + 8 <= size:
        cid = raw[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise WavError("fmt chunk too short")
            tag, n_ch, rate, _byte_rate, _block, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
                if clen < 26:
                    raise WavError("extensible fmt chunk too short")
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    tag, n_ch, rate, bits = fmt
    if n_ch < 1 or rate < 1:
        raise WavError(f"bad fmt: channels={n_ch} rate={rate}")
    if tag == 1:  # integer PCM
        if bits == 8:  # 8-bit WAV is UNsigned by spec
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: len(b) - (len(b) % 3)].reshape(-1, 3)
            # little-endian 24-bit -> int32 with sign extension, via uint32
            u = (
                b[:, 0].astype(np.uint32)
                | (b[:, 1].astype(np.uint32) << 8)
                | (b[:, 2].astype(np.uint32) << 16)
            )
            x = (u.astype(np.int32) - ((u & 0x800000) << 1).astype(np.int64)).astype(
                np.float32
            ) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise WavError(f"unsupported float bit depth {bits}")
    else:
        raise WavError(f"unsupported format tag {tag}")
    n_frames = len(x) // n_ch
    if n_frames == 0:
        raise WavError("empty data chunk")
    return x[: n_frames * n_ch].reshape(n_frames, n_ch), rate


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """REAL 8-dim feature vector from decoded audio (the audio counterpart
    of ``multimodal.image_features``): [duration_s/60, rate/48000, rms,
    peak, zero-crossing rate, mean |x|, channels/8, dc offset (shifted to
    [0,1])] over the channel-mean signal."""
    mono = samples.mean(axis=1)
    n = len(mono)
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(n - 1, 1)
    return np.array(
        [
            (n / rate) / 60.0,
            rate / 48000.0,
            float(np.sqrt(np.mean(mono ** 2))),
            float(np.abs(mono).max()),
            zcr,
            float(np.abs(mono).mean()),
            samples.shape[1] / 8.0,
            (float(mono.mean()) + 1.0) / 2.0,
        ],
        dtype=np.float32,
    )
