"""Pure-Python AVI (RIFF) frame EXTRACTION + MJPEG decode — upgrades the
video path of ``operators/multimodal.py`` from metadata-only probing
(``video_meta.py``) to real frame sampling for the one codec the bundled
codecs can decode: MJPEG ("MJPG" fourcc), where every frame payload is a
baseline JPEG.

Two MJPEG realities handled here, both public container/codec knowledge
(Microsoft RIFF/AVI spec + ITU T.81 Annex K):

  * frame payloads live in ``##dc``/``##db`` chunks of the ``LIST movi``
    body (optionally nested in ``LIST rec`` groups), where ``##`` is the
    two-digit stream index assigned by ``strl`` order in the header;
  * MJPEG frames conventionally OMIT their Huffman tables (DHT) and
    decoders splice in the Annex-K typical tables — ``jpeg.ensure_dht``.

``encode_avi_mjpeg`` writes the matching fixture container (the same
encoder-for-tests pattern as ``jpeg.encode_jpeg`` / ``png`` round-trips):
a minimal but spec-shaped AVI with ``avih``, one ``vids/MJPG`` stream, a
``movi`` list of table-less standard-table JPEG frames, and an ``idx1``
index.  ``video_meta.probe_video`` parses it like any other AVI.

Reference parity: the reference engine has no media surface at all
(SURVEY.md §2 "multimodal: new construction"); this module exists for the
LLM-training-data tier of the brief.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg, ensure_dht
from .video_meta import VideoMetaError


def _video_stream_index(raw: bytes) -> Tuple[int, Optional[str]]:
    """(index of the first ``vids`` stream in strl order, its fourcc)."""
    idx = 0
    found: List[Tuple[int, str]] = []

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        nonlocal idx
        if depth > 32:
            raise VideoMetaError("AVI nesting exceeds sane depth")
        pos = lo
        while pos + 8 <= hi:
            cid = raw[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", raw, pos + 4)
            body_lo, body_hi = pos + 8, min(pos + 8 + clen, hi)
            if cid == b"LIST" and body_hi - body_lo >= 4:
                walk(body_lo + 4, body_hi, depth + 1)
            elif cid == b"strh" and clen >= 8:
                if raw[body_lo:body_lo + 4] == b"vids":
                    found.append(
                        (idx, raw[body_lo + 4:body_lo + 8].decode("ascii", "replace").strip())
                    )
                idx += 1
            pos += 8 + clen + (clen & 1)

    walk(12, len(raw))
    if not found:
        raise VideoMetaError("AVI without a vids stream")
    return found[0]


def iter_avi_frames(raw: bytes) -> Iterator[bytes]:
    """Yield the raw payload bytes of every video frame chunk, in stream
    order.  Container-level only — payloads are whatever the codec wrote
    (JPEGs for MJPG)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise VideoMetaError("not an AVI payload")
    stream_idx, _ = _video_stream_index(raw)
    want = (b"%02ddc" % stream_idx, b"%02ddb" % stream_idx)

    def walk(lo: int, hi: int, in_movi: bool, depth: int = 0) -> Iterator[bytes]:
        if depth > 32:
            raise VideoMetaError("AVI nesting exceeds sane depth")
        pos = lo
        while pos + 8 <= hi:
            cid = raw[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", raw, pos + 4)
            body_lo, body_hi = pos + 8, min(pos + 8 + clen, hi)
            if cid == b"LIST" and body_hi - body_lo >= 4:
                ltype = raw[body_lo:body_lo + 4]
                yield from walk(
                    body_lo + 4, body_hi,
                    in_movi or ltype in (b"movi", b"rec "), depth + 1,
                )
            elif in_movi and cid in want and clen > 0:
                yield raw[body_lo:body_hi]
            pos += 8 + clen + (clen & 1)

    yield from walk(12, len(raw), False)


def decode_avi_frames(
    raw: bytes,
    every_n: int = 1,
    max_frames: Optional[int] = None,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Decode every ``every_n``-th MJPEG frame of an AVI to (frame_index,
    (H, W, 3) uint8 RGB).  Raises :class:`VideoMetaError` for non-AVI or
    non-MJPEG payloads (caller routes those to the stub), ``ValueError``
    for frames outside the baseline-JPEG profile."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    _, fourcc = _video_stream_index(raw)
    if (fourcc or "").upper() not in ("MJPG", "MJPEG"):
        raise VideoMetaError(f"frame decode supports MJPG only, got {fourcc!r}")
    emitted = 0
    for i, payload in enumerate(iter_avi_frames(raw)):
        if i % every_n:
            continue
        yield i, decode_jpeg(ensure_dht(payload))
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


def encode_avi_mjpeg(
    frames: List[np.ndarray],
    fps: int = 25,
    quality: int = 90,
    omit_dht: bool = True,
) -> bytes:
    """Fixture writer: (H, W, 3) uint8 frames -> MJPEG AVI bytes.  Frames
    are standard-table baseline JPEGs, table-less by default (the MJPEG
    convention ``decode_avi_frames`` must survive)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    payloads = [
        encode_jpeg(f, quality=quality, tables="standard", omit_dht=omit_dht)
        for f in frames
    ]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = max(1, round(1_000_000 / fps))
    max_bytes = max(len(p) for p in payloads)
    # avih: us/frame, max bytes/sec, padding, flags, total frames, initial
    # frames, streams, suggested buffer, width, height, 4 reserved
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10, len(payloads), 0, 1,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    # strh: fccType, fccHandler, flags, prio/lang, initial frames, scale,
    # rate, start, length, sugg. buffer, quality, sample size, rcFrame
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIii4H", 0, 0, 0, 0, 1, fps, 0, len(payloads), max_bytes,
        -1, 0, 0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1 entries: chunk id, flags (0x10 = keyframe), offset from movi
    # list-type fourcc, size
    idx_entries = []
    off = 4
    for p in payloads:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
