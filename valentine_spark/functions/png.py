"""Pure-Python PNG codec — upgrades the multimodal image path from
BMP-only to the codec real corpora actually use (VERDICT r2 #6), with no
image libraries: stdlib ``zlib`` + ``struct`` only (the container has
them; sibling pattern: ``functions/bmp.py``).

Decode supports the baseline still-image profile:

  * 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA), normalized to an (H, W, 3) uint8 RGB array
    (alpha dropped, gray replicated, palette looked up via PLTE);
  * ALL five scanline filter types 0-4 (None/Sub/Up/Average/Paeth);
  * multiple IDAT chunks (concatenated before inflate), ancillary chunks
    skipped.

Raises ``ValueError`` on anything outside that profile (16-bit samples,
Adam7 interlace, malformed/truncated streams) — callers
(``operators/multimodal.decode_media``) catch it and fall through to the
documented stub, so a bad payload cannot kill a Spark job.

``encode_png`` exists for fixtures/round-trip tests and accepts an
explicit per-image filter type so every decode filter path is exercised
against real PNG bytes.

Scale note: unfiltering is a per-row Python loop over numpy rows (Sub /
Average / Paeth are sequential along a row by definition).  Per-image cost
is O(pixels) with small constants — inside ``mapInPandas`` this is the
per-row work any real codec does; swap in PIL on a cluster for C-speed
decode with the identical calling plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel for color types 0/2/3/4/6
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = len(_SIG)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body_end = pos + 8 + length
        if body_end + 4 > n:
            raise ValueError("truncated PNG chunk")
        yield ctype, data[pos + 8 : body_end]
        pos = body_end + 4  # skip CRC (not verified — zlib adler32 covers IDAT)
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (h, stride) uint8 of raw samples."""
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line_start = y * (stride + 1)
        ftype = raw[line_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=line_start + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                upleft = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Baseline PNG bytes -> (H, W, 3) uint8 RGB array."""
    if len(data) < len(_SIG) + 25 or data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload")
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            if len(body) != 13:  # keep the ValueError-only error contract
                raise ValueError(f"malformed IHDR length {len(body)}")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise ValueError("malformed PLTE")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from None
    samples = _unfilter(raw, height, width * ch, ch).reshape(height, width, ch)
    if color_type == 2:
        return np.ascontiguousarray(samples)
    if color_type == 6:
        return np.ascontiguousarray(samples[:, :, :3])
    if color_type == 0:
        return np.ascontiguousarray(np.repeat(samples, 3, axis=2))
    if color_type == 4:
        return np.ascontiguousarray(np.repeat(samples[:, :, :1], 3, axis=2))
    # color_type == 3
    if palette is None:
        raise ValueError("palette PNG without PLTE")
    idx = samples[:, :, 0]
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("palette index out of range")
    return np.ascontiguousarray(palette[idx])


def _filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), c[:-bpp]]) if len(c) > bpp else np.zeros_like(c)
    upleft = np.concatenate([np.zeros(bpp, np.int32), p[:-bpp]]) if len(p) > bpp else np.zeros_like(p)
    if ftype == 0:
        out = c
    elif ftype == 1:
        out = c - left
    elif ftype == 2:
        out = c - p
    elif ftype == 3:
        out = c - ((left + p) >> 1)
    elif ftype == 4:
        pa = np.abs(p - upleft)
        pb = np.abs(left - upleft)
        pc = np.abs(left + p - 2 * upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft))
        out = c - pred
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out & 0xFF).astype(np.uint8).tobytes()


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes, every row filtered with
    ``filter_type`` (0-4) so tests can exercise each decode path."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png needs an (H, W, 3) uint8 array")
    h, w, _ = img.shape
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        cur = img[y].reshape(-1)
        raw.append(filter_type)
        raw += _filter_row(filter_type, cur, prev, 3)
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
