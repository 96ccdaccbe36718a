"""Pure-Python GIF codec — extends the multimodal image path to the third
major web-corpus format (siblings: ``functions/bmp.py``, ``png.py``,
``jpeg.py``), stdlib-only.

Decode supports the full GIF87a/GIF89a still + animation profile:

  * global and local color tables, any palette size 2..256;
  * variable-width LSB-first LZW with clear/end codes, 12-bit cap and the
    deferred-clear edge case (dict full, encoder keeps emitting old codes);
  * Adam-style 4-pass row interlace;
  * Graphic Control Extensions: transparency index and disposal methods
    0/1 (leave), 2 (restore background), 3 (restore previous);
  * animation: frames composite onto the logical-screen canvas at their
    (left, top) sub-rectangles, exactly like a browser renders them.

``decode_gif`` returns the FIRST composed frame as (H, W, 3) uint8 RGB —
the still-image contract the feature extractor consumes; ``gif_frames``
iterates every composed frame (the animation analogue of the MJPEG
``video_frames`` path).  Raises ``ValueError`` on malformed/truncated
streams — ``operators/multimodal.decode_media`` catches it and falls
through to the documented stub so a bad payload cannot kill a Spark job.

``encode_gif`` exists for fixtures/round-trip tests: exact-palette
(lossless for images with <=256 distinct colors), optional interlace and
multi-frame animation so every decode path is exercised on real bytes.

Scale note: LZW is inherently sequential per image; cost is O(pixels)
with small constants, run inside Arrow-batched ``mapInPandas`` like every
other codec here.  Swap in PIL on a real cluster for C-speed decode with
identical calling plumbing.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_color_table(data: bytes, pos: int, n: int) -> Tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    table = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3)
    return table, end


def _sub_blocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    """Concatenate data sub-blocks (len byte + payload, 0-terminated)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > n:
            raise ValueError("truncated GIF sub-block payload")
        out += data[pos : pos + ln]
        pos += ln


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Variable-width LSB-first LZW (GIF flavor)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table: List[bytes] = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: Optional[bytes] = None

    acc = 0  # bit accumulator, LSB-first
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZW first code not in table")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            # grow code width when the NEXT code would not fit (12-bit cap;
            # a full table defers growth until the encoder sends clear)
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    raise ValueError("LZW stream ended without end code")


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _frames(data: bytes) -> Iterator[np.ndarray]:
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    width, height, packed, bg_index, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if width == 0 or height == 0:
        raise ValueError("zero-sized GIF logical screen")
    pos = 13
    gct: Optional[np.ndarray] = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    if gct is not None and bg_index < len(gct):
        background = gct[bg_index]
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((height, width, 3), dtype=np.uint8)
    canvas[:, :] = background

    transparent: Optional[int] = None
    disposal = 0
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if left + w > width or top + h > height or w == 0 or h == 0:
            raise ValueError("GIF frame rectangle outside logical screen")
        table = gct
        if ipacked & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (ipacked & 0x07))
        if table is None:
            raise ValueError("GIF frame has neither local nor global color table")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code_size = data[pos]
        compressed, pos = _sub_blocks(data, pos + 1)
        idx = np.frombuffer(
            _lzw_decode(compressed, min_code_size, w * h), dtype=np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max() >= len(table):
            raise ValueError("GIF pixel index outside color table")

        saved = canvas[top : top + h, left : left + w].copy()
        rgb = table[idx]
        if transparent is not None:
            keep = idx == transparent
            rgb = np.where(keep[:, :, None], saved, rgb)
        canvas[top : top + h, left : left + w] = rgb
        yield canvas.copy()

        if disposal == 2:
            canvas[top : top + h, left : left + w] = background
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = saved
        transparent = None
        disposal = 0
    raise ValueError("GIF stream ended without trailer")


def gif_frames(data: bytes) -> Iterator[np.ndarray]:
    """Yield every composed animation frame as (H, W, 3) uint8 RGB."""
    return _frames(bytes(data))


def decode_gif(data: bytes) -> np.ndarray:
    """First composed frame as (H, W, 3) uint8 RGB (still-image contract)."""
    for frame in _frames(bytes(data)):
        return frame
    raise ValueError("GIF contains no image data")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    run = b""
    for pixel in indices.tobytes():
        candidate = run + bytes([pixel])
        if candidate in table:
            run = candidate
            continue
        emit(table[run])
        if next_code < 4096:
            table[candidate] = next_code
            # the encoder adds entry e_j right after emitting code c_j, but
            # the decoder only adds e_j after READING c_{j+1} — the encoder
            # therefore runs one entry ahead, and must grow the code width
            # one entry later than the decoder's size==2^width condition
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([pixel])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(idx: np.ndarray) -> np.ndarray:
    order = [
        y for start, step in _INTERLACE_PASSES for y in range(start, idx.shape[0], step)
    ]
    return idx[order]


def encode_gif(
    frames: Union[np.ndarray, Sequence[np.ndarray]],
    delay_cs: int = 10,
    interlace: bool = False,
    transparent_color: Optional[Tuple[int, int, int]] = None,
    disposal: int = 0,
) -> bytes:
    """Lossless exact-palette GIF89a encoder for fixtures/round-trip tests.

    ``frames``: one (H, W, 3) uint8 array or a list of same-shape arrays
    (animated).  All frames together must use <=256 distinct colors (raises
    ``ValueError`` otherwise — this is a test encoder, not a quantizer).
    ``transparent_color`` marks one RGB value transparent in frames after
    the first, exercising the decoder's compositing path.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    colors: List[Tuple[int, int, int]] = []
    lookup = {}
    if transparent_color is not None:
        lookup[tuple(int(c) for c in transparent_color)] = 0
        colors.append(tuple(int(c) for c in transparent_color))
    for img in frames:
        if img.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
        for color in {tuple(int(c) for c in px) for px in img.reshape(-1, 3)}:
            if color not in lookup:
                lookup[color] = len(colors)
                colors.append(color)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed GIF's 256")
    table_bits = max(1, (len(colors) - 1).bit_length())
    table_n = 1 << table_bits
    palette = bytearray()
    for color in colors:
        palette += bytes(color)
    palette += b"\x00" * (3 * (table_n - len(colors)))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (table_bits - 1), 0, 0)
    out += palette
    min_code_size = max(2, table_bits)
    animated = len(frames) > 1
    for i, img in enumerate(frames):
        if animated or (transparent_color is not None and i > 0):
            flags = disposal << 2
            tindex = 0
            if transparent_color is not None and i > 0:
                flags |= 0x01
            out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", delay_cs)
            out += bytes([tindex, 0])
        idx = np.array(
            [lookup[tuple(int(c) for c in px)] for px in img.reshape(-1, 3)],
            dtype=np.uint8,
        ).reshape(h, w)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        out += bytes([min_code_size])
        payload = _lzw_encode(
            _interlace_rows(idx) if interlace else idx, min_code_size
        )
        for start in range(0, len(payload), 255):
            chunk = payload[start : start + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def probe_gif(data: bytes) -> dict:
    """ffprobe-shaped metadata for a GIF payload WITHOUT decoding pixels:
    walks the block structure (sub-block lengths only — no LZW), counting
    frames and summing Graphic Control delays.  O(blocks), suitable as the
    pre-decode sizing/routing pass (``operators/multimodal.probe_metadata``).
    Raises ``ValueError`` on malformed streams like the decoder."""
    data = bytes(data)
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n = len(data)
    n_frames = 0
    duration_cs = 0
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:
            dur_ms = duration_cs * 10
            fps = (
                round(n_frames * 1000.0 / dur_ms, 3) if dur_ms and n_frames else None
            )
            return {
                "container": "gif",
                "width": int(width),
                "height": int(height),
                "duration_ms": int(dur_ms),
                "n_frames": int(n_frames),
                "fps": fps,
                "codec": "gif-lzw",
            }
        if block == 0x21:
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = data[pos]
            body, pos = _sub_blocks(data, pos + 1)
            if label == 0xF9 and len(body) >= 4:
                duration_cs += int.from_bytes(body[1:3], "little")
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        if pos >= n:
            raise ValueError("truncated GIF image data")
        _, pos = _sub_blocks(data, pos + 1)  # skip min-code byte + data
        n_frames += 1
    raise ValueError("GIF stream ended without trailer")
