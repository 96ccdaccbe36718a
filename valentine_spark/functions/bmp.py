"""Pure-Python BMP (Windows bitmap) codec — the real decoder for the
multimodal image path (``operators/multimodal.py``), container-safe: no
image libraries needed.

Supports the uncompressed 24-bit BI_RGB format (BITMAPINFOHEADER), both
bottom-up (positive height, the standard) and top-down (negative height)
row orders, with the required 4-byte row padding.  This is the complete
format for the engine's purposes: a fully real decode -> ndarray ->
feature-extraction path; other codecs (PNG/JPEG) still route to the
documented stub until real codec libs exist on the cluster.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, ...


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp needs an (H, W, 3) uint8 array")
    h, w, _ = img.shape
    row_len = (w * 3 + 3) // 4 * 4
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        data += row + b"\x00" * (row_len - len(row))
    info = _INFO_HDR.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    offset = _FILE_HDR.size + len(info)
    head = _FILE_HDR.pack(b"BM", offset + len(data), 0, 0, offset)
    return head + info + bytes(data)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB array."""
    if len(data) < _FILE_HDR.size + 40 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _FILE_HDR.unpack_from(data, 0)
    (hdr_size, w, h, planes, bpp, comp, *_rest) = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) // 4 * 4
    if len(data) < offset + row_len * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_len * h, offset=offset)
    rows = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)
