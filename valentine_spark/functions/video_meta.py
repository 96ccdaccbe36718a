"""Pure-Python video CONTAINER probing — AVI (RIFF) and MP4 (ISO BMFF) —
the video counterpart of the bundled BMP/PNG/WAV codecs, at the honest
boundary the sandbox allows: frame DECODE needs codec libraries the
container lacks (it stays `multimodal.decode_stub`), but the container
metadata every pipeline keys on — dimensions, duration, frame count/rate,
codec fourcc — is plain structured bytes, parsed here with stdlib
``struct`` only.

This is what real 100-TB media pipelines do first anyway: a cheap metadata
probe pass (ffprobe-shaped) to size, route, and filter payloads BEFORE any
expensive decode fan-out; ``multimodal.probe_metadata`` runs it as an Arrow
``mapInPandas`` stage.

Formats are public knowledge (the Microsoft RIFF/AVI spec and
ISO/IEC 14496-12 box structure); the implementation is original.

Returned dict (keys always present, None when the container omits them):
``container`` ("avi" | "mp4"), ``width``, ``height``, ``duration_ms``,
``n_frames``, ``fps``, ``codec`` (fourcc string).
Raises :class:`VideoMetaError` for payloads that are not a parseable AVI
or MP4.
"""

from __future__ import annotations

import struct
from typing import Optional


class VideoMetaError(ValueError):
    """Not a parseable AVI/MP4 container."""


_MAX_DEPTH = 32  # sane container nesting bound; corrupt/adversarial beyond


def probe_video(raw: bytes) -> dict:
    try:
        if len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
            return _probe_avi(raw)
        if len(raw) >= 12 and raw[4:8] == b"ftyp":
            return _probe_mp4(raw)
    except VideoMetaError:
        raise
    except (struct.error, IndexError) as exc:
        # truncated/corrupt declared lengths — honor the documented contract
        raise VideoMetaError(f"corrupt container: {exc}") from exc
    raise VideoMetaError("not an AVI or MP4 payload")


# -- AVI: RIFF 'AVI ' -> LIST hdrl -> avih + LIST strl -> strh ---------------

def _probe_avi(raw: bytes) -> dict:
    meta: dict = {
        "container": "avi", "width": None, "height": None,
        "duration_ms": None, "n_frames": None, "fps": None, "codec": None,
    }

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        if depth > _MAX_DEPTH:
            raise VideoMetaError("AVI nesting exceeds sane depth")
        pos = lo
        while pos + 8 <= hi:
            cid = raw[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", raw, pos + 4)
            body_lo, body_hi = pos + 8, min(pos + 8 + clen, hi)
            if cid == b"LIST" and body_hi - body_lo >= 4:
                walk(body_lo + 4, body_hi, depth + 1)  # list type fourcc, then children
            elif cid == b"avih" and clen >= 40:
                us_pf, _, _, _, frames = struct.unpack_from("<IIIII", raw, body_lo)
                w, h = struct.unpack_from("<II", raw, body_lo + 32)
                meta["n_frames"] = frames
                meta["width"], meta["height"] = w, h
                if us_pf:
                    meta["fps"] = round(1_000_000.0 / us_pf, 3)
                    meta["duration_ms"] = int(frames * us_pf / 1000)
            elif cid == b"strh" and clen >= 8:
                fcc_type = raw[body_lo:body_lo + 4]
                if fcc_type == b"vids" and meta["codec"] is None:
                    meta["codec"] = raw[body_lo + 4:body_lo + 8].decode(
                        "ascii", "replace"
                    ).strip()
            pos += 8 + clen + (clen & 1)  # RIFF word alignment

    walk(12, len(raw))
    if meta["width"] is None:
        raise VideoMetaError("AVI without an avih header")
    return meta


# -- MP4: ISO BMFF boxes: moov -> mvhd (+ trak -> tkhd / stsd) ---------------

def _read_box(raw: bytes, pos: int, hi: int):
    if pos + 8 > hi:
        return None
    (size,) = struct.unpack_from(">I", raw, pos)
    btype = raw[pos + 4:pos + 8]
    body = pos + 8
    if size == 1:  # 64-bit largesize
        if pos + 16 > hi:
            return None
        (size,) = struct.unpack_from(">Q", raw, pos + 8)
        body = pos + 16
    elif size == 0:  # box extends to end of enclosing scope
        size = hi - pos
    if size < 8 or pos + size > hi:
        return None
    return btype, body, pos + size


def _probe_mp4(raw: bytes) -> dict:
    meta: dict = {
        "container": "mp4", "width": None, "height": None,
        "duration_ms": None, "n_frames": None, "fps": None, "codec": None,
    }

    def scan_trak(lo: int, hi: int, depth: int, trak: dict) -> None:
        """Collect one trak's tkhd dims, hdlr type, stsd codec and stsz count
        into ``trak`` — promotion to ``meta`` happens per-trak in walk(), so
        an audio trak appearing FIRST in file order (legal and common) cannot
        donate its sample count / codec to the video metadata."""
        if depth > _MAX_DEPTH:
            raise VideoMetaError("MP4 box nesting exceeds sane depth")
        pos = lo
        while True:
            box = _read_box(raw, pos, hi)
            if box is None:
                return
            btype, body, end = box
            if btype in (b"mdia", b"minf", b"stbl"):
                scan_trak(body, end, depth + 1, trak)
            elif btype == b"tkhd":
                version = raw[body]
                # after the 4 version/flags bytes: v0 = 20 (times/id/rsv/dur)
                # + 8 reserved + 8 layer/alt/volume/rsv + 36 matrix = 72;
                # v1's 64-bit times/duration add 12 -> width at +76 / +88
                off = body + (88 if version == 1 else 76)
                if off + 8 <= end:
                    w, h = struct.unpack_from(">II", raw, off)
                    if w and h:  # 16.16 fixed point; audio tracks carry 0x0
                        trak["width"], trak["height"] = w >> 16, h >> 16
            elif btype == b"hdlr" and end - body >= 12:
                # FIRST hdlr wins: the mdia-level media handler ('vide' /
                # 'soun') precedes minf, whose QuickTime DATA-handler hdlr
                # ('alis'/'url ') sits at the same offset and would
                # otherwise clobber the classification
                trak.setdefault("handler", raw[body + 8:body + 12])
            elif btype == b"stsd" and trak.get("codec") is None:
                entry = _read_box(raw, body + 8, end)  # version/flags + count
                if entry is not None:
                    trak["codec"] = entry[0].decode("ascii", "replace").strip()
            elif btype == b"stsz" and trak.get("n_frames") is None:
                (count,) = struct.unpack_from(">I", raw, body + 8)
                trak["n_frames"] = count
            pos = end

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        if depth > _MAX_DEPTH:
            raise VideoMetaError("MP4 box nesting exceeds sane depth")
        pos = lo
        while True:
            box = _read_box(raw, pos, hi)
            if box is None:
                return
            btype, body, end = box
            if btype == b"moov":
                walk(body, end, depth + 1)
            elif btype == b"trak":
                trak: dict = {}
                scan_trak(body, end, depth + 1, trak)
                # a video trak declares hdlr 'vide'; nonzero tkhd dims are the
                # fallback signal for writers that omit/garble hdlr
                is_video = trak.get("handler") == b"vide" or (
                    trak.get("handler") is None and trak.get("width")
                )
                if is_video and meta["width"] is None and trak.get("width"):
                    meta["width"], meta["height"] = trak["width"], trak["height"]
                if is_video and meta["codec"] is None:
                    meta["codec"] = trak.get("codec")
                if is_video and meta["n_frames"] is None:
                    meta["n_frames"] = trak.get("n_frames")
            elif btype == b"mvhd" and meta["duration_ms"] is None:
                version = raw[body]
                if version == 1:
                    ts, dur = struct.unpack_from(">IQ", raw, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", raw, body + 12)
                if ts:
                    meta["duration_ms"] = int(dur * 1000 / ts)
            pos = end

    walk(0, len(raw))
    if meta["duration_ms"] is None and meta["width"] is None:
        raise VideoMetaError("MP4 without moov metadata")
    if meta["n_frames"] and meta["duration_ms"]:
        meta["fps"] = round(meta["n_frames"] * 1000.0 / meta["duration_ms"], 3)
    return meta


def try_probe_video(raw: Optional[bytes]) -> Optional[dict]:
    """None-safe probe: None payloads and non-video bytes -> None (the
    mapInPandas stage must never fail the job on a dirty payload)."""
    if raw is None:
        return None
    try:
        return probe_video(bytes(raw))
    except VideoMetaError:
        return None
