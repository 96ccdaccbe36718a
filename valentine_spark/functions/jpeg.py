"""Pure-Python JPEG codec (baseline + progressive) — upgrades the
multimodal image path to the codec real corpora are dominated by (VERDICT
r3 ask #7), with no image libraries: stdlib ``struct`` + numpy only
(sibling pattern: ``functions/png.py``, ``functions/bmp.py``).

Decode supports the baseline sequential AND progressive DCT profiles
(ITU T.81 / JFIF):

  * SOF0 (sequential) and SOF2 (progressive: spectral selection +
    successive approximation — DC first/refine, AC first/refine with EOB
    runs, per T.81 G.2), 8-bit samples, 1 (grayscale) or 3 (YCbCr)
    components with arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2, ...);
  * arbitrary DHT Huffman tables (canonical, up to 16-bit codes) and up to
    four DQT quantization tables (8- or 16-bit precision);
  * interleaved and single-component scans, 0xFF00 byte stuffing, and DRI
    restart intervals (RST0-7 resync + DC-predictor/EOB-run reset);
  * APPn/COM/ancillary segments skipped.

Raises ``ValueError`` on anything outside those profiles (arithmetic
coding, hierarchical/lossless SOFs, 12-bit precision, truncated streams) —
callers (``operators/multimodal.decode_media``) catch it and fall through
to the documented stub, so a malformed payload cannot kill a Spark job.

``encode_jpeg`` / ``encode_jpeg_progressive`` exist for fixtures and
round-trip tests: the standard Annex-K quantization tables under IJG
quality scaling, 4:4:4 or 4:2:0 subsampling, optional restart intervals
(baseline), and self-declared canonical Huffman tables (fixed-length
canonical codes — valid JPEG, and deliberately NOT the Annex-K defaults so
decode exercises the general DHT path rather than one baked-in table
shape).  The progressive encoder's successive-approximation chains
reconstruct the quantized coefficients exactly, so progressive decode is
asserted EQUAL to baseline decode of the same image.

The IDCT/FDCT pair is the exact orthonormal 8x8 DCT-II as two 8x8 matrix
products (numpy, float64) — not the integer-approximation fast kernels, so
round-trip error is bounded by quantization alone.

Scale note: entropy decode is a per-symbol Python loop (Huffman is
bit-serial by definition); per-image cost is O(coefficients) with small
constants.  Inside ``mapInPandas`` this is the per-row work any real codec
does; swap in PIL/libjpeg-turbo on a real cluster for C-speed decode with
the identical calling plumbing.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

# zigzag scan order: entry i of the coded vector is block position _ZZ[i]
_ZZ: List[Tuple[int, int]] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rng if _s % 2 else reversed(_rng)):
        _ZZ.append((_r, _s - _r))
_ZZ_ROWS = np.array([p[0] for p in _ZZ])
_ZZ_COLS = np.array([p[1] for p in _ZZ])

# orthonormal 8x8 DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = a * np.cos((2 * _n + 1) * _k * np.pi / 16)

# ITU T.81 Annex K base quantization tables (row-major 8x8)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clipped to [1, 255]."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _idct2(coeff: np.ndarray) -> np.ndarray:
    return _C.T @ coeff @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: unstuffs
    0xFF00, resyncs at RSTn markers, refuses to run past other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(f"jpeg: marker 0xFF{nxt:02x} inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Discard padding bits, consume the RST(expected) marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("jpeg: expected restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (expected & 7):
            raise ValueError(f"jpeg: bad restart marker 0xFF{m:02x}")
        self.pos += 2


def _build_huff(bits: List[int], vals: bytes) -> Dict[Tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(
    r: _BitReader,
    dc_table: Dict[Tuple[int, int], int],
    ac_table: Dict[Tuple[int, int], int],
    pred: int,
    qtab: np.ndarray,
) -> Tuple[np.ndarray, int]:
    """One 8x8 block: Huffman-decode, dequantize, dezigzag, IDCT."""
    zz = np.zeros(64, dtype=np.int32)
    size = _decode_symbol(r, dc_table)
    pred += _extend(r.receive(size), size)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _decode_symbol(r, ac_table)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("jpeg: AC run overflows block")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    coeff = np.zeros((8, 8), dtype=np.float64)
    coeff[_ZZ_ROWS, _ZZ_COLS] = zz * qtab.reshape(-1)[_ZZ_ROWS * 8 + _ZZ_COLS]
    return _idct2(coeff), pred


# -- progressive (SOF2) scan decoding: T.81 G.2 successive approximation ----

def _ac_first_prog(r, ac_t, coef, ss, se, al, eobrun):
    """AC first scan (Ah=0) for one block; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _decode_symbol(r, ac_t)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.receive(run)
            break
        k += run
        if k > se:
            raise ValueError("jpeg: AC run overflows spectral band")
        coef[k] = _extend(r.receive(size), size) << al
        k += 1
    return eobrun


def _ac_refine_prog(r, ac_t, coef, ss, se, al, eobrun):
    """AC refinement scan (Ah=Al+1) for one block; correction bits for
    already-nonzero coefficients interleave with newly-significant ±1<<Al
    insertions and EOB runs.  Returns the new EOB run."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if r.read_bit() and not (int(coef[k]) & p1):
            coef[k] += p1 if coef[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _decode_symbol(r, ac_t)
            run, size = sym >> 4, sym & 0x0F
            val = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run  # includes THIS block's remainder
                    if run:
                        eobrun += r.receive(run)
                    break
            else:
                if size != 1:
                    raise ValueError("jpeg: AC refinement size must be 1")
                val = p1 if r.read_bit() else m1
            # cross `run` zero-history slots, correcting nonzero ones passed
            while k <= se:
                if coef[k]:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB block: only correction bits for nonzero slots
            if coef[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_prog(data, pos, frame, scan, huff, restart_interval,
                      coefs, ss, se, ah, al):
    """Entropy-decode one progressive scan into per-component zigzag
    coefficient arrays (``coefs[comp_id][by, bx]`` is a length-64 int32
    view).  Returns the stream position after the scan."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    h_img, w_img = frame["h"], frame["w"]
    interleaved = len(scan) > 1
    if ss == 0 and se != 0:
        raise ValueError("jpeg: DC scan must have Se=0")
    if ss > 0 and interleaved:
        raise ValueError("jpeg: progressive AC scans are single-component")
    if ss > se or se > 63:
        raise ValueError(f"jpeg: bad spectral band {ss}..{se}")

    if interleaved:
        mcus_x = -(-w_img // (8 * hmax))
        mcus_y = -(-h_img // (8 * vmax))
        units = [(s, vy, hx) for s in scan
                 for vy in range(s["comp"]["v"]) for hx in range(s["comp"]["h"])]
    else:
        c = scan[0]["comp"]
        cw = -(-w_img * c["h"] // hmax)
        ch = -(-h_img * c["v"] // vmax)
        mcus_x, mcus_y = -(-cw // 8), -(-ch // 8)
        units = [(scan[0], 0, 0)]

    r = _BitReader(data, pos)
    preds = {s["comp"]["id"]: 0 for s in scan}
    eobrun = 0
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.restart(rst)
                rst = (rst + 1) & 7
                preds = {k: 0 for k in preds}
                eobrun = 0
            for s, vy, hx in units:
                c = s["comp"]
                if interleaved:
                    by, bx = my * c["v"] + vy, mx * c["h"] + hx
                else:
                    by, bx = my, mx
                coef = coefs[c["id"]][by, bx]
                if ss == 0:  # DC scan
                    if ah == 0:
                        try:
                            dc_t = huff[(0, s["dc"])]
                        except KeyError as exc:
                            raise ValueError(f"jpeg: missing table {exc}") from exc
                        size = _decode_symbol(r, dc_t)
                        preds[c["id"]] += _extend(r.receive(size), size)
                        coef[0] = preds[c["id"]] << al
                    else:  # DC refinement: one bit per block
                        if r.read_bit():
                            coef[0] |= 1 << al
                else:
                    try:
                        ac_t = huff[(1, s["ac"])]
                    except KeyError as exc:
                        raise ValueError(f"jpeg: missing table {exc}") from exc
                    if ah == 0:
                        eobrun = _ac_first_prog(r, ac_t, coef, ss, se, al, eobrun)
                    else:
                        eobrun = _ac_refine_prog(r, ac_t, coef, ss, se, al, eobrun)
            n_mcu += 1
    return r.pos


def _finalize_progressive(frame, coefs, qtabs):
    """Dequantize + batched IDCT of the accumulated coefficient arrays."""
    planes = {}
    zz_nat = _ZZ_ROWS * 8 + _ZZ_COLS
    for c in frame["comps"]:
        arr = coefs[c["id"]]
        bh, bw = arr.shape[:2]
        try:
            qtab = qtabs[c["tq"]]
        except KeyError as exc:
            raise ValueError(f"jpeg: missing quant table {exc}") from exc
        qflat = qtab.reshape(-1)[zz_nat]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[:, :, zz_nat] = arr * qflat  # dezigzag + dequantize, batched
        blocks = nat.reshape(bh, bw, 8, 8)
        # batched 2-D IDCT: C.T @ B @ C over all blocks at once
        spatial = np.einsum("ij,yxjk,kl->yxil", _C.T, blocks, _C)
        planes[c["id"]] = (
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return planes


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> (H, W, 3) uint8 RGB array."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}  # (class, id)
    frame: Optional[dict] = None
    restart_interval = 0
    planes: Dict[int, np.ndarray] = {}
    coefs: Dict[int, np.ndarray] = {}  # progressive coefficient buffers

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if pos + 2 + seglen > len(data):
            raise ValueError("jpeg: truncated segment")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    tab = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                q = np.zeros((8, 8), dtype=np.int32)
                q[_ZZ_ROWS, _ZZ_COLS] = tab  # DQT entries arrive zigzagged
                qtabs[tid] = q
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                if len(bits) < 16:
                    raise ValueError("jpeg: truncated DHT")
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                if len(vals) < n:
                    raise ValueError("jpeg: truncated DHT values")
                huff[(cls, tid)] = _build_huff(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise ValueError(f"jpeg: {precision}-bit precision unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"jpeg: {ncomp} components unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                # a zero sampling factor is malformed (T.81 §B.2.2: 1..4) and
                # would divide-by-zero in the MCU grid math below — keep the
                # ValueError-only contract decode_media relies on
                if not (1 <= hv >> 4 <= 4) or not (1 <= hv & 0x0F <= 4):
                    raise ValueError(f"jpeg: invalid sampling factor 0x{hv:02x}")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                # per-component zigzag coefficient buffers, sized to the
                # MCU-padded block grid (covers interleaved DC scans; the
                # non-interleaved grid is never larger)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                for c in comps:
                    bw = -(-w // (8 * hmax)) * c["h"]
                    bh = -(-h // (8 * vmax)) * c["v"]
                    coefs[c["id"]] = np.zeros((bh, bw, 64), dtype=np.int32)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: SOF 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tds = body[1 + 2 * s : 3 + 2 * s]
                # next() without a default would leak StopIteration (PEP 479:
                # RuntimeError inside generators) past the ValueError contract
                comp = next((c for c in frame["comps"] if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"jpeg: SOS component id {cs} not in SOF")
                scan.append({"comp": comp, "dc": tds >> 4, "ac": tds & 0x0F})
            pos = pos + 2 + seglen
            if frame["progressive"]:
                ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
                pos = _decode_scan_prog(data, pos, frame, scan, huff,
                                        restart_interval, coefs,
                                        ss, se, ahl >> 4, ahl & 0x0F)
            else:
                pos = _decode_scan(data, pos, frame, scan, qtabs, huff,
                                   restart_interval, planes)
            continue
        # APPn / COM / other ancillary: skip
        pos = pos + 2 + seglen

    if frame is not None and frame["progressive"]:
        if not coefs:
            raise ValueError("jpeg: no decoded scan")
        return _assemble(frame, _finalize_progressive(frame, coefs, qtabs))
    if frame is None or not planes:
        raise ValueError("jpeg: no decoded scan")
    return _assemble(frame, planes)


def _decode_scan(data, pos, frame, scan, qtabs, huff, restart_interval, planes):
    """Entropy-decode one scan into per-component sample planes."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    h_img, w_img = frame["h"], frame["w"]
    interleaved = len(scan) > 1

    for s in scan:
        c = s["comp"]
        # full-frame plane dimensions in component samples, padded to blocks
        cw = -(-w_img * c["h"] // hmax)
        ch = -(-h_img * c["v"] // vmax)
        if c["id"] not in planes:
            if interleaved:
                bw = -(-w_img // (8 * hmax)) * c["h"]
                bh = -(-h_img // (8 * vmax)) * c["v"]
            else:
                bw, bh = -(-cw // 8), -(-ch // 8)
            planes[c["id"]] = np.zeros((bh * 8, bw * 8), dtype=np.float64)

    if interleaved:
        mcus_x = -(-w_img // (8 * hmax))
        mcus_y = -(-h_img // (8 * vmax))
        units = [(s, vy, hx) for s in scan
                 for vy in range(s["comp"]["v"]) for hx in range(s["comp"]["h"])]
    else:
        s = scan[0]
        c = s["comp"]
        cw = -(-w_img * c["h"] // hmax)
        ch = -(-h_img * c["v"] // vmax)
        mcus_x, mcus_y = -(-cw // 8), -(-ch // 8)
        units = [(s, 0, 0)]

    r = _BitReader(data, pos)
    preds = {s["comp"]["id"]: 0 for s in scan}
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.restart(rst)
                rst = (rst + 1) & 7
                preds = {k: 0 for k in preds}
            for s, vy, hx in units:
                c = s["comp"]
                try:
                    qtab = qtabs[c["tq"]]
                    dc_t = huff[(0, s["dc"])]
                    ac_t = huff[(1, s["ac"])]
                except KeyError as exc:
                    raise ValueError(f"jpeg: missing table {exc}") from exc
                block, preds[c["id"]] = _decode_block(r, dc_t, ac_t,
                                                      preds[c["id"]], qtab)
                if interleaved:
                    by = (my * c["v"] + vy) * 8
                    bx = (mx * c["h"] + hx) * 8
                else:
                    by, bx = my * 8, mx * 8
                planes[c["id"]][by : by + 8, bx : bx + 8] = block
            n_mcu += 1
    # skip any padding bits; caller resumes marker parsing at r.pos
    return r.pos


def _assemble(frame: dict, planes: Dict[int, np.ndarray]) -> np.ndarray:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    h_img, w_img = frame["h"], frame["w"]
    full = []
    for c in frame["comps"]:
        p = planes[c["id"]] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures / round-trip tests)
# ---------------------------------------------------------------------------

# fixed-length canonical Huffman tables (valid JPEG; see module docstring):
# DC: 12 categories as 4-bit codes 0..11; AC: 162 (run,size) symbols as
# 9-bit codes 0..161 in symbol order EOB, ZRL, then (run 0-15) x (size 1-10)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = bytes(_ENC_AC_SYMS)

# ITU T.81 Annex K "typical" Huffman tables (Tables K.3-K.6) — the tables
# every MJPEG decoder assumes when an AVI frame omits its DHT segment
# (the OpenDML/MJPEG convention: frames carry quant tables but not Huffman
# tables).  Public-spec data, transcribed from the standard.
_STD_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_LUM_VALS = bytes(range(12))
_STD_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_STD_DC_CHR_VALS = bytes(range(12))
_STD_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_LUM_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_STD_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_STD_AC_CHR_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# (class, table id, bits, vals) in the standard luma=0/chroma=1 assignment
_STD_TABLES = (
    (0, 0, _STD_DC_LUM_BITS, _STD_DC_LUM_VALS),
    (1, 0, _STD_AC_LUM_BITS, _STD_AC_LUM_VALS),
    (0, 1, _STD_DC_CHR_BITS, _STD_DC_CHR_VALS),
    (1, 1, _STD_AC_CHR_BITS, _STD_AC_CHR_VALS),
)


def standard_dht_segment() -> bytes:
    """One DHT marker segment declaring all four Annex-K tables — exactly
    the bytes an MJPEG player splices into a table-less AVI frame."""
    body = b"".join(
        bytes([(cls << 4) | tid]) + bytes(bits) + vals
        for cls, tid, bits, vals in _STD_TABLES
    )
    return bytes([0xFF, 0xC4]) + struct.pack(">H", 2 + len(body)) + body


def ensure_dht(data: bytes) -> bytes:
    """Return ``data`` with Huffman tables guaranteed present: if the frame
    declares no DHT before its first SOS (the MJPEG AVI convention), splice
    the Annex-K default tables in front of the SOS.  Frames that already
    carry tables pass through untouched."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xC4:
            return data  # tables present
        if marker == 0xDA:  # first SOS, no DHT seen
            return data[:pos] + standard_dht_segment() + data[pos:]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + seglen
    raise ValueError("jpeg: no SOS scan to splice tables for")


def _enc_codes(bits: List[int], vals: bytes) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code_length, code), canonical order (inverse of decode)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODE = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_AC_CODE = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def marker(self, m: int) -> None:
        self.pad()
        self.out += bytes([0xFF, m])


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_code: Dict[int, Tuple[int, int]] = _DC_CODE,
    ac_code: Dict[int, Tuple[int, int]] = _AC_CODE,
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    length, code = dc_code[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_code[0xF0]
            w.write(code, length)
            run -= 16
        size = _category(v)
        length, code = ac_code[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = ac_code[0x00]
        w.write(code, length)
    return dc


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.dstack([y, cb, cr])


def _pad_edge(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
    return np.pad(p, ((0, mh - p.shape[0]), (0, mw - p.shape[1])), mode="edge")


def _quantize_zz(block: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    q = np.round(_fdct2(block - 128.0) / qtab).astype(np.int32)
    q = np.clip(q, -1023, 1023)  # baseline AC category <= 10
    return q[_ZZ_ROWS, _ZZ_COLS]


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    tables: str = "fixed",
    omit_dht: bool = False,
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (see module docstring).

    ``tables="standard"`` entropy-codes with the Annex-K typical tables
    (luma pair id 0, chroma pair id 1) instead of the module's fixed-length
    canonical pair; ``omit_dht=True`` (MJPEG AVI frame convention, only
    meaningful with standard tables) skips the DHT segment — the decoder
    must splice it back via :func:`ensure_dht`."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (H, W, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if tables not in ("fixed", "standard"):
        raise ValueError(f"tables must be 'fixed' or 'standard', got {tables!r}")
    if omit_dht and tables != "standard":
        raise ValueError("omit_dht requires tables='standard'")
    if tables == "standard":
        dc_y = _enc_codes(_STD_DC_LUM_BITS, _STD_DC_LUM_VALS)
        ac_y = _enc_codes(_STD_AC_LUM_BITS, _STD_AC_LUM_VALS)
        dc_c = _enc_codes(_STD_DC_CHR_BITS, _STD_DC_CHR_VALS)
        ac_c = _enc_codes(_STD_AC_CHR_BITS, _STD_AC_CHR_VALS)
        dht_tables = _STD_TABLES
    else:
        dc_y = dc_c = _DC_CODE
        ac_y = ac_c = _AC_CODE
        dht_tables = (
            (0, 0, _ENC_DC_BITS, _ENC_DC_VALS), (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
            (0, 1, _ENC_DC_BITS, _ENC_DC_VALS), (1, 1, _ENC_AC_BITS, _ENC_AC_VALS),
        )
    h_img, w_img = img.shape[:2]
    sub = 2 if subsampling == "420" else 1
    qy = _quality_scale(_Q_LUM, quality)
    qc = _quality_scale(_Q_CHROM, quality)

    ycc = _rgb_to_ycbcr(img)
    mcu = 8 * sub
    mcus_x, mcus_y = -(-w_img // mcu), -(-h_img // mcu)
    ypl = _pad_edge(ycc[:, :, 0], mcus_y * mcu, mcus_x * mcu)
    cbp = _pad_edge(ycc[:, :, 1], mcus_y * mcu, mcus_x * mcu)
    crp = _pad_edge(ycc[:, :, 2], mcus_y * mcu, mcus_x * mcu)
    if sub == 2:  # 2x2 box-average chroma
        cbp = cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))

    w = _BitWriter()
    w.out += bytes([0xFF, 0xD8])  # SOI
    for tid, q in ((0, qy), (1, qc)):
        zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        w.out += bytes([0xFF, 0xDB]) + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()
    # SOF0
    sof = struct.pack(">BHHB", 8, h_img, w_img, 3)
    sof += bytes([1, (sub << 4) | sub, 0])  # Y
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    w.out += bytes([0xFF, 0xC0]) + struct.pack(">H", 2 + len(sof)) + sof
    if not omit_dht:
        for cls, tid, bits, vals in dht_tables:
            body = bytes([(cls << 4) | tid]) + bytes(bits) + vals
            w.out += bytes([0xFF, 0xC4]) + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        w.out += bytes([0xFF, 0xDD]) + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    w.out += bytes([0xFF, 0xDA]) + struct.pack(">H", 2 + len(sos)) + sos

    preds = {"y": 0, "cb": 0, "cr": 0}
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                w.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                preds = {k: 0 for k in preds}
            for vy in range(sub):
                for hx in range(sub):
                    by, bx = (my * sub + vy) * 8, (mx * sub + hx) * 8
                    zz = _quantize_zz(ypl[by : by + 8, bx : bx + 8], qy)
                    preds["y"] = _encode_block(w, zz, preds["y"], dc_y, ac_y)
            for name, plane in (("cb", cbp), ("cr", crp)):
                by, bx = my * 8, mx * 8
                zz = _quantize_zz(plane[by : by + 8, bx : bx + 8], qc)
                preds[name] = _encode_block(w, zz, preds[name], dc_c, ac_c)
            n_mcu += 1
    w.marker(0xD9)  # EOI (pads first)
    return bytes(w.out)


# -- progressive encoder (fixtures for the SOF2 decode path) ----------------

# AC table for progressive scans: the baseline fixed-length table lacks the
# EOBn symbols (r<<4, r=1..14) progressive EOB runs need; 176 symbols, all
# at code length 8 (canonical codes 0..175 — valid, all-ones unused)
_PROG_AC_SYMS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = bytes(_PROG_AC_SYMS)
_PROG_AC_CODE = _enc_codes(_PROG_AC_BITS, _PROG_AC_VALS)


def _emit_ac_sym(w: _BitWriter, sym: int) -> None:
    length, code = _PROG_AC_CODE[sym]
    w.write(code, length)


def _flush_eobrun(w: _BitWriter, n: int) -> int:
    """Emit a pending EOB run (n blocks ended, current-stream-position
    first) as EOBr + extension bits; returns 0."""
    if n:
        r = n.bit_length() - 1
        _emit_ac_sym(w, r << 4)
        if r:
            w.write(n - (1 << r), r)
    return 0


def _encode_ac_first(w: _BitWriter, blocks, ss: int, se: int, al: int) -> None:
    """AC first scan (Ah=0) over a component's blocks in raster order;
    magnitudes point-transformed by ``al`` (truncation toward zero)."""
    pending = 0
    for zz in blocks:
        scaled = [
            (abs(int(zz[k])) >> al) * (1 if zz[k] > 0 else -1)
            for k in range(ss, se + 1)
        ]
        last = max((i for i, v in enumerate(scaled) if v), default=-1)
        if last < 0:
            pending += 1
            if pending == 0x7FFF:
                pending = _flush_eobrun(w, pending)
            continue
        pending = _flush_eobrun(w, pending)
        run = 0
        for v in scaled[: last + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                _emit_ac_sym(w, 0xF0)
                run -= 16
            size = abs(v).bit_length()
            _emit_ac_sym(w, (run << 4) | size)
            w.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last < se - ss:  # trailing zeros -> this block ends with an EOB
            pending += 1
            if pending == 0x7FFF:
                pending = _flush_eobrun(w, pending)
    _flush_eobrun(w, pending)


def _encode_ac_refine(w: _BitWriter, blocks, ss: int, se: int,
                      ah: int, al: int) -> None:
    """AC refinement scan (Ah=Al+1): mirrors the decoder's crossing
    structure exactly — correction bits for previously-significant slots
    interleave with ZRL/newly-significant symbols in decoder consumption
    order.  EOB events flush per block (run length 1), which exercises the
    decoder's in-block EOB tail."""
    for zz in blocks:
        # classify band slots: 'z' still zero, 'c' previously significant
        # (emits a correction bit), 'n' newly significant (emits a symbol)
        slots = []
        for k in range(ss, se + 1):
            t = int(zz[k])
            absv = abs(t)
            if (absv >> al) == 0:
                slots.append(("z", 0))
            elif (absv >> ah) != 0:
                slots.append(("c", (absv >> al) & 1))
            else:
                slots.append(("n", 1 if t > 0 else 0))
        i, n = 0, len(slots)
        while True:
            j = i
            while j < n and slots[j][0] != "n":
                j += 1
            if j == n:
                break
            z_span = sum(1 for t, _ in slots[i:j] if t == "z")
            while z_span > 15:
                _emit_ac_sym(w, 0xF0)
                crossed = 0
                while crossed < 16:
                    cls, bit = slots[i]
                    i += 1
                    if cls == "c":
                        w.write(bit, 1)
                    else:
                        crossed += 1
                z_span -= 16
            _emit_ac_sym(w, (z_span << 4) | 1)
            w.write(slots[j][1], 1)  # sign of the new ±1<<al
            while i < j:
                cls, bit = slots[i]
                i += 1
                if cls == "c":
                    w.write(bit, 1)
            i = j + 1
        if i < n:  # tail: EOB event + correction bits for remaining 'c'
            _flush_eobrun(w, 1)
            for cls, bit in slots[i:]:
                if cls == "c":
                    w.write(bit, 1)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    dc_al: int = 1,
    ac_al: int = 1,
) -> bytes:
    """(H, W, 3) uint8 RGB -> PROGRESSIVE (SOF2) JFIF bytes: spectral
    selection + successive approximation.  Scan script: interleaved DC
    first at Al=dc_al, DC refinements down to 0, then per-component AC
    first (full band 1..63) at Al=ac_al and AC refinements down to 0.
    The successive-approximation chains reconstruct the quantized
    coefficients EXACTLY, so decoding this must equal decoding the
    baseline encoding at the same quality (the round-trip test's
    invariant)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects (H, W, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    h_img, w_img = img.shape[:2]
    sub = 2 if subsampling == "420" else 1
    qy = _quality_scale(_Q_LUM, quality)
    qc = _quality_scale(_Q_CHROM, quality)

    ycc = _rgb_to_ycbcr(img)
    mcu = 8 * sub
    mcus_x, mcus_y = -(-w_img // mcu), -(-h_img // mcu)
    ypl = _pad_edge(ycc[:, :, 0], mcus_y * mcu, mcus_x * mcu)
    cbp = _pad_edge(ycc[:, :, 1], mcus_y * mcu, mcus_x * mcu)
    crp = _pad_edge(ycc[:, :, 2], mcus_y * mcu, mcus_x * mcu)
    if sub == 2:
        cbp = cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))

    def grid(plane, qtab):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx] = _quantize_zz(
                    plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8], qtab
                )
        return arr

    coefs = {1: grid(ypl, qy), 2: grid(cbp, qc), 3: grid(crp, qc)}

    w = _BitWriter()
    w.out += bytes([0xFF, 0xD8])  # SOI
    for tid, q in ((0, qy), (1, qc)):
        zzq = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        w.out += bytes([0xFF, 0xDB]) + struct.pack(">H", 67) + bytes([tid]) + zzq.tobytes()
    sof = struct.pack(">BHHB", 8, h_img, w_img, 3)
    sof += bytes([1, (sub << 4) | sub, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    w.out += bytes([0xFF, 0xC2]) + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for cls, tid, bits, vals in (
        (0, 0, _ENC_DC_BITS, _ENC_DC_VALS), (1, 0, _PROG_AC_BITS, _PROG_AC_VALS),
    ):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + vals
        w.out += bytes([0xFF, 0xC4]) + struct.pack(">H", 2 + len(body)) + body

    def sos(comp_ids, ss, se, ah, al):
        w.pad()
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # dc table 0, ac table 0
        body += bytes([ss, se, (ah << 4) | al])
        w.out += bytes([0xFF, 0xDA]) + struct.pack(">H", 2 + len(body)) + body

    # MCU-interleaved unit order shared by the two DC scan kinds
    units = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for vy in range(sub):
                for hx in range(sub):
                    units.append((1, my * sub + vy, mx * sub + hx))
            units.append((2, my, mx))
            units.append((3, my, mx))

    sos([1, 2, 3], 0, 0, 0, dc_al)  # DC first
    preds = {1: 0, 2: 0, 3: 0}
    for cid, by, bx in units:
        v = int(coefs[cid][by, bx, 0]) >> dc_al  # arithmetic shift per spec
        diff = v - preds[cid]
        preds[cid] = v
        size = _category(diff)
        length, code = _DC_CODE[size]
        w.write(code, length)
        if size:
            w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    for al in range(dc_al - 1, -1, -1):  # DC refinements
        sos([1, 2, 3], 0, 0, al + 1, al)
        for cid, by, bx in units:
            w.write((int(coefs[cid][by, bx, 0]) >> al) & 1, 1)

    # per-component non-interleaved block grids (unpadded portion)
    def comp_blocks(cid, ch, cv):
        cw = -(-w_img * ch // sub)
        chh = -(-h_img * cv // sub)
        nbw, nbh = -(-cw // 8), -(-chh // 8)
        arr = coefs[cid]
        return [arr[by, bx] for by in range(nbh) for bx in range(nbw)]

    comp_geom = [(1, sub, sub), (2, 1, 1), (3, 1, 1)]
    for cid, ch, cv in comp_geom:  # AC first scans
        sos([cid], 1, 63, 0, ac_al)
        _encode_ac_first(w, comp_blocks(cid, ch, cv), 1, 63, ac_al)
    for al in range(ac_al - 1, -1, -1):  # AC refinement scans
        for cid, ch, cv in comp_geom:
            sos([cid], 1, 63, al + 1, al)
            _encode_ac_refine(w, comp_blocks(cid, ch, cv), 1, 63, al + 1, al)

    w.marker(0xD9)
    return bytes(w.out)
