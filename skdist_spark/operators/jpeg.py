"""JPEG codec (baseline SOF0 + progressive SOF2) in pure numpy +
stdlib — no codec libs.

Completes the REAL pixel-decode ladder in ``multimodal.py`` (BMP, PPM/
PGM, PNG, GIF already decode for real; JPEG was the last gated format).
Scope: 8-bit samples, Huffman entropy coding, 1 or 3 components, any
sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart intervals, and
progressive frames (spectral selection + successive approximation: DC
first/refine, AC first with EOB runs, AC refinement with correction
bits).  Arithmetic coding, 12-bit, and hierarchical frames return
``None`` so callers fall back to the deterministic stub path — same
contract as the other decoders.

The encoders exist so round-trip tests can pin the decoder without any
external fixture: standard Annex K quantization + Huffman tables,
optional 4:2:0 subsampling and restart markers, so every decoder code
path (interleaved MCUs, chroma upsample, RST resync, grayscale
single-component scans) is exercised by bytes we craft ourselves.  The
progressive encoder writes the SAME quantized coefficients as the
baseline one, so progressive decode is cross-checked for exact pixel
equality against the already-trusted sequential path — not merely
against its own encoder.

Reference parity note: the reference (sk-dist) has no media layer at
all; this exists for the training-data-pipeline surface (image feature
extraction over binary columns, SURVEY §2.4). Decode runs inside the
Arrow-batched ``mapInPandas`` stages of multimodal.py — per-payload
Python cost, zero driver involvement, same 100 TB posture as the other
codecs. A production deployment with PIL/libjpeg-turbo present would
take the ``_try_real_decoder`` gate instead; this path keeps the
semantics real when it is not.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[i] = raster index of the i-th transmitted
# coefficient.  dezigzag: out.flat[ZIGZAG] = coefs; zigzag: block.flat[ZIGZAG].
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K base quantization tables (raster order).
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman tables: (bits[1..16] counts, symbol values).
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
     0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
     0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """M[u, x] = c(u)/2 * cos((2x+1) u pi / 16).

    Forward 2-D DCT of block f: M @ f @ M.T; inverse: M.T @ F @ M.
    """
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


def _canonical_codes(bits, vals):
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_lut(bits, vals):
    """(code, length) -> symbol lookup for bit-serial decoding."""
    return {(c, l): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitReader:
    """MSB-first reader over already de-stuffed entropy bytes."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise EOFError("entropy data exhausted")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, lut) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = lut.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude per F.2.2.1 (negative branch)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _destuff(data: bytes) -> bytes:
    """Remove the 0x00 stuffing byte after each literal 0xFF."""
    return data.replace(b"\xff\x00", b"\xff")


def _idct_batch(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) uint8 samples."""
    px = np.einsum("ux,nuv,vy->nxy", _DCT_M, blocks, _DCT_M)
    return np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_lut", "ac_lut", "blocks",
                 "bw", "bh", "cbw", "cbh", "coefs")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq


def decode_jpeg_pixels(b: bytes):
    """Decode a baseline-sequential OR progressive JPEG to an HxWxC
    uint8 array.

    Returns ``None`` for anything outside scope (arithmetic coding,
    12-bit, hierarchical, >3 components, truncated streams) so callers
    can fall back — never raises on malformed input.
    """
    try:
        return _decode_jpeg(b)
    except Exception:
        return None


def _decode_jpeg(b: bytes):
    if b[:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    comps: list[_Component] = []
    w = h = 0
    restart = 0
    progressive = False
    prog_ready = False
    i = 2
    n = len(b)
    while i < n - 1:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        i += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 2 > n:
            return None
        seg_len = struct.unpack(">H", b[i:i + 2])[0]
        seg = b[i + 2:i + seg_len]
        if marker == 0xDB:  # DQT: one or more tables, zigzag order
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 15
                j += 1
                if prec == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, j).astype(np.int64)
                    j += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, j).astype(np.int64)
                    j += 128
                qtabs[tid] = vals
        elif marker == 0xC4:  # DHT: one or more tables
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nsym = sum(bits)
                vals = list(seg[j + 17:j + 17 + nsym])
                (dc_luts if tc == 0 else ac_luts)[th] = _decode_lut(bits, vals)
                j += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if seg[0] != 8:  # sample precision
                return None
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 15, tq))
            if progressive:
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                for c in comps:
                    # padded interleaved grid (DC scans write into it)
                    # + the true non-interleaved grid (AC scans cover
                    # only this; pad blocks keep zero AC, and all pad
                    # pixels are cropped away)
                    c.bw, c.bh = mcus_x * c.h, mcus_y * c.v
                    c.cbw = -(-(-(-w * c.h // hmax)) // 8)
                    c.cbh = -(-(-(-h * c.v // vmax)) // 8)
                    c.coefs = np.zeros((c.bh * c.bw, 64), dtype=np.int64)
                prog_ready = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # arithmetic / lossless / hierarchical
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: header, then entropy data
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(cc for cc in comps if cc.cid == cs)
                comp.dc_lut = dc_luts.get(tdta >> 4)
                comp.ac_lut = ac_luts.get(tdta & 15)
                scan.append(comp)
            data_start = i + seg_len
            # entropy data ends at the first marker that is neither a
            # stuffed 0xFF00 nor a restart
            j = data_start
            while j < n - 1:
                if b[j] == 0xFF and b[j + 1] != 0x00 and not (
                    0xD0 <= b[j + 1] <= 0xD7
                ):
                    break
                j += 1
            if not progressive:
                return _decode_scan(
                    b[data_start:j], scan, comps, qtabs, w, h, restart
                )
            if not prog_ready:
                return None
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            _decode_prog_scan(
                b[data_start:j], scan, ss, se, ahal >> 4, ahal & 15, restart
            )
            i = j
            continue
        # APPn / COM / others: skip
        i += seg_len
    if progressive and prog_ready:
        return _finish_progressive(comps, qtabs, w, h)
    return None


def _decode_prog_scan(data, scan, ss, se, ah, al, restart):
    """One progressive scan (T.81 G.2): DC first/refine over the
    interleaved MCU grid (or a single component's own grid), AC
    first/refine over one component's non-interleaved block grid,
    accumulating into ``c.coefs`` (zigzag order).  Restart markers
    reset DC predictors and the EOB run."""
    if ss == 0:  # ---- DC scan ----
        if se != 0:
            raise ValueError("bad DC band")
        if len(scan) == 1:
            c = scan[0]
            units = [(c, 0, 0)]
            mcus_x, total = c.cbw, c.cbh * c.cbw
        else:
            c0 = scan[0]
            mcus_x = c0.bw // c0.h
            total = mcus_x * (c0.bh // c0.v)
            units = [
                (c, v, hh)
                for c in scan
                for v in range(c.v)
                for hh in range(c.h)
            ]
        intervals = _split_restarts(data) if restart else [data]
        mcu = 0
        for chunk in intervals:
            br = _BitReader(_destuff(chunk))
            preds = {c.cid: 0 for c in scan}
            limit = mcu + restart if restart else total
            while mcu < min(limit, total):
                for c, v, hh in units:
                    if len(scan) == 1:
                        by, bx = divmod(mcu, mcus_x)
                    else:
                        my, mx = divmod(mcu, mcus_x)
                        by, bx = my * c.v + v, mx * c.h + hh
                    pos = by * c.bw + bx
                    if ah == 0:
                        s = br.read_symbol(c.dc_lut)
                        preds[c.cid] += _extend(br.read_bits(s), s)
                        c.coefs[pos, 0] = preds[c.cid] << al
                    elif br.read_bit():
                        c.coefs[pos, 0] = int(c.coefs[pos, 0]) | (1 << al)
                mcu += 1
            if mcu >= total:
                break
        if mcu < total:
            raise ValueError("truncated DC scan")
        return
    # ---- AC scan: exactly one component, non-interleaved ----
    if len(scan) != 1:
        raise ValueError("interleaved AC scan")
    c = scan[0]
    total = c.cbh * c.cbw
    p1, m1 = 1 << al, -(1 << al)
    intervals = _split_restarts(data) if restart else [data]
    blk = 0
    for chunk in intervals:
        br = _BitReader(_destuff(chunk))
        eobrun = 0
        limit = blk + restart if restart else total
        while blk < min(limit, total):
            by, bx = divmod(blk, c.cbw)
            row = c.coefs[by * c.bw + bx]
            if ah == 0:  # ---- first pass over this band ----
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = br.read_symbol(c.ac_lut)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        row[k] = _extend(br.read_bits(s), s) << al
                        k += 1
            else:  # ---- refinement pass (correction bits, T.81 G.2) ----
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.read_symbol(c.ac_lut)
                        r, s = rs >> 4, rs & 15
                        insert = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history coefs
                        else:
                            insert = p1 if br.read_bit() else m1
                        while k <= se:
                            v = int(row[k])
                            if v != 0:
                                if br.read_bit() and (v & p1) == 0:
                                    row[k] = v + (p1 if v > 0 else m1)
                            else:
                                if r == 0:
                                    if insert:
                                        row[k] = insert
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        v = int(row[k])
                        if v != 0 and br.read_bit() and (v & p1) == 0:
                            row[k] = v + (p1 if v > 0 else m1)
                        k += 1
                    eobrun -= 1
            blk += 1
        if blk >= total:
            break
    if blk < total:
        raise ValueError("truncated AC scan")


def _finish_progressive(comps, qtabs, w, h):
    """Dequantize the accumulated coefficient arrays and reuse the
    baseline IDCT / upsample / color path."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        qt = qtabs[c.tq]
        blocks = np.zeros((c.bh * c.bw, 8, 8), dtype=np.float64)
        blocks.reshape(c.bh * c.bw, 64)[:, ZIGZAG] = c.coefs * qt[None, :]
        sp = _idct_batch(blocks)
        plane = sp.reshape(c.bh, c.bw, 8, 8).transpose(0, 2, 1, 3)
        plane = plane.reshape(c.bh * 8, c.bw * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return planes[0][..., None]
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def _decode_scan(data, scan, comps, qtabs, w, h, restart):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if len(scan) == 1:
        # Non-interleaved single-component scan: the MCU is one data
        # unit and the block grid comes from the component's own dims.
        c = scan[0]
        cw = -(-w * c.h // hmax)
        chh = -(-h * c.v // vmax)
        c.bw = -(-cw // 8)
        c.bh = -(-chh // 8)
        mcus = c.bw * c.bh
        units = [(c, 0, 0)]  # block position derived from MCU index
        mcus_x = c.bw
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        mcus = mcus_x * mcus_y
        units = []
        for c in scan:
            c.bw = mcus_x * c.h
            c.bh = mcus_y * c.v
            for v in range(c.v):
                for hh in range(c.h):
                    units.append((c, v, hh))
    for c in scan:
        c.blocks = np.zeros((c.bh * c.bw, 8, 8), dtype=np.float64)

    intervals = (
        _split_restarts(data) if restart else [data]
    )
    mcu = 0
    for chunk in intervals:
        br = _BitReader(_destuff(chunk))
        preds = {c.cid: 0 for c in scan}
        limit = mcu + restart if restart else mcus
        while mcu < min(limit, mcus):
            for c, v, hh in units:
                if len(scan) == 1:
                    by, bx = divmod(mcu, mcus_x)
                else:
                    my, mx = divmod(mcu, mcus_x)
                    by, bx = my * c.v + v, mx * c.h + hh
                qt = qtabs[c.tq]
                preds[c.cid], blk = _decode_block(
                    br, c.dc_lut, c.ac_lut, qt, preds[c.cid]
                )
                c.blocks[by * c.bw + bx] = blk
            mcu += 1
        if mcu >= mcus:
            break
    if mcu < mcus:
        raise ValueError("truncated scan")

    planes = []
    for c in comps:
        sp = _idct_batch(c.blocks)
        plane = sp.reshape(c.bh, c.bw, 8, 8).transpose(0, 2, 1, 3)
        plane = plane.reshape(c.bh * 8, c.bw * 8)
        # upsample to full resolution (sample replication), crop
        plane = np.repeat(
            np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return planes[0][..., None]
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def _split_restarts(data: bytes) -> list[bytes]:
    """Split entropy data on RST0-7 markers (stuffed FF00 is opaque)."""
    out, start, j, n = [], 0, 0, len(data)
    while j < n - 1:
        if data[j] == 0xFF and 0xD0 <= data[j + 1] <= 0xD7:
            out.append(data[start:j])
            j += 2
            start = j
        else:
            j += 1 + (data[j] == 0xFF)  # skip stuffed pair atomically
    out.append(data[start:])
    return out


def _decode_block(br, dc_lut, ac_lut, qt, pred):
    s = br.read_symbol(dc_lut)
    pred += _extend(br.read_bits(s), s)
    coefs = np.zeros(64, dtype=np.int64)
    coefs[0] = pred
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                break  # EOB
            k += 16  # ZRL
            continue
        k += r
        coefs[k] = _extend(br.read_bits(s), s)
        k += 1
    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = coefs * qt
    return pred, blk.reshape(8, 8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _scaled_qtab(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _pad_to(plane: np.ndarray, bh8: int, bw8: int) -> np.ndarray:
    """Edge-replicate pad a 2-D plane to (bh8, bw8)."""
    return np.pad(
        plane,
        ((0, bh8 - plane.shape[0]), (0, bw8 - plane.shape[1])),
        mode="edge",
    )


def _fdct_quant(plane: np.ndarray, qt_raster: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (bh, bw, 64) zigzag ints."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,ijxy,vy->ijuv", _DCT_M, blocks, _DCT_M)
    q = np.round(f / qt_raster.reshape(8, 8)).astype(np.int64)
    return q.reshape(bh, bw, 64)[..., ZIGZAG]


def _encode_block(bw_, zz, dc_codes, ac_codes, pred):
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw_.write(code, length)
    if s:
        bw_.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw_.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw_.write(code, length)
        bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw_.write(code, length)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoding of an HxWx{1,3} uint8 array.

    ``subsample=True`` writes 4:2:0 (2x2 chroma decimation by mean);
    ``restart_interval`` > 0 emits DRI + RST markers every that many
    MCUs. Exists primarily as the decoder's round-trip test partner.
    """
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, nc = pixels.shape
    gray = nc == 1
    qt_l = _scaled_qtab(_Q_LUMA, quality)
    qt_c = _scaled_qtab(_Q_CHROMA, quality)

    if gray:
        planes = [pixels[..., 0].astype(np.float64) - 128.0]
        factors = [(1, 1)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if subsample:
            # pad to even dims, then 2x2 mean-decimate the chroma
            cb = _pad_to(cb, (h + 1) & ~1, (w + 1) & ~1)
            cr = _pad_to(cr, (h + 1) & ~1, (w + 1) & ~1)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2)
            cb = cb.mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2)
            cr = cr.mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs = []
    for plane, (fh, fv), qt in zip(planes, factors, qts):
        bw8, bh8 = mcus_x * fh * 8, mcus_y * fv * 8
        coefs.append(_fdct_quant(_pad_to(plane, bh8, bw8), qt))

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (0 if gray else 2)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate([qt_l] if gray else [qt_l, qt_c]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(planes), 8, h, w,
                                     len(planes))
    for cid, (fh, fv) in enumerate(factors, start=1):
        out += bytes([cid, (fh << 4) | fv, 0 if cid == 1 else 1])
    for tc, th, (bits, vals) in [
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
        *( [] if gray else [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)] ),
    ]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for cid in range(1, len(planes) + 1):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential DCT

    writer = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            writer = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, ((fh, fv), (dc_codes, ac_codes)) in enumerate(
            zip(factors, tables)
        ):
            for v in range(fv):
                for hh in range(fh):
                    zz = coefs[ci][my * fv + v, mx * fh + hh]
                    preds[ci] = _encode_block(
                        writer, zz, dc_codes, ac_codes, preds[ci]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — the decoder's round-trip partner.
# ---------------------------------------------------------------------------

# AC table for progressive scans: Annex K's AC tables lack the EOBn
# symbols ((r<<4)|0, r>0) progressive streams need, so scans use this
# flat table instead — every (run, size) the mode can emit, all at code
# length 9 (176 codes < 511: canonical, no all-ones code).
_AC_PROG_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_PROG = ([0] * 8 + [len(_AC_PROG_SYMS)] + [0] * 7, _AC_PROG_SYMS)


def _emit_eobrun(bw_, ac_codes, eobrun, be_run):
    """Flush a pending EOB run, then the correction bits that ride it."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        bw_.write(code, length)
        if nbits:
            bw_.write(eobrun - (1 << nbits), nbits)
    for bit in be_run:
        bw_.write(bit, 1)
    return 0, []


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    bands: "tuple[tuple[int, int], ...]" = ((1, 5), (6, 63)),
    al: int = 1,
) -> bytes:
    """Progressive (SOF2) JFIF encoding of an HxWx{1,3} uint8 array.

    Writes the SAME quantized coefficients as ``encode_jpeg`` as a
    progressive scan script: interleaved DC first (Al=``al``) + DC
    refinements down to 0, then per component an AC first scan per
    spectral ``band`` at Al=``al`` followed by AC refinement scans —
    exercising EOB runs, ZRL (both passes), correction bits, and
    spectral selection.  Because the coefficients match the baseline
    file exactly, ``decode_jpeg_pixels`` of this stream must equal the
    decode of the baseline stream PIXEL-FOR-PIXEL — the cross-check
    that pins the progressive scan machinery against the
    already-trusted sequential path instead of against its own encoder.

    Correction-bit discipline (T.81 G.1.2.3): ``be_run`` buffers bits
    that ride the pending EOB run (emitted right after its EOBn
    symbol); ``br`` buffers the current zero-run's bits (emitted right
    after the next ZRL / new-coefficient symbol+sign).  Merging the
    two buffers reorders bits and desyncs dense blocks.
    """
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, nc = pixels.shape
    gray = nc == 1
    qt_l = _scaled_qtab(_Q_LUMA, quality)
    qt_c = _scaled_qtab(_Q_CHROMA, quality)
    if gray:
        planes = [pixels[..., 0].astype(np.float64) - 128.0]
        factors = [(1, 1)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            cb = _pad_to(cb, (h + 1) & ~1, (w + 1) & ~1)
            cr = _pad_to(cr, (h + 1) & ~1, (w + 1) & ~1)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs = []
    for plane, (fh, fv), qt in zip(planes, factors, qts):
        bw8, bh8 = mcus_x * fh * 8, mcus_y * fv * 8
        coefs.append(_fdct_quant(_pad_to(plane, bh8, bw8), qt))

    dc_l = _canonical_codes(*_DC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_p = _canonical_codes(*_AC_PROG)
    dc_tables = [dc_l] + [dc_c] * (0 if gray else 2)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate([qt_l] if gray else [qt_l, qt_c]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes)
    )
    for cid, (fh, fv) in enumerate(factors, start=1):
        out += bytes([cid, (fh << 4) | fv, 0 if cid == 1 else 1])
    for tc, th, (bits, vals) in [
        (0, 0, _DC_LUMA), (1, 0, _AC_PROG),
        *([] if gray else [(0, 1, _DC_CHROMA)]),
    ]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    def sos_header(comp_ids, ss, se, ah, al_):
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comp_ids), len(comp_ids)
        )
        for cid in comp_ids:
            dc_id = 0 if cid == 1 else 1
            hdr += bytes([cid, (dc_id << 4) | 0])  # AC table 0 everywhere
        return hdr + bytes([ss, se, (ah << 4) | al_])

    # ---- DC first scan: interleaved, point transform ``al`` ----
    out += sos_header(list(range(1, len(planes) + 1)), 0, 0, 0, al)
    writer = _BitWriter()
    preds = [0] * len(planes)
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (fh, fv) in enumerate(factors):
            for v in range(fv):
                for hh in range(fh):
                    dc = int(coefs[ci][my * fv + v, mx * fh + hh, 0]) >> al
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    s = _category(diff)
                    code, length = dc_tables[ci][s]
                    writer.write(code, length)
                    if s:
                        writer.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
    writer.flush()
    out += writer.out

    # ---- DC refinement scans: one raw bit per block per level ----
    for lvl in range(al - 1, -1, -1):
        out += sos_header(list(range(1, len(planes) + 1)), 0, 0, lvl + 1, lvl)
        writer = _BitWriter()
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (fh, fv) in enumerate(factors):
                for v in range(fv):
                    for hh in range(fh):
                        dc = int(coefs[ci][my * fv + v, mx * fh + hh, 0])
                        writer.write((dc >> lvl) & 1, 1)
        writer.flush()
        out += writer.out

    # ---- AC scans: per component, per band; first then refinements ----
    for ci, (fh, fv) in enumerate(factors):
        cw = -(-w * fh // hmax)
        chh = -(-h * fv // vmax)
        cbw, cbh = -(-cw // 8), -(-chh // 8)
        blocks = [
            coefs[ci][by, bx] for by in range(cbh) for bx in range(cbw)
        ]
        for ss, se in bands:
            # ---- first pass at Al=al ----
            out += sos_header([ci + 1], ss, se, 0, al)
            writer = _BitWriter()
            eobrun = 0
            for zz in blocks:
                shifted = [
                    (abs(int(v)) >> al) * (1 if v >= 0 else -1)
                    for v in zz[ss:se + 1]
                ]
                nz = [k for k, v in enumerate(shifted) if v != 0]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        eobrun, _ = _emit_eobrun(writer, ac_p, eobrun, [])
                    continue
                eobrun, _ = _emit_eobrun(writer, ac_p, eobrun, [])
                run = 0
                for k in range(nz[-1] + 1):
                    v = shifted[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_p[0xF0]
                        writer.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_p[(run << 4) | s]
                    writer.write(code, length)
                    writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if nz[-1] < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        eobrun, _ = _emit_eobrun(writer, ac_p, eobrun, [])
            _emit_eobrun(writer, ac_p, eobrun, [])
            writer.flush()
            out += writer.out
            # ---- refinement passes down to Al=0 ----
            for lvl in range(al - 1, -1, -1):
                out += sos_header([ci + 1], ss, se, lvl + 1, lvl)
                writer = _BitWriter()
                eobrun = 0
                be_run = []
                for zz in blocks:
                    absv = [abs(int(v)) >> lvl for v in zz[ss:se + 1]]
                    new = [k for k, v in enumerate(absv) if v == 1]
                    eob = new[-1] if new else -1
                    run = 0
                    br = []
                    for k in range(eob + 1):
                        v = absv[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            eobrun, be_run = _emit_eobrun(
                                writer, ac_p, eobrun, be_run
                            )
                            code, length = ac_p[0xF0]
                            writer.write(code, length)
                            run -= 16
                            for bit in br:
                                writer.write(bit, 1)
                            br = []
                        if v > 1:  # history nonzero: buffer correction bit
                            br.append(v & 1)
                            continue
                        # newly visible coefficient
                        eobrun, be_run = _emit_eobrun(
                            writer, ac_p, eobrun, be_run
                        )
                        code, length = ac_p[(run << 4) | 1]
                        writer.write(code, length)
                        writer.write(1 if int(zz[ss + k]) >= 0 else 0, 1)
                        for bit in br:
                            writer.write(bit, 1)
                        br = []
                        run = 0
                    # tail after the last new coefficient (or the whole
                    # block when none): ends inside an EOB run; its
                    # history corrections ride that run
                    if eob < len(absv) - 1 or not new:
                        for k in range(eob + 1, len(absv)):
                            if absv[k] > 1:
                                br.append(absv[k] & 1)
                        eobrun += 1
                        be_run.extend(br)
                        if eobrun == 0x7FFF:
                            eobrun, be_run = _emit_eobrun(
                                writer, ac_p, eobrun, be_run
                            )
                _emit_eobrun(writer, ac_p, eobrun, be_run)
                writer.flush()
                out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
