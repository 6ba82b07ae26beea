"""Native JPEG (JFIF) decode/encode — no image library.

Completes the real-decode set (PNG ``png.py``, GIF ``gif.py``, WAV
``wav.py``): baseline sequential AND progressive DCT JPEG per the
public ITU T.81 spec. Decoder: marker parse (DQT/SOF0/SOF2/DHT/SOS/
DRI), huffman entropy decode with byte-unstuffing and restart markers;
for progressive (SOF2), spectral-selection + successive-approximation
scan accumulation into a per-component coefficient store (DC first/
refine, AC first/refine with EOB runs, T.81 G.1.2 / figure G.7
semantics) reconstructed once at EOI; dequantization, zigzag, float
IDCT (orthonormal DCT-III via matrix multiply), per-component sampling
factors with nearest-neighbor chroma upsample, JFIF YCbCr→RGB.
Encoder: baseline with the T.81 Annex K example tables at fixed
quality, 4:4:4 or 4:2:0, plus a progressive encoder (multi-scan
spectral bands + successive approximation, buffered correction bits,
EOB-run accumulation) — enough to roundtrip tests without PIL.

Out of scope (raise, never misread): arithmetic coding, 12-bit
precision, CMYK, hierarchical (SOF3/5/6/7/9-11/13-15).
"""

from __future__ import annotations

import struct

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)

JPEG_MAGIC = b"\xff\xd8\xff"


class JpegError(ValueError):
    pass


# T.81 Annex K example tables --------------------------------------------
_QL = [  # luminance quant, natural order after de-zigzag below
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QC = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c[k, n] = math.cos((2 * n + 1) * k * math.pi / 16) * (
                math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
            )
    return c


def _build_huff(counts, symbols):
    """(counts[16], symbols) → {(length, code): symbol}."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first entropy reader with 0xFF00 unstuffing; stops at
    markers (restarts are consumed by the caller)."""

    def __init__(self, b: bytes, pos: int):
        self.b, self.pos, self.acc, self.n = b, pos, 0, 0

    def _fill(self):
        b = self.b
        while self.n <= 24:
            if self.pos >= len(b):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.acc |= 0  # pad zeros past end
                self.n += 8
                continue
            byte = b[self.pos]
            if byte == 0xFF:
                nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # real marker: stop feeding
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFFFF
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        if self.n < k:
            raise JpegError("entropy data exhausted")
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("bad huffman code")

    def resync_restart(self):
        """Align to byte boundary and consume an RSTn marker."""
        self.acc, self.n = 0, 0
        b = self.b
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("missing restart marker")


def _extend(v, size):
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------
# progressive scan decoding (T.81 G.1.2, figure G.7 block procedures)
# ---------------------------------------------------------------------


def _mcu_geometry(comps, w, h):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _ac_first_block(r, blk, ss0, se0, al, ac_table, eobrun):
    """AC coefficients, first scan of a band: magnitudes shifted by the
    point transform, zero runs + EOB-run codes across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss0
    while k <= se0:
        rs = r.huff(ac_table)
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:
                k += 16  # ZRL: 16 zeros
                continue
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += r.bits(rr)
            break
        k += rr
        if k > se0:
            raise JpegError("AC index overrun")
        blk[k] = _extend(r.bits(ss), ss) << al
        k += 1
    return eobrun


def _ac_refine_block(r, blk, ss0, se0, al, ac_table, eobrun):
    """AC refinement scan: one new magnitude bit per already-nonzero
    coefficient, newly-significant coefficients coded ±1<<Al. Follows
    the figure-G.7 control flow (correction bits interleave with run
    codes; EOB-run blocks still carry correction bits)."""
    p1 = 1 << al
    m1 = -p1
    k = ss0
    if eobrun == 0:
        while k <= se0:
            rs = r.huff(ac_table)
            rr, ss = rs >> 4, rs & 0xF
            newval = 0
            if ss:
                if ss != 1:
                    raise JpegError("bad refinement magnitude code")
                newval = p1 if r.bits(1) else m1
            elif rr != 15:
                eobrun = 1 << rr
                if rr:
                    eobrun += r.bits(rr)
                break
            # advance over rr zero-history coefficients; already-nonzero
            # ones are corrected in passing and don't count toward the run
            while k <= se0:
                c = int(blk[k])
                if c:
                    if r.bits(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval and k <= se0:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        # inside the EOB run every remaining nonzero coef gets one bit
        while k <= se0:
            c = int(blk[k])
            if c:
                if r.bits(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data, pos, scan_comps, ss0, se0, ah, al, comps, coef,
                      huff_dc, huff_ac, restart_interval, w, h):
    """Decode one progressive scan into the coefficient store; returns
    the stream position of the next marker."""
    r = _BitReader(data, pos)
    hmax, vmax, mcux, mcuy = _mcu_geometry(comps, w, h)
    comp_info = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    pred = {cid: 0 for cid, _td, _ta in scan_comps}
    eobrun = 0

    def dc_block(cid, td, blk):
        if ah == 0:
            s = r.huff(huff_dc[td])
            diff = _extend(r.bits(s), s) if s else 0
            pred[cid] += diff
            blk[0] = pred[cid] << al
        elif r.bits(1):
            blk[0] = int(blk[0]) | (1 << al)

    if len(scan_comps) > 1:
        if ss0 != 0:
            raise JpegError("interleaved AC scan is not allowed")
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and count and count % restart_interval == 0:
                    r.resync_restart()
                    eobrun = 0
                    for cid in pred:
                        pred[cid] = 0
                for cid, td, _ta in scan_comps:
                    ch, cv = comp_info[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            dc_block(cid, td, coef[cid][my * cv + by, mx * ch + bx])
                count += 1
    else:
        cid, td, ta = scan_comps[0]
        ch, cv = comp_info[cid]
        nbx = (-(-(w * ch) // hmax) + 7) // 8
        nby = (-(-(h * cv) // vmax) + 7) // 8
        count = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and count and count % restart_interval == 0:
                    r.resync_restart()
                    eobrun = 0
                    pred[cid] = 0
                blk = coef[cid][by, bx]
                if ss0 == 0:
                    dc_block(cid, td, blk)
                elif ah == 0:
                    eobrun = _ac_first_block(r, blk, ss0, se0, al, huff_ac[ta], eobrun)
                else:
                    eobrun = _ac_refine_block(r, blk, ss0, se0, al, huff_ac[ta], eobrun)
                count += 1

    # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the entropy
    # stream before a marker — an 0xFF followed by another 0xFF is fill,
    # not a marker start, so keep scanning to the LAST 0xFF of the run
    p = r.pos
    while p < len(data) - 1 and not (
        data[p] == 0xFF
        and data[p + 1] != 0x00
        and data[p + 1] != 0xFF
        and not (0xD0 <= data[p + 1] <= 0xD7)
    ):
        p += 1
    return p


def _assemble_rgb(out, np):
    """[(plane_cropped_to_w_h), ...] 1 or 3 planes → flat RGB."""
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
        return rgb.reshape(-1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8).reshape(-1)


def _reconstruct_progressive(comps, coef, qt, w, h, np):
    """Coefficient store → pixels: vectorized dequant + IDCT per
    component, then the shared upsample / color-convert tail."""
    C = _dct_matrix()
    hmax, vmax, _mcux, _mcuy = _mcu_geometry(comps, w, h)
    out = []
    for cid, ch, cv, tq in comps:
        arr = coef[cid].astype(np.float64)  # (nby, nbx, 64) zigzag order
        q = np.array(qt[tq], dtype=np.float64)
        deq = np.zeros_like(arr)
        deq[..., _ZIGZAG] = arr * q
        blocks = deq.reshape(arr.shape[0], arr.shape[1], 8, 8)
        px = np.einsum("ia,yxij,jb->yxab", C, blocks, C) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(arr.shape[0] * 8, arr.shape[1] * 8)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(plane[:h, :w])
    return w, h, 3, _assemble_rgb(out, np)


def decode_jpeg(data: bytes):
    """bytes → (width, height, 3, rgb_pixels flat uint8 array)."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # [(cid, h, v, tq)]
    w = h = 0
    restart_interval = 0
    progressive = False
    coef = None  # progressive: cid → (nby, nbx, 64) int32, zigzag order
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        m = data[pos + 1]
        if m == 0xFF:  # T.81 B.1.1.2 fill byte, not a marker code
            pos += 1
            continue
        if m == 0xD9:
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = pos + 4
        if m == 0xDB:  # DQT
            o = body
            while o < pos + 2 + seglen:
                pq, tq = data[o] >> 4, data[o] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qt[tq] = list(data[o + 1 : o + 65])
                o += 65
        elif m == 0xC4:  # DHT
            o = body
            while o < pos + 2 + seglen:
                tc, th = data[o] >> 4, data[o] & 0xF
                counts = list(data[o + 1 : o + 17])
                n = sum(counts)
                syms = list(data[o + 17 : o + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(
                    counts, syms
                )
                o += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = m == 0xC2
            prec = data[body]
            if prec != 8:
                raise JpegError("only 8-bit precision")
            h, w = struct.unpack_from(">HH", data, body + 1)
            nc = data[body + 5]
            comps = []
            for i in range(nc):
                cid = data[body + 6 + 3 * i]
                hv = data[body + 7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, data[body + 8 + 3 * i]))
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegError("unsupported JPEG coding process")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, body)
        elif m == 0xDA:  # SOS
            if comps is None:
                raise JpegError("SOS before SOF")
            ns = data[body]
            scan_comps = []
            for i in range(ns):
                cid = data[body + 1 + 2 * i]
                tt = data[body + 2 + 2 * i]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            ss0 = data[body + 1 + 2 * ns]
            se0 = data[body + 2 + 2 * ns]
            a = data[body + 3 + 2 * ns]
            scan_start = body + 4 + 2 * ns
            if not progressive:
                sel = {cid: (td, ta) for cid, td, ta in scan_comps}
                return _decode_scan(
                    data, scan_start, w, h, comps, qt, huff_dc, huff_ac, sel,
                    restart_interval, np,
                )
            if coef is None:
                _hmax, _vmax, mcux, mcuy = _mcu_geometry(comps, w, h)
                coef = {
                    cid: np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
                    for cid, ch, cv, _tq in comps
                }
            pos = _decode_prog_scan(
                data, scan_start, scan_comps, ss0, se0, a >> 4, a & 0xF,
                comps, coef, huff_dc, huff_ac, restart_interval, w, h,
            )
            continue
        pos += 2 + seglen
    if progressive and coef is not None:
        return _reconstruct_progressive(comps, coef, qt, w, h, np)
    raise JpegError("no scan found")


def _decode_scan(data, pos, w, h, comps, qt, huff_dc, huff_ac, sel,
                 restart_interval, np):
    if not comps:
        raise JpegError("missing SOF")
    C = _dct_matrix()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
    r = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.resync_restart()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, tq in comps:
                dct, act = sel[cid]
                for by in range(cv):
                    for bx in range(ch):
                        blk = np.zeros(64)
                        s = r.huff(huff_dc[dct])
                        diff = _extend(r.bits(s), s) if s else 0
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = r.huff(huff_ac[act])
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise JpegError("AC index overrun")
                            blk[k] = _extend(r.bits(ss), ss)
                            k += 1
                        q = np.array(qt[tq], dtype=np.float64)
                        deq = np.zeros(64)
                        deq[_ZIGZAG] = blk * q
                        px = C.T @ deq.reshape(8, 8) @ C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample + color convert
    out = []
    for cid, ch, cv, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    return w, h, 3, _assemble_rgb(out, np)


# ---------------------------------------------------------------------
# encoder (test support): baseline, Annex-K tables, 4:4:4 or 4:2:0
# ---------------------------------------------------------------------


def _huff_encode_table(counts, symbols):
    enc = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[idx]] = (length, code)
            code += 1
            idx += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, code):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8

    def flush(self):
        if self.n:
            byte = ((self.acc << (8 - self.n)) & 0xFF) | ((1 << (8 - self.n)) - 1)
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n = 0


def _category(v):
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def _encode_block(bw, blk, q, dc_enc, ac_enc, pred):
    import numpy as np

    C = _dct_matrix()
    f = C @ (blk - 128.0) @ C.T
    zz = np.round(f.reshape(-1)[_ZIGZAG] / np.array(q)).astype(int)
    diff = int(zz[0]) - pred
    s = _category(diff)
    bw.write(*dc_enc[s])
    if s:
        bw.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_enc[0xF0])
            run -= 16
        s = _category(v)
        bw.write(*ac_enc[(run << 4) | s])
        bw.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if run:
        bw.write(*ac_enc[0x00])
    return int(zz[0])


def encode_jpeg(width, height, rgb, subsample=False) -> bytes:
    """RGB uint8 (h*w*3 flat) → baseline JFIF bytes. ``subsample=True``
    emits 4:2:0 (exercises the decoder's upsampling path)."""
    import numpy as np

    img = np.asarray(rgb, dtype=np.float64).reshape(height, width, 3)
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    cb = -0.168736 * img[..., 0] - 0.331264 * img[..., 1] + 0.5 * img[..., 2] + 128
    cr = 0.5 * img[..., 0] - 0.418688 * img[..., 1] - 0.081312 * img[..., 2] + 128

    hs = vs = 2 if subsample else 1
    mw, mh = 8 * hs, 8 * vs
    pw, ph = -width % mw, -height % mh
    pad = lambda p: np.pad(p, ((0, ph), (0, pw)), mode="edge")  # noqa: E731
    y, cb, cr = pad(y), pad(cb), pad(cr)
    if subsample:
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))

    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, _QL), (1, _QC)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(q)
    sof = struct.pack(">HB", 17, 8) + struct.pack(">HH", height, width) + bytes([3])
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += b"\xff\xc0" + sof
    for tc, th, (counts, syms) in (
        (0, 0, _DC_L), (1, 0, _AC_L), (0, 1, _DC_C), (1, 1, _AC_C)
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + sum(counts))
        out += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]
    )
    dc_l, ac_l = _huff_encode_table(*_DC_L), _huff_encode_table(*_AC_L)
    dc_c, ac_c = _huff_encode_table(*_DC_C), _huff_encode_table(*_AC_C)
    bw = _BitWriter()
    mcux, mcuy = y.shape[1] // mw, y.shape[0] // mh
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):
                for bx in range(hs):
                    blk = y[my * mh + by * 8 : my * mh + by * 8 + 8,
                            mx * mw + bx * 8 : mx * mw + bx * 8 + 8]
                    pred[0] = _encode_block(bw, blk, _QL, dc_l, ac_l, pred[0])
            for i, p in ((1, cb), (2, cr)):
                blk = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                pred[i] = _encode_block(bw, blk, _QC, dc_c, ac_c, pred[i])
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# progressive encoder (test support): spectral selection + successive
# approximation scans with EOB-run accumulation and buffered correction
# bits (T.81 G.1.2 encoder procedures)
# ---------------------------------------------------------------------

# Generic AC huffman table covering every symbol 0x00-0xFF (EOBn codes
# 0x10..0xE0 are absent from the Annex K baseline tables): 255 symbols
# at 8 bits + 1 at 9 bits satisfies Kraft with code space to spare.
_AC_GENERIC = (
    [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)

# Default scan script: exercises every progressive scan type — DC
# first + refine (interleaved), AC first split across spectral bands,
# and two levels of AC successive-approximation refinement on luma.
# (comp indices, Ss, Se, Ah, Al)
_DEFAULT_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


def _prep_planes(width, height, rgb, subsample, np):
    img = np.asarray(rgb, dtype=np.float64).reshape(height, width, 3)
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    cb = -0.168736 * img[..., 0] - 0.331264 * img[..., 1] + 0.5 * img[..., 2] + 128
    cr = 0.5 * img[..., 0] - 0.418688 * img[..., 1] - 0.081312 * img[..., 2] + 128
    hs = vs = 2 if subsample else 1
    mw, mh = 8 * hs, 8 * vs
    pw, ph = -width % mw, -height % mh
    pad = lambda p: np.pad(p, ((0, ph), (0, pw)), mode="edge")  # noqa: E731
    y, cb, cr = pad(y), pad(cb), pad(cr)
    if subsample:
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
    return y, cb, cr, hs, vs


def _quantize_plane(plane, q, np):
    """8x8 forward DCT + quantize; returns (nby, nbx, 64) int zigzag."""
    C = _dct_matrix()
    H, W = plane.shape
    blocks = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ai,yxij,bj->yxab", C, blocks - 128.0, C)
    zz = f.reshape(H // 8, W // 8, 64)[..., _ZIGZAG]
    return np.round(zz / np.asarray(q, dtype=np.float64)).astype(np.int64)


def _flush_eobrun(bw, ac_enc, state):
    e = state["eobrun"]
    if e > 0:
        nbits = e.bit_length() - 1
        bw.write(*ac_enc[nbits << 4])
        if nbits:
            bw.write(nbits, e & ((1 << nbits) - 1))
        state["eobrun"] = 0
    for b in state["pending"]:
        bw.write(1, b)
    state["pending"] = []


def _emit_ac_first(bw, zz, ss0, se0, al, ac_enc, state):
    run = 0
    for k in range(ss0, se0 + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> al
        if t == 0:
            run += 1
            continue
        _flush_eobrun(bw, ac_enc, state)
        while run > 15:
            bw.write(*ac_enc[0xF0])
            run -= 16
        s = t.bit_length()
        bw.write(*ac_enc[(run << 4) | s])
        sv = t if v > 0 else -t
        bw.write(s, sv if sv >= 0 else sv + (1 << s) - 1)
        run = 0
    if run > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac_enc, state)


def _emit_ac_refine(bw, zz, ss0, se0, al, ac_enc, state):
    ab = []
    eob = 0
    for k in range(ss0, se0 + 1):
        v = int(zz[k])
        t = (-v if v < 0 else v) >> al
        ab.append(t)
        if t == 1:
            eob = k  # last newly-significant coefficient
    run = 0
    br = []  # correction bits since the last emitted symbol
    for k in range(ss0, se0 + 1):
        t = ab[k - ss0]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            _flush_eobrun(bw, ac_enc, state)
            bw.write(*ac_enc[0xF0])
            run -= 16
            for b in br:
                bw.write(1, b)
            br = []
        if t > 1:
            # previously significant: buffer its next magnitude bit
            br.append(t & 1)
            continue
        _flush_eobrun(bw, ac_enc, state)
        bw.write(*ac_enc[(run << 4) | 1])
        bw.write(1, 1 if int(zz[k]) > 0 else 0)
        for b in br:
            bw.write(1, b)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["pending"].extend(br)
        if state["eobrun"] == 0x7FFF or len(state["pending"]) > 937:
            _flush_eobrun(bw, ac_enc, state)


def encode_jpeg_progressive(width, height, rgb, subsample=False, scans=_DEFAULT_SCANS) -> bytes:
    """RGB uint8 (h*w*3 flat) → progressive (SOF2) JFIF bytes.

    Same quantization as the baseline encoder, so a progressive encode
    decodes to byte-identical pixels as the baseline encode of the same
    image — the cross-path invariant the roundtrip tests pin.
    """
    import numpy as np

    y, cb, cr, hs, vs = _prep_planes(width, height, rgb, subsample, np)
    coefs = [
        _quantize_plane(y, _QL, np),
        _quantize_plane(cb, _QC, np),
        _quantize_plane(cr, _QC, np),
    ]
    samp = [(hs, vs), (1, 1), (1, 1)]
    mcux, mcuy = y.shape[1] // (8 * hs), y.shape[0] // (8 * vs)

    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, _QL), (1, _QC)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(q)
    sof = struct.pack(">HB", 17, 8) + struct.pack(">HH", height, width) + bytes([3])
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += b"\xff\xc2" + sof
    for tc, th, (counts, syms) in ((0, 0, _DC_L), (1, 0, _AC_GENERIC)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + sum(counts))
        out += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    dc_enc = _huff_encode_table(*_DC_L)
    ac_enc = _huff_encode_table(*_AC_GENERIC)

    for comp_idxs, ss0, se0, ah, al in scans:
        ns = len(comp_idxs)
        sos = struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idxs:
            sos += bytes([ci + 1, 0x00])  # dc table 0, ac table 0
        sos += bytes([ss0, se0, (ah << 4) | al])
        out += b"\xff\xda" + sos
        bw = _BitWriter()
        state = {"eobrun": 0, "pending": []}
        if ss0 == 0:  # DC scan (interleaved when ns > 1)
            pred = {ci: 0 for ci in comp_idxs}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in comp_idxs:
                        ch, cv = samp[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                dc = int(coefs[ci][my * cv + by, mx * ch + bx, 0])
                                if ah == 0:
                                    val = dc >> al
                                    diff = val - pred[ci]
                                    pred[ci] = val
                                    s = _category(diff)
                                    bw.write(*dc_enc[s])
                                    if s:
                                        bw.write(
                                            s,
                                            diff if diff >= 0 else diff + (1 << s) - 1,
                                        )
                                else:
                                    bw.write(1, (dc >> al) & 1)
        else:  # AC scan: single component, raster over its block grid
            # non-interleaved block count derives from the component's
            # true dimensions (ceil(comp/8)), NOT the MCU-padded grid
            ci = comp_idxs[0]
            arr = coefs[ci]
            ch, cv = samp[ci]
            cw = -(-(width * ch) // hs)
            chh = -(-(height * cv) // vs)
            nbx, nby = -(-cw // 8), -(-chh // 8)
            for by in range(nby):
                for bx in range(nbx):
                    if ah == 0:
                        _emit_ac_first(bw, arr[by, bx], ss0, se0, al, ac_enc, state)
                    else:
                        _emit_ac_refine(bw, arr[by, bx], ss0, se0, al, ac_enc, state)
            _flush_eobrun(bw, ac_enc, state)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
