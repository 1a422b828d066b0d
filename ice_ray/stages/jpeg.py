"""JPEG (ITU-T T.81) decode — baseline sequential (SOF0/SOF1) AND
progressive (SOF2, Annex G spectral selection + successive
approximation) — plus fixture encoders for both, in pure python +
numpy.  No PIL/libjpeg.

Decoder supports: 8-bit samples, 1 or 3 components, any integer
subsampling ratio (4:4:4 / 4:2:2 / 4:2:0 ...), multiple DQT/DHT
segments (incl. between progressive scans), restart markers
(DRI/RSTn), DC/AC first + refinement scans with EOB runs and
correction bits, APPn/COM skip.  Arithmetic coding, 12-bit and
hierarchical modes return None — ``decode_jpeg``'s contract (like the
other codecs in multimodal.py) is "RGB array or None", never an
exception on malformed input.

The encoder exists so tests can prove the decoder on spec-valid streams
this repo generated end-to-end (forward DCT → quantize → zigzag →
Huffman + byte stuffing), with Annex-K-style quant tables scaled by a
quality factor, optional 4:2:0 subsampling and restart intervals.  A
JPEG round trip is lossy: tests assert bounded reconstruction error on
smooth images, exactness is impossible by design.

Scale note: this runs inside ImageFeatureExtractor actor pools
(multimodal.py) — per-payload decode is independent, so throughput
scales with the pool; the per-coefficient Python loop is the known cost
of a no-native-libs container and is documented at the stage level.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i in scan order -> position in row-major 8x8
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# 8-point DCT-II matrix: A @ x gives DCT coefficients of columns
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) / 2.0
_DCT[0] /= np.sqrt(2.0)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial + 128."""
    # x = A^T C A (separable inverse), batched
    spat = np.einsum("ki,nkl,lj->nij", _DCT, coefs, _DCT, optimize=True)
    return np.clip(np.round(spat + 128.0), 0, 255).astype(np.uint8)


def _fdct_block(block: np.ndarray) -> np.ndarray:
    """8x8 spatial (uint8) -> DCT coefficients (level-shifted)."""
    return _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T


# ------------------------------------------------------------- decoder

class _Huff:
    """Canonical Huffman table (spec F.2.2.3 mincode/maxcode/valptr)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, counts: list[int], vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = k = 0
        for l in range(1, 17):
            if counts[l - 1]:
                self.valptr[l] = k
                self.mincode[l] = code
                code += counts[l - 1]
                k += counts[l - 1]
                self.maxcode[l] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over one destuffed entropy segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise EOFError
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huffman(self, t: _Huff) -> int:
        code = self.bit()
        l = 1
        while code > t.maxcode[l]:
            l += 1
            if l > 16:
                raise ValueError("bad Huffman code")
            code = (code << 1) | self.bit()
        return t.vals[t.valptr[l] + code - t.mincode[l]]


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _entropy_segments_end(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``: destuff FF00, split on RSTn,
    stop at any other marker.  Also returns the offset of that marker
    (progressive streams parse further scans after it)."""
    segs, cur, i, n = [], bytearray(), start, len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:          # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                            # EOI / next real marker
            break
    segs.append(bytes(cur))
    return segs, i


def _entropy_segments(buf: bytes, start: int) -> list[bytes]:
    return _entropy_segments_end(buf, start)[0]


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG bytes → H×W×3 uint8 RGB, or None if the stream is
    malformed or uses an unsupported mode (progressive/arithmetic/12-bit)."""
    try:
        return _decode_jpeg(payload)
    except Exception:
        return None


def _decode_jpeg(buf: bytes) -> np.ndarray | None:
    if buf[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None                    # (H, W, comps) comps: (id, h, v, tq)
    restart = 0
    i = 2
    n = len(buf)
    while i + 4 <= n:
        if buf[i] != 0xFF:
            return None
        # spec-legal padding (B.1.1.2): a run of 0xFF fill bytes may
        # precede the marker id — skip to the last 0xFF of the run
        while i + 4 <= n and buf[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            return None
        marker = buf[i + 1]
        if marker == 0xD9:          # EOI before SOS
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        seg = buf[i + 4:i + 2 + ln]
        if marker == 0xDB:          # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    raw = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
                elif pq == 1:
                    raw = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32)
                    p += 128
                else:
                    return None
                t = np.zeros(64, np.int32)
                t[ZIGZAG] = raw
                qt[tq] = t
        elif marker in (0xC0, 0xC1):    # SOF0 / SOF1 baseline huffman
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:        # SOF2 progressive huffman
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            return _decode_progressive(buf, i + 2 + ln, (h, w, comps),
                                       qt, huff, restart)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None             # arithmetic / lossless / hierarchical
        elif marker == 0xC4:        # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nv = sum(counts)
                vals = seg[p + 17:p + 17 + nv]
                if len(vals) < nv:
                    return None
                huff[(tc, th)] = _Huff(counts, vals)
                p += 17 + nv
        elif marker == 0xDD:        # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:        # SOS → entropy data follows
            if frame is None:
                return None
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c:3 + 2 * c]
                scomps.append((cs, tda >> 4, tda & 15))
            return _decode_scan(buf, i + 2 + ln, frame, scomps, qt, huff,
                                restart)
        # APPn / COM / others: skip
        i += 2 + ln
    return None


def _decode_scan(buf, start, frame, scomps, qt, huff, restart):
    H, W, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    order = []                       # (h, v, qtab, dctab, actab) per scan comp
    for cs, td, ta in scomps:
        h, v, tq = by_id[cs]
        order.append((h, v, qt[tq].astype(np.float64),
                      huff[(0, td)], huff[(1, ta)]))
    if len(order) != len(comps):
        return None                  # multi-scan sequential not supported
    hmax = max(h for h, _, _, _, _ in order)
    vmax = max(v for _, v, _, _, _ in order)
    mcx = -(-W // (8 * hmax))
    mcy = -(-H // (8 * vmax))
    segments = _entropy_segments(buf, start)

    # coefficient store per component: (blocks_y, blocks_x) grid
    planes = [np.zeros((mcy * v * 8, mcx * h * 8), np.uint8)
              for h, v, _, _, _ in order]
    coef_lists = [[] for _ in order]         # (by, bx, coef8x8)
    preds = [0] * len(order)
    reader = _BitReader(segments[0])
    seg_i = 0
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart and mcu_count and mcu_count % restart == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    return None
                reader = _BitReader(segments[seg_i])
                preds = [0] * len(order)
            for ci, (h, v, q, dct, act) in enumerate(order):
                for by in range(v):
                    for bx in range(h):
                        coef = np.zeros(64, np.float64)
                        s = reader.huffman(dct)
                        diff = _extend(reader.receive(s), s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci] * q[0]
                        k = 0
                        while k < 63:
                            rs = reader.huffman(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break       # EOB
                                k += 16
                                continue
                            k += r + 1
                            if k > 63:
                                return None
                            z = ZIGZAG[k]
                            coef[z] = _extend(reader.receive(s), s) * q[z]
                        coef_lists[ci].append(
                            (my * v + by, mx * h + bx, coef))
            mcu_count += 1

    out_planes = []
    for ci, (h, v, _, _, _) in enumerate(order):
        items = coef_lists[ci]
        coefs = np.stack([c for _, _, c in items]).reshape(-1, 8, 8)
        spatial = _idct_blocks(coefs)
        plane = planes[ci]
        for (byy, bxx, _), blk in zip(items, spatial):
            plane[byy * 8:byy * 8 + 8, bxx * 8:bxx * 8 + 8] = blk
        # upsample to full resolution (integer replication) and crop
        ry, rx = vmax // v, hmax // h
        if ry * v != vmax or rx * h != hmax:
            return None              # non-integer ratios: out of scope
        full = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(full[:H, :W].astype(np.float64))

    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# ------------------------------------------------ progressive decoder
# Spectral selection + successive approximation per ITU-T T.81 Annex G
# (G.1.2.2 Huffman DC/AC first scans, G.1.2.3 refinement scans with EOB
# runs and correction bits).  Coefficients accumulate across scans in
# per-component quantized-integer grids; dequantize + IDCT at EOI.

def _decode_progressive(buf, pos, frame, qt, huff, restart):
    H, W, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcx = -(-W // (8 * hmax))
    mcy = -(-H // (8 * vmax))
    # MCU-padded coefficient grids (AC scans cover the non-padded
    # top-left sub-grid; padding blocks stay zero and are cropped)
    grids = {cid: np.zeros((mcy * v, mcx * h, 64), np.int32)
             for cid, h, v, _ in comps}
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    i, n = pos, len(buf)
    while i + 2 <= n:
        if buf[i] != 0xFF:
            return None
        # spec-legal padding (B.1.1.2): any run of 0xFF fill bytes may
        # precede the marker id — skip to the last 0xFF of the run
        while i + 2 <= n and buf[i + 1] == 0xFF:
            i += 1
        if i + 2 > n:
            return None
        marker = buf[i + 1]
        if marker == 0xD9:          # EOI — assemble the image
            return _finish_progressive(frame, grids, qt, hmax, vmax)
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if i + 4 > n:
            return None
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        seg = buf[i + 4:i + 2 + ln]
        if marker == 0xC4:          # DHT between scans
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nv = sum(counts)
                vals = seg[p + 17:p + 17 + nv]
                if len(vals) < nv:
                    return None
                huff[(tc, th)] = _Huff(counts, vals)
                p += 17 + nv
        elif marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq2 = seg[p] >> 4, seg[p] & 15
                p += 1
                raw = (np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                       if pq == 0 else
                       np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32))
                p += 64 if pq == 0 else 128
                t = np.zeros(64, np.int32)
                t[ZIGZAG] = raw
                qt[tq2] = t
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:        # one progressive scan
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c:3 + 2 * c]
                scomps.append((cs, tda >> 4, tda & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            end = _decode_prog_scan(buf, i + 2 + ln, frame, scomps,
                                    ss, se, ah, al, grids, by_id,
                                    huff, restart, mcx, mcy, hmax, vmax)
            if end is None:
                return None
            i = end
            continue
        i += 2 + ln
    return None


def _decode_prog_scan(buf, start, frame, scomps, ss, se, ah, al,
                      grids, by_id, huff, restart, mcx, mcy, hmax, vmax):
    """Decode ONE progressive scan into the coefficient grids; returns
    the buffer offset of the marker that ends the scan."""
    H, W, _ = frame
    segments, end = _entropy_segments_end(buf, start)
    reader = _BitReader(segments[0])
    seg_i = 0
    state = {"eobrun": 0}

    def next_segment():
        nonlocal reader, seg_i
        seg_i += 1
        if seg_i >= len(segments):
            raise ValueError("missing restart segment")
        reader = _BitReader(segments[seg_i])
        state["eobrun"] = 0

    if ss == 0:                      # DC scan (interleaved or single)
        if se != 0:
            return None
        order = [(cs, td, by_id[cs]) for cs, td, _ in scomps]
        preds = {cs: 0 for cs, _, _ in order}
        mcu_count = 0
        for my in range(mcy):
            for mx in range(mcx):
                if restart and mcu_count and mcu_count % restart == 0:
                    next_segment()
                    for cs in preds:
                        preds[cs] = 0
                for cs, td, (h, v, _) in order:
                    g = grids[cs]
                    for byy in range(v):
                        for bxx in range(h):
                            r, c = my * v + byy, mx * h + bxx
                            if ah == 0:
                                s = reader.huffman(huff[(0, td)])
                                diff = _extend(reader.receive(s), s) \
                                    if s else 0
                                preds[cs] += diff
                                g[r, c, 0] = preds[cs] << al
                            else:    # DC refinement: one bit per block
                                if reader.bit():
                                    g[r, c, 0] |= 1 << al
                mcu_count += 1
        return end

    # AC scan: single component, raster order over the COMPONENT's
    # (non-padded) block grid
    if len(scomps) != 1:
        return None
    cs, _, ta = scomps[0]
    h, v, _ = by_id[cs]
    g = grids[cs]
    cw = -(-(W * h) // hmax)        # component sample dims (A.1.1)
    ch = -(-(H * v) // vmax)
    nbx, nby = -(-cw // 8), -(-ch // 8)
    act = huff[(1, ta)]
    p1, m1 = 1 << al, -1 << al
    blk_count = 0
    for r in range(nby):
        for c in range(nbx):
            if restart and blk_count and blk_count % restart == 0:
                next_segment()
            coef = g[r, c]
            if ah == 0:              # AC first scan (G.1.2.2)
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.huffman(act)
                        rr, s = rs >> 4, rs & 15
                        if s == 0:
                            if rr < 15:
                                state["eobrun"] = (1 << rr) - 1
                                if rr:
                                    state["eobrun"] += reader.receive(rr)
                                break
                            k += 16          # ZRL
                            continue
                        k += rr
                        if k > se:
                            return None
                        coef[ZIGZAG[k]] = _extend(reader.receive(s),
                                                  s) << al
                        k += 1
            else:                    # AC refinement scan (G.1.2.3)
                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        rs = reader.huffman(act)
                        rr, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if rr < 15:
                                state["eobrun"] = (1 << rr)
                                if rr:
                                    state["eobrun"] += reader.receive(rr)
                                break
                            # rr == 15: ZRL — skip 16 zero-history slots
                        else:
                            if s != 1:
                                return None
                            val = p1 if reader.bit() else m1
                        while k <= se:
                            z = ZIGZAG[k]
                            if coef[z] != 0:
                                if reader.bit() and (coef[z] & p1) == 0:
                                    coef[z] += p1 if coef[z] > 0 else m1
                            else:
                                if rr == 0:
                                    if s:
                                        coef[z] = val
                                    k += 1
                                    break
                                rr -= 1
                            k += 1
                if state["eobrun"] > 0:
                    while k <= se:
                        z = ZIGZAG[k]
                        if coef[z] != 0:
                            if reader.bit() and (coef[z] & p1) == 0:
                                coef[z] += p1 if coef[z] > 0 else m1
                        k += 1
                    state["eobrun"] -= 1
            blk_count += 1
    return end


def _finish_progressive(frame, grids, qt, hmax, vmax):
    H, W, comps = frame
    out_planes = []
    for cid, h, v, tq in comps:
        g = grids[cid]
        q = qt[tq].astype(np.float64)
        coefs = (g.reshape(-1, 64).astype(np.float64) * q).reshape(-1, 8, 8)
        spatial = _idct_blocks(coefs)
        nby, nbx = g.shape[0], g.shape[1]
        plane = (spatial.reshape(nby, nbx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
        ry, rx = vmax // v, hmax // h
        if ry * v != vmax or rx * h != hmax:
            return None
        full = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(full[:H, :W].astype(np.float64))
    if len(out_planes) == 1:
        gpl = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.stack([gpl, gpl, gpl], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, gg, b], axis=2)), 0,
                   255).astype(np.uint8)


# ------------------------------------------------------------- encoder
# Fixture encoder: spec-valid baseline streams for round-trip tests.
# Quant tables are the Annex-K example tables scaled by quality;
# Huffman tables are fixed canonical tables (table values below form a
# valid prefix code whether or not they match Annex K bit-for-bit — the
# decoder reads them from DHT, as any decoder must).

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)

_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))

# AC value layout: runs 0-15 × sizes 1-10, plus EOB (0x00) and ZRL (0xF0).
# Short codes for the common (low-run, small-size) symbols.
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = bytes([
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
    0xF9, 0xFA])
assert sum(_AC_COUNTS) == len(_AC_VALS)


def _enc_table(counts: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """(counts, vals) -> {symbol: (code, length)} canonical assignment."""
    table, code, k = {}, 0, 0
    for l in range(1, 17):
        for _ in range(counts[l - 1]):
            table[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, bit pattern) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return (s, v) if v > 0 else (s, v + (1 << s) - 1)


def _encode_block(w: _BitWriter, coef: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    zz = coef[ZIGZAG]
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    c, l = dc_tab[s]
    w.write(c, l)
    if s:
        w.write(bits, s)
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]
            w.write(c, l)
            run -= 16
        s, bits = _magnitude(v)
        c, l = ac_tab[(run << 4) | s]
        w.write(c, l)
        w.write(bits, s)
        run = 0
    if last < 63:
        c, l = ac_tab[0x00]
        w.write(c, l)
    return dc


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _comp_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """pad plane to 8-multiples (edge replicate) -> (blocks, by, bx)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    return blocks, by, bx


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: tuple[int, int] = (1, 1),
                restart_interval: int = 0) -> bytes:
    """H×W×3 uint8 RGB → baseline JFIF bytes.  ``subsampling`` is the
    luma sampling factor pair — (1, 1) = 4:4:4, (2, 2) = 4:2:0 (chroma
    averaged 2×2).  ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img, dtype=np.uint8)
    H, W = img.shape[:2]
    sh, sv = subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsampling factors must be 1 or 2")

    rgb = img.astype(np.float64)
    y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
        + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
        - 0.081312 * rgb[:, :, 2]

    if (sh, sv) != (1, 1):
        # pad to even then average sv×sh windows
        ph, pw = -(-H // sv) * sv, -(-W // sh) * sh
        def down(p):
            pp = np.pad(p, ((0, ph - H), (0, pw - W)), mode="edge")
            return pp.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        cb, cr = down(cb), down(cr)

    qt_l = _scaled_qt(_QT_LUM, quality)
    qt_c = _scaled_qt(_QT_CHROM, quality)
    dc_tab = _enc_table(_DC_COUNTS, _DC_VALS)
    ac_tab = _enc_table(_AC_COUNTS, _AC_VALS)

    # quantized blocks per component, in (block_row, block_col) grids
    def quantize(plane, qt):
        blocks, by, bx = _comp_blocks(plane)
        qcoef = np.empty((by, bx, 64), np.int32)
        for r in range(by):
            for c in range(bx):
                coefs = _DCT @ (blocks[r, c] - 128.0) @ _DCT.T
                qcoef[r, c] = np.round(coefs.reshape(64) / qt).astype(np.int32)
        return qcoef

    qy = quantize(y, qt_l.astype(np.float64).reshape(8, 8).ravel())
    qcb = quantize(cb, qt_c.astype(np.float64).reshape(8, 8).ravel())
    qcr = quantize(cr, qt_c.astype(np.float64).reshape(8, 8).ravel())

    mcx = -(-W // (8 * sh))
    mcy = -(-H // (8 * sv))

    def grid_get(q, r, c):
        r = min(r, q.shape[0] - 1)
        c = min(c, q.shape[1] - 1)
        return q[r, c]

    w = _BitWriter()
    entropy_parts: list[bytes] = []
    preds = [0, 0, 0]
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                w.flush()
                entropy_parts.append(bytes(w.out))
                w = _BitWriter()
                preds = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    blk = grid_get(qy, my * sv + by, mx * sh + bx)
                    preds[0] = _encode_block(w, blk, preds[0], dc_tab, ac_tab)
            preds[1] = _encode_block(w, grid_get(qcb, my, mx), preds[1],
                                     dc_tab, ac_tab)
            preds[2] = _encode_block(w, grid_get(qcr, my, mx), preds[2],
                                     dc_tab, ac_tab)
            mcu_count += 1
    w.flush()
    entropy_parts.append(bytes(w.out))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = qt_l.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    zz_c = qt_c.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xDB, b"\x00" + zz_l + b"\x01" + zz_c)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, H, W, 3)
    sof += bytes([1, (sh << 4) | sv, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    # DHT: same tables for luma and chroma (classes 0 and 1, ids 0)
    dht = b"\x00" + bytes(_DC_COUNTS) + _DC_VALS
    dht += b"\x10" + bytes(_AC_COUNTS) + _AC_VALS
    out += seg(0xC4, dht)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += seg(0xDA, sos)
    for k, part in enumerate(entropy_parts):
        out += part
        if k < len(entropy_parts) - 1:
            out += bytes([0xFF, 0xD0 + (k % 8)])
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------- progressive fixture encoder
# Spec-valid SOF2 streams exercising every progressive decode path: a
# successive-approximation DC scan + DC refinement, per-component AC
# spectral bands at Al=1, and AC refinement scans with EOB runs and
# buffered correction bits (T.81 G.1.2.2/G.1.2.3).

# progressive AC table: ALL 176 symbols ((run,size) pairs, EOB0, EOBn
# n=1..14, ZRL) at a flat 9 bits — fixtures favor spec coverage over
# compression (the baseline table has no room for the EOBn codes)
_PROG_AC_VALS = bytes(
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
    + [(r << 4) for r in range(1, 15)])
_PROG_AC_COUNTS = [0] * 8 + [len(_PROG_AC_VALS)] + [0] * 7
assert len(_PROG_AC_VALS) == 176


class _ProgAC:
    """AC-scan writer state: EOB-run accumulation + correction-bit
    buffering (bits flush after the next emitted symbol, EOB included)."""

    def __init__(self, w: _BitWriter, ac_tab):
        self.w = w
        self.ac = ac_tab
        self.eobrun = 0
        self.bits: list[int] = []

    def _flush_bits(self):
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []

    def emit_eobrun(self):
        if self.eobrun == 0:
            return
        nbits = self.eobrun.bit_length() - 1
        c, l = self.ac[nbits << 4]
        self.w.write(c, l)
        if nbits:
            self.w.write(self.eobrun - (1 << nbits), nbits)
        self._flush_bits()
        self.eobrun = 0

    def symbol(self, sym: int, extra: int = 0, nbits: int = 0):
        self.emit_eobrun()
        c, l = self.ac[sym]
        self.w.write(c, l)
        if nbits:
            self.w.write(extra, nbits)
        self._flush_bits()

    def end_block_eob(self):
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.emit_eobrun()


def _ac_first_block(pw: _ProgAC, zz: np.ndarray, ss: int, se: int, al: int):
    band = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        band.append((abs(v) >> al) * (1 if v > 0 else -1))
    nz = [i for i, v in enumerate(band) if v]
    if not nz:
        pw.end_block_eob()
        return
    run = 0
    for i in range(nz[-1] + 1):
        v = band[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            pw.symbol(0xF0)
            run -= 16
        s, bits = _magnitude(v)
        pw.symbol((run << 4) | s, bits, s)
        run = 0
    if nz[-1] < len(band) - 1:
        pw.end_block_eob()


def _ac_refine_block(pw: _ProgAC, zz: np.ndarray, ss: int, se: int, al: int):
    """Mirror of the decoder's G.1.2.3 crossing: correction bits of
    nonzero-history coefficients are interleaved INTO each symbol's
    crossing window (a ZRL flushes only the bits within its own 16-zero
    span); trailing positions ride the EOB run's buffered bits."""
    kinds: list[tuple] = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if (abs(v) >> (al + 1)) != 0:
            kinds.append(("h", a & 1))          # nonzero history
        elif a == 1:
            kinds.append(("n", 1 if v > 0 else 0))  # newly nonzero
        else:
            kinds.append(("z",))                 # zero-history zero
    new_pos = [i for i, t in enumerate(kinds) if t[0] == "n"]
    if not new_pos:
        pw.bits.extend(t[1] for t in kinds if t[0] == "h")
        pw.end_block_eob()
        return
    pos = 0
    for j in new_pos:
        window = kinds[pos:j]
        r = sum(1 for t in window if t[0] == "z")
        wi = 0
        while r > 15:
            pw.symbol(0xF0)                      # flushes EOB-run bits too
            zc = 0
            while wi < len(window) and zc < 16:
                if window[wi][0] == "z":
                    zc += 1
                else:
                    pw.w.write(window[wi][1], 1)
                wi += 1
            r -= 16
        pw.symbol((r << 4) | 1, kinds[j][1], 1)
        while wi < len(window):
            if window[wi][0] == "h":
                pw.w.write(window[wi][1], 1)
            wi += 1
        pos = j + 1
    tail = kinds[new_pos[-1] + 1:]
    if tail:
        pw.bits.extend(t[1] for t in tail if t[0] == "h")
        pw.end_block_eob()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsampling: tuple[int, int] = (1, 1)) -> bytes:
    """H×W×3 uint8 RGB → progressive (SOF2) JFIF bytes.  Same
    quantization as ``encode_jpeg``, so a progressive round-trip decodes
    to EXACTLY the baseline round-trip's pixels (asserted in tests)."""
    img = np.asarray(img, dtype=np.uint8)
    H, W = img.shape[:2]
    sh, sv = subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsampling factors must be 1 or 2")

    rgb = img.astype(np.float64)
    y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
        + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
        - 0.081312 * rgb[:, :, 2]
    if (sh, sv) != (1, 1):
        ph, pw_ = -(-H // sv) * sv, -(-W // sh) * sh

        def down(p):
            pp = np.pad(p, ((0, ph - H), (0, pw_ - W)), mode="edge")
            return pp.reshape(ph // sv, sv, pw_ // sh, sh).mean(axis=(1, 3))
        cb, cr = down(cb), down(cr)

    qt_l = _scaled_qt(_QT_LUM, quality)
    qt_c = _scaled_qt(_QT_CHROM, quality)
    dc_tab = _enc_table(_DC_COUNTS, _DC_VALS)
    ac_tab = _enc_table(_PROG_AC_COUNTS, _PROG_AC_VALS)

    def quantize(plane, qt):
        blocks, by, bx = _comp_blocks(plane)
        qcoef = np.empty((by, bx, 64), np.int32)
        for r in range(by):
            for c in range(bx):
                coefs = _DCT @ (blocks[r, c] - 128.0) @ _DCT.T
                qcoef[r, c] = np.round(coefs.reshape(64) / qt).astype(np.int32)
        return qcoef

    qy = quantize(y, qt_l.astype(np.float64).reshape(8, 8).ravel())
    qcb = quantize(cb, qt_c.astype(np.float64).reshape(8, 8).ravel())
    qcr = quantize(cr, qt_c.astype(np.float64).reshape(8, 8).ravel())
    grids = {1: (qy, sh, sv), 2: (qcb, 1, 1), 3: (qcr, 1, 1)}
    mcx = -(-W // (8 * sh))
    mcy = -(-H // (8 * sv))

    def grid_get(q, r, c):
        return q[min(r, q.shape[0] - 1), min(c, q.shape[1] - 1)]

    def dc_scan(cids, ah, al) -> bytes:
        w = _BitWriter()
        preds = {cid: 0 for cid in cids}
        for my in range(mcy):
            for mx in range(mcx):
                for cid in cids:
                    q, h, v = grids[cid]
                    for byy in range(v):
                        for bxx in range(h):
                            dc = int(grid_get(q, my * v + byy,
                                              mx * h + bxx)[0])
                            if ah == 0:
                                val = dc >> al
                                s, bits = _magnitude(val - preds[cid])
                                c, l = dc_tab[s]
                                w.write(c, l)
                                if s:
                                    w.write(bits, s)
                                preds[cid] = val
                            else:
                                w.write((dc >> al) & 1, 1)
        w.flush()
        return bytes(w.out)

    def ac_scan(cid, ss, se, ah, al) -> bytes:
        w = _BitWriter()
        pw = _ProgAC(w, ac_tab)
        q, _, _ = grids[cid]
        for r in range(q.shape[0]):
            for c in range(q.shape[1]):
                zz = q[r, c][ZIGZAG]
                if ah == 0:
                    _ac_first_block(pw, zz, ss, se, al)
                else:
                    _ac_refine_block(pw, zz, ss, se, al)
        pw.emit_eobrun()
        w.flush()
        return bytes(w.out)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(scomps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(scomps)])
        for cid, td, ta in scomps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = qt_l.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    zz_c = qt_c.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xDB, b"\x00" + zz_l + b"\x01" + zz_c)
    sof = struct.pack(">BHHB", 8, H, W, 3)
    sof += bytes([1, (sh << 4) | sv, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC2, sof)                        # SOF2: progressive
    dht = b"\x00" + bytes(_DC_COUNTS) + _DC_VALS
    dht += b"\x10" + bytes(_PROG_AC_COUNTS) + _PROG_AC_VALS
    out += seg(0xC4, dht)
    # scan script: DC SA first+refine, per-comp AC bands at Al=1,
    # then AC refinement to Al=0
    out += sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1)
    out += dc_scan([1, 2, 3], 0, 1)
    out += sos([(1, 0, 0)], 1, 5, 0, 1)
    out += ac_scan(1, 1, 5, 0, 1)
    out += sos([(2, 0, 0)], 1, 63, 0, 1)
    out += ac_scan(2, 1, 63, 0, 1)
    out += sos([(3, 0, 0)], 1, 63, 0, 1)
    out += ac_scan(3, 1, 63, 0, 1)
    out += sos([(1, 0, 0)], 6, 63, 0, 1)
    out += ac_scan(1, 6, 63, 0, 1)
    out += sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0)
    out += dc_scan([1, 2, 3], 1, 0)
    out += sos([(1, 0, 0)], 1, 63, 1, 0)
    out += ac_scan(1, 1, 63, 1, 0)
    out += sos([(2, 0, 0)], 1, 63, 1, 0)
    out += ac_scan(2, 1, 63, 1, 0)
    out += sos([(3, 0, 0)], 1, 63, 1, 0)
    out += ac_scan(3, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
