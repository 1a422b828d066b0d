"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The image path is REAL for PPM (P6), 24-bit uncompressed BMP, 8-bit
non-interlaced PNG (stdlib zlib inflate + scanline unfiltering, filters
0–4), GIF87a/89a (pure-python variable-width LZW, interlace supported),
baseline JPEG (SOF0/SOF1 Huffman + numpy IDCT) AND progressive JPEG
(SOF2 spectral selection + successive approximation — see
``stages/jpeg.py``); the audio path is REAL for RIFF/WAVE PCM
(8/16/32-bit int and float32, any channel count → mono) with numpy
spectral band-energy features; the video path is REAL for MJPEG-in-AVI
(RIFF container parse + per-frame JPEG decode, ``parse_avi_mjpeg``) —
decode → resize/featurize → frame-sample → dedup/similarity runs
end-to-end on actual pixels/samples with no external libraries.
Compressed audio (mp3/ogg/aac) and non-MJPEG video codecs (H.264, …)
need ffmpeg, which is not in this container: those payloads fall back
to deterministic digest-seeded fake features (``mode="fake"``), or
raise with ``mode="strict"`` to mark the boundary explicitly.

Batch-size guidance (SURVEY §7 'wide rows'): with payloads of ~1 MB keep
``batch_size`` ≤ 64 so batch × concurrency stays inside a worker heap.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),          # images/video, else -1
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),    # audio/video, else -1
])

FEATURE_DIM = 64


# ---------------------------------------------------------------- codecs

def decode_image(payload: bytes) -> np.ndarray | None:
    """binary → H×W×3 uint8 RGB, or None if the format needs external
    libraries.  Pure numpy: PPM "P6" and 24-bit uncompressed BMP."""
    if not payload:
        return None
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
    return None


def _decode_ppm(payload: bytes) -> np.ndarray | None:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    # Truncated/malformed headers (b"P6", comment-only, non-digit fields)
    # return None — decode_image's contract — instead of raising.
    pos, fields = 2, []
    try:
        while len(fields) < 3:
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if pos >= len(payload):
                return None  # header truncated
            if payload[pos:pos + 1] == b"#":            # comment line
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
    except ValueError:
        return None  # non-numeric header field
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    need = w * h * 3
    raster = payload[pos:pos + need]
    if len(raster) < need:
        return None
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """H×W×3 uint8 → PPM P6 payload (the test/fixture encoder)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray | None:
    if len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", payload, 14)[:3]
    # re-read height as signed (top-down bitmaps are negative)
    h = struct.unpack_from("<i", payload, 22)[0]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or hdr_size < 40:
        return None  # compressed / paletted BMP → external libs
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        return None  # malformed dimensions (negative/zero width)
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raster = payload[data_off:data_off + need]
    if len(raster) < need:
        return None
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → 24-bit uncompressed BMP (bottom-up)."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = raster.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0–4).  Row-sequential by
    spec; per-row work is numpy except Sub/Paeth's pixel recurrence."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype, line = int(rows[y, 0]), rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:      # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:      # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:      # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:      # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y) else 0
                p = a + b - c
                pa_, pb, pcb = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pcb) else (b if pb <= pcb else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError("bad PNG filter type")
        out[y] = cur.astype(np.uint8)
    return out


def _decode_png(payload: bytes) -> np.ndarray | None:
    """Pure-python PNG decode (stdlib zlib inflate + scanline
    unfiltering) → H×W×3 uint8 RGB.  Supports 8-bit greyscale / RGB /
    RGBA, non-interlaced — the common fixture shapes; anything else
    (16-bit, palette, interlaced, malformed) returns None."""
    import zlib

    try:
        pos, idat, ihdr = 8, [], None
        while pos + 8 <= len(payload):
            length, ctype = struct.unpack_from(">I4s", payload, pos)
            data = payload[pos + 8:pos + 8 + length]
            if len(data) < length:
                return None
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data[:13])
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if ihdr is None or not idat:
            return None
        w, h, depth, color, comp, filt, interlace = ihdr
        ch = _PNG_CHANNELS.get(color)
        if (depth != 8 or ch is None or comp != 0 or filt != 0
                or interlace != 0 or w <= 0 or h <= 0):
            return None
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
        stride = w * ch
        if raw.size != h * (stride + 1):
            return None
        px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
        if ch == 1:
            return np.repeat(px, 3, axis=2)
        return px[:, :, :3].copy()
    except (zlib.error, ValueError, struct.error):
        return None


def encode_png(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → PNG (8-bit RGB, filter 0, one IDAT) — the
    fixture encoder proving the decode path round-trips real pixels."""
    import zlib

    h, w = img.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = np.concatenate(
        [np.zeros((h, 1), np.uint8),
         img.astype(np.uint8).reshape(h, w * 3)], axis=1).tobytes()
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster))
            + chunk(b"IEND", b""))


# ----------------------------------------------------------------- GIF
# GIF87a/89a first frame, pure python: logical-screen + image-descriptor
# parse, variable-width LSB-first LZW (GIF89a spec appendix F), palette
# lookup, optional interlace. Reference boundary this replaces: the
# "compressed formats need PIL" stub — GIF needs only integer LZW.

_GIF_MAX_CODE = 4096  # 12-bit LZW code space


def _lzw_decode(data: bytes, min_code: int, npix: int) -> bytearray | None:
    """GIF LZW → palette indices.  Spec width rule: width grows right
    after the table reaches 2**width entries (capped at 12 bits)."""
    if not 2 <= min_code <= 11:
        return None
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width, bitpos, nbits = min_code + 1, 0, len(data) * 8
    out, prev = bytearray(), None
    while bitpos + width <= nbits and len(out) < npix:
        byte = bitpos >> 3
        code = (int.from_bytes(data[byte:byte + 3], "little")
                >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width, prev = min_code + 1, None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            return None                      # corrupt stream
        out += entry
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out if len(out) >= npix else None


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _decode_gif(payload: bytes) -> np.ndarray | None:
    """First frame of a GIF87a/89a → H×W×3 uint8 RGB (frame rendered at
    its own size; animation composition is out of scope)."""
    try:
        w, h = struct.unpack_from("<HH", payload, 6)
        packed = payload[10]
        pos, gct = 13, None
        if packed & 0x80:
            n = 2 << (packed & 7)
            gct = np.frombuffer(payload[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3)
            pos += 3 * n
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:                   # trailer
                return None
            if b0 == 0x21:                   # extension: label + sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:                 # image descriptor
                iw, ih = struct.unpack_from("<HH", payload, pos + 5)
                ipacked = payload[pos + 9]
                pos += 10
                ct = gct
                if ipacked & 0x80:           # local color table
                    n = 2 << (ipacked & 7)
                    ct = np.frombuffer(payload[pos:pos + 3 * n],
                                       np.uint8).reshape(n, 3)
                    pos += 3 * n
                min_code = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    data += payload[pos + 1:pos + 1 + ln]
                    pos += 1 + ln
                if ct is None or iw <= 0 or ih <= 0:
                    return None
                idx = _lzw_decode(bytes(data), min_code, iw * ih)
                if idx is None:
                    return None
                ind = np.frombuffer(bytes(idx[:iw * ih]), np.uint8)
                if ind.max(initial=0) >= len(ct):
                    return None
                img = ct[ind].reshape(ih, iw, 3)
                if ipacked & 0x40:
                    img = _deinterlace(img)
                return img.copy()
            else:
                return None
    except (struct.error, IndexError, ValueError):
        return None
    return None


def encode_gif(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB (≤256 distinct colors) → single-frame GIF89a —
    the fixture encoder: a REAL LZW compressor that simulates the
    decoder's width/table schedule so the variable-width bitstream stays
    in sync (entry n is created encoder-side at emission n and learned
    decoder-side at emission n+1)."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("fixture encoder requires <=256 distinct colors")
    pbits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    psize = 1 << pbits
    pal = np.zeros((psize, 3), np.uint8)
    pal[:len(palette)] = palette

    min_code = pbits
    clear, end = 1 << min_code, (1 << min_code) + 1
    bits = bytearray()
    acc = pos = 0

    state = {"width": min_code + 1, "n": end + 1, "seen": False}

    def put(code: int) -> None:
        nonlocal acc, pos
        acc |= code << pos
        pos += state["width"]
        while pos >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            pos -= 8

    def emit_data(code: int) -> None:
        put(code)
        # decoder-side table growth happens while PROCESSING this code
        # (before reading the next), except for the first code after clear
        if state["seen"]:
            state["n"] += 1
            if state["n"] == (1 << state["width"]) and state["width"] < 12:
                state["width"] += 1
        else:
            state["seen"] = True

    def emit_clear() -> None:
        put(clear)
        state.update(width=min_code + 1, n=end + 1, seen=False)

    emit_clear()
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    prev = b""
    for i in inverse.astype(np.uint8).tobytes():
        cur = prev + bytes([i])
        if cur in table:
            prev = cur
            continue
        emit_data(table[prev])
        if next_code < _GIF_MAX_CODE - 2:
            table[cur] = next_code
            next_code += 1
        else:                                # table nearly full: reset both
            emit_clear()
            table = {bytes([k]): k for k in range(clear)}
            next_code = end + 1
        prev = bytes([i])
    if prev:
        emit_data(table[prev])
    put(end)
    if pos:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pbits - 1) << 4)
                       | (pbits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    for k in range(0, len(bits), 255):
        sub = bits[k:k + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00\x3B"
    return bytes(out)


# ---------------------------------------------------------------- audio

def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry µ-law / A-law → float32 lookup tables (ITU-T G.711
    expansion formulas; pure computation, no audioop)."""
    codes = np.arange(256, dtype=np.int32)
    # µ-law: invert bits, split sign/exponent/mantissa, expand with bias
    u = ~codes & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    ulaw = np.where(sign, -mag, mag).astype(np.float32) / 32768.0
    # A-law: even bits inverted, segments 0-7
    a = codes ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    # A-law sign convention: MSB SET means positive (opposite of µ-law's
    # complemented code)
    alaw = np.where(sign, mag, -mag).astype(np.float32) / 32768.0
    return alaw, ulaw


_ALAW_TABLE, _ULAW_TABLE = _g711_tables()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int] | None:
    """binary → (mono float32 samples in [-1, 1], sample_rate), or None
    for non-WAV / compressed / malformed payloads.  Pure stdlib+numpy
    RIFF/WAVE parse: PCM 8-bit unsigned, 16/32-bit signed, IEEE
    float32, and G.711 A-law/µ-law (format tags 6/7, table expansion);
    multi-channel is averaged to mono."""
    if (not payload or len(payload) < 44 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        return None
    pos, fmt, data = 12, None, None
    try:
        while pos + 8 <= len(payload):
            cid, clen = struct.unpack_from("<4sI", payload, pos)
            body = payload[pos + 8:pos + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, channels, rate, _, _, bits = fmt
        if channels < 1 or rate <= 0:
            return None
        if audio_format == 1 and bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        elif audio_format == 1 and bits == 16:
            x = np.frombuffer(data[:len(data) & ~1],
                              dtype="<i2").astype(np.float32) / 32768.0
        elif audio_format == 1 and bits == 32:
            x = np.frombuffer(data[:len(data) & ~3],
                              dtype="<i4").astype(np.float32) / 2147483648.0
        elif audio_format == 3 and bits == 32:
            x = np.frombuffer(data[:len(data) & ~3],
                              dtype="<f4").astype(np.float32)
        elif audio_format == 6 and bits == 8:    # G.711 A-law
            x = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
        elif audio_format == 7 and bits == 8:    # G.711 µ-law
            x = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
        else:
            return None  # compressed (mp3/ogg inside RIFF) / exotic widths
        n = (len(x) // channels) * channels
        if n == 0:
            return None
        mono = x[:n].reshape(-1, channels).mean(axis=1).astype(np.float32)
        return mono, int(rate)
    except (struct.error, ValueError):
        return None


def encode_wav(samples: np.ndarray, rate: int = 16000,
               channels: int = 1) -> bytes:
    """mono/stereo float array in [-1, 1] → 16-bit PCM WAV (the
    test/fixture encoder proving the decode path round-trips)."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   rate * channels * 2, channels * 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def audio_features(samples: np.ndarray, rate: int,
                   dim: int = FEATURE_DIM) -> np.ndarray:
    """``dim`` log band-energies of the power spectrum (numpy rFFT,
    equal-width bands over 0..Nyquist), mean-centered — a deterministic
    spectral fingerprint: identical audio → identical features, a pure
    tone lands its energy in band ``int(freq/(rate/2)·dim)``."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size < 2:
        x = np.zeros(2)
    spec = np.abs(np.fft.rfft(x)) ** 2
    edges = np.linspace(0, len(spec), dim + 1).astype(int)
    bands = np.array([spec[a:b].sum() if b > a else 0.0
                      for a, b in zip(edges[:-1], edges[1:])])
    e = np.log10(bands + 1e-12)
    return (e - e.mean()).astype(np.float32)


class AudioFeatureExtractor:
    """binary audio payloads → spectral feature vectors.  WAV/PCM
    payloads are DECODED (real samples); compressed formats follow
    ``mode``: "fake" (digest-seeded vector) or "strict"
    (NotImplementedError — the ffmpeg boundary made explicit).  Emits
    the measured duration for decoded rows (−1 otherwise)."""

    def __init__(self, dim: int = FEATURE_DIM, mode: str = "fake"):
        self.dim = dim
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, decoded_flags, durs = [], [], []
        for p in batch.column("payload").to_pylist():
            dec = decode_audio(p)
            if dec is not None:
                samples, rate = dec
                feats.append(audio_features(samples, rate, self.dim).tolist())
                decoded_flags.append(True)
                durs.append(int(len(samples) * 1000 / rate))
            elif self.mode == "strict":
                raise NotImplementedError(
                    "compressed audio decode requires ffmpeg; "
                    "only RIFF/WAVE PCM decodes in this container")
            else:
                feats.append(_fake_features(p, self.dim).tolist())
                decoded_flags.append(False)
                durs.append(-1)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "embedding": pa.array(feats, pa.list_(pa.float32())),
            "decoded": pa.array(decoded_flags, pa.bool_()),
            "duration_ms": pa.array(durs, pa.int32()),
        })


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via index arrays (vectorized)."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return img[yi][:, xi]


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """8×8 luminance-grid embedding (dim=64): resize to the grid, take
    mean-centered luminance — the classic average-hash feature family;
    identical pixels → identical features, near-identical → cosine ≈ 1."""
    side = int(np.sqrt(dim))
    g = resize_nearest(img, side, side).astype(np.float64)
    lum = g @ np.array([0.299, 0.587, 0.114])
    flat = lum.reshape(-1)[:dim]
    return (flat - flat.mean()).astype(np.float32)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector derived from the payload
    digest (stable across processes — usable in tests and dedup)."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rs = np.random.RandomState(seed)
    return rs.normal(size=dim).astype(np.float32)


# ---------------------------------------------------------------- stages

class ImageFeatureExtractor:
    """binary image payloads → feature vectors (+ passthrough metadata).

    PPM/BMP payloads are DECODED and embedded from real pixels; other
    formats follow ``mode``: "fake" (digest-seeded vector), or "strict"
    (NotImplementedError — the PIL/torch boundary made explicit)."""

    def __init__(self, dim: int = FEATURE_DIM, mode: str = "fake",
                 strict: bool | None = None):
        self.dim = dim
        self.mode = "strict" if strict else mode  # back-compat kwarg

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, decoded_flags = [], []
        for p in batch.column("payload").to_pylist():
            img = decode_image(p)
            if img is not None:
                feats.append(image_features(img, self.dim).tolist())
                decoded_flags.append(True)
            elif self.mode == "strict":
                raise NotImplementedError(
                    "undecodable image payload; PPM/BMP/PNG/GIF/baseline-JPEG "
                    "decode here — other formats require PIL/torch")
            else:
                feats.append(_fake_features(p, self.dim).tolist())
                decoded_flags.append(False)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "embedding": pa.array(feats, pa.list_(pa.float32())),
            "decoded": pa.array(decoded_flags, pa.bool_()),
        })


class ImageResizer:
    """Decode → nearest-neighbor resize → re-encode (PPM out) for
    decodable payloads; metadata rewritten either way.  ``mode`` as in
    ImageFeatureExtractor."""

    def __init__(self, width: int, height: int, mode: str = "fake",
                 strict: bool | None = None):
        self.width, self.height = width, height
        self.mode = "strict" if strict else mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for p in batch.column("payload").to_pylist():
            img = decode_image(p)
            if img is not None:
                payloads.append(
                    encode_ppm(resize_nearest(img, self.width, self.height)))
            elif self.mode == "strict":
                raise NotImplementedError("compressed image resize requires PIL")
            else:
                payloads.append(p)
        ip = batch.schema.get_field_index("payload")
        iw = batch.schema.get_field_index("width")
        ih = batch.schema.get_field_index("height")
        n = batch.num_rows
        return (batch
                .set_column(ip, "payload", pa.array(payloads, pa.binary()))
                .set_column(iw, "width", pa.array([self.width] * n, pa.int32()))
                .set_column(ih, "height", pa.array([self.height] * n, pa.int32())))


class FrameSampler:
    """Video → sampled frame rows (1 row per sampled frame): flat_map
    shape done batch-wise.  MJPEG-in-AVI payloads emit REAL frames —
    the per-frame JPEG bytes at each sample time, decodable by
    ``decode_jpeg`` (pure RIFF parsing, see ``parse_avi_mjpeg``) with
    timing from the container.  Other containers/codecs (mp4/H.264, …)
    keep the documented stub boundary: frame payloads are slices of the
    source payload and ``strict=True`` raises — real decode of those
    needs ffmpeg, absent from this container image."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms = every_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, frame_idx, ts_ms, payloads = [], [], [], []
        for mid, kind, payload, dur in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist(),
                batch.column("duration_ms").to_pylist()):
            if kind != "video":
                continue
            avi = parse_avi_mjpeg(payload or b"")
            if avi is not None:
                frame_ms = avi["usec_per_frame"] / 1000.0
                total_ms = int(len(avi["frames"]) * frame_ms)
                for k, t in enumerate(range(0, total_ms, self.every_ms)):
                    j = min(int(t / frame_ms), len(avi["frames"]) - 1)
                    mids.append(mid)
                    frame_idx.append(k)
                    ts_ms.append(t)
                    payloads.append(avi["frames"][j])
                continue
            if self.strict:
                raise NotImplementedError(
                    "non-MJPEG video decode requires ffmpeg")
            if dur is None or dur <= 0:
                continue
            for k, t in enumerate(range(0, dur, self.every_ms)):
                mids.append(mid)
                frame_idx.append(k)
                ts_ms.append(t)
                payloads.append((payload or b"")[:64])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "ts_ms": pa.array(ts_ms, pa.int32()),
            "frame": pa.array(payloads, pa.binary()),
        })


def media_feature_pipeline(media_ds, batch_size: int = 32, concurrency=(1, 4)):
    """media table → embeddings, with the small-batch sizing wide binary
    rows require."""
    return media_ds.map_batches(ImageFeatureExtractor,
                                batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)


# --- MJPEG-in-AVI video (pure RIFF parsing + the repo's JPEG decoder) -------
# A real video path with no ffmpeg: Motion-JPEG frames in an AVI RIFF
# container.  ``encode_avi_mjpeg`` writes spec-valid fixtures;
# ``parse_avi_mjpeg`` extracts the per-frame JPEG payloads + timing, and
# FrameSampler emits REAL decodable frames for such payloads (other
# codecs keep the documented stub/strict boundary).

def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 88) -> bytes:
    """list of H×W×3 uint8 RGB frames → MJPEG AVI bytes."""
    import struct as _st

    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fcc + _st.pack("<I", len(body)) + body + pad

    def lst(fcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fcc + body)

    uspf = 1_000_000 // fps
    avih = _st.pack("<14I", uspf, 0, 0, 0x10, len(jpegs), 0, 1, 0,
                    w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + _st.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                         1, fps, 0, len(jpegs), 0, 0, 0)
            + _st.pack("<4H", 0, 0, w, h))
    strf = _st.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                    w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + _st.pack("<I", len(riff_body)) + riff_body


def parse_avi_mjpeg(payload: bytes) -> dict | None:
    """MJPEG AVI bytes → {"frames": [jpeg bytes], "usec_per_frame": int,
    "width": int, "height": int}; None when the payload is not a
    parseable MJPEG AVI (other containers/codecs stay stubs)."""
    import struct as _st

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        uspf = None
        width = height = -1
        frames: list[bytes] = []

        def walk(start: int, end: int):
            nonlocal uspf, width, height
            i = start
            while i + 8 <= end:
                fcc = payload[i:i + 4]
                (ln,) = _st.unpack_from("<I", payload, i + 4)
                body_start = i + 8
                body_end = min(body_start + ln, end)
                if fcc == b"LIST":
                    walk(body_start + 4, body_end)
                elif fcc == b"avih" and ln >= 40:
                    vals = _st.unpack_from("<10I", payload, body_start)
                    uspf = vals[0] or None
                    width, height = vals[8], vals[9]
                elif fcc[2:4] in (b"dc", b"db") and fcc[:2].isdigit():
                    frames.append(payload[body_start:body_end])
                i = body_end + (ln & 1)
        walk(12, 8 + _st.unpack_from("<I", payload, 4)[0])
        if not frames or not uspf:
            return None
        # MJPEG frames must start with SOI
        if not all(f[:2] == b"\xff\xd8" for f in frames):
            return None
        return {"frames": frames, "usec_per_frame": int(uspf),
                "width": int(width), "height": int(height)}
    except Exception:
        return None
