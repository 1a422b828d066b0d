"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The image path is REAL for uncompressed formats — a pure-numpy decoder
for PPM (P6) and 24-bit uncompressed BMP, nearest-neighbor resize, and
an 8×8 luminance-grid feature embedding — so decode → resize → embed →
dedup/similarity runs end-to-end on actual pixels with no external
libraries.  Compressed formats (JPEG/PNG) and audio/video decoding need
PIL/ffmpeg, which are not in this container: those payloads fall back to
deterministic digest-seeded fake features (``mode="fake"``), or raise
with ``mode="strict"`` to mark the boundary explicitly.

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
    return None


def _decode_ppm(payload: bytes) -> np.ndarray | None:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":            # comment line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
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
                    "compressed image decode requires PIL/torch; "
                    "only PPM/BMP decode in this container")
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
    shape done batch-wise.  Frame payloads are stub slices of the source
    payload (video decode needs ffmpeg); the explode geometry, ordering
    and schema are real."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms = every_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video decode requires ffmpeg")
        mids, frame_idx, ts_ms, payloads = [], [], [], []
        for mid, kind, payload, dur in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist(),
                batch.column("duration_ms").to_pylist()):
            if kind != "video" or dur is None or dur <= 0:
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
