"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels are STUBS by design — the image/audio libraries are not
in this container.  The Ray-side plumbing is real and tested: schemas,
small-batch sizing for wide binary rows, actor signatures, deterministic
fake features (seeded from the payload bytes) so downstream stages
(dedup, similarity) run end-to-end.  Swap ``_decode_*`` for PIL/ffmpeg
kernels in production; set ``strict=True`` to get NotImplementedError
instead of fakes.

Batch-size guidance (SURVEY §7 'wide rows'): with payloads of ~1 MB keep
``batch_size`` ≤ 64 so batch × concurrency stays inside a worker heap.
"""

from __future__ import annotations

import hashlib

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


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector derived from the payload
    digest (stable across processes — usable in tests and dedup)."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rs = np.random.RandomState(seed)
    return rs.normal(size=dim).astype(np.float32)


class ImageFeatureExtractor:
    """binary image payloads → feature vectors (+ passthrough metadata).

    Production kernel: decode (PIL) → resize → CNN embed, loaded once in
    __init__.  Here: deterministic fake features; ``strict=True`` raises
    NotImplementedError to mark the boundary explicitly."""

    def __init__(self, dim: int = FEATURE_DIM, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/torch; not available in this container")
        feats = [_fake_features(p, self.dim).tolist()
                 for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "embedding": pa.array(feats, pa.list_(pa.float32())),
        })


class ImageResizer:
    """Resize stage stub: passes payload through, rewrites metadata to the
    target size (kernel boundary documented; plumbing real)."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.width, self.height, self.strict = width, height, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image resize requires PIL")
        n = batch.num_rows
        iw = batch.schema.get_field_index("width")
        ih = batch.schema.get_field_index("height")
        return (batch
                .set_column(iw, "width", pa.array([self.width] * n, pa.int32()))
                .set_column(ih, "height", pa.array([self.height] * n, pa.int32())))


class FrameSampler:
    """Video → sampled frame rows (1 row per sampled frame): flat_map
    shape done batch-wise.  Frame payloads are stub slices of the source
    payload; the explode geometry, ordering and schema are real."""

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
