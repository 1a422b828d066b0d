"""Mergeable sketches for approximate wide aggregates at scale.

The pattern the Ray guide prescribes for sketches: one serialized sketch
per batch from ``map_batches``, merged in a tiny second stage — the
shuffle moves B registers per batch instead of every value.

- ``HyperLogLog``: classic HLL (Flajolet et al., public algorithm) with
  2^p registers; ±~1.04/√(2^p) relative error.
- ``approx_distinct(ds, col)``: distinct-count of a column via HLL.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit keeps the rank bounded at 64-p+1 for all-zero rests
        rest = (hashes << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (frozen once found)
        ranks = np.ones(len(hashes), dtype=np.uint8)
        finished = np.zeros(len(hashes), dtype=bool)
        v = rest.copy()
        for _ in range(64 - self.p + 1):
            finished |= (v >> np.uint64(63)) != 0
            if finished.all():
                break
            ranks = np.where(finished, ranks, ranks + 1)
            v = v << np.uint64(1)
        np.maximum.at(self.registers, idx, ranks)

    def add_values(self, values) -> None:
        hs = np.array([int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "little")
            for v in values], dtype=np.uint64)
        if len(hs):
            self.add_hashes(hs)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros:
            e = m * math.log(m / zeros)  # small-range correction
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate count-distinct of ``ds[col]``: one HLL per batch,
    merged on the driver (each sketch is 2^p bytes)."""

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_values(batch.column(col).to_pylist())
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch, batch_format="pyarrow").iter_rows():
        merged.merge(HyperLogLog.deserialize(row["sketch"], p))
    return merged.estimate()
