"""Per-partition lineage manifest for checkpoint/resume.

The Ray analog of the reference's per-document memo (DepPathsLog,
models/DepPaths.java:163-172, 585-768): the resumable unit here is an
**input shard group** for the expensive extraction phase, and an output
hash partition for the edge table.  Each entry records
``(partition_id, input_fingerprint, row_count, status)``; a rerun skips
entries whose fingerprint still matches (north rule: "any failed
partition resumes without recompute").

Writes are atomic: data lands in ``<dir>.tmp`` then renames; the manifest
is rewritten last.  This file is driver-side only and tiny.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path


def fingerprint_files(paths: list[str]) -> str:
    """Stable fingerprint of a set of input files: name + size + mtime."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def fingerprint_params(**params) -> str:
    h = hashlib.sha256(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()[:16]


class Manifest:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.entries: dict[str, dict] = {}
        if self.path.exists():
            self.entries = json.loads(self.path.read_text())

    def is_done(self, partition_id: str, fingerprint: str) -> bool:
        e = self.entries.get(partition_id)
        return bool(e and e.get("fingerprint") == fingerprint
                    and e.get("status") == "done")

    def mark_done(self, partition_id: str, fingerprint: str, row_count: int,
                  **metrics) -> None:
        self.entries[partition_id] = {
            "fingerprint": fingerprint,
            "row_count": int(row_count),
            "status": "done",
            **metrics,
        }
        self._flush()

    def _flush(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.entries, indent=1, sort_keys=True))
        os.replace(tmp, self.path)

    def total_rows(self) -> int:
        return sum(e.get("row_count", 0) for e in self.entries.values())

    def prune(self, keep_ids: set[str]) -> list[str]:
        """Drop entries not in ``keep_ids`` (e.g. stale group=NNNNN dirs
        from a prior run with a different group layout); returns the
        dropped partition ids so the caller can delete their data dirs."""
        dropped = [pid for pid in self.entries if pid not in keep_ids]
        for pid in dropped:
            del self.entries[pid]
        if dropped:
            self._flush()
        return dropped
