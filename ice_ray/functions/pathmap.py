"""Repr ↔ path lookups over the path-counts table — the DepPathMap
singleton replaced by dataset-backed lookups (A6):

- ``find_path_by_repr``: normalized-repr exact lookup with the ``(1)/(2)``
  subscript swap fallback (J7/D5, models/DepPathMap.java:96-120
  findPath + swap12 :115-120);
- ``find_closest_repr``: nearest repr by Levenshtein (F1,
  DepPathMap.java:256-302 via functions/pathmatcher.levenshtein);
- ``merge_count_tables``: union of two count tables summing counts and
  keeping the SHORTER example (G3 split-merge semantics,
  views/cli/IceCLI.java:661-663, 714-717; D1/S7/S8 corpus union).
"""

from __future__ import annotations

import re

from ..core.deppath import normalize_repr
from .pathmatcher import levenshtein

_SUB_RE = re.compile(r"\((1|2)\)")


def swap12(s: str) -> str:
    """Flip (1)/(2) argument subscripts (DepPathMap.java:115-120)."""
    return _SUB_RE.sub(lambda m: "(2)" if m.group(1) == "1" else "(1)", s)


def build_repr_map(path_counts, max_rows: int = 5_000_000) -> dict[str, str]:
    """path-counts dataset → {normalized repr: typed_path} (first wins by
    count desc then key, deterministic).

    Driver-resident BY DESIGN (the reference's in-memory DepPathMap
    singleton feeding model-file writers and the expander GUI loop), but
    guarded: a corpus-shaped path vocabulary fails loudly at ``max_rows``
    instead of OOMing the driver — at that scale use the distributed
    decode joins / length-banded ReprIndex instead."""
    path_counts = path_counts.materialize()  # count + iter read ONE execution
    n = path_counts.count()
    if n > max_rows:
        raise ValueError(
            f"build_repr_map: {n} path rows exceed the driver gate "
            f"({max_rows}); use the distributed decode path "
            "(stages/tagger) or raise max_rows explicitly")
    rows = sorted(path_counts.iter_rows(),
                  key=lambda r: (-r["count"], r["typed_path"]))
    out: dict[str, str] = {}
    for r in rows:
        out.setdefault(normalize_repr(r["repr"]), r["typed_path"])
    return out


def find_path_by_repr(repr_map: dict[str, str], repr_: str) -> tuple[str, bool] | None:
    """→ (typed_path, swapped?) — exact lookup on the normalized repr,
    then on the subscript-swapped form."""
    key = normalize_repr(repr_)
    hit = repr_map.get(key)
    if hit is not None:
        return hit, False
    hit = repr_map.get(swap12(key))
    if hit is not None:
        return swap12(hit), True
    return None


def find_closest_repr(repr_map: dict[str, str], repr_: str) -> tuple[str, int]:
    """Nearest known repr by edit distance (ties → lexicographically
    smallest; the 100-char cap maps to the reference's 1001 sentinel)."""
    key = normalize_repr(repr_)
    best, best_d = "", 10**9
    for cand in sorted(repr_map):
        d = levenshtein(key, cand)
        if d < best_d:
            best, best_d = cand, d
    return best, best_d


class ReprIndex:
    """Length-banded nearest-repr index — the indexed variant of
    ``find_closest_repr``.  ``levenshtein(a, b) ≥ |len(a) − len(b)|``,
    so candidates bucketed by length can be visited in increasing
    length-difference order and the scan stops once the band's lower
    bound exceeds the best distance found: near matches cost O(band)
    instead of O(vocab).  (The reference's findClosestPath is the full
    scan, DepPathMap.java:256-302 — this matters once the repr table
    grows past a few thousand entries.)  Tie semantics identical to
    find_closest_repr: minimal distance, then lexicographically
    smallest candidate."""

    def __init__(self, repr_map: dict[str, str]):
        self.by_len: dict[int, list[str]] = {}
        for cand in repr_map:
            self.by_len.setdefault(len(cand), []).append(cand)
        for v in self.by_len.values():
            v.sort()
        self.lens = sorted(self.by_len)

    def find_closest(self, repr_: str) -> tuple[str, int]:
        key = normalize_repr(repr_)
        n = len(key)
        best, best_d = "", 10**9
        if not self.lens:
            return best, best_d
        max_dl = max(abs(n - self.lens[0]), abs(self.lens[-1] - n))
        for dl in range(0, max_dl + 1):
            if dl > best_d:  # lower bound: any candidate here has d ≥ dl
                break
            for cl in ((n,) if dl == 0 else (n - dl, n + dl)):
                for cand in self.by_len.get(cl, ()):
                    d = levenshtein(key, cand)
                    if d < best_d or (d == best_d and cand < best):
                        best, best_d = cand, d
        return best, best_d


def merge_count_tables(a, b, key: str = "typed_path"):
    """Union two count datasets: counts sum, example = the shorter string,
    repr = first non-null (IceCLI merge semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .shuffle import grouped_aggregate

    def pack(batch: pa.Table) -> pa.Table:
        ex = batch.column("example")
        lp = pc.utf8_lpad(pc.cast(pc.utf8_length(ex), pa.string()), 9, "0")
        payload = pc.binary_join_element_wise(lp, ex, batch.column("repr"), "\x01")
        return pa.table({key: batch.column(key),
                         "count": batch.column("count"),
                         "payload": payload})

    both = a.map_batches(pack, batch_format="pyarrow").union(
        b.map_batches(pack, batch_format="pyarrow"))
    # min payload by (len, example) → shortest example; bucketed Arrow
    # two-stage aggregate instead of Ray's row-based reduce
    agg = grouped_aggregate(both, keys=[key],
                            specs=[("count", "sum"), ("payload", "min")],
                            rename={"count_sum": "count",
                                    "payload_min": "payload"})

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("payload"), "\x01")
        return (batch.append_column("example", pc.list_element(parts, 1))
                .append_column("repr", pc.list_element(parts, 2))
                .drop_columns(["payload"]))

    return agg.map_batches(unpack, batch_format="pyarrow")
