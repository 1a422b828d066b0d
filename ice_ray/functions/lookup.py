"""Flat-array string→string broadcast lookup.

A 10^6-entry Python dict is the wrong broadcast payload (NOTES.md perf
lesson "broadcast indexes must be flat arrays"): it is slow to build on
the driver, and — worse — pandas ``Series.map(dict)`` constructs a fresh
Series + index hashtable over the WHOLE map on every call, i.e. per
batch × per column inside a rewrite stage.  ``HashedStringMap`` keeps
the map as flat numpy arrays instead:

  build   one vectorized siphash (``pd.util.hash_array``, fixed key →
          deterministic across processes) + one argsort;
  pickle  three flat arrays;
  probe   hash the probe column, ``searchsorted`` into the sorted
          hashes, verify candidate hits against the stored key strings.

The string verification makes lookups EXACT: a hash collision between a
probe and a stored key (≈ n/2^64 per probe) can never return a wrong
value, and duplicate-hash runs among stored keys are resolved by
scanning the (≤ a few entries) run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _hash(keys: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(np.asarray(keys, dtype=object))


class HashedStringMap:
    """Immutable str→str map with vectorized ``lookup``.

    Keys must be unique (callers build from distinct-by-construction
    aggregate rows)."""

    __slots__ = ("h", "keys", "vals")

    def __init__(self, keys=None, vals=None):
        if keys is None or len(keys) == 0:
            self.h = np.empty(0, np.uint64)
            self.keys = np.empty(0, object)
            self.vals = np.empty(0, object)
            return
        if isinstance(keys, dict):
            keys, vals = (np.array(list(keys.keys()), dtype=object),
                          np.array(list(keys.values()), dtype=object))
        keys = np.asarray(keys, dtype=object)
        vals = np.asarray(vals, dtype=object)
        h = _hash(keys)
        order = np.argsort(h, kind="stable")
        self.h, self.keys, self.vals = h[order], keys[order], vals[order]

    def __len__(self) -> int:
        return len(self.h)

    def lookup(self, probe, fallback) -> np.ndarray:
        """Vectorized ``[get(p, f) for p, f in zip(probe, fallback)]`` as
        an object ndarray."""
        probe = np.asarray(probe, dtype=object)
        out = np.asarray(fallback, dtype=object).copy()
        n = len(self.h)
        if n == 0 or len(probe) == 0:
            return out
        hp = _hash(probe)
        pos = np.searchsorted(self.h, hp, side="left")
        cand = np.flatnonzero(pos < n)
        cand = cand[self.h[pos[cand]] == hp[cand]]
        if not cand.size:
            return out
        hit = self.keys[pos[cand]] == probe[cand]
        ok = cand[hit]
        out[ok] = self.vals[pos[ok]]
        # hash present but first run entry mismatched: probe/stored
        # collision or a duplicate-hash run — ~2⁻⁶⁴ rare; scan the run
        for i in cand[~hit]:
            p = pos[i] + 1
            while p < n and self.h[p] == hp[i]:
                if self.keys[p] == probe[i]:
                    out[i] = self.vals[p]
                    break
                p += 1
        return out

    def get(self, key: str, default=None):
        res = self.lookup(np.array([key], dtype=object),
                          np.array([default], dtype=object))
        return res[0]
