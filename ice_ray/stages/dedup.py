"""Deduplication operators for large-scale corpus curation:

- exact dedup by normalized content (hash-partition + per-group first;
  reference analog D2/D6: one item kept per normalized key,
  models/DepPathMap.java:196-234);
- MinHash + LSH near-dup (shingle → minhash → band → bucket groupby →
  candidate pairs → signature-estimated Jaccard verify);
- SimHash 64-bit fingerprints with Hamming-bucket candidates;
- word n-gram Jaccard verification for candidate pairs.

Scale shape: per-batch signature computation is numpy-vectorized per row;
the only shuffles are groupbys on (band_id, band_hash) / norm keys, whose
cardinality ≈ corpus size × bands, with per-bucket work bounded by a
documented cap (hot buckets are truncated with a logged count, never
exploded quadratically).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
MAX_BUCKET = 64  # cap on pairs per LSH bucket; beyond this the bucket is
                 # a near-clone cluster and pairing its head is enough


def _norm(text: str) -> str:
    return " ".join(_WORD_RE.findall((text or "").lower()))


def add_norm_key(batch: pa.Table, text_col: str = "text") -> pa.Table:
    keys = [hashlib.md5(_norm(t).encode()).hexdigest()
            for t in batch.column(text_col).to_pylist()]
    return batch.append_column("norm_key", pa.array(keys, pa.string()))


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (canonical_id, group_size) per distinct normalized content
    (canonical = min id; deterministic)."""
    from ..functions.shuffle import grouped_aggregate

    keyed = ds.map_batches(add_norm_key, batch_format="pyarrow",
                           fn_kwargs={"text_col": text_col})
    return grouped_aggregate(
        keyed.select_columns(["norm_key", id_col]),
        keys=["norm_key"],
        specs=[(id_col, "min"), (id_col, "count")],
        rename={f"{id_col}_min": "canonical_id",
                f"{id_col}_count": "group_size"},
    ).drop_columns(["norm_key"])


def _shingles(text: str, k: int = 3) -> list[int]:
    toks = _WORD_RE.findall((text or "").lower())
    if len(toks) < k:
        toks = toks + ["_pad"] * (k - len(toks))
    return [zlib.crc32(" ".join(toks[i:i + k]).encode())
            for i in range(len(toks) - k + 1)]


class MinHasher:
    """num_perm universal-hash minhash signatures, banded for LSH.
    Coefficients are seeded once per actor (deterministic)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3, seed: int = 42):
        assert num_perm % bands == 0
        rs = np.random.RandomState(seed)
        self.a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = np.array(_shingles(text, self.k), dtype=np.int64)
        # (num_perm, n_shingles) universal hashing, min over shingles
        h = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc batch → exploded (band_id, band_hash, id, sig) rows."""
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_hash, out_id, out_sig = [], [], [], []
        for i, text in zip(ids, texts):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows:(b + 1) * self.rows]
                out_band.append(b)
                out_hash.append(int(zlib.crc32(chunk.tobytes())))
                out_id.append(i)
                out_sig.append(sig.astype(np.int64).tobytes())
        return pa.table({
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "sig": pa.array(out_sig, pa.binary()),
        })


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket, estimated Jaccard from
    signature agreement.  Buckets larger than MAX_BUCKET pair only
    against the min id (cluster head) — documented cap, not silent."""
    df = df.drop_duplicates("doc_id").sort_values("doc_id")
    n = len(df)
    if n < 2:
        return pd.DataFrame({"id1": [], "id2": [], "est_jaccard": []})
    ids = df["doc_id"].to_numpy()
    sigs = np.stack([np.frombuffer(s, dtype=np.int64) for s in df["sig"]])
    rows = []
    if n > MAX_BUCKET:
        head = 0
        for j in range(1, n):
            est = float((sigs[head] == sigs[j]).mean())
            rows.append((int(ids[head]), int(ids[j]), est))
    else:
        for i in range(n):
            for j in range(i + 1, n):
                est = float((sigs[i] == sigs[j]).mean())
                rows.append((int(ids[i]), int(ids[j]), est))
    return pd.DataFrame(rows, columns=["id1", "id2", "est_jaccard"])


def _bucketed_band_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Pair generation for all LSH bands hashed into one work bucket —
    one Ray group per bucket, a vectorized pandas groupby inside (avoids
    one Python task per (band_id, band_hash) group)."""
    out = [pd.DataFrame({"id1": pd.Series(dtype="int64"),
                         "id2": pd.Series(dtype="int64"),
                         "est_jaccard": pd.Series(dtype="float64")})]
    for _, g in df.groupby(["band_id", "band_hash"], sort=False):
        if len(g) > 1:
            out.append(_bucket_pairs(g))
    return pd.concat(out, ignore_index=True)


def minhash_neardup_pairs(ds, threshold: float = 0.5, num_perm: int = 64,
                          bands: int = 16, k: int = 3,
                          num_work_buckets: int = 64):
    """→ distinct (id1, id2, est_jaccard ≥ threshold) candidate pairs."""
    import pyarrow.compute as pc

    from ..functions.shuffle import grouped_aggregate

    exploded = ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        concurrency=(1, 8))

    def add_work_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(
            pc.add(pc.multiply(pc.cast(batch.column("band_id"), pa.int64()), 1000003),
                   batch.column("band_hash")),
            num_work_buckets - 1), pa.int32())
        return batch.append_column("_wb", b)

    pairs = (exploded.map_batches(add_work_bucket, batch_format="pyarrow")
             .groupby("_wb").map_groups(_bucketed_band_pairs,
                                        batch_format="pandas"))
    verified = pairs.filter(expr=f"est_jaccard >= {threshold}")
    # a pair can surface from several bands → dedup on (id1, id2)
    return grouped_aggregate(verified, keys=["id1", "id2"],
                             specs=[("est_jaccard", "max")],
                             rename={"est_jaccard_max": "est_jaccard"})


def neardup_clusters(pairs_ds, max_rounds: int = 10):
    """Connected components by iterative min-label propagation over the
    candidate-pair edge list (driver loop over a small pair set)."""
    pdf = pairs_ds.to_pandas()
    label: dict[int, int] = {}
    for a, b in zip(pdf["id1"], pdf["id2"]):
        label.setdefault(a, a)
        label.setdefault(b, b)
    for _ in range(max_rounds):
        changed = False
        for a, b in zip(pdf["id1"], pdf["id2"]):
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
        if not changed:
            break
    return pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster": list(label.values())}
    ).sort_values("doc_id").reset_index(drop=True)


def neardup_clusters_distributed(pairs_ds, max_rounds: int = 10):
    """Connected components over the candidate-pair edge list as Ray
    iterations: min-label propagation, each round = broadcast label map
    → per-batch neighbor-label messages → one bucketed min aggregate.
    Edges stream through the cluster; the broadcast is bounded by the
    number of NODES touched by candidate pairs (≪ corpus — swap the
    broadcast for functions/join.bucketed_hash_join when even that
    outgrows memory).  Converges in O(component diameter) rounds with
    early stop.  Returns a Dataset (doc_id, cluster)."""
    import ray
    import ray.data

    from ..functions.shuffle import grouped_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        # undirected edges → both directions + self rows
        a = batch.column("id1")
        b = batch.column("id2")
        return pa.table({
            "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "nbr": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
        })

    edges = pairs_ds.map_batches(explode, batch_format="pyarrow").materialize()
    # initial label = own id
    labels = grouped_aggregate(
        edges.select_columns(["node"]).map_batches(
            lambda t: t.append_column("label", t.column("node")),
            batch_format="pyarrow"),
        keys=["node"], specs=[("label", "min")], rename={"label_min": "label"},
    ).materialize()

    for _ in range(max_rounds):
        lab_ref = ray.put({r["node"]: r["label"] for r in labels.iter_rows()})

        class Propagate:
            def __init__(self):
                self.lab = ray.get(lab_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                nodes = batch.column("node").to_pylist()
                nbrs = batch.column("nbr").to_pylist()
                return pa.table({
                    "node": pa.array(nodes, batch.column("node").type),
                    "label": pa.array([self.lab[n] for n in nbrs],
                                      batch.column("node").type),
                })

        msgs = edges.map_batches(Propagate, batch_format="pyarrow",
                                 concurrency=(1, 4))
        with_self = msgs.union(labels)
        new_labels = grouped_aggregate(
            with_self, keys=["node"], specs=[("label", "min")],
            rename={"label_min": "label"}).materialize()
        old = {r["node"]: r["label"] for r in labels.iter_rows()}
        new = {r["node"]: r["label"] for r in new_labels.iter_rows()}
        labels = new_labels
        if old == new:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]),
        batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over word features; near-dups share bucket prefixes."""

    def __init__(self, prefix_bits: int = 16):
        self.prefix_bits = prefix_bits

    @staticmethod
    def simhash64(text: str) -> int:
        v = np.zeros(64, dtype=np.int64)
        for tok in _WORD_RE.findall((text or "").lower()):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
            v += np.where(bits > 0, 1, -1)
        out = np.packbits((v > 0).astype(np.uint8))
        return int.from_bytes(out.tobytes(), "little")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        hs, buckets = [], []
        for text in batch.column("text").to_pylist():
            h = self.simhash64(text)
            hs.append(h)
            buckets.append(h >> (64 - self.prefix_bits))
        return pa.table({"doc_id": ids,
                         "simhash": pa.array(hs, pa.uint64()),
                         "bucket": pa.array(buckets, pa.uint64())})


def ngram_jaccard(text1: str, text2: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel for candidates)."""
    s1, s2 = set(_shingles(text1, k)), set(_shingles(text2, k))
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)
