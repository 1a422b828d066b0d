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

from ..functions.blocks import ensure_arrow_block

_WORD_RE = re.compile(r"[a-z0-9]+")

MAX_BUCKET = 64  # cap on pairs per LSH bucket; beyond this the bucket is
                 # a near-clone cluster and pairing its head is enough

# per-worker deserialization cache for broadcast structures: ray.get
# re-deserializes a non-zero-copy object (set/dict) on EVERY call
_GRAM_CACHE: dict = {}


def _build_dict(key_col: str, val_col: str, *tables) -> dict:
    out: dict = {}
    for t in map(ensure_arrow_block, tables):
        if key_col not in t.column_names:   # empty shuffle parts
            continue
        out.update(zip(t.column(key_col).to_pylist(),
                       t.column(val_col).to_pylist()))
    return out


def _build_frozenset(col: str, *tables) -> frozenset:
    out: set = set()
    for t in map(ensure_arrow_block, tables):
        if col not in t.column_names:       # empty shuffle parts
            continue
        out.update(t.column(col).to_pylist())
    return frozenset(out)


def _worker_side(fn, ds, *args):
    """Build a broadcast structure with ``fn`` in a Ray task fed the
    dataset's block refs, returning the result REF — neither the blocks
    nor the built structure ever land on the driver (the
    ``_mention_index_task`` pattern, stages/linker.py:320)."""
    import ray
    return ray.remote(fn).remote(*args, *ds.to_arrow_refs())


def _cached_get(ref):
    import ray
    key = ref.hex()
    v = _GRAM_CACHE.get(key)
    if v is None:
        # FIFO-evict the oldest entry (a composed pipeline like curate
        # keeps several gated broadcast structures live per worker at
        # once; clearing ALL on overflow thrashed back to per-batch
        # re-deserialization). 8 entries × ≤512MB gate bounds the heap.
        while len(_GRAM_CACHE) >= 8:
            _GRAM_CACHE.pop(next(iter(_GRAM_CACHE)))
        v = ray.get(ref)
        _GRAM_CACHE[key] = v
    return v


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
        # Dietzfelbinger multiply-shift family: h(x) = ((a·x + b) mod 2^64)
        # with ODD 64-bit a — uint64 wraparound IS the mod, so the hash is
        # exact and the family is the documented one (the earlier int64
        # variant silently wrapped mod 2^64 before a Mersenne reduction)
        def u64(n):
            hi = rs.randint(0, 1 << 32, size=n, dtype=np.uint64)
            lo = rs.randint(0, 1 << 32, size=n, dtype=np.uint64)
            return (hi << np.uint64(32)) | lo
        self.a = u64(num_perm) | np.uint64(1)
        self.b = u64(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = np.array(_shingles(text, self.k), dtype=np.uint64)
        # (num_perm, n_shingles) multiply-shift hashing, min over shingles
        h = self.a[:, None] * sh[None, :] + self.b[:, None]
        return h.min(axis=1)

    def _shingle_hashes_flat(self, col):
        """Vectorized batch shingling: flat tokenization, k-token shingle
        strings via Arrow element-wise join (exactly ``" ".join(toks[i:
        i+k])``), crc32 once per DISTINCT shingle string (dictionary-
        encoded), scattered back.  Rows with fewer than k tokens take
        the scalar ``_shingles`` pad path (they emit exactly one padded
        shingle).  Returns ``(hashes uint64, row_ids)`` sorted by row."""
        import pyarrow.compute as pc

        from .textstats import flat_tokens

        toks, rows = flat_tokens(col)
        n_rows = len(col)
        tok_counts = np.bincount(rows, minlength=n_rows)
        parts_hashes = []
        parts_rows = []
        if len(toks) >= self.k:
            width = len(toks) - self.k + 1
            same = rows[self.k - 1:] == rows[:width]
            if same.any():
                slices = [toks.slice(i, width) for i in range(self.k)]
                sh_strs = pc.binary_join_element_wise(*slices, " ") \
                    .filter(pa.array(same))
                dict_enc = pc.dictionary_encode(sh_strs)
                if isinstance(dict_enc, pa.ChunkedArray):
                    dict_enc = dict_enc.combine_chunks()
                uniq = dict_enc.dictionary.to_pylist()
                uh = np.fromiter((zlib.crc32(s.encode()) for s in uniq),
                                 dtype=np.uint64, count=len(uniq))
                parts_hashes.append(uh[dict_enc.indices.to_numpy()])
                parts_rows.append(rows[:width][same])
        short = np.flatnonzero(tok_counts < self.k)
        if len(short):
            texts = col.take(pa.array(short)).to_pylist()
            parts_hashes.append(np.array(
                [_shingles(t, self.k)[0] for t in texts], dtype=np.uint64))
            parts_rows.append(short.astype(np.int64))
        if not parts_hashes:
            return np.array([], np.uint64), np.array([], np.int64)
        hashes = np.concatenate(parts_hashes)
        rids = np.concatenate(parts_rows)
        order = np.argsort(rids, kind="stable")
        return hashes[order], rids[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc batch → one (doc_id, sig) row per doc (signatures computed
        once; band rows are derived from sigs by a separate cheap map).
        Batch-vectorized: one flat shingling pass, then per-permutation
        multiply-shift + ``minimum.reduceat`` over doc segments —
        bit-identical to the scalar ``signature`` form."""
        import pyarrow.compute as pc
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.binary())})
        sh, rids = self._shingle_hashes_flat(col)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        # every row emits ≥ 1 shingle (short rows pad), so segment
        # starts cover all n rows
        starts = np.concatenate(([0], np.flatnonzero(np.diff(rids)) + 1))
        for p in range(self.num_perm):
            h = self.a[p] * sh + self.b[p]      # uint64 wraparound hash
            sigs[:, p] = np.minimum.reduceat(h, starts)
        sig_bytes = [sigs[i].tobytes() for i in range(n)]
        return pa.table({"doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                         "sig": pa.array(sig_bytes, pa.binary())})


def _make_crc32_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> np.uint32(1)) ^ np.uint32(0xEDB88320),
                     t >> np.uint32(1))
    return t


_CRC32_TABLE = _make_crc32_table()


def _crc32_rows(data: np.ndarray) -> np.ndarray:
    """``zlib.crc32`` of each row of an (m, nbytes) uint8 matrix,
    vectorized over rows: nbytes table-lookup passes instead of m Python
    calls.  Bit-identical to zlib (CRC-32/IEEE, reflected)."""
    crc = np.full(data.shape[0], 0xFFFFFFFF, dtype=np.uint32)
    for j in range(data.shape[1]):
        crc = _CRC32_TABLE[(crc ^ data[:, j]) & np.uint32(0xFF)] \
            ^ (crc >> np.uint32(8))
    return crc ^ np.uint32(0xFFFFFFFF)


def _explode_bands(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """(doc_id, sig) → slim (band_id, band_hash, doc_id) rows: the LSH
    shuffle moves 20 bytes per band row, NOT the full signature (which
    would be ≈16× duplicated at bands=16 — the round-1 bottleneck).
    Band hashing is the vectorized `_crc32_rows` kernel — bit-identical
    to the per-band ``zlib.crc32`` it replaces, but 32 numpy passes over
    the whole batch instead of n_docs × bands Python calls (the round-3
    per-row hot spot)."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"band_id": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    ids = np.asarray(batch.column("doc_id").to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    # signatures are fixed-width (bands × rows × 8 bytes): when the Arrow
    # binary column is dense (no nulls, contiguous offsets — always true
    # for MinHasher output), read its data buffer zero-copy instead of
    # joining n Python bytes objects
    sig_col = batch.column("sig").combine_chunks()
    chunk = sig_col.chunk(0) if isinstance(sig_col, pa.ChunkedArray) else sig_col
    width = bands * rows * 8
    if chunk.null_count == 0 and len(chunk.buffers()) >= 3:
        off = np.frombuffer(chunk.buffers()[1], dtype=np.int32,
                            count=len(chunk) + 1,
                            offset=chunk.offset * 4)
        if off[-1] - off[0] == n * width:
            raw = np.frombuffer(chunk.buffers()[2], dtype=np.uint8,
                                count=n * width, offset=int(off[0]))
        else:   # ragged (shouldn't happen) → slow path
            raw = np.frombuffer(b"".join(chunk.to_pylist()), dtype=np.uint8)
    else:
        raw = np.frombuffer(b"".join(chunk.to_pylist()), dtype=np.uint8)
    hashes = _crc32_rows(raw.reshape(n * bands, rows * 8)).astype(np.int64)
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(hashes, pa.int64()),
        "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
    })


def _bucketed_band_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Candidate (id1 < id2) pairs for all LSH bands hashed into one work
    bucket — ids only, fully vectorized.  Buckets larger than MAX_BUCKET
    pair only against the min id (cluster head) — documented cap, not a
    silent quadratic explosion."""
    a_out, b_out = [], []
    for _, g in df.groupby(["band_id", "band_hash"], sort=False):
        ids = np.unique(g["doc_id"].to_numpy())
        n = len(ids)
        if n < 2:
            continue
        if n > MAX_BUCKET:
            a_out.append(np.full(n - 1, ids[0]))
            b_out.append(ids[1:])
        else:
            iu, ju = np.triu_indices(n, 1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
    if not a_out:
        return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                             "id2": pd.Series(dtype="int64")})
    return pd.DataFrame({"id1": np.concatenate(a_out).astype("int64"),
                         "id2": np.concatenate(b_out).astype("int64")})


def _sig_est(batch: pa.Table) -> pa.Table:
    """(id1, id2, sig1, sig2) → est_jaccard from signature agreement."""
    s1 = batch.column("sig1").to_pylist()
    s2 = batch.column("sig2").to_pylist()
    if not s1:
        return pa.table({"id1": pa.array([], pa.int64()),
                         "id2": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64())})
    a = np.frombuffer(b"".join(s1), dtype=np.int64).reshape(len(s1), -1)
    b = np.frombuffer(b"".join(s2), dtype=np.int64).reshape(len(s2), -1)
    est = np.round((a == b).mean(axis=1), 6)
    return pa.table({"id1": batch.column("id1"),
                     "id2": batch.column("id2"),
                     "est_jaccard": pa.array(est, pa.float64())})


import functools


@functools.lru_cache(maxsize=8)
def _cached_minhasher(num_perm: int, bands: int, k: int) -> "MinHasher":
    return MinHasher(num_perm=num_perm, bands=bands, k=k)


def minhash_signatures(ds, num_perm: int = 64, bands: int = 16, k: int = 3):
    """→ materialized (doc_id, sig) dataset (≈0.5 KB/doc).  Task-based
    map (no actor pool — the hasher is cached per worker process via
    lru_cache; actor startup would dominate small corpora)."""
    def sign(batch: pa.Table) -> pa.Table:
        return _cached_minhasher(num_perm, bands, k)(batch)

    return ds.map_batches(sign, batch_format="pyarrow").materialize()


def minhash_neardup_pairs(ds, threshold: float = 0.5, num_perm: int = 64,
                          bands: int = 16, k: int = 3,
                          num_work_buckets: int = 64,
                          broadcast_max_docs: int = 200_000):
    """→ distinct (id1, id2, est_jaccard ≥ threshold) candidate pairs.

    Pipeline: signatures once per doc → slim band rows (no signature
    payload — the round-1 16× signature duplication is gone) → bucketed
    pair generation (ids only) → pair dedup → signature re-attachment →
    vectorized signature-agreement estimate → threshold filter.

    Re-attachment strategy: corpora up to ``broadcast_max_docs`` ship
    the signature table via ray.put (≈0.5 KB/doc → ≤100 MB) and verify
    map-side with zero extra shuffles; larger corpora use two bucketed
    hash joins against the signature dataset (sub-linear memory, two
    exchanges of the candidate set only)."""
    import ray

    import pyarrow.compute as pc

    from ..functions.shuffle import grouped_aggregate

    sigs = minhash_signatures(ds, num_perm, bands, k)
    exploded = sigs.map_batches(
        _explode_bands, batch_format="pyarrow",
        fn_kwargs={"bands": bands, "rows": num_perm // bands})

    def add_work_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(
            pc.add(pc.multiply(pc.cast(batch.column("band_id"), pa.int64()), 1000003),
                   batch.column("band_hash")),
            num_work_buckets - 1), pa.int32())
        return batch.append_column("_wb", b)

    cand = (exploded.map_batches(add_work_bucket, batch_format="pyarrow")
            .groupby("_wb").map_groups(_bucketed_band_pairs,
                                       batch_format="pandas"))
    # a pair can surface from several bands → dedup on (id1, id2) BEFORE
    # verification so each pair is verified once
    cand = grouped_aggregate(
        cand.map_batches(lambda t: t.append_column(
            "_one", pa.array(np.ones(t.num_rows, dtype="int64"))),
            batch_format="pyarrow"),
        keys=["id1", "id2"], specs=[("_one", "min")],
    ).drop_columns(["_one_min"])

    if sigs.count() <= broadcast_max_docs:
        # sig map built WORKER-side from block refs (never on the driver)
        sig_ref = _worker_side(_build_dict, sigs, "doc_id", "sig")

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            sig_map = _cached_get(sig_ref)
            t = pa.table({
                "id1": batch.column("id1"),
                "id2": batch.column("id2"),
                "sig1": pa.array([sig_map[i] for i in
                                  batch.column("id1").to_pylist()], pa.binary()),
                "sig2": pa.array([sig_map[i] for i in
                                  batch.column("id2").to_pylist()], pa.binary()),
            })
            return _sig_est(t)

        est = cand.map_batches(verify_broadcast, batch_format="pyarrow")
    else:
        from ..functions.join import bucketed_hash_join

        cand = cand.materialize()
        s1 = sigs.map_batches(lambda t: t.rename_columns(["id1", "sig1"]),
                              batch_format="pyarrow")
        s2 = sigs.map_batches(lambda t: t.rename_columns(["id2", "sig2"]),
                              batch_format="pyarrow")
        with_s1 = bucketed_hash_join(cand, s1, "id1", "id1").materialize()
        with_s2 = bucketed_hash_join(with_s1, s2, "id2", "id2")
        est = with_s2.map_batches(_sig_est, batch_format="pyarrow")
    return est.filter(expr=f"est_jaccard >= {threshold}")


def minhash_neardup_pairs_exact(ds, threshold: float = 0.5,
                                num_perm: int = 64, bands: int = 16,
                                k: int = 3,
                                broadcast_max_docs: int = 200_000,
                                broadcast_max_bytes: int = 512 << 20):
    """LSH candidates verified by EXACT word-k-gram Jaccard on the
    document text (the ngram_jaccard kernel) instead of the signature
    estimate → (id1, id2, jaccard ≥ threshold).  Texts are re-attached
    like signatures: broadcast for small corpora, keyed joins above —
    and the broadcast gate is BYTE-aware, not just count-aware (200k ×
    100 KB docs would be 20 GB on the driver; ``size_bytes()`` of the
    projected columns decides, capped at ``broadcast_max_bytes``)."""
    import ray

    # candidates at a permissive estimate threshold; exact Jaccard decides
    cand = minhash_neardup_pairs(ds, threshold=min(threshold, 0.3),
                                 num_perm=num_perm, bands=bands, k=k,
                                 broadcast_max_docs=broadcast_max_docs)

    def exact(batch: pa.Table, text_by_id) -> pa.Table:
        ids1 = batch.column("id1").to_pylist()
        ids2 = batch.column("id2").to_pylist()
        j = [round(ngram_jaccard(text_by_id[a], text_by_id[b], k), 6)
             for a, b in zip(ids1, ids2)]
        t = pa.table({"id1": batch.column("id1"),
                      "id2": batch.column("id2"),
                      "jaccard": pa.array(j, pa.float64())})
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    # ONE materialized (doc_id, text) projection serves the gate check
    # and either attach path — count and size_bytes are then free
    slim = ds.select_columns(["doc_id", "text"]).materialize()
    n_docs = slim.count()
    est_bytes = slim.size_bytes() or 0
    if n_docs <= broadcast_max_docs and est_bytes <= broadcast_max_bytes:
        # text map built worker-side from block refs — no driver pull
        tref = _worker_side(_build_dict, slim, "doc_id", "text")

        def verify(batch: pa.Table) -> pa.Table:
            return exact(batch, _cached_get(tref))

        return cand.map_batches(verify, batch_format="pyarrow")

    from ..functions.join import bucketed_hash_join

    cand = cand.materialize()
    t1 = slim.map_batches(
        lambda t: t.rename_columns(["id1", "text1"]), batch_format="pyarrow")
    t2 = slim.map_batches(
        lambda t: t.rename_columns(["id2", "text2"]), batch_format="pyarrow")
    with1 = bucketed_hash_join(cand, t1, "id1", "id1").materialize()
    with2 = bucketed_hash_join(with1, t2, "id2", "id2")

    def verify_joined(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        j = [round(ngram_jaccard(a, b, k), 6)
             for a, b in zip(batch.column("text1").to_pylist(),
                             batch.column("text2").to_pylist())]
        t = pa.table({"id1": batch.column("id1"),
                      "id2": batch.column("id2"),
                      "jaccard": pa.array(j, pa.float64())})
        return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    return with2.map_batches(verify_joined, batch_format="pyarrow")


def neardup_clusters(pairs_ds, max_rounds: int = 50):
    """Connected components by iterative min-label propagation over the
    candidate-pair edge list (driver loop over a small pair set)."""
    import warnings

    pdf = pairs_ds.to_pandas()
    label: dict[int, int] = {}
    for a, b in zip(pdf["id1"], pdf["id2"]):
        label.setdefault(a, a)
        label.setdefault(b, b)
    converged = False
    for _ in range(max_rounds):
        changed = False
        for a, b in zip(pdf["id1"], pdf["id2"]):
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
        if not changed:
            converged = True
            break
    if not converged:
        warnings.warn(f"neardup_clusters: min-label propagation did not "
                      f"converge within {max_rounds} rounds; components with "
                      f"diameter > {max_rounds} may be split")
    return pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster": list(label.values())}
    ).sort_values("doc_id").reset_index(drop=True)


def _cc_numpy(e1: np.ndarray, e2: np.ndarray):
    """Min-label connected components over an int edge list, entirely in
    numpy: alternating hooking (min over neighbor labels, ``minimum.at``)
    and pointer-doubling shortcuts (``lab = lab[lab]`` to the local
    fixpoint) — star contraction, O(log n) hook rounds × O(E) vector work.
    Returns (nodes_sorted, component_min_label_per_node)."""
    nodes, inv = np.unique(np.concatenate([e1, e2]), return_inverse=True)
    m = len(e1)
    a, b = inv[:m], inv[m:]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, a, lab[b])
        np.minimum.at(new, b, lab[a])
        while True:                       # shortcut to the round fixpoint
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            break
        lab = new
    return nodes, nodes[lab]


def _cc_local_task(*tables) -> pa.Table:
    """Single-worker CC over the edge block refs (the gated small-graph
    path: the edge list never lands on the driver, and the kernel is the
    vectorized pointer-doubling `_cc_numpy`)."""
    e1s, e2s = [], []
    for t in map(ensure_arrow_block, tables):
        if "id1" not in t.column_names:     # empty shuffle parts
            continue
        e1s.append(t.column("id1").to_numpy(zero_copy_only=False)
                   .astype(np.int64))
        e2s.append(t.column("id2").to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    if not e1s:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    nodes, lab = _cc_numpy(np.concatenate(e1s), np.concatenate(e2s))
    return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                     "cluster": pa.array(lab, pa.int64())})


def _build_root_map(key_col: str, val_col: str, *tables):
    """(sorted keys, root values) arrays from label-table blocks, with the
    labels POINTER-DOUBLED to their roots worker-side (every label value
    is itself a key, so resolution is repeated vectorized searchsorted —
    O(log depth) passes).  A compressed broadcast map makes every
    propagation round a star contraction: O(log n) rounds total instead
    of O(component diameter)."""
    ks, vs = [], []
    for t in map(ensure_arrow_block, tables):
        if key_col not in t.column_names:   # empty shuffle parts
            continue
        ks.append(t.column(key_col).to_numpy(zero_copy_only=False))
        vs.append(t.column(val_col).to_numpy(zero_copy_only=False))
    if not ks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = np.concatenate(ks).astype(np.int64)
    v = np.concatenate(vs).astype(np.int64)
    order = np.argsort(k)
    k, v = k[order], v[order]
    while True:
        v2 = v[np.searchsorted(k, v)]
        if np.array_equal(v2, v):
            break
        v = v2
    return k, v


def _propagate_rootmap(batch: pa.Table, *, lab_ref) -> pa.Table:
    """Broadcast-strategy message step: label of each edge's neighbor via
    one searchsorted against the per-worker-cached compressed root map
    (plain task fn — keeps operator fusion; no per-round actor pool)."""
    k, v = _cached_get(lab_ref)
    nbr = batch.column("nbr").to_numpy(zero_copy_only=False).astype(np.int64)
    lab = v[np.searchsorted(k, nbr)]
    return pa.table({"node": batch.column("node"),
                     "label": pa.array(lab, pa.int64())})


def _sum_col_task(col: str, *tables) -> int:
    import pyarrow.compute as pc
    s = 0
    for t in map(ensure_arrow_block, tables):
        if col in t.column_names and t.num_rows:
            s += pc.sum(t.column(col)).as_py() or 0
    return s


def _dataset_sum(ds, col: str) -> int:
    """Σ over a materialized dataset's blocks via one Ray task on its
    block refs — avoids launching a full streaming-executor job per
    convergence check (measured ≈0.3–0.5 s of fixed overhead each)."""
    import ray
    return ray.get(ray.remote(_sum_col_task).remote(col, *ds.to_arrow_refs()))


def neardup_clusters_distributed(pairs_ds, max_rounds: int = 50,
                                 strategy: str = "auto",
                                 broadcast_max_nodes: int = 2_000_000,
                                 local_max_edges: int = 30_000_000,
                                 local_max_bytes: int = 512 << 20):
    """Connected components over the candidate-pair edge list.  Three
    execution strategies, all converging to min-node-id component labels:

    - ``local`` (gated fast path, the auto default while the edge table
      fits one worker: ≤ ``local_max_edges`` rows AND ≤ ``local_max_bytes``):
      ONE Ray task runs the vectorized numpy hooking + pointer-doubling
      kernel over the edge block refs — zero per-round barriers.  Near-dup
      edge lists are duplicate-bounded (≪ corpus) and LSH head-pairing
      caps hot buckets, so this gate holds far longer than the corpus fits
      anywhere.
    - ``broadcast`` (node-bounded): per round, a worker-side task builds a
      sorted-array label map POINTER-DOUBLED to roots (`_build_root_map`),
      and a fused task-fn map_batches hooks each node to the min neighbor
      root — star contraction, O(log n) rounds, one Dataset execution per
      round.
    - ``join`` (the 100-TB path, nothing node-bounded anywhere): per round,
      a bucketed exchange computes min-over-neighbor-labels messages, a
      bucketed min aggregate folds them into the labels, and TWO bucketed
      label self-joins apply pointer-doubling shortcuts (L ← L[L]) — the
      label gap grows multiplicatively per round, so chains converge in
      O(log diameter) rounds instead of O(diameter).  All stages of a
      round pipeline inside one streaming execution.

    Convergence is detected distributively: labels are monotonically
    non-increasing, so the fixpoint is reached exactly when Σ labels stops
    changing (computed by a task over the materialized label block refs —
    no extra Dataset job, no driver-side dict comparison).
    Returns a Dataset (doc_id, cluster)."""
    import warnings

    import ray
    import ray.data

    from ..functions.shuffle import grouped_aggregate, hash_mod

    raw = pairs_ds.map_batches(
        lambda t: pa.table({
            "id1": pa.compute.cast(t.column("id1"), pa.int64()),
            "id2": pa.compute.cast(t.column("id2"), pa.int64())}),
        batch_format="pyarrow").materialize()
    n_edges = raw.count()
    if strategy == "auto":
        if (n_edges <= local_max_edges
                and (raw.size_bytes() or 0) <= local_max_bytes):
            strategy = "local"
        else:
            # node-bounded middle tier: duplicate-heavy corpora can blow
            # the EDGE-table gate while the label map still fits a worker
            # (one map-side lookup per round beats two bucketed self-joins);
            # the labels.count() gate below demotes to "join" when the
            # node count exceeds broadcast_max_nodes
            strategy = "broadcast"

    if strategy == "local":
        ref = _worker_side(_cc_local_task, raw)
        return ray.data.from_arrow_refs([ref])

    def explode(batch: pa.Table) -> pa.Table:
        # undirected edges → both directions
        a = batch.column("id1").combine_chunks()
        b = batch.column("id2").combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    edges = raw.map_batches(explode, batch_format="pyarrow").materialize()
    # bucket count bounds reduce-group size (≈250k edge rows per group)
    num_buckets = max(8, min(4096, 2 * n_edges // 250_000 + 1))
    # pre-bucketed edge copy for the join strategy — built lazily on
    # first use so the broadcast fast path never pays its extra shuffle
    # and materialization
    edges_b = None
    # initial label = own id
    labels = grouped_aggregate(
        edges.select_columns(["node"]).map_batches(
            lambda t: t.append_column("label", t.column("node")),
            batch_format="pyarrow"),
        keys=["node"], specs=[("label", "min")], rename={"label_min": "label"},
    ).materialize()
    if strategy == "broadcast" and labels.count() > broadcast_max_nodes:
        strategy = "join"

    def _neighbor_min(df: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket: edge rows (node, nbr) + label rows for every
        node hashing here → per-node min over neighbor labels (fused
        join + combiner: one exchange per round instead of two)."""
        is_edge = df["nbr"].notna()
        lab = dict(zip(df.loc[~is_edge, "node"], df.loc[~is_edge, "label"]))
        e = df[is_edge]
        nl = e["nbr"].map(lab)
        out = (pd.DataFrame({"node": e["node"].to_numpy(),
                             "label": nl.to_numpy()})
               .groupby("node", sort=False)["label"].min().reset_index())
        out["node"] = out["node"].astype("int64")
        out["label"] = out["label"].astype("int64")
        return out

    def _shortcut(lab_ds):
        """One pointer-doubling round L(v) ← L(L(v)) as a bucketed label
        self-join: query rows keyed by the label value, map rows keyed by
        the node id (every label value IS a node, so lookups always hit).
        Moves only the label table — never the edges.  Both row kinds are
        emitted by ONE pass over ``lab_ds`` (a union of two branches of
        the same lazy parent would re-execute the parent per branch)."""
        def emit(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            label = t.column("label").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            n = len(node)
            nulls = np.full(n, -1, np.int64)
            key = np.concatenate([label, node])     # q keyed by label,
            nodes = np.concatenate([node, nulls])   # map keyed by node
            labs = np.concatenate([nulls, label])
            ismap = np.concatenate([np.zeros(n, bool), np.ones(n, bool)])
            out = pa.table({"key": pa.array(key, pa.int64()),
                            "node": pa.array(nodes, pa.int64()),
                            "label": pa.array(labs, pa.int64()),
                            "_m": pa.array(ismap)})
            return out.append_column(
                "_b", hash_mod(out.column("key"), num_buckets))

        def resolve(df: pd.DataFrame) -> pd.DataFrame:
            is_map = df["_m"].to_numpy()
            lab = dict(zip(df.loc[is_map, "key"], df.loc[is_map, "label"]))
            qq = df[~is_map]
            return pd.DataFrame({
                "node": qq["node"].to_numpy().astype("int64"),
                "label": qq["key"].map(lab).to_numpy().astype("int64")})

        return (lab_ds.map_batches(emit, batch_format="pyarrow")
                .groupby("_b").map_groups(resolve, batch_format="pandas"))

    prev_sum = _dataset_sum(labels, "label")
    converged = False
    for _ in range(max_rounds):
        if strategy == "broadcast":
            # root map rebuilt worker-side each round from the
            # materialized labels' block refs — no per-round driver pull
            lab_ref = _worker_side(_build_root_map, labels, "node", "label")
            msgs = edges.map_batches(_propagate_rootmap,
                                     batch_format="pyarrow",
                                     fn_kwargs={"lab_ref": lab_ref})
        else:
            if edges_b is None:
                # bucket edges by hash(nbr) ONCE — the per-round shuffle
                # then moves only the (much smaller) label table
                edges_b = edges.map_batches(
                    lambda t: t.append_column(
                        "_b", hash_mod(t.column("nbr"), num_buckets)),
                    batch_format="pyarrow").materialize()
            # label rows join the edge buckets keyed by hash(label.node)
            # == hash(edge.nbr); nbr=null marks the label side
            lab_tagged = labels.map_batches(
                lambda t: pa.table({
                    "node": t.column("node"),
                    "nbr": pa.nulls(t.num_rows, pa.int64()),
                    "label": t.column("label"),
                    "_b": hash_mod(t.column("node"), num_buckets)}),
                batch_format="pyarrow")
            edge_side = edges_b.map_batches(
                lambda t: t.append_column("label",
                                          pa.nulls(t.num_rows, pa.int64())),
                batch_format="pyarrow")
            msgs = (edge_side.union(lab_tagged)
                    .groupby("_b")
                    .map_groups(_neighbor_min, batch_format="pandas"))
        labels = grouped_aggregate(
            msgs.union(labels.select_columns(["node", "label"])),
            keys=["node"], specs=[("label", "min")],
            rename={"label_min": "label"},
            num_buckets=num_buckets)
        if strategy == "join":
            # two pointer-doubling shortcuts pipelined into the same
            # execution as the hook round (no extra materialize barrier)
            labels = _shortcut(_shortcut(labels))
        labels = labels.materialize()
        s = _dataset_sum(labels, "label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        warnings.warn(f"neardup_clusters_distributed: not converged within "
                      f"{max_rounds} rounds; components with diameter > "
                      f"{max_rounds} may be split")
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]),
        batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over word features; near-dups share bucket prefixes.

    The batch path is vectorized (the r4 audit's last per-row text
    kernel): tokens are md5-hashed once per DISTINCT token (cached
    across batches on the instance — actor-pool state), then one
    ``np.add.reduceat`` pass over a (n_tokens, 64) ±1 bit matrix sums
    all documents at once.  Bit-identical to :meth:`simhash64` (the
    scalar reference form, kept for tests/golds)."""

    def __init__(self, prefix_bits: int = 16):
        self.prefix_bits = prefix_bits
        self._tok_cache: dict[str, bytes] = {}

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

    def _simhash_batch(self, texts: list) -> np.ndarray:
        """Vectorized simhash64 over a batch → uint64 array."""
        toks = [_WORD_RE.findall((t or "").lower()) for t in texts]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=len(toks))
        flat = [w for ts in toks for w in ts]
        if not flat:
            return np.zeros(len(texts), dtype=np.uint64)
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        rows = np.empty((len(uniq), 8), dtype=np.uint8)
        cache = self._tok_cache
        for i, tok in enumerate(uniq):
            b = cache.get(tok)
            if b is None:
                b = hashlib.md5(tok.encode()).digest()[:8]
                if len(cache) > 1_000_000:   # bound actor memory
                    cache.clear()
                cache[tok] = b
            rows[i] = np.frombuffer(b, dtype=np.uint8)
        # per-distinct-token ±1 bit rows (MSB-first per byte, little-
        # endian byte order — the exact layout of the scalar form)
        signed_u = np.unpackbits(rows, axis=1).astype(np.int16) * 2 - 1
        signed = signed_u[codes]                       # (n_tokens, 64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        v = np.zeros((len(texts), 64), dtype=np.int32)
        nonempty = lens > 0
        if nonempty.any():
            # reduceat treats an empty segment as a 1-element slice, so
            # compute only non-empty docs and scatter back
            v[nonempty] = np.add.reduceat(signed, starts[nonempty],
                                          axis=0, dtype=np.int32)
        packed = np.packbits((v > 0).astype(np.uint8), axis=1)
        # explicit little-endian view: matches the scalar form's
        # int.from_bytes(..., 'little') on any host byte order
        return packed.view(np.dtype("<u8")).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        hs = self._simhash_batch(batch.column("text").to_pylist())
        buckets = (hs >> np.uint64(64 - self.prefix_bits)).astype(np.int64)
        # int64 view of the 64-bit fingerprint (wraps negative) so the
        # column survives engines whose canonical integer type is int64
        hs64 = hs.astype(np.int64)
        return pa.table({"doc_id": ids,
                         "simhash": pa.array(hs64, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64())})


def ngram_jaccard(text1: str, text2: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel for candidates)."""
    s1, s2 = set(_shingles(text1, k)), set(_shingles(text2, k))
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)


# --- benchmark decontamination ---------------------------------------------

def _doc_gram_set(text: str, n: int) -> set:
    w = (text or "").split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _gram_rows_vec(batch: pa.Table, n: int, text_col: str):
    """Vectorized word n-gram explode — the batch form of
    :func:`_doc_gram_set`: one space-split + flatten, n-gram strings
    from ``n`` shifted slices joined element-wise in Arrow, adjacency
    masked to stay within one row, then DISTINCT (row, gram) via one
    group.  Returns ``(row_ids, grams)`` with row_ids into the batch."""
    import pyarrow.compute as pc

    from .textstats import _space_tokens

    empty = (np.array([], np.int64), pa.array([], pa.string()))
    flat, rows, _ = _space_tokens(batch.column(text_col))
    if len(flat) < n:
        return empty
    width = len(flat) - n + 1
    same = rows[n - 1:] == rows[:width]
    if not same.any():
        return empty
    parts = [flat.slice(i, width) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    sel = pa.array(same)
    t = (pa.table({"_r": pa.array(rows[:width][same], pa.int64()),
                   "gram": grams.filter(sel)})
         .group_by(["_r", "gram"]).aggregate([]))
    return t.column("_r").to_numpy(), t.column("gram")


def decontaminate(docs, n: int = 8, bench_mod: int = 50,
                  text_col: str = "text",
                  strategy: str = "broadcast",
                  num_buckets: int | None = None,
                  broadcast_max_grams: int = 10_000_000,
                  broadcast_max_bytes: int = 512 << 20):
    """Benchmark decontamination — the training-set hygiene op of every
    large-scale LLM pipeline: flag training documents that share any
    word ``n``-gram with a benchmark/eval subset (here the deterministic
    stand-in ``doc_id % bench_mod == 0``).

    ``strategy="broadcast"`` (default): the benchmark's distinct
    n-grams become a frozenset broadcast once via ``ray.put``; each
    training batch intersects per document map-side.  Right whenever
    the eval set is eval-set-sized (MMLU/GSM8K etc. are ≤ 10^7 grams).

    ``strategy="join"``: the open-web-scale path when the benchmark
    itself is huge — distinct (doc_id, gram) rows explode from the
    training side, distinct grams from the benchmark side, bucketed
    hash semi-join on gram, then a per-doc sum with zero rows unioned
    in so uncontaminated docs still appear.

    Output: (doc_id, contaminated_grams, contaminated) for
    NON-benchmark docs; ``contaminated_grams`` counts DISTINCT shared
    grams (SQL-oracle-reproducible)."""
    import pyarrow.compute as pc

    from ..functions.shuffle import default_num_buckets, grouped_aggregate

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def _mod_filter(batch: pa.Table, want_bench: bool) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array((ids % bench_mod == 0) == want_bench))

    bench = docs.map_batches(_mod_filter, batch_format="pyarrow",
                             fn_kwargs={"want_bench": True})
    train = docs.map_batches(_mod_filter, batch_format="pyarrow",
                             fn_kwargs={"want_bench": False})

    def bench_grams(batch: pa.Table) -> pa.Table:
        _, grams = _gram_rows_vec(batch, n, text_col)
        return (pa.table({"gram": grams})
                .group_by("gram").aggregate([]))   # distinct per batch

    bgrams_raw = None
    if strategy == "broadcast":
        # count- AND byte-gated (per-batch-distinct gram rows upper-bound
        # the distinct count and bytes): an oversized benchmark falls
        # through to the bucketed join path instead of an object-store /
        # worker-heap blowup — and the frozenset itself is built in a
        # Ray TASK from block refs, so nothing gram-sized ever lands on
        # the driver (round-3 fix: replaces a limit().to_pandas() pull)
        bgrams_raw = (bench.map_batches(bench_grams, batch_format="pyarrow")
                      .materialize())
        if (bgrams_raw.count() > broadcast_max_grams
                or (bgrams_raw.size_bytes() or 0) > broadcast_max_bytes):
            strategy = "join"
        else:
            ref = _worker_side(_build_frozenset, bgrams_raw, "gram")

            def score(batch: pa.Table) -> pa.Table:
                bs = _cached_get(ref)
                rows, grams = _gram_rows_vec(batch, n, text_col)
                # gram extraction is vectorized; membership is a tight
                # C-level set probe per DISTINCT (doc, gram) pair
                hit = np.fromiter((g in bs for g in grams.to_pylist()),
                                  dtype=bool, count=len(rows))
                counts = np.bincount(rows[hit],
                                     minlength=batch.num_rows)
                arr = pa.array(counts.astype(np.int64), pa.int64())
                return pa.table({
                    "doc_id": batch.column("doc_id"),
                    "contaminated_grams": arr,
                    "contaminated": pc.greater(arr, 0),
                })

            return train.map_batches(score, batch_format="pyarrow")

    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    from ..functions.join import bucketed_hash_join

    # distinct bench grams (bench_grams dedupes per batch only); reuse
    # the materialized gram rows when the broadcast gate already built them
    bgrams = grouped_aggregate(
        bgrams_raw if bgrams_raw is not None
        else bench.map_batches(bench_grams, batch_format="pyarrow"),
        keys=["gram"], specs=[("gram", "count")],
        num_buckets=num_buckets).drop_columns(["gram_count"])

    def train_grams(batch: pa.Table) -> pa.Table:
        rows, grams = _gram_rows_vec(batch, n, text_col)   # distinct/doc
        ids = pc.cast(batch.column("doc_id"), pa.int64()) \
            .take(pa.array(rows, pa.int64()))
        return pa.table({"doc_id": ids, "gram": grams})

    hits = bucketed_hash_join(
        train.map_batches(train_grams, batch_format="pyarrow"),
        bgrams, "gram", "gram", num_buckets=num_buckets)

    def hit_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "nc": pa.array([1] * batch.num_rows, pa.int64())})

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "nc": pa.array([0] * batch.num_rows, pa.int64())})

    counted = grouped_aggregate(
        hits.map_batches(hit_rows, batch_format="pyarrow").union(
            train.map_batches(zero_rows, batch_format="pyarrow")),
        keys=["doc_id"], specs=[("nc", "sum")],
        num_buckets=num_buckets, rename={"nc_sum": "contaminated_grams"})

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "contaminated",
            pc.greater(batch.column("contaminated_grams"), 0))

    return counted.map_batches(finish, batch_format="pyarrow")


def cross_doc_ngram_stats(docs, n: int = 8, text_col: str = "text",
                          num_buckets: int | None = None,
                          dup_broadcast_max: int = 2_000_000,
                          dup_broadcast_max_bytes: int = 512 << 20):
    """Cross-document n-gram duplication metrics — the shuffle-shaped
    cousin of exact-substring training-data dedup: for each document,
    how many of its DISTINCT word n-grams also appear in at least one
    OTHER document, and the fraction.

    Fully distributed (no broadcast): distinct (gram, doc_id) rows
    explode map-side; a bucketed gram aggregate counts documents per
    gram (rows are distinct per doc, so count == distinct-doc count);
    grams with count ≥ 2 semi-join back; a per-doc sum over the union
    of hit markers and total markers yields (n_grams, shared_grams).
    Documents with fewer than ``n`` words emit no grams and are absent
    from the output (mirrored by the SQL oracle)."""
    import pyarrow.compute as pc

    from ..functions.join import bucketed_hash_join
    from ..functions.shuffle import default_num_buckets, grouped_aggregate

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def gram_rows(batch: pa.Table) -> pa.Table:
        rows, grams = _gram_rows_vec(batch, n, text_col)   # distinct/doc
        ids = pc.cast(batch.column("doc_id"), pa.int64()) \
            .take(pa.array(rows, pa.int64()))
        return pa.table({"doc_id": ids, "gram": grams})

    # three consumers (gram aggregate, join left side, total markers) —
    # materialize the explode once or it re-executes per consumer
    doc_grams = docs.map_batches(gram_rows,
                                 batch_format="pyarrow").materialize()
    gram_counts = grouped_aggregate(
        doc_grams, keys=["gram"], specs=[("doc_id", "count")],
        num_buckets=num_buckets, rename={"doc_id_count": "dc"})
    dup = (gram_counts.filter(expr="dc >= 2")
           .drop_columns(["dc"]).materialize())

    if (dup.count() <= dup_broadcast_max
            and (dup.size_bytes() or 0) <= dup_broadcast_max_bytes):
        # duplicated grams are usually a small fraction of the gram
        # space — broadcast them as a set and finish in ONE map over
        # the docs (skips the semi-join and the marker aggregate, each
        # a full shuffle stage); the join path below is the fallback
        # when the dup set itself is object-store-sized.  Count- AND
        # byte-gated; the frozenset is built in a Ray task from block
        # refs (no driver to_pandas pull)
        ref = _worker_side(_build_frozenset, dup, "gram")

        def score(batch: pa.Table) -> pa.Table:
            ds_ = _cached_get(ref)
            rows, grams = _gram_rows_vec(batch, n, text_col)
            tot = np.bincount(rows, minlength=batch.num_rows)
            hit = np.fromiter((g in ds_ for g in grams.to_pylist()),
                              dtype=bool, count=len(rows))
            sh = np.bincount(rows[hit], minlength=batch.num_rows)
            keep = tot > 0   # docs with < n words emit no grams
            ids = pc.cast(batch.column("doc_id"), pa.int64()) \
                .to_numpy(zero_copy_only=False)[keep]
            tot_a = pa.array(tot[keep].astype(np.int64), pa.int64())
            sh_a = pa.array(sh[keep].astype(np.int64), pa.int64())
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": tot_a,
                "shared_grams": sh_a,
                "shared_frac": pc.divide(
                    pc.cast(sh_a, pa.float64()),
                    pc.cast(tot_a, pa.float64())),
            })

        return docs.map_batches(score, batch_format="pyarrow")

    hits = bucketed_hash_join(doc_grams, dup, "gram", "gram",
                              num_buckets=num_buckets)

    def mark(batch: pa.Table, shared: int) -> pa.Table:
        one = pa.array([shared] * batch.num_rows, pa.int64())
        tot = pa.array([1 - shared] * batch.num_rows, pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "s": one, "t": tot})

    counted = grouped_aggregate(
        hits.map_batches(mark, batch_format="pyarrow",
                         fn_kwargs={"shared": 1}).union(
            doc_grams.map_batches(mark, batch_format="pyarrow",
                                  fn_kwargs={"shared": 0})),
        keys=["doc_id"], specs=[("s", "sum"), ("t", "sum")],
        num_buckets=num_buckets,
        rename={"s_sum": "shared_grams", "t_sum": "n_grams"})

    def finish(batch: pa.Table) -> pa.Table:
        frac = pc.divide(
            pc.cast(batch.column("shared_grams"), pa.float64()),
            pc.cast(batch.column("n_grams"), pa.float64()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_grams": batch.column("n_grams"),
            "shared_grams": batch.column("shared_grams"),
            "shared_frac": frac,
        })

    return counted.map_batches(finish, batch_format="pyarrow")


def jaccard_neardup_pairs(docs, n: int = 8, threshold: float = 0.5,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_buckets: int | None = None,
                          max_posting: int = 5_000):
    """EXACT word n-gram Jaccard near-duplicate pairs — the verify-grade
    member of the dedup family (MinHash+LSH estimates this; SimHash
    approximates Hamming-projected cosine): every unordered doc pair
    whose distinct-n-gram Jaccard similarity meets ``threshold``, with
    the exact score.

    Shape: distinct (doc, gram) rows explode map-side (the shared
    :func:`_gram_rows_vec` kernel), each CARRYING its doc's distinct-gram
    count ``ng`` — a doc is one input row, so the count is final inside
    the producing batch and the union denominator needs no per-doc
    aggregate, no join, and nothing on the driver.  A bucketed gram
    exchange emits co-occurring (id1 < id2, ng1, ng2) pair rows per
    gram, partially aggregated inside the reduce group; a pair aggregate
    sums intersection counts (ng carried by ``min`` — constant per doc).
    Two exchanges total.

    Cost model: a gram shared by m docs costs C(m, 2) pair rows — the
    inherent price of exactness.  Word 8-grams co-occur essentially only
    between near-duplicates, so posting lists stay tiny on natural text;
    boilerplate-heavy corpora (license headers shared by 10^6 docs)
    must use :func:`minhash_neardup_pairs` as the recall/scale path and
    reserve this operator for verifying its candidates.

    Docs with fewer than ``n`` words emit no grams and cannot pair
    (mirrored by the SQL oracle).  The threshold compares the UNROUNDED
    ratio; the output ``jaccard`` is rounded to 6 places (both oracle
    conventions, NOTES item 40a).

    ``max_posting`` is a loud guard, not a silent cap: a posting list
    longer than it (a boilerplate gram) raises instead of emitting
    C(m, 2) rows — truncation would break the operator's exactness
    contract, so the failure names the gram and points at MinHash.
    The default bounds one run's pair block at C(5000, 2) ≈ 12.5M rows
    (~400 MB) — small enough that the ValueError fires before the
    allocation would OOM the reduce task; a second guard bounds the
    SUM of pair rows across all runs in one reduce group (many
    medium-hot grams), which the per-run cap alone would miss."""
    import pyarrow.compute as pc

    from ..functions.shuffle import (default_num_buckets, grouped_aggregate,
                                     hash_mod)

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def gram_rows(batch: pa.Table) -> pa.Table:
        rows, grams = _gram_rows_vec(batch, n, text_col)
        ids = pc.cast(batch.column(id_col), pa.int64()) \
            .take(pa.array(rows, pa.int64()))
        ng = (np.bincount(rows, minlength=batch.num_rows)[rows]
              if len(rows) else np.array([], np.int64))
        t = pa.table({"_id": ids, "gram": grams,
                      "ng": pa.array(ng, pa.int64())})
        return t.append_column(
            "_bucket", hash_mod(t.column("gram"), num_buckets))

    doc_grams = docs.map_batches(gram_rows, batch_format="pyarrow")

    def emit_pairs(t: pa.Table) -> pa.Table:
        # rows within the bucket, sorted by (gram, id) → runs are
        # posting lists with ascending ids; only runs of length ≥ 2
        # produce pairs.  Vectorized by grouping runs of EQUAL length
        # (posting lists are tiny on natural text, so only a handful of
        # distinct lengths exist) — no per-gram Python loop.
        empty = pa.table({"id1": pa.array([], pa.int64()),
                          "id2": pa.array([], pa.int64()),
                          "inter": pa.array([], pa.int64()),
                          "ng1": pa.array([], pa.int64()),
                          "ng2": pa.array([], pa.int64())})
        t = t.sort_by([("gram", "ascending"), ("_id", "ascending")])
        g = t.column("gram").to_numpy(zero_copy_only=False)
        ids = t.column("_id").to_numpy(zero_copy_only=False)
        ngs = t.column("ng").to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return empty
        bounds = np.flatnonzero(g[1:] != g[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        lens = np.diff(np.concatenate((starts, [len(g)])))
        if lens.max() > max_posting:
            hot = g[starts[int(lens.argmax())]]
            raise ValueError(
                f"gram shared by {int(lens.max())} docs (> max_posting="
                f"{max_posting}): {hot[:80]!r} — exact Jaccard is "
                "quadratic per posting list; use minhash_neardup_pairs "
                "for boilerplate-heavy corpora or raise max_posting")
        total_pairs = int((lens * (lens - 1) // 2).sum())
        if total_pairs > max_posting * (max_posting - 1) // 2:
            raise ValueError(
                f"{total_pairs} co-occurrence pairs in one reduce group "
                "(many medium-hot grams; group size scales with "
                "1/num_buckets) — raise num_buckets to spread the grams, "
                "use minhash_neardup_pairs for boilerplate-heavy corpora, "
                "or raise max_posting")
        keep = lens >= 2
        starts, lens = starts[keep], lens[keep]
        a_parts, b_parts = [], []
        for m in np.unique(lens):
            runs = starts[lens == m]            # (R,) run offsets
            i1, i2 = np.triu_indices(int(m), 1)  # (P,) in-run pairs
            a_parts.append((runs[:, None] + i1[None, :]).ravel())
            b_parts.append((runs[:, None] + i2[None, :]).ravel())
        if not a_parts:
            return empty
        ai = np.concatenate(a_parts)
        bi = np.concatenate(b_parts)
        pairs = pa.table({
            "id1": pa.array(ids[ai], pa.int64()),
            "id2": pa.array(ids[bi], pa.int64()),
            "ng1": pa.array(ngs[ai], pa.int64()),
            "ng2": pa.array(ngs[bi], pa.int64())})
        # partial aggregate inside the reduce group: one row per pair
        # per bucket leaves here, not one per shared gram
        part = pairs.group_by(["id1", "id2"]).aggregate(
            [("id1", "count"), ("ng1", "min"), ("ng2", "min")])
        return part.rename_columns(["id1", "id2", "inter", "ng1", "ng2"])

    inter = grouped_aggregate(
        doc_grams.groupby("_bucket")
        .map_groups(emit_pairs, batch_format="pyarrow"),
        keys=["id1", "id2"],
        specs=[("inter", "sum"), ("ng1", "min"), ("ng2", "min")],
        num_buckets=num_buckets,
        rename={"inter_sum": "inter", "ng1_min": "ng1", "ng2_min": "ng2"})

    def finish(batch: pa.Table) -> pa.Table:
        i = pc.cast(batch.column("inter"), pa.float64())
        union = pc.subtract(
            pc.add(pc.cast(batch.column("ng1"), pa.float64()),
                   pc.cast(batch.column("ng2"), pa.float64())), i)
        j = pc.divide(i, union)
        keep = pc.greater_equal(j, threshold)   # unrounded compare
        out = pa.table({"id1": batch.column("id1"),
                        "id2": batch.column("id2"),
                        "jaccard": pc.round(j, 6)})
        return out.filter(keep)

    return inter.map_batches(finish, batch_format="pyarrow")


def anti_semi_join(docs, ids_ds, id_col: str = "doc_id",
                   broadcast_max_rows: int = 50_000_000,
                   broadcast_max_bytes: int = 512 << 20):
    """Drop every docs row whose ``id_col`` appears in ``ids_ds`` — the
    shared ACTION kernel of dedup_apply / decontamination / curation
    drop steps.  The id set is dup/contamination-bounded (≪ corpus), so
    the default path broadcasts it as a worker-built SORTED array probed
    with one searchsorted per batch (row- AND byte-gated); above the
    caps it falls back to a bucketed anti-join (left join + null
    filter)."""
    import pyarrow.compute as pc

    ids_ds = ids_ds.select_columns([id_col]).materialize()
    n = ids_ds.count()
    if n == 0:
        return docs
    if (n <= broadcast_max_rows
            and (ids_ds.size_bytes() or 0) <= broadcast_max_bytes):
        def build_sorted(col, *tables):
            arrs = [t.column(col).to_numpy(zero_copy_only=False)
                    for t in tables if col in t.column_names]
            return np.sort(np.concatenate(arrs)) if arrs \
                else np.empty(0, np.int64)

        ref = _worker_side(build_sorted, ids_ds, id_col)

        def keep(batch: pa.Table) -> pa.Table:
            # vectorized membership: sorted-array searchsorted probe, no
            # per-row Python set lookups on the full-corpus scan
            drop = _cached_get(ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(drop, ids)
            pos = np.minimum(pos, max(len(drop) - 1, 0))
            hit = (drop[pos] == ids) if len(drop) else \
                np.zeros(len(ids), bool)
            return batch.filter(pa.array(~hit))

        return docs.map_batches(keep, batch_format="pyarrow")

    from ..functions.join import bucketed_hash_join

    marked = ids_ds.map_batches(
        lambda t: t.append_column("_drop", pa.array([True] * t.num_rows)),
        batch_format="pyarrow")
    joined = bucketed_hash_join(docs, marked, left_on=id_col,
                                right_on=id_col, how="left")

    def keep_unmarked(t: pa.Table) -> pa.Table:
        return (t.filter(pc.is_null(t.column("_drop")))
                .drop_columns(["_drop"]))

    return joined.map_batches(keep_unmarked, batch_format="pyarrow")


def dedup_apply(docs, clusters, id_col: str = "doc_id",
                broadcast_max_rows: int = 50_000_000,
                broadcast_max_bytes: int = 512 << 20):
    """The ACTION step of near-dup dedup: drop every cluster member
    except its head (cluster label == id), keep all un-clustered docs —
    i.e. :func:`anti_semi_join` over the loser set."""
    losers = clusters.filter(expr=f"cluster != {id_col}")
    return anti_semi_join(docs, losers, id_col=id_col,
                          broadcast_max_rows=broadcast_max_rows,
                          broadcast_max_bytes=broadcast_max_bytes)
