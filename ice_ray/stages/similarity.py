"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k against a broadcast query matrix: numpy matmul
  per batch, per-batch partial top-k, tiny driver merge — the baseline;
- LSH-bucketed variant (random hyperplane signs) as the scale path: a
  candidate generation groupby on (query-independent) bucket ids, exact
  re-rank inside buckets;
- embedding-cosine near-duplicate pairs.

Embedding math is float64 (cast once per batch) so results are
bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def centroid_of_label(ds, label: int, col: str = "embedding") -> np.ndarray:
    """Mean vector of rows with ``label`` — streaming partial sums, no
    driver materialization of vectors."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sel = batch.filter(pc.equal(batch["label"], label))
        if sel.num_rows == 0:
            return pa.table({"s": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        m = _batch_matrix(sel, col)
        return pa.table({"s": pa.array([m.sum(axis=0).tolist()]),
                         "n": pa.array([m.shape[0]], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    n = sum(p["n"] for p in parts)
    return total / max(n, 1)


class CosineScorer:
    """Append cosine similarity to a broadcast query vector.

    ``top_k`` set → emit only the batch's exact top-k rows ordered by
    (cosine desc, vec_id asc): the downstream global sort then touches
    ≤ k × num_batches candidate rows instead of every scored row."""

    def __init__(self, query_ref, col: str = "embedding",
                 top_k: int | None = None):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)
        self.qn = np.linalg.norm(self.q)
        self.col = col
        self.top_k = top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        norms = np.linalg.norm(m, axis=1)
        denom = norms * self.qn
        denom[denom == 0] = 1.0
        cos = np.round((m @ self.q) / denom, 6)
        vec_id = batch.column("vec_id")
        if isinstance(vec_id, pa.ChunkedArray):
            vec_id = vec_id.combine_chunks()
        if self.top_k is not None and len(cos) > self.top_k:
            vids = np.asarray(vec_id.to_pylist())
            # exact per-batch order: cosine desc, vec_id asc (tie-safe);
            # take() preserves the input column type so truncated and
            # pass-through batches emit one schema
            order = np.lexsort((vids, -cos))[:self.top_k]
            cos = cos[order]
            vec_id = vec_id.take(pa.array(order))
        return pa.table({
            "vec_id": vec_id,
            "cosine": pa.array(cos, pa.float64()),
        })


def knn_to_vector(ds, query: np.ndarray, k: int = 10, col: str = "embedding"):
    """Brute-force cosine top-k: per-batch partial top-k (exact, tie-broken
    on vec_id) then a tiny global sort over ≤ k·num_batches candidates —
    no all-to-all shuffle of the scored corpus.  Task-based map (scorer
    construction is one ray.get — actor-pool startup would dominate)."""
    qref = ray.put(np.asarray(query, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        return CosineScorer(qref, col=col, top_k=k)(batch)

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


class MultiQueryTopK:
    """Per-batch partial top-k for a broadcast query MATRIX (Q×D): one
    matmul per batch; emits (query_id, vec_id, cosine) candidate rows
    whose per-query count ≤ k — the driver-side merge is Q×k×num_batches
    small."""

    def __init__(self, queries_ref, k: int = 10, col: str = "embedding"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = np.asarray(q, dtype=np.float64)
        self.qn = np.linalg.norm(self.q, axis=1, keepdims=True)
        self.qn[self.qn == 0] = 1.0
        self.k = k
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        vids = np.asarray(batch.column("vec_id").to_pylist())
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = (self.q / self.qn) @ (m / norms).T  # Q × batch
        k = min(self.k, cos.shape[1])
        idx = np.argpartition(-cos, k - 1, axis=1)[:, :k]
        qid, vid, val = [], [], []
        for qi in range(cos.shape[0]):
            for j in idx[qi]:
                qid.append(qi)
                vid.append(int(vids[j]))
                val.append(round(float(cos[qi, j]), 6))
        return pa.table({"query_id": pa.array(qid, pa.int32()),
                         "vec_id": pa.array(vid, pa.int64()),
                         "cosine": pa.array(val, pa.float64())})


def knn_multi_query(ds, queries: np.ndarray, k: int = 10, col: str = "embedding"):
    """→ pandas (query_id, vec_id, cosine) exact top-k per query."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        return MultiQueryTopK(qref, k=k, col=col)(batch)

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in cand.groupby("query_id"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, r.vec_id))
        out.extend(top)
    import pandas as pd
    return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])


def ivf_build(ds, n_centroids: int = 16, col: str = "embedding",
              refine_iters: int = 2, persist_dir: str | None = None):
    """IVF index: deterministic k-means-lite — centroids seeded by a
    deterministic hash-key n-sample (functions/sampling.sample_n: no
    global sort, stable across block layouts), refined with
    ``refine_iters`` Lloyd steps (partial sums per batch, merge on the
    driver), then every vector assigned to its nearest centroid.
    Returns (centroids ndarray, assigned Dataset with a ``centroid_id``
    column).  Pass ``persist_dir`` to also write the assigned vectors as
    parquet partitioned by ``centroid_id`` — ``ivf_search`` can then read
    ONLY the probed partitions (I/O pruning, not a full-scan filter)."""
    from ..functions.sampling import sample_n

    seeds = sample_n(ds.select_columns(["vec_id", col]), n_centroids,
                     id_col="vec_id").sort_values("vec_id")
    if seeds.empty:
        raise ValueError("ivf_build: input dataset has no rows — cannot "
                         "seed centroids")
    centroids = _l2_normalize(
        np.asarray(seeds[col].tolist(), dtype=np.float64))

    import ray

    # SPHERICAL k-means: vectors and centroids are L2-normalized and
    # assignment is by cosine — the same metric the search ranks with
    # (euclidean partitioning misaligns with cosine top-k and costs
    # recall at fixed n_probe)
    for _ in range(refine_iters):
        cref = ray.put(centroids)

        def partial_sums(batch: pa.Table) -> pa.Table:
            cen = ray.get(cref)
            m = _l2_normalize(_batch_matrix(batch, col))
            assign = (m @ cen.T).argmax(axis=1)
            sums, counts = [], []
            for k in range(len(cen)):
                sel = m[assign == k]
                sums.append(sel.sum(axis=0).tolist() if len(sel) else
                            np.zeros(m.shape[1]).tolist())
                counts.append(int(len(sel)))
            return pa.table({"k": pa.array(range(len(cen)), pa.int32()),
                             "s": pa.array(sums, pa.list_(pa.float64())),
                             "n": pa.array(counts, pa.int64())})

        parts = ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
        agg_s = np.zeros_like(centroids)
        agg_n = np.zeros(len(centroids))
        for k, s, n in zip(parts["k"], parts["s"], parts["n"]):
            agg_s[k] += np.asarray(s)
            agg_n[k] += n
        nonzero = agg_n > 0
        centroids[nonzero] = _l2_normalize(agg_s[nonzero])

    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cen = ray.get(cref)
        m = _l2_normalize(_batch_matrix(batch, col))
        return batch.append_column(
            "centroid_id", pa.array((m @ cen.T).argmax(axis=1).astype("int32")))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    if persist_dir is not None:
        assigned.write_parquet(persist_dir, partition_cols=["centroid_id"],
                               mode="overwrite")
    return centroids, assigned


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _nearest_centroids(centroids: np.ndarray, query: np.ndarray,
                       n_probe: int) -> list[int]:
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn else q
    cos = _l2_normalize(centroids) @ q
    return [int(i) for i in np.argsort(-cos, kind="stable")[:n_probe]]


def ivf_search(centroids: np.ndarray, assigned, query: np.ndarray,
               k: int = 10, n_probe: int = 4, col: str = "embedding"):
    """Probe the ``n_probe`` nearest centroid lists, exact cosine re-rank
    inside them.  NOTE: this form filters a live Dataset — the filter
    still scans every block.  For true I/O pruning build with
    ``persist_dir`` and search via ``ivf_search_persisted``."""
    probes = _nearest_centroids(centroids, query, n_probe)
    cand = assigned.filter(expr=f"centroid_id in {probes!r}")
    return knn_to_vector(cand, np.asarray(query, dtype=np.float64),
                         k=k, col=col)


def ivf_search_persisted(centroids: np.ndarray, persist_dir: str,
                         query: np.ndarray, k: int = 10, n_probe: int = 4,
                         col: str = "embedding"):
    """Probe a persisted IVF index: reads ONLY the ``centroid_id=<i>``
    parquet partitions of the probed lists — touches n_probe/n_centroids
    of the stored bytes, the partition-pruned scale path."""
    import os

    import ray.data

    import glob

    probes = _nearest_centroids(centroids, query, n_probe)
    files = sorted(f for i in probes for f in glob.glob(
        os.path.join(persist_dir, f"centroid_id={i}", "*.parquet")))
    cand = ray.data.read_parquet(files)
    return knn_to_vector(cand, np.asarray(query, dtype=np.float64),
                         k=k, col=col)


def _infer_dim(ds, col: str, what: str) -> int:
    """Vector dimensionality from the first row — with a clear error on
    an empty dataset instead of take(1)'s IndexError (ADVICE r4)."""
    rows = ds.take(1)
    if not rows:
        raise ValueError(f"{what}: input dataset has no rows — cannot "
                         f"infer the {col!r} dimensionality")
    return len(rows[0][col])


# near-dup fixture planting (shared by __ray_entry__._q_embedding_neardup
# and the serial gold): the driver testdata's embeddings are isotropic —
# no pairs exist at any useful threshold, so a 0-row == 0-row oracle
# verifies schema only.  Planting EXACT duplicates of the first few
# vectors under offset ids makes the row count non-zero at every sf.
PLANT_DUP_MAX_ID = 20
PLANT_DUP_ID_OFFSET = 10_000_000


def plant_neardup_rows(table: pa.Table,
                       max_id: int = PLANT_DUP_MAX_ID,
                       id_offset: int = PLANT_DUP_ID_OFFSET) -> pa.Table:
    """Append exact duplicates of rows with ``vec_id < max_id`` under
    ``vec_id + id_offset`` — deterministic test-power augmentation."""
    import pyarrow.compute as pc

    ids = pc.cast(table.column("vec_id"), pa.int64())
    head = table.filter(pc.less(ids, max_id))
    i = head.schema.get_field_index("vec_id")
    bumped = head.set_column(
        i, "vec_id",
        pc.cast(pc.add(pc.cast(head.column("vec_id"), pa.int64()),
                       id_offset),
                table.schema.field("vec_id").type))
    return pa.concat_tables([table, bumped])


def embedding_neardup_pairs(ds, threshold: float = 0.95, n_planes: int = 10,
                            seed: int = 42, col: str = "embedding",
                            max_bucket: int = 256):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH candidate
    buckets, exact pairwise cosine verification inside each bucket
    (bounded by ``max_bucket`` — oversized buckets verify against the
    bucket head only, logged via the truncated flag column)."""
    import pandas as pd

    dim = _infer_dim(ds, col, "embedding_neardup_pairs")
    bucketed = ds.map_batches(
        HyperplaneBucketer(dim=dim, n_planes=n_planes, seed=seed, col=col),
        batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray(df[col].tolist(), dtype=np.float64)
        ids = df["vec_id"].to_numpy()
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        n = len(df)
        truncated = n > max_bucket
        if truncated:
            mn, ids = mn[:max_bucket], ids[:max_bucket]
            n = max_bucket
        cos = mn @ mn.T
        out = []
        for i in range(n):
            for j in range(i + 1, n):
                c = round(float(cos[i, j]), 6)
                if c >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out.append((a, b, c, truncated))
        return pd.DataFrame(out, columns=["id1", "id2", "cosine", "truncated"]) \
            .astype({"id1": "int64", "id2": "int64",
                     "cosine": "float64", "truncated": "bool"})

    schema = pa.schema([("id1", pa.int64()), ("id2", pa.int64()),
                        ("cosine", pa.float64()), ("truncated", pa.bool_())])

    def coerce(t: pa.Table) -> pa.Table:
        # empty groups lose their schema through pandas; restore it
        if t.num_rows == 0 or not t.column_names:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return (bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
            .map_batches(coerce, batch_format="pyarrow"))


def _probe_buckets(qb: int, n_planes: int, probe_hamming: int) -> list[int]:
    """Bucket ids within ``probe_hamming`` bit flips of the query's."""
    probes = {qb}
    if probe_hamming >= 1:
        probes |= {qb ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qb ^ (1 << i) ^ (1 << j))
    return sorted(probes)


def lsh_search(bucketed, query: np.ndarray, k: int = 10,
               n_planes: int = 12, seed: int = 42,
               probe_hamming: int = 1, col: str = "embedding"):
    """ANN over a HyperplaneBucketer-bucketed dataset: probe the query's
    bucket plus all buckets within ``probe_hamming`` bit flips, exact
    cosine re-rank inside the probed set (expected candidate share
    ≈ Σ_{d≤h} C(p,d) / 2^p of the corpus).  The bucketer must have been
    built with the same (dim, n_planes, seed).

    NOTE: this form filters a LIVE dataset — the filter still scans
    every block.  At scale, build with :func:`lsh_build`
    (``persist_dir=``) and search via :func:`lsh_search_persisted`,
    which reads only the probed ``bucket=`` partitions (the same I/O
    pruning ``ivf_search_persisted`` does)."""
    q = np.asarray(query, dtype=np.float64)
    bucketer = HyperplaneBucketer(dim=q.shape[0], n_planes=n_planes,
                                  seed=seed, col=col)
    probes = _probe_buckets(bucketer.bucket_of(q), n_planes, probe_hamming)
    cand = bucketed.filter(expr=f"bucket in {probes!r}")
    return knn_to_vector(cand, q, k=k, col=col)


def lsh_build(ds, n_planes: int = 12, seed: int = 42,
              col: str = "embedding", persist_dir: str | None = None):
    """Bucket every vector with :class:`HyperplaneBucketer`; pass
    ``persist_dir`` to also write the bucketed vectors as parquet
    partitioned by ``bucket`` — ``lsh_search_persisted`` then reads ONLY
    the probed partitions (the LSH mirror of ``ivf_build(persist_dir=)``).
    Returns the bucketed Dataset."""
    dim = _infer_dim(ds, col, "lsh_build")
    bucketed = ds.map_batches(
        HyperplaneBucketer(dim=dim, n_planes=n_planes, seed=seed, col=col),
        batch_format="pyarrow")
    if persist_dir is not None:
        bucketed.write_parquet(persist_dir, partition_cols=["bucket"],
                               mode="overwrite")
    return bucketed


def lsh_search_persisted(persist_dir: str, query: np.ndarray, k: int = 10,
                         n_planes: int = 12, seed: int = 42,
                         probe_hamming: int = 1, col: str = "embedding"):
    """Probe a persisted LSH index: reads ONLY the ``bucket=<b>`` parquet
    partitions within the Hamming ball of the query's bucket — touches
    ≈ Σ_{d≤h} C(p,d) / 2^p of the stored bytes instead of full-scan
    filtering a live dataset (the partition-pruned scale path; mirrors
    ``ivf_search_persisted``)."""
    import glob
    import os

    import pyarrow as pa

    import ray.data

    q = np.asarray(query, dtype=np.float64)
    bucketer = HyperplaneBucketer(dim=q.shape[0], n_planes=n_planes,
                                  seed=seed, col=col)
    probes = _probe_buckets(bucketer.bucket_of(q), n_planes, probe_hamming)
    files = sorted(f for b in probes for f in glob.glob(
        os.path.join(persist_dir, f"bucket={b}", "*.parquet")))
    if not files:    # every probed bucket is empty → typed empty result
        return ray.data.from_arrow(pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}))
    cand = ray.data.read_parquet(files)
    return knn_to_vector(cand, q, k=k, col=col)


class HyperplaneBucketer:
    """Random-hyperplane LSH bucket ids (scale path for ANN): vectors in
    the same ``bucket`` are cosine-close candidates; search probes the
    query's bucket (and optionally neighbors at Hamming distance 1)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42,
                 col: str = "embedding"):
        rs = np.random.RandomState(seed)
        self.planes = rs.normal(size=(n_planes, dim))
        self.col = col

    def bucket_of(self, v: np.ndarray) -> int:
        bits = (self.planes @ np.asarray(v, dtype=np.float64)) > 0
        return int(bits @ (1 << np.arange(bits.shape[0])))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        bits = (m @ self.planes.T) > 0
        vals = bits @ (1 << np.arange(bits.shape[1]))
        return batch.append_column("bucket", pa.array(vals.astype(np.int64)))
