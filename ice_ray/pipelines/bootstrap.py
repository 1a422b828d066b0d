"""Relation-pattern bootstrap from seed paths (J3/C5/K4:
relation/Bootstrap.java:308-391 scoreUsingSharedArguments).

Shared-argument semi-join, Ray shape per SURVEY §2.4 J3:
seed instances → distinct arg pairs (broadcast, small) → candidate
(path, arg_pair) rows filtered by the broadcast pair set →
groupby(path) distinct-pair count = score → sort desc, MIN_RELATION_COUNT
floor, MAX_BOOTSTRAPPED_ITEMS cap, repr-dedup (D2) and seed/reject
anti-join (D4).

Also the embedding variant (C6, Bootstrap.java:398-452): cosine of
candidate repr embedding vs seed centroid, with phrase embedding =
Σ word embeddings (F6, WordEmbedding.java:72-98).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import MAX_BOOTSTRAPPED_ITEMS, MIN_RELATION_COUNT


def _arg_pair(batch: pa.Table) -> pa.Table:
    pair = pc.binary_join_element_wise(
        pc.utf8_lower(batch.column("arg1_text")),
        pc.utf8_lower(batch.column("arg2_text")), ":")
    return batch.append_column("arg_pair", pair)


def bootstrap_shared_args(paths, seed_paths: list[str],
                          rejects: set[str] | None = None,
                          max_items: int = MAX_BOOTSTRAPPED_ITEMS,
                          min_shared: int = MIN_RELATION_COUNT):
    """→ pandas (path, score, n_shared_pairs) candidates, ranked.

    ``paths`` is the extraction dataset (core/extract.py rows); ``path``
    keys here are the bare (untyped) path strings like the reference's
    AnchoredPath.path.
    """
    import ray

    from ..functions.shuffle import grouped_aggregate

    rejects = rejects or set()
    keyed = paths.map_batches(_arg_pair, batch_format="pyarrow").materialize()

    seed_set = set(seed_paths)
    # broadcast is_in mask, not expression-string interpolation — holds
    # for arbitrarily large seed sets
    seed_arr_ref = ray.put(pa.array(sorted(seed_set), pa.string()))

    def seed_filter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("path"), value_set=ray.get(seed_arr_ref))
        return batch.filter(mask).select(["arg_pair"])

    seed_pairs = {r["arg_pair"] for r in
                  keyed.map_batches(seed_filter, batch_format="pyarrow")
                       .iter_rows()}
    if not seed_pairs:
        return None
    pairs_ref = ray.put(seed_pairs)

    class SharedFilter:
        def __init__(self):
            self.pairs = ray.get(pairs_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = [p in self.pairs for p in batch.column("arg_pair").to_pylist()]
            return batch.filter(pa.array(mask)).select(["path", "arg_pair"])

    shared = keyed.map_batches(SharedFilter, batch_format="pyarrow",
                               concurrency=(1, 4))
    # distinct (path, arg_pair) then count per path = |shared arg pairs|
    distinct = grouped_aggregate(shared, keys=["path", "arg_pair"],
                                 specs=[("path", "count")],
                                 rename={"path_count": "_n"})
    per_path = grouped_aggregate(distinct, keys=["path"],
                                 specs=[("path", "count")],
                                 rename={"path_count": "n_shared_pairs"})
    pdf = per_path.to_pandas()
    pdf = pdf[~pdf["path"].isin(seed_set) & ~pdf["path"].isin(rejects)]
    pdf = pdf[pdf["n_shared_pairs"] >= min_shared]
    pdf["score"] = pdf["n_shared_pairs"].astype(float)
    pdf = pdf.sort_values(["score", "path"], ascending=[False, True],
                          kind="mergesort").head(max_items)
    return pdf.reset_index(drop=True)


def phrase_embedding(phrase: str, emb: dict[str, list[float]]) -> list[float] | None:
    """Σ word embeddings; OOV words fall back to the ',' vector
    (WordEmbedding.java:72-98)."""
    import numpy as np

    vecs = []
    for w in phrase.lower().split():
        v = emb.get(w, emb.get(","))
        if v is not None:
            vecs.append(v)
    if not vecs:
        return None
    return list(np.sum(np.asarray(vecs, dtype=np.float64), axis=0))


def bootstrap_embeddings(candidates, seed_reprs: list[str],
                         emb: dict[str, list[float]],
                         max_items: int = MAX_BOOTSTRAPPED_ITEMS):
    """C6: score = cosine(candidate repr phrase-embedding, seed centroid)."""
    import numpy as np
    import pandas as pd

    seed_vecs = [phrase_embedding(r, emb) for r in seed_reprs]
    seed_vecs = [v for v in seed_vecs if v is not None]
    if not seed_vecs:
        return pd.DataFrame({"path": [], "repr": [], "score": []})
    centroid = np.sum(np.asarray(seed_vecs), axis=0)
    cn = np.linalg.norm(centroid)
    rows = []
    for r in candidates.iter_rows():
        v = phrase_embedding(r["repr"], emb)
        if v is None:
            continue
        v = np.asarray(v)
        n = np.linalg.norm(v)
        score = float(v @ centroid / (n * cn)) if n and cn else 0.0
        rows.append((r["typed_path"], r["repr"], round(score, 6)))
    pdf = pd.DataFrame(rows, columns=["path", "repr", "score"])
    # repr-dedup, one per normalized repr (D2)
    pdf = (pdf.sort_values(["score", "path"], ascending=[False, True],
                           kind="mergesort")
           .drop_duplicates("repr").head(max_items))
    return pdf.reset_index(drop=True)
