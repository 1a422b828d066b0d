"""Entity-set expansion by distributional similarity (C2/G8/K3/K5/K6:
entityset/EntitySetExpander.java:310-430) with the scripted auto-accept
reviewer replacing the GUI mark/rerank loop.

Centroid = Σ seed PMI vectors − GAMMA·Σ negative vectors (GAMMA=0.5,
:23, :417-430); candidates ranked by sparse cosine (F3, :485-500) via a
broadcast-centroid ``map_batches`` + global sort (K3).
"""

from __future__ import annotations

import math

import pyarrow as pa

from ..config import EXPANDER_GAMMA, RECOMMENDATION_TOP_K, SUGGEST_SEED_SAMPLE_SIZE


def _sparse_sum(vectors: list[dict[str, float]], scale: float = 1.0) -> dict[str, float]:
    out: dict[str, float] = {}
    for v in vectors:
        for k, x in v.items():
            out[k] = out.get(k, 0.0) + scale * x
    return out


def sparse_cosine(a: dict[str, float], b: dict[str, float]) -> float:
    if not a or not b:
        return 0.0
    small, big = (a, b) if len(a) <= len(b) else (b, a)
    dot = sum(x * big.get(k, 0.0) for k, x in small.items())
    na = math.sqrt(sum(x * x for x in a.values()))
    nb = math.sqrt(sum(x * x for x in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def inv_cosine(a: dict[str, float], b: dict[str, float]) -> float:
    """Gravitation ``invCosine``: |a||b| / (a·b + 1e-8)
    (entityset/EntitySetExpander.java Gravitation.invCosine:518-532)."""
    small, big = (a, b) if len(a) <= len(b) else (b, a)
    dot = 1e-8 + sum(x * big.get(k, 0.0) for k, x in small.items())
    na = math.sqrt(sum(x * x for x in a.values()))
    nb = math.sqrt(sum(x * x for x in b.values()))
    return (na * nb) / dot


def gravitation(max1: float, max2: float,
                c1: dict[str, float], c2: dict[str, float]) -> float:
    """Cluster affinity ``max1·max2 / invCosine(c1,c2)²`` (F4,
    Gravitation.compute:534-539)."""
    r = inv_cosine(c1, c2)
    return max1 * max2 / (r * r)


def centroid_of(index: dict[str, dict[str, float]], seeds: list[str],
                negatives: list[str] | None = None,
                gamma: float = EXPANDER_GAMMA) -> dict[str, float]:
    c = _sparse_sum([index[s] for s in seeds if s in index])
    if negatives:
        neg = _sparse_sum([index[n] for n in negatives if n in index], -gamma)
        c = _sparse_sum([c, neg])
    return c


def rank_candidates(index_ds, seeds: list[str],
                    negatives: list[str] | None = None,
                    exclude: set[str] | None = None):
    """PMI-index dataset → (term, score) sorted descending; seeds /
    rejects / already-suggested are anti-joined out via a broadcast set
    (D4)."""
    import ray

    from .entity_index import load_index_as_dict

    index = load_index_as_dict(index_ds)  # index is term-vocabulary sized
    centroid = centroid_of(index, seeds, negatives)
    excluded = set(seeds) | set(negatives or ()) | set(exclude or ())
    cen_ref = ray.put(centroid)
    exc_ref = ray.put(excluded)

    class Scorer:
        def __init__(self):
            self.centroid = ray.get(cen_ref)
            self.excluded = ray.get(exc_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            terms = batch.column("term").to_pylist()
            ctxs = batch.column("contexts").to_pylist()
            keep, score = [], []
            for t, cs in zip(terms, ctxs):
                if t in self.excluded:
                    keep.append(False)
                    score.append(0.0)
                    continue
                vec = {c["ctx"]: c["pmi"] for c in cs}
                keep.append(True)
                score.append(round(sparse_cosine(vec, self.centroid), 6))
            out = pa.table({"term": pa.array(terms, pa.string()),
                            "score": pa.array(score, pa.float64())})
            return out.filter(pa.array(keep))

    return (index_ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(1, 4))
            .sort(["score", "term"], descending=[True, False]))


def expand_entity_set(index_ds, seeds: list[str], rounds: int = 3,
                      accept_top_k: int = RECOMMENDATION_TOP_K,
                      accept_threshold: float = 0.05) -> list[str]:
    """Scripted expansion loop: rank → auto-accept top-k above threshold →
    recompute centroid → repeat (the batch replacement for the GUI
    rank/mark/rerank cycle, EntitySetExpander.java:310-397)."""
    accepted = list(seeds)
    for _ in range(rounds):
        ranked = rank_candidates(index_ds, accepted).limit(accept_top_k * 2)
        new = [r["term"] for r in ranked.take(accept_top_k * 2)
               if r["score"] >= accept_threshold and r["term"] not in accepted]
        if not new:
            break
        accepted.extend(new[:accept_top_k])
    return accepted


def suggest_seeds(index_ds, sample_size: int = SUGGEST_SEED_SAMPLE_SIZE) -> list[str]:
    """Seed suggestion via agglomerative clustering over the first
    ``sample_size`` qualifying terms (C1, EntitySetExpander.java:129-217):
    merge closest clusters until a cluster exceeds 4 members or fewer than
    3 clusters remain; return the best cluster's two nearest-centroid
    terms."""
    from .entity_index import load_index_as_dict

    sample_rows = index_ds.limit(sample_size)
    index = load_index_as_dict(sample_rows)
    terms = list(index.keys())
    if len(terms) < 3:
        return terms[:2]
    clusters: list[list[str]] = [[t] for t in terms]

    def cdist(c1: list[str], c2: list[str]) -> float:
        # average linkage on cosine distance
        s = sum(1 - sparse_cosine(index[a], index[b]) for a in c1 for b in c2)
        return s / (len(c1) * len(c2))

    while len(clusters) > 3:
        best, bi, bj = None, -1, -1
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = cdist(clusters[i], clusters[j])
                if best is None or d < best:
                    best, bi, bj = d, i, j
        merged = clusters[bi] + clusters[bj]
        if len(merged) > 4:
            break
        clusters = [c for k, c in enumerate(clusters) if k not in (bi, bj)]
        clusters.append(merged)
    best_cluster = max((c for c in clusters if len(c) > 2), key=len, default=None)
    if best_cluster is None:
        best_cluster = max(clusters, key=len)
    cen = _sparse_sum([index[t] for t in best_cluster])
    ranked = sorted(best_cluster,
                    key=lambda t: (-sparse_cosine(index[t], cen), t))
    return ranked[:2]
