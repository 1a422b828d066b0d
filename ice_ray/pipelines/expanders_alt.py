"""Alternative entity-set expanders (both off by default in the
reference):

- ``EmbeddingExpander`` (C4, entityset/EmbeddingEntitySetExpander.java:
  22-62): dense word2vec-style vectors instead of PMI; cosine to the seed
  centroid.
- ``mira_expand`` (C3, entityset/MIRAEntitySetExpander.java:23-144): an
  online binary MIRA perceptron, 50 epochs over labeled terms, then score
  all candidates.

Also the word-embedding text loader (S13, models/WordEmbedding.java:27-48
``word v1 ... vd`` lines).
"""

from __future__ import annotations

import numpy as np


def load_word_embeddings(path: str) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 2:
                continue
            out[parts[0]] = np.asarray([float(x) for x in parts[1:]],
                                       dtype=np.float64)
    return out


def embedding_expand(emb: dict[str, np.ndarray], seeds: list[str],
                     candidates: list[str], top_k: int = 20) -> list[tuple[str, float]]:
    """C4: rank candidates by cosine to the mean seed vector."""
    seed_vecs = [emb[s] for s in seeds if s in emb]
    if not seed_vecs:
        return []
    centroid = np.mean(seed_vecs, axis=0)
    cn = np.linalg.norm(centroid)
    scored = []
    for c in candidates:
        if c in seeds or c not in emb:
            continue
        v = emb[c]
        n = np.linalg.norm(v)
        scored.append((c, float(v @ centroid / (n * cn)) if n and cn else 0.0))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:top_k]


def mira_expand(vectors: dict[str, dict[str, float]],
                positives: list[str], negatives: list[str],
                epochs: int = 50) -> list[tuple[str, float]]:
    """C3: online binary MIRA over sparse term vectors.  Margin-based
    update w += τ·y·x with τ = max(0, (1 − y·w·x) / ||x||²), 50 epochs
    (MIRAEntitySetExpander.java:23-144); returns all unlabeled terms
    scored by w·x descending."""
    w: dict[str, float] = {}

    def dot(x: dict[str, float]) -> float:
        return sum(v * w.get(k, 0.0) for k, v in x.items())

    labeled = [(vectors[t], 1.0) for t in positives if t in vectors] + \
              [(vectors[t], -1.0) for t in negatives if t in vectors]
    for _ in range(epochs):
        for x, y in labeled:
            margin = y * dot(x)
            if margin < 1.0:
                norm2 = sum(v * v for v in x.values())
                if norm2 == 0:
                    continue
                tau = (1.0 - margin) / norm2
                for k, v in x.items():
                    w[k] = w.get(k, 0.0) + tau * y * v
    known = set(positives) | set(negatives)
    scored = [(t, dot(x)) for t, x in vectors.items() if t not in known]
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    return scored
