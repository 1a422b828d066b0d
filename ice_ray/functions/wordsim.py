"""Embedding-based lexical similarity (models/WordEmbedding.java:101-190).

- ``WordSim``: token-level cosine with the reference's conventions —
  1.0 for case-insensitive equality, 0.0 when either embedding is
  undefined, else cosine of the word vectors;
- ``path_similarity``: Π of per-slot lexical similarities over two
  ``label:word:...`` path strings, 0 when lengths differ
  (WordEmbedding.pathSimilarity, :117-127);
- ``tree_similarity``: (trigger cosine + role-matched argument-type
  similarity / min(#args)) / 2 (WordEmbedding.treeSimilarity, :129-155).

Built once per decode actor from a broadcast embedding table and passed
into the soft matcher as the ``word_sim`` hook, which scales the replace
cost by (1 − similarity) (PathMatcher.java:24-34).
"""

from __future__ import annotations

import numpy as np


class WordSim:
    """Cosine similarity over a word→vector dict with a per-pair memo
    (the decode hot path sees few distinct word pairs)."""

    def __init__(self, embeddings: dict[str, np.ndarray]):
        self.emb = {w: np.asarray(v, dtype=np.float64)
                    for w, v in embeddings.items()}
        self._norm = {w: float(np.linalg.norm(v)) for w, v in self.emb.items()}
        self._memo: dict[tuple[str, str], float] = {}

    def __call__(self, w1: str, w2: str) -> float:
        if w1 is None or w2 is None:
            return 0.0
        if w1.lower() == w2.lower():
            return 1.0
        key = (w1, w2) if w1 <= w2 else (w2, w1)
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        v1, v2 = self.emb.get(w1), self.emb.get(w2)
        if v1 is None or v2 is None:
            sim = 0.0
        else:
            d = self._norm[w1] * self._norm[w2]
            sim = float(v1 @ v2 / d) if d else 0.0
        self._memo[key] = sim
        return sim


def path_similarity(path1: str, path2: str, word_sim: WordSim) -> float:
    """Product of per-slot word similarities of two ``label:word:...``
    strings (odd positions are the lexical items); 0 if lengths differ."""
    seq1, seq2 = path1.split(":"), path2.split(":")
    if len(seq1) != len(seq2):
        return 0.0
    sim = 1.0
    for i in range(1, len(seq1), 2):
        sim *= word_sim(seq1[i], seq2[i])
    return sim


def tree_similarity(tree1: dict, tree2: dict, word_sim: WordSim) -> float:
    """(trigger similarity + role-matched argument similarity) / 2 over
    tree dicts with keys ``trigger``, ``roles`` (list), ``types`` (list).
    Argument similarity sums word_sim over all cross-tree argument pairs
    sharing a role label, normalized by min(#args)."""
    n1, n2 = len(tree1["roles"]), len(tree2["roles"])
    trigger_sim = word_sim(tree1["trigger"], tree2["trigger"])
    arg_sim = 0.0
    for i in range(n1):
        for j in range(n2):
            if tree1["roles"][i] == tree2["roles"][j]:
                arg_sim += word_sim(tree1["types"][i], tree2["types"][j])
    arg_sim /= max(min(n1, n2), 1)
    return (trigger_sim + arg_sim) / 2
