"""Weighted path edit distance for soft decode (models/PathMatcher.java:16-110,
models/MatcherPath.java:22-56) plus the plain Levenshtein used for repr
lookup (models/DepPathMap.java:256-302).
"""

from __future__ import annotations

from ..config import LABEL_MISMATCH_PENALTY
from ..nlp.stemmer import stem

_LABEL_WEIGHTS = {
    "nsubj-1": 1.5,
    "dobj-1": 1.5,
    "nsubj": 1.0,
    "dobj": 0.5,
    "preps_of": 0.2,
    "preps_with": 0.2,
}


class MatcherPath:
    """Parsed ``TYPE1--label:word:...:labelk--TYPE2``; nodes are
    (label, stemmed word) with a SYS_PATH_END terminal."""

    __slots__ = ("nodes", "arg1_type", "arg2_type", "relation_type")

    def __init__(self, path_string: str):
        self.nodes: list[tuple[str, str]] = []
        self.arg1_type = "UNK"
        self.arg2_type = "UNK"
        self.relation_type = "NONE"
        parts = path_string.split("--")
        if len(parts) == 3:
            self.arg1_type = parts[0].strip()
            self.arg2_type = parts[2].strip()
            seg = parts[1].strip().split(":")
            for i in range((len(seg) - 1) // 2):
                self.nodes.append((seg[2 * i], stem(seg[2 * i + 1], "UNK")))
            self.nodes.append((seg[-1], "SYS_PATH_END"))

    def __len__(self):
        return len(self.nodes)

    def is_empty(self) -> bool:
        return not self.nodes


def match_paths(p1: MatcherPath, p2: MatcherPath,
                replace: float = 0.5, insert: float = 0.25, delete: float = 1.0,
                word_sim=None) -> float:
    """Generalized edit distance between two MatcherPaths
    (PathMatcher.java:53-110).  ``word_sim(w1, w2)`` defaults to exact
    equality (embedding cosine when an embedding table is provided)."""
    len1, len2 = len(p1), len(p2)
    if len1 == 1 and len2 == 1:
        same = (p1.nodes[0][0] == p2.nodes[0][0]
                and p1.arg1_type == p2.arg1_type and p1.arg2_type == p2.arg2_type)
        return 0.0 if same else 1.0
    dp = [[0.0] * (len2 + 1) for _ in range(len1 + 1)]
    for i in range(len1 + 1):
        dp[i][0] = float(i)
    for j in range(len2 + 1):
        dp[0][j] = float(j)
    for i in range(len1):
        l1, w1 = p1.nodes[i]
        for j in range(len2):
            l2, w2 = p2.nodes[j]
            if l1 == l2 and w1 == w2:
                dp[i + 1][j + 1] = dp[i][j]
            else:
                lw = _LABEL_WEIGHTS.get(l2, 1.0)
                ilw = _LABEL_WEIGHTS.get(l1, 1.0)
                penalty = 1.0 if l1 == l2 else LABEL_MISMATCH_PENALTY
                if word_sim is not None:
                    rcost = 1.0 - word_sim(w1, w2)
                else:
                    rcost = 0.0 if w1 == w2 else 1.0
                rep = dp[i][j] + replace * penalty * rcost * lw
                ins = dp[i][j + 1] + insert * ilw
                dele = dp[i + 1][j] + delete * lw
                dp[i + 1][j + 1] = min(rep, ins, dele)
    if p1.arg1_type == p2.arg1_type and p1.arg2_type == p2.arg2_type:
        return dp[len1][len2]
    return float(max(len1, len2))


def levenshtein(a: str, b: str, cap: int = 100) -> int:
    """minDistance with the reference's 100-char cap → 1001 sentinel
    (DepPathMap.java:256-302)."""
    if len(a) > cap or len(b) > cap:
        return 1001
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]
