"""Deterministic English stemmer (the JET ``Stemmer.getDefaultStemmer``
stand-in; JET's jar is a missing blob — characterized from its call sites,
e.g. DepPath.java:43,180 and the golden strings in DepPathsTest.java:55,88:
``visited → visit``, ``lived → live``).

A compact measure-based suffix stripper (Porter-style step 1) plus an
irregular table.  Self-consistency is the contract: the corpus oracle, the
pattern table and the decoder all stem through this one function.
"""

from __future__ import annotations

from functools import lru_cache

IRREGULAR = {
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "did": "do", "does": "do", "done": "do",
    "went": "go", "gone": "go",
    "shot": "shoot", "met": "meet", "sold": "sell", "bought": "buy",
    "gave": "give", "given": "give", "said": "say", "made": "make",
    "took": "take", "taken": "take", "paid": "pay", "held": "hold",
    "led": "lead", "won": "win", "left": "leave", "ran": "run",
    "found": "find", "founded": "found", "hired": "hire",
    "children": "child", "men": "man", "women": "woman",
    "people": "person", "feet": "foot",
    # e-final verbs whose 'e' the measure rule cannot restore
    "promoted": "promote", "promoting": "promote",
    "acquired": "acquire", "acquiring": "acquire",
    "announced": "announce", "announcing": "announce",
    "approved": "approve", "approving": "approve",
}

_VOWELS = set("aeiou")


def _is_consonant(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(w, i - 1)
    return True


def _measure(w: str) -> int:
    """Porter's m: number of VC sequences."""
    m = 0
    prev_vowel = False
    for i in range(len(w)):
        v = not _is_consonant(w, i)
        if prev_vowel and not v:
            m += 1
        prev_vowel = v
    return m


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_consonant(w, len(w) - 1)
        and not _is_consonant(w, len(w) - 2)
        and _is_consonant(w, len(w) - 3)
        and w[-1] not in "wxy"
    )


def _fix_after_strip(s: str) -> str:
    if s.endswith(("at", "bl", "iz")):
        return s + "e"
    if len(s) >= 2 and s[-1] == s[-2] and _is_consonant(s, len(s) - 1) and s[-1] not in "lsz":
        return s[:-1]
    if _measure(s) == 1 and _ends_cvc(s):
        return s + "e"
    return s


@lru_cache(maxsize=65536)
def stem(word: str, pos: str = "UNK") -> str:
    """Stem of ``word``; ``pos`` reserved for parity with the JET API."""
    w = word.lower()
    if w in IRREGULAR:
        return IRREGULAR[w]
    if len(w) <= 3 or not w.isalpha():
        return w
    # plurals
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-3] + ("ie" if len(w) == 4 else "y")
    if w.endswith("es") and w[-3:-2] in ("x", "z", "s") or w.endswith(("ches", "shes")):
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    # past tense
    if w.endswith("eed"):
        return w[:-1] if _measure(w[:-3]) > 0 else w
    if w.endswith("ied"):
        return w[:-3] + ("ie" if len(w) == 4 else "y")
    if w.endswith("ed") and any(not _is_consonant(w[:-2], i) for i in range(len(w) - 2)):
        return _fix_after_strip(w[:-2])
    # gerund
    if w.endswith("ing") and any(not _is_consonant(w[:-3], i) for i in range(len(w) - 3)):
        return _fix_after_strip(w[:-3])
    return w
