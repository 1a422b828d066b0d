"""Heuristic POS tagger (stand-in for JET's HMM tagger, parseprops:1-22).

Deterministic closed-class lookup + morphology; names are tagged NNP by
the NER pass (which runs first and collapses multiword names).
"""

from __future__ import annotations

import re

from .lexicon import (
    ADVERBS,
    AUX_VERBS,
    CONJUNCTIONS,
    DETERMINERS,
    PREPOSITIONS,
    VERB_BASES,
)
from .stemmer import stem

_NUM_RE = re.compile(r"^\$?\d+(?:[.,]\d+)*$")


from functools import lru_cache


@lru_cache(maxsize=65536)
def tag_token(surface: str, is_sent_start: bool) -> str:
    w = surface.lower()
    if _NUM_RE.match(surface):
        return "CD"
    if not any(c.isalpha() for c in surface):
        return surface if len(surface) == 1 else "SYM"
    if w in AUX_VERBS:
        if w in ("is", "has", "does"):
            return "VBZ"
        if w in ("was", "were", "did", "had"):
            return "VBD"
        if w in ("been", "being", "having"):
            return "VBN" if w == "been" else "VBG"
        if w in ("will", "would"):
            return "MD"
        return "VB"
    if w in DETERMINERS:
        return "DT"
    if w == "to":
        return "TO"
    if w in PREPOSITIONS:
        return "IN"
    if w in CONJUNCTIONS:
        return "CC"
    if w in ADVERBS:
        return "RB"
    if w == "'s":
        return "POS"
    base = stem(w)
    if base in VERB_BASES:
        if w.endswith("ing"):
            return "VBG"
        if w.endswith("ed") or w in ("shot", "met", "sold", "bought", "gave", "took", "paid", "left"):
            return "VBD"
        if w.endswith("s") and w != base:
            return "VBZ"
        return "VB"
    if surface[0].isupper() and not is_sent_start:
        return "NNP"
    if w.endswith("ly"):
        return "RB"
    if w.endswith("s") and base != w:
        return "NNS"
    return "NN"
