"""Triple P/R/F harness (semantics modeled on
aceJet/TypedRelationExtractorScorer.java:45-159: align extractions to the
key, count correct / spurious / missing).  Operates on canonical distinct
(subj, pred, obj) sets — the per-turn text-equality invariant means gold
and system triples live in the same surface space after canonicalization.
"""

from __future__ import annotations


def triple_prf(system: set[tuple[str, str, str]],
               gold: set[tuple[str, str, str]]) -> dict:
    correct = len(system & gold)
    p = correct / len(system) if system else 0.0
    r = correct / len(gold) if gold else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "precision": p, "recall": r, "f1": f,
        "correct": correct, "system": len(system), "gold": len(gold),
    }
