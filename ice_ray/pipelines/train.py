"""Decode training + evaluation harnesses.

- ``grid_search_soft_costs``: the tagger's ``train`` mode — grid-search
  the soft matcher's (replace, insert, delete) costs against a dev set
  scored by triple P/R/F (aceJet/RelaxedDepPathRelationTagger.java:
  203-241; the shipped decode costs 0.8/0.3/1.2 came from this search).
- ``simulate_entity_expansion``: the entity-set simulation harness —
  expand from seeds and score P/R/F of the expanded set against a gold
  list at each round (entityset/Simulation.java:21-60).
"""

from __future__ import annotations

from itertools import product

from ..functions.pathmatcher import MatcherPath, match_paths
from ..functions.prf import triple_prf


def _soft_decode(typed_paths, rules, costs, threshold=0.5):
    """Minimal soft decoder over (typed_path, subj, obj) candidate rows."""
    replace, insert, delete = costs
    soft_rules = [(MatcherPath(k.replace(" -- ", "--")), v) for k, v in rules.items()]
    out = []
    for tp, subj, obj in typed_paths:
        mp = MatcherPath(tp.replace(" -- ", "--"))
        if mp.is_empty():
            continue
        best, best_rel = 1.0, None
        for rule, rel in soft_rules:
            score = match_paths(mp, rule, replace, insert, delete) / len(rule)
            if score < best:
                best, best_rel = score, rel
        if best < threshold and best_rel is not None:
            out.append((subj, best_rel, obj))
    return set(out)


def grid_search_soft_costs(dev_candidates, rules, gold,
                           replace_grid=(0.4, 0.6, 0.8, 1.0),
                           insert_grid=(0.1, 0.3, 0.5),
                           delete_grid=(0.8, 1.0, 1.2)):
    """→ (best_costs, best_f1, table).  ``dev_candidates`` is a list of
    (typed_path, subj, obj); ``gold`` a set of (subj, pred, obj)."""
    results = []
    best = (None, -1.0)
    for costs in product(replace_grid, insert_grid, delete_grid):
        system = _soft_decode(dev_candidates, rules, costs)
        prf = triple_prf(system, gold)
        results.append((costs, prf["f1"]))
        if prf["f1"] > best[1]:
            best = (costs, prf["f1"])
    return best[0], best[1], results


def simulate_entity_expansion(index_ds, seeds, gold_set,
                              rounds: int = 3, accept_top_k: int = 10):
    """Expansion simulation: after each auto-accept round, score the
    accepted set against the gold entity list (Simulation.java:21-60)."""
    from .expand import rank_candidates

    accepted = list(seeds)
    history = []
    for rnd in range(rounds):
        ranked = rank_candidates(index_ds, accepted).limit(accept_top_k * 2)
        new = [r["term"] for r in ranked.take(accept_top_k * 2)
               if r["score"] > 0 and r["term"] not in accepted][:accept_top_k]
        if not new:
            break
        accepted.extend(new)
        correct = len(set(accepted) & gold_set)
        p = correct / len(accepted)
        r = correct / len(gold_set) if gold_set else 0.0
        history.append({"round": rnd + 1, "accepted": len(accepted),
                        "precision": round(p, 4), "recall": round(r, 4)})
    return accepted, history
