"""Decode stage: tag path rows with relation types → raw edges.

Map-side join against a broadcast rule table (J4, exact hash lookup —
aceJet/RelaxedDepPathRelationTagger.java:266-287) with optional soft
edit-distance matching (J5, relation/PathRelationExtractor.java:82-145,
costs RelaxedDepPathRelationTagger.java:244).  The rule table is shipped
once via ``ray.put`` and fetched in each actor's ``__init__`` — never
per batch.

A rule value may end in ``-1`` to swap argument order (JetEngineBuilder
convention, models/JetEngineBuilder.java:200-231).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..config import (
    SOFT_DELETE_COST,
    SOFT_INSERT_COST,
    SOFT_MIN_THRESHOLD,
    SOFT_NEG_DISCOUNT,
    SOFT_REPLACE_COST,
)
from ..functions.pathmatcher import MatcherPath, match_paths

EDGE_COLUMNS = ["subj", "pred", "obj", "subj_type", "obj_type", "conv_id", "turn_idx"]


class Tagger:
    """path rows → edges.  ``rules_ref`` is a ray ObjectRef to (or a plain
    dict of) {typed_path: relationType[-1]}; ``neg_rules`` likewise for
    negative rules used by the soft matcher."""

    def __init__(self, rules_ref, soft: bool = False, neg_rules_ref=None):
        rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref
        self.exact: dict[str, str] = dict(rules)
        self.soft = soft
        if soft:
            self.soft_rules = [
                (MatcherPath(k.replace(" -- ", "--")), v) for k, v in rules.items()
            ]
            neg = (ray.get(neg_rules_ref) if isinstance(neg_rules_ref, ray.ObjectRef)
                   else neg_rules_ref) or {}
            self.neg_rules = [
                (MatcherPath(k.replace(" -- ", "--")), v) for k, v in neg.items()
            ]

    def _soft_match(self, typed_path: str) -> str | None:
        mp = MatcherPath(typed_path.replace(" -- ", "--"))
        if mp.is_empty():
            return None
        best, best_rel = 1.0, None
        for rule, rel in self.soft_rules:
            score = match_paths(mp, rule, SOFT_REPLACE_COST, SOFT_INSERT_COST,
                                SOFT_DELETE_COST) / len(rule)
            if score < best:
                best, best_rel = score, rel
        if best >= SOFT_MIN_THRESHOLD or best_rel is None:
            return None
        best_neg = 1.0
        for rule, rel in self.neg_rules:
            if rel != best_rel:
                continue
            score = match_paths(mp, rule, SOFT_REPLACE_COST, SOFT_INSERT_COST,
                                SOFT_DELETE_COST) / len(rule)
            best_neg = min(best_neg, score)
        if best < best_neg * SOFT_NEG_DISCOUNT:
            return best_rel
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        tp = batch.column("typed_path").to_pylist()
        a1 = batch.column("arg1_text").to_pylist()
        a2 = batch.column("arg2_text").to_pylist()
        t1 = batch.column("arg1_type").to_pylist()
        t2 = batch.column("arg2_type").to_pylist()
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        out: dict[str, list] = {c: [] for c in EDGE_COLUMNS}
        for i, key in enumerate(tp):
            rel = self.exact.get(key)
            if rel is None and self.soft:
                rel = self._soft_match(key)
            if rel is None:
                continue
            swap = rel.endswith("-1")
            if swap:
                rel = rel[:-2]
            s, o = (a2[i], a1[i]) if swap else (a1[i], a2[i])
            st, ot = (t2[i], t1[i]) if swap else (t1[i], t2[i])
            out["subj"].append(s)
            out["pred"].append(rel)
            out["obj"].append(o)
            out["subj_type"].append(st)
            out["obj_type"].append(ot)
            out["conv_id"].append(conv[i])
            out["turn_idx"].append(tidx[i])
        return pa.table({
            "subj": pa.array(out["subj"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "obj": pa.array(out["obj"], pa.string()),
            "subj_type": pa.array(out["subj_type"], pa.string()),
            "obj_type": pa.array(out["obj_type"], pa.string()),
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
        })
