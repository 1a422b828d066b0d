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

    def __init__(self, rules_ref, soft: bool = False, neg_rules_ref=None,
                 emb_ref=None, soft_threshold: float = SOFT_MIN_THRESHOLD):
        rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref
        self.exact: dict[str, str] = dict(rules)
        self.soft = soft
        self.soft_threshold = soft_threshold
        self.word_sim = None
        if soft:
            self.soft_rules = [
                (MatcherPath(k.replace(" -- ", "--")), v) for k, v in rules.items()
            ]
            neg = (ray.get(neg_rules_ref) if isinstance(neg_rules_ref, ray.ObjectRef)
                   else neg_rules_ref) or {}
            self.neg_rules = [
                (MatcherPath(k.replace(" -- ", "--")), v) for k, v in neg.items()
            ]
            # embedding-backed lexical similarity scales the soft replace
            # cost by (1 − cosine) (PathMatcher.java:24-34 via the
            # WordEmbedding table); the table is broadcast once per actor
            emb = (ray.get(emb_ref) if isinstance(emb_ref, ray.ObjectRef)
                   else emb_ref)
            if emb:
                from ..functions.wordsim import WordSim
                self.word_sim = WordSim(emb)

    def _soft_match(self, typed_path: str) -> str | None:
        mp = MatcherPath(typed_path.replace(" -- ", "--"))
        if mp.is_empty():
            return None
        best, best_rel = 1.0, None
        for rule, rel in self.soft_rules:
            score = match_paths(mp, rule, SOFT_REPLACE_COST, SOFT_INSERT_COST,
                                SOFT_DELETE_COST,
                                word_sim=self.word_sim) / len(rule)
            if score < best:
                best, best_rel = score, rel
        if best >= self.soft_threshold or best_rel is None:
            return None
        best_neg = 1.0
        for rule, rel in self.neg_rules:
            if rel != best_rel:
                continue
            score = match_paths(mp, rule, SOFT_REPLACE_COST, SOFT_INSERT_COST,
                                SOFT_DELETE_COST,
                                word_sim=self.word_sim) / len(rule)
            best_neg = min(best_neg, score)
        if best < best_neg * SOFT_NEG_DISCOUNT:
            return best_rel
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # rule lookup on the batch's dictionary-encoded typed_path uniques
        # (distinct typed paths ≪ rows), then vectorized take/filter.
        # "@MENTION" sentinel rows (person mentions of path-less turns,
        # stages/annotator.py) pass through as pred="@MENTION" pseudo-
        # edges for the coref pass, which consumes and drops them.
        enc = pc.dictionary_encode(batch.column("typed_path").combine_chunks())
        uniq = enc.dictionary.to_pylist()
        rel_u: list[str | None] = []
        for key in uniq:
            if key == "@MENTION":
                rel_u.append("@MENTION")
                continue
            rel = self.exact.get(key)
            if rel is None and self.soft:
                rel = self._soft_match(key)
            rel_u.append(rel)
        pred_u = [r[:-2] if r is not None and r.endswith("-1") else r
                  for r in rel_u]
        swap_u = [r is not None and r.endswith("-1") for r in rel_u]
        pred = pc.take(pa.array(pred_u, pa.string()), enc.indices)
        swap = pc.take(pa.array(swap_u, pa.bool_()), enc.indices)
        keep = pc.is_valid(pred)
        t = (batch.append_column("pred", pred)
                  .append_column("_swap", swap)
                  .filter(keep))
        s = pc.if_else(t.column("_swap"), t.column("arg2_text"), t.column("arg1_text"))
        o = pc.if_else(t.column("_swap"), t.column("arg1_text"), t.column("arg2_text"))
        st = pc.if_else(t.column("_swap"), t.column("arg2_type"), t.column("arg1_type"))
        ot = pc.if_else(t.column("_swap"), t.column("arg1_type"), t.column("arg2_type"))
        return pa.table({
            "subj": s,
            "pred": t.column("pred"),
            "obj": o,
            "subj_type": st,
            "obj_type": ot,
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
        })
