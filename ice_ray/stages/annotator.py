"""Annotator and fused annotate+extract actor-pool stages.

The actor-pool analog of the per-process JET model load (A1,
IcePreprocessor.java:175): dictionaries are built once in ``__init__``;
``__call__`` processes one zero-copy Arrow batch.  Use

    ds.map_batches(Annotator, batch_format="pyarrow",
                   batch_size=cfg.annotator_batch_size,
                   concurrency=cfg.annotator_concurrency)

``AnnotateExtract`` fuses the NLP chain with path extraction so the
headline pipeline never materializes the (wide) annotation list-columns —
only path rows leave the stage.  The standalone ``Annotator`` exists for
the cached two-phase layout (S4/S5 annotation-cache analog).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.annotate import annotate_text
from ..core.extract import extract_paths_from_turn
from ..nlp.lexicon import (
    build_entity_dict,
    lower_entity_dict,
    max_entity_phrase_len,
)

_I32 = pa.int32()

TOKENS_T = pa.list_(pa.struct(
    [("start", _I32), ("end", _I32), ("word", pa.string()), ("pos", pa.string())]))
MENTIONS_T = pa.list_(pa.struct(
    [("start", _I32), ("end", _I32), ("head_start", _I32), ("head_end", _I32),
     ("type", pa.string()), ("mtype", pa.string())]))
DEPS_T = pa.list_(pa.struct(
    [("label", pa.string()), ("src_word", pa.string()), ("src_posn", _I32),
     ("src_pos", pa.string()), ("tgt_word", pa.string()), ("tgt_posn", _I32),
     ("tgt_pos", pa.string())]))
SENTS_T = pa.list_(pa.struct([("start", _I32), ("end", _I32)]))

PATH_COLUMNS = ["conv_id", "turn_idx", "arg1_text", "arg1_type", "arg2_text",
                "arg2_type", "path", "typed_path", "instance_key", "repr", "example"]


class Annotator:
    """text → annotation list-columns (tokens/mentions/deps/sentences)."""

    def __init__(self, extra_entity_sets: dict | None = None):
        self.entity_dict = build_entity_dict(extra_entity_sets)
        self.lower_dict = lower_entity_dict(self.entity_dict)
        self.max_len = max_entity_phrase_len(self.entity_dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sents, toks, ments, deps = [], [], [], []
        for text in texts:
            ann = annotate_text(text or "", self.entity_dict, self.max_len,
                               self.lower_dict)
            sents.append([{"start": s, "end": e} for s, e in ann["sentences"]])
            toks.append([{"start": s, "end": e, "word": w, "pos": p}
                         for s, e, w, p in ann["tokens"]])
            ments.append([{"start": a, "end": b, "head_start": c, "head_end": d,
                           "type": t, "mtype": m}
                          for a, b, c, d, t, m in ann["mentions"]])
            deps.append([{"label": l, "src_word": sw, "src_posn": sp, "src_pos": spos,
                          "tgt_word": tw, "tgt_posn": tp, "tgt_pos": tpos}
                         for l, sw, sp, spos, tw, tp, tpos in ann["deps"]])
        return (batch
                .append_column("sentences", pa.array(sents, SENTS_T))
                .append_column("tokens", pa.array(toks, TOKENS_T))
                .append_column("mentions", pa.array(ments, MENTIONS_T))
                .append_column("deps", pa.array(deps, DEPS_T)))


class AnnotateExtract:
    """text → path rows (fused NLP chain + DepPaths.collectPaths).

    ``emit_repr=False`` skips the linearization + bracketed-example
    rendering (pure CPU, only needed by the counts/repr pipelines) — the
    KG decode path uses just typed_path + args."""

    def __init__(self, extra_entity_sets: dict | None = None,
                 max_intervening: int = 3, emit_repr: bool = True,
                 cache_max: int = 100_000,
                 emit_person_mentions: bool = False):
        self.entity_dict = build_entity_dict(extra_entity_sets)
        self.lower_dict = lower_entity_dict(self.entity_dict)
        self.max_len = max_entity_phrase_len(self.entity_dict)
        self.max_intervening = max_intervening
        self.emit_repr = emit_repr
        # emit_person_mentions (the KG/coref path): turns that produce NO
        # path rows but DO contain PERSON name mentions emit one sentinel
        # row per distinct surface (typed_path "@MENTION") so the coref
        # pass can use antecedents from relation-less turns (e.g. a
        # bracketed sentence path extraction drops).  Turns WITH paths
        # already surface their mentions as edge arguments.
        self.emit_person_mentions = emit_person_mentions
        self.columns = PATH_COLUMNS if emit_repr else PATH_COLUMNS[:-2]
        # distinct-text memo: extraction output depends only on the text,
        # and transcripts repeat boilerplate (tool turns, templates)
        # heavily — the per-turn analog of the reference's per-document
        # DepPathsLog memo (DepPaths.java:226-231).  Capped, no eviction:
        # misses simply recompute.
        self.cache_max = cache_max
        self._cache: dict[str, list] = {}

    def _mention_rows(self, ann: dict) -> list[dict]:
        from ..nlp.lexicon import ALL_ANAPHORA, ANAPHOR_TYPES

        seen: list[tuple[str, str]] = []
        text_mentions = ann["mentions"]
        for m in text_mentions:
            if m[4] not in ANAPHOR_TYPES:   # PERSON / ORGANIZATION
                continue
            surface = ann["_text"][m[0]:m[1]]
            # anaphor surfaces (pronouns, "the company", …) are never
            # antecedents themselves
            if surface.lower() in ALL_ANAPHORA or (surface, m[4]) in seen:
                continue
            seen.append((surface, m[4]))
        empty = {"arg2_text": "", "arg2_type": "", "path": "",
                 "typed_path": "@MENTION", "instance_key": ""}
        if self.emit_repr:
            empty = {**empty, "repr": "", "example": ""}
        return [{"arg1_text": s, "arg1_type": t, **empty}
                for s, t in seen]

    def _rows_for(self, text: str) -> list:
        rows = self._cache.get(text)
        if rows is None:
            ann = annotate_text(text, self.entity_dict, self.max_len,
                                self.lower_dict)
            rows = extract_paths_from_turn(
                text, ann["sentences"], ann["tokens"], ann["mentions"],
                ann["deps"], self.max_intervening, emit_repr=self.emit_repr)
            if self.emit_person_mentions and not rows:
                ann["_text"] = text
                rows = self._mention_rows(ann)
            if len(self._cache) < self.cache_max:
                self._cache[text] = rows
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        out: dict[str, list] = {c: [] for c in self.columns}
        for cid, ti, text in zip(conv, tidx, texts):
            for row in self._rows_for(text or ""):
                out["conv_id"].append(cid)
                out["turn_idx"].append(ti)
                for k in row:
                    out[k].append(row[k])
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], _I32),
            **{k: pa.array(out[k], pa.string()) for k in self.columns[2:]},
        })


class AnnotateExtractDecode(AnnotateExtract):
    """Fully fused flagship stage: text → raw edges in ONE actor pool.

    Stacks the decode (Tagger) on top of the fused annotate+extract so
    path rows never hit the object store either — only the (much
    smaller) edge rows leave the stage — and the pipeline runs a single
    actor pool instead of two.  Two pools can't be fused by Ray Data's
    planner, so the split layout pays an extra serialize/deserialize of
    every path row plus a static CPU partition between the pools; the
    heavy annotate work and the cheap dict-encoded tag lookup share one
    pool here and the tag rides the same core that produced the batch.

    Rule/neg-rule/embedding tables are broadcast ObjectRefs fetched once
    in ``__init__`` exactly as in the standalone Tagger.
    """

    def __init__(self, rules_ref=None, soft: bool = False,
                 neg_rules_ref=None, emb_ref=None,
                 soft_threshold: float | None = None, **kwargs):
        super().__init__(**kwargs)
        from ..config import SOFT_MIN_THRESHOLD
        from .tagger import Tagger
        self._tagger = Tagger(
            rules_ref, soft=soft, neg_rules_ref=neg_rules_ref,
            emb_ref=emb_ref,
            soft_threshold=(SOFT_MIN_THRESHOLD if soft_threshold is None
                            else soft_threshold))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._tagger(super().__call__(batch))


class ExtractFromAnnotations:
    """Annotation columns → path rows (phase-2 of the cached layout;
    reads the S4/S5 intermediate instead of re-annotating)."""

    def __init__(self, max_intervening: int = 3):
        self.max_intervening = max_intervening

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        sents = batch.column("sentences").to_pylist()
        toks = batch.column("tokens").to_pylist()
        ments = batch.column("mentions").to_pylist()
        deps = batch.column("deps").to_pylist()
        out: dict[str, list] = {c: [] for c in PATH_COLUMNS}
        for cid, ti, text, ss, tt, mm, dd in zip(conv, tidx, texts, sents, toks, ments, deps):
            rows = extract_paths_from_turn(
                text or "",
                [(s["start"], s["end"]) for s in ss],
                [(t["start"], t["end"], t["word"], t["pos"]) for t in tt],
                [(m["start"], m["end"], m["head_start"], m["head_end"],
                  m["type"], m["mtype"]) for m in mm],
                [(d["label"], d["src_word"], d["src_posn"], d["src_pos"],
                  d["tgt_word"], d["tgt_posn"], d["tgt_pos"]) for d in dd],
                self.max_intervening)
            for row in rows:
                out["conv_id"].append(cid)
                out["turn_idx"].append(ti)
                for k in row:
                    out[k].append(row[k])
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], _I32),
            **{k: pa.array(out[k], pa.string()) for k in PATH_COLUMNS[2:]},
        })
