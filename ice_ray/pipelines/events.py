"""Event (clausal tree) pipeline: annotate → extract trees → counts —
the `findTrees` flow (SURVEY §3.2 collectTreesInSentence; writeTrees
models/DepPaths.java:543-583, Events/EventTypes/EventRepr tables) plus the
event bootstrap's trigger-sharing scoring (events/EventBootstrap.java:
306-409, C5 event form ``s/t · s/(s+1)``).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.annotate import annotate_text
from ..core.trees import extract_trees_from_turn
from ..nlp.lexicon import (
    build_entity_dict,
    lower_entity_dict,
    max_entity_phrase_len,
)

TREE_COLUMNS = ["conv_id", "turn_idx", "trigger", "core", "repr"]


class AnnotateExtractTrees:
    """Fused annotate + tree extraction actor (mirrors the paths stage)."""

    def __init__(self, extra_entity_sets: dict | None = None):
        self.entity_dict = build_entity_dict(extra_entity_sets)
        self.lower_dict = lower_entity_dict(self.entity_dict)
        self.max_len = max_entity_phrase_len(self.entity_dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        out: dict[str, list] = {c: [] for c in TREE_COLUMNS}
        for cid, ti, text in zip(conv, tidx, texts):
            text = text or ""
            ann = annotate_text(text, self.entity_dict, self.max_len,
                                self.lower_dict)
            for row in extract_trees_from_turn(
                    text, ann["sentences"], ann["tokens"], ann["mentions"],
                    ann["deps"]):
                out["conv_id"].append(cid)
                out["turn_idx"].append(ti)
                out["trigger"].append(row["trigger"])
                out["core"].append(row["core"])
                out["repr"].append(row["repr"])
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "trigger": pa.array(out["trigger"], pa.string()),
            "core": pa.array(out["core"], pa.string()),
            "repr": pa.array(out["repr"], pa.string()),
        })


def extract_trees(transcripts, batch_size: int = 1024,
                  concurrency=(1, 8)):
    return transcripts.map_batches(AnnotateExtractTrees,
                                   batch_format="pyarrow",
                                   batch_size=batch_size,
                                   concurrency=concurrency)


def tree_type_counts(trees, min_freq: int = 1):
    """groupby(core) → count + first-wins repr under pinned turn order
    (EventTypes + EventRepr analog); bucketed two-stage Arrow aggregate
    (functions/shuffle.py) — the shuffle moves per-batch partials only."""
    import pyarrow.compute as pc

    from ..functions.shuffle import grouped_aggregate

    def add_payload(batch: pa.Table) -> pa.Table:
        src = pc.binary_join_element_wise(
            batch.column("conv_id"),
            pc.utf8_lpad(pc.cast(batch.column("turn_idx"), pa.string()), 9, "0"),
            "#")
        payload = pc.binary_join_element_wise(src, batch.column("repr"), "\x01")
        return batch.append_column("payload", payload)

    agg = grouped_aggregate(
        trees.map_batches(add_payload, batch_format="pyarrow"),
        keys=["core"],
        specs=[("core", "count"), ("payload", "min")],
        rename={"core_count": "count", "payload_min": "payload"})

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("payload"), "\x01")
        out = (batch.append_column("repr", pc.list_element(parts, 1))
               .drop_columns(["payload"]))
        if min_freq > 1:
            out = out.filter(pc.greater_equal(out["count"], min_freq))
        return out

    return agg.map_batches(unpack, batch_format="pyarrow")


DEFAULT_EVENT_RULES: dict[str, str] = {
    # lemmatized key-signature prefix "trigger nsubj:TYPE dobj:TYPE" →
    # event type (the event-model export consumed at decode,
    # JetEngineBuilder.buildEventModel analog)
    "promote nsubj:ORGANIZATION dobj:PERSON": "PROMOTION",
    "meet nsubj:PERSON dobj:PERSON": "MEETING",
    "seize nsubj:PERSON dobj:OTHER": "SEIZURE",
    "discuss nsubj:OTHER dobj:OTHER": "DISCUSSION",
    "review nsubj:OTHER dobj:OTHER": "REVIEW",
}


def _core_prefix(core: str) -> str:
    """Key-signature with argument values stripped: ``trigger role:TYPE ...``."""
    parts = core.split(" ")
    out = [parts[0]]
    for p in parts[1:]:
        role_type = p.split("=", 1)[0]
        out.append(role_type)
    return " ".join(out)


class EventTagger:
    """Tree rows → typed event rows via broadcast event rules (exact
    match on the value-stripped key signature — the events analog of the
    relation decode's J4 lookup)."""

    def __init__(self, rules_ref=None):
        import ray as _ray

        rules = (_ray.get(rules_ref) if isinstance(rules_ref, _ray.ObjectRef)
                 else rules_ref) or DEFAULT_EVENT_RULES
        self.rules = dict(rules)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cores = batch.column("core").to_pylist()
        etypes = [self.rules.get(_core_prefix(c)) for c in cores]
        keep = pa.array([e is not None for e in etypes])
        t = batch.append_column(
            "event_type", pa.array([e or "" for e in etypes], pa.string()))
        return t.filter(keep)


def decode_events(trees, rules: dict[str, str] | None = None,
                  concurrency=(1, 8)):
    """trees → (conv_id, turn_idx, trigger, core, repr, event_type)."""
    import ray as _ray

    rules_ref = _ray.put(rules or DEFAULT_EVENT_RULES)
    return trees.map_batches(EventTagger, batch_format="pyarrow",
                             fn_constructor_kwargs={"rules_ref": rules_ref},
                             concurrency=concurrency)


def event_bootstrap_score(shared: int, total: int) -> float:
    """Event bootstrap score ``s/t · s/(s+1)``
    (EventBootstrap.java:379-394)."""
    if total == 0:
        return 0.0
    return (shared / total) * (shared / (shared + 1))
