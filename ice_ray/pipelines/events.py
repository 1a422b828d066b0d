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
    """Fused annotate + tree extraction actor (mirrors the paths stage).

    ``emit_args=True`` adds an ``arg_pair`` column
    (``nsubj_value:dobj_value``, lowercased — AnchoredTreeSet's argIndex
    key, aceJet/AnchoredTreeSet.java:39-42) for the event bootstrap."""

    def __init__(self, extra_entity_sets: dict | None = None,
                 emit_args: bool = False):
        self.entity_dict = build_entity_dict(extra_entity_sets)
        self.lower_dict = lower_entity_dict(self.entity_dict)
        self.max_len = max_entity_phrase_len(self.entity_dict)
        self.emit_args = emit_args
        self.columns = TREE_COLUMNS + (["arg_pair"] if emit_args else [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        out: dict[str, list] = {c: [] for c in self.columns}
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
                if self.emit_args:
                    out["arg_pair"].append(tree_arg_pair(row["roles"],
                                                         row["arg_values"]))
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            **{c: pa.array(out[c], pa.string()) for c in self.columns[2:]},
        })


def tree_arg_pair(roles: list[str], values: list[str]) -> str:
    """``nsubj_value:dobj_value`` (lowercased) — IceTree.argPair()."""
    by_role = dict(zip(roles, values))
    return (by_role.get("nsubj", "").lower() + ":"
            + by_role.get("dobj", "").lower())


def extract_trees(transcripts, batch_size: int = 1024,
                  concurrency=(1, 8), emit_args: bool = False):
    return transcripts.map_batches(
        AnnotateExtractTrees,
        fn_constructor_kwargs={"emit_args": emit_args},
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


# event bootstrap constants (EventBootstrap.java:43-52) — the event side
# uses its own values, NOT the relation side's (cap 100 vs 200, min
# shared 1 vs 2)
EVENT_MIN_RELATION_COUNT = 1
EVENT_MAX_BOOTSTRAPPED_ITEMS = 100
EVENT_MIN_BOOTSTRAP_SCORE = 0.05


def event_bootstrap_shared_args(trees, seed_cores: list[str],
                                rejects: set[str] | None = None,
                                max_items: int = EVENT_MAX_BOOTSTRAPPED_ITEMS,
                                min_shared: int = EVENT_MIN_RELATION_COUNT,
                                min_score: float = EVENT_MIN_BOOTSTRAP_SCORE):
    """Event-pattern bootstrap from seed tree signatures — the full
    candidate-generation flow of EventBootstrap.bootstrap /
    scoreUsingSharedArguments (events/EventBootstrap.java:236-409),
    mirroring ``bootstrap_shared_args`` over the trees dataset:

    seed signatures (value-stripped ``trigger role:TYPE ...`` cores) →
    their instances' distinct arg pairs (broadcast, small) → candidate
    (pcore, arg_pair) rows filtered by the broadcast pair set →
    groupby(pcore) distinct-pair count = sharedCount; totalCount =
    distinct arg pairs of the candidate's TRIGGER (treeSet.getByTree,
    :384-389); score ``s/t · s/(s+1)`` → sort desc, MIN_BOOTSTRAP_SCORE
    floor, cap 100, repr-dedup vs seeds and higher-ranked candidates
    (:266-284).

    ``trees`` must carry ``arg_pair`` (``extract_trees(...,
    emit_args=True)``).  Deviation noted: the reference's
    ``seedTreeInstances.contains(p)`` skip compares a value-cleared tree
    against valued instances (never equal); we exclude candidates whose
    pcore is itself a seed signature — the effective intent, matching
    the relation side.

    → pandas (pcore, trigger, score, n_shared_pairs, n_total_pairs,
    repr), ranked.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    from ..functions.shuffle import grouped_aggregate

    rejects = rejects or set()
    seed_set = set(seed_cores)

    def add_pcore(batch: pa.Table) -> pa.Table:
        cores = batch.column("core").to_pylist()
        pcores = [_core_prefix(c) for c in cores]
        ptrigs = [p.split(" ", 1)[0] for p in pcores]
        return (batch.append_column("pcore", pa.array(pcores, pa.string()))
                     .append_column("ptrig", pa.array(ptrigs, pa.string())))

    keyed = trees.map_batches(add_pcore, batch_format="pyarrow").materialize()

    # seed instances = trees whose value-stripped signature is a seed
    # (same trigger AND argument types, EventBootstrap.java:315-330);
    # broadcast is_in mask, holds for large seed sets
    seed_arr_ref = ray.put(pa.array(sorted(seed_set), pa.string()))

    def seed_filter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("pcore"),
                        value_set=ray.get(seed_arr_ref))
        return batch.filter(mask).select(["arg_pair"])

    seed_pairs = {r["arg_pair"] for r in
                  keyed.map_batches(seed_filter, batch_format="pyarrow")
                       .iter_rows()}
    if not seed_pairs:
        return None
    pairs_ref = ray.put(seed_pairs)

    class SharedFilter:
        def __init__(self):
            self.pairs = ray.get(pairs_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = [p in self.pairs
                    for p in batch.column("arg_pair").to_pylist()]
            return batch.filter(pa.array(mask)).select(["pcore", "arg_pair"])

    shared = keyed.map_batches(SharedFilter, batch_format="pyarrow",
                               concurrency=(1, 4))
    distinct = grouped_aggregate(shared, keys=["pcore", "arg_pair"],
                                 specs=[("pcore", "count")],
                                 rename={"pcore_count": "_n"})
    per_pcore = grouped_aggregate(distinct, keys=["pcore"],
                                  specs=[("pcore", "count")],
                                  rename={"pcore_count": "n_shared_pairs"})

    # totalCount: distinct arg pairs per TRIGGER over the whole tree set
    trig_distinct = grouped_aggregate(
        keyed.select_columns(["ptrig", "arg_pair"]),
        keys=["ptrig", "arg_pair"], specs=[("ptrig", "count")],
        rename={"ptrig_count": "_n"})
    trig_tot = grouped_aggregate(trig_distinct, keys=["ptrig"],
                                 specs=[("ptrig", "count")],
                                 rename={"ptrig_count": "n_total_pairs"}
                                 ).to_pandas()
    totals = dict(zip(trig_tot["ptrig"], trig_tot["n_total_pairs"]))

    # first-wins repr per candidate signature (min turn key — pinned
    # ordering, SURVEY §4) — the DepTreeMap.findRepr analog
    def add_payload(batch: pa.Table) -> pa.Table:
        src = pc.binary_join_element_wise(
            batch.column("conv_id"),
            pc.utf8_lpad(pc.cast(batch.column("turn_idx"), pa.string()),
                         9, "0"), "#")
        payload = pc.binary_join_element_wise(src, batch.column("repr"),
                                              "\x01")
        return pa.table({"pcore": batch.column("pcore"),
                         "payload": payload})

    reprs = grouped_aggregate(
        keyed.map_batches(add_payload, batch_format="pyarrow"),
        keys=["pcore"], specs=[("payload", "min")],
        rename={"payload_min": "payload"}).to_pandas()
    repr_of = {p: pay.split("\x01", 1)[1]
               for p, pay in zip(reprs["pcore"], reprs["payload"])}

    pdf = per_pcore.to_pandas()
    pdf = pdf[~pdf["pcore"].isin(seed_set) & ~pdf["pcore"].isin(rejects)]
    pdf = pdf[pdf["n_shared_pairs"] >= min_shared].copy()
    if pdf.empty:
        return pd.DataFrame({"pcore": [], "trigger": [], "score": [],
                             "n_shared_pairs": [], "n_total_pairs": [],
                             "repr": []})
    pdf["trigger"] = pdf["pcore"].str.split(" ").str[0]
    pdf["n_total_pairs"] = pdf["trigger"].map(totals).fillna(0).astype(int)
    pdf["score"] = [round(event_bootstrap_score(int(s), int(t)), 6)
                    for s, t in zip(pdf["n_shared_pairs"],
                                    pdf["n_total_pairs"])]
    pdf["repr"] = pdf["pcore"].map(repr_of)
    pdf = pdf[pdf["score"] >= min_score]
    pdf = pdf.sort_values(["score", "pcore"], ascending=[False, True],
                          kind="mergesort")
    # repr-dedup: seeds' reprs first, then higher-ranked candidates'
    seen = {repr_of.get(s) for s in seed_set} - {None}
    keep = []
    for r in pdf["repr"]:
        keep.append(r not in seen)
        seen.add(r)
    pdf = pdf[np.array(keep, dtype=bool)].head(max_items)
    cols = ["pcore", "trigger", "score", "n_shared_pairs",
            "n_total_pairs", "repr"]
    return pdf[cols].reset_index(drop=True)
