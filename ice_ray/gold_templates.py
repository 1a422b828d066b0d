"""Template-grammar golds — hand-pinned expected outputs per corpus
sentence shape, fully independent of the annotate/extract/tree code.

The synthetic corpus is a CLOSED grammar (sources/transcripts.py): every
turn is one of ~17 sentence shapes over closed slot vocabularies.  For
each shape the expected path rows and clausal-tree rows are pinned BY
HAND below (the golden-string method of the reference's DepPathsTest,
applied to the whole grammar — src/test/.../DepPathsTest.java) and only
slot surfaces are substituted.  No tokenizer, POS tagger, parser,
extractor or linearizer code is involved: turns are recognized by
regular expressions over the grammar and rows are rendered from literal
format strings.  ``gold_path_type_counts_template`` /
``gold_path_instance_counts_template`` / ``gold_tree_counts_template`` /
``gold_events_decoded_template`` therefore verify the Ray pipeline (and
cross-check the serial-reference golds) from a second, independent
derivation path — the round-4 oracle-rigor swap (three+ serial golds →
independent).
"""

from __future__ import annotations

import re

import pandas as pd

from .nlp.lexicon import (
    ACTOR_NOUNS,
    CITIES,
    COUNTRIES,
    DRUGS,
    FIRST_NAMES,
    LAST_NAMES,
    ORGS,
    WORK_NOUNS,
)
from .sources.transcripts import generate_transcripts


def _alt(xs) -> str:
    return "|".join(re.escape(x) for x in sorted(xs, key=len, reverse=True))


_FULL = rf"(?:{_alt(FIRST_NAMES)}) (?:{_alt(LAST_NAMES)})"
# subject surfaces: full name first (leftmost-alternation preference),
# then bare surname, pronouns, nominal PERSON anaphors
_SUBJ = rf"(?:{_FULL}|{_alt(LAST_NAMES)}|He|She|They|The director|The officer)"
_OBJP = rf"(?:{_FULL}|{_alt(LAST_NAMES)})"
_CITY = rf"(?:{_alt(CITIES)})"
_CO = rf"(?:{_alt(COUNTRIES)})"
_ORG = rf"(?:{_alt(ORGS)})"
_ORGA = rf"(?:{_ORG}|The company|The firm)"
_DRUG = rf"(?:{_alt(DRUGS)})"
_NOUN_V = {"discussed": "discuss", "reviewed": "review",
           "approved": "approve", "rejected": "reject"}


def _prow(a1, t1, a2, t2, path, rep, example):
    tt1, tt2 = (t1 + "(1)", t2 + "(2)") if t1 == t2 else (t1, t2)
    return {"arg1_text": a1, "arg1_type": t1, "arg2_text": a2,
            "arg2_type": t2, "path": path,
            "typed_path": f"{tt1} -- {path} -- {tt2}",
            "instance_key": f"{a1} -- {path} -- {a2}",
            "repr": rep, "example": example}


_PRON_SUBJ = frozenset({"He", "She", "They"})


def _trow(trigger, core, rep, roles, types, values):
    return {"trigger": trigger, "core": core, "repr": rep,
            "roles": roles, "arg_types": types, "arg_values": values}


def _trees_unless_pron(subj, trees):
    """Clausal trees drop pronoun arguments (core/trees.py pronoun
    filter), so a pronoun-subject turn yields path rows but NO tree."""
    return [] if subj in _PRON_SUBJ else trees


# (compiled regex, path-row builder, tree-row builder); builders take the
# match object and return lists of rows.  Expected outputs are pinned
# literals — see the module docstring for the method.
_SHAPES: list[tuple] = []


def _shape(pattern):
    def deco(fn):
        _SHAPES.append((re.compile(pattern), fn))
        return fn
    return deco


@_shape(rf"(?P<s>{_SUBJ}) lives in (?P<c>{_CITY})\.")
def _t_lives(m):
    s, c = m["s"], m["c"]
    return [_prow(s, "PERSON", c, "GPE", "nsubj-1:live:prep:in:pobj",
                  "person lives in gpe", f"[{s}] lives in [{c}] .")], []


@_shape(rf"(?P<s>{_SUBJ}) has lived in (?P<c>{_CITY})\.")
def _t_has_lived(m):
    s, c = m["s"], m["c"]
    return [_prow(s, "PERSON", c, "GPE", "nsubj-1:live:prep:in:pobj",
                  "person has lived in gpe",
                  f"[{s}] has lived in [{c}] .")], []


@_shape(rf"(?P<s>{_SUBJ}) visited (?P<c>{_CITY})\.")
def _t_visited(m):
    s, c = m["s"], m["c"]
    return ([_prow(s, "PERSON", c, "GPE", "nsubj-1:visit:dobj",
                   "person visited gpe", f"[{s}] visited [{c}] .")],
            _trees_unless_pron(s, [
                _trow("visited", "visit nsubj:PERSON=PERSON dobj:GPE=GPE",
                      f"{s} visited {c}", ["nsubj", "dobj"],
                      ["PERSON", "GPE"], [s, c])]))


@_shape(rf"(?P<s>{_SUBJ}) died yesterday in (?P<c>{_CITY}), (?P<co>{_CO})\.")
def _t_died(m):
    s, c, co = m["s"], m["c"], m["co"]
    return ([
        _prow(s, "PERSON", "yesterday", "TIME", "nsubj-1:die:dobj",
              "person died time",
              f"[{s}] died [yesterday] in {c}, {co}."),
        _prow(s, "PERSON", c, "GPE", "nsubj-1:die:prep:in:pobj",
              "person died sth in gpe",
              f"[{s}] died yesterday in [{c}] , {co}."),
        _prow("yesterday", "TIME", c, "GPE", "dobj-1:die:prep:in:pobj",
              "sth died time in gpe",
              f"{s} died [yesterday] in [{c}] , {co}."),
        _prow(c, "GPE", co, "GPE", "appos", "gpe(1) , gpe(2)",
              f"{s} died yesterday in [{c}] , [{co}] ."),
    ], _trees_unless_pron(s, [
        _trow("died",
              "die nsubj:PERSON=PERSON dobj:TIME=TIME prep_in:GPE=GPE",
              f"{s} died yesterday {c}", ["nsubj", "dobj", "prep_in"],
              ["PERSON", "TIME", "GPE"], [s, "yesterday", c])]))


@_shape(rf"(?P<s>{_SUBJ}) was shot in (?P<c>{_CITY})\.")
def _t_shot(m):
    s, c = m["s"], m["c"]
    return [_prow(s, "PERSON", c, "GPE", "nsubj-1:shoot:prep:in:pobj",
                  "person was shot in gpe",
                  f"[{s}] was shot in [{c}] .")], []


@_shape(rf"(?P<s>{_SUBJ}) joined (?P<o>{_ORG})\.")
def _t_joined(m):
    s, o = m["s"], m["o"]
    return ([_prow(s, "PERSON", o, "ORGANIZATION", "nsubj-1:join:dobj",
                   "person joined organization", f"[{s}] joined [{o}] .")],
            _trees_unless_pron(s, [
                _trow("joined",
                      "join nsubj:PERSON=PERSON dobj:ORGANIZATION=ORGANIZATION",
                      f"{s} joined {o}", ["nsubj", "dobj"],
                      ["PERSON", "ORGANIZATION"], [s, o])]))


@_shape(rf"(?P<o>{_ORGA}) promoted (?P<p>{_OBJP})\.")
def _t_promoted(m):
    o, p = m["o"], m["p"]
    return ([_prow(o, "ORGANIZATION", p, "PERSON", "nsubj-1:promote:dobj",
                   "organization promoted person",
                   f"[{o}] promoted [{p}] .")],
            [_trow("promoted",
                   "promote nsubj:ORGANIZATION=ORGANIZATION dobj:PERSON=PERSON",
                   f"{o} promoted {p}", ["nsubj", "dobj"],
                   ["ORGANIZATION", "PERSON"], [o, p])])


@_shape(rf"(?P<s>{_SUBJ}) works for (?P<o>{_ORG})\.")
def _t_works(m):
    s, o = m["s"], m["o"]
    return [_prow(s, "PERSON", o, "ORGANIZATION",
                  "nsubj-1:work:prep:for:pobj",
                  "person works for organization",
                  f"[{s}] works for [{o}] .")], []


@_shape(rf"(?P<s>{_SUBJ}) met (?P<p2>{_OBJP}) in (?P<c>{_CITY})\.")
def _t_met(m):
    s, p2, c = m["s"], m["p2"], m["c"]
    return ([
        _prow(s, "PERSON", p2, "PERSON", "nsubj-1:meet:dobj",
              "person(1) met person(2)", f"[{s}] met [{p2}] in {c}."),
        _prow(s, "PERSON", c, "GPE", "nsubj-1:meet:prep:in:pobj",
              "person met sth in gpe", f"[{s}] met {p2} in [{c}] ."),
        _prow(p2, "PERSON", c, "GPE", "dobj-1:meet:prep:in:pobj",
              "sth met person in gpe", f"{s} met [{p2}] in [{c}] ."),
    ], _trees_unless_pron(s, [
        _trow("met",
              "meet nsubj:PERSON=PERSON dobj:PERSON=PERSON prep_in:GPE=GPE",
              f"{s} met {p2} {c}", ["nsubj", "dobj", "prep_in"],
              ["PERSON", "PERSON", "GPE"], [s, p2, c])]))


@_shape(rf"(?P<s>{_SUBJ}) seized a pound of (?P<d>{_DRUG})\.")
def _t_seized(m):
    s, d = m["s"], m["d"]
    return ([_prow(s, "PERSON", d, "DRUGS", "nsubj-1:seize:dobj:of:pobj",
                   "person seized pound of drugs",
                   f"[{s}] seized a pound of [{d}] .")],
            _trees_unless_pron(s, [
                _trow("seized", "seize nsubj:PERSON=PERSON dobj:OTHER=pound",
                      f"{s} seized pound", ["nsubj", "dobj"],
                      ["PERSON", "OTHER"], [s, "pound"])]))


@_shape(rf"The (?P<a>{_alt(ACTOR_NOUNS)}) "
        rf"(?P<v>discussed|reviewed|approved|rejected) "
        rf"the (?P<w>{_alt(WORK_NOUNS)})\.")
def _t_noun_filler(m):
    a, v, w = m["a"], m["v"], m["w"]
    base = _NOUN_V[v]
    return [], [_trow(v, f"{base} nsubj:OTHER={a} dobj:OTHER={w}",
                      f"{a} {v} {w}", ["nsubj", "dobj"],
                      ["OTHER", "OTHER"], [a, w])]


@_shape(rf"The weather in (?P<c>{_CITY}) was pleasant\.")
def _t_weather(m):
    c = m["c"]
    return [], [_trow("was", "be nsubj:GPE=GPE dobj:OTHER=pleasant",
                      f"{c} was pleasant", ["nsubj", "dobj"],
                      ["GPE", "OTHER"], [c, "pleasant"])]


def template_rows(text: str) -> tuple[list[dict], list[dict]]:
    """→ (path rows, tree rows) for one turn text; ([], []) for the
    row-less shapes (tool JSON, fillers, the >600-char sentence, the
    bracketed sentence — path extraction drops brackets and trees need a
    verb with both core args)."""
    for rx, fn in _SHAPES:
        m = rx.fullmatch(text)
        if m is not None:
            return fn(m)
    return [], []


def _corpus_rows(n_turns: int):
    """(conv_id, turn_idx, path rows, tree rows) per turn, with a
    distinct-text memo (template recognition is pure in the text)."""
    tr, _ = generate_transcripts(n_turns, seed=42)
    memo: dict[str, tuple] = {}
    for cid, ti, text in zip(tr.column("conv_id").to_pylist(),
                             tr.column("turn_idx").to_pylist(),
                             tr.column("text").to_pylist()):
        text = text or ""
        rows = memo.get(text)
        if rows is None:
            rows = template_rows(text)
            memo[text] = rows
        yield cid, ti, rows[0], rows[1]


def _src_key(conv: str, turn: int) -> str:
    return f"{conv}#{turn:09d}"


def gold_path_type_counts_template(n_turns: int = 3000) -> pd.DataFrame:
    """typed_path → (count, repr/example of the min src-key instance)."""
    rows = []
    for cid, ti, prows, _ in _corpus_rows(n_turns):
        for r in prows:
            rows.append({"typed_path": r["typed_path"],
                         "payload": f"{_src_key(cid, ti)}\x01"
                                    f"{r['repr']}\x01{r['example']}"})
    df = pd.DataFrame(rows)
    agg = (df.groupby("typed_path")
           .agg(count=("payload", "size"), payload=("payload", "min"))
           .reset_index())
    agg["repr"] = agg["payload"].str.split("\x01").str[1]
    agg["example"] = agg["payload"].str.split("\x01").str[2]
    return agg.drop(columns=["payload"])


def gold_path_instance_counts_template(n_turns: int = 1500) -> pd.DataFrame:
    rows = []
    for _, _, prows, _ in _corpus_rows(n_turns):
        rows.extend(r["instance_key"] for r in prows)
    return (pd.Series(rows, name="instance_key").value_counts()
            .sort_index().rename("count").reset_index()
            .rename(columns={"index": "instance_key"})
            .sort_values("instance_key", kind="mergesort")
            .reset_index(drop=True))


def gold_tree_counts_template(n_turns: int = 1500) -> pd.DataFrame:
    rows = []
    for cid, ti, _, trows in _corpus_rows(n_turns):
        for r in trows:
            rows.append({"core": r["core"],
                         "payload": f"{_src_key(cid, ti)}\x01{r['repr']}"})
    df = pd.DataFrame(rows)
    agg = (df.groupby("core")
           .agg(count=("payload", "size"), payload=("payload", "min"))
           .reset_index())
    agg["repr"] = agg["payload"].str.split("\x01").str[1]
    return agg.drop(columns=["payload"])


def gold_events_decoded_template(n_turns: int = 1500) -> pd.DataFrame:
    """Tree rows decoded through the event rule table (shared DATA; the
    key-signature strip is reimplemented inline)."""
    from .pipelines.events import DEFAULT_EVENT_RULES

    def core_prefix(core: str) -> str:
        return " ".join(p.split("=", 1)[0] for p in core.split(" "))

    rows = []
    for cid, ti, _, trows in _corpus_rows(n_turns):
        for r in trows:
            et = DEFAULT_EVENT_RULES.get(core_prefix(r["core"]))
            if et is not None:
                rows.append({"conv_id": cid, "turn_idx": ti,
                             "trigger": r["trigger"], "core": r["core"],
                             "repr": r["repr"], "event_type": et})
    return pd.DataFrame(rows)


def template_path_rows_df(n_turns: int) -> pd.DataFrame:
    """Per-turn path rows as a frame (the column shape of
    ``oracle._serial_path_rows``), from the template derivation."""
    rows = []
    for cid, ti, prows, _ in _corpus_rows(n_turns):
        for r in prows:
            rows.append({"conv_id": cid, "turn_idx": ti, **r})
    return pd.DataFrame(rows)


def template_tree_rows_df(n_turns: int) -> pd.DataFrame:
    """Per-turn tree rows (the column shape of
    ``oracle._serial_tree_rows``, incl. the nsubj:dobj arg_pair)."""
    rows = []
    for cid, ti, _, trows in _corpus_rows(n_turns):
        for r in trows:
            by_role = dict(zip(r["roles"], r["arg_values"]))
            rows.append({"conv_id": cid, "turn_idx": ti,
                         "trigger": r["trigger"], "core": r["core"],
                         "repr": r["repr"],
                         "arg_pair": (by_role.get("nsubj", "").lower()
                                      + ":"
                                      + by_role.get("dobj", "").lower())})
    return pd.DataFrame(rows)


def gold_bootstrap_candidates_template(n_turns: int = 2000) -> pd.DataFrame:
    """Shared-arg path bootstrap over TEMPLATE-derived path rows (the
    candidate logic is the oracle's pandas re-derivation; only the path
    rows come from the independent template derivation)."""
    from .oracle import gold_bootstrap_candidates
    return gold_bootstrap_candidates(
        n_turns, df=template_path_rows_df(n_turns))


def gold_event_bootstrap_candidates_template(
        n_turns: int = 1500) -> pd.DataFrame:
    from .oracle import gold_event_bootstrap_candidates
    return gold_event_bootstrap_candidates(
        n_turns, df=template_tree_rows_df(n_turns))
