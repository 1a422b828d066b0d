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


# --- template-grammar annotations (independent P1-chain derivation) --------
# A from-scratch mini-annotator for the CLOSED corpus grammar: its own
# tokenizer regex, a PINNED word→POS table (replacing the suffix-heuristic
# tagger), regex longest-match mentions (replacing the token-tuple
# scanner), and per-shape pinned dependency patterns (replacing the
# parser entirely).  Every corpus turn is single-sentence by construction.

_T_RE = re.compile(r"\$?\d+(?:[.,]\d+)*|[A-Za-z]+(?:['\-][A-Za-z]+)*|'s|\S")
_D_RE = re.compile(r"\$?\d")

# pinned POS per vocabulary word (lowercased key); everything else:
# digits → CD, single non-alpha char → itself, default NN
_POS: dict[str, str] = {
    "was": "VBD", "has": "VBZ",
    **{w: "VBD" for w in ("lived", "visited", "died", "joined", "promoted",
                          "met", "seized", "discussed", "reviewed",
                          "approved", "rejected", "shot")},
    "lives": "VBZ", "works": "VBZ", "report": "VB",
    "the": "DT", "a": "DT", "that": "DT",
    "in": "IN", "for": "IN", "of": "IN", "to": "TO", "and": "CC",
    **{w: "NNS" for w in ("thanks", "notes", "mentions", "sounds", "rows",
                          "contains")},
}

# mention alternation: longest-first over the closed entity surfaces
from .nlp.lexicon import NOMINAL_ANAPHORA  # noqa: E402


def _mention_regex() -> "re.Pattern":
    surfaces: set[str] = set()
    for f in FIRST_NAMES:
        surfaces.add(f)
        for l in LAST_NAMES:
            surfaces.add(f + " " + l)
    surfaces |= set(LAST_NAMES) | set(CITIES) | set(COUNTRIES)
    surfaces |= set(ORGS) | set(DRUGS)
    for p in ("he", "she", "they", "him", "her", "them"):
        surfaces |= {p, p.capitalize()}
    for ph in NOMINAL_ANAPHORA:
        surfaces |= {ph, ph[0].upper() + ph[1:]}
    alt = "|".join(re.escape(s)
                   for s in sorted(surfaces, key=len, reverse=True))
    return re.compile(rf"(?<![A-Za-z])(?:{alt})(?![A-Za-z])")


_MENT_RE = _mention_regex()
_NAME_TYPE: dict[str, str] = {}
for _f in FIRST_NAMES:
    _NAME_TYPE[_f] = "PERSON"
    for _l in LAST_NAMES:
        _NAME_TYPE[_f + " " + _l] = "PERSON"
for _l in LAST_NAMES:
    _NAME_TYPE[_l] = "PERSON"
for _c in CITIES + COUNTRIES:
    _NAME_TYPE[_c] = "GPE"
for _o in ORGS:
    _NAME_TYPE[_o] = "ORGANIZATION"
for _d in DRUGS:
    _NAME_TYPE[_d] = "DRUGS"
for _p in ("he", "she", "they", "him", "her", "them"):
    _NAME_TYPE[_p] = _NAME_TYPE[_p.capitalize()] = "PERSON"
for _ph, _t in NOMINAL_ANAPHORA.items():
    _NAME_TYPE[_ph] = _NAME_TYPE[_ph[0].upper() + _ph[1:]] = _t

_TIME_WORDS = ("yesterday", "today", "tomorrow")

# per-shape dependency patterns over the COLLAPSED token words: each
# entry is (label, src word index, tgt word index) into the collapsed
# token list of that shape (pinned from the grammar, not parsed)
_DEP_SHAPES: list[tuple["re.Pattern", list[tuple[str, int, int]]]] = [
    (re.compile(rf"{_SUBJ} lives in {_CITY}\."),
     [("nsubj", 1, 0), ("prep", 1, 2), ("pobj", 2, 3), ("punct", 1, 4)]),
    (re.compile(rf"{_SUBJ} has lived in {_CITY}\."),
     [("vch", 1, 2), ("nsubj", 1, 0), ("prep", 2, 3), ("pobj", 3, 4),
      ("punct", 1, 5)]),
    (re.compile(rf"{_SUBJ} visited {_CITY}\."),
     [("nsubj", 1, 0), ("dobj", 1, 2), ("punct", 1, 3)]),
    (re.compile(rf"{_SUBJ} died yesterday in {_CITY}, {_CO}\."),
     [("nsubj", 1, 0), ("dobj", 1, 2), ("prep", 1, 3), ("pobj", 3, 4),
      ("appos", 4, 6), ("punct", 1, 7)]),
    (re.compile(rf"{_SUBJ} was shot in {_CITY}\."),
     [("vch", 1, 2), ("nsubj", 1, 0), ("prep", 2, 3), ("pobj", 3, 4),
      ("punct", 1, 5)]),
    (re.compile(rf"{_SUBJ} joined {_ORG}\."),
     [("nsubj", 1, 0), ("dobj", 1, 2), ("punct", 1, 3)]),
    (re.compile(rf"{_ORGA} promoted {_OBJP}\."),
     [("nsubj", 1, 0), ("dobj", 1, 2), ("punct", 1, 3)]),
    (re.compile(rf"{_SUBJ} works for {_ORG}\."),
     [("nsubj", 1, 0), ("prep", 1, 2), ("pobj", 2, 3), ("punct", 1, 4)]),
    (re.compile(rf"{_SUBJ} met {_OBJP} in {_CITY}\."),
     [("nsubj", 1, 0), ("dobj", 1, 2), ("prep", 1, 3), ("pobj", 3, 4),
      ("punct", 1, 5)]),
    (re.compile(rf"{_SUBJ} seized a pound of {_DRUG}\."),
     [("nsubj", 1, 0), ("dobj", 1, 3), ("prep", 3, 4), ("pobj", 4, 5),
      ("punct", 1, 6)]),
    (re.compile(rf"The (?:{_alt(ACTOR_NOUNS)}) "
                rf"(?:discussed|reviewed|approved|rejected) "
                rf"the (?:{_alt(WORK_NOUNS)})\."),
     [("nsubj", 2, 1), ("dobj", 2, 4), ("punct", 2, 5)]),
    (re.compile(rf"The weather in {_CITY} was pleasant\."),
     [("nsubj", 4, 3), ("dobj", 4, 5), ("punct", 4, 6)]),
    (re.compile(r"Please summarize the report\."),
     [("nsubj", 3, 1), ("punct", 3, 4)]),
]


def annotate_template(text: str) -> dict:
    """Independent annotation of one corpus turn: {sentences, tokens,
    mentions, deps} in the exact tuple shapes of core.annotate."""
    raw = [(m.start(), m.end(), m.group()) for m in _T_RE.finditer(text)]
    # mentions: longest-first regex + NUMBER/TIME token rules
    ments: list[tuple] = []
    for m in _MENT_RE.finditer(text):
        etype = _NAME_TYPE[m.group()]
        ments.append((m.start(), m.end(), m.start(), m.end(), etype, "NAM"))
    name_spans = [(a, b) for a, b, *_ in ments]

    def in_name(s: int) -> bool:
        return any(a <= s < b for a, b in name_spans)

    for s, e, w in raw:
        if _D_RE.match(w) and not in_name(s):
            ments.append((s, e, s, e, "NUMBER", "NAM"))
        elif w.lower() in _TIME_WORDS and not in_name(s):
            ments.append((s, e, s, e, "TIME", "NAM"))
    ments.sort(key=lambda m: m[0])

    # collapse mention extents into one token; pinned POS elsewhere
    toks: list[tuple] = []
    i = 0
    spans = [(m[0], m[1], m[4]) for m in ments]
    si = 0
    while i < len(raw):
        s, e, w = raw[i]
        while si < len(spans) and spans[si][1] <= s:
            si += 1
        if si < len(spans) and spans[si][0] <= s < spans[si][1]:
            ms, me, mtype = spans[si]
            parts = []
            while i < len(raw) and raw[i][0] < me:
                parts.append(raw[i][2])
                i += 1
            pos = "CD" if mtype in ("NUMBER", "MONEY") else "NNP"
            toks.append((ms, me, "_".join(parts), pos))
        else:
            lw = w.lower()
            if _D_RE.match(w):
                pos = "CD"
            elif not any(c.isalpha() for c in w):
                pos = w if len(w) == 1 else "SYM"
            else:
                pos = _POS.get(lw, "NN")
            toks.append((s, e, w, pos))
            i += 1

    deps: list[tuple] = []
    for rx, pattern in _DEP_SHAPES:
        if rx.fullmatch(text):
            for label, si_, ti_ in pattern:
                sw, tw = toks[si_], toks[ti_]
                deps.append((label, sw[2], sw[0], sw[3],
                             tw[2], tw[0], tw[3]))
            break
    return {"sentences": [(0, len(text))] if text else [],
            "tokens": toks, "mentions": ments, "deps": deps}


def template_annotations(n_turns: int):
    """(conv_id, turn_idx, ann) per turn from the independent
    annotator — the drop-in counterpart of oracle._serial_annotations."""
    tr, _ = generate_transcripts(n_turns, seed=42)
    memo: dict[str, dict] = {}
    for cid, ti, text in zip(tr.column("conv_id").to_pylist(),
                             tr.column("turn_idx").to_pylist(),
                             tr.column("text").to_pylist()):
        text = text or ""
        ann = memo.get(text)
        if ann is None:
            ann = annotate_template(text)
            memo[text] = ann
        yield cid, ti, ann


def gold_annotations_template(n_turns: int = 500) -> pd.DataFrame:
    from .oracle import ann_struct_dicts, annotation_fingerprint
    rows = []
    for cid, ti, ann in template_annotations(n_turns):
        sents, toks, ments, deps = ann_struct_dicts(ann)
        rows.append({"conv_id": cid, "turn_idx": ti,
                     "n_sentences": len(sents), "n_tokens": len(toks),
                     "n_mentions": len(ments), "n_deps": len(deps),
                     "ann_fp": annotation_fingerprint(sents, toks, ments,
                                                      deps)})
    return pd.DataFrame(rows)


# Pinned for the name-term filter (nlp/lexicon.py's PRONOUNS is engine
# code; the gold pins the six corpus pronouns by hand).
ICE_TERM_PRONOUNS = frozenset({"he", "she", "they", "him", "her", "them"})


def gold_ice_terms_template(n_turns: int = 1500) -> pd.DataFrame:
    """Term candidates with an INDEPENDENT aggregation over the
    template-grammar annotations: explicit index-scan run segmentation
    and dict counting (the serial oracle uses a token-streaming Counter
    loop).  TERM_STOPWORDS is shared DATA."""
    from .config import TERM_STOPWORDS

    freq: dict[str, int] = {}
    doc_freq: dict[str, int] = {}
    for _, _, ann in template_annotations(n_turns):
        toks = ann["tokens"]          # (start, end, word, pos)
        name_spans = [(a, b) for a, b, _hs, _he, _t, m in ann["mentions"]
                      if m == "NAM"]
        turn_terms: list[str] = []

        # maximal runs of noun/adjective tokens, by index scan
        qual = [p in ("NN", "NNS") or p.startswith("JJ")
                for _s, _e, _w, p in toks]
        i = 0
        while i < len(toks):
            if not qual[i]:
                i += 1
                continue
            j = i
            while j + 1 < len(toks) and qual[j + 1]:
                j += 1
            run_start = toks[i][0]
            if not any(a <= run_start < b for a, b in name_spans):
                for k in range(j, i - 1, -1):
                    w = toks[k][2]
                    if len(w) <= 1 or w in TERM_STOPWORDS or w.startswith("'"):
                        break
                    turn_terms.append(
                        " ".join(t[2] for t in toks[k:j + 1]) + "/nn")
            i = j + 1

        # name terms: first token at each NAM mention start
        start_tok = {}
        for t in reversed(toks):      # first-in-order wins
            start_tok[t[0]] = t
        for a, _b, _hs, _he, etype, m in ann["mentions"]:
            if m != "NAM" or etype in ("NUMBER", "MONEY", "TIME"):
                continue
            t = start_tok.get(a)
            if t is None or t[2].lower() in ICE_TERM_PRONOUNS:
                continue
            term = t[2].replace("_", " ") + "/nnp"
            if len(term) > 5 and term[0].isalpha():
                turn_terms.append(term)

        for term in turn_terms:
            freq[term] = freq.get(term, 0) + 1
        for term in set(turn_terms):
            doc_freq[term] = doc_freq.get(term, 0) + 1

    return pd.DataFrame({"term": list(freq.keys()),
                         "freq": list(freq.values()),
                         "doc_freq": [doc_freq[t] for t in freq]})


# Hand-pinned stems for the CLOSED corpus vocabulary of dependency
# context words (the non-noun endpoint of a dep attached to a noun).
# Pinned from plain English, not from nlp/stemmer.py — if the engine's
# stemmer ever drifts on these, test_gold_oracle's serial==template
# cross-check fails loudly.  Identity-stem words are listed too so an
# unexpected NEW vocabulary word raises instead of silently passing
# through unstemmed.
PINNED_CONTEXT_STEMS = {
    "approved": "approve",
    "discussed": "discuss",
    "rejected": "reject",
    "reviewed": "review",
    "seized": "seize",
    "report": "report",
}


def gold_pmi_index_template(n_turns: int = 1500,
                            min_pmi: float = 0.1) -> pd.DataFrame:
    """PMI index from the template-grammar annotations with its own
    aggregation: pinned stem table (no nlp/stemmer.py), pandas marginal
    joins (no Counter loops).  TERM_STOPWORDS is shared DATA (same
    precedent as DEFAULT_EVENT_RULES in the events_decoded gold)."""
    import numpy as np

    from .config import TERM_STOPWORDS

    def pin_stem(w: str) -> str:
        try:
            return PINNED_CONTEXT_STEMS[w]
        except KeyError:
            raise ValueError(
                f"corpus grammar drifted: context word {w!r} has no pinned "
                f"stem — extend PINNED_CONTEXT_STEMS by hand") from None

    pairs: list[tuple[str, str]] = []
    for _, _, ann in template_annotations(n_turns):
        noun_at = {t[0]: t[2] for t in ann["tokens"]
                   if t[3] in ("NN", "NNS") and len(t[2]) > 1
                   and t[2].lower() not in TERM_STOPWORDS}
        for label, sw, sp, _spos, tw, tp, _tpos in ann["deps"]:
            tgt_noun = noun_at.get(tp)
            if tgt_noun is not None and sw.lower() not in TERM_STOPWORDS:
                pairs.append((tgt_noun.lower(),
                              f"{label}-1_{pin_stem(sw.lower())}"))
            src_noun = noun_at.get(sp)
            if src_noun is not None and tw.lower() not in TERM_STOPWORDS:
                pairs.append((src_noun.lower(),
                              f"{label}_{pin_stem(tw.lower())}"))

    cells = (pd.DataFrame(pairs, columns=["term", "ctx"])
             .groupby(["term", "ctx"]).size().rename("n").reset_index())
    cells = cells.merge(cells.groupby("term")["n"].sum().rename("row_sum"),
                        on="term")
    cells = cells.merge(cells.groupby("ctx")["n"].sum().rename("col_sum"),
                        on="ctx")
    n_total = cells["n"].sum()
    # same op order as the engine (entity_index.py cell()) and the serial
    # gold — n/rs/(cs/N) — and filter on the UNROUNDED value: rounding
    # first would drop/keep threshold-boundary rows differently from both
    pmi = np.log(cells["n"] / cells["row_sum"] / (cells["col_sum"] / n_total))
    cells["pmi"] = [round(float(v), 6) for v in pmi]
    out = cells.loc[pmi > min_pmi, ["term", "ctx", "pmi"]]
    return out.reset_index(drop=True)
