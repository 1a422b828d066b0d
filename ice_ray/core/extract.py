"""Path extraction over annotated turns — the KG-construction core
(mirrors DepPaths.collectPaths/recordPaths, models/DepPaths.java:288-414).

Pure function per turn; runs vectorized-over-rows inside an extraction
``map_batches`` stage.  Known deviation from the reference, by design:
the reference's pair loop ``for (i=0; i<mis-2; i++)`` (DepPaths.java:326)
never pairs the last two mentions of a sentence (a 2-mention sentence
yields no paths), which contradicts its own validateCLI expectation of one
relation per tiny doc; we use ``i < mis-1`` and our oracle uses the same
rule, so the P/R contract is internally consistent.
"""

from __future__ import annotations

import re

from ..config import (
    MAX_ALLOWABLE_SENTENCE_LENGTH,
    MAX_INTERVENING_MENTIONS,
    MAX_MENTIONS_IN_SENTENCE,
    MAX_PATH_EDGES,
    SKIPPED_SENTENCES_AT_BEGINNING,
)
from .deppath import (
    Rel,
    RelationSet,
    build_syntactic_path,
    linearize,
    normalize_repr,
    path_string,
    regularize,
    transform,
)

_BAD_CHARS = ("(", ")", "[", "]", "{", "}", '"')
_WS = re.compile(r"\s+")


def _norm_ws(s: str) -> str:
    return _WS.sub(" ", s).strip()


def _bracketed_example(text: str, sent: tuple[int, int], m1, m2) -> str:
    """Sentence text with both mentions [bracketed] (DepPaths.java:487-507)."""
    s, e = sent
    h1s, h1e = m1[0], m1[1]
    h2s, h2e = m2[0], m2[1]
    out = []
    if s < h1s:
        out.append(_norm_ws(text[s:h1s]))
    out.append(" [" + _norm_ws(text[h1s:h1e]) + "] ")
    if h1e < h2s:
        out.append(_norm_ws(text[h1e:h2s]))
    out.append(" [" + _norm_ws(text[h2s:h2e]) + "] ")
    if h2e < e:
        out.append(_norm_ws(text[h2e:e]))
    return _norm_ws("".join(out))


def extract_paths_from_turn(
    text: str,
    sentences: list[tuple[int, int]],
    tokens: list[tuple[int, int, str, str]],
    mentions: list[tuple[int, int, int, int, str, str]],
    deps: list[tuple],
    max_intervening: int = MAX_INTERVENING_MENTIONS,
    emit_repr: bool = True,
) -> list[dict]:
    """→ path rows: arg1/arg2 text+type, path, typed_path, instance key,
    repr, example."""
    if not deps or len(mentions) < 2:
        return []
    raw = RelationSet([Rel(*d) for d in deps])
    trans = transform(raw)
    raw.add_inverses()
    trans.add_inverses()
    pos_of = {t[0]: t[3] for t in tokens}

    def pos_at(p: int) -> str:
        return pos_of.get(p, "?")

    rows: list[dict] = []
    for sent_count, (ss, se) in enumerate(sentences, start=1):
        if sent_count == SKIPPED_SENTENCES_AT_BEGINNING:
            continue
        if se - ss > MAX_ALLOWABLE_SENTENCE_LENGTH:
            continue
        sent_text = text[ss:se]
        if any(c in sent_text for c in _BAD_CHARS):
            continue
        ms = [m for m in mentions if ss <= m[2] < se]
        ms.sort(key=lambda m: m[0])
        mis = len(ms)
        if mis < 2 or mis > MAX_MENTIONS_IN_SENTENCE:
            continue
        local_spans = [(m[2], m[3]) for m in ms]
        for i in range(mis - 1):
            for j in range(1, min(max_intervening + 1, mis - 1 - i) + 1):
                m1, m2 = ms[i], ms[i + j]
                h1, h2 = (m1[2], m1[3]), (m2[2], m2[3])
                s1, s2 = (m1[0], m1[1]), (m2[0], m2[1])
                path = build_syntactic_path(h1[0], h2[0], s1, s2, raw, local_spans)
                tpath = build_syntactic_path(h1[0], h2[0], s1, s2, trans, local_spans)
                if path is None or tpath is None:
                    continue
                reg = regularize(tpath)
                if len(reg) > MAX_PATH_EDGES:
                    continue
                m1_text = _norm_ws(text[m1[0]:m1[1]])
                m2_text = _norm_ws(text[m2[0]:m2[1]])
                type1, type2 = m1[4], m2[4]
                if type1 == type2 and type1 != "OTHER":
                    t1, t2 = type1 + "(1)", type2 + "(2)"
                else:
                    t1, t2 = type1, type2
                pstr = path_string(reg)
                full_path = f"{t1} -- {pstr} -- {t2}"
                row = {
                    "arg1_text": m1_text,
                    "arg1_type": type1,
                    "arg2_text": m2_text,
                    "arg2_type": type2,
                    "path": pstr,
                    "typed_path": full_path,
                    "instance_key": f"{m1_text} -- {pstr} -- {m2_text}",
                }
                if emit_repr:
                    row["repr"] = normalize_repr(
                        linearize(path, raw, pos_at, t1, t2, use_stem=False))
                    row["example"] = _bracketed_example(text, (ss, se), m1, m2)
                rows.append(row)
    return rows
