"""Clausal tree (event) extraction — the IceTree pipeline
(events/IceTree.java:283-390 extraction, :403-470 core string /
lemmatize / keySignature, :495-533 linearize).

Semantics mirrored:
- deps indexed by source; ``prep`` + ``pobj`` collapse to ``prep_X``
  (addPrepLinks, IceTree.java:283-310);
- for each verb-headed node take role dependents {nsubj, dobj, iobj,
  prep_*}; pronoun arguments abort the tree; argument entity types from
  the mention dictionary (ENAMEX/EDT lookup, J8), else OTHER;
- a tree is kept only if it has both nsubj and dobj (IceTree.java:383-388);
- core string ``trigger role:TYPE=value ...``; key signature lemmatizes
  the trigger and uppercases entity types, OTHER args keep their value.
"""

from __future__ import annotations

from ..config import MAX_ALLOWABLE_SENTENCE_LENGTH
from ..nlp.stemmer import stem

_PRONOUNS = {"he", "she", "it", "they", "him", "her", "them", "we", "you", "i",
             "his", "hers", "its", "their", "this", "that", "these", "those"}

_ROLE_ORDER = {"nsubj": 0, "dobj": 1, "iobj": 2}


def extract_trees_from_turn(
    text: str,
    sentences: list[tuple[int, int]],
    tokens: list[tuple[int, int, str, str]],
    mentions: list[tuple[int, int, int, int, str, str]],
    deps: list[tuple],
) -> list[dict]:
    """→ tree rows: trigger, core (key signature), repr, roles/types/values."""
    type_at = {m[2]: m[4] for m in mentions}
    pos_at = {t[0]: t[3] for t in tokens}

    # index by source; collapse prep+pobj → prep_X
    by_source: dict[int, list[tuple[str, str, int]]] = {}
    prep_obj: dict[int, tuple[str, int]] = {}  # prep token posn → (obj word, posn)
    for label, sw, sp, spos, tw, tp, tpos in deps:
        if label == "pobj":
            prep_obj[sp] = (tw, tp)
    for label, sw, sp, spos, tw, tp, tpos in deps:
        if label == "prep" and tp in prep_obj:
            ow, op = prep_obj[tp]
            by_source.setdefault(sp, []).append((f"prep_{tw.lower()}", ow, op))
        elif label in ("nsubj", "dobj", "iobj"):
            by_source.setdefault(sp, []).append((label, tw, tp))

    rows: list[dict] = []
    for ss, se in sentences:
        if se - ss > MAX_ALLOWABLE_SENTENCE_LENGTH:
            continue
        for posn, args in by_source.items():
            if not (ss <= posn < se):
                continue
            if not pos_at.get(posn, "").startswith("V"):
                continue
            roles, values, types, posns = [], [], [], []
            aborted = False
            for role, word, wp in sorted(
                    args, key=lambda a: (_ROLE_ORDER.get(a[0], 3), a[2])):
                clean = word.replace("_", " ")
                if clean.lower() in _PRONOUNS:
                    aborted = True
                    break
                roles.append(role)
                values.append(clean)
                types.append(type_at.get(wp, "OTHER"))
                posns.append(wp)
            if aborted or "nsubj" not in roles or "dobj" not in roles:
                continue
            trigger = next(t[2] for t in tokens if t[0] == posn)
            core = _key_signature(trigger, roles, types, values)
            rows.append({
                "trigger": trigger,
                "core": core,
                "repr": _linearize(trigger, roles, values, posns, posn),
                "roles": list(roles),
                "arg_types": list(types),
                "arg_values": list(values),
            })
    return rows


def _key_signature(trigger: str, roles, types, values) -> str:
    """``trigger role:TYPE=value ...`` with lemmatized trigger, uppercased
    entity types; OTHER args are replaced by their (stemmed) value
    (IceTree.java:428-470)."""
    parts = [stem(trigger.lower(), "V")]
    for role, typ, val in zip(roles, types, values):
        slot = stem(val.lower(), "NNS") if typ == "OTHER" else typ.upper()
        parts.append(f"{role}:{typ.upper()}={slot}")
    return " ".join(parts)


def _linearize(trigger: str, roles, values, posns, trigger_posn) -> str:
    """Surface rendering: subj trigger dobj iobj prep args in offset order
    (IceTree.java:495-533)."""
    items = [(trigger_posn, trigger)]
    for role, val, wp in zip(roles, values, posns):
        items.append((wp, val))
    items.sort()
    return " ".join(w for _, w in items)
