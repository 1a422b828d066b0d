"""Model artifacts: the relation pattern table and entity sets.

The Ray analog of ICE's JET export (models/JetEngineBuilder.java:56-262,
``ldpRelationModel`` lines ``ARG1TYPE--path--ARG2TYPE = relationType[-1]``,
read back by relation/PathRelationExtractor.java:39-54).  Tables are plain
dicts, broadcast to tagger actors via ``ray.put`` once per run.
"""

from __future__ import annotations

import json
from pathlib import Path

# typed-path key exactly as extraction emits it (core/extract.py):
# "TYPE1 -- path -- TYPE2" with (1)/(2) subscripts for same-type pairs.
DEFAULT_RELATION_RULES: dict[str, str] = {
    "PERSON -- nsubj-1:live:prep:in:pobj -- GPE": "livesIn",
    "PERSON -- nsubj-1:visit:dobj -- GPE": "visited",
    "PERSON -- nsubj-1:die:prep:in:pobj -- GPE": "diedIn",
    "PERSON -- nsubj-1:shoot:prep:in:pobj -- GPE": "shotIn",
    "PERSON -- nsubj-1:join:dobj -- ORGANIZATION": "memberOf",
    "ORGANIZATION -- nsubj-1:promote:dobj -- PERSON": "promoted",
    "PERSON -- nsubj-1:work:prep:for:pobj -- ORGANIZATION": "worksFor",
    "PERSON(1) -- nsubj-1:meet:dobj -- PERSON(2)": "met",
    "GPE(1) -- appos -- GPE(2)": "locatedIn",
    "PERSON -- nsubj-1:seize:dobj:of:pobj -- DRUGS": "seized",
}


def save_rules(rules: dict[str, str], path: str | Path) -> None:
    """Write the pattern model ('ldpRelationModel' analog) as text lines
    ``key = relationType`` (JetEngineBuilder.java:200-231 format)."""
    with open(path, "w") as f:
        for k, v in sorted(rules.items()):
            f.write(f"{k} = {v}\n")


def load_rules(path: str | Path) -> dict[str, str]:
    """Read a pattern model (PathRelationExtractor.java:39-54 format);
    skips EMPTY paths like the reference."""
    rules: dict[str, str] = {}
    for line in Path(path).read_text().splitlines():
        if " = " not in line:
            continue
        k, _, v = line.partition(" = ")
        if "EMPTY" in k:
            continue
        rules[k.strip()] = v.strip()
    return rules


def typed_rule_key(path: str, arg1_type: str, arg2_type: str) -> str:
    """``TYPE1 -- path -- TYPE2`` with the (1)/(2) subscripts extraction
    uses for same-type pairs (core/extract.py:112-115)."""
    if arg1_type == arg2_type and arg1_type != "OTHER":
        return f"{arg1_type}(1) -- {path} -- {arg2_type}(2)"
    return f"{arg1_type} -- {path} -- {arg2_type}"


def build_relation_model(relation: str, arg1_type: str, arg2_type: str,
                         accepted_paths: list[str],
                         rejected_paths: list[str]) -> tuple[dict, dict]:
    """Bootstrap review → (positive rules, negative rules).

    The reference's RelationBuilder flow: paths the user approves become
    ``ldpRelationModel`` lines, paths the user REJECTS become entries in
    the negative table for the same relation (JetEngineBuilder.java
    writes both; PathRelationExtractor.java:29-70 loads them and the
    soft matcher discounts any match that is closer to a negative rule
    than to a positive one).  Both tables key by the typed path."""
    pos = {typed_rule_key(p, arg1_type, arg2_type): relation
           for p in accepted_paths}
    neg = {typed_rule_key(p, arg1_type, arg2_type): relation
           for p in rejected_paths}
    return pos, neg


def save_neg_rules(neg_rules: dict[str, str], path: str | Path) -> None:
    """Negative table, same line format as the positive model
    (PathRelationExtractor.loadNeg, :56-70)."""
    save_rules(neg_rules, path)


def load_neg_rules(path: str | Path) -> dict[str, str]:
    return load_rules(path)


def save_onoma(entity_sets: dict[str, list[str]], path: str | Path) -> None:
    """Write the name → type dictionary ('iceOnoma.dict' analog,
    JetEngineBuilder.buildOnoma, models/JetEngineBuilder.java:140-156):
    tab-separated ``name\\tTYPE`` lines, sorted."""
    with open(path, "w") as f:
        for etype, names in sorted(entity_sets.items()):
            for name in sorted(names):
                f.write(f"{name}\t{etype}\n")


def load_onoma(path: str | Path) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for line in Path(path).read_text().splitlines():
        if "\t" not in line:
            continue
        name, _, etype = line.partition("\t")
        out.setdefault(etype, []).append(name)
    return out


def save_session(state: dict, path: str | Path) -> None:
    """JSON session manifest — the ice.yml analog (controllers/Nice.java:49-59)."""
    Path(path).write_text(json.dumps(state, indent=2, sort_keys=True))


def load_session(path: str | Path) -> dict:
    return json.loads(Path(path).read_text())
