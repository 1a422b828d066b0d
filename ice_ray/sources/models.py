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
