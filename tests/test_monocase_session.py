"""Monocase mode (P2) and the session store (S9)."""

from ice_ray.core.annotate import annotate_text
from ice_ray.core.extract import extract_paths_from_turn
from ice_ray.nlp.lexicon import (
    build_entity_dict,
    lower_entity_dict,
    max_entity_phrase_len,
)


def _extract(text):
    ed = build_entity_dict()
    ld = lower_entity_dict(ed)
    ml = max_entity_phrase_len(ed)
    ann = annotate_text(text, ed, ml, ld)
    return extract_paths_from_turn(text, ann["sentences"], ann["tokens"],
                                   ann["mentions"], ann["deps"])


def test_monocase_turn_extracts():
    # whole-turn lowercase → monocase fold (Ace.allLowerCase analog)
    rows = _extract("fred smith lives in chicago.")
    assert len(rows) == 1
    assert rows[0]["typed_path"] == "PERSON -- nsubj-1:live:prep:in:pobj -- GPE"
    assert rows[0]["arg1_text"] == "fred smith"


def test_mixed_case_does_not_fold():
    # lowercase name inside a mixed-case turn stays unmatched (monocase is
    # a document-level flag, not per-token)
    rows = _extract("The report says fred smith lives in chicago.")
    assert rows == []


def test_session_store_roundtrip(tmp_path):
    from ice_ray.sources.models import load_session, save_session

    state = {
        "corpora": ["c1"],
        "entitySets": {"DRUGS": ["heroin", "cocaine"]},
        "relations": {"livesIn": ["nsubj-1:live:prep:in:pobj"]},
        "selectedCorpus": "c1",
    }
    p = tmp_path / "ice_session.json"
    save_session(state, p)
    assert load_session(p) == state


def test_onoma_roundtrip(tmp_path):
    from ice_ray.sources.models import load_onoma, save_onoma

    sets = {"DRUGS": ["heroin", "cocaine"], "GPE": ["Chicago"]}
    p = tmp_path / "iceOnoma.dict"
    save_onoma(sets, p)
    got = load_onoma(p)
    assert {k: sorted(v) for k, v in got.items()} == \
        {k: sorted(v) for k, v in sets.items()}
    # extra sets feed the annotator dictionary (A2/A3)
    from ice_ray.nlp.lexicon import build_entity_dict
    d = build_entity_dict(got)
    assert d[("heroin",)] == "DRUGS"


def test_rules_file_roundtrip(tmp_path):
    from ice_ray.sources.models import DEFAULT_RELATION_RULES, load_rules, save_rules

    p = tmp_path / "ldpRelationModel"
    save_rules(DEFAULT_RELATION_RULES, p)
    assert load_rules(p) == DEFAULT_RELATION_RULES
    # EMPTY paths are skipped like the reference loader
    p.write_text(p.read_text() + "EMPTY -- x -- EMPTY = nothing\n")
    assert "EMPTY -- x -- EMPTY" not in load_rules(p)
