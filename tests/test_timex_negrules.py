"""TIMEX2-style TIME mentions (IcePreprocessor.java:586-599) and the
negative-rule learning/export round-trip (JetEngineBuilder writes both
tables; PathRelationExtractor.java:29-70 loads them)."""

import datetime as dt

import pyarrow as pa

import ray.data
from ice_ray.config import PipelineConfig
from ice_ray.core.annotate import annotate_text
from ice_ray.nlp.lexicon import build_entity_dict, lower_entity_dict, max_entity_phrase_len
from ice_ray.nlp.ner import normalize_timex
from ice_ray.pipelines.kg import decode_edges, extract_paths
from ice_ray.sources.models import (
    build_relation_model,
    load_neg_rules,
    save_neg_rules,
)


def _mentions(text):
    d = build_entity_dict()
    ann = annotate_text(text, d, max_entity_phrase_len(d), lower_entity_dict(d))
    return [(text[m[0]:m[1]], m[4]) for m in ann["mentions"]]


def test_timex_date_year_weekday_mentions():
    ms = _mentions("Fred Smith visited Paris on January 5 2024.")
    assert ("January 5 2024", "TIME") in ms
    ms = _mentions("The report from 1999 arrived on Monday.")
    assert ("1999", "TIME") in ms            # year outranks bare NUMBER
    assert ("Monday", "TIME") in ms
    ms = _mentions("They met last year in Berlin.")
    assert ("last year", "TIME") in ms


def test_timex_normalization_vals():
    assert normalize_timex(["January", "5", "2024"]) == "2024-01-05"
    assert normalize_timex(["January", "5"]) == "XXXX-01-05"
    assert normalize_timex(["January", "2024"]) == "2024-01"
    assert normalize_timex(["1999"]) == "1999"
    assert normalize_timex(["Monday"]) == "MONDAY"
    assert normalize_timex(["last", "week"]) == "LAST_WEEK"


def test_timex_does_not_break_flagship_templates():
    # 'yesterday' TIME_WORD path still works inside the diedIn template
    ms = _mentions("Karl Smith died yesterday in Berlin, Germany.")
    assert ("yesterday", "TIME") in ms
    assert ("Karl Smith", "PERSON") in ms


def _turns(texts):
    n = len(texts)
    return ray.data.from_arrow(pa.table({
        "conv_id": pa.array(["c0"] * n),
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
    }))


def test_negative_rule_roundtrip_blocks_rejected_path(ray_session, tmp_path):
    # user built a livesIn model accepting 'live in', rejecting 'die in'
    pos, neg = build_relation_model(
        "livesIn", "PERSON", "GPE",
        accepted_paths=["nsubj-1:live:prep:in:pobj"],
        rejected_paths=["nsubj-1:die:prep:in:pobj"])
    save_neg_rules(neg, tmp_path / "neg.model")
    neg_loaded = load_neg_rules(tmp_path / "neg.model")
    assert neg_loaded == neg

    paths = extract_paths(_turns(["Karl Brown died in Berlin."]),
                          emit_repr=False).materialize()
    cfg = PipelineConfig(soft_match=True)
    # without the negative table, plain soft matching FALSELY decodes
    # 'die in' as livesIn (edit distance 0.4 < 0.5)
    without = decode_edges(paths, pos, cfg).to_pandas()
    assert ("Karl Brown", "livesIn", "Berlin") in set(
        zip(without.subj, without.pred, without.obj))
    # with it, the rejected path is an exact negative match → suppressed
    with_neg = decode_edges(paths, pos, cfg, neg_rules=neg_loaded).to_pandas()
    assert len(with_neg) == 0
