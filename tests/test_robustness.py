"""Fuzz/property tests for the NLP kernels, event decode, and a
larger-scale P/R run (scale-dependent-bug canary)."""

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ice_ray.core.annotate import annotate_text
from ice_ray.core.extract import extract_paths_from_turn
from ice_ray.nlp.lexicon import build_entity_dict, max_entity_phrase_len
from ice_ray.nlp.stemmer import stem

_ED = build_entity_dict()
_ML = max_entity_phrase_len(_ED)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_annotate_extract_never_crashes(text):
    ann = annotate_text(text, _ED, _ML)
    rows = extract_paths_from_turn(text, ann["sentences"], ann["tokens"],
                                   ann["mentions"], ann["deps"])
    for r in rows:
        assert r["typed_path"].count(" -- ") == 2


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_letters, min_size=1, max_size=20))
def test_stemmer_idempotent(word):
    s = stem(word)
    assert stem(s) == s or len(stem(s)) <= len(s)  # stems don't grow


def test_annotate_random_bytes_salad():
    rng = random.Random(0)
    for _ in range(50):
        text = "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 400)))
        ann = annotate_text(text, _ED, _ML)
        extract_paths_from_turn(text, ann["sentences"], ann["tokens"],
                                ann["mentions"], ann["deps"])


def test_event_decode(ray_session):
    import ray.data

    from ice_ray.pipelines.events import decode_events, extract_trees
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(1200, seed=42)
    decoded = decode_events(
        extract_trees(ray.data.from_arrow(tr), concurrency=(1, 2))).to_pandas()
    assert len(decoded) > 0
    assert set(decoded["event_type"]) <= {"PROMOTION", "MEETING", "SEIZURE",
                                          "DISCUSSION", "REVIEW"}
    # every promotion row really is an ORG promoting a PERSON
    promo = decoded[decoded["event_type"] == "PROMOTION"]
    assert (promo["core"].str.startswith("promote nsubj:ORGANIZATION")).all()


def test_kg_pr_at_scale(ray_session):
    """20k turns through the full pipeline — catches bucket/registry bugs
    that only appear with many conversations."""
    import ray.data

    from ice_ray.functions.prf import triple_prf
    from ice_ray.pipelines.kg import build_kg
    from ice_ray.sources.transcripts import generate_transcripts

    tr, gold = generate_transcripts(20000, seed=13)
    edges = build_kg(ray.data.from_arrow(tr)).to_pandas()
    system = set(zip(edges["subj"], edges["pred"], edges["obj"]))
    gold_set = set(zip(gold["subj"].to_pylist(), gold["pred"].to_pylist(),
                       gold["obj"].to_pylist()))
    prf = triple_prf(system, gold_set)
    assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95, prf


def test_extract_strategies_on_empty_and_rowless_input(ray_session):
    """extract_edges (both strategies) on an empty transcripts table and
    on a table whose every turn yields no edges."""
    import datetime as dt

    import pyarrow as pa

    import ray.data
    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import extract_edges

    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "text": pa.array([], pa.string())})
    rowless = pa.table({
        "conv_id": pa.array(["c0", "c0"], pa.string()),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "text": pa.array(["Thanks for the update.", ""], pa.string())})
    for tbl in (empty, rowless):
        for strat in ("direct", "dedup"):
            out = extract_edges(ray.data.from_arrow(tbl),
                                cfg=PipelineConfig(extract_strategy=strat))
            assert out.count() == 0, (strat, tbl.num_rows)


def test_record_baseline_replaces_only_its_section(tmp_path):
    """bench._record_baseline must replace ONLY the auto-written scaling
    section: an earlier truncate-to-EOF version silently deleted every
    narrative section below the marker (bit us in round 5)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    p = tmp_path / "BASELINE.md"
    p.write_text("# Title\n\nintro\n\n"
                 "## Measured scaling (bench.py --scaling)\n\nold row\n\n"
                 "## Afterword\n\nkeep me\n")
    res = {"cpus_lo": 4, "cpus_hi": 16, "turns": 8, "sec_lo": 2.0,
           "sec_hi": 0.6, "turns_per_sec_lo": 4.0, "turns_per_sec_hi": 13.3,
           "value": 0.833, "ceiling_efficiency": 0.9,
           "efficiency_vs_ceiling": 0.926}
    bench._record_baseline(res, path=str(p))
    text = p.read_text()
    assert text.count("## Measured scaling (bench.py --scaling)") == 1
    assert "old row" not in text and "| 0.833 |" in text
    assert "intro" in text
    assert "## Afterword" in text and "keep me" in text
    assert text.index("## Measured scaling") < text.index("## Afterword")

    # idempotent: a second write still yields exactly one section
    res2 = dict(res, value=0.7)
    bench._record_baseline(res2, path=str(p))
    text = p.read_text()
    assert text.count("## Measured scaling (bench.py --scaling)") == 1
    assert "| 0.7 |" in text and "| 0.833 |" not in text
    assert "keep me" in text
