"""CLI surface + alternative expanders + scoring functions."""

import json
import subprocess
import sys


def test_cli_gen_and_relations(tmp_path):
    # gen-corpus runs without Ray; relations runs a full pipeline in a
    # subprocess (owns its own session, as the CLI contract requires)
    out = subprocess.run(
        [sys.executable, "-m", "ice_ray.cli", "gen-corpus",
         "--turns", "500", "--seed", "7", "--out", str(tmp_path / "corpus")],
        capture_output=True, text=True, check=True).stdout
    corpus_dir = json.loads(out.strip().splitlines()[-1])["corpus_dir"]
    res = subprocess.run(
        [sys.executable, "-m", "ice_ray.cli", "--num-cpus", "4", "relations",
         "--input", corpus_dir + "/transcripts", "--out", str(tmp_path / "paths")],
        capture_output=True, text=True, timeout=240)
    assert res.returncode == 0, res.stderr[-2000:]
    import pyarrow.parquet as pq
    t = pq.read_table(str(tmp_path / "paths"))
    assert t.num_rows > 0
    assert {"typed_path", "count", "repr", "example"} <= set(t.column_names)


def test_embedding_expander(tmp_path):
    from ice_ray.pipelines.expanders_alt import embedding_expand, load_word_embeddings

    p = tmp_path / "emb.txt"
    p.write_text(
        "aspirin 1.0 0.0 0.1\n"
        "warfarin 0.9 0.1 0.1\n"
        "ibuprofen 0.95 0.05 0.1\n"
        "chicago 0.0 1.0 0.0\n"
        "berlin 0.05 0.9 0.0\n")
    emb = load_word_embeddings(str(p))
    out = embedding_expand(emb, ["aspirin"],
                           ["warfarin", "ibuprofen", "chicago", "berlin"])
    ranked = [t for t, _ in out]
    assert set(ranked[:2]) == {"warfarin", "ibuprofen"}


def test_mira_expander():
    from ice_ray.pipelines.expanders_alt import mira_expand

    vectors = {
        "aspirin": {"dobj-1_take": 2.0, "nn_drug": 1.0},
        "warfarin": {"dobj-1_take": 1.5, "nn_drug": 0.5},
        "chicago": {"prep_in": 2.0, "nn_city": 1.0},
        "berlin": {"prep_in": 1.5, "nn_city": 0.5},
    }
    out = mira_expand(vectors, positives=["aspirin"], negatives=["chicago"])
    scores = dict(out)
    assert scores["warfarin"] > scores["berlin"]


def test_event_bootstrap_score():
    from ice_ray.pipelines.events import event_bootstrap_score

    # s/t · s/(s+1) (EventBootstrap.java:379-394)
    assert event_bootstrap_score(3, 6) == (3 / 6) * (3 / 4)
    assert event_bootstrap_score(0, 5) == 0.0
    assert event_bootstrap_score(2, 0) == 0.0


def test_ratio_and_levenshtein():
    from ice_ray.functions.pathmatcher import levenshtein

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("a" * 101, "b") == 1001  # reference's 100-char cap
