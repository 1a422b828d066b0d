"""End-to-end KG pipeline test: synthetic transcripts → edges, compared
against template-derived gold triples with the P/R ≥ 0.95 gate
(BASELINE.json metric), plus resume semantics."""

import os

import pytest

from ice_ray.functions.prf import triple_prf
from ice_ray.pipelines.kg import build_kg, dedup_edges, run_kg_job
from ice_ray.sources.transcripts import generate_transcripts, materialize_corpus

N_TURNS = 1500


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    transcripts, gold = generate_transcripts(N_TURNS, seed=42)
    return ray.data.from_arrow(transcripts), gold


def test_kg_pr_gate(corpus):
    ds, gold = corpus
    edges = build_kg(ds).to_pandas()
    system = set(zip(edges["subj"], edges["pred"], edges["obj"]))
    gold_set = set(zip(gold["subj"].to_pylist(), gold["pred"].to_pylist(),
                       gold["obj"].to_pylist()))
    prf = triple_prf(system, gold_set)
    assert prf["precision"] >= 0.95, prf
    assert prf["recall"] >= 0.95, prf


def test_edges_schema_and_weights(corpus):
    ds, gold = corpus
    edges = build_kg(ds).to_pandas()
    assert set(edges.columns) == {"subj", "pred", "obj", "subj_type",
                                  "obj_type", "weight", "conv_id", "turn_idx"}
    assert (edges["weight"] >= 1).all()
    # dedup: triples are unique
    assert not edges.duplicated(["subj", "pred", "obj"]).any()


def test_fused_decode_equals_split(corpus):
    """The fused annotate+extract+tag actor pool (fuse_decode=True, the
    default) must produce exactly the edge table of the split
    extract-pool → tag-pool layout."""
    from ice_ray.config import PipelineConfig

    ds, _ = corpus
    fused = build_kg(ds, cfg=PipelineConfig(fuse_decode=True)).to_pandas()
    split = build_kg(ds, cfg=PipelineConfig(fuse_decode=False)).to_pandas()
    key = ["subj", "pred", "obj"]
    fused = fused.sort_values(key).reset_index(drop=True)
    split = split.sort_values(key).reset_index(drop=True)
    assert fused.equals(split[fused.columns])


def test_resume_skips_completed_groups(ray_session, tmp_path):
    corpus_dir = materialize_corpus(800, seed=7, base_dir=str(tmp_path / "corpus"),
                                    shard_rows=200)
    files = sorted(
        os.path.join(corpus_dir, "transcripts", f)
        for f in os.listdir(os.path.join(corpus_dir, "transcripts")))
    out = str(tmp_path / "kg_out")
    s1 = run_kg_job(files, out, group_size=2, resume=True)
    assert s1["groups_skipped"] == 0
    assert s1["triples"] > 0
    s2 = run_kg_job(files, out, group_size=2, resume=True)
    assert s2["groups_skipped"] == s2["groups"]
    assert s2["triples"] == s1["triples"]


def test_extract_strategies_equal(corpus):
    """direct, dedup(broadcast) and dedup(join) extraction strategies
    produce identical raw edges (pipelines/kg.extract_edges)."""
    import pandas as pd

    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import extract_edges

    ds, _ = corpus

    def canon(d):
        df = d.to_pandas()
        cols = sorted(df.columns)
        return (df[cols].sort_values(cols, kind="mergesort")
                .reset_index(drop=True))

    a = canon(extract_edges(ds, cfg=PipelineConfig(extract_strategy="direct")))
    b = canon(extract_edges(ds, cfg=PipelineConfig(extract_strategy="dedup")))
    c = canon(extract_edges(ds, cfg=PipelineConfig(
        extract_strategy="dedup", dedup_rows_broadcast_max=0)))
    d = canon(extract_edges(ds, cfg=PipelineConfig(extract_strategy="auto")))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    pd.testing.assert_frame_equal(a, d)


def test_resolve_extract_strategy(ray_session):
    """The "auto" resolver picks dedup on heavily-duplicated corpora and
    direct on unique-text corpora (crossover injected via cfg so the
    4-cpu test pool can cross it)."""
    import pandas as pd

    import ray.data
    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import resolve_extract_strategy

    hot = ray.data.from_pandas(pd.DataFrame({
        "text": ["same boilerplate tool output"] * 2000}))
    uniq = ray.data.from_pandas(pd.DataFrame({
        "text": [f"unique turn number {i}" for i in range(2000)]}))
    cfg = PipelineConfig(dedup_crossover_waste=3.0)
    assert resolve_extract_strategy(hot, cfg) == "dedup"
    assert resolve_extract_strategy(uniq, cfg) == "direct"
    # default crossover (12) cannot be crossed by a 4-cpu pool:
    # min(ratio, pool)=4 < 12 → direct even on the hot corpus
    assert resolve_extract_strategy(hot, PipelineConfig()) == "direct"
