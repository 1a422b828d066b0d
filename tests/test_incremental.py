"""Incremental re-extraction on entity-set change (DepPathsLog /
dpidIsClean analog): dirty turns re-analyzed, clean turns reuse cached
edges, result equals a full rebuild with the new dictionary."""

import os

from ice_ray.pipelines.kg import refresh_kg_job, run_kg_job
from ice_ray.sources.models import DEFAULT_RELATION_RULES
from ice_ray.sources.transcripts import materialize_corpus


def _edge_set(out_dir):
    import ray.data

    df = ray.data.read_parquet(os.path.join(out_dir, "edges")).to_pandas()
    return set(zip(df["subj"], df["pred"], df["obj"]))


def test_refresh_only_dirty_turns(ray_session, tmp_path):
    corpus_dir = materialize_corpus(1200, seed=21, base_dir=str(tmp_path / "c"),
                                    shard_rows=400)
    files = sorted(
        os.path.join(corpus_dir, "transcripts", f)
        for f in os.listdir(os.path.join(corpus_dir, "transcripts")))

    out = str(tmp_path / "kg")
    run_kg_job(files, out, group_size=2)
    before = _edge_set(out)

    # new entity set: 'morphine'-class terms get a dedicated type + rule
    extra = {"OPIOID": ["morphine", "opium"]}
    rules = dict(DEFAULT_RELATION_RULES)
    rules["PERSON -- nsubj-1:seize:dobj:of:pobj -- OPIOID"] = "seizedOpioid"

    stats = refresh_kg_job(files, out, changed_terms=["morphine", "opium"],
                           rules=rules, extra_entity_sets=extra, group_size=2)
    after = _edge_set(out)

    # only turns containing the changed terms were re-analyzed
    assert 0 < stats["dirty_turns"] < 1200

    # full rebuild with the new dictionary must agree exactly
    out_full = str(tmp_path / "kg_full")
    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import (
        canonicalize_edges,
        decode_edges,
        dedup_edges,
    )
    import ray.data
    from ice_ray.stages.annotator import AnnotateExtract

    ds = ray.data.read_parquet(files)
    paths = ds.map_batches(
        AnnotateExtract,
        fn_constructor_kwargs={"emit_repr": False, "extra_entity_sets": extra},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 2))
    full = dedup_edges(canonicalize_edges(
        decode_edges(paths, rules))).to_pandas()
    full_set = set(zip(full["subj"], full["pred"], full["obj"]))
    assert after == full_set

    # the opioid edges changed type; unrelated edges are untouched
    assert {p for _, p, _ in after} >= {"seizedOpioid"} or \
        not any("morphine" in o or "opium" in o for _, _, o in before)
    unchanged_before = {e for e in before
                        if "morphine" not in e[2] and "opium" not in e[2]}
    unchanged_after = {e for e in after
                       if "morphine" not in e[2] and "opium" not in e[2]}
    assert unchanged_before == unchanged_after


def test_refresh_high_frequency_term_falls_back_to_group_rebuild(
        ray_session, tmp_path):
    """A changed term that marks most turns dirty must NOT broadcast an
    unbounded dirty-key set: above cfg.dirty_broadcast_max the group is
    re-extracted wholesale (bounded memory) and the result still equals
    the selective path."""
    from ice_ray.config import PipelineConfig

    corpus_dir = materialize_corpus(600, seed=31, base_dir=str(tmp_path / "c"),
                                    shard_rows=300)
    files = sorted(
        os.path.join(corpus_dir, "transcripts", f)
        for f in os.listdir(os.path.join(corpus_dir, "transcripts")))

    extra = {"OPIOID": ["morphine", "opium"]}
    rules = dict(DEFAULT_RELATION_RULES)
    rules["PERSON -- nsubj-1:seize:dobj:of:pobj -- OPIOID"] = "seizedOpioid"
    # 'in' appears in most turns → dirty set ≈ the whole corpus
    terms = ["in", "morphine", "opium"]

    out_a = str(tmp_path / "kg_a")
    run_kg_job(files, out_a, group_size=1)
    stats_a = refresh_kg_job(files, out_a, changed_terms=terms, rules=rules,
                             extra_entity_sets=extra, group_size=1,
                             cfg=PipelineConfig(dirty_broadcast_max=10))
    out_b = str(tmp_path / "kg_b")
    run_kg_job(files, out_b, group_size=1)
    stats_b = refresh_kg_job(files, out_b, changed_terms=terms, rules=rules,
                             extra_entity_sets=extra, group_size=1)
    assert stats_a["dirty_turns"] == stats_b["dirty_turns"] > 10
    assert _edge_set(out_a) == _edge_set(out_b)
