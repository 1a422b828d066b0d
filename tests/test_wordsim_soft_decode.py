"""Embedding-scaled soft decode (J5 + F3): WordEmbedding.java similarity
conventions, pathSimilarity/treeSimilarity, and end-to-end recovery of a
relation whose verb is OUT of the rule table but embedding-close to a
ruled verb (PathMatcher.java replace-cost scaling)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

import ray.data
from ice_ray.config import PipelineConfig
from ice_ray.functions.wordsim import WordSim, path_similarity, tree_similarity
from ice_ray.pipelines.kg import decode_edges, extract_paths
from ice_ray.sources.models import DEFAULT_RELATION_RULES

# deterministic toy embedding table keyed by STEMMED forms (the matcher
# stems path words); "reside" ≈ "live", "shun" ⊥ everything
EMB = {
    "live":   np.array([1.0, 0.1, 0.0]),
    "reside": np.array([0.95, 0.12, 0.0]),
    "shun":   np.array([0.0, 0.0, 1.0]),
    "visit":  np.array([0.2, 1.0, 0.0]),
}


def test_wordsim_reference_conventions():
    ws = WordSim(EMB)
    assert ws("Live", "live") == 1.0            # equalsIgnoreCase → 1
    assert ws("live", "zzz") == 0.0             # undefined embedding → 0
    cos = ws("live", "reside")
    assert 0.99 < cos <= 1.0
    assert abs(ws("live", "shun")) < 1e-9


def test_path_similarity_product_and_length_gate():
    ws = WordSim(EMB)
    # per-slot product over lexical items (odd positions)
    s = path_similarity("nsubj-1:live:prep:in:pobj",
                        "nsubj-1:reside:prep:in:pobj", ws)
    assert s == pytest.approx(ws("live", "reside") * 1.0)
    # different lengths → 0 (WordEmbedding.java:117-127)
    assert path_similarity("nsubj-1:live", "nsubj-1:live:prep:in:pobj", ws) == 0.0


def test_tree_similarity_role_matched():
    ws = WordSim(EMB)
    t1 = {"trigger": "live", "roles": ["nsubj", "prep_in"],
          "types": ["PERSON", "GPE"]}
    t2 = {"trigger": "reside", "roles": ["nsubj", "prep_in"],
          "types": ["PERSON", "GPE"]}
    sim = tree_similarity(t1, t2, ws)
    # args match on both roles with identical types (sim 1 each) → arg
    # part = 2/2 = 1; total = (cos + 1) / 2
    assert sim == pytest.approx((ws("live", "reside") + 1.0) / 2)
    t3 = {"trigger": "shun", "roles": ["dobj"], "types": ["ORGANIZATION"]}
    assert tree_similarity(t1, t3, ws) == pytest.approx(0.0)


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


def test_soft_decode_recovers_embedding_near_verb(ray_session):
    """'resides in' is not in the rule table; with a tight threshold the
    plain soft matcher rejects it, while the embedding-scaled replace
    cost accepts it — and the embedding-far verb 'shuns' stays out."""
    turns = _turns(["Fred Smith resides in Chicago.",
                    "Karl Brown shuns Paris."])
    paths = extract_paths(turns, emit_repr=False).materialize()
    cfg = PipelineConfig(soft_match=True, soft_threshold=0.3)

    plain = decode_edges(paths, DEFAULT_RELATION_RULES, cfg).to_pandas()
    assert "Fred Smith" not in set(plain.get("subj", []))  # exact+plain-soft miss

    emb = decode_edges(paths, DEFAULT_RELATION_RULES, cfg,
                       embeddings=EMB).to_pandas()
    triples = set(zip(emb.subj, emb.pred, emb.obj))
    assert ("Fred Smith", "livesIn", "Chicago") in triples
    assert not any(s == "Karl Brown" for s, _, _ in triples)
