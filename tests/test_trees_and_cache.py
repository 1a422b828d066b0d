"""Tests: clausal tree extraction (IceTree analog), annotation-cache
two-phase layout, multimodal stub stages, soft decode, repr lookups."""

import pyarrow as pa
import pytest

from ice_ray.core.annotate import annotate_text
from ice_ray.core.trees import extract_trees_from_turn
from ice_ray.nlp.lexicon import build_entity_dict, max_entity_phrase_len


def _trees(text):
    ed = build_entity_dict()
    ann = annotate_text(text, ed, max_entity_phrase_len(ed))
    return extract_trees_from_turn(text, ann["sentences"], ann["tokens"],
                                   ann["mentions"], ann["deps"])


def test_tree_extraction_svo():
    rows = _trees("Globex promoted Mary Brown.")
    assert len(rows) == 1
    t = rows[0]
    assert t["trigger"] == "promoted"
    assert t["core"] == ("promote nsubj:ORGANIZATION=ORGANIZATION "
                         "dobj:PERSON=PERSON")
    assert t["repr"] == "Globex promoted Mary Brown"


def test_tree_requires_nsubj_and_dobj():
    # PP-only clause → no dobj → no tree (IceTree.java:383-388)
    assert _trees("Fred Smith lives in Chicago.") == []


def test_tree_pronoun_aborts():
    assert _trees("He met the team.") == []


def test_tree_prep_collapse():
    # verb-attached PP → prep_X role (IceTree addPrepLinks)
    rows = _trees("Globex promoted Mary Brown in Chicago.")
    assert len(rows) == 1
    core = rows[0]["core"]
    assert core.startswith("promote nsubj:ORGANIZATION=ORGANIZATION "
                           "dobj:PERSON=PERSON")
    assert "prep_in:GPE=GPE" in core
    # noun-attached 'of' stays off the tree (it hangs on the dobj noun)
    rows2 = _trees("Fred Smith seized a pound of heroin.")
    assert rows2[0]["core"] == "seize nsubj:PERSON=PERSON dobj:OTHER=pound"


def test_tree_counts_pipeline(ray_session):
    import ray.data

    from ice_ray.pipelines.events import extract_trees, tree_type_counts
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(800, seed=42)
    trees = extract_trees(ray.data.from_arrow(tr), concurrency=(1, 2))
    counts = tree_type_counts(trees).to_pandas()
    assert len(counts) > 0
    assert {"core", "count", "repr"} <= set(counts.columns)
    assert counts["count"].sum() > 0


def test_annotation_cache_roundtrip(ray_session, tmp_path):
    import ray.data

    from ice_ray.pipelines.kg import extract_paths
    from ice_ray.pipelines.preprocess import (
        extract_paths_from_cache,
        preprocess_to_cache,
    )
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(400, seed=42)
    ds = ray.data.from_arrow(tr)
    cache = preprocess_to_cache(ds, str(tmp_path))
    direct = extract_paths(ds).to_pandas()
    cached = extract_paths_from_cache(cache).to_pandas()
    key = ["conv_id", "turn_idx", "typed_path", "instance_key"]
    a = direct.sort_values(key).reset_index(drop=True)
    b = cached.sort_values(key).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_multimodal_stages(ray_session):
    import ray.data

    from ice_ray.stages.multimodal import (
        FrameSampler,
        ImageResizer,
        media_feature_pipeline,
    )

    rows = [
        {"media_id": 1, "kind": "image", "payload": b"\x89PNG fake1",
         "mime": "image/png", "width": 640, "height": 480, "duration_ms": -1},
        {"media_id": 2, "kind": "image", "payload": b"\x89PNG fake2",
         "mime": "image/png", "width": 800, "height": 600, "duration_ms": -1},
        {"media_id": 3, "kind": "video", "payload": b"\x00\x00ftyp fake",
         "mime": "video/mp4", "width": 1280, "height": 720, "duration_ms": 3500},
    ]
    ds = ray.data.from_items(rows)
    feats = media_feature_pipeline(ds, batch_size=2, concurrency=(1, 2)).to_pandas()
    assert len(feats) == 3
    assert all(len(v) == 64 for v in feats["embedding"])
    # deterministic: same payload → same features
    feats2 = media_feature_pipeline(ds, batch_size=2, concurrency=(1, 2)).to_pandas()
    import numpy as np
    assert np.array_equal(feats.sort_values("media_id")["embedding"].tolist()[0],
                          feats2.sort_values("media_id")["embedding"].tolist()[0])
    resized = ds.map_batches(ImageResizer, batch_format="pyarrow",
                             fn_constructor_kwargs={"width": 224, "height": 224},
                             concurrency=2).to_pandas()
    assert set(resized["width"]) == {224}
    frames = ds.map_batches(FrameSampler, batch_format="pyarrow",
                            fn_constructor_kwargs={"every_ms": 1000},
                            concurrency=2).to_pandas()
    assert len(frames) == 4  # 3500ms / 1000ms → frames at 0,1000,2000,3000
    assert list(frames["frame_idx"]) == [0, 1, 2, 3]
    # strict mode marks the kernel boundary
    from ice_ray.stages.multimodal import ImageFeatureExtractor
    with pytest.raises(NotImplementedError):
        ImageFeatureExtractor(strict=True)(pa.table({"media_id": [1],
                                                     "kind": ["image"],
                                                     "payload": [b"x"]}))


def test_soft_decode():
    from ice_ray.functions.pathmatcher import MatcherPath, match_paths
    from ice_ray.stages.tagger import Tagger

    rules = {"PERSON -- nsubj-1:live:prep:in:pobj -- GPE": "livesIn"}
    tagger = Tagger(rules, soft=True)
    # one-word substitution inside the path → soft match under 0.5
    batch = pa.table({
        "typed_path": ["PERSON -- nsubj-1:live:prep:at:pobj -- GPE"],
        "arg1_text": ["Fred Smith"], "arg2_text": ["Chicago"],
        "arg1_type": ["PERSON"], "arg2_type": ["GPE"],
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
    })
    out = tagger(batch)
    assert out.num_rows == 1
    assert out.column("pred").to_pylist() == ["livesIn"]
    # type mismatch → distance = max(len) → no match
    batch2 = pa.table({
        "typed_path": ["ORGANIZATION -- nsubj-1:live:prep:in:pobj -- GPE"],
        "arg1_text": ["Acme"], "arg2_text": ["Chicago"],
        "arg1_type": ["ORGANIZATION"], "arg2_type": ["GPE"],
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
    })
    assert tagger(batch2).num_rows == 0
    # symmetric sanity of the matcher itself
    p1 = MatcherPath("PERSON--nsubj-1:live:prep:in:pobj--GPE")
    assert match_paths(p1, p1) == 0.0


def test_repr_lookup_and_merge(ray_session):
    import ray.data

    from ice_ray.functions.pathmap import (
        build_repr_map,
        find_closest_repr,
        find_path_by_repr,
        merge_count_tables,
        swap12,
    )

    assert swap12("PERSON(1) x PERSON(2)") == "PERSON(2) x PERSON(1)"
    counts = ray.data.from_items([
        {"typed_path": "PERSON(1) -- nsubj-1:meet:dobj -- PERSON(2)",
         "count": 5, "repr": "person(1) met person(2)", "example": "A met B"},
        {"typed_path": "PERSON -- nsubj-1:visit:dobj -- GPE",
         "count": 3, "repr": "person visited gpe", "example": "A visited C"},
    ])
    rmap = build_repr_map(counts)
    assert find_path_by_repr(rmap, "Person visited GPE") == (
        "PERSON -- nsubj-1:visit:dobj -- GPE", False)
    hit, swapped = find_path_by_repr(rmap, "person(2) met person(1)")
    assert swapped and hit == "PERSON(2) -- nsubj-1:meet:dobj -- PERSON(1)"
    cand, d = find_closest_repr(rmap, "person visited gp")
    assert cand == "person visited gpe" and d == 1
    merged = merge_count_tables(counts, ray.data.from_items([
        {"typed_path": "PERSON -- nsubj-1:visit:dobj -- GPE",
         "count": 2, "repr": "person visited gpe", "example": "B saw D"},
    ])).to_pandas()
    row = merged[merged["typed_path"] == "PERSON -- nsubj-1:visit:dobj -- GPE"]
    assert int(row["count"].iloc[0]) == 5
    assert row["example"].iloc[0] == "B saw D"  # shorter example wins


def test_repr_index_equals_full_scan():
    """The length-banded ReprIndex reproduces find_closest_repr exactly
    (distance AND lexicographic tie-break) on a synthetic vocabulary."""
    import random

    from ice_ray.functions.pathmap import ReprIndex, find_closest_repr

    rng = random.Random(7)
    words = ["met", "saw", "visited", "joined", "left", "promoted"]
    vocab = {}
    for i in range(300):
        r = (f"person {rng.choice(words)} "
             f"{'gpe' if i % 2 else 'org'}{'x' * (i % 5)}")
        vocab[r] = f"path{i}"
    idx = ReprIndex(vocab)
    queries = ["person met gpe", "person visited org", "zzz", "",
               "person promoted orgxxxx", "person saw gp",
               "completely unrelated string of words here"]
    for q in queries:
        assert idx.find_closest(q) == find_closest_repr(vocab, q), q
    # empty vocabulary degrades identically
    assert ReprIndex({}).find_closest("x") == find_closest_repr({}, "x")
