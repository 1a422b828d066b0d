"""Vocabulary-scale join paths equal their broadcast fast paths:
TF-IDF df attachment and PMI priors (the two remaining vocab-bounded
broadcasts flagged in round 1) each have a bucketed-hash-join variant
for open-web vocabulary sizes."""

import pandas as pd

import ray.data


def _canon(df: pd.DataFrame, keys):
    return (df.sort_values(keys, kind="mergesort")
            .reset_index(drop=True)[sorted(df.columns)])


def test_tfidf_join_equals_broadcast(ray_session):
    from ice_ray.stages.textstats import tfidf_scores

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = _canon(tfidf_scores(docs).to_pandas(), ["doc_id", "term"])
    b = _canon(tfidf_scores(docs, strategy="join").to_pandas(),
               ["doc_id", "term"])
    pd.testing.assert_frame_equal(a, b)


def test_pmi_join_equals_broadcast(ray_session):
    from ice_ray.pipelines.entity_index import build_pmi_index, load_index_as_dict
    from ice_ray.pipelines.preprocess import annotate
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(400, seed=5)
    ann = annotate(ray.data.from_arrow(tr)).materialize()
    a = load_index_as_dict(build_pmi_index(ann))
    b = load_index_as_dict(build_pmi_index(ann, strategy="join"))
    assert a.keys() == b.keys()
    for t in a:
        assert a[t].keys() == b[t].keys()
        for c in a[t]:
            assert abs(a[t][c] - b[t][c]) < 1e-12
