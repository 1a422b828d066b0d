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


def test_asof_join_broadcast_equals_shuffle(ray_session):
    from ice_ray.functions.join import asof_join
    from ice_ray.functions.shuffle import grouped_aggregate

    events = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                                   columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"])
    day = grouped_aggregate(
        orders, keys=["o_custkey", "o_orderdate"],
        specs=[("o_orderkey", "max")],
        rename={"o_orderkey_max": "last_orderkey"})
    day = day.map_batches(
        lambda t: t.rename_columns(["user_id", "o_orderdate", "last_orderkey"]),
        batch_format="pyarrow").materialize()

    a = asof_join(events, day, on="user_id", left_ts="ts",
                  right_ts="o_orderdate", strategy="broadcast")
    b = asof_join(events, day, on="user_id", left_ts="ts",
                  right_ts="o_orderdate", strategy="shuffle")
    ca = _canon(a.to_pandas(), ["event_id"])
    cb = _canon(b.to_pandas(), ["event_id"])
    pd.testing.assert_frame_equal(ca, cb)
