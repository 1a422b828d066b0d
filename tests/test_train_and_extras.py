"""Grid-search train mode, expansion simulation, embedding near-dup,
BPE-ish token counts, instance counts, empty-input robustness."""

import pyarrow as pa


def test_grid_search_soft_costs():
    from ice_ray.pipelines.train import grid_search_soft_costs

    rules = {"PERSON -- nsubj-1:live:prep:in:pobj -- GPE": "livesIn"}
    dev = [
        ("PERSON -- nsubj-1:live:prep:in:pobj -- GPE", "Fred Smith", "Chicago"),
        ("PERSON -- nsubj-1:live:prep:at:pobj -- GPE", "Mary Brown", "Berlin"),
        ("PERSON -- nsubj-1:visit:dobj -- GPE", "Karl Jones", "Paris"),
    ]
    gold = {("Fred Smith", "livesIn", "Chicago"),
            ("Mary Brown", "livesIn", "Berlin")}
    costs, f1, table = grid_search_soft_costs(dev, rules, gold)
    assert f1 == 1.0
    assert len(table) == 4 * 3 * 3
    # chosen costs must accept the one-word substitution but not the
    # different-verb path
    from ice_ray.pipelines.train import _soft_decode
    system = _soft_decode(dev, rules, costs)
    assert system == gold


def test_simulate_entity_expansion(ray_session):
    import ray.data

    from ice_ray.pipelines.entity_index import build_pmi_index
    from ice_ray.pipelines.train import simulate_entity_expansion
    from ice_ray.sources.transcripts import generate_transcripts
    from ice_ray.stages.annotator import Annotator

    tr, _ = generate_transcripts(1200, seed=42)
    ann = ray.data.from_arrow(tr).map_batches(
        Annotator, batch_format="pyarrow", batch_size=512, concurrency=(1, 2))
    index = build_pmi_index(ann).materialize()
    gold = {"budget", "plan", "schedule", "proposal", "outage", "rollout"}
    accepted, history = simulate_entity_expansion(index, ["budget"], gold,
                                                  rounds=2, accept_top_k=3)
    assert len(accepted) > 1
    assert history and all(0 <= h["precision"] <= 1 for h in history)


def test_embedding_neardup(ray_session):
    import ray.data

    from ice_ray.stages.similarity import embedding_neardup_pairs

    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0, 0.0]},
        {"vec_id": 1, "embedding": [0.999, 0.01, 0.0, 0.0]},   # near-dup of 0
        {"vec_id": 2, "embedding": [0.0, 1.0, 0.0, 0.0]},      # orthogonal
        {"vec_id": 3, "embedding": [0.0, 0.998, 0.02, 0.0]},   # near-dup of 2
    ]
    pairs = embedding_neardup_pairs(ray.data.from_items(rows),
                                    threshold=0.98, n_planes=4).to_pandas()
    got = {tuple(p) for p in pairs[["id1", "id2"]].itertuples(index=False)}
    assert (0, 1) in got
    assert (2, 3) in got
    assert (0, 2) not in got


def test_bpe_token_stats():
    from ice_ray.stages.textstats import bpe_token_stats

    batch = pa.table({"doc_id": [1, 2],
                      "text": ["Hello world, it's fine.", ""]})
    out = bpe_token_stats(batch).to_pydict()
    # "Hello"," world",","," it","'s"," fine","." → 7
    assert out["n_bpe_tokens"][0] == 7
    assert out["n_bpe_tokens"][1] == 0


def test_path_instance_counts(ray_session):
    import ray.data

    from ice_ray.pipelines.kg import extract_paths
    from ice_ray.pipelines.relations import path_instance_counts
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(600, seed=42)
    counts = path_instance_counts(
        extract_paths(ray.data.from_arrow(tr))).to_pandas()
    assert len(counts) > 0
    assert (counts["count"] >= 1).all()
    assert counts["instance_key"].str.contains(" -- ").all()


def test_empty_input_robustness(ray_session):
    import ray.data

    from ice_ray.pipelines.kg import build_kg

    empty = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "text": pa.array([], pa.string()),
    }))
    edges = build_kg(empty).to_pandas()
    assert len(edges) == 0


def test_hll_sketch_accuracy(ray_session):
    import ray.data

    from ice_ray.functions.sketches import HyperLogLog, approx_distinct

    # pure sketch accuracy
    h = HyperLogLog(12)
    h.add_values([f"v{i}" for i in range(50000)])
    assert abs(h.estimate() - 50000) / 50000 < 0.05
    # merge = union semantics
    h2 = HyperLogLog(12)
    h2.add_values([f"v{i}" for i in range(25000, 75000)])
    h.merge(h2)
    assert abs(h.estimate() - 75000) / 75000 < 0.05
    # distributed: events user_id distinct vs exact
    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    exact = ev.to_pandas()["user_id"].nunique()
    est = approx_distinct(ev, "user_id")
    assert abs(est - exact) / max(exact, 1) < 0.1
