"""Hot-key skew stress: one conversation with 30k turns (vs ~6-turn
median) plus a hot entity surface must not break correctness — the
north rule's explicit skew axis.  Per-batch combiners bound what any
hot key ships into a shuffle (one partial row per batch), and linker
buckets bound per-conversation reduce work."""

import pyarrow as pa


def _skewed_corpus(n_hot=30000, n_cold_convs=300):
    conv_ids, turn_idxs, texts = [], [], []
    # hot conversation: same person repeated — hot conv key AND hot subject
    for i in range(n_hot):
        conv_ids.append("conv-hot")
        turn_idxs.append(i)
        texts.append("Fred Smith lives in Chicago." if i % 2 == 0
                     else "Smith visited Berlin.")
    for c in range(n_cold_convs):
        conv_ids.append(f"conv-{c:05d}")
        turn_idxs.append(0)
        texts.append(f"Mary Brown works for Globex.")
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })


def _expected():
    return {("Fred Smith", "livesIn", "Chicago"),
            ("Fred Smith", "visited", "Berlin"),
            ("Mary Brown", "worksFor", "Globex")}


def test_hot_conversation_and_hot_subject(ray_session):
    import ray.data

    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import build_kg

    ds = ray.data.from_arrow(_skewed_corpus()).repartition(16)
    for strategy in ("broadcast", "shuffle"):
        edges = build_kg(ds, cfg=PipelineConfig(link_strategy=strategy)).to_pandas()
        got = set(zip(edges["subj"], edges["pred"], edges["obj"]))
        assert got == _expected(), (strategy, got)
        w = dict(zip(zip(edges["subj"], edges["pred"], edges["obj"]),
                     edges["weight"]))
        # the hot triple's weight reflects every occurrence
        assert w[("Fred Smith", "livesIn", "Chicago")] == 15000
        assert w[("Fred Smith", "visited", "Berlin")] == 15000
        assert w[("Mary Brown", "worksFor", "Globex")] == 300
        # provenance = min turn key
        first = edges.set_index(["subj", "pred", "obj"]).loc[
            ("Fred Smith", "livesIn", "Chicago")]
        assert first["conv_id"] == "conv-hot" and first["turn_idx"] == 0


def test_hot_pronoun_conversation(ray_session):
    """A conversation that is almost entirely pronoun turns (hot conv key
    AND hot coref load) resolves correctly in both strategies, and the
    pronoun edges' weight reflects every occurrence."""
    import ray.data

    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import build_kg

    n = 8000
    conv_ids = ["conv-pron"] * (n + 1) + ["conv-x"]
    turn_idxs = list(range(n + 1)) + [0]
    texts = (["Karl Jones lives in Denver."]
             + ["She visited Paris."] * n
             + ["Mary Brown works for Globex."])
    tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(16)
    for strategy in ("broadcast", "shuffle"):
        edges = build_kg(ds, cfg=PipelineConfig(link_strategy=strategy)).to_pandas()
        w = dict(zip(zip(edges["subj"], edges["pred"], edges["obj"]),
                     edges["weight"]))
        assert w[("Karl Jones", "visited", "Paris")] == n, strategy
        assert w[("Karl Jones", "livesIn", "Denver")] == 1
        assert not any(s.lower() == "she" for s in edges["subj"])
