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
