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
    # a salted shuffle (hot-key splitting) must be output-identical
    c = asof_join(events, day, on="user_id", left_ts="ts",
                  right_ts="o_orderdate", strategy="shuffle", salt=4)
    pd.testing.assert_frame_equal(ca, _canon(c.to_pandas(), ["event_id"]))


def test_asof_broadcast_gate_is_byte_aware(ray_session):
    """A right side under the row cap but over the BYTE cap must take
    the shuffle path (and produce identical output)."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import _asof_broadcast, asof_join

    n = 200
    wide = pa.table({
        "key": pa.array([i % 10 for i in range(n)], pa.int64()),
        "rts": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array(["x" * 100_000] * n),   # ~20 MB total
    })
    left = pa.table({
        "key": pa.array([i % 10 for i in range(50)], pa.int64()),
        "lts": pa.array(np.arange(50) * 7, pa.int64()),
    })
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(wide)
    # byte cap below payload size → broadcast attempt must bail out
    assert _asof_broadcast(lds, rds, "key", "lts", "rts", "_r",
                           broadcast_max_rows=1000,
                           broadcast_max_bytes=1 << 20) is None
    a = asof_join(lds, rds, on="key", left_ts="lts", right_ts="rts",
                  broadcast_max_bytes=1 << 20)       # → shuffle path
    b = asof_join(lds, rds, on="key", left_ts="lts", right_ts="rts")
    pd.testing.assert_frame_equal(_canon(a.to_pandas(), ["key", "lts"]),
                                  _canon(b.to_pandas(), ["key", "lts"]))


def test_jaccard_verify_gate_is_byte_aware(ray_session):
    """Wide documents under the doc-count cap but over the byte cap take
    the keyed-join text-attach path; results match the broadcast path."""
    import pyarrow as pa

    from ice_ray.stages.dedup import minhash_neardup_pairs_exact

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 2000)                                   # ~100 KB per doc
    docs = [base, base + " lambda", "completely different words here " * 50,
            base, base + " mu nu"]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    ds = ray.data.from_arrow(tbl)
    a = (minhash_neardup_pairs_exact(ds, broadcast_max_bytes=64 << 10)
         .to_pandas())                                # forced join path
    b = minhash_neardup_pairs_exact(ds).to_pandas()   # broadcast path
    key = ["id1", "id2"]
    pd.testing.assert_frame_equal(_canon(a, key), _canon(b, key))
    assert len(a) > 0


def test_salted_hash_join_equals_unsalted(ray_session):
    """One key holding half the left rows: salt=8 sprays it across
    bounded sub-buckets and the join output is identical."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import bucketed_hash_join

    n = 20_000
    hot = np.zeros(n // 2, dtype=np.int64)            # 50% one key
    cold = np.arange(1, n // 2 + 1, dtype=np.int64)
    keys = np.concatenate([hot, cold])
    left = pa.table({"k": pa.array(keys),
                     "v": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({"k": pa.array(np.arange(0, n // 2 + 1, dtype=np.int64)),
                      "w": pa.array(np.arange(0, n // 2 + 1, dtype=np.int64) * 3)})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)
    a = bucketed_hash_join(lds, rds, "k", "k", num_buckets=8).to_pandas()
    b = bucketed_hash_join(lds, rds, "k", "k", num_buckets=8,
                           salt=8).to_pandas()
    pd.testing.assert_frame_equal(_canon(a, ["k", "v"]), _canon(b, ["k", "v"]))
    # salt="auto" detects this 50%-hot key and still matches
    c = bucketed_hash_join(lds, rds, "k", "k", num_buckets=8,
                           salt="auto").to_pandas()
    pd.testing.assert_frame_equal(_canon(a, ["k", "v"]), _canon(c, ["k", "v"]))


def test_detect_salt_heuristic(ray_session):
    """detect_salt: balanced keys → 1; a dominant key → enough shards
    to restore a fair per-bucket share (capped)."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import detect_salt

    balanced = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(10_000, dtype=np.int64) % 997)}))
    assert detect_salt(balanced, "k", num_buckets=16) == 1

    skewed = ray.data.from_arrow(pa.table({"k": pa.array(
        np.concatenate([np.zeros(5000, np.int64),
                        np.arange(1, 5001, dtype=np.int64)]))}))
    s = detect_salt(skewed, "k", num_buckets=16)
    assert 4 <= s <= 16          # ~50% hot → about half the buckets

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert detect_salt(empty, "k", num_buckets=16) == 1


def test_detect_salt_materialized_spread_sample(ray_session):
    """A materialized input samples blocks ACROSS the dataset: a hot
    key living only in the LAST blocks is still detected (the lazy
    first-rows fallback would miss it)."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import detect_salt

    # 8 blocks: first 4 balanced, last 4 all-hot
    parts = [pa.table({"k": pa.array(
        np.arange(i * 1000, (i + 1) * 1000, dtype=np.int64))})
        for i in range(4)]
    parts += [pa.table({"k": pa.array(np.full(1000, -7, np.int64))})
              for _ in range(4)]
    ds = ray.data.from_arrow_refs([ray.put(p) for p in parts]).materialize()
    s = detect_salt(ds, "k", num_buckets=16)
    assert s > 1

    # balanced materialized input still resolves to 1
    bal = ray.data.from_arrow(pa.table(
        {"k": pa.array(np.arange(8000, dtype=np.int64) % 997)})).materialize()
    assert detect_salt(bal, "k", num_buckets=16) == 1


def test_band_join_vs_brute_force(ray_session):
    """Adversarial timestamps: clusters straddling tile boundaries
    (multiples of W), exact band-edge gaps, and duplicate timestamps —
    every (L, R) pair within [lower, upper] appears exactly once."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import band_join

    lower, upper = 1, 100
    W = upper - lower
    rng = np.random.default_rng(7)
    # points piled around tile boundaries k*W, plus exact-edge gaps
    base = np.concatenate([
        rng.integers(0, 12 * W, 300),
        np.repeat(np.arange(1, 8) * W, 5) + rng.integers(-2, 3, 35),
        [0, lower, upper, W, W + lower, W + upper, 5 * W, 5 * W],
    ]).astype(np.int64)
    left = pa.table({"lid": pa.array(np.arange(len(base)), pa.int64()),
                     "ts": pa.array(base, pa.timestamp("us"))})
    rts = np.concatenate([base + 1, base + upper, base - 3]).astype(np.int64)
    right = pa.table({"rid": pa.array(np.arange(len(rts)), pa.int64()),
                      "ts": pa.array(rts, pa.timestamp("us"))})

    out = band_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "ts", "ts", lower_us=lower, upper_us=upper,
                    num_buckets=5).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    assert len(got) == len(set(got)), "duplicate pairs emitted"

    exp = [(int(l), int(r))
           for l, t in enumerate(base)
           for r, s in enumerate(rts)
           if t + lower <= s <= t + upper]
    assert got == sorted(exp)
    # suffix applied to the colliding right column
    assert "ts_r" in out.columns


def test_band_join_bucket_invariance_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import band_join

    ts = np.array([0, 10, 20, 10_000, 20_000], np.int64)
    t = pa.table({"id": pa.array(np.arange(5), pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    ds = ray.data.from_arrow(t)
    a = band_join(ds, ds, "ts", "ts", 1, 50, num_buckets=1).to_pandas()
    b = band_join(ds, ds, "ts", "ts", 1, 50, num_buckets=13).to_pandas()
    key = ["id", "id_r"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[sorted(a.columns)],
        b.sort_values(key).reset_index(drop=True)[sorted(b.columns)])
    assert sorted(zip(a["id"], a["id_r"])) == [(0, 1), (0, 2), (1, 2)]

    # band with no matches → typed empty result, schema intact
    e = band_join(ds, ds, "ts", "ts", 1_000_000, 2_000_000, num_buckets=3)
    assert e.count() == 0
    assert set(e.schema().names) == {"id", "ts", "id_r", "ts_r"}


def test_band_join_negative_and_degenerate_bands(ray_session):
    """Bands straddling zero (lower < 0 < upper, self-pairs included),
    pure-negative bands (matches strictly BEFORE the left row), and the
    degenerate exact-gap band (lower == upper, W collapses to 1) all
    equal brute force."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import band_join

    rng = np.random.default_rng(11)
    ts = np.unique(rng.integers(0, 2_000, 120)).astype(np.int64)
    t = pa.table({"id": pa.array(np.arange(len(ts)), pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    ds = ray.data.from_arrow(t)

    for lower, upper in [(-50, 50), (-100, -1), (25, 25), (0, 0)]:
        out = band_join(ds, ds, "ts", "ts", lower, upper,
                        num_buckets=7).to_pandas()
        got = sorted(zip(out["id"], out["id_r"]))
        exp = sorted((int(i), int(j))
                     for i, a in enumerate(ts) for j, b in enumerate(ts)
                     if a + lower <= b <= a + upper)
        assert got == exp, f"band [{lower}, {upper}]"
    # (0, 0) / (-50, 50) include each row matching its own right copy
    assert (0, 0) in exp
