"""Sliding-window aggregate vs a brute-force oracle."""

import datetime as dt

import pyarrow as pa


def test_sliding_counts(ray_session):
    import ray.data

    from ice_ray.stages.windows import sliding_counts

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, minutes in enumerate([0, 5, 20, 40, 70, 125]):
        rows.append({"event_id": i, "ts": base + dt.timedelta(minutes=minutes),
                     "user_id": 1, "event_type": "click", "value": 1.0})
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    }))
    out = sliding_counts(ds, window_minutes=60, slide_minutes=15).to_pandas()
    got = {(t.to_pydatetime(), n) for t, n in zip(out["window_start"], out["n"])}

    # brute force: window [start, start+60) for every 15-min grid start
    import collections
    expect = collections.Counter()
    for r in rows:
        for k in range(4):
            start = (r["ts"] - dt.timedelta(minutes=15 * k))
            grid = start - dt.timedelta(minutes=start.minute % 15,
                                        seconds=start.second,
                                        microseconds=start.microsecond)
            if grid <= r["ts"] < grid + dt.timedelta(minutes=60):
                expect[grid] += 1
    assert got == {(t, n) for t, n in expect.items()}


def test_stratified_sample_quota_and_layout_invariance(ray_session):
    """Exactly min(N, group size) rows per group, deterministic (same
    ids on re-run), and invariant to input block layout (the partial
    top-N must never drop a global winner)."""
    import pyarrow as pa

    import ray.data
    from ice_ray.stages.windows import stratified_sample

    t = pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(60)], pa.string()),
    })
    one = ray.data.from_arrow(t)
    # same rows split into 6 blocks of 10
    import ray as _ray
    many = ray.data.from_arrow_refs(
        [_ray.put(t.slice(i * 10, 10)) for i in range(6)])

    a = stratified_sample(one, n_per_group=7).to_pandas()
    b = stratified_sample(many, n_per_group=7).to_pandas()
    assert a.groupby("source").size().eq(7).all()
    key = ["source", "doc_id"]
    assert (a.sort_values(key).reset_index(drop=True)[key]
            .equals(b.sort_values(key).reset_index(drop=True)[key]))
    # quota above group size → whole group kept
    full = stratified_sample(one, n_per_group=100).to_pandas()
    assert len(full) == 60


def test_stratified_sample_null_ids_rank_last(ray_session):
    """Null ids must sort AFTER every hashed id (SQL ASC NULLS LAST
    parity) — a null never displaces a real doc from the quota."""
    import pyarrow as pa

    import ray.data
    from ice_ray.stages.windows import stratified_sample

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, None], pa.int64()),
        "source": pa.array(["s"] * 4, pa.string()),
    })
    out = stratified_sample(ray.data.from_arrow(t),
                            n_per_group=3).to_pandas()
    assert len(out) == 3 and not out["doc_id"].isna().any()
    # quota 4 admits the null row, still last
    all4 = stratified_sample(ray.data.from_arrow(t),
                             n_per_group=4).to_pandas()
    assert len(all4) == 4
