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
