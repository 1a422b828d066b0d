"""Stream-shaped operators over the events table (tumbling windows,
sessionization, top-k).  Ray Data has no event-time windows; per the
reference there are none either (SURVEY.md §2.10) — these are the
batch-over-ordered-log equivalents: window key computed per batch +
pre-aggregated groupby; session windows as ``groupby(user).map_groups``
over ts-sorted groups.  Ordering assumption: one user's events fit one
group (bounded per-user history).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _partial_hourly(batch: pa.Table) -> pa.Table:
    hour = pc.floor_temporal(batch.column("ts"), unit="hour")
    t = batch.append_column("hour", hour)
    g = t.group_by(["hour", "event_type"]).aggregate(
        [("value", "sum"), ("event_id", "count")])
    return g.rename_columns(["hour", "event_type", "value_sum", "n"])


def hourly_counts(events):
    """Tumbling 1h window per event_type → (hour, event_type, n, value_sum)."""
    from ..functions.shuffle import grouped_aggregate

    partial = events.map_batches(_partial_hourly, batch_format="pyarrow")
    return grouped_aggregate(partial, keys=["hour", "event_type"],
                             specs=[("n", "sum"), ("value_sum", "sum")],
                             rename={"n_sum": "n", "value_sum_sum": "value_sum"})


def _sessionize_group(df: pd.DataFrame, gap_minutes: float = 30.0) -> pd.DataFrame:
    df = df.sort_values(["ts", "event_id"], kind="mergesort")
    gaps = df["ts"].diff().dt.total_seconds().fillna(1e18)
    session = (gaps > gap_minutes * 60).cumsum()
    return pd.DataFrame({
        "user_id": [df["user_id"].iloc[0]],
        "n_sessions": [int(session.nunique())],
        "n_events": [len(df)],
    })


def sessionize(events, gap_minutes: float = 30.0):
    """Session windows (gap-based) per user → (user_id, n_sessions, n_events)."""
    return events.groupby("user_id").map_groups(
        _sessionize_group, batch_format="pandas",
        fn_kwargs={"gap_minutes": gap_minutes})


def top_users_by_value(events, k: int = 10):
    """Top-k users by Σvalue, deterministic tie-break on user_id."""
    from ..functions.shuffle import grouped_aggregate

    agg = grouped_aggregate(events.select_columns(["user_id", "value"]),
                            keys=["user_id"], specs=[("value", "sum")],
                            rename={"value_sum": "total_value"})

    def round6(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("total_value"), "total_value",
            pc.round(batch.column("total_value"), 2))

    return (agg.map_batches(round6, batch_format="pyarrow")
            .sort(["total_value", "user_id"], descending=[True, False])
            .limit(k))
