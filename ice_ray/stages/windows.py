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


def _sessionize_bucket(df: pd.DataFrame, gap_minutes: float = 30.0) -> pd.DataFrame:
    """Sessionize every user inside one hash bucket, vectorized: sort by
    (user, ts, event_id), session starts where the user changes or the
    gap exceeds the threshold."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    new_user = df["user_id"].ne(df["user_id"].shift())
    gap = df["ts"].diff().dt.total_seconds()
    new_session = new_user | (gap > gap_minutes * 60)
    out = (df.assign(_ns=new_session.astype(int))
           .groupby("user_id", sort=False)
           .agg(n_sessions=("_ns", "sum"), n_events=("_ns", "size"))
           .reset_index())
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


def sessionize(events, gap_minutes: float = 30.0,
               num_buckets: int | None = None):
    """Session windows (gap-based) per user → (user_id, n_sessions,
    n_events).  Users are hash-bucketed so the reduce runs B vectorized
    pandas groups, not one Python call per user (assumption: one USER's
    events fit one bucket group — the bucket count scales with input size
    so a bucket holds a bounded slice of the stream, not a fixed 1/64).
    ``user_id`` may be any type (string ids hash fine)."""
    from ..functions.shuffle import hash_mod

    if num_buckets is None:
        # ~250k events per reduce group; parquet row counts are metadata
        num_buckets = max(64, min(65536, events.count() // 250_000 + 1))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", hash_mod(batch.column("user_id"), num_buckets))

    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(_sessionize_bucket, batch_format="pandas",
                        fn_kwargs={"gap_minutes": gap_minutes}))


def sliding_counts(events, window_minutes: int = 60, slide_minutes: int = 15):
    """Sliding window per event_type: each event lands in
    window_minutes/slide_minutes overlapping windows; per-batch explode +
    partial counts, then one bucketed aggregate.  Output
    (window_start, event_type, n, value_sum)."""
    import datetime as _dt

    from ..functions.shuffle import grouped_aggregate

    k = window_minutes // slide_minutes
    slide_us = slide_minutes * 60 * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())  # µs since epoch
        base = pc.multiply(pc.divide(ts, slide_us), slide_us)
        tables = []
        for i in range(k):
            start = pc.subtract(base, i * slide_us)
            t = pa.table({
                "window_start": pc.cast(start, pa.timestamp("us")),
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            })
            tables.append(t)
        exp = pa.concat_tables(tables)
        g = exp.group_by(["window_start", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["window_start", "event_type", "n", "value_sum"])

    return grouped_aggregate(
        events.map_batches(explode, batch_format="pyarrow"),
        keys=["window_start", "event_type"],
        specs=[("n", "sum"), ("value_sum", "sum")],
        rename={"n_sum": "n", "value_sum_sum": "value_sum"})


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 tie_col: str, descending: bool = True):
    """Top-k rows per group by ``order_col`` (ties broken on ``tie_col``
    ascending — deterministic).  Per-batch partial top-k per group
    bounds the shuffle to ≤ k·groups·batches rows; one small
    groupby finishes.  The training-data shape: e.g. the k best
    documents per domain by quality score."""
    import pandas as pd

    in_cols = list(ds.schema().names)

    def take(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or group_col not in df.columns:
            return pd.DataFrame({c: [] for c in in_cols})
        return (df.sort_values([order_col, tie_col],
                               ascending=[not descending, True],
                               kind="mergesort")
                .groupby(group_col, sort=False).head(k))[in_cols]

    partial = ds.map_batches(take, batch_format="pandas")
    return partial.groupby(group_col).map_groups(take, batch_format="pandas")


def stratified_sample(docs, group_col: str = "source",
                      n_per_group: int = 10, id_col: str = "doc_id"):
    """Deterministic per-group quota sample — the domain-balancing cap
    of a web-scale training mix (keep at most N docs per source/domain
    so no crawl host dominates the corpus).  The rank key is
    ``md5(str(id))`` — uniform, reproducible across runs and engines,
    and exactly expressible in SQL (``row_number() OVER (PARTITION BY
    source ORDER BY md5(doc_id::VARCHAR), doc_id)``), so the sample is
    auditable rather than RNG-dependent.

    Shape: a composition over :func:`grouped_topk` — per-batch partial
    top-N per group bounds the exchange to ≤ N·groups·batches rows; the
    corpus itself never shuffles.  Group count is domain-bounded (≪
    corpus); a single hot group costs only its own N·batches partials.
    md5 per row is 16-byte-input hashing on the id column only — cheap
    relative to any text kernel (same judgment as exact_dedup's key)."""
    import hashlib

    import pyarrow as pa

    def key(batch: pa.Table) -> pa.Table:
        # null ids rank LAST ("~" > every md5 hex char), mirroring the
        # SQL oracle's ASC NULLS LAST ordering of md5(NULL)
        hk = [hashlib.md5(str(i).encode()).hexdigest()
              if i is not None else "~"
              for i in batch.column(id_col).to_pylist()]
        return batch.append_column("_hk", pa.array(hk, pa.string()))

    keyed = docs.map_batches(key, batch_format="pyarrow")
    out = grouped_topk(keyed, group_col, "_hk", n_per_group,
                       tie_col=id_col, descending=False)
    return out.drop_columns(["_hk"])


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
