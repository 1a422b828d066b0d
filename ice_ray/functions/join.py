"""Explicit partitioned hash join for two large datasets.

The portable Ray Data pattern (per the Ray guide): add
``bucket = hash(key) % B`` to both sides, tag rows with their side,
union, then ``groupby(bucket).map_groups`` does a pandas merge per
bucket.  Use this when neither side fits in memory for a broadcast
(small sides should use ``ray.put`` + map-side lookup instead —
see __ray_entry__ customer_nation).

Skew note: a hot join key lands in one bucket; B bounds reduce
parallelism, and per-bucket memory = bucket's share of both sides.
Salt hot keys into sub-buckets if one key dominates.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def bucketed_hash_join(left, right, left_on: str, right_on: str,
                       how: str = "inner", num_buckets: int = 32):
    """→ joined dataset (pandas-merge semantics per bucket).  Column
    names must be disjoint apart from the keys."""

    # align schemas so union is well-typed: each side carries the other
    # side's columns as nulls
    lschema, rschema = left.schema(), right.schema()
    all_fields = list(zip(lschema.names, lschema.types))
    for n, t in zip(rschema.names, rschema.types):
        if n not in lschema.names:
            all_fields.append((n, t))

    def add_meta(side: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            ks = pc.cast(batch.column(key), pa.string())
            b = pa.array([zlib.crc32(k.encode()) % num_buckets
                          for k in ks.to_pylist()], pa.int32())
            cols, names = [], []
            for n, t in all_fields:
                names.append(n)
                if n in batch.column_names:
                    cols.append(batch.column(n))
                else:
                    cols.append(pa.nulls(batch.num_rows, t))
            out = pa.table(dict(zip(names, cols)))
            return (out.append_column("_bucket", b)
                       .append_column("_side", pa.array([side] * batch.num_rows)))
        return fn

    tagged = (left.map_batches(add_meta("L", left_on), batch_format="pyarrow")
              .union(right.map_batches(add_meta("R", right_on),
                                       batch_format="pyarrow")))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "L"].dropna(axis=1, how="all").drop(
            columns=["_side", "_bucket"])
        r = df[df["_side"] == "R"].dropna(axis=1, how="all").drop(
            columns=["_side", "_bucket"])
        if l.empty or (r.empty and how == "inner"):
            return pd.DataFrame()
        out = l.merge(r, left_on=left_on, right_on=right_on, how=how)
        return out

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")
