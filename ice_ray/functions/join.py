"""Explicit partitioned hash join for two large datasets.

The portable Ray Data pattern (per the Ray guide): add
``bucket = hash(key) % B`` to both sides, tag rows with their side,
union, then ``groupby(bucket).map_groups`` joins each bucket with
pyarrow's Acero hash join — all-Arrow, so column types survive exactly
(no pandas int→float null promotion) and empty sides degrade to typed
empty tables instead of KeyErrors.  Use this when neither side fits in
memory for a broadcast (small sides should use ``ray.put`` + map-side
lookup instead — see __ray_entry__ customer_nation).

Skew note: a hot join key lands in one bucket; B bounds reduce
parallelism, and per-bucket memory = bucket's share of both sides.
Salt hot keys into sub-buckets if one key dominates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import hash_mod

_JOIN_TYPE = {"inner": "inner", "left": "left outer",
              "right": "right outer", "outer": "full outer"}


def bucketed_hash_join(left, right, left_on: str, right_on: str,
                       how: str = "inner", num_buckets: int = 32):
    """→ joined dataset (Acero hash-join semantics per bucket).  Column
    names must be disjoint apart from the keys; both key columns are kept
    in the output (pandas-merge convention)."""
    join_type = _JOIN_TYPE[how]

    # capture each side's column list at call time; the union carries the
    # other side's columns as typed nulls and we split by these lists (a
    # per-bucket all-null real column is NOT dropped — unlike dropna)
    lschema, rschema = left.schema(), right.schema()
    lnames = list(lschema.names)
    rnames = [n for n in rschema.names if n not in lschema.names]
    if right_on in lnames and right_on != left_on:
        raise ValueError("right_on must not collide with a left column")
    all_fields = list(zip(lschema.names, lschema.types)) + [
        (n, t) for n, t in zip(rschema.names, rschema.types)
        if n not in lschema.names]
    rside_names = list(rschema.names)

    def add_meta(side: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            b = hash_mod(batch.column(key), num_buckets)
            cols, names = [], []
            for n, t in all_fields:
                names.append(n)
                if n in batch.column_names:
                    cols.append(pc.cast(batch.column(n), t))
                else:
                    cols.append(pa.nulls(batch.num_rows, t))
            out = pa.table(dict(zip(names, cols)))
            return (out.append_column("_bucket", b)
                       .append_column("_side", pa.array([side] * batch.num_rows)))
        return fn

    tagged = (left.map_batches(add_meta("L", left_on), batch_format="pyarrow")
              .union(right.map_batches(add_meta("R", right_on),
                                       batch_format="pyarrow")))

    def merge(t: pa.Table) -> pa.Table:
        side = t.column("_side")
        l = t.filter(pc.equal(side, "L")).select(lnames)
        r = t.filter(pc.equal(side, "R")).select(rside_names)
        joined = l.join(r, keys=[left_on], right_keys=[right_on],
                        join_type=join_type, coalesce_keys=(left_on == right_on))
        # fixed output column order across buckets
        want = lnames + ([right_on] if right_on != left_on else []) + \
            [n for n in rnames if n != right_on]
        return joined.select([n for n in want if n in joined.column_names])

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pyarrow")
