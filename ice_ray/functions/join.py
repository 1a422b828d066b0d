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

import math

import pyarrow as pa
import pyarrow.compute as pc

import ray

from .shuffle import default_num_buckets, hash_mod

_JOIN_TYPE = {"inner": "inner", "left": "left outer",
              "right": "right outer", "outer": "full outer"}


@ray.remote
def _block_key_counts(key: str, table):
    """Per-block key histogram for detect_salt: top-64 value counts +
    row total — a tiny result, so sampled blocks never reach the
    driver whole."""
    from .blocks import ensure_arrow_block
    table = ensure_arrow_block(table)
    if table.num_rows == 0 or key not in table.column_names:
        return [], 0
    vc = table.column(key).value_counts()
    order = pc.array_sort_indices(vc.field("counts"),
                                  order="descending")[:64]
    top = vc.take(order)
    return (list(zip(top.field("values").to_pylist(),
                     top.field("counts").to_pylist())),
            table.num_rows)


def detect_salt(ds, key: str, num_buckets: int,
                sample_rows: int = 131_072, threshold: float = 0.125,
                max_salt: int = 16, sample_blocks: int = 8) -> int:
    """Sample-based hot-key salt factor: if the most frequent key
    exceeds ``threshold`` of the sample, return the salt that splits
    its bucket back to ~one bucket's fair share
    (``ceil(frac · num_buckets)``, capped).  Returns 1 for balanced
    keys.

    Sampling: a MATERIALIZED input samples ``sample_blocks`` blocks
    spread evenly across the dataset (per-block top-64 histograms
    computed worker-side — no positional bias, no driver pull of row
    data).  A lazy input falls back to the first ``sample_rows`` (a
    partial execution — cheap, but a hot key clustered entirely in
    later blocks is missed; override with an explicit ``salt=``)."""
    import numpy as np

    import ray.data as rd

    if isinstance(ds, rd.dataset.MaterializedDataset):
        schema = ds.schema()
        if schema is not None and key not in schema.names:
            raise KeyError(f"detect_salt: no column {key!r} in dataset")
        refs = ds.to_arrow_refs()
        if not refs:
            return 1
        k = min(len(refs), sample_blocks)
        idx = sorted(set(np.linspace(0, len(refs) - 1, k).astype(int)))
        parts = ray.get([_block_key_counts.remote(key, refs[i])
                         for i in idx])
        totals: dict = {}
        n = 0
        for pairs, rows in parts:
            n += rows
            for v, c in pairs:
                totals[v] = totals.get(v, 0) + c
        if n == 0 or not totals:
            return 1
        top = max(totals.values())
    else:
        try:
            batch = (ds.select_columns([key]).limit(sample_rows)
                     .take_batch(sample_rows, batch_format="pyarrow"))
        except ValueError:      # take_batch raises on an empty dataset
            return 1
        n = batch.num_rows
        if n == 0:
            return 1
        counts = batch.column(key).value_counts()
        top = pc.max(counts.field("counts")).as_py()
    frac = top / n
    if frac <= threshold:
        return 1
    return max(1, min(max_salt, math.ceil(frac * num_buckets)))


def _resolve_salt(salt, ds, key, num_buckets):
    if salt == "auto":
        return detect_salt(ds, key, num_buckets)
    return int(salt)


def _salted_shard(out: pa.Table, b, side: str, salt: int):
    """Shared salt step of every union-tagged join: left rows shard
    round-robin into ``salt`` sub-buckets of their hash bucket, right
    rows replicate into all of them (so a hot left key splits into
    ``salt`` bounded reduce groups).  No-op at salt 1."""
    if salt <= 1:
        return out, b
    import numpy as np

    base = pc.multiply(b, salt)
    if side == "L":
        shard = pa.array((np.arange(out.num_rows) % salt).astype("int32"))
        return out, pc.add(base, shard)
    reps, bs = [], []
    for s in range(salt):
        reps.append(out)
        bs.append(pc.add(base, s))
    out = pa.concat_tables(reps)
    b = pa.concat_arrays([x.combine_chunks()
                          if isinstance(x, pa.ChunkedArray) else x
                          for x in bs])
    return out, b


def _finish_tag(out: pa.Table, b, side: str) -> pa.Table:
    """Append the ``_bucket``/``_side`` metadata every union-tagged
    join's reduce groups split on."""
    return (out.append_column("_bucket", pc.cast(b, pa.int32()))
               .append_column("_side", pa.array([side] * out.num_rows)))


def bucketed_hash_join(left, right, left_on: str, right_on: str,
                       how: str = "inner", num_buckets: int | None = None,
                       salt: int | str = 1):
    """→ joined dataset (Acero hash-join semantics per bucket).  Column
    names must be disjoint apart from the keys; both key columns are kept
    in the output (pandas-merge convention).

    ``salt > 1`` enables hot-key salting (inner joins): every left row
    is sprayed across ``salt`` sub-buckets of its hash bucket and the
    right side is REPLICATED into all of them, so a key holding half
    the left rows splits into ``salt`` bounded reduce groups instead of
    one giant one.  Cost: right side shuffled ``salt`` times — use when
    the left is skewed and the right is the smaller side.
    ``salt="auto"`` samples the left key (``detect_salt``) and salts
    only when one key dominates (resolves to 1 for non-inner joins —
    salting is inner-only)."""
    join_type = _JOIN_TYPE[how]
    if num_buckets is None:
        num_buckets = default_num_buckets()
    if salt == "auto" and how != "inner":
        salt = 1
    salt = _resolve_salt(salt, left, left_on, num_buckets)
    if salt > 1 and how != "inner":
        raise ValueError("salting supports inner joins only "
                         "(outer semantics would duplicate null-matches)")

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
            out, b = _salted_shard(out, b, side, salt)
            return _finish_tag(out, b, side)
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


def asof_join(left, right, on: str, left_ts: str, right_ts: str,
              num_buckets: int | None = None, suffix: str = "_r",
              strategy: str = "auto",
              broadcast_max_rows: int = 5_000_000,
              broadcast_max_bytes: int = 512 << 20,
              salt: int | str = 1):
    """As-of join: for each left row, attach the right row with the same
    key whose ``right_ts`` is the LATEST value ≤ ``left_ts`` (backward
    as-of, inner).  Ray Data has no native as-of join; two compositions:

    - ``broadcast`` (chosen by ``auto`` when the right side fits
      ``broadcast_max_rows``): the right side — typically a dimension /
      per-key summary — is sorted once, broadcast via ray.put, and each
      left batch runs a vectorized ``merge_asof`` map-side: ZERO
      shuffles of the (big) left side.
    - ``shuffle`` (the both-sides-large scale path): bucket both sides
      by hash(key), union, per-bucket pandas ``merge_asof``.

    Partitioning assumption of the shuffle path: one KEY's rows
    co-locate in one bucket — per-bucket memory is that bucket's share
    of both sides.  ``salt > 1`` splits each bucket into salt shards
    (left rows round-robin, right rows replicated to every shard) so a
    single dominant key stays memory-bounded; ``salt="auto"`` samples
    the left key with ``detect_salt`` and salts only under skew.  The broadcast gate is
    row- AND byte-capped (incremental pull — wide right payloads fall
    back to the shuffle path before the driver fills).  Right-side
    non-key columns colliding with left names get ``suffix``."""
    import pandas as pd

    if num_buckets is None:
        num_buckets = default_num_buckets()
    if strategy in ("auto", "broadcast"):
        bcast = _asof_broadcast(left, right, on, left_ts, right_ts,
                                suffix, broadcast_max_rows,
                                broadcast_max_bytes)
        if bcast is not None:
            return bcast
        if strategy == "broadcast":
            raise ValueError("right side exceeds the broadcast caps")

    # salting matters only on the shuffle path; resolve "auto" here so
    # the broadcast fast path never pays the key sample
    salt = _resolve_salt(salt, left, on, num_buckets)

    lschema, rschema = left.schema(), right.schema()
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    rkeep = [n for n in rnames if n not in (on, right_ts)]
    rename_r = {n: (n + suffix if n in lnames else n) for n in rkeep}
    out_rcols = [rename_r[n] for n in rkeep] + ["_rts"]
    all_fields = list(zip(lschema.names, lschema.types)) + \
        [(rename_r[n], rschema.types[rnames.index(n)]) for n in rkeep] + \
        [("_rts", rschema.types[rnames.index(right_ts)])]

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            cols, names = [], []
            for n, t in all_fields:
                names.append(n)
                if side == "L" and n in batch.column_names and n in lnames:
                    cols.append(pc.cast(batch.column(n), t))
                elif side == "R" and n == "_rts":
                    cols.append(pc.cast(batch.column(right_ts), t))
                elif side == "R" and n in rename_r.values():
                    src = [k for k, v in rename_r.items() if v == n][0]
                    cols.append(pc.cast(batch.column(src), t))
                elif side == "R" and n == on:
                    cols.append(pc.cast(batch.column(on), t))
                elif side == "R" and n == left_ts and right_ts == left_ts:
                    cols.append(pc.cast(batch.column(right_ts), t))
                else:
                    cols.append(pa.nulls(batch.num_rows, t))
            out = pa.table(dict(zip(names, cols)))
            b = hash_mod(batch.column(on), num_buckets)
            out, b = _salted_shard(out, b, side, salt)
            return _finish_tag(out, b, side)
        return fn

    tagged = (left.map_batches(tag("L"), batch_format="pyarrow")
              .union(right.map_batches(tag("R"), batch_format="pyarrow")))

    out_cols = lnames + [rename_r[n] for n in rkeep]
    out_schema = pa.schema(
        [(n, t) for n, t in all_fields if n in out_cols])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "L"][lnames].sort_values(left_ts, kind="mergesort")
        r = (df[df["_side"] == "R"][[on, "_rts"] + [rename_r[n] for n in rkeep]]
             .sort_values("_rts", kind="mergesort"))
        if l.empty or r.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        out = pd.merge_asof(l, r, left_on=left_ts, right_on="_rts",
                            by=on, direction="backward")
        out = out[out["_rts"].notna()].drop(columns=["_rts"])
        return out[out_cols]

    def coerce(t: pa.Table) -> pa.Table:
        # empty buckets (object-dtype empties) lose the schema; restore
        if t.num_rows == 0 or set(t.column_names) != set(out_cols):
            return out_schema.empty_table()
        cols = [pc.cast(t.column(n), out_schema.field(n).type)
                for n in out_cols]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return (tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")
            .map_batches(coerce, batch_format="pyarrow"))


def _asof_broadcast(left, right, on, left_ts, right_ts, suffix,
                    broadcast_max_rows, broadcast_max_bytes=512 << 20):
    """Broadcast variant of asof_join; None if the right side is too
    big by ROWS or BYTES (caller falls back to the shuffle
    composition).  The pull is incremental so a wide-payload right side
    trips the byte cap after one batch instead of filling the driver."""
    import pandas as pd

    import ray as _ray

    parts, rows, nbytes = [], 0, 0
    for b in right.limit(broadcast_max_rows + 1).iter_batches(
            batch_format="pandas", batch_size=65536):
        rows += len(b)
        nbytes += int(b.memory_usage(deep=True).sum())
        if rows > broadcast_max_rows or nbytes > broadcast_max_bytes:
            return None
        parts.append(b)
    if parts:
        r_pdf = pd.concat(parts, ignore_index=True)
    else:
        sch = right.schema()
        r_pdf = pa.schema(list(zip(sch.names, sch.types))).empty_table().to_pandas()
    lnames = list(left.schema().names)
    rkeep = [n for n in r_pdf.columns if n not in (on, right_ts)]
    rename_r = {n: (n + suffix if n in lnames else n) for n in rkeep}
    r_pdf = (r_pdf.rename(columns={**rename_r, right_ts: "_rts"})
             .sort_values("_rts", kind="mergesort").reset_index(drop=True))
    out_cols = lnames + [rename_r[n] for n in rkeep]
    r_ref = _ray.put(r_pdf)

    def merge_map(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        r = _ray.get(r_ref)
        l = df.sort_values(left_ts, kind="mergesort")
        out = pd.merge_asof(l, r, left_on=left_ts, right_on="_rts",
                            by=on, direction="backward")
        out = out[out["_rts"].notna()].drop(columns=["_rts"])
        return out[out_cols]

    return left.map_batches(merge_map, batch_format="pandas")


def band_join(left, right, left_ts: str, right_ts: str,
              lower_us: int, upper_us: int,
              num_buckets: int | None = None, suffix: str = "_r"):
    """Range (band) join — no equality key: every (L, R) pair with
    ``R[right_ts] ∈ [L[left_ts] + lower_us, L[left_ts] + upper_us]``
    (both ends inclusive, microsecond integers; timestamps cast to
    epoch-µs int64).  Ray Data has no native inequality join and a
    cross-join + filter is quadratic; the classic distributed band
    algorithm instead tiles time into windows of width
    ``W = upper_us - lower_us``:

    - each RIGHT row lands in exactly one tile ``floor(s / W)``;
    - each LEFT row's match interval ``[t+lower, t+upper]`` spans at
      most two adjacent tiles, so the left is replicated ≤ 2×;
    - tiles hash into ``num_buckets`` reduce groups; within a group the
      right side is sorted by timestamp once and each left copy takes a
      ``searchsorted`` slice of its CLIPPED interval (the part inside
      its own tile), so no pair is emitted twice and work is
      O(n log n + output).

    Partitioning assumption: rows spread across many tiles — a corpus
    where most timestamps share one W-window collapses into one reduce
    group (time-skew analog of a hot join key).  Equality+range
    predicates should instead compose ``bucketed_hash_join`` + a
    vectorized range filter; this operator is for the pure-band case.
    Right columns colliding with left names get ``suffix``.

    The result carries a zero-row typed seed block so a no-match band
    still reports its schema (Ray drops all-empty-block schemas,
    NOTES item 44).  Ray skips UDFs on empty blocks, so a consumer
    that re-shapes columns inherits the seed as a 0-column empty block
    (harmless to row-level results, logged by Ray as a schema-unify
    warning) — re-seed after the last schema-changing step if the
    downstream pipeline needs the typed-empty contract too."""
    import numpy as np
    import pandas as pd

    if upper_us < lower_us:
        raise ValueError(f"empty band: [{lower_us}, {upper_us}]")
    if num_buckets is None:
        num_buckets = default_num_buckets()
    span = int(upper_us) - int(lower_us)
    W = max(span, 1)

    lschema, rschema = left.schema(), right.schema()
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    rename_r = {n: (n + suffix if n in lnames else n) for n in rnames}
    out_cols = lnames + [rename_r[n] for n in rnames]
    all_fields = list(zip(lschema.names, lschema.types)) + \
        [(rename_r[n], t) for n, t in zip(rnames, rschema.types)]
    out_schema = pa.schema(all_fields)

    def _epoch_us(col) -> "np.ndarray":
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            cols, names = [], []
            for n, t in all_fields:
                names.append(n)
                if side == "L" and n in lnames:
                    cols.append(pc.cast(batch.column(n), t))
                elif side == "R" and n in rename_r.values():
                    src = [k for k, v in rename_r.items() if v == n][0]
                    cols.append(pc.cast(batch.column(src), t))
                else:
                    cols.append(pa.nulls(batch.num_rows, t))
            out = pa.table(dict(zip(names, cols)))
            if side == "L":
                u = _epoch_us(batch.column(left_ts)) + lower_us
                tb0 = np.floor_divide(u, W)
                out = pa.concat_tables([out, out])
                tb = np.concatenate([tb0, tb0 + 1])
            else:
                s = _epoch_us(batch.column(right_ts))
                tb = np.floor_divide(s, W)
            b = pa.array((pd.util.hash_array(tb)
                          % num_buckets).astype("int32"), pa.int32())
            out = out.append_column("_tb", pa.array(tb, pa.int64()))
            return _finish_tag(out, b, side)
        return fn

    tagged = (left.map_batches(tag("L"), batch_format="pyarrow")
              .union(right.map_batches(tag("R"), batch_format="pyarrow")))

    rts_out = rename_r[right_ts]

    def merge(t: pa.Table) -> pa.Table:
        side = t.column("_side")
        l = t.filter(pc.equal(side, "L"))
        r = t.filter(pc.equal(side, "R"))
        if l.num_rows == 0 or r.num_rows == 0:
            return out_schema.empty_table()
        s = pc.cast(r.column(rts_out), pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s = s[order]
        r = r.select(list(rename_r.values())).take(pa.array(order))
        u = pc.cast(l.column(left_ts), pa.int64()).to_numpy(
            zero_copy_only=False) + lower_us
        tb = l.column("_tb").to_numpy(zero_copy_only=False)
        # interval clipped to this copy's own tile — adjacent-tile rows
        # that hash into the same reduce group can never double-match
        a = np.maximum(u, tb * W)
        b = np.minimum(u + span, (tb + 1) * W - 1)
        ok = a <= b
        lo = np.searchsorted(s, a[ok], side="left")
        hi = np.searchsorted(s, b[ok] + 1, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        lidx = np.flatnonzero(ok).repeat(counts)
        ridx = (np.repeat(lo, counts)
                + np.arange(total)
                - np.repeat(np.cumsum(counts) - counts, counts))
        lt = l.select(lnames).take(pa.array(lidx))
        rt = r.take(pa.array(ridx))
        return pa.Table.from_arrays(
            [lt.column(n) for n in lnames]
            + [rt.column(c) for c in rename_r.values()], schema=out_schema)

    def coerce(t: pa.Table) -> pa.Table:
        # empty groups lose the schema; restore
        if t.num_rows == 0 or set(t.column_names) != set(out_cols):
            return out_schema.empty_table()
        cols = [pc.cast(t.column(n), out_schema.field(n).type)
                for n in out_cols]
        return pa.Table.from_arrays(cols, schema=out_schema)

    import ray.data

    joined = (tagged.groupby("_bucket")
              .map_groups(merge, batch_format="pyarrow")
              .map_batches(coerce, batch_format="pyarrow"))
    # zero-row typed seed: Ray drops all-empty block schemas, so a
    # no-match band would otherwise return schema()=None
    return joined.union(ray.data.from_arrow(out_schema.empty_table()))


def attach_background_counts(fg, bg, key: str, count_col: str,
                             out_col: str = "bg_count",
                             strategy: str = "auto",
                             broadcast_max_rows: int = 20_000_000,
                             broadcast_max_bytes: int = 512 << 20,
                             num_buckets: int | None = None):
    """Append ``out_col`` = background's ``count_col`` for each fg row's
    ``key`` (missing key → 0) — the shared finish of every ratio/PMI
    scorer (TermRanker, Ratio.java, PMI marginals).

    The background side is an AGGREGATE (vocabulary-shaped, not
    corpus-shaped), but an open-web vocabulary is 10^9 distinct terms —
    so nothing un-gated may land on the driver: ``auto`` broadcasts a
    worker-side-built :class:`HashedStringMap` while the bg aggregate
    fits the row+byte gate, and above it falls back to a bucketed LEFT
    hash join on the key (sub-linear memory, one extra fg exchange).
    ``strategy`` ∈ {auto, broadcast, join}."""
    import numpy as np

    if out_col in fg.schema().names:
        raise ValueError(f"out_col {out_col!r} collides with a left column")
    bg = bg.select_columns([key, count_col]).materialize()
    n = bg.count()
    use_bcast = (strategy == "broadcast"
                 or (strategy == "auto" and n <= broadcast_max_rows
                     and (bg.size_bytes() or 0) <= broadcast_max_bytes))
    if use_bcast:
        from ..stages.dedup import _cached_get, _worker_side
        from .lookup import HashedStringMap

        def build(kc, vc, *tables):
            ks, vs = [], []
            for t in tables:
                if kc not in t.column_names:    # empty shuffle parts
                    continue
                ks.append(np.asarray(t.column(kc).to_pylist(), dtype=object))
                vs.append(t.column(vc).to_numpy(zero_copy_only=False))
            if not ks:
                return HashedStringMap()
            return HashedStringMap(np.concatenate(ks),
                                   np.concatenate(vs).astype(object))

        ref = _worker_side(build, bg, key, count_col)

        def attach(batch: pa.Table) -> pa.Table:
            m = _cached_get(ref)
            probe = np.asarray(batch.column(key).to_pylist(), dtype=object)
            vals = m.lookup(probe, np.zeros(len(probe), dtype=object))
            return batch.append_column(
                out_col, pa.array(vals.astype(np.int64), pa.int64()))

        return fg.map_batches(attach, batch_format="pyarrow")

    renamed = bg.map_batches(
        lambda t: t.rename_columns([key, out_col]), batch_format="pyarrow")
    # normalize pandas-backed blocks → Arrow so schema().types are Arrow
    # DataTypes (bucketed_hash_join casts against them)
    fg_arrow = fg.map_batches(lambda t: t, batch_format="pyarrow")
    joined = bucketed_hash_join(fg_arrow, renamed, key, key, how="left",
                                num_buckets=num_buckets)

    def fill0(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(out_col)
        filled = pc.fill_null(pc.cast(batch.column(out_col), pa.int64()), 0)
        return batch.set_column(i, out_col, filled)

    return joined.map_batches(fill0, batch_format="pyarrow")
