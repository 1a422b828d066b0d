"""Deterministic distributed sampling.

``sample_n``: uniform n-sample without coordination — every row gets a
deterministic key ``blake2b(id, seed)``; the global sample is the n
smallest keys.  Per-batch partial top-n keeps the driver merge at
n × num_batches rows.  Reproducible across runs, cluster sizes and
block layouts (the properties ``ds.random_sample`` can't give you),
which makes sampled eval sets stable across pipeline re-runs.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _key(value, seed: int) -> int:
    return int.from_bytes(
        hashlib.blake2b(f"{seed}:{value}".encode(), digest_size=8).digest(),
        "little")


def sample_n(ds, n: int, id_col: str, seed: int = 42):
    """→ pandas DataFrame of the n sampled rows (driver-side merge of
    per-batch partial top-n; deterministic in (id set, seed))."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [_key(v, seed) for v in ids]
        if len(keys) > n:
            cutoff = sorted(keys)[n - 1]
            mask = pa.array([k <= cutoff for k in keys])
            batch = batch.filter(mask)
            keys = [k for k in keys if k <= cutoff]
        return batch.append_column("_skey", pa.array(keys, pa.uint64()))

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (cand.nsmallest(n, "_skey").drop(columns=["_skey"])
            .reset_index(drop=True))


def stratified_sample_n(ds, n: int, group_col: str, id_col: str):
    """Deterministic n-per-group sample: every row is keyed by
    ``md5(str(id))`` (SQL-reproducible — the DuckDB oracle is a plain
    ``row_number() OVER (PARTITION BY group ORDER BY md5(id), id)``);
    the group sample is the n smallest keys.  Per-batch partial top-n
    per group bounds the shuffle to ≤ n·groups·batches rows; one small
    groupby finishes.  Returns a Dataset with the input columns."""
    import hashlib as _h

    import pandas as pd

    in_cols = list(ds.schema().names)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_skey"] = [_h.md5(str(v).encode()).hexdigest()
                       for v in df[id_col]]
        return (df.sort_values(["_skey", id_col], kind="mergesort")
                .groupby(group_col, sort=False).head(n))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "_skey" not in df.columns:
            return pd.DataFrame({c: [] for c in in_cols})
        return (df.sort_values(["_skey", id_col], kind="mergesort")
                .groupby(group_col, sort=False).head(n)
                .drop(columns=["_skey"]))[in_cols]

    cand = ds.map_batches(partial, batch_format="pandas")
    return cand.groupby(group_col).map_groups(final, batch_format="pandas")
