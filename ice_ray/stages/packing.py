"""Sequence packing + exact distributed percentiles — LLM-training-data
operators over the documents table.

``pack_sequences`` assigns each document (in global id order) to a
training sequence of at most ``budget`` tokens:
``seq_id = floor(exclusive_prefix_sum(n_tokens) / budget)`` — the
deterministic, SQL-reproducible form of contiguous sequence packing
(every sequence takes consecutive documents; a document that overflows
the budget starts the next sequence's span).  The distributed shape is
the classic two-phase prefix sum:

1. vectorized per-doc token counts (pandas C regex, no Python loop);
2. range-partitioned sort on the id — the ONE all-to-all this operator
   fundamentally needs (global order);
3. per-block token sums: one int per block crosses the driver;
4. exclusive block offsets (driver math over #blocks ints);
5. per-block sequence assignment in parallel Ray tasks over the block
   refs — blocks never visit the driver.

At petabyte scale, pack per input shard instead (documents are already
sharded): run this per shard and salt ``seq_id`` with the shard id — the
sort then never crosses shards.

``exact_percentiles``: exact PERCENTILE-style quantiles of an integer
column via per-batch ``value_counts`` partials merged into one histogram
(distinct-value-bounded — token counts, lengths and scores have tiny
value domains at any corpus size), finished with the pinned rule
``value = min v with cum_count(v) >= ceil(p·n)`` (mirrored verbatim by
the SQL oracle's window form, so no engine-specific quantile semantics
are involved).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_TOKEN_RE = r"[a-z]+"   # the repo-wide token definition (textstats._WORD_RE)


def _with_ntokens(ds, text_col: str, id_col: str):
    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "n_tokens": df[text_col].fillna("").str.lower()
                          .str.count(_TOKEN_RE).astype("int64"),
        })
    return ds.map_batches(count_tokens, batch_format="pandas")


@ray.remote
def _block_sum(t: pa.Table) -> tuple[int, bool]:
    """→ (Σ n_tokens, usable?) — usable is False for the empty
    passthrough blocks to_arrow_refs can leak (see functions/blocks.py)."""
    import pyarrow.compute as pc

    from ..functions.blocks import ensure_arrow_block
    t = ensure_arrow_block(t)
    if "n_tokens" not in t.column_names:
        return 0, False
    return int(pc.sum(t.column("n_tokens")).as_py() or 0), True


@ray.remote
def _assign_seqs(t: pa.Table, offset: int, budget: int) -> pa.Table:
    from ..functions.blocks import ensure_arrow_block
    t = ensure_arrow_block(t)
    n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
    cum_excl = offset + np.cumsum(n) - n
    return t.append_column("seq_id", pa.array(cum_excl // budget, pa.int64()))


def pack_sequences(docs, budget: int = 2048, text_col: str = "text",
                   id_col: str = "doc_id"):
    """→ Dataset (id, n_tokens, seq_id) — contiguous-in-id packing into
    ``budget``-token sequences via a distributed two-phase prefix sum
    (module docstring).  Deterministic in the id set alone."""
    slim = _with_ntokens(docs, text_col, id_col).sort(id_col).materialize()
    refs = slim.to_arrow_refs()   # block order == sort order (range parts)
    if not refs:
        return slim
    meta = ray.get([_block_sum.remote(r) for r in refs])
    refs = [r for r, (_, ok) in zip(refs, meta) if ok]  # drop leaked empties
    sums = [s for s, ok in meta if ok]
    if not refs:
        return slim
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    out_refs = [_assign_seqs.remote(r, int(off), budget)
                for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def pack_stats(docs, budget: int = 2048, text_col: str = "text",
               id_col: str = "doc_id"):
    """Per-sequence fill stats: docs per sequence + token fill — the
    packing-efficiency readout (one bucketed aggregate over the packed
    rows)."""
    from ..functions.shuffle import grouped_aggregate

    packed = pack_sequences(docs, budget, text_col, id_col)
    return grouped_aggregate(
        packed, keys=["seq_id"],
        specs=[("n_tokens", "sum"), ("n_tokens", "count")],
        rename={"n_tokens_sum": "fill_tokens", "n_tokens_count": "n_docs"})


def exact_percentiles(ds, col: str, ps=(0.5, 0.9, 0.99),
                      num_buckets: int | None = None) -> pd.DataFrame:
    """Exact quantiles of an integer column (one row:
    ``p50``/``p90``/… columns).  Per-batch value_counts partials → one
    bucketed aggregate over DISTINCT VALUES (domain-bounded, not
    row-bounded) → driver finish with the pinned rule
    ``min v with cum >= ceil(p·n)``."""
    import pyarrow.compute as pc

    from ..functions.shuffle import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(col).combine_chunks())
        return pa.table({"v": pc.cast(vc.field("values"), pa.int64()),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["v"], specs=[("c", "sum")], rename={"c_sum": "c"},
        num_buckets=num_buckets).to_pandas()
    hist = hist.sort_values("v", kind="mergesort").reset_index(drop=True)
    cum = hist["c"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for p in ps:
        name = f"p{int(p * 100)}"
        if n == 0:
            out[name] = [None]
            continue
        target = int(np.ceil(p * n))
        idx = int(np.searchsorted(cum, target, side="left"))
        out[name] = [int(hist["v"].iloc[idx])]
    return pd.DataFrame(out)
