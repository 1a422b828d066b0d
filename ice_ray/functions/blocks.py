"""Block-ref hygiene for tasks fed ``Dataset.to_arrow_refs()``.

Ray's ``to_arrow_refs()`` takes a zero-copy shortcut: when the dataset's
SCHEMA reports Arrow, it returns the raw block refs unconverted.  But a
block can still be a pandas DataFrame — Ray Data skips the UDF on
empty blocks, so a zero-row pandas block emitted by an upstream
``map_groups(batch_format="pandas")`` stage sails through an Arrow
``map_batches`` (and the schema check, which only sees non-empty
blocks) and lands in the consumer task as a columnless DataFrame.
Observed on the MinHash pair table at sf0.01 / 32 cpus (empty LSH work
buckets); partitioning-dependent, so every consumer must coerce.
"""

from __future__ import annotations

import pyarrow as pa


def ensure_arrow_block(t) -> pa.Table:
    """Coerce one to_arrow_refs() block to a pyarrow Table (identity for
    the normal Arrow case; empty/columnless pandas blocks become
    empty/columnless tables, so ``column_names`` guards keep working)."""
    if isinstance(t, pa.Table):
        return t
    import pandas as pd

    if isinstance(t, pd.DataFrame):
        return pa.Table.from_pandas(t, preserve_index=False)
    return pa.table(t)
