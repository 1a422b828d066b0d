"""Path/tree count pipelines — the `findPhrases` wide steps
(SURVEY.md §3.2; models/DepPaths.java:543-583 writePaths).

- ``path_type_counts``: groupby(typed_path) → count + first-wins repr /
  example with **pinned ordering** (min turn key), replacing the
  reference's docList-order ``sourceDict``/``linearizationDict``
  first-wins maps (DepPaths.java:692-727) with a deterministic
  ``min_by((conv_id, turn_idx))`` (SURVEY §4 "Ordering/determinism").
- ``path_instance_counts``: groupby(instance key) → count
  (relationInstanceCounts, DepPaths.java:386).
- ``rank_against_background``: f·log f / f' ratio score vs a background
  corpus (utils/Ratio.java:40-50, J2) + descending sort (numsort, K1).

Each stage pre-aggregates per batch before the shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _src_key(batch: pa.Table) -> pa.ChunkedArray:
    return pc.binary_join_element_wise(
        batch.column("conv_id"),
        pc.utf8_lpad(pc.cast(batch.column("turn_idx"), pa.string()), 9, "0"),
        "#")


def _add_payload(batch: pa.Table) -> pa.Table:
    t = batch.append_column("src_key", _src_key(batch))
    # first-wins payload rides along as "<src_key>\x01repr\x01example"
    payload = pc.binary_join_element_wise(
        t.column("src_key"), t.column("repr"), t.column("example"), "\x01")
    return t.append_column("payload", payload)


def path_type_counts(paths: "ray.data.Dataset",
                     min_freq: int = 1) -> "ray.data.Dataset":
    """→ (typed_path, count, repr, example) — the RelationTypes +
    RelationRepr tables in one dataset (bucketed two-stage aggregate)."""
    from ..functions.shuffle import grouped_aggregate

    agg = grouped_aggregate(
        paths.map_batches(_add_payload, batch_format="pyarrow"),
        keys=["typed_path"],
        specs=[("typed_path", "count"), ("payload", "min")],
        rename={"typed_path_count": "count", "payload_min": "payload"},
    )

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("payload"), "\x01")
        out = (batch
               .append_column("repr", pc.list_element(parts, 1))
               .append_column("example", pc.list_element(parts, 2))
               .drop_columns(["payload"]))
        if min_freq > 1:
            out = out.filter(pc.greater_equal(out["count"], min_freq))
        return out

    return agg.map_batches(unpack, batch_format="pyarrow")


def path_instance_counts(paths: "ray.data.Dataset") -> "ray.data.Dataset":
    """groupby(instance key ``arg1 -- path -- arg2``) → count — the
    relationInstanceCounts table (G1, DepPaths.java:386, 678-691)."""
    return key_counts(paths, "instance_key", alias="count")


def key_counts(ds: "ray.data.Dataset", col: str,
               alias: str = "count") -> "ray.data.Dataset":
    """Generic pre-aggregated groupby(col).count() (G1/G5)."""
    from ..functions.shuffle import grouped_aggregate

    return grouped_aggregate(ds.select_columns([col]), keys=[col],
                             specs=[(col, "count")],
                             rename={f"{col}_count": alias})


def rank_against_background(fg_counts: "ray.data.Dataset",
                            bg_counts: "ray.data.Dataset",
                            key: str = "typed_path",
                            count_col: str = "count",
                            strategy: str = "auto") -> "ray.data.Dataset":
    """Ratio score ``(f+1)/(f'+1) * ln(f+1)`` (utils/Ratio.java:44-50,
    add-one on both sides, missing background → 1), sorted descending.
    The background side rides ``attach_background_counts``' row+byte
    gated broadcast, with the bucketed LEFT join above the gate — no
    un-gated vocabulary dict on the driver (r4 hot-path audit)."""
    import numpy as np

    from ..functions.join import attach_background_counts

    with_bg = attach_background_counts(fg_counts, bg_counts, key=key,
                                       count_col=count_col, out_col="_bg",
                                       strategy=strategy)

    def score_batch(batch: pa.Table) -> pa.Table:
        f1 = batch.column(count_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64) + 1
        f2 = batch.column("_bg").to_numpy(zero_copy_only=False) + 1
        score = f1 / f2 * np.log(f1)
        return batch.drop_columns(["_bg"]).append_column(
            "score", pa.array(score, pa.float64()))

    return (with_bg.map_batches(score_batch, batch_format="pyarrow")
            .sort("score", descending=True))
