"""Adapters from the driver's testdata tables to the engine's input
schema (BASELINE.json.input_hint transcripts shape)."""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

import ray.data

_EPOCH = _dt.datetime(2024, 1, 1)


def transcripts_from_documents(sf_dir: str, turns_per_conv: int = 10) -> "ray.data.Dataset":
    """documents.parquet → transcripts-shaped Dataset.  Deterministic:
    conv_id = doc_id // turns_per_conv, turn_idx = doc_id % turns_per_conv,
    role alternates user/assistant, ts = epoch + doc_id seconds.  No
    shuffle — a pure per-batch projection."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def adapt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "conv_id": pa.array([f"doc-{i // turns_per_conv:07d}" for i in ids]),
            "turn_idx": pa.array([i % turns_per_conv for i in ids], pa.int32()),
            "role": pa.array(["user" if i % 2 == 0 else "assistant" for i in ids]),
            "text": batch.column("text"),
            "tool": pa.array([""] * len(ids)),
            "ts": pa.array([_EPOCH + _dt.timedelta(seconds=i) for i in ids],
                           pa.timestamp("us")),
        })

    return ds.map_batches(adapt, batch_format="pyarrow")
