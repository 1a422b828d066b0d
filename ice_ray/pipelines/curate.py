"""End-to-end training-corpus curation — the flagship LLM-data pipeline
composing this engine's curation operators into one streaming flow:

    read documents
      → quality filter (length/punct/stopword score ≥ threshold)
      → benchmark exclusion + decontamination (no shared word-8-gram
        with the held-out benchmark subset)
      → near-duplicate removal (MinHash+LSH clusters → keep heads)
      → sequence packing (contiguous 2048-token training sequences)
      → optional partitioned parquet write + manifest

Every stage is the already-oracled operator (quality_score,
decontaminate, minhash_neardup_pairs/neardup_clusters/dedup_apply,
pack_sequences), so the composed output has a composed SQL oracle
(`curate_keep` in __ray_entry__).  Shape notes: the drop sets
(contaminated ids, near-dup losers) are duplicate/contamination-bounded
— far smaller than the corpus — and ride the row+byte-gated broadcast
of ``drop_ids``; the only all-to-alls are the LSH band exchange and the
packing sort, both documented in their operators.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def drop_ids(docs, ids_ds, id_col: str = "doc_id",
             broadcast_max_rows: int = 50_000_000,
             broadcast_max_bytes: int = 512 << 20):
    """Drop rows whose id appears in ``ids_ds`` — thin alias of the
    shared :func:`ice_ray.stages.dedup.anti_semi_join` kernel (one
    implementation for dedup_apply and the curation drop steps, so
    gate/guard fixes can't drift between copies)."""
    from ..stages.dedup import anti_semi_join

    return anti_semi_join(docs, ids_ds, id_col=id_col,
                          broadcast_max_rows=broadcast_max_rows,
                          broadcast_max_bytes=broadcast_max_bytes)


def curate_corpus(docs, quality_min: float = 0.6, bench_mod: int = 50,
                  ngram: int = 8, neardup_threshold: float = 0.5,
                  budget: int = 2048, out_dir: str | None = None):
    """→ packed Dataset (doc_id, n_tokens, seq_id) of the curated corpus
    (module docstring).  ``out_dir`` additionally writes the packed rows
    as parquet partitioned by ``seq_block = seq_id // 1024`` (bounded
    partition count, resumable shards) plus a JSON manifest."""
    import pyarrow.compute as pc

    from ..stages.dedup import (
        decontaminate,
        dedup_apply,
        minhash_neardup_pairs,
        neardup_clusters_distributed,
    )
    from ..stages.packing import pack_sequences
    from ..stages.textstats import quality_score

    # 1. quality + benchmark-subset filter, one scan, text preserved
    def q_filter(batch: pa.Table) -> pa.Table:
        q = quality_score(batch).column("quality")
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        # doc_id % bench_mod != 0 (the benchmark subset is held out)
        not_bench = pc.not_equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, bench_mod),
                                         bench_mod)), 0)
        return batch.filter(pc.and_(pc.greater_equal(q, quality_min),
                                    not_bench))

    candidates = docs.map_batches(q_filter,
                                  batch_format="pyarrow").materialize()

    # 2. decontamination: ids sharing any word-8-gram with the benchmark
    #    subset (computed against the FULL corpus so the benchmark side
    #    is unaffected by the quality filter)
    contaminated = (decontaminate(docs, n=ngram, bench_mod=bench_mod)
                    .filter(expr="contaminated == True")
                    .select_columns(["doc_id"]))
    candidates = drop_ids(candidates, contaminated)

    # 3. near-dup removal — clusters are computed over the FULL corpus
    #    (near-duplication is a corpus-level relation: a candidate whose
    #    cluster head was filtered upstream must still be dropped, not
    #    promoted to a head of the residue)
    pairs = minhash_neardup_pairs(docs, threshold=neardup_threshold)
    clusters = neardup_clusters_distributed(pairs)
    kept = dedup_apply(candidates, clusters)

    # 4. contiguous sequence packing
    packed = pack_sequences(kept, budget=budget)

    if out_dir is not None:
        import json
        import os

        def add_block(t: pa.Table) -> pa.Table:
            blk = pc.cast(pc.divide(t.column("seq_id"), 1024), pa.int64())
            return t.append_column("seq_block", blk)

        with_block = packed.map_batches(add_block,
                                        batch_format="pyarrow").materialize()
        with_block.write_parquet(os.path.join(out_dir, "packed"),
                                 partition_cols=["seq_block"],
                                 mode="overwrite")
        n_docs = with_block.count()
        stats = {"docs_kept": int(n_docs),
                 "sequences": int(with_block.count()
                                  and (with_block.max("seq_id") + 1)),
                 "budget": budget, "quality_min": quality_min,
                 "bench_mod": bench_mod, "ngram": ngram,
                 "neardup_threshold": neardup_threshold}
        with open(os.path.join(out_dir, "curate_manifest.json"), "w") as f:
            json.dump(stats, f)
        return with_block.drop_columns(["seq_block"])
    return packed
