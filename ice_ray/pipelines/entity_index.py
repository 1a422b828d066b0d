"""Term–context PMI index (the EntitySetIndex analog, P15 + G6).

Featurizer (entityset/EntitySetIndexer.java:375-408): for each common-noun
term occurrence, contexts are ``{label-1}_{stem(governor)}`` for edges
where the term is the dependent, and ``{label}_{stem(dependent)}`` for
edges where it is the governor, stopword-filtered.

PMI (EntitySetIndexer.java:297-343): two-stage — N and context priors from
groupby sums, then each cell → ``ln(val / rowsum / prior)``.  The index
dataset is (term, contexts: list<struct<ctx, pmi>>), the Arrow analog of
the ``EntitySetIndex_nn`` file (:345-356), keeping components with
pmi > 0.1 like writeVector.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

from ..config import TERM_STOPWORDS
from ..nlp.stemmer import stem

CONTEXTS_T = pa.list_(pa.struct([("ctx", pa.string()), ("pmi", pa.float64())]))


class ContextFeaturizer:
    """Annotation batches → (term, ctx, n) partial counts."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for toks, deps in zip(batch.column("tokens").to_pylist(),
                              batch.column("deps").to_pylist()):
            nn_at = {t["start"]: t["word"] for t in toks
                     if t["pos"] in ("NN", "NNS")
                     and len(t["word"]) > 1
                     and t["word"].lower() not in TERM_STOPWORDS}
            for d in deps:
                tw = nn_at.get(d["tgt_posn"])
                if tw is not None and d["src_word"].lower() not in TERM_STOPWORDS:
                    c[(tw.lower(), f"{d['label']}-1_{stem(d['src_word'].lower())}")] += 1
                sw = nn_at.get(d["src_posn"])
                if sw is not None and d["tgt_word"].lower() not in TERM_STOPWORDS:
                    c[(sw.lower(), f"{d['label']}_{stem(d['tgt_word'].lower())}")] += 1
        ks = list(c.keys())
        return pa.table({
            "term": pa.array([k[0] for k in ks], pa.string()),
            "ctx": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64()),
        })


def build_pmi_index(annotations, min_pmi: float = 0.1,
                    strategy: str = "auto",
                    marginal_broadcast_max: int = 20_000_000,
                    marginal_broadcast_max_bytes: int = 512 << 20):
    """→ (term, contexts list<struct<ctx,pmi>>) dataset.

    Priors shipping: ``broadcast`` sends worker-side-built term/ctx
    marginal dicts (never through the driver; ``auto`` picks it while
    the pair-count aggregate fits the row+byte gate); ``join`` (open-web
    vocab scale path, the ``auto`` fallback) attaches the marginals with
    two bucketed hash joins instead (sub-linear memory)."""
    from ..functions.shuffle import grouped_aggregate
    from ..stages.dedup import _dataset_sum

    counts = grouped_aggregate(
        annotations.map_batches(ContextFeaturizer, batch_format="pyarrow",
                                concurrency=(1, 8)),
        keys=["term", "ctx"], specs=[("n", "sum")], rename={"n_sum": "n"},
    ).materialize()
    n_total = _dataset_sum(counts, "n")
    if strategy == "auto":
        strategy = ("broadcast"
                    if (counts.count() <= marginal_broadcast_max
                        and (counts.size_bytes() or 0)
                        <= marginal_broadcast_max_bytes)
                    else "join")
    if strategy == "join":
        from ..functions.join import bucketed_hash_join

        rs = grouped_aggregate(counts, keys=["term"], specs=[("n", "sum")],
                               rename={"n_sum": "rs"}).materialize()
        cs = grouped_aggregate(counts, keys=["ctx"], specs=[("n", "sum")],
                               rename={"n_sum": "cs"}).materialize()
        with_rs = bucketed_hash_join(counts, rs, "term", "term").materialize()
        with_cs = bucketed_hash_join(with_rs, cs, "ctx", "ctx")

        def cell(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            n = pc.cast(batch.column("n"), pa.float64())
            r = pc.cast(batch.column("rs"), pa.float64())
            c = pc.cast(batch.column("cs"), pa.float64())
            pmi = pc.ln(pc.divide(pc.divide(n, r),
                                  pc.divide(c, float(n_total))))
            return pa.table({"term": batch.column("term"),
                             "ctx": batch.column("ctx"),
                             "pmi": pmi})

        cells = with_cs.map_batches(cell, batch_format="pyarrow")
    else:
        # marginal dicts built worker-side from the materialized aggregate
        # block refs (never through the driver), cached per worker
        from ..stages.dedup import _build_dict, _cached_get, _worker_side

        rs_ds = grouped_aggregate(counts, keys=["term"],
                                  specs=[("n", "sum")],
                                  rename={"n_sum": "rs"}).materialize()
        cs_ds = grouped_aggregate(counts, keys=["ctx"],
                                  specs=[("n", "sum")],
                                  rename={"n_sum": "cs"}).materialize()
        rs_ref = _worker_side(_build_dict, rs_ds, "term", "rs")
        cs_ref = _worker_side(_build_dict, cs_ds, "ctx", "cs")

        def cell(batch: pa.Table) -> pa.Table:
            rs_map, cs_map = _cached_get(rs_ref), _cached_get(cs_ref)
            t = batch.column("term").to_pylist()
            x = batch.column("ctx").to_pylist()
            n = batch.column("n").to_pylist()
            pmi = [math.log(c / rs_map[a] / (cs_map[b] / n_total))
                   for a, b, c in zip(t, x, n)]
            return pa.table({
                "term": pa.array(t, pa.string()),
                "ctx": pa.array(x, pa.string()),
                "pmi": pa.array(pmi, pa.float64()),
            })

        cells = counts.map_batches(cell, batch_format="pyarrow")
    cells = cells.filter(expr=f"pmi > {min_pmi}")

    import pandas as pd

    from ..functions.shuffle import hash_mod

    # index finish: hash-bucket the terms and build ALL context lists of
    # a bucket in one pandas call — B tasks, not |vocab| tasks (the
    # engine's sessionize/_bucketed_band_pairs pattern)
    num_buckets = 32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_b", hash_mod(batch.column("term"), num_buckets))

    def bucket_to_index(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"term": [], "contexts": []})
        df = df.sort_values(["term", "ctx"], kind="mergesort")
        terms, ctxs = [], []
        for term, g in df.groupby("term", sort=False):
            terms.append(term)
            ctxs.append([{"ctx": c, "pmi": p}
                         for c, p in zip(g["ctx"], g["pmi"])])
        return pd.DataFrame({"term": terms, "contexts": ctxs})

    return (cells.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(bucket_to_index, batch_format="pandas"))


def load_index_as_dict(index_ds,
                       max_rows: int = 5_000_000) -> dict[str, dict[str, float]]:
    """Index dataset → {term: {ctx: pmi}} (the expander's in-memory form,
    entityset/EntitySetExpander.java:219-249).  Driver-resident by
    design, but guarded: a corpus-shaped term vocabulary fails loudly at
    ``max_rows`` instead of OOMing the driver."""
    index_ds = index_ds.materialize()  # count + iter read ONE execution
    n = index_ds.count()
    if n > max_rows:
        raise ValueError(
            f"load_index_as_dict: {n} index rows exceed the driver gate "
            f"({max_rows}); keep the index as a Dataset (join-side) or "
            "raise max_rows explicitly")
    out: dict[str, dict[str, float]] = {}
    for row in index_ds.iter_rows():
        out[row["term"]] = {c["ctx"]: c["pmi"] for c in row["contexts"]}
    return out
