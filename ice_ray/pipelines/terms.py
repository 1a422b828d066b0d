"""ICE-style term counting + ranking over annotated turns.

- ``TermExtractor``: per-turn candidate terms — suffix runs of NN/NNS/JJ*
  tokens ending at a run's head, stopword/len>1 filtered, suppressed when
  the group contains a name; names counted separately with ``/nnp``
  (terminology/TermCounter.java:224-252 + addDocument :166-212).
- ``ice_term_counts``: (term, freq, doc_freq) via per-batch partials +
  groupby (G4).
- ``rank_terms``: TermRanker score ``posDF · ln(posDF)^α / negDF`` with
  add-one on the background (terminology/TermRanker.java:73-92), sorted
  descending (K2).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..config import TERM_STOPWORDS
from ..nlp.lexicon import PRONOUNS

_EXCLUDED = {"Contact/nn", "today/nn", "yesterday/nn"}  # TermRanker.java:47-52


class TermExtractor:
    """Annotation batches → (term, freq, doc_freq) partial counts."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        freq: Counter = Counter()
        doc_freq: Counter = Counter()
        toks_col = batch.column("tokens").to_pylist()
        ments_col = batch.column("mentions").to_pylist()
        for toks, ments in zip(toks_col, ments_col):
            local: Counter = Counter()
            name_spans = [(m["start"], m["end"]) for m in ments if m["mtype"] == "NAM"]
            # common-noun groups: maximal runs of NN/NNS/JJ* tokens
            run: list[dict] = []
            for t in toks + [None]:
                if t is not None and t["pos"] in ("NN", "NNS") or \
                        (t is not None and t["pos"].startswith("JJ")):
                    run.append(t)
                    continue
                if run:
                    in_name = any(s <= run[0]["start"] < e for s, e in name_spans)
                    if not in_name:
                        # suffixes ending at the head (last token of the run)
                        words = [r["word"] for r in run]
                        for i in range(len(words) - 1, -1, -1):
                            w = words[i]
                            if len(w) <= 1 or w in TERM_STOPWORDS or w.startswith("'"):
                                break
                            term = " ".join(words[i:]) + "/nn"
                            local[term] += 1
                    run = []
            # names as units with /nnp (TermCounter.java:184-196)
            for m in ments:
                if m["mtype"] != "NAM" or m["type"] in ("NUMBER", "MONEY", "TIME"):
                    continue
                for t in toks:
                    if t["start"] == m["start"]:
                        if t["word"].lower() in PRONOUNS:
                            break  # pronoun mentions are not name terms
                        term = t["word"].replace("_", " ") + "/nnp"
                        if len(term) > 5 and term[0].isalpha():
                            local[term] += 1
                        break
            freq.update(local)
            doc_freq.update(local.keys())
        terms = list(freq.keys())
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "freq": pa.array([freq[t] for t in terms], pa.int64()),
            "doc_freq": pa.array([doc_freq[t] for t in terms], pa.int64()),
        })


def ice_term_counts(annotations):
    from ..functions.shuffle import grouped_aggregate

    partial = annotations.map_batches(TermExtractor, batch_format="pyarrow",
                                      concurrency=(1, 8))
    return grouped_aggregate(partial, keys=["term"],
                             specs=[("freq", "sum"), ("doc_freq", "sum")],
                             rename={"freq_sum": "freq",
                                     "doc_freq_sum": "doc_freq"})


def rank_terms(fg_counts, bg_counts, alpha: float = 1.0,
               strategy: str = "auto"):
    """TermRanker: score = posDF · ln(posDF)^alpha / negDF, negDF = bg+1
    (missing → 1); 'Contact/today/yesterday' foreground rows dropped.

    The background vocabulary rides the gated broadcast / bucketed-join
    shape of ``attach_background_counts`` — it never lands un-gated on
    the driver (the r4 hot-path audit)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.join import attach_background_counts

    with_bg = attach_background_counts(fg_counts, bg_counts,
                                       key="term", count_col="doc_freq",
                                       out_col="_bg_df", strategy=strategy)

    def score_batch(batch: pa.Table) -> pa.Table:
        p = batch.column("doc_freq").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        neg = batch.column("_bg_df").to_numpy(zero_copy_only=False) + 1
        # same op order as the scalar form: (p · ln(p)^α) / neg, 0 at p≤1
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.where(p > 1, p * np.log(p) ** alpha / neg, 0.0)
        out = batch.drop_columns(["_bg_df"]).append_column(
            "score", pa.array(score, pa.float64()))
        return out.filter(pc.invert(pc.is_in(
            out.column("term"), value_set=pa.array(sorted(_EXCLUDED)))))

    return (with_bg.map_batches(score_batch, batch_format="pyarrow")
            .sort(["score", "term"], descending=[True, False]))
