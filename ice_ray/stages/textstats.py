"""Text-analysis stages over a document/turn text column: token counts,
term counts (G4 analog with the reference's stoplist), quality scoring,
language-ID heuristic, document fingerprinting.

All stages are vectorized per batch — tokenization is ONE RE2 split +
flatten over the batch's text column (:func:`flat_tokens`), and every
per-document statistic is an Arrow ``group_by`` / numpy ``bincount``
over the flat (row_id, token) pairs, never a Python loop per document.
Stages pre-aggregate before any shuffle.  The simple-token variants
(lowercase ``[a-z]+`` tokens) are deliberately SQL-expressible so the
DuckDB oracle can check them exactly (TermCounter semantics live in
pipelines/terms.py over annotations instead).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import TERM_STOPWORDS

_WORD_RE = re.compile(r"[a-z]+")
_WS_RE = re.compile(r"\s+")
_STOP_ARR = pa.array(sorted(TERM_STOPWORDS), pa.string())

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "por", "con"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "du", "est", "pas"},
}


def flat_tokens(col, min_len: int = 1, drop_stopwords: bool = False):
    """Vectorized ``[a-z]+`` tokenization of a string column — the batch
    form of ``_WORD_RE.findall(text.lower())`` as one RE2 split +
    flatten instead of a Python loop per document.  Returns ``(tokens,
    row_ids)``: the flat token array and each token's source row index
    (np.int64).  ``min_len`` / ``drop_stopwords`` apply the term filters
    on the same mask so callers never re-loop."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(lowered, "[^a-z]+")
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy().astype(np.int64)
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # the split emits empty strings at run boundaries; min_len >= 1
    # drops them, matching findall exactly
    mask = pc.greater_equal(pc.utf8_length(flat), min_len)
    if drop_stopwords:
        mask = pc.and_(mask, pc.invert(pc.is_in(flat,
                                                value_set=_STOP_ARR)))
    mask_np = mask.to_numpy(zero_copy_only=False)
    return flat.filter(mask), row_ids[mask_np]


def _space_tokens(col):
    """Literal single-space split (the SQL ``string_split(text, ' ')``
    tokenization of the repetition / n-gram kernels), flattened with
    per-token source row ids.  Unlike :func:`flat_tokens` this KEEPS
    empty tokens — ``"a  b".split(" ")`` has three elements."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy().astype(np.int64)
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return flat, row_ids, counts


def term_count_partials(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Per-batch combiner → (term, freq, doc_freq) partial rows.
    Term = lowercase alphabetic token, len > 1, not a stopword
    (TermCounter.java:36-45 stoplist).  Safe because one document is
    wholly contained in one row.  Vectorized: one flat tokenization,
    one (row, term) group for tf, one term group for the partials."""
    toks, rows = flat_tokens(batch.column(text_col), min_len=2,
                             drop_stopwords=True)
    if len(toks) == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "freq": pa.array([], pa.int64()),
                         "doc_freq": pa.array([], pa.int64())})
    per_doc = (pa.table({"_r": pa.array(rows, pa.int64()), "term": toks})
               .group_by(["_r", "term"]).aggregate([("term", "count")]))
    agg = per_doc.group_by("term").aggregate([("term_count", "sum"),
                                              ("term_count", "count")])
    return pa.table({
        "term": agg.column("term"),
        "freq": pc.cast(agg.column("term_count_sum"), pa.int64()),
        "doc_freq": pc.cast(agg.column("term_count_count"), pa.int64()),
    })


def term_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (term, freq, doc_freq) dataset (G4: corpus frequency + document
    frequency); bucketed two-stage aggregate, shuffle moves partials only."""
    from ..functions.shuffle import grouped_aggregate

    partial = ds.map_batches(term_count_partials, batch_format="pyarrow",
                             fn_kwargs={"text_col": text_col, "id_col": id_col})
    return grouped_aggregate(partial, keys=["term"],
                             specs=[("freq", "sum"), ("doc_freq", "sum")],
                             rename={"freq_sum": "freq",
                                     "doc_freq_sum": "doc_freq"})


def adjacent_pair_counts(batch: pa.Table,
                         text_col: str = "text") -> pa.Table:
    """Per-batch (term, ctx, n) partial counts of ADJACENT token pairs
    (the PMI co-occurrence rows of G6) — vectorized: flat tokenization,
    adjacency = consecutive tokens with the same source row, one Arrow
    group count."""
    toks, rows = flat_tokens(batch.column(text_col))
    if len(toks) < 2:
        return pa.table({"term": pa.array([], pa.string()),
                         "ctx": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    same = pa.array(rows[1:] == rows[:-1])
    t = pa.table({"term": toks.slice(0, len(toks) - 1).filter(same),
                  "ctx": toks.slice(1).filter(same)})
    agg = t.group_by(["term", "ctx"]).aggregate([("term", "count")])
    return pa.table({"term": agg.column("term"),
                     "ctx": agg.column("ctx"),
                     "n": pc.cast(agg.column("term_count"), pa.int64())})


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document token counting + quality signals: n_tokens,
    n_stopwords, n_chars_norm (whitespace-collapsed length).
    Vectorized: token/stopword counts are bincounts over the flat
    tokenization; the normalized length is two RE2 kernels."""
    n = batch.num_rows
    toks, rows = flat_tokens(batch.column(text_col))
    n_tokens = np.bincount(rows, minlength=n)
    stop_mask = pc.is_in(toks, value_set=_STOP_ARR) \
        .to_numpy(zero_copy_only=False)
    n_stop = np.bincount(rows[stop_mask], minlength=n)
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.fill_null(col, "")), r"\s+", " ")
    n_chars = pc.utf8_length(norm).to_numpy(zero_copy_only=False)
    return (batch.select([c for c in (batch.column_names) if c in ("doc_id", "conv_id", "turn_idx")])
            .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
            .append_column("n_stopwords", pa.array(n_stop, pa.int64()))
            .append_column("n_chars_norm",
                           pa.array(n_chars.astype(np.int64), pa.int64())))


def _tf_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Vectorized per-(doc, term) raw term-frequency rows for one batch:
    flat tokenization + one (row, term) group count; row indices map
    back to doc ids with a take."""
    toks, rows = flat_tokens(batch.column(text_col), min_len=2,
                             drop_stopwords=True)
    if len(toks) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    per_doc = (pa.table({"_r": pa.array(rows, pa.int64()), "term": toks})
               .group_by(["_r", "term"]).aggregate([("term", "count")]))
    ids = pc.cast(batch.column(id_col), pa.int64()) \
        .take(per_doc.column("_r"))
    return pa.table({id_col: ids, "term": per_doc.column("term"),
                     "tf": pc.cast(per_doc.column("term_count"),
                                   pa.int64())})


def _tf_rows(ds, text_col: str, id_col: str):
    """Per-(doc, term) raw term-frequency rows."""
    return ds.map_batches(_tf_batch, batch_format="pyarrow",
                          fn_kwargs={"text_col": text_col,
                                     "id_col": id_col})


def tfidf_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                 strategy: str = "auto",
                 vocab_broadcast_max: int = 20_000_000,
                 vocab_broadcast_max_bytes: int = 512 << 20):
    """Per-(doc, term) TF-IDF: ``tf · ln(N / df)`` with raw term counts
    as tf.

    ``strategy="broadcast"``: the df table is broadcast (built
    WORKER-side from the aggregate's block refs — never through the
    driver) and scores are a per-batch transform — no per-doc shuffle.
    ``auto`` (default) picks it while the vocabulary fits the row+byte
    gate.

    ``strategy="join"`` (open-web vocabulary scale path, the ``auto``
    fallback): tf rows join the df table with a bucketed hash join on
    the term — sub-linear memory, one extra exchange of the tf rows."""
    n_docs = ds.count()
    # both strategies only consume (term, doc_freq) — prune freq BEFORE
    # the single materialize so the byte gate measures what actually
    # ships (and the join path doesn't re-materialize a second copy)
    df_ds = (term_counts(ds, text_col, id_col)
             .select_columns(["term", "doc_freq"]).materialize())
    if strategy == "auto":
        strategy = ("broadcast"
                    if (df_ds.count() <= vocab_broadcast_max
                        and (df_ds.size_bytes() or 0)
                        <= vocab_broadcast_max_bytes)
                    else "join")
    if strategy == "join":
        from ..functions.join import bucketed_hash_join

        tf = _tf_rows(ds, text_col, id_col).materialize()
        joined = bucketed_hash_join(tf, df_ds, "term", "term")

        def score(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            s = pc.round(pc.multiply(
                pc.cast(batch.column("tf"), pa.float64()),
                pc.ln(pc.divide(float(n_docs),
                                pc.cast(batch.column("doc_freq"),
                                        pa.float64())))), 6)
            return pa.table({
                id_col: batch.column(id_col),
                "term": batch.column("term"),
                "tf": batch.column("tf"),
                "tfidf": s,
            })

        return joined.map_batches(score, batch_format="pyarrow")

    # df dict built worker-side from the aggregate block refs (never
    # through the driver), cached per worker
    from .dedup import _build_dict, _cached_get, _worker_side

    df_ref = _worker_side(_build_dict, df_ds, "term", "doc_freq")

    def tfidf_fn(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df_map = _cached_get(df_ref)
        tf = _tf_batch(batch, text_col, id_col)
        if tf.num_rows == 0:
            return tf.append_column("tfidf", pa.array([], pa.float64()))
        # dict probe at C speed per (doc, term) row; idf math vectorized
        df_vals = (pd.Series(tf.column("term").to_pandas())
                   .map(df_map).to_numpy(dtype=np.float64))
        score = np.round(tf.column("tf").to_numpy() *
                         np.log(n_docs / df_vals), 6)
        return tf.append_column("tfidf", pa.array(score, pa.float64()))

    return ds.map_batches(tfidf_fn, batch_format="pyarrow")


# GPT-2-style pre-tokenizer pattern (public), ASCII approximation of the
# \p{L}/\p{N} classes — a "BPE-ish" token counter for budget estimation
_BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")


def bpe_token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document BPE-ish pre-token count (the training-data token
    budgeting operator; whitespace token count lives in token_stats)."""
    counts = [len(_BPE_RE.findall(text or ""))
              for text in batch.column(text_col).to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_bpe_tokens": pa.array(counts, pa.int64())})


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality score in [0,1].
    Vectorized: token/stopword counts from the flat tokenization,
    punctuation count from one RE2 kernel (chars that are neither
    alphanumeric nor whitespace), score arithmetic in numpy."""
    n = batch.num_rows
    ids = batch.column("doc_id")
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    toks, rows = flat_tokens(col)
    n_toks = np.bincount(rows, minlength=n).astype(np.float64)
    stop_mask = pc.is_in(toks, value_set=_STOP_ARR) \
        .to_numpy(zero_copy_only=False)
    n_stop = np.bincount(rows[stop_mask], minlength=n).astype(np.float64)
    n_punct = pc.count_substring_regex(col, r"[^0-9A-Za-z\s]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_toks > 0, n_stop / n_toks, 0.0)
        punct_ratio = n_punct / np.maximum(n_chars, 1)
    length_ok = np.where((n_toks >= 10) & (n_toks <= 10000), 1.0, 0.5)
    score = np.round(length_ok * (1 - punct_ratio)
                     * (0.5 + 0.5 * np.minimum(stop_ratio * 4, 1.0)), 6)
    score = np.where(n_toks > 0, score, 0.0)
    return pa.table({"doc_id": ids,
                     "quality": pa.array(score, pa.float64())})


class LangId:
    """Stopword-profile language ID (actor stage; profiles compiled once).
    Returns the argmax profile or 'und' when nothing matches.
    Vectorized: one flat tokenization, a distinct (row, token) group,
    then one ``is_in`` + bincount per profile; the scalar tie rule
    (first lang in sorted order with the strictly-highest overlap) is
    numpy argmax over the per-lang count matrix."""

    def __init__(self):
        self.profiles = _LANG_PROFILES
        self.langs = sorted(_LANG_PROFILES)
        self.prof_arrs = [pa.array(sorted(_LANG_PROFILES[lg]), pa.string())
                          for lg in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        toks, rows = flat_tokens(batch.column("text"))
        if len(toks):
            distinct = (pa.table({"_r": pa.array(rows, pa.int64()),
                                  "tok": toks})
                        .group_by(["_r", "tok"]).aggregate([]))
            drows = distinct.column("_r").to_numpy()
            dtoks = distinct.column("tok")
            counts = np.zeros((n, len(self.langs)), dtype=np.int64)
            for j, arr in enumerate(self.prof_arrs):
                m = pc.is_in(dtoks, value_set=arr) \
                    .to_numpy(zero_copy_only=False)
                counts[:, j] = np.bincount(drows[m], minlength=n)
        else:
            counts = np.zeros((n, len(self.langs)), dtype=np.int64)
        best = counts.argmax(axis=1)   # first max ≡ the scalar tie rule
        langs = np.asarray(self.langs, dtype=object)
        preds = np.where(counts.max(axis=1) > 0, langs[best], "und")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_pred": pa.array(preds, pa.string())})


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic document fingerprint: md5 of the
    lowercase/whitespace-collapsed text (SQL-checkable in DuckDB).
    Normalization is vectorized RE2; only the md5 digest itself is a
    per-row C call."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(col, ""))),
        r"\s+", " ")
    fps = [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fp": pa.array(fps, pa.string())})


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition metrics (the "repetition
    removal" quality filter of large-scale LLM data pipelines):
    duplicate-word fraction and duplicate-2-gram fraction per document.

    Tokens are literal single-space splits so the metric is
    reproducible in ANSI SQL (``string_split(text, ' ')``); the per-doc
    kernel is C-level set construction, same shape as quality_score."""
    n = batch.num_rows
    ids = batch.column("doc_id")
    flat, rows, n_words = _space_tokens(batch.column(text_col))
    # distinct words per doc: group (row, word), count rows per row id
    dw = (pa.table({"_r": pa.array(rows, pa.int64()), "w": flat})
          .group_by(["_r", "w"]).aggregate([]))
    n_distinct = np.bincount(dw.column("_r").to_numpy(), minlength=n)
    # distinct 2-grams per doc: adjacent (w[i], w[i+1]) pairs that stay
    # within one doc (same row id), joined with a separator the corpus
    # split can't produce, then the same distinct group
    if len(flat) > 1:
        same = rows[1:] == rows[:-1]
        g = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), "\x00")
        gt = (pa.table({"_r": pa.array(rows[:-1][same], pa.int64()),
                        "g": g.filter(pa.array(same))})
              .group_by(["_r", "g"]).aggregate([]))
        n_distinct2 = np.bincount(gt.column("_r").to_numpy(), minlength=n)
    else:
        n_distinct2 = np.zeros(n, dtype=np.int64)
    nw = n_words.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        dupw = np.where(n_words > 0, 1.0 - n_distinct / nw, 0.0)
        dup2 = np.where(n_words > 1, 1.0 - n_distinct2 / (nw - 1), 0.0)
    return pa.table({
        "doc_id": ids,
        "n_words": pa.array(n_words, pa.int64()),
        "dup_word_frac": pa.array(dupw, pa.float64()),
        "dup_2gram_frac": pa.array(dup2, pa.float64()),
    })


# PII patterns share the RE2 engine between pyarrow and DuckDB, so the
# scrub is ANSI-SQL-oracle-reproducible byte for byte.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\b\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_scrub(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII scrubbing (email / IPv4 / phone → typed placeholders) — the
    redaction pass of a training-data pipeline.  Fully vectorized RE2
    kernels (`count_substring_regex` + `replace_substring_regex`);
    patterns apply sequentially, counts are per-pattern-on-current-text
    (mirrored exactly by the SQL oracle's CTE chain)."""
    import numpy as np
    import pyarrow.compute as pc

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    total = np.zeros(batch.num_rows, np.int64)
    for pat, repl in PII_PATTERNS:
        total += pc.count_substring_regex(col, pat).to_numpy()
        col = pc.replace_substring_regex(col, pat, repl)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "scrubbed": col,
        "n_redactions": pa.array(total, pa.int64()),
    })


def _build_pair_marginals(*tables):
    """One-task marginal builder over the materialized pair blocks:
    row sums per term, column sums per ctx, grand total — returned as
    two plain dicts + an int (pair-vocabulary-bounded; only runs under
    the caller's row+byte gate)."""
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return {}, {}, 0
    allp = pa.concat_tables(ts)
    rs = allp.group_by("term").aggregate([("n", "sum")])
    cs = allp.group_by("ctx").aggregate([("n", "sum")])
    total = pc.sum(allp.column("n")).as_py() or 0
    return (dict(zip(rs.column("term").to_pylist(),
                     rs.column("n_sum").to_pylist())),
            dict(zip(cs.column("ctx").to_pylist(),
                     cs.column("n_sum").to_pylist())),
            int(total))


def adjacent_pair_pmi(ds, text_col: str = "text", strategy: str = "auto",
                      marginal_broadcast_max_rows: int = 20_000_000,
                      marginal_broadcast_max_bytes: int = 512 << 20):
    """PMI of adjacent-token (term, ctx) pairs — the two-stage PMI
    computation of G6 (EntitySetIndexer.java:297-343): partial pair
    counts → bucketed (term, ctx) aggregate → marginal attach → per-row
    transform.

    Marginal attach strategies:

    - ``auto`` fast path: while the PAIR table (vocabulary-shaped, far
      smaller than the corpus) fits the row+byte gate, both marginals
      and the total are computed in ONE Ray task over the materialized
      pair block refs (never on the driver) and broadcast; the PMI
      finish is one fused map over the pairs — three fewer dataset
      executions than the exchange path.
    - above the gate (open-web pair vocabulary), two bucketed marginal
      aggregates attach via the gated ``attach_background_counts``
      (which itself degrades to a bucketed LEFT join at scale).

    ``strategy`` ∈ {auto, broadcast, join}; broadcast/join force a path
    (broadcast raises above the gate)."""
    import ray

    from ..functions.shuffle import grouped_aggregate

    pairs = grouped_aggregate(
        ds.map_batches(adjacent_pair_counts, batch_format="pyarrow",
                       fn_kwargs={"text_col": text_col}),
        keys=["term", "ctx"], specs=[("n", "sum")], rename={"n_sum": "n"},
    ).materialize()

    n_pairs = pairs.count()
    fits = (n_pairs <= marginal_broadcast_max_rows
            and (pairs.size_bytes() or 0) <= marginal_broadcast_max_bytes)
    if strategy == "broadcast" and not fits:
        raise ValueError("pair table exceeds the marginal broadcast gate")
    if strategy in ("auto", "broadcast") and fits:
        import pandas as pd

        from .dedup import _cached_get, _worker_side

        ref = _worker_side(_build_pair_marginals, pairs)

        def pmi_fused(batch: pa.Table) -> pa.Table:
            rs_map, cs_map, total = _cached_get(ref)
            n = batch.column("n").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            r = (pd.Series(batch.column("term").to_pandas())
                 .map(rs_map).to_numpy(dtype=np.float64))
            c = (pd.Series(batch.column("ctx").to_pandas())
                 .map(cs_map).to_numpy(dtype=np.float64))
            # same op order as the exchange path: n / rs / (cs / N)
            pmi = np.round(np.log(n / r / (c / float(total))), 6)
            return batch.append_column("pmi", pa.array(pmi, pa.float64()))

        return pairs.map_batches(pmi_fused, batch_format="pyarrow")

    # exchange path: marginals as bucketed aggregates, gated attach
    from ..functions.join import attach_background_counts
    from .dedup import _dataset_sum

    rs = grouped_aggregate(pairs, keys=["term"], specs=[("n", "sum")],
                           rename={"n_sum": "rs"})
    cs = grouped_aggregate(pairs, keys=["ctx"], specs=[("n", "sum")],
                           rename={"n_sum": "cs"})
    n_total = _dataset_sum(pairs, "n")
    with_rs = attach_background_counts(pairs, rs, key="term",
                                       count_col="rs", out_col="_rs")
    with_cs = attach_background_counts(with_rs, cs, key="ctx",
                                       count_col="cs", out_col="_cs")

    def pmi_fn(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        r = batch.column("_rs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c = batch.column("_cs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pmi = np.round(np.log(n / r / (c / float(n_total))), 6)
        return (batch.drop_columns(["_rs", "_cs"])
                .append_column("pmi", pa.array(pmi, pa.float64())))

    return with_cs.map_batches(pmi_fn, batch_format="pyarrow")


def lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
             strategy: str = "broadcast",
             vocab_broadcast_max: int = 20_000_000,
             vocab_broadcast_max_bytes: int = 512 << 20):
    """Unigram LM quality score — the CCNet-style perplexity filter in
    its simplest deterministic form: per document, the mean (over token
    occurrences) of ``ln((c(t)+1) / (N+V))`` where ``c`` are corpus-wide
    token counts, ``N`` total tokens, ``V`` vocabulary size (add-one
    smoothing).  Low scores flag gibberish / far-out-of-distribution
    docs; the self-scored corpus has no OOV tokens by construction.

    Two-pass shape: one bucketed aggregate for the counts, then either a
    broadcast log-prob table probed per batch (default; vocabulary
    row+byte gated) or, above the gate, a bucketed hash join of the
    (doc, term, tf) rows with the count table followed by a weighted
    per-doc aggregate (``strategy="join"`` — the open-web vocabulary
    path).  Token-less docs are excluded (mirrors the SQL GROUP BY).
    """
    import ray

    from ..functions.shuffle import grouped_aggregate

    def tok_counts(batch: pa.Table) -> pa.Table:
        toks, _ = flat_tokens(batch.column(text_col))
        agg = (pa.table({"term": toks})
               .group_by("term").aggregate([("term", "count")]))
        return pa.table({"term": agg.column("term"),
                         "n": pc.cast(agg.column("term_count"),
                                      pa.int64())})

    counts = grouped_aggregate(
        ds.map_batches(tok_counts, batch_format="pyarrow"),
        keys=["term"], specs=[("n", "sum")], rename={"n_sum": "n"}
    ).materialize()
    v = counts.count()
    n_total = int(counts.sum("n") or 0)
    denom = float(n_total + v)

    if (strategy == "broadcast" and v <= vocab_broadcast_max
            and (counts.size_bytes() or 0) <= vocab_broadcast_max_bytes):
        from .dedup import _build_dict, _cached_get, _worker_side

        ref = _worker_side(_build_dict, counts, "term", "n")

        def score(batch: pa.Table) -> pa.Table:
            import pandas as pd
            cmap = _cached_get(ref)
            n = batch.num_rows
            toks, rows = flat_tokens(batch.column(text_col))
            if len(toks) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "lm_score": pa.array([], pa.float64())})
            # per-(doc, term) tf — keeps the scalar form's tf·log(...)
            # op order so values round identically
            per_doc = (pa.table({"_r": pa.array(rows, pa.int64()),
                                 "term": toks})
                       .group_by(["_r", "term"])
                       .aggregate([("term", "count")]))
            c = (pd.Series(per_doc.column("term").to_pandas())
                 .map(cmap).to_numpy(dtype=np.float64))
            tf = per_doc.column("term_count").to_numpy().astype(np.float64)
            w = tf * np.log((c + 1) / denom)
            r = per_doc.column("_r").to_numpy()
            sums = np.bincount(r, weights=w, minlength=n)
            lens = np.bincount(rows, minlength=n)
            keep = lens > 0
            ids = pc.cast(batch.column(id_col), pa.int64()) \
                .to_numpy(zero_copy_only=False)[keep]
            scores = np.round(sums[keep] / lens[keep], 6)
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "lm_score": pa.array(scores, pa.float64())})

        return ds.map_batches(score, batch_format="pyarrow")

    # vocabulary-scale path: (doc, term, tf) rows join the counts
    from ..functions.join import bucketed_hash_join

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks, rows = flat_tokens(batch.column(text_col))
        if len(toks) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        per_doc = (pa.table({"_r": pa.array(rows, pa.int64()),
                             "term": toks})
                   .group_by(["_r", "term"]).aggregate([("term", "count")]))
        ids = pc.cast(batch.column(id_col), pa.int64()) \
            .take(per_doc.column("_r"))
        return pa.table({id_col: ids, "term": per_doc.column("term"),
                         "tf": pc.cast(per_doc.column("term_count"),
                                       pa.int64())})

    joined = bucketed_hash_join(
        ds.map_batches(tf_rows, batch_format="pyarrow"), counts,
        left_on="term", right_on="term")

    def weighted(batch: pa.Table) -> pa.Table:
        tf = pc.cast(batch.column("tf"), pa.float64())
        lp = pc.ln(pc.divide(
            pc.cast(pc.add(batch.column("n"), 1), pa.float64()), denom))
        return pa.table({id_col: batch.column(id_col),
                         "_w": pc.multiply(tf, lp), "_n": batch.column("tf")})

    agg = grouped_aggregate(
        joined.map_batches(weighted, batch_format="pyarrow"),
        keys=[id_col], specs=[("_w", "sum"), ("_n", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        s = pc.round(pc.divide(batch.column("_w_sum"),
                               pc.cast(batch.column("_n_sum"),
                                       pa.float64())), 6)
        return pa.table({id_col: batch.column(id_col), "lm_score": s})

    return agg.map_batches(finish, batch_format="pyarrow")


def bm25_scores(ds, query_terms: list[str], k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id", per_doc: bool = False):
    """Okapi BM25 retrieval scoring of the corpus against a bounded
    query-term list — the ranking operator a training-data pipeline
    uses to pull topical subsets out of a crawl (pair with
    ``grouped_topk`` for per-query top-k).

    Default output is one row per (document, matched term):
    ``(doc_id, term, tf, dl, bm25)`` where ``bm25`` is that term's
    contribution ``idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with the Robertson–Sparck-Jones smoothed idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``.  Per-row values are a single
    float expression over exact integers, so they are bit-reproducible
    against a SQL oracle; ``per_doc=True`` sums a document's term rows
    into ``(doc_id, bm25)`` (float-sum order is then engine-defined —
    compare with a tolerance, not a hash).

    Scale shape (100-TB-safe): the query list is request-bounded
    (≤ dozens of terms) and rides the task closure; the corpus streams
    through TWO projected passes — a tiny per-batch ``(Σdl, #docs)``
    partial for ``avgdl``/``N``, and a filtered tf/dl extraction whose
    output is |docs containing a query term| rows (corpus-scale
    reduction happens map-side; tf is final per batch because one
    document is wholly contained in one row).  ``df`` per term is a
    ≤|q|-row aggregate over the matched rows — the only exchange, and
    it is query-bounded, not corpus-bounded.  Nothing corpus-shaped
    ever lands on the driver."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    from ..functions.shuffle import grouped_aggregate

    q_arr = pa.array(sorted(set(query_terms)), pa.string())

    def dl_partial(batch: pa.Table) -> pa.Table:
        toks, _ = flat_tokens(batch.column(text_col))
        return pa.table({"dl_sum": pa.array([len(toks)], pa.int64()),
                         "docs": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(dl_partial, batch_format="pyarrow")
    total_dl = int(parts.sum("dl_sum") or 0)
    n_docs = int(parts.sum("docs") or 0)
    if n_docs == 0:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "dl": pa.array([], pa.int64()),
                          "bm25": pa.array([], pa.float64())})
        import ray.data
        return ray.data.from_arrow(empty)
    avgdl = total_dl / n_docs      # exact-int / exact-int, as in SQL

    def matched_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "dl": pa.array([], pa.int64())})
        toks, rows = flat_tokens(batch.column(text_col))
        if len(toks) == 0:
            return empty
        dl = np.bincount(rows, minlength=batch.num_rows)
        qmask = pc.is_in(toks, value_set=q_arr) \
            .to_numpy(zero_copy_only=False)
        if not qmask.any():
            return empty
        per = (pa.table({"_r": pa.array(rows[qmask], pa.int64()),
                         "term": toks.filter(pa.array(qmask))})
               .group_by(["_r", "term"]).aggregate([("term", "count")]))
        r = per.column("_r").to_numpy()
        ids = pc.cast(batch.column(id_col), pa.int64()) \
            .take(per.column("_r"))
        return pa.table({id_col: ids, "term": per.column("term"),
                         "tf": pc.cast(per.column("term_count"), pa.int64()),
                         "dl": pa.array(dl[r].astype(np.int64), pa.int64())})

    matched = ds.map_batches(matched_rows,
                             batch_format="pyarrow").materialize()
    df_tbl = grouped_aggregate(matched.select_columns(["term"]),
                               keys=["term"], specs=[("term", "count")],
                               rename={"term_count": "df"})
    # ≤ |query_terms| rows by construction — bounded driver pull
    df_map = {r["term"]: float(r["df"]) for r in df_tbl.take_all()}
    idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for t, df in df_map.items()}

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd
        if batch.num_rows == 0:
            return batch.append_column("bm25", pa.array([], pa.float64()))
        tf = batch.column("tf").to_numpy().astype(np.float64)
        dl = batch.column("dl").to_numpy().astype(np.float64)
        iv = (pd.Series(batch.column("term").to_pandas())
              .map(idf).to_numpy(dtype=np.float64))
        # op tree mirrors the SQL oracle exactly (bit-reproducible)
        s = np.round(iv * ((tf * (k1 + 1.0))
                           / (tf + k1 * (1.0 - b + b * (dl / avgdl)))), 6)
        return batch.append_column("bm25", pa.array(s, pa.float64()))

    scored = matched.map_batches(score, batch_format="pyarrow")
    if not per_doc:
        return scored

    def contrib(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col),
                         "bm25": batch.column("bm25")})

    agg = grouped_aggregate(
        scored.map_batches(contrib, batch_format="pyarrow"),
        keys=[id_col], specs=[("bm25", "sum")], rename={"bm25_sum": "bm25"})

    def round6(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("bm25"), "bm25",
            pc.round(batch.column("bm25"), 6))

    return agg.map_batches(round6, batch_format="pyarrow")


def heavy_hitters(ds, k: int = 20, counters: int = 4096,
                  text_col: str = "text", strategy: str = "auto",
                  cand_broadcast_max: int = 20_000_000,
                  cand_broadcast_max_bytes: int = 512 << 20):
    """Exact top-k most frequent terms via the two-pass
    sketch-candidates-then-recount pattern — the skewed-vocabulary move
    at corpus scale.  A naive top-k shuffles the FULL vocabulary
    (``term_counts`` + sort); this version exchanges only candidate
    terms.

    Pass 1 streams the corpus once and keeps, per batch, the terms
    with batch count ≥ batch_tokens/``counters`` — the Misra–Gries
    survival bound: by pigeonhole, any term with GLOBAL frequency
    ≥ total_tokens/``counters`` clears that bar in at least one batch,
    so the candidate union (≤ ``counters`` terms per batch) is a
    superset of every possible top-k member whenever the k-th true
    frequency ≥ N/``counters`` (pick ``counters`` ≫ N/freq_k; with the
    default 4096 that is any term above 0.025% of tokens).  Small
    batches degrade gracefully — the bar drops below 1 and the batch
    contributes its whole (batch-bounded) vocabulary; the row+byte
    gate then routes to the join path instead of a fat broadcast.

    Pass 2 recounts ONLY the candidates exactly (per-batch aggregate →
    worker-built broadcast set probe, or a bucketed semi-join above
    the gate) and finishes with a candidate-bounded aggregate + top-k
    sort.  Output: ``(term, freq)``, frequency-desc / term-asc."""
    from ..functions.shuffle import grouped_aggregate

    def survivors(batch: pa.Table) -> pa.Table:
        toks, _ = flat_tokens(batch.column(text_col))
        if len(toks) == 0:
            return pa.table({"term": pa.array([], pa.string())})
        vc = (pa.table({"term": toks})
              .group_by("term").aggregate([("term", "count")]))
        bar = len(toks) / counters
        keep = pc.greater_equal(
            pc.cast(vc.column("term_count"), pa.float64()), bar)
        return pa.table({"term": vc.column("term").filter(keep)})

    cands = grouped_aggregate(
        ds.map_batches(survivors, batch_format="pyarrow"),
        keys=["term"], specs=[("term", "count")]
    ).select_columns(["term"]).materialize()

    def partials(batch: pa.Table) -> pa.Table:
        toks, _ = flat_tokens(batch.column(text_col))
        if len(toks) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = (pa.table({"term": toks})
              .group_by("term").aggregate([("term", "count")]))
        return pa.table({"term": vc.column("term"),
                         "n": pc.cast(vc.column("term_count"), pa.int64())})

    if strategy == "auto":
        strategy = ("broadcast"
                    if (cands.count() <= cand_broadcast_max
                        and (cands.size_bytes() or 0)
                        <= cand_broadcast_max_bytes)
                    else "join")
    if strategy == "broadcast":
        from .dedup import _build_frozenset, _cached_get, _worker_side

        ref = _worker_side(_build_frozenset, cands, "term")

        def recount(batch: pa.Table) -> pa.Table:
            t = partials(batch)
            if t.num_rows == 0:
                return t
            cs = _cached_get(ref)
            # probe per DISTINCT batch term (batch-vocab-bounded)
            hit = np.fromiter((x in cs for x in
                               t.column("term").to_pylist()),
                              dtype=bool, count=t.num_rows)
            return t.filter(pa.array(hit))

        counted = grouped_aggregate(
            ds.map_batches(recount, batch_format="pyarrow"),
            keys=["term"], specs=[("n", "sum")], rename={"n_sum": "freq"})
    else:
        from ..functions.join import bucketed_hash_join

        joined = bucketed_hash_join(
            ds.map_batches(partials, batch_format="pyarrow"), cands,
            left_on="term", right_on="term")
        counted = grouped_aggregate(
            joined, keys=["term"], specs=[("n", "sum")],
            rename={"n_sum": "freq"})

    return counted.sort(["freq", "term"],
                        descending=[True, False]).limit(k)
