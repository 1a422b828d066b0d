"""Text-analysis stages over a document/turn text column: token counts,
term counts (G4 analog with the reference's stoplist), quality scoring,
language-ID heuristic, document fingerprinting.

All stages are vectorized per batch (pandas str kernels / Counter over a
batch) and pre-aggregate before any shuffle.  The simple-token variants
(lowercase ``[a-z]+`` tokens) are deliberately SQL-expressible so the
DuckDB oracle can check them exactly (TermCounter semantics live in
pipelines/terms.py over annotations instead).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow as pa

from ..config import TERM_STOPWORDS

_WORD_RE = re.compile(r"[a-z]+")
_WS_RE = re.compile(r"\s+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "por", "con"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "du", "est", "pas"},
}


def term_count_partials(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Per-batch combiner → (term, freq, doc_freq) partial rows.
    Term = lowercase alphabetic token, len > 1, not a stopword
    (TermCounter.java:36-45 stoplist).  Safe because one document is
    wholly contained in one row."""
    freq: Counter = Counter()
    doc_freq: Counter = Counter()
    for text in batch.column(text_col).to_pylist():
        toks = [t for t in _WORD_RE.findall((text or "").lower())
                if len(t) > 1 and t not in TERM_STOPWORDS]
        freq.update(toks)
        doc_freq.update(set(toks))
    terms = list(freq.keys())
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "freq": pa.array([freq[t] for t in terms], pa.int64()),
        "doc_freq": pa.array([doc_freq[t] for t in terms], pa.int64()),
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


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document token counting + quality signals: n_tokens,
    n_stopwords, n_chars_norm (whitespace-collapsed length)."""
    n_tokens, n_stop, n_chars = [], [], []
    for text in batch.column(text_col).to_pylist():
        toks = _WORD_RE.findall((text or "").lower())
        n_tokens.append(len(toks))
        n_stop.append(sum(1 for t in toks if t in TERM_STOPWORDS))
        n_chars.append(len(_WS_RE.sub(" ", (text or "").strip())))
    return (batch.select([c for c in (batch.column_names) if c in ("doc_id", "conv_id", "turn_idx")])
            .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
            .append_column("n_stopwords", pa.array(n_stop, pa.int64()))
            .append_column("n_chars_norm", pa.array(n_chars, pa.int64())))


def _tf_rows(ds, text_col: str, id_col: str):
    """Per-(doc, term) raw term-frequency rows."""
    def tf_batch(batch: pa.Table) -> pa.Table:
        ids_out, terms_out, tf_out = [], [], []
        for doc_id, text in zip(batch.column(id_col).to_pylist(),
                                batch.column(text_col).to_pylist()):
            local: Counter = Counter(
                t for t in _WORD_RE.findall((text or "").lower())
                if len(t) > 1 and t not in TERM_STOPWORDS)
            for t, tf in local.items():
                ids_out.append(doc_id)
                terms_out.append(t)
                tf_out.append(tf)
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "term": pa.array(terms_out, pa.string()),
            "tf": pa.array(tf_out, pa.int64()),
        })

    return ds.map_batches(tf_batch, batch_format="pyarrow")


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
    import math

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
        df_map = _cached_get(df_ref)
        ids_out, terms_out, tf_out, score_out = [], [], [], []
        for doc_id, text in zip(batch.column(id_col).to_pylist(),
                                batch.column(text_col).to_pylist()):
            local: Counter = Counter(
                t for t in _WORD_RE.findall((text or "").lower())
                if len(t) > 1 and t not in TERM_STOPWORDS)
            for t, tf in local.items():
                ids_out.append(doc_id)
                terms_out.append(t)
                tf_out.append(tf)
                score_out.append(round(tf * math.log(n_docs / df_map[t]), 6))
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "term": pa.array(terms_out, pa.string()),
            "tf": pa.array(tf_out, pa.int64()),
            "tfidf": pa.array(score_out, pa.float64()),
        })

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
    """Length / punctuation / stopword-ratio quality score in [0,1]."""
    ids = batch.column("doc_id")
    scores = []
    for text in batch.column(text_col).to_pylist():
        text = text or ""
        toks = _WORD_RE.findall(text.lower())
        if not toks:
            scores.append(0.0)
            continue
        stop_ratio = sum(1 for t in toks if t in TERM_STOPWORDS) / len(toks)
        punct_ratio = sum(1 for c in text if not c.isalnum() and not c.isspace()) / max(len(text), 1)
        length_ok = 1.0 if 10 <= len(toks) <= 10000 else 0.5
        score = length_ok * (1 - punct_ratio) * (0.5 + 0.5 * min(stop_ratio * 4, 1.0))
        scores.append(round(score, 6))
    return pa.table({"doc_id": ids,
                     "quality": pa.array(scores, pa.float64())})


class LangId:
    """Stopword-profile language ID (actor stage; profiles compiled once).
    Returns the argmax profile or 'und' when nothing matches."""

    def __init__(self):
        self.profiles = _LANG_PROFILES

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch.column("text").to_pylist():
            toks = set(_WORD_RE.findall((text or "").lower()))
            best, best_n = "und", 0
            for lang in sorted(self.profiles):
                n = len(toks & self.profiles[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_pred": pa.array(preds, pa.string())})


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic document fingerprint: md5 of the
    lowercase/whitespace-collapsed text (SQL-checkable in DuckDB)."""
    fps = []
    for text in batch.column(text_col).to_pylist():
        norm = _WS_RE.sub(" ", (text or "").lower().strip())
        fps.append(hashlib.md5(norm.encode()).hexdigest())
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fp": pa.array(fps, pa.string())})


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition metrics (the "repetition
    removal" quality filter of large-scale LLM data pipelines):
    duplicate-word fraction and duplicate-2-gram fraction per document.

    Tokens are literal single-space splits so the metric is
    reproducible in ANSI SQL (``string_split(text, ' ')``); the per-doc
    kernel is C-level set construction, same shape as quality_score."""
    ids = batch.column("doc_id")
    n_words, dupw, dup2 = [], [], []
    for text in batch.column(text_col).to_pylist():
        w = (text or "").split(" ")
        n = len(w)
        n_words.append(n)
        dupw.append(1.0 - len(set(w)) / n if n else 0.0)
        dup2.append(1.0 - len(set(zip(w, w[1:]))) / (n - 1)
                    if n > 1 else 0.0)
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
    import math

    import pyarrow.compute as pc

    import ray

    from ..functions.shuffle import grouped_aggregate

    def tok_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column(text_col).to_pylist():
            c.update(_WORD_RE.findall((text or "").lower()))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

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
            cmap = _cached_get(ref)
            ids, scores = [], []
            for did, text in zip(batch.column(id_col).to_pylist(),
                                 batch.column(text_col).to_pylist()):
                toks = _WORD_RE.findall((text or "").lower())
                if not toks:
                    continue
                local: Counter = Counter(toks)
                s = sum(tf * math.log((cmap[t] + 1) / denom)
                        for t, tf in local.items())
                ids.append(did)
                scores.append(round(s / len(toks), 6))
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "lm_score": pa.array(scores, pa.float64())})

        return ds.map_batches(score, batch_format="pyarrow")

    # vocabulary-scale path: (doc, term, tf) rows join the counts
    from ..functions.join import bucketed_hash_join

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for did, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            for t, tf in Counter(
                    _WORD_RE.findall((text or "").lower())).items():
                ids.append(did)
                terms.append(t)
                tfs.append(tf)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

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
