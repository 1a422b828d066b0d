"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline; ``queries()`` exposes one
callable per implemented operator family from SURVEY.md §2; the matching
``oracle_sql()`` entries let the driver check them against DuckDB on the
same parquet tables.  Ray is initialised by the driver — nothing here
calls ``ray.init()``/``ray.shutdown()``.

Column names are identical between each queries() result and its oracle
SQL (the driver hashes values under sorted column names); float scores
are rounded to 6 decimals on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ice_ray.config import TERM_STOPWORDS

_SW = ", ".join(f"'{w}'" for w in sorted(TERM_STOPWORDS))
_TOK = "regexp_extract_all(lower(text), '[a-z]+')"


def _docs(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def _round_col(ds, col: str, digits: int = 6):
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, pc.round(batch.column(col), digits))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------- queries

def _q_term_counts(sf_dir: str):
    from ice_ray.stages.textstats import term_counts
    return term_counts(_docs(sf_dir))


def _q_term_ratio(sf_dir: str):
    """Foreground (source='src0') vs background doc-frequency ratio
    (utils/Ratio.java:44-50 add-one semantics; J1/J2/F5).  The background
    vocabulary rides the gated broadcast / bucketed-left-join shape of
    ``attach_background_counts`` — never an un-gated driver dict."""
    import numpy as np
    import pyarrow as pa

    from ice_ray.functions.join import attach_background_counts
    from ice_ray.stages.textstats import term_counts

    docs = _docs(sf_dir)
    fg = term_counts(docs.filter(expr="source == 'src0'"))
    bg = term_counts(docs.filter(expr="source != 'src0'"))
    with_bg = attach_background_counts(fg, bg, key="term",
                                       count_col="doc_freq", out_col="_bg")

    def scorer(batch: pa.Table) -> pa.Table:
        f1 = batch.column("doc_freq").to_numpy(zero_copy_only=False) \
            .astype(np.float64) + 1
        f2 = batch.column("_bg").to_numpy(zero_copy_only=False) + 1
        score = np.round(f1 / f2 * np.log(f1), 6)
        return pa.table({
            "term": batch.column("term"),
            "fg_df": pa.compute.cast(batch.column("doc_freq"), pa.int64()),
            "score": pa.array(score, pa.float64()),
        })

    return with_bg.map_batches(scorer, batch_format="pyarrow")


def _q_top_terms(sf_dir: str):
    from ice_ray.stages.textstats import term_counts
    return (term_counts(_docs(sf_dir))
            .sort(["freq", "term"], descending=[True, False]).limit(40))


def _q_doc_dedup_exact(sf_dir: str):
    from ice_ray.stages.dedup import exact_dedup_groups
    return exact_dedup_groups(_docs(sf_dir))


def _q_doc_fingerprint(sf_dir: str):
    from ice_ray.stages.textstats import fingerprint
    return _docs(sf_dir).map_batches(fingerprint, batch_format="pyarrow")


def _q_token_stats(sf_dir: str):
    from ice_ray.stages.textstats import token_stats
    return _docs(sf_dir).map_batches(token_stats, batch_format="pyarrow")


def _q_tfidf(sf_dir: str):
    from ice_ray.stages.textstats import tfidf_scores
    return tfidf_scores(_docs(sf_dir))


# fixed retrieval query for the BM25 oracle — terms present at every sf
BM25_QUERY_TERMS = ["column", "join", "merge", "scan"]


def _q_bm25(sf_dir: str):
    """Okapi BM25 per-(doc, term) retrieval scoring against a fixed
    query-term list (stages/textstats.py:bm25_scores — two projected
    corpus passes, query-bounded df exchange, no corpus-wide shuffle)."""
    from ice_ray.stages.textstats import bm25_scores
    return bm25_scores(_docs(sf_dir), BM25_QUERY_TERMS)


def _q_heavy_hitters(sf_dir: str):
    """Exact top-20 terms via two-pass sketch-candidates + recount
    (stages/textstats.py:heavy_hitters — only candidate terms are
    exchanged, never the full vocabulary)."""
    from ice_ray.stages.textstats import heavy_hitters
    return heavy_hitters(_docs(sf_dir), k=20)


def _q_event_band_join(sf_dir: str):
    """Range (band) join — every ordered event pair ≤ 60s apart
    (functions/join.py:band_join — tile-replicated bucketed exchange,
    searchsorted slices per reduce group; no cross join, left ≤ 2×)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from ice_ray.functions.join import band_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts"])
    joined = band_join(ev, ev, "ts", "ts",
                       lower_us=1, upper_us=60_000_000)

    def finish(batch: pa.Table) -> pa.Table:
        gap = pc.subtract(pc.cast(batch.column("ts_r"), pa.int64()),
                          pc.cast(batch.column("ts"), pa.int64()))
        return pa.table({"event_id": batch.column("event_id"),
                         "event_id_r": batch.column("event_id_r"),
                         "gap_us": gap})

    return joined.map_batches(finish, batch_format="pyarrow")


def _q_approx_distinct_users(sf_dir: str):
    """HLL sketch distinct-count (mergeable-sketch aggregate pattern)."""
    import pandas as pd

    from ice_ray.functions.sketches import approx_distinct
    est = approx_distinct(_events(sf_dir), "user_id")
    return pd.DataFrame({"approx_distinct_users": [round(est)]})


def _q_lang_counts(sf_dir: str):
    from ice_ray.pipelines.relations import key_counts
    return key_counts(_docs(sf_dir), "lang", alias="n")


def _q_events_hourly(sf_dir: str):
    from ice_ray.stages.windows import hourly_counts
    return _round_col(hourly_counts(_events(sf_dir)), "value_sum", 2)


def _q_sessions(sf_dir: str):
    from ice_ray.stages.windows import sessionize
    return sessionize(_events(sf_dir))


def _q_top_users(sf_dir: str):
    from ice_ray.stages.windows import top_users_by_value
    return top_users_by_value(_events(sf_dir), k=10)


def _q_knn_cosine(sf_dir: str):
    import ray.data
    from ice_ray.stages.similarity import centroid_of_label, knn_to_vector
    # two passes (centroid, then scoring) → materialize the read once
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()
    centroid = centroid_of_label(emb, label=0)
    return knn_to_vector(emb, centroid, k=10)


def _q_customer_nation(sf_dir: str):
    """Broadcast small-side lookup join (J1-class): customers per nation
    name, no shuffle join — nation is read once and shipped via ray.put."""
    import pyarrow as pa

    import ray
    import ray.data

    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nmap_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def add_name(batch: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)
        names = [nmap.get(k) for k in batch.column("c_nationkey").to_pylist()]
        g = (pa.table({"n_name": pa.array(names, pa.string())})
             .group_by(["n_name"]).aggregate([("n_name", "count")]))
        return g.rename_columns(["n_name", "n"])

    from ice_ray.functions.shuffle import grouped_aggregate

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_nationkey"])
    return grouped_aggregate(
        cust.map_batches(add_name, batch_format="pyarrow"),
        keys=["n_name"], specs=[("n", "sum")], rename={"n_sum": "n_customers"})


def _q_orders_by_status(sf_dir: str):
    import pyarrow as pa

    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderstatus"]).aggregate(
            [("o_totalprice", "sum"), ("o_orderkey", "count")])
        return g.rename_columns(["o_orderstatus", "v", "n"])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderstatus", "o_totalprice", "o_orderkey"])
    from ice_ray.functions.shuffle import grouped_aggregate

    agg = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        keys=["o_orderstatus"], specs=[("n", "sum"), ("v", "sum")],
        rename={"n_sum": "n_orders", "v_sum": "total_price"})
    return _round_col(agg, "total_price", 2)


def _q_orders_by_segment(sf_dir: str):
    """Two-large-sides partitioned hash join (guide's portable pattern):
    orders ⋈ customer on custkey, then count per market segment."""
    import ray.data
    from ice_ray.functions.join import bucketed_hash_join
    from ice_ray.pipelines.relations import key_counts

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    joined = bucketed_hash_join(orders, cust, "o_custkey", "c_custkey")
    return key_counts(joined, "c_mktsegment", alias="n_orders")


def _q_events_sliding(sf_dir: str):
    """Sliding 60-min window, 15-min slide, per event_type (explode +
    partial counts per batch, one bucketed aggregate)."""
    from ice_ray.stages.windows import sliding_counts
    return _round_col(sliding_counts(_events(sf_dir), 60, 15), "value_sum", 2)


def _q_neardup_clusters(sf_dir: str):
    """Connected components over MinHash near-dup pairs (cluster label =
    min doc_id of the component)."""
    from ice_ray.stages.dedup import minhash_neardup_pairs, neardup_clusters
    return neardup_clusters(minhash_neardup_pairs(_docs(sf_dir), threshold=0.5))


def _q_knn_multi(sf_dir: str):
    """Multi-query exact top-k (per-batch partial top-k + driver merge);
    queries = the vectors with vec_id 0, 1, 2."""
    import numpy as np

    import ray.data
    from ice_ray.stages.similarity import knn_multi_query

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()
    qdf = (emb.filter(expr="vec_id in [0, 1, 2]").to_pandas()
           .sort_values("vec_id"))
    queries = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    return knn_multi_query(emb, queries, k=5)


def _q_events_last_order(sf_dir: str):
    """Backward as-of join (custom operator: Ray Data has none): each
    event picks the same customer's latest order-day summary at or
    before the event time — bucket-by-key + per-bucket merge_asof
    (functions/join.py:asof_join; one key's rows co-locate per bucket)."""
    import pyarrow as pa

    import ray.data
    from ice_ray.functions.join import asof_join
    from ice_ray.functions.shuffle import grouped_aggregate

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"])
    # deterministic right side: per (customer, order day) summary
    day = grouped_aggregate(
        orders, keys=["o_custkey", "o_orderdate"],
        specs=[("o_orderkey", "max"), ("o_orderkey", "count")],
        rename={"o_orderkey_max": "last_orderkey",
                "o_orderkey_count": "n_orders_day"})
    day = day.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "o_orderdate", "last_orderkey", "n_orders_day"]),
        batch_format="pyarrow")
    return asof_join(events, day, on="user_id",
                     left_ts="ts", right_ts="o_orderdate")


def _q_term_pmi(sf_dir: str):
    """PMI of adjacent-token (term, ctx) pairs — the two-stage PMI
    computation of G6 (EntitySetIndexer.java:297-343): vectorized pair
    partials → bucketed aggregate → gated marginal attach (one-task
    broadcast under the gate, bucketed exchange above it) — see
    stages/textstats.adjacent_pair_pmi."""
    import ray.data

    from ice_ray.stages.textstats import adjacent_pair_pmi

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return adjacent_pair_pmi(docs)


# --- transcript/KG operators (rows-only driver check; the P/R harness in
#     tests/test_kg_pipeline.py is the correctness gate for these) ---

def _synth_transcripts(n_turns: int = 3000):
    import ray.data
    from ice_ray.sources.transcripts import generate_transcripts
    tr, _ = generate_transcripts(n_turns, seed=42)
    return ray.data.from_arrow(tr)


def _q_kg_edges(sf_dir: str):
    from ice_ray.pipelines.kg import build_kg
    return build_kg(_synth_transcripts()).sort(["subj", "pred", "obj"])


def _q_path_type_counts(sf_dir: str):
    from ice_ray.pipelines.kg import extract_paths
    from ice_ray.pipelines.relations import path_type_counts
    return path_type_counts(extract_paths(_synth_transcripts()))


def _q_bootstrap_candidates(sf_dir: str):
    """Shared-argument bootstrap from the lives-in seed path (J3/C5)."""
    from ice_ray.pipelines.bootstrap import bootstrap_shared_args
    from ice_ray.pipelines.kg import extract_paths
    paths = extract_paths(_synth_transcripts(2000)).materialize()
    out = bootstrap_shared_args(paths, ["nsubj-1:live:prep:in:pobj"],
                                min_shared=2)
    import pandas as pd
    return out if out is not None else pd.DataFrame(
        {"path": [], "n_shared_pairs": [], "score": []})


def _q_annotations(sf_dir: str):
    """Annotation-cache stage → per-turn fingerprint rows (comparable
    form: nested list-columns hash via canonical md5 on both sides)."""
    import pyarrow as pa

    from ice_ray.oracle import annotation_fingerprint
    from ice_ray.stages.annotator import Annotator

    def to_fp(batch: pa.Table) -> pa.Table:
        sents = batch.column("sentences").to_pylist()
        toks = batch.column("tokens").to_pylist()
        ments = batch.column("mentions").to_pylist()
        deps = batch.column("deps").to_pylist()
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "n_sentences": pa.array([len(x) for x in sents], pa.int64()),
            "n_tokens": pa.array([len(x) for x in toks], pa.int64()),
            "n_mentions": pa.array([len(x) for x in ments], pa.int64()),
            "n_deps": pa.array([len(x) for x in deps], pa.int64()),
            "ann_fp": pa.array(
                [annotation_fingerprint(s, t, m, d)
                 for s, t, m, d in zip(sents, toks, ments, deps)],
                pa.string()),
        })

    return _synth_transcripts(500).map_batches(
        Annotator, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 2)).map_batches(to_fp, batch_format="pyarrow")


def _q_minhash_neardup(sf_dir: str):
    from ice_ray.stages.dedup import minhash_neardup_pairs
    return minhash_neardup_pairs(_docs(sf_dir), threshold=0.5)


def _q_simhash(sf_dir: str):
    from ice_ray.stages.dedup import SimHasher
    return _docs(sf_dir).map_batches(SimHasher(), batch_format="pyarrow")


def _q_quality(sf_dir: str):
    from ice_ray.stages.textstats import quality_score
    return _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow")


def _q_lang_id(sf_dir: str):
    from ice_ray.stages.textstats import LangId
    return _docs(sf_dir).map_batches(LangId(), batch_format="pyarrow")


def _q_tree_counts(sf_dir: str):
    from ice_ray.pipelines.events import extract_trees, tree_type_counts
    return tree_type_counts(extract_trees(_synth_transcripts(1500),
                                          concurrency=(1, 2)))


def _q_events_decoded(sf_dir: str):
    from ice_ray.pipelines.events import decode_events, extract_trees
    return decode_events(extract_trees(_synth_transcripts(1500),
                                       concurrency=(1, 2)))


def _q_event_bootstrap_candidates(sf_dir: str):
    """Event-pattern bootstrap: seed tree signatures → shared-argument
    candidate trees ranked by s/t · s/(s+1)
    (events/EventBootstrap.java:236-409)."""
    from ice_ray.pipelines.events import (
        event_bootstrap_shared_args,
        extract_trees,
    )
    trees = extract_trees(_synth_transcripts(1500), concurrency=(1, 2),
                          emit_args=True)
    return event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"])


def _q_ice_terms(sf_dir: str):
    from ice_ray.pipelines.preprocess import annotate
    from ice_ray.pipelines.terms import ice_term_counts
    return ice_term_counts(annotate(_synth_transcripts(1500)))


def _q_pmi_index(sf_dir: str):
    """PMI index flattened to comparable (term, ctx, pmi) cells."""
    import pyarrow as pa

    from ice_ray.pipelines.entity_index import build_pmi_index
    from ice_ray.pipelines.preprocess import annotate

    idx = build_pmi_index(annotate(_synth_transcripts(1500)))

    def flatten(batch: pa.Table) -> pa.Table:
        terms, ctxs, pmis = [], [], []
        for term, contexts in zip(batch.column("term").to_pylist(),
                                  batch.column("contexts").to_pylist()):
            for c in contexts:
                terms.append(term)
                ctxs.append(c["ctx"])
                pmis.append(round(c["pmi"], 6))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "ctx": pa.array(ctxs, pa.string()),
                         "pmi": pa.array(pmis, pa.float64())})

    return idx.map_batches(flatten, batch_format="pyarrow")


def _q_quality_topk(sf_dir: str):
    """Top-3 documents per language by quality score (grouped top-k:
    per-batch partial top-k per group, no global sort)."""
    import pyarrow as pa

    import ray.data
    from ice_ray.stages.textstats import quality_score
    from ice_ray.stages.windows import grouped_topk

    docs = _docs(sf_dir)

    def score_with_lang(batch: pa.Table) -> pa.Table:
        q = quality_score(batch)
        return q.append_column("lang", batch.column("lang"))

    scored = docs.map_batches(score_with_lang, batch_format="pyarrow")
    return grouped_topk(scored, "lang", "quality", 3, tie_col="doc_id")


def _q_orders_sample(sf_dir: str):
    """Deterministic stratified sample: 5 orders per order status, keyed
    by md5(orderkey) so the SQL oracle reproduces the selection exactly
    (distributed partial top-n per group; no full sort)."""
    import ray.data
    from ice_ray.functions.sampling import stratified_sample_n

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderstatus"])
    return stratified_sample_n(orders, 5, "o_orderstatus", "o_orderkey")


def _q_media_features(sf_dir: str):
    """Multimodal decode → feature pipeline on deterministic inline
    media (PPM/BMP decoded to real pixels; compressed formats fall back
    to the documented digest stub).  Comparable form fingerprints the
    float32 feature bytes."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    import ray.data
    from ice_ray.oracle import media_fixture_rows
    from ice_ray.stages.multimodal import ImageFeatureExtractor

    ds = ray.data.from_items(media_fixture_rows())
    feats = ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                           batch_size=2, concurrency=(1, 2))

    def to_fp(batch: pa.Table) -> pa.Table:
        fps, norms = [], []
        for v in batch.column("embedding").to_pylist():
            f = np.asarray(v, dtype=np.float32)
            fps.append(hashlib.md5(f.tobytes()).hexdigest())
            norms.append(round(float(np.linalg.norm(f)), 6))
        return pa.table({
            "media_id": batch.column("media_id"),
            "decoded": batch.column("decoded"),
            "feat_fp": pa.array(fps, pa.string()),
            "feat_norm": pa.array(norms, pa.float64()),
        })

    return feats.map_batches(to_fp, batch_format="pyarrow")


def _q_media_cross_format_dups(sf_dir: str):
    """Cross-format image deduplication end-to-end: decode real
    PPM/PNG/GIF/JPEG payloads of 10 base images (ImageFeatureExtractor
    actor pool), then embedding-cosine near-dup over the pixel-derived
    features (hyperplane-LSH candidate buckets + exact per-bucket
    verification).  The gold (ice_ray/oracle.py) finds pairs with an
    INDEPENDENT algorithm — brute-force full cosine matrix, no LSH.
    ``n_planes=2`` suits the 34-vector fixture (few planes → near-zero
    LSH miss probability; production tables raise it for bucket
    selectivity)."""
    import pyarrow as pa

    import ray.data
    from ice_ray.oracle import media_dedup_fixture_rows
    from ice_ray.stages.multimodal import ImageFeatureExtractor
    from ice_ray.stages.similarity import embedding_neardup_pairs

    ds = ray.data.from_items(media_dedup_fixture_rows())
    feats = ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                           batch_size=8, concurrency=(1, 2))

    def to_vec(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch.column("media_id"),
                         "embedding": batch.column("embedding")})

    vecs = feats.map_batches(to_vec, batch_format="pyarrow")
    pairs = embedding_neardup_pairs(vecs, threshold=0.995, n_planes=2)
    return pairs.drop_columns(["truncated"])


def _q_audio_features(sf_dir: str):
    """REAL audio decode → spectral features on deterministic inline WAV
    payloads (16-bit mono sine, 8-bit stereo two-tone) plus a
    compressed-format stub.  Gold is an INDEPENDENT implementation
    (stdlib ``wave`` parser + explicit DFT, ice_ray/oracle.py
    gold_audio_features); features rounded to 4 decimals on both sides
    to erase last-ulp differences between the two spectral algorithms."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    import ray.data
    from ice_ray.oracle import audio_fixture_rows
    from ice_ray.stages.multimodal import AudioFeatureExtractor

    ds = ray.data.from_items(audio_fixture_rows())
    feats = ds.map_batches(AudioFeatureExtractor, batch_format="pyarrow",
                           batch_size=2, concurrency=(1, 2))

    def to_fp(batch: pa.Table) -> pa.Table:
        fps, norms = [], []
        for v in batch.column("embedding").to_pylist():
            f = np.asarray(v, dtype=np.float32)
            fr = np.round(f.astype(np.float64), 4).astype(np.float32)
            fps.append(hashlib.md5(fr.tobytes()).hexdigest())
            norms.append(round(float(np.linalg.norm(f)), 4))
        return pa.table({
            "media_id": batch.column("media_id"),
            "decoded": batch.column("decoded"),
            "duration_ms": pa.compute.cast(batch.column("duration_ms"),
                                           pa.int64()),
            "feat_fp": pa.array(fps, pa.string()),
            "feat_norm": pa.array(norms, pa.float64()),
        })

    return feats.map_batches(to_fp, batch_format="pyarrow")


def _q_soft_decode(sf_dir: str):
    """Embedding-scaled soft decode (J5+F3): the out-of-rule verb
    'resides' is recovered because it is embedding-near 'live'; the
    embedding-far 'shuns' stays out.  Gold is template-derived."""
    import datetime as dt

    import pyarrow as pa

    import ray.data
    from ice_ray.config import PipelineConfig
    from ice_ray.oracle import SOFT_DECODE_EMB, SOFT_DECODE_TURNS
    from ice_ray.pipelines.kg import decode_edges, extract_paths
    from ice_ray.sources.models import DEFAULT_RELATION_RULES

    n = len(SOFT_DECODE_TURNS)
    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array(["soft-0"] * n),
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(SOFT_DECODE_TURNS),
        "tool": pa.array([""] * n),
        "ts": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
    }))
    cfg = PipelineConfig(soft_match=True, soft_threshold=0.3)
    paths = extract_paths(turns, cfg, emit_repr=False)
    return decode_edges(paths, DEFAULT_RELATION_RULES, cfg,
                        embeddings=SOFT_DECODE_EMB)


def _q_path_instance_counts(sf_dir: str):
    from ice_ray.pipelines.kg import extract_paths
    from ice_ray.pipelines.relations import path_instance_counts
    return path_instance_counts(extract_paths(_synth_transcripts(1500)))


def _q_bpe_tokens(sf_dir: str):
    from ice_ray.stages.textstats import bpe_token_stats
    return _docs(sf_dir).map_batches(bpe_token_stats, batch_format="pyarrow")


def _q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dups over the fixture augmented with planted
    exact duplicates (shared deterministic planting with the serial gold
    — the testdata embeddings are isotropic, so without planting the
    oracle row would be a schema-only 0 == 0 check)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data
    from ice_ray.stages.similarity import (
        PLANT_DUP_ID_OFFSET,
        PLANT_DUP_MAX_ID,
        embedding_neardup_pairs,
    )
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def bump(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("vec_id")
        # cast back to the fixture's own id type so union() sees one
        # schema even when vec_id isn't int64 (mirrors plant_neardup_rows)
        bumped = pc.add(pc.cast(t.column("vec_id"), pa.int64()),
                        PLANT_DUP_ID_OFFSET)
        return t.set_column(i, "vec_id",
                            pc.cast(bumped, t.schema.field(i).type))

    dups = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        filter=pc.field("vec_id") < PLANT_DUP_MAX_ID,
    ).map_batches(bump, batch_format="pyarrow")
    df = embedding_neardup_pairs(emb.union(dups), threshold=0.9).to_pandas()
    if df.empty:  # fully-empty map_groups output loses its schema in Ray
        df = pd.DataFrame({"id1": pd.Series(dtype="int64"),
                           "id2": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64"),
                           "truncated": pd.Series(dtype="bool")})
    return df


def _q_knn_lsh(sf_dir: str):
    """LSH-bucketed ANN candidates: bucket ids per vector (scale path)."""
    import ray.data
    from ice_ray.stages.similarity import HyperplaneBucketer
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.take(1)[0]["embedding"])
    return emb.map_batches(
        HyperplaneBucketer(dim=dim),
        batch_format="pyarrow").select_columns(["vec_id", "label", "bucket"])


def _q_doc_repetition(sf_dir: str):
    """Gopher-style within-doc repetition metrics (repetition-removal
    quality filter)."""
    from ice_ray.stages.textstats import repetition_stats
    ds = _docs(sf_dir).map_batches(repetition_stats, batch_format="pyarrow")
    ds = _round_col(ds, "dup_word_frac")
    return _round_col(ds, "dup_2gram_frac")


def _q_cross_doc_ngrams(sf_dir: str):
    """Cross-document 8-gram duplication metrics (exact-substring dedup
    family, join-shaped — no broadcast)."""
    from ice_ray.stages.dedup import cross_doc_ngram_stats
    return _round_col(cross_doc_ngram_stats(_docs(sf_dir), n=8),
                      "shared_frac")


def _q_stratified_sample(sf_dir: str):
    """Deterministic per-source quota sample, 10 docs/source
    (stages/windows.py:stratified_sample — md5-rank grouped_topk;
    exchange bounded to N·groups·batches rows, corpus never shuffles)."""
    import ray.data

    from ice_ray.stages.windows import stratified_sample

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    return stratified_sample(docs, group_col="source", n_per_group=10)


def _q_jaccard_neardup(sf_dir: str):
    """EXACT word-8-gram Jaccard near-duplicate pairs at threshold 0.5
    (stages/dedup.py:jaccard_neardup_pairs — gram-posting inverted
    index with per-doc gram counts carried map-side on the gram rows,
    partial pair aggregation inside each reduce group; two exchanges,
    no joins, nothing corpus-shaped on the driver)."""
    from ice_ray.stages.dedup import jaccard_neardup_pairs
    return jaccard_neardup_pairs(_docs(sf_dir), n=8, threshold=0.5)


def _q_curate_keep(sf_dir: str):
    """Flagship corpus-curation pipeline: quality filter → benchmark
    decontamination → corpus-scoped near-dup removal → sequence packing
    (pipelines/curate.py) — every stage is an already-oracled operator,
    and the composition is checked against a composed SQL oracle."""
    import ray.data

    from ice_ray.pipelines.curate import curate_corpus
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return curate_corpus(docs)


def _q_lm_score(sf_dir: str):
    """Unigram LM quality score (CCNet-style perplexity filter, add-one
    smoothing; stages/textstats.lm_score)."""
    import ray.data

    from ice_ray.stages.textstats import lm_score
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return lm_score(docs)


def _q_doc_dedup_keep(sf_dir: str):
    """The ACTION step of near-dup dedup: the kept doc ids (cluster
    heads + singletons) after MinHash+LSH clustering."""
    import ray.data

    from ice_ray.stages.dedup import (
        dedup_apply,
        minhash_neardup_pairs,
        neardup_clusters,
    )
    docs = _docs(sf_dir)
    clusters = ray.data.from_pandas(
        neardup_clusters(minhash_neardup_pairs(docs, threshold=0.5)))
    return dedup_apply(docs.select_columns(["doc_id"]), clusters)


def _q_pack_sequences(sf_dir: str):
    """Contiguous sequence packing into 2048-token budgets via a
    distributed two-phase prefix sum (stages/packing.py)."""
    import ray.data

    from ice_ray.stages.packing import pack_sequences
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return pack_sequences(docs, budget=2048)


def _q_token_percentiles(sf_dir: str):
    """Exact p50/p90/p99 of per-doc token counts (histogram partials +
    pinned min-v-with-cum≥ceil(p·n) rule, stages/packing.py)."""
    import ray.data

    from ice_ray.stages.packing import _with_ntokens, exact_percentiles
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return exact_percentiles(_with_ntokens(docs, "text", "doc_id"),
                             "n_tokens")


def _q_pii_scrub(sf_dir: str):
    """PII redaction over documents deterministically augmented with
    synthetic contact strings (the base corpus is PII-free, so the
    augmentation — reproduced verbatim in the SQL oracle — gives the
    scrub real matches to count)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ice_ray.stages.textstats import pii_scrub

    def augment(batch: pa.Table) -> pa.Table:
        did = pc.cast(batch.column("doc_id"), pa.string())
        oct_ = pc.cast(pc.bit_wise_and(batch.column("doc_id"), 255),
                       pa.string())
        aug = pc.binary_join_element_wise(
            batch.column("text"), pa.scalar(" contact user"), did,
            pa.scalar("@mail.example.com from 10.0.0."), oct_, "")
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", aug)

    return _docs(sf_dir).map_batches(augment,
                                     batch_format="pyarrow").map_batches(
        pii_scrub, batch_format="pyarrow")


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: training docs sharing any word
    8-gram with the benchmark subset (doc_id % 50 == 0)."""
    from ice_ray.stages.dedup import decontaminate
    return decontaminate(_docs(sf_dir), n=8, bench_mod=50)


def entry() -> Any:
    """Flagship: sf0.001 documents adapted to the transcripts schema,
    unioned with the synthetic template corpus, through the full KG
    pipeline → deduplicated canonical edge Dataset."""
    from ice_ray.pipelines.kg import build_kg
    from ice_ray.sources.adapters import transcripts_from_documents

    docs_turns = transcripts_from_documents("/root/testdata/sf0.001")
    synth = _synth_transcripts(2000)
    return build_kg(docs_turns.union(synth))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "term_counts": _q_term_counts,
        "term_ratio": _q_term_ratio,
        "top_terms": _q_top_terms,
        "doc_dedup_exact": _q_doc_dedup_exact,
        "doc_fingerprint": _q_doc_fingerprint,
        "token_stats": _q_token_stats,
        "lang_counts": _q_lang_counts,
        "tfidf": _q_tfidf,
        "bm25": _q_bm25,
        "heavy_hitters": _q_heavy_hitters,
        "approx_distinct_users": _q_approx_distinct_users,
        "events_hourly": _q_events_hourly,
        "sessions": _q_sessions,
        "top_users": _q_top_users,
        "knn_cosine": _q_knn_cosine,
        "customer_nation": _q_customer_nation,
        "orders_by_status": _q_orders_by_status,
        "orders_by_segment": _q_orders_by_segment,
        "term_pmi": _q_term_pmi,
        "events_last_order": _q_events_last_order,
        "events_sliding": _q_events_sliding,
        "neardup_clusters": _q_neardup_clusters,
        "knn_multi": _q_knn_multi,
        "kg_edges": _q_kg_edges,
        "path_type_counts": _q_path_type_counts,
        "tree_counts": _q_tree_counts,
        "events_decoded": _q_events_decoded,
        "event_bootstrap_candidates": _q_event_bootstrap_candidates,
        "ice_terms": _q_ice_terms,
        "pmi_index": _q_pmi_index,
        "path_instance_counts": _q_path_instance_counts,
        "bpe_tokens": _q_bpe_tokens,
        "embedding_neardup": _q_embedding_neardup,
        "annotations": _q_annotations,
        "bootstrap_candidates": _q_bootstrap_candidates,
        "minhash_neardup": _q_minhash_neardup,
        "simhash": _q_simhash,
        "quality": _q_quality,
        "lang_id": _q_lang_id,
        "knn_lsh": _q_knn_lsh,
        "soft_decode": _q_soft_decode,
        "media_features": _q_media_features,
        "media_cross_format_dups": _q_media_cross_format_dups,
        "audio_features": _q_audio_features,
        "orders_sample": _q_orders_sample,
        "quality_topk": _q_quality_topk,
        "doc_repetition": _q_doc_repetition,
        "decontaminate": _q_decontaminate,
        "pii_scrub": _q_pii_scrub,
        "cross_doc_ngrams": _q_cross_doc_ngrams,
        "jaccard_neardup": _q_jaccard_neardup,
        "event_band_join": _q_event_band_join,
        "stratified_sample": _q_stratified_sample,
        "pack_sequences": _q_pack_sequences,
        "token_percentiles": _q_token_percentiles,
        "doc_dedup_keep": _q_doc_dedup_keep,
        "lm_score": _q_lm_score,
        "curate_keep": _q_curate_keep,
    }


# Gold-parquet oracles (ice_ray/oracle.py): template-derived for
# kg_edges/soft_decode, serial-reference for the rest.  Synthetic-corpus
# golds are scale-independent; docs/events/embeddings golds are keyed by
# input row count so one static SQL string serves every scale factor.
_GOLD = "/root/repo/tests/gold"


def _gold_synth(name: str) -> str:
    return f"SELECT * FROM read_parquet('{_GOLD}/synth/{name}.parquet')"


_KEY_SQL = {
    # content fingerprints matching ice_ray.oracle.docs_fingerprint /
    # emb_fingerprint (row counts collide across scale factors)
    "docs": ("docs_", """substr(md5((SELECT string_agg(length(text)::VARCHAR,
              ',' ORDER BY doc_id) FROM documents)), 1, 8)"""),
    "emb": ("emb_", """substr(md5((SELECT string_agg(label::VARCHAR,
             ',' ORDER BY vec_id) FROM embeddings)), 1, 8)"""),
    "events": ("events", "(SELECT count(*)::VARCHAR FROM events)"),
}


def _gold_keyed(name: str, kind: str) -> str:
    prefix, key_expr = _KEY_SQL[kind]
    return f"""
        SELECT * EXCLUDE (filename)
        FROM read_parquet('{_GOLD}/{prefix}*/{name}.parquet', filename=true)
        WHERE filename LIKE '%/{prefix}' || ({key_expr}) || '/%'
    """


def oracle_sql() -> dict[str, str]:
    return {
        "term_counts": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            SELECT term, count(*)::BIGINT AS freq,
                   count(DISTINCT doc_id)::BIGINT AS doc_freq
            FROM toks WHERE length(term) > 1 AND term NOT IN ({_SW})
            GROUP BY term
        """,
        "term_ratio": f"""
            WITH toks AS (
              SELECT doc_id, source, unnest({_TOK}) AS term FROM documents),
            fg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df FROM toks
                   WHERE source = 'src0' AND length(term) > 1
                     AND term NOT IN ({_SW}) GROUP BY term),
            bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df FROM toks
                   WHERE source <> 'src0' AND length(term) > 1
                     AND term NOT IN ({_SW}) GROUP BY term)
            SELECT fg.term, fg.fg_df,
                   round((fg.fg_df + 1.0) / (coalesce(bg.bg_df, 0) + 1.0)
                         * ln(fg.fg_df + 1.0), 6) AS score
            FROM fg LEFT JOIN bg ON fg.term = bg.term
        """,
        "top_terms": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            f AS (SELECT term, count(*)::BIGINT AS freq,
                         count(DISTINCT doc_id)::BIGINT AS doc_freq
                  FROM toks WHERE length(term) > 1 AND term NOT IN ({_SW})
                  GROUP BY term)
            SELECT * FROM f ORDER BY freq DESC, term LIMIT 40
        """,
        "doc_dedup_exact": """
            SELECT min(doc_id)::BIGINT AS canonical_id,
                   count(*)::BIGINT AS group_size
            FROM (SELECT doc_id,
                         array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') AS norm
                  FROM documents)
            GROUP BY norm
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "token_stats": rf"""
            SELECT doc_id,
                   len({_TOK})::BIGINT AS n_tokens,
                   len(list_filter({_TOK}, t -> t IN ({_SW})))::BIGINT AS n_stopwords,
                   length(trim(regexp_replace(text, '\s+', ' ', 'g')))::BIGINT AS n_chars_norm
            FROM documents
        """,
        "lang_counts": """
            SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
        """,
        "tfidf": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            filt AS (SELECT doc_id, term FROM toks
                     WHERE length(term) > 1 AND term NOT IN ({_SW})),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM filt GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df
                   FROM filt GROUP BY term),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents)
            SELECT tf.doc_id, tf.term, tf.tf,
                   round(tf.tf * ln(n.n / df.df), 6) AS tfidf
            FROM tf JOIN df USING (term), n
        """,
        # op tree mirrors bm25_scores exactly (single float expression
        # over exact integers per row → bit-reproducible round(…, 6))
        "bm25": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl
                   FROM toks GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                             (SELECT count(*) FROM toks)::DOUBLE
                             / (SELECT count(*) FROM documents) AS avgdl),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
                   WHERE term IN ({", ".join(repr(t) for t in BM25_QUERY_TERMS)})
                   GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                   FROM tf GROUP BY term)
            SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
                   round(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * ((tf.tf * (1.2 + 1.0))
                            / (tf.tf + 1.2 * (1.0 - 0.75
                                              + 0.75 * (dl.dl / stats.avgdl)))),
                         6) AS bm25
            FROM tf JOIN dl USING (doc_id) JOIN df USING (term), stats
        """,
        "heavy_hitters": f"""
            WITH toks AS (
              SELECT unnest({_TOK}) AS term FROM documents)
            SELECT term, count(*)::BIGINT AS freq FROM toks
            GROUP BY term ORDER BY freq DESC, term LIMIT 20
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*)::BIGINT AS n, round(sum(value), 2) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "sessions": """
            WITH x AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, sum(new_s)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM x GROUP BY user_id
        """,
        "top_users": """
            SELECT user_id, round(sum(value), 2) AS total_value
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id LIMIT 10
        """,
        "knn_cosine": """
            WITH c AS (
              SELECT list(avg_v ORDER BY idx) AS centroid FROM (
                SELECT idx, avg(v) AS avg_v FROM (
                  SELECT unnest(embedding::DOUBLE[]) AS v,
                         generate_subscripts(embedding, 1) AS idx
                  FROM embeddings WHERE label = 0)
                GROUP BY idx))
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                (SELECT centroid FROM c)), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "customer_nation": """
            SELECT n.n_name, count(*)::BIGINT AS n_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "orders_by_status": """
            SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders GROUP BY o_orderstatus
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "term_pmi": f"""
            WITH toks AS (
              SELECT doc_id, {_TOK} AS arr FROM documents),
            pairs AS (
              SELECT arr[i] AS term, arr[i + 1] AS ctx
              FROM toks, LATERAL unnest(generate_series(1, len(arr) - 1)) AS g(i)),
            pc AS (SELECT term, ctx, count(*)::BIGINT AS n FROM pairs GROUP BY term, ctx),
            rs AS (SELECT term, sum(n) AS r FROM pc GROUP BY term),
            cs AS (SELECT ctx, sum(n) AS c FROM pc GROUP BY ctx),
            tot AS (SELECT sum(n) AS t FROM pc)
            SELECT pc.term, pc.ctx, pc.n,
                   round(ln(pc.n / rs.r / (cs.c / tot.t)), 6) AS pmi
            FROM pc JOIN rs USING (term) JOIN cs USING (ctx), tot
        """,
        "orders_sample": """
            SELECT o_orderkey, o_orderstatus FROM (
              SELECT o_orderkey, o_orderstatus,
                     row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY md5(o_orderkey::VARCHAR), o_orderkey) AS rn
              FROM orders) WHERE rn <= 5
        """,
        "events_sliding": """
            WITH e AS (
              SELECT event_type, value,
                     (epoch_us(ts) // 900000000) * 900000000 AS base
              FROM events),
            x AS (
              SELECT event_type, value,
                     base - i * 900000000 AS wus
              FROM e, LATERAL unnest(generate_series(0, 3)) AS t(i))
            SELECT make_timestamp(wus) AS window_start, event_type,
                   count(*)::BIGINT AS n, round(sum(value), 2) AS value_sum
            FROM x GROUP BY 1, 2
        """,
        "events_last_order": """
            WITH d AS (
              SELECT o_custkey AS user_id, o_orderdate,
                     max(o_orderkey) AS last_orderkey,
                     count(*)::BIGINT AS n_orders_day
              FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, e.ts, d.last_orderkey, d.n_orders_day
            FROM events e ASOF JOIN d
              ON e.user_id = d.user_id AND e.ts >= d.o_orderdate
        """,
        "quality_topk": f"""
            WITH q AS ({_gold_keyed("quality", "docs")}),
            d AS (SELECT doc_id, lang FROM documents)
            SELECT doc_id, quality, lang FROM (
              SELECT q.doc_id, q.quality, d.lang,
                     row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY q.quality DESC, q.doc_id) AS rn
              FROM q JOIN d USING (doc_id)) WHERE rn <= 3
        """,
        "curate_keep": f"""
            WITH q AS ({_gold_keyed("quality", "docs")}),
            words AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            grams AS (
              SELECT doc_id,
                     array_to_string(list_slice(w, i, i + 7), ' ') AS g
              FROM words,
                   LATERAL (SELECT unnest(generate_series(
                       1, greatest(len(w) - 7, 0))) AS i) t),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
            contaminated AS (
              SELECT DISTINCT grams.doc_id FROM grams JOIN bench USING (g)
              WHERE grams.doc_id % 50 <> 0),
            losers AS (
              SELECT doc_id
              FROM ({_gold_keyed("neardup_clusters", "docs")})
              WHERE cluster != doc_id),
            kept AS (
              SELECT d.doc_id,
                     len({_TOK})::BIGINT AS n_tokens
              FROM documents d JOIN q USING (doc_id)
              WHERE q.quality >= 0.6 AND d.doc_id % 50 <> 0
                AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
                AND d.doc_id NOT IN (SELECT doc_id FROM losers)),
            c AS (SELECT doc_id, n_tokens,
                         SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
                  FROM kept)
            SELECT doc_id, n_tokens,
                   CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id
            FROM c
        """,
        "lm_score": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOK}) AS term
                          FROM documents),
            c AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1),
            s AS (SELECT (SELECT SUM(n) FROM c) AS N,
                         (SELECT COUNT(*) FROM c) AS V)
            SELECT t.doc_id,
                   round(AVG(ln((c.n + 1) / (s.N + s.V))), 6) AS lm_score
            FROM toks t JOIN c USING (term) CROSS JOIN s
            GROUP BY t.doc_id
        """,
        "doc_dedup_keep": f"""
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (
              SELECT doc_id FROM ({_gold_keyed("neardup_clusters", "docs")})
              WHERE cluster != doc_id)
        """,
        "pack_sequences": f"""
            WITH t AS (SELECT doc_id, len({_TOK})::BIGINT AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, n_tokens,
                         SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
                  FROM t)
            SELECT doc_id, n_tokens,
                   CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id
            FROM c
        """,
        "token_percentiles": f"""
            WITH t AS (SELECT len({_TOK})::BIGINT AS v FROM documents),
            h AS (SELECT v, count(*)::BIGINT AS c FROM t GROUP BY 1),
            s AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
                         (SELECT SUM(c) FROM h) AS n
                  FROM h)
            SELECT (SELECT MIN(v) FROM s WHERE cum >= CEIL(0.5 * n)) AS p50,
                   (SELECT MIN(v) FROM s WHERE cum >= CEIL(0.9 * n)) AS p90,
                   (SELECT MIN(v) FROM s WHERE cum >= CEIL(0.99 * n)) AS p99
        """,
        # --- gold-parquet oracles (synthetic corpus; scale-independent) ---
        "kg_edges": _gold_synth("kg_edges"),
        "path_type_counts": _gold_synth("path_type_counts"),
        "path_instance_counts": _gold_synth("path_instance_counts"),
        "tree_counts": _gold_synth("tree_counts"),
        "events_decoded": _gold_synth("events_decoded"),
        "annotations": _gold_synth("annotations"),
        "ice_terms": _gold_synth("ice_terms"),
        "pmi_index": _gold_synth("pmi_index"),
        "bootstrap_candidates": _gold_synth("bootstrap_candidates"),
        "event_bootstrap_candidates": _gold_synth("event_bootstrap_candidates"),
        "soft_decode": _gold_synth("soft_decode"),
        "media_features": _gold_synth("media_features"),
        "media_cross_format_dups": _gold_synth("media_cross_format_dups"),
        "audio_features": _gold_synth("audio_features"),
        # --- gold-parquet oracles keyed by input-table content ---
        "minhash_neardup": _gold_keyed("minhash_neardup", "docs"),
        "neardup_clusters": _gold_keyed("neardup_clusters", "docs"),
        "knn_multi": _gold_keyed("knn_multi", "emb"),
        "simhash": _gold_keyed("simhash", "docs"),
        "quality": _gold_keyed("quality", "docs"),
        "lang_id": _gold_keyed("lang_id", "docs"),
        "bpe_tokens": _gold_keyed("bpe_tokens", "docs"),
        "knn_lsh": _gold_keyed("knn_lsh", "emb"),
        "embedding_neardup": _gold_keyed("embedding_neardup", "emb"),
        "approx_distinct_users": _gold_keyed("approx_distinct_users",
                                             "events"),
        # --- true ANSI-SQL oracles over list kernels ---
        "doc_repetition": """
            WITH words AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            grams AS (
              SELECT doc_id,
                     array_to_string(list_slice(w, i, i + 1), ' ') AS g
              FROM words,
                   LATERAL (SELECT unnest(generate_series(
                       1, greatest(len(w) - 1, 0))) AS i) t),
            g2 AS (SELECT doc_id, count(DISTINCT g) AS d2,
                          count(*) AS t2
                   FROM grams GROUP BY doc_id)
            SELECT words.doc_id,
                   len(w)::BIGINT AS n_words,
                   round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6)
                       AS dup_word_frac,
                   coalesce(round(1.0 - d2::DOUBLE / t2, 6), 0.0)
                       AS dup_2gram_frac
            FROM words LEFT JOIN g2 USING (doc_id)
        """,
        "decontaminate": """
            WITH words AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            grams AS (
              SELECT doc_id,
                     array_to_string(list_slice(w, i, i + 7), ' ') AS g
              FROM words,
                   LATERAL (SELECT unnest(generate_series(
                       1, greatest(len(w) - 7, 0))) AS i) t),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
            hits AS (SELECT grams.doc_id,
                            count(DISTINCT grams.g) AS contaminated_grams
                     FROM grams JOIN bench USING (g)
                     WHERE grams.doc_id % 50 <> 0
                     GROUP BY grams.doc_id)
            SELECT d.doc_id,
                   coalesce(h.contaminated_grams, 0)::BIGINT
                       AS contaminated_grams,
                   coalesce(h.contaminated_grams, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 50 <> 0
        """,
        "pii_scrub": r"""
            WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@mail.example.com from 10.0.0.'
                          || CAST(doc_id % 256 AS VARCHAR) AS t
              FROM documents),
            s1 AS (SELECT doc_id,
                     len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
                     regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g') AS t
                   FROM aug),
            s2 AS (SELECT doc_id, c1,
                     len(regexp_extract_all(t,
                       '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS c2,
                     regexp_replace(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b',
                                    '[IP]', 'g') AS t
                   FROM s1),
            s3 AS (SELECT doc_id, c1, c2,
                     len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS c3,
                     regexp_replace(t, '\b\d{3}-\d{4}\b',
                                    '[PHONE]', 'g') AS t
                   FROM s2)
            SELECT doc_id, t AS scrubbed,
                   (c1 + c2 + c3)::BIGINT AS n_redactions
            FROM s3
        """,
        "cross_doc_ngrams": """
            WITH words AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(w, i, i + 7), ' ') AS g
              FROM words,
                   LATERAL (SELECT unnest(generate_series(
                       1, greatest(len(w) - 7, 0))) AS i) t),
            gc AS (SELECT g, count(DISTINCT doc_id) AS dc
                   FROM grams GROUP BY g),
            per AS (SELECT grams.doc_id,
                           count(*) AS n_grams,
                           count(*) FILTER (WHERE gc.dc >= 2)
                               AS shared_grams
                    FROM grams JOIN gc USING (g)
                    GROUP BY grams.doc_id)
            SELECT doc_id, n_grams::BIGINT AS n_grams,
                   shared_grams::BIGINT AS shared_grams,
                   round(shared_grams::DOUBLE / n_grams, 6) AS shared_frac
            FROM per
        """,
        "jaccard_neardup": """
            WITH words AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(w, i, i + 7), ' ') AS g
              FROM words,
                   LATERAL (SELECT unnest(generate_series(
                       1, greatest(len(w) - 7, 0))) AS i) t),
            sizes AS (SELECT doc_id, count(*)::BIGINT AS ng
                      FROM grams GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                             count(*)::BIGINT AS i
                      FROM grams a JOIN grams b USING (g)
                      WHERE a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id)
            SELECT id1, id2,
                   round(i::DOUBLE / (s1.ng + s2.ng - i), 6) AS jaccard
            FROM inter
            JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
            WHERE i::DOUBLE / (s1.ng + s2.ng - i) >= 0.5
        """,
        "event_band_join": """
            SELECT l.event_id AS event_id, r.event_id AS event_id_r,
                   (epoch_us(r.ts) - epoch_us(l.ts))::BIGINT AS gap_us
            FROM events l JOIN events r
              ON epoch_us(r.ts) BETWEEN epoch_us(l.ts) + 1
                                    AND epoch_us(l.ts) + 60000000
        """,
        "stratified_sample": """
            WITH r AS (
              SELECT doc_id, source,
                     row_number() OVER (
                         PARTITION BY source
                         ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
              FROM documents)
            SELECT doc_id, source FROM r WHERE rk <= 10
        """,
    }
