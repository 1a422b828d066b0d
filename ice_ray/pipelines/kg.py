"""The flagship pipeline: transcripts → (subj, pred, obj) edge table.

Ray shape (SURVEY.md §3.3): ``read_parquet → map_batches(AnnotateExtract
actor pool) → map_batches(Tagger, broadcast rules) → conv-scoped linking →
global canonicalization → exact dedup groupby(subj,pred,obj) → partitioned
parquet by hash(subj) + per-partition manifest``.

Scale notes:
- the annotate+extract stage is fused so annotation list-columns never hit
  the object store in the headline path;
- dedup pre-aggregates inside map_batches (per-batch combiner) before the
  groupby so the all-to-all shuffle moves one row per distinct triple per
  batch, not one per occurrence;
- the expensive phase checkpoints raw edges per input-shard group
  (state/manifest.py); the global phase (link/canonicalize/dedup) reruns
  cheaply over edges only.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import PipelineConfig
from ..functions.shuffle import grouped_aggregate
from ..sources.models import DEFAULT_RELATION_RULES
from ..stages.annotator import AnnotateExtract
from ..stages.linker import (
    CanonicalRewriter,
    build_canonical_map,
    link_edges_by_conversation,
)
from ..stages.tagger import Tagger
from ..state.manifest import Manifest, fingerprint_files, fingerprint_params


def extract_paths(transcripts: "ray.data.Dataset",
                  cfg: PipelineConfig | None = None,
                  emit_repr: bool = True,
                  emit_person_mentions: bool = False) -> "ray.data.Dataset":
    cfg = cfg or PipelineConfig()
    return transcripts.map_batches(
        AnnotateExtract,
        fn_constructor_kwargs={"max_intervening": cfg.max_intervening_mentions,
                               "emit_repr": emit_repr,
                               "emit_person_mentions": emit_person_mentions,
                               "cache_max": cfg.extract_cache_max},
        batch_format="pyarrow",
        batch_size=cfg.annotator_batch_size,
        concurrency=cfg.annotator_concurrency,
    )


def _decode_kwargs(rules: dict[str, str] | None, cfg: PipelineConfig,
                   neg_rules: dict[str, str] | None = None,
                   embeddings: dict | None = None) -> dict:
    """Broadcast the rule/neg/embedding tables once (``ray.put``) and
    return the Tagger constructor kwargs shared by the split and fused
    decode layouts."""
    rules = rules if rules is not None else DEFAULT_RELATION_RULES
    kwargs = {"rules_ref": ray.put(rules), "soft": cfg.soft_match,
              "soft_threshold": cfg.soft_threshold}
    if neg_rules:
        kwargs["neg_rules_ref"] = ray.put(neg_rules)
    if embeddings:
        kwargs["emb_ref"] = ray.put(embeddings)
    return kwargs


def extract_decode_edges(transcripts: "ray.data.Dataset",
                         rules: dict[str, str] | None = None,
                         cfg: PipelineConfig | None = None,
                         neg_rules: dict[str, str] | None = None,
                         embeddings: dict | None = None,
                         extra_entity_sets: dict | None = None
                         ) -> "ray.data.Dataset":
    """Fused flagship extraction: text → raw edges in ONE actor pool
    (annotate + extract + decode; stages/annotator.py
    AnnotateExtractDecode).  Path rows never hit the object store and
    no static CPU split between an extract pool and a tag pool exists —
    the whole pool does the heavy annotate work and tags in place."""
    from ..stages.annotator import AnnotateExtractDecode

    cfg = cfg or PipelineConfig()
    kwargs = _decode_kwargs(rules, cfg, neg_rules, embeddings)
    kwargs.update({"max_intervening": cfg.max_intervening_mentions,
                   "emit_repr": False,
                   "emit_person_mentions": True,
                   "cache_max": cfg.extract_cache_max})
    if extra_entity_sets:
        kwargs["extra_entity_sets"] = extra_entity_sets
    return transcripts.map_batches(
        AnnotateExtractDecode,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=cfg.annotator_batch_size,
        concurrency=cfg.annotator_concurrency,
    )


_ROWS_MAP_CACHE: dict = {}

_EDGE_COLS = ["subj", "pred", "obj", "subj_type", "obj_type"]


def _build_rows_pdf(*tables):
    """Worker-side broadcast frame (text + edge columns) from the
    distinct-text extraction blocks — built in a Ray task, never on the
    driver.  The emit scan joins against it per batch."""
    import pandas as pd

    from ..functions.blocks import ensure_arrow_block
    tables = [ensure_arrow_block(t) for t in tables]
    parts = [t.rename_columns(
                ["text" if c == "conv_id" else c for c in t.column_names])
             .select(["text"] + _EDGE_COLS).to_pandas()
             for t in tables if "conv_id" in t.column_names]
    return (pd.concat(parts, ignore_index=True) if parts
            else pd.DataFrame(columns=["text"] + _EDGE_COLS))


def _tkey(text: str) -> str:
    import hashlib
    return hashlib.md5((text or "").encode()).hexdigest()


def resolve_extract_strategy(transcripts: "ray.data.Dataset",
                             cfg: PipelineConfig) -> str:
    """Pick "direct" vs "dedup" from a bounded sample of the corpus.

    Direct's waste is its per-text annotation multiplier
    ``min(corpus/distinct, pool)`` (a text appearing k times is annotated
    ~min(k, pool) times across the extraction pool — measured r4); dedup
    pays a distinct exchange + map-back worth ≈11–12 annotation-multiples
    at the r4 crossover.  So: sample ``strategy_sample_rows`` turns, take
    waste = min(sample_n/sample_distinct, cluster CPUs), and pick
    "dedup" at ``waste ≥ cfg.dedup_crossover_waste``.  The sample is the
    corpus's FIRST rows pulled via an early-aborted ``iter_batches`` (a
    ``limit()`` would re-scan the read stage — measured +1.4 s on the
    30k-turn bench); per-batch distinct counts are summed (cross-batch
    duplicates uncollapsed), so the duplication ratio is an UNDERestimate
    and the sample carries detect_salt's documented first-rows bias —
    both err toward direct, never paying the exchange on corpora that
    don't repay it."""
    import pyarrow.compute as pc

    try:
        pool = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:
        pool = 8

    n = d = 0
    for b in transcripts.iter_batches(batch_size=16384,
                                      batch_format="pyarrow",
                                      prefetch_batches=0):
        t = pc.fill_null(b.column("text").combine_chunks(), "")
        n += len(t)
        d += len(pc.unique(t))
        if n >= cfg.strategy_sample_rows:
            break
    if n == 0:
        return "direct"
    waste = min(n / max(d, 1), pool)
    return "dedup" if waste >= cfg.dedup_crossover_waste else "direct"


def extract_edges(transcripts: "ray.data.Dataset",
                  rules: dict[str, str] | None = None,
                  cfg: PipelineConfig | None = None,
                  **kwargs) -> "ray.data.Dataset":
    """Strategy dispatcher for the expensive extraction phase.

    ``"direct"`` (default): zero-shuffle layout — extraction actors scan
    the turns in place, each with a per-actor distinct-text memo.

    ``"dedup"``: annotate each DISTINCT text exactly once.  Shape:
    per-batch distinct text → bucketed distinct exchange (moves each
    distinct text once) → extraction actor pool over DISTINCT texts →
    worker-built (text → edge rows) broadcast frame (row+byte gated)
    joined back per batch with a vectorized pandas merge.  Above the
    gate the rows map back via a bucketed hash join on md5(text) (slim
    keys — the raw text never re-shuffles).

    Crossover (measured at 1M turns, ~87.6k distinct texts, 32 cpus,
    BASELINE.md round 4): the per-actor memo annotates a text appearing
    k times ≈ min(k, pool) times, so DIRECT does ~487k annotations
    (~440 core-s) where DEDUP does 87.6k (~227 core-s) — but dedup pays
    a distinct exchange + map-back (~190 core-s), so at 32 actors the
    two tie and direct's simpler plan wins.  The ratio
    annotations(direct)/annotations(dedup) → corpus/distinct (11× here)
    as the pool grows: on a multi-node cluster (hundreds of actors)
    per-actor memos stop deduplicating anything and ``"dedup"`` is the
    right strategy; single-node defaults keep ``"direct"``.
    """
    cfg = cfg or PipelineConfig()

    def direct(ds):
        if cfg.fuse_decode:
            return extract_decode_edges(ds, rules, cfg, **kwargs)
        return decode_edges(extract_paths(ds, cfg, emit_repr=False,
                                          emit_person_mentions=True),
                            rules, cfg)

    strategy = cfg.extract_strategy
    if strategy == "auto":
        strategy = resolve_extract_strategy(transcripts, cfg)
    if strategy != "dedup":
        return direct(transcripts)

    from ..functions.shuffle import grouped_aggregate

    def distinct_texts(batch: pa.Table) -> pa.Table:
        # per-batch distinct first: hot texts (tool JSON, boilerplate)
        # collapse map-side before the exchange
        import pyarrow.compute as pc
        t = batch.column("text").combine_chunks()
        t = pc.fill_null(t, "")
        return pa.table({"text": pc.unique(t)})

    distinct = grouped_aggregate(
        transcripts.map_batches(distinct_texts, batch_format="pyarrow"),
        keys=["text"], specs=[("text", "count")]).drop_columns(["text_count"])

    def as_turns(batch: pa.Table) -> pa.Table:
        # the extraction stage's (conv_id, turn_idx, text) contract: the
        # text itself rides the conv_id column so the emitted rows come
        # back keyed by their text
        return pa.table({"conv_id": batch.column("text"),
                         "turn_idx": pa.array([0] * batch.num_rows,
                                              pa.int32()),
                         "text": batch.column("text")})

    # one extraction per DISTINCT text
    rows = direct(distinct.map_batches(as_turns,
                                       batch_format="pyarrow")).materialize()

    if (rows.count() <= cfg.dedup_rows_broadcast_max
            and (rows.size_bytes() or 0)
            <= cfg.dedup_rows_broadcast_max_bytes):
        map_ref = ray.remote(_build_rows_pdf).remote(*rows.to_arrow_refs())
        key = map_ref.hex()

        def emit(batch: pa.Table) -> pa.Table:
            # vectorized map-back: one pandas hash join per batch against
            # the broadcast rows frame (keyed by the text itself — no
            # per-row hashing or Python row loop on the hot scan)
            import pandas as pd
            rpdf = _ROWS_MAP_CACHE.get(key)
            if rpdf is None:
                if len(_ROWS_MAP_CACHE) > 2:
                    _ROWS_MAP_CACHE.clear()
                rpdf = _ROWS_MAP_CACHE[key] = ray.get(map_ref)
            left = pd.DataFrame({
                "conv_id": batch.column("conv_id").to_pandas(),
                "turn_idx": batch.column("turn_idx").to_pandas(),
                "text": batch.column("text").to_pandas().fillna(""),
            })
            out = left.merge(rpdf, on="text", how="inner")
            return pa.table({
                **{c: pa.array(out[c], pa.string()) for c in _EDGE_COLS},
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            })

        return transcripts.map_batches(emit, batch_format="pyarrow")

    # scale path: rows map back via a bucketed hash join on md5(text) —
    # only slim (conv, turn, tkey) rows and the edge rows cross the
    # exchange, never the raw text
    from ..functions.join import bucketed_hash_join

    def keyed(t: pa.Table) -> pa.Table:
        keys = [_tkey(x) for x in t.column("conv_id").to_pylist()]
        return (t.drop_columns(["conv_id", "turn_idx"])
                 .append_column("_tkey", pa.array(keys, pa.string())))

    keyed_rows = rows.map_batches(keyed, batch_format="pyarrow")

    def slim(batch: pa.Table) -> pa.Table:
        keys = [_tkey(t or "")
                for t in batch.column("text").to_pylist()]
        return pa.table({"conv_id": batch.column("conv_id"),
                         "turn_idx": batch.column("turn_idx"),
                         "_tkey": pa.array(keys, pa.string())})

    turns_slim = transcripts.map_batches(slim, batch_format="pyarrow")
    joined = bucketed_hash_join(turns_slim, keyed_rows,
                                left_on="_tkey", right_on="_tkey",
                                how="inner")
    return joined.drop_columns(["_tkey"])


def decode_edges(paths: "ray.data.Dataset", rules: dict[str, str] | None = None,
                 cfg: PipelineConfig | None = None,
                 neg_rules: dict[str, str] | None = None,
                 embeddings: dict | None = None) -> "ray.data.Dataset":
    """``embeddings`` (word → vector) enables embedding-scaled soft
    matching (WordEmbedding.java similarity in the replace cost); both
    rule tables and the embedding table are broadcast once via ray.put
    and fetched in each decode actor's __init__."""
    cfg = cfg or PipelineConfig()
    kwargs = _decode_kwargs(rules, cfg, neg_rules, embeddings)
    return paths.map_batches(
        Tagger,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=cfg.tagger_batch_size,
        concurrency=cfg.tagger_concurrency,
    )


def _add_src_key(batch: pa.Table) -> pa.Table:
    src = pc.binary_join_element_wise(
        batch.column("conv_id"),
        pc.utf8_lpad(pc.cast(batch.column("turn_idx"), pa.string()), 9, "0"),
        "#")
    return batch.append_column("src_key", src)


def dedup_edges(edges: "ray.data.Dataset",
                num_buckets: int = 64) -> "ray.data.Dataset":
    """Exact dedup: groupby(subj,pred,obj) → weight + first provenance
    (deterministic ``min_by(turn_order_key)``, SURVEY §4 ordering note).
    Two-stage bucketed aggregate (functions/shuffle.py): the shuffle moves
    per-batch partials only."""
    # "@MENTION" pseudo-edges (coref antecedent carriers from path-less
    # turns) are consumed by the linker stages and end here
    edges = edges.filter(expr='pred != "@MENTION"')
    agg = grouped_aggregate(
        edges.map_batches(_add_src_key, batch_format="pyarrow"),
        keys=["subj", "pred", "obj"],
        specs=[("pred", "count"), ("src_key", "min"),
               ("subj_type", "min"), ("obj_type", "min")],
        num_buckets=num_buckets,
        rename={"pred_count": "weight", "src_key_min": "first_src",
                "subj_type_min": "subj_type", "obj_type_min": "obj_type"},
    )

    def split_src(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("first_src"), "#")
        conv = pc.list_element(parts, 0)
        tidx = pc.cast(pc.list_element(parts, 1), pa.int32())
        return (batch.append_column("conv_id", conv)
                     .append_column("turn_idx", tidx)
                     .drop_columns(["first_src"]))

    return agg.map_batches(split_src, batch_format="pyarrow")



def canonicalize_edges(edges: "ray.data.Dataset",
                       strategy: str = "broadcast",
                       mention_cap: int = 16_000_000) -> "ray.data.Dataset":
    """Conversation-scoped surname linking, then global surface
    canonicalization.

    ``strategy="broadcast"`` (default): build a small (conv, surname) →
    full-name registry with one aggregate, broadcast it, and fuse link +
    canonical rewrite into a single map_batches pass — no edge shuffle.
    Correct while the registry (#conversations-bounded) fits in memory.

    ``strategy="shuffle"``: the scale-safe path for 10^12-turn inputs —
    bucket-hash groupby on conv_id (stages/linker.py), then a separate
    canonical rewrite pass.
    """
    # edges are small relative to the turn input; materializing here keeps
    # the expensive annotate+extract stage from executing twice (once for
    # the registry/canonical aggregates, once for the rewrite).
    # Materialize FIRST, then coalesce: a repartition placed BEFORE the
    # materialize barrier is an all-to-all inside the streaming topology —
    # it stalls the extract pipeline and cost ~25% of the 8M-turn wall
    # time at 16 cpus; the same repartition on the already-materialized
    # (small) edge table is a ~0.3s in-memory exchange.  Coalescing still
    # matters: downstream per-batch partials duplicate per block, so 160
    # small blocks made the link phase 3× slower than 2·ncpu blocks.
    from ..stages.linker import resolve_pronoun_edges

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    edges = edges.materialize()
    if edges.num_blocks() > ncpu * 2:
        edges = edges.repartition(ncpu * 2).materialize()
    from ..stages.linker import make_cached_rewriter

    if strategy == "shuffle":
        # conversation-scoped pronoun coreference first (a bare-surname
        # antecedent is resolved by the rewrite below — same fixpoint);
        # bucketed exchange over slim mention rows, no driver state,
        # skipped when pronoun-free
        combined = resolve_pronoun_edges(edges, materialize_input=False)
        linked = link_edges_by_conversation(combined).materialize()
        canon = build_canonical_map(linked)
        return linked.map_batches(
            make_cached_rewriter(CanonicalRewriter, ray.put(canon)),
            batch_format="pyarrow",
        )
    from ..stages.linker import (
        FusedLinkRewriter,
        LinkCanonRewriter,
        build_mention_index,
    )

    # fused fast path: ONE aggregate pass builds registry + canonical map
    # + the pron-conv set; ONE pass pulls the antecedent index; ONE
    # rewrite pass resolves pronouns, links bare surnames and
    # canonicalizes — no tag/filter/union re-scans.  The two driver
    # barriers are independent (the mention pull runs unfiltered,
    # capped), so they execute CONCURRENTLY over the materialized edges
    # and the phase costs overlap.  Registry/canon come from the raw
    # edges: pronoun surfaces are excluded there, and resolved pronoun
    # mentions only repeat names already present in their conversation's
    # edges — identical state.
    from concurrent.futures import ThreadPoolExecutor

    from ..stages.linker import (
        _mention_index_task,
        build_link_state_refs,
        mention_dataset,
    )

    # speculate only when the unfiltered mention scan CANNOT overflow:
    # mention rows ≤ 2 × raw edge rows (a hard bound), and count() on
    # the materialized edges is free metadata — so under the cap the
    # speculative scan is never wasted, and it OVERLAPS the link-state
    # aggregate scan.  The 16M-row cap bounds the mention blocks (slim
    # (conv, key, name) rows, ~130 B each) and the worker-built
    # MentionIndex at ~2 GB of object store.  Beyond the cap the
    # bucketed mention exchange (resolve_pronoun_edges) takes over —
    # conversation-bounded state, like the registry, is the documented
    # limit of the broadcast strategy; link_strategy="shuffle" is the
    # 10^12-turn path.
    speculate = 2 * edges.count() <= mention_cap
    if speculate:
        # refs-only flow: the link-state finish and the mention index
        # build in Ray tasks and return object refs — NOTHING crosses
        # the driver (each driver touch — aggregate pull, dict build,
        # mention concat, index build, ray.put — was seconds of serial
        # time paid identically at every cluster size)
        with ThreadPoolExecutor(2) as ex:
            f_state = ex.submit(build_link_state_refs, edges)
            f_ment = ex.submit(lambda: mention_dataset(edges).materialize())
            reg_ref, canon_ref, pron_ref = f_state.result()
            m_ds = f_ment.result()
        # worker-side index build CHAINED on the link-state finish task
        # (pron_ref) — the driver never blocks on either; the rewrite
        # stage's __init__ ray.get waits on (and overlaps with) the
        # chain.  A pronoun-free corpus yields an empty index and the
        # fused rewriter's pronoun pass no-ops per batch.
        ment_ref = _mention_index_task.remote(
            pron_ref, *m_ds.to_arrow_refs())
        return edges.map_batches(
            make_cached_rewriter(FusedLinkRewriter, reg_ref,
                                 canon_ref, ment_ref),
            batch_format="pyarrow",
        )
    # beyond the speculation bound: same refs-only link state (finish
    # in a Ray task; registry/canon never cross the driver), but the
    # mention side needs the pron-conv set first for a FILTERED pull
    reg_ref, canon_ref, pron_ref = build_link_state_refs(edges)
    pron_convs = ray.get(pron_ref)
    mentions = {}
    if pron_convs:
        # filtered pull, still capped
        mentions = build_mention_index(edges, pron_convs, mention_cap)
        if mentions is None:
            # antecedent index exceeds the broadcast cap — fall back to
            # the bucketed mention exchange, then link + canonicalize
            combined = resolve_pronoun_edges(edges, materialize_input=False,
                                             mention_broadcast_max=0,
                                             conv_set=pron_convs)
            return combined.map_batches(
                make_cached_rewriter(LinkCanonRewriter, reg_ref, canon_ref),
                batch_format="pyarrow",
            )
    # task-based rewrite (cheap init): fuses with the downstream dedup
    # combiner into one pass over the materialized raw edges
    return edges.map_batches(
        make_cached_rewriter(FusedLinkRewriter, reg_ref, canon_ref,
                             ray.put(mentions)),
        batch_format="pyarrow",
    )


def build_kg(transcripts: "ray.data.Dataset",
             rules: dict[str, str] | None = None,
             cfg: PipelineConfig | None = None) -> "ray.data.Dataset":
    """transcripts → deduplicated canonical edge dataset (lazy)."""
    cfg = cfg or PipelineConfig()
    # the decode path needs no repr/example — skip the linearizer;
    # person mentions of path-less turns ride along for coref.
    # extract_edges dispatches on cfg.extract_strategy ("auto" default:
    # a sampled duplication-ratio probe picks "direct" at single-node
    # pool sizes and "dedup" when per-actor memos stop deduplicating —
    # see resolve_extract_strategy)
    edges = extract_edges(transcripts, rules, cfg)
    edges = canonicalize_edges(edges, strategy=cfg.link_strategy)
    return dedup_edges(edges)


def _add_pkey(batch: pa.Table, num_partitions: int) -> pa.Table:
    from ..functions.shuffle import hash_mod
    return batch.append_column(
        "pkey", hash_mod(batch.column("subj"), num_partitions))


def write_edges(edges: "ray.data.Dataset", out_dir: str,
                num_partitions: int = 64,
                fingerprint: str = "") -> dict:
    """Write the edge table partitioned by ``pkey = hash(subj) % P`` (the
    north rule's subject-hash layout) plus a per-partition manifest with
    triple counts (lineage metrics).  Per-partition counts are aggregated
    from the SAME materialized dataset that is written — no re-read of
    the written parquet just to count."""
    import pyarrow.compute as pc

    with_pkey = edges.map_batches(_add_pkey, batch_format="pyarrow",
                                  fn_kwargs={"num_partitions": num_partitions}
                                  ).materialize()

    def pkey_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("pkey").combine_chunks())
        return pa.table({"pkey": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    # per-batch value_counts → ≤ num_partitions rows per batch; merged on
    # the driver (partition-count-bounded, no row-based groupby)
    parts = with_pkey.map_batches(pkey_partial,
                                  batch_format="pyarrow").to_pandas()
    counts = parts.groupby("pkey")["n"].sum()
    with_pkey.write_parquet(os.path.join(out_dir, "edges"),
                            partition_cols=["pkey"], mode="overwrite")
    man = Manifest(os.path.join(out_dir, "edges_manifest.json"))
    for pk, n in counts.items():
        man.mark_done(f"pkey={pk}", fingerprint, int(n))
    return {"partitions": len(counts), "triples": int(counts.sum())}


def _read_current_groups(out_dir: str, man: Manifest,
                         n_groups: int) -> "ray.data.Dataset":
    """Global-phase input: ONLY the current run's group dirs.  Stale
    ``group=NNNNN`` dirs + manifest entries from a prior run with a
    different group layout are pruned first, so obsolete edges never
    leak into the final KG or its stats."""
    import shutil

    current = {f"group={gi:05d}" for gi in range(n_groups)}
    for gid in man.prune(current):
        stale = os.path.join(out_dir, "raw_edges", gid)
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    base = os.path.join(out_dir, "raw_edges")
    for name in os.listdir(base) if os.path.isdir(base) else []:
        if name not in current:
            shutil.rmtree(os.path.join(base, name))
    import glob
    files = sorted(f for gid in sorted(current)
                   for f in glob.glob(os.path.join(base, gid, "*.parquet")))
    return ray.data.read_parquet(files)


def run_kg_job(input_files: list[str], out_dir: str,
               rules: dict[str, str] | None = None,
               cfg: PipelineConfig | None = None,
               group_size: int = 8, resume: bool = True) -> dict:
    """Resumable end-to-end job.

    Phase A (expensive, per input-shard group): extract+decode → raw-edge
    checkpoint under ``raw_edges/group=<i>``; groups whose input
    fingerprint matches the manifest are skipped on rerun.
    Phase B (cheap, global over edges): link → canonicalize → dedup →
    hash-partitioned final write.
    """
    cfg = cfg or PipelineConfig()
    rules = rules if rules is not None else DEFAULT_RELATION_RULES
    param_fp = fingerprint_params(rules=sorted(rules.items()),
                                  mi=cfg.max_intervening_mentions,
                                  soft=cfg.soft_match)
    man = Manifest(os.path.join(out_dir, "raw_edges_manifest.json"))
    groups = [sorted(input_files)[i:i + group_size]
              for i in range(0, len(input_files), group_size)]
    skipped = 0
    for gi, files in enumerate(groups):
        gid = f"group={gi:05d}"
        fp = fingerprint_files(files) + param_fp
        if resume and man.is_done(gid, fp):
            skipped += 1
            continue
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        ds = ray.data.read_parquet(files, columns=["conv_id", "turn_idx", "text"],
                                   override_num_blocks=max(len(files), ncpu * 4))
        edges = extract_edges(ds, rules, cfg)
        gdir = os.path.join(out_dir, "raw_edges", gid)
        edges.write_parquet(gdir, mode="overwrite")
        n = ray.data.read_parquet(gdir).count()
        man.mark_done(gid, fp, n)
    raw = _read_current_groups(out_dir, man, len(groups))
    final = dedup_edges(canonicalize_edges(raw))
    stats = write_edges(final, out_dir, cfg.num_edge_partitions,
                        fingerprint=param_fp)
    stats.update({"groups": len(groups), "groups_skipped": skipped,
                  "raw_edges": man.total_rows()})
    return stats


def refresh_kg_job(input_files: list[str], out_dir: str,
                   changed_terms: list[str],
                   rules: dict[str, str] | None = None,
                   extra_entity_sets: dict | None = None,
                   cfg: PipelineConfig | None = None,
                   group_size: int = 8) -> dict:
    """Incremental re-extraction after an entity-set change — the
    DepPathsLog / ``dpidIsClean`` memo at turn granularity
    (models/DepPaths.java:226-231, 585-676: a doc is "clean" and reuses
    its cached paths iff it contains no entity-set token).

    Turns whose text contains any of ``changed_terms`` are re-extracted
    with the new dictionary; clean turns keep their checkpointed raw
    edges.  The cheap global phase (link/canonicalize/dedup/write) then
    reruns over the merged raw edges.
    """
    import pyarrow.compute as pc_

    cfg = cfg or PipelineConfig()
    rules = rules if rules is not None else DEFAULT_RELATION_RULES
    terms = [t for t in changed_terms if t]
    man = Manifest(os.path.join(out_dir, "raw_edges_manifest.json"))
    if not terms:
        # nothing changed → corpus is clean; re-run only the cheap global
        # phase (an empty term list previously crashed mark_dirty)
        raw = _read_current_groups(
            out_dir, man, (len(input_files) + group_size - 1) // group_size)
        final = dedup_edges(canonicalize_edges(raw))
        stats = write_edges(final, out_dir, cfg.num_edge_partitions)
        stats.update({"dirty_turns": 0,
                      "groups": (len(input_files) + group_size - 1) // group_size})
        return stats
    groups = [sorted(input_files)[i:i + group_size]
              for i in range(0, len(input_files), group_size)]
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    dirty_total = 0
    param_fp = fingerprint_params(rules=sorted(rules.items()),
                                  mi=cfg.max_intervening_mentions,
                                  soft=cfg.soft_match,
                                  extra=sorted((extra_entity_sets or {}).items()),
                                  changed=sorted(terms))

    def mark_dirty(batch: pa.Table) -> pa.Table:
        dirty = None
        for t in terms:
            m = pc_.match_substring(batch.column("text"), t, ignore_case=True)
            dirty = m if dirty is None else pc_.or_(dirty, m)
        return batch.append_column("_dirty", dirty)

    for gi, files in enumerate(groups):
        gid = f"group={gi:05d}"
        gdir = os.path.join(out_dir, "raw_edges", gid)
        ds = ray.data.read_parquet(files, columns=["conv_id", "turn_idx", "text"],
                                   override_num_blocks=max(len(files), ncpu * 4))
        marked = ds.map_batches(mark_dirty, batch_format="pyarrow")
        # materialize once: count, the worker-side key build, and the
        # re-extraction all reuse the same blocks (three executions of
        # the filter chain otherwise)
        dirty = (marked.filter(expr="_dirty == True")
                 .drop_columns(["_dirty"]).materialize())
        n_dirty = dirty.count()
        if n_dirty == 0:
            continue
        dirty_total += n_dirty

        def _extract(turns):
            if cfg.fuse_decode:
                return extract_decode_edges(turns, rules, cfg,
                                            extra_entity_sets=extra_entity_sets)
            p = turns.map_batches(
                AnnotateExtract,
                fn_constructor_kwargs={"max_intervening": cfg.max_intervening_mentions,
                                       "emit_repr": False,
                                       "emit_person_mentions": True,
                                       "extra_entity_sets": extra_entity_sets},
                batch_format="pyarrow",
                batch_size=cfg.annotator_batch_size,
                concurrency=cfg.annotator_concurrency)
            return decode_edges(p, rules, cfg)

        if n_dirty > cfg.dirty_broadcast_max:
            # the dirty-key set would be unbounded on the driver (a
            # frequent changed term can mark most of a group dirty) —
            # fall back to re-extracting the WHOLE group: bounded memory,
            # same result, and at worst the cost of the initial build of
            # this group
            merged = _extract(ds)
        else:
            # dirty turn keys → drop their cached edges, append
            # re-extractions.  The (cap-bounded) key set is built
            # WORKER-side from the materialized dirty blocks as a sorted
            # composite-key array (never through the driver), and the
            # drop filter is one vectorized searchsorted per batch via a
            # fusable cached task fn (no actor pool, no per-row loop).
            from ..stages.dedup import _cached_get, _worker_side

            def _composite(conv, turn):
                return pc_.binary_join_element_wise(
                    pc_.cast(conv, pa.string()),
                    pc_.cast(turn, pa.string()), "\x01")

            def _key_arr(*tables):
                import numpy as np
                parts = []
                for t in tables:
                    if "conv_id" not in t.column_names:
                        continue
                    parts.append(_composite(t.column("conv_id"),
                                            t.column("turn_idx"))
                                 .to_numpy(zero_copy_only=False))
                return (np.sort(np.concatenate(parts)) if parts
                        else np.empty(0, object))

            keys_ref = _worker_side(_key_arr, dirty)

            def drop_dirty(batch: pa.Table) -> pa.Table:
                import numpy as np
                keys = _cached_get(keys_ref)
                if len(keys) == 0:
                    return batch
                k = _composite(batch.column("conv_id"),
                               batch.column("turn_idx")) \
                    .to_numpy(zero_copy_only=False)
                pos = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
                hit = keys[pos] == k
                return batch.filter(pa.array(~hit))

            cached = ray.data.read_parquet(gdir).map_batches(
                drop_dirty, batch_format="pyarrow")
            merged = cached.union(_extract(dirty))
        tmp = gdir + ".tmp"
        merged.write_parquet(tmp, mode="overwrite")
        import shutil
        shutil.rmtree(gdir)
        os.replace(tmp, gdir)
        man.mark_done(gid, fingerprint_files(files) + param_fp,
                      ray.data.read_parquet(gdir).count())
    raw = _read_current_groups(out_dir, man, len(groups))
    final = dedup_edges(canonicalize_edges(raw))
    stats = write_edges(final, out_dir, cfg.num_edge_partitions,
                        fingerprint=param_fp)
    stats.update({"dirty_turns": dirty_total, "groups": len(groups)})
    return stats
