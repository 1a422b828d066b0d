"""Engine constants and pipeline configuration.

The extraction caps are part of output equivalence with the reference and
keep identical values (reference: models/DepPaths.java:66-123, 364-366).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- extraction caps (DepPaths.java:66-106) ---
MAX_ALLOWABLE_SENTENCE_LENGTH = 600
MAX_INTERVENING_MENTIONS = 3
MIN_RELATION_TYPE_FREQ = 1
MAX_MENTIONS_IN_SENTENCE = 50
MAX_PATH_EDGES = 5  # DepPaths.java:364-366 (regularized path length > 5 dropped)
SKIPPED_SENTENCES_AT_BEGINNING = 0

# --- BFS disallowed dependency labels (DepPaths.java:112-123) ---
DISALLOWED_RELATIONS = frozenset(
    {"advcl", "rcmod", "advcl-1", "rcmod-1", "mod", "mod-1", "conj", "conj-1"}
)

# --- soft-match decode parameters (RelaxedDepPathRelationTagger.java:244;
#     PathRelationExtractor.java:21-27) ---
SOFT_REPLACE_COST = 0.8
SOFT_INSERT_COST = 0.3
SOFT_DELETE_COST = 1.2
SOFT_MIN_THRESHOLD = 0.5
SOFT_NEG_DISCOUNT = 0.8
LABEL_MISMATCH_PENALTY = 2.5  # PathMatcher.java:21

# --- quantifiers removed by the path regularizer (DepPathRegularizer.java:26-34) ---
QUANTIFIERS = frozenset(
    {"ounce", "gram", "kilogram", "quantity", "kilo", "pound", "amount"}
)

# --- term counting (TermCounter.java:36-45) ---
TERM_STOPWORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with", "from",
    }
)

# --- bootstrap (Bootstrap.java:46-56; EventBootstrap.java:44-53) ---
MIN_BOOTSTRAP_SCORE = 0.05
MAX_BOOTSTRAPPED_ITEMS = 200
MIN_RELATION_COUNT = 2  # Bootstrap.java MIN_RELATION_COUNT

# --- entity-set expansion (EntitySetExpander.java:23-28) ---
EXPANDER_GAMMA = 0.5
SUGGEST_SEED_SAMPLE_SIZE = 20
RECOMMENDATION_TOP_K = 10


@dataclass
class PipelineConfig:
    """Run configuration for the KG pipeline (the Ray analog of ice.yml +
    Ice properties; reference: uicomps/Ice.java:33-41, src/props/iceprops).

    Per-stage parallelism knobs are explicit so the same code runs on a
    laptop (num_cpus=8) and a 256-node cluster by changing only this.
    """

    # stage sizing
    annotator_concurrency: tuple[int, int] = (1, 8)
    annotator_batch_size: int = 1024
    tagger_concurrency: tuple[int, int] = (1, 4)
    tagger_batch_size: int = 2048
    # wide-step layout
    num_edge_partitions: int = 64          # hash(subj) partition count for the edge table
    shuffle_parallelism: int | None = None  # override Ray's choice when set
    # thresholds (Ice properties analog)
    max_intervening_mentions: int = MAX_INTERVENING_MENTIONS
    min_relation_type_freq: int = MIN_RELATION_TYPE_FREQ
    soft_match: bool = False               # decode: exact only (default) or +soft rules
    soft_threshold: float = SOFT_MIN_THRESHOLD  # normalized soft-match acceptance bound
    link_strategy: str = "broadcast"       # "broadcast" (registry fits memory) | "shuffle" (10^12-turn safe)
    fuse_decode: bool = True               # flagship: one annotate+extract+tag actor pool (path rows
                                           # never hit the object store); False = split pools (cached layout)
    extract_strategy: str = "auto"         # "auto": sample the duplication ratio and pick (see
                                           # kg.resolve_extract_strategy). "direct": zero-shuffle
                                           # in-place extraction (per-actor memo; wins at single-node
                                           # pool sizes). "dedup": annotate each DISTINCT text once then
                                           # broadcast-or-join the rows back — the multi-node strategy:
                                           # per-actor memos annotate a text appearing k times
                                           # ~min(k, pool) times, so their benefit vanishes as the pool
                                           # grows (see pipelines/kg.extract_edges)
    strategy_sample_rows: int = 16_384     # rows sampled by extract_strategy="auto" (first-rows
                                           # iter_batches pull, early-aborted — see kg.resolve_extract_strategy)
    dedup_crossover_waste: float = 12.0    # auto picks "dedup" when direct's estimated per-text
                                           # annotation multiplier min(corpus/distinct, pool) reaches
                                           # this (measured tie ≈11–12 at 32 actors, BASELINE.md r4)
    dedup_rows_broadcast_max: int = 5_000_000    # distinct-text edge rows above this (or the byte cap)
    dedup_rows_broadcast_max_bytes: int = 512 << 20  # map back via bucketed join, not broadcast
    dirty_broadcast_max: int = 200_000     # refresh: dirty-key sets above this re-extract the whole group
                                           # instead of broadcasting an unbounded key set
    extract_cache_max: int = 100_000       # distinct-text memo entries per annotator actor (0 = off)
    term_ranker_alpha: float = 1.0         # Ice.TermRanker.alpha
    # extension hooks: extra per-batch UDFs appended to stages by name
    extra_stage_udfs: dict = field(default_factory=dict)
