"""Two-phase cached layout: transcripts → annotations parquet → any
number of downstream harvests (the IcePreprocessor raison d'être — "each
analysis step takes hours, so preprocess once and cache";
docs/ICE_Design.md:14-34, cache writer IcePreprocessor.java:296-304,
reader :704-769).

The cache is a partitioned parquet dataset of annotation list-columns
(S4/S5); downstream stages (`ExtractFromAnnotations`, terms, PMI) read it
instead of re-running the NLP chain.
"""

from __future__ import annotations

import os

import ray.data

from ..config import PipelineConfig
from ..stages.annotator import Annotator, ExtractFromAnnotations


def annotate(transcripts, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return transcripts.map_batches(
        Annotator,
        batch_format="pyarrow",
        batch_size=cfg.annotator_batch_size,
        concurrency=cfg.annotator_concurrency,
    )


def preprocess_to_cache(transcripts, cache_dir: str,
                        cfg: PipelineConfig | None = None) -> str:
    """Annotate and materialize the cache (wide list-columns → keep files
    modest with min_rows_per_file; SURVEY §7 'wide rows' note)."""
    ann = annotate(transcripts, cfg)
    ann.write_parquet(os.path.join(cache_dir, "annotations"),
                      min_rows_per_file=20_000, mode="overwrite")
    return os.path.join(cache_dir, "annotations")


def read_cache(cache_dir: str):
    path = cache_dir if cache_dir.endswith("annotations") else \
        os.path.join(cache_dir, "annotations")
    return ray.data.read_parquet(path)


def extract_paths_from_cache(cache_dir: str,
                             cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return read_cache(cache_dir).map_batches(
        ExtractFromAnnotations,
        fn_constructor_kwargs={"max_intervening": cfg.max_intervening_mentions},
        batch_format="pyarrow",
        batch_size=cfg.annotator_batch_size,
        concurrency=cfg.annotator_concurrency,
    )
