#!/usr/bin/env python
"""Benchmark harness.

Headline: turns/sec triple-extraction throughput (BASELINE.json metric) —
the full KG pipeline (annotate+extract → tag → link → canonicalize →
dedup) over a cached deterministic transcripts corpus, plus per-query
timings for the operator suite over $GRAFT_SF_DIR tables.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": N, "turns_per_sec": N}

--scaling: runs the headline twice in fresh processes (num_cpus=N and 4N,
default 4 and 16; override with GRAFT_SCALE_LO/HI)
on the same input and reports both throughputs + scaling efficiency
(speedup/4), appending the numbers to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("GRAFT_BENCH_TURNS", "1000000"))
SEED = 42


def _headline(corpus_dir: str) -> tuple[float, int]:
    import ray.data

    from ice_ray.config import PipelineConfig
    from ice_ray.pipelines.kg import build_kg

    cfg = PipelineConfig(
        # pool floor = NUM_CPUS-2: leave two slots for the read stage
        # (a floor equal to NUM_CPUS starves the upstream read; a low
        # floor pays the autoscale ramp — measured 90s → 78s at 16 cpus
        # on the 8M-turn job)
        annotator_concurrency=(max(1, NUM_CPUS // 2, NUM_CPUS - 2),
                               NUM_CPUS),
        annotator_batch_size=2048,
        tagger_concurrency=(1, max(2, NUM_CPUS // 4)),
        # the scaling runs disable the distinct-text memo so both levels
        # measure the same raw-compute job
        extract_cache_max=int(os.environ.get("GRAFT_EXTRACT_CACHE", "100000")),
    )
    # block count bounds map-operator parallelism: one actor task per block
    ds = ray.data.read_parquet(os.path.join(corpus_dir, "transcripts"),
                               columns=["conv_id", "turn_idx", "text"],
                               override_num_blocks=NUM_CPUS * 8)
    t0 = time.time()
    edges = build_kg(ds, cfg=cfg)
    n_edges = edges.count()
    return time.time() - t0, n_edges


def _query_timings() -> dict[str, float]:
    import __ray_entry__ as em

    import ray.data

    timings: dict[str, float] = {}
    picks = ["term_counts", "doc_dedup_exact", "minhash_neardup",
             "knn_cosine", "events_hourly", "sessions", "term_pmi",
             "events_last_order", "doc_repetition", "decontaminate",
             "pii_scrub", "cross_doc_ngrams", "pack_sequences",
             "token_percentiles", "doc_dedup_keep", "lm_score",
             "curate_keep", "bm25", "heavy_hitters",
             "jaccard_neardup", "event_band_join", "stratified_sample"]
    qs = em.queries()
    for name in picks:
        t0 = time.time()
        res = qs[name](SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.count()
        timings[name] = round(time.time() - t0, 3)
    return timings


def _calibration_probe(units: int | None = None) -> float:
    """Same-process raw-task probe: seconds to run `units` fixed CPU-bound
    Ray tasks with no data movement.  Emitted as `calibration_sec` so any
    bench window's numbers can be normalized against VM noise — a window
    where calibration_sec is 3x another window's explains 3x-slower
    unchanged queries without any code regression (VERDICT r3 item #1).
    Assumes ray is already initialized."""
    import ray

    units = units or int(os.environ.get("GRAFT_CALIBRATION_UNITS",
                                        str(NUM_CPUS * 3)))

    @ray.remote
    def busy(seed: int) -> int:
        import numpy as np
        acc = 0
        a = np.random.default_rng(seed).integers(0, 1 << 30, 200_000)
        for _ in range(60):
            acc ^= int((a * 2654435761 % 1000003).sum())
            a = (a * 48271) % (1 << 31)
        return acc

    ray.get([busy.remote(i) for i in range(NUM_CPUS)])  # warm workers
    t0 = time.time()
    ray.get([busy.remote(i) for i in range(units)])
    return round(time.time() - t0, 3)


def run_once() -> dict:
    import ray
    from ray.data import DataContext

    from ice_ray.sources.transcripts import materialize_corpus

    corpus_dir = materialize_corpus(N_TURNS, SEED)  # cached across runs
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        # window calibration BEFORE any pipeline work: raw-task seconds in
        # this exact process/VM window (see _calibration_probe docstring)
        calibration = _calibration_probe()
        # warm the page cache so we measure compute + shuffle, not first I/O
        import ray.data
        ray.data.read_parquet(os.path.join(corpus_dir, "transcripts")).count()
        sec, n_edges = _headline(corpus_dir)
        queries = _query_timings() if os.environ.get("GRAFT_BENCH_QUERIES", "1") == "1" else {}
        # a second probe after the work brackets the window: if post >>
        # pre, the window degraded mid-run and per-query numbers are noisy
        calibration_post = _calibration_probe()
    finally:
        ray.shutdown()
    return {
        "metric": "kg_pipeline_sec",
        "value": round(sec, 3),
        "unit": "sec",
        "calibration_sec": calibration,
        "calibration_post_sec": calibration_post,
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": N_TURNS,
        "turns_per_sec": round(N_TURNS / sec, 1),
        "edges": n_edges,
    }


def run_ceiling() -> dict:
    """Raw-task machine ceiling probe: embarrassingly parallel CPU-bound
    Ray tasks, no data movement — the hardware's upper bound for any
    pipeline's scaling efficiency at this num_cpus.  Run at both
    --scaling levels, it contextualizes the pipeline efficiency: on a
    shared VM the 4x-cpu leg loses disproportionately to noisy
    neighbors and memory-bandwidth contention that a real multi-node
    cluster (which adds bandwidth with nodes) does not share."""
    import ray

    units = int(os.environ.get("GRAFT_CEILING_UNITS", "96"))
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")

    @ray.remote
    def busy(seed: int) -> int:
        import numpy as np
        acc = 0
        a = np.random.default_rng(seed).integers(0, 1 << 30, 200_000)
        for _ in range(60):
            acc ^= int((a * 2654435761 % 1000003).sum())
            a = (a * 48271) % (1 << 31)
        return acc

    ray.get([busy.remote(i) for i in range(NUM_CPUS)])  # warm workers
    t0 = time.time()
    ray.get([busy.remote(i) for i in range(units)])
    dt = time.time() - t0
    ray.shutdown()
    return {"metric": "ceiling_units_per_sec",
            "value": round(units / dt, 2), "num_cpus": NUM_CPUS}


def run_scaling() -> dict:
    # bigger input for the scaling measurement so per-execution fixed
    # overheads don't mask the compute scaling (same input at both
    # levels; 8M amortizes the coref pass's ~20s of fixed cost — 4M
    # measured 0.794, 8M measured 0.848 vs the 0.845 machine ceiling)
    scale_turns = int(os.environ.get("GRAFT_SCALE_TURNS",
                                     str(max(N_TURNS, 8_000_000))))

    def sub(ncpu: int, *extra_args: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_QUERIES="0",
                   GRAFT_BENCH_TURNS=str(scale_turns),
                   GRAFT_EXTRACT_CACHE=os.environ.get("GRAFT_EXTRACT_CACHE", "0"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__),
                              *extra_args],
                             env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = int(os.environ.get("GRAFT_SCALE_LO", "4")), int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # bracket each pipeline leg with a ceiling probe at the same level:
    # the hardware bound moves with VM noise, so each scaling report
    # carries the window it was measured in
    c_lo = sub(lo, "--ceiling")["value"]
    r_lo = sub(lo)
    c_hi = sub(hi, "--ceiling")["value"]
    r_hi = sub(hi)
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    ceiling_eff = round(c_hi / (c_lo * hi / lo), 3)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "ceiling_lo": c_lo, "ceiling_hi": c_hi,
        "ceiling_efficiency": ceiling_eff,
        "efficiency_vs_ceiling": round(eff / ceiling_eff, 3) if ceiling_eff else None,
        "turns": scale_turns, "sf": SF_DIR,
    }
    _record_baseline(result)
    return result


def _record_baseline(result: dict, path: str | None = None) -> None:
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE.md")
    marker = "## Measured scaling (bench.py --scaling)"
    lo, hi = result["cpus_lo"], result["cpus_hi"]
    block = (f"\n{marker}\n\n"
             f"Same job, same input, fresh processes at N={lo} and 4N={hi} cpus\n"
             f"(`ray.init(num_cpus=...)`); efficiency = speedup / (hi/lo).\n"
             f"`ceiling` = raw CPU-bound Ray tasks at the same levels (the\n"
             f"hardware/VM-window bound on any pipeline's efficiency).\n\n"
             f"| turns | sec @{lo} cpus | sec @{hi} cpus | turns/s @{lo} | turns/s @{hi} | efficiency | ceiling | eff/ceiling |\n"
             f"|---|---|---|---|---|---|---|---|\n"
             f"| {result['turns']} | {result['sec_lo']} | {result['sec_hi']} "
             f"| {result['turns_per_sec_lo']} | {result['turns_per_sec_hi']} "
             f"| {result['value']} | {result['ceiling_efficiency']} "
             f"| {result['efficiency_vs_ceiling']} |\n")
    try:
        text = open(path).read()
        if marker in text:
            # replace ONLY this section (marker -> next "## " heading or
            # EOF) so narrative after it survives re-runs; an earlier
            # truncate-to-EOF version of this writer silently deleted
            # everything below the marker.
            start = text.index(marker)
            nxt = text.find("\n## ", start + len(marker))
            tail = text[nxt + 1:] if nxt != -1 else ""
            text = (text[:start].rstrip("\n") + "\n" + block
                    + ("\n" + tail if tail else ""))
        else:
            text = text.rstrip("\n") + "\n" + block
        open(path, "w").write(text)
    except OSError:
        pass


if __name__ == "__main__":
    if "--ceiling" in sys.argv:
        print(json.dumps(run_ceiling()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
