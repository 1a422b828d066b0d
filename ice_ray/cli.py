"""Command-line entry point — the `icecli` analog (views/cli/IceCLI.java:
35-209 command dispatch), operating on parquet corpora instead of
directories of SGML files.

Commands:
  preprocess    transcripts → annotation cache (addCorpus/preprocess)
  relations     annotations/transcripts → path counts (findPhrases)
  events        transcripts → tree counts (findTrees)
  terms         annotations → ranked terms (findEntities)
  index         annotations → PMI index (indexEntities)
  expand        PMI index + seeds → expanded entity set (expandEntitySet)
  bootstrap     paths + seed path → candidate patterns (bootstrapRelation)
  event-bootstrap  trees + seed signature → candidate event patterns
  kg            transcripts → edge table (the flagship; resumable)
  refresh       incremental re-extraction after an entity-set change
  gen-corpus    write the deterministic synthetic transcripts corpus

This module owns a Ray session (guarded init/shutdown) — the only
library-adjacent code allowed to, per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ice-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("gen-corpus")
    sp.add_argument("--turns", type=int, default=100_000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", default="/tmp/ice_ray_corpus")

    for name in ("preprocess", "relations", "events", "terms", "index", "kg"):
        sp = sub.add_parser(name)
        sp.add_argument("--input", required=True, help="transcripts parquet dir/file")
        sp.add_argument("--out", required=True)
        if name == "kg":
            sp.add_argument("--no-resume", action="store_true")
            sp.add_argument("--group-size", type=int, default=8)
            sp.add_argument("--partitions", type=int, default=64)

    sp = sub.add_parser("refresh")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True, help="existing kg output dir")
    sp.add_argument("--terms", required=True,
                    help="comma-separated changed entity-set terms")
    sp.add_argument("--entity-set", default=None,
                    help="TYPE=phrase1,phrase2 extra entity set")
    sp.add_argument("--group-size", type=int, default=8)

    sp = sub.add_parser("expand")
    sp.add_argument("--index", required=True, help="PMI index parquet dir")
    sp.add_argument("--seeds", required=True, help="comma-separated seed terms")
    sp.add_argument("--rounds", type=int, default=3)

    sp = sub.add_parser("bootstrap")
    sp.add_argument("--input", required=True, help="transcripts parquet dir/file")
    sp.add_argument("--seed-path", required=True)

    sp = sub.add_parser("event-bootstrap")
    sp.add_argument("--input", required=True, help="transcripts parquet dir/file")
    sp.add_argument("--seed-core", required=True,
                    help='value-stripped tree signature, e.g. '
                         '"discuss nsubj:OTHER dobj:OTHER"')

    sp = sub.add_parser("curate")
    sp.add_argument("--input", required=True,
                    help="documents parquet dir/file (doc_id, text)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--quality-min", type=float, default=0.6)
    sp.add_argument("--budget", type=int, default=2048)
    sp.add_argument("--bench-mod", type=int, default=50)

    args = p.parse_args(argv)

    if args.cmd == "gen-corpus":
        from ice_ray.sources.transcripts import materialize_corpus
        out = materialize_corpus(args.turns, args.seed, args.out)
        print(json.dumps({"corpus_dir": out}))
        return 0

    if getattr(args, "input", None) is not None and not os.path.exists(args.input):
        print(json.dumps({"error": f"input not found: {args.input}"}),
              file=sys.stderr)
        return 2

    _ray_session(args.num_cpus)
    import ray
    import ray.data

    try:
        if args.cmd == "preprocess":
            from ice_ray.pipelines.preprocess import preprocess_to_cache
            path = preprocess_to_cache(ray.data.read_parquet(args.input), args.out)
            print(json.dumps({"cache": path}))
        elif args.cmd == "relations":
            from ice_ray.pipelines.kg import extract_paths
            from ice_ray.pipelines.relations import path_type_counts
            ds = ray.data.read_parquet(args.input)
            counts = path_type_counts(extract_paths(ds))
            counts.write_parquet(args.out, mode="overwrite")
            print(json.dumps({"paths": args.out}))
        elif args.cmd == "events":
            from ice_ray.pipelines.events import extract_trees, tree_type_counts
            ds = ray.data.read_parquet(args.input)
            tree_type_counts(extract_trees(ds)).write_parquet(args.out, mode="overwrite")
            print(json.dumps({"events": args.out}))
        elif args.cmd == "terms":
            from ice_ray.pipelines.preprocess import annotate
            from ice_ray.pipelines.terms import ice_term_counts
            ds = ray.data.read_parquet(args.input)
            ice_term_counts(annotate(ds)).write_parquet(args.out, mode="overwrite")
            print(json.dumps({"terms": args.out}))
        elif args.cmd == "index":
            from ice_ray.pipelines.entity_index import build_pmi_index
            from ice_ray.pipelines.preprocess import annotate
            ds = ray.data.read_parquet(args.input)
            build_pmi_index(annotate(ds)).write_parquet(args.out, mode="overwrite")
            print(json.dumps({"index": args.out}))
        elif args.cmd == "expand":
            from ice_ray.pipelines.expand import expand_entity_set
            index = ray.data.read_parquet(args.index)
            out = expand_entity_set(index, args.seeds.split(","), rounds=args.rounds)
            print(json.dumps({"expanded": out}))
        elif args.cmd == "bootstrap":
            from ice_ray.pipelines.bootstrap import bootstrap_shared_args
            from ice_ray.pipelines.kg import extract_paths
            ds = ray.data.read_parquet(args.input)
            out = bootstrap_shared_args(extract_paths(ds).materialize(),
                                        [args.seed_path])
            print(out.to_json(orient="records") if out is not None else "[]")
        elif args.cmd == "event-bootstrap":
            from ice_ray.pipelines.events import (
                event_bootstrap_shared_args,
                extract_trees,
            )
            ds = ray.data.read_parquet(args.input)
            trees = extract_trees(ds, emit_args=True).materialize()
            out = event_bootstrap_shared_args(trees, [args.seed_core])
            print(out.to_json(orient="records") if out is not None else "[]")
        elif args.cmd == "kg":
            from ice_ray.pipelines.kg import run_kg_job
            files = sorted(
                os.path.join(args.input, f) for f in os.listdir(args.input)
                if f.endswith(".parquet")) if os.path.isdir(args.input) else [args.input]
            stats = run_kg_job(files, args.out, group_size=args.group_size,
                               resume=not args.no_resume)
            print(json.dumps(stats))
        elif args.cmd == "curate":
            from ice_ray.pipelines.curate import curate_corpus
            docs = ray.data.read_parquet(args.input,
                                         columns=["doc_id", "text"])
            packed = curate_corpus(docs, quality_min=args.quality_min,
                                   bench_mod=args.bench_mod,
                                   budget=args.budget, out_dir=args.out)
            n = packed.count()
            print(json.dumps({"docs_kept": int(n), "out": args.out}))
        elif args.cmd == "refresh":
            from ice_ray.pipelines.kg import refresh_kg_job
            files = sorted(
                os.path.join(args.input, f) for f in os.listdir(args.input)
                if f.endswith(".parquet")) if os.path.isdir(args.input) else [args.input]
            extra = None
            if args.entity_set:
                etype, _, phrases = args.entity_set.partition("=")
                extra = {etype: [x for x in phrases.split(",") if x]}
            stats = refresh_kg_job(files, args.out,
                                   changed_terms=args.terms.split(","),
                                   extra_entity_sets=extra,
                                   group_size=args.group_size)
            print(json.dumps(stats))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
