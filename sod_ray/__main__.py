"""CLI entry point — the ``ray job submit`` surface:

    ray job submit -- python -m sod_ray \\
        --input /data/webpages --out /data/run1 \\
        [--refs /data/webpage_refs] [--waves 4] [--num-cpus 32] \\
        [--intermediate-dir /data/tmp] [--no-resume]

    ray job submit -- python -m sod_ray export \\
        --input /data/webpages --out /data/curated \\
        [--url-col url] [--neardup] [--line-dedup] [--no-pii] \\
        [--partition-col lang] [--num-cpus 32] [--no-resume]

Default mode validates (per-partition verdicts, exit 0 iff all
constraints passed); ``export`` runs the curation funnel
(pipelines/export.py) and prints the report JSON. This script OWNS the
Ray session (guarded init — under ``ray job submit`` the cluster
already exists and ``ray.init()`` attaches to it)."""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus=None, object_store_gb=None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kwargs.update(address="local", num_cpus=num_cpus)
        if object_store_gb:
            kwargs.update(object_store_memory=int(object_store_gb * (1 << 30)))
        ray.init(**kwargs)


def main_export(argv) -> int:
    p = argparse.ArgumentParser(prog="sod_ray export")
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--out", required=True, help="output/checkpoint dir")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--url-col", default=None, help="enables canonical-URL dedup")
    p.add_argument("--no-quality", action="store_true")
    p.add_argument("--no-exact", action="store_true")
    p.add_argument("--no-pii", action="store_true")
    p.add_argument("--neardup", action="store_true")
    p.add_argument("--line-dedup", action="store_true")
    p.add_argument(
        "--overlap-dedup", action="store_true",
        help="winnow-overlap containment dedup (doc-inside-doc)",
    )
    p.add_argument("--overlap-min-shared", type=int, default=20)
    p.add_argument("--overlap-fp-sample", type=int, default=1)
    p.add_argument("--jaccard-threshold", type=float, default=0.7)
    p.add_argument(
        "--neardup-emission", choices=["star", "pairs"], default="star",
        help="LSH candidate emission: star (volume ~ bucket members; "
        "default) or pairs (exhaustive, for marginal/chain families)",
    )
    p.add_argument("--partition-col", default=None)
    p.add_argument(
        "--token-budget", type=int, default=None,
        help="per-key token-budget cut over funnel survivors "
        "(keep highest-quality first; see stages/budget.py)",
    )
    p.add_argument(
        "--token-budget-key", default=None,
        help="key column for --token-budget (None = one global budget)",
    )
    p.add_argument(
        "--dsir-keep", type=int, default=None,
        help="DSIR selection: keep this many most-target-like docs "
        "among funnel survivors (needs --dsir-target-col/-value)",
    )
    p.add_argument("--dsir-target-col", default=None)
    p.add_argument("--dsir-target-value", default=None)
    p.add_argument(
        "--pack-chunk-tokens", type=int, default=None,
        help="emit a chunks/ training manifest: per-doc concat-and-"
        "chunk spans at this many tokens per chunk",
    )
    p.add_argument(
        "--decontaminate-file", default=None,
        help="text file (one benchmark document per line); drop corpus "
        "docs sharing any word n-gram with it",
    )
    p.add_argument("--decontaminate-n", type=int, default=13)
    p.add_argument(
        "--shuffle-seed", type=int, default=None,
        help="deterministic global shuffle of the curated corpus before "
        "the write (full all-to-all — opt-in)",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument(
        "--object-store-gb", type=float, default=None,
        help="cap Ray's object store (GiB) — exercises the spill path",
    )
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)
    _init_ray(args.num_cpus, args.object_store_gb)
    import ray

    from sod_ray.pipelines.export import CurateConfig, run_export

    decon = None
    if args.decontaminate_file:
        with open(args.decontaminate_file) as f:
            decon = [ln.strip() for ln in f if ln.strip()]
        if not decon:
            p.error(
                f"--decontaminate-file {args.decontaminate_file} contains "
                "no benchmark text — refusing to silently skip "
                "decontamination"
            )
    cfg = CurateConfig(
        text_col=args.text_col,
        id_col=args.id_col,
        url_col=args.url_col,
        decontaminate_texts=decon,
        decontaminate_n=args.decontaminate_n,
        quality_filter=not args.no_quality,
        url_dedup=args.url_col is not None,
        exact_dedup=not args.no_exact,
        neardup=args.neardup,
        overlap_dedup=args.overlap_dedup,
        overlap_min_shared=args.overlap_min_shared,
        overlap_fp_sample=args.overlap_fp_sample,
        lsh_kwargs={"pair_emission": args.neardup_emission},
        line_dedup=args.line_dedup,
        pii_redact=not args.no_pii,
        jaccard_threshold=args.jaccard_threshold,
        partition_col=args.partition_col,
        shuffle_seed=args.shuffle_seed,
        token_budget=args.token_budget,
        token_budget_key=args.token_budget_key,
        dsir_keep=args.dsir_keep,
        dsir_target_col=args.dsir_target_col,
        dsir_target_value=args.dsir_target_value,
        pack_chunk_tokens=args.pack_chunk_tokens,
    )
    res = run_export(args.input, args.out, cfg, resume=not args.no_resume)
    print(json.dumps(res.report))
    ray.shutdown()
    return 0


def main_export_incremental(argv) -> int:
    """Continuous curation: poll a landing directory of parquet shards,
    run the export funnel per arrival batch with cross-batch exact
    dedup against the accumulated corpus hash index."""
    p = argparse.ArgumentParser(prog="sod_ray export-incremental")
    p.add_argument("--landing", required=True, help="landing dir (parquet shards)")
    p.add_argument("--out", required=True, help="output root (batches + hash index)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--no-quality", action="store_true")
    p.add_argument("--no-exact", action="store_true")
    p.add_argument("--no-pii", action="store_true")
    p.add_argument("--neardup", action="store_true")
    p.add_argument(
        "--cross-batch-neardup", action="store_true",
        help="also drop arrivals whose MinHash signature near-matches "
        "any previously-ingested doc (accumulated signature index)",
    )
    p.add_argument("--line-dedup", action="store_true")
    p.add_argument("--interval-s", type=float, default=1.0)
    p.add_argument("--max-polls", type=int, default=None)
    p.add_argument(
        "--max-empty-polls", type=int, default=1,
        help="stop after this many consecutive empty polls",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--object-store-gb", type=float, default=None)
    args = p.parse_args(argv)
    _init_ray(args.num_cpus, args.object_store_gb)
    import ray

    from sod_ray.pipelines.export import CurateConfig, run_export_incremental

    cfg = CurateConfig(
        text_col=args.text_col,
        id_col=args.id_col,
        quality_filter=not args.no_quality,
        exact_dedup=not args.no_exact,
        neardup=args.neardup,
        line_dedup=args.line_dedup,
        pii_redact=not args.no_pii,
    )
    summary = run_export_incremental(
        args.landing,
        args.out,
        cfg,
        interval_s=args.interval_s,
        max_polls=args.max_polls,
        max_empty_polls=args.max_empty_polls,
        cross_batch_neardup=args.cross_batch_neardup,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "export":
        return main_export(argv[1:])
    if argv and argv[0] == "export-incremental":
        return main_export_incremental(argv[1:])
    return main_validate(argv)


def main_validate(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sod_ray")
    p.add_argument("--input", required=True, help="webpages parquet dir")
    p.add_argument("--out", required=True, help="output/checkpoint dir")
    p.add_argument("--refs", default=None, help="webpage_refs parquet dir")
    p.add_argument("--part-key", default="lang")
    p.add_argument(
        "--part-key-expr", default=None, choices=["host"],
        help="derive the partition key from url (e.g. host) instead of "
        "reading a physical column",
    )
    p.add_argument("--waves", type=int, default=None, help="partitions per wave")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument(
        "--object-store-gb", type=float, default=None,
        help="cap Ray's object store (GiB) — exercises the auto-spill "
        "path (slim table lands on disk instead of pinning the store)",
    )
    p.add_argument("--intermediate-dir", default=None)
    p.add_argument(
        "--baseline", default=None,
        help="baseline.parquet from a previous run (enables drift checks)",
    )
    p.add_argument(
        "--quality-check", action="store_true",
        help="also compute the Gopher-style per-doc quality flag in the "
        "fused pass and add a per-partition `quality` verdict",
    )
    p.add_argument("--max-low-quality-rate", type=float, default=0.5)
    p.add_argument(
        "--normalize-urls", action="store_true",
        help="uniqueness over canonical urls (strip fragment/utm/"
        "trailing slash, lowercase scheme+host) instead of raw urls",
    )
    p.add_argument(
        "--quantile-sketch", choices=("tdigest", "kll"), default="tdigest",
        help="quantile backend for the per-column sketches (kll = "
        "uniform rank guarantee; don't switch mid-resume)",
    )
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        if args.object_store_gb:
            kwargs.update(
                object_store_memory=int(args.object_store_gb * (1 << 30))
            )
        ray.init(**kwargs)

    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    cfg = ValidateConfig(
        part_key=args.part_key,
        part_key_expr=args.part_key_expr,
        partitions_per_wave=args.waves,
        refs_path=args.refs,
        intermediate_dir=args.intermediate_dir,
        baseline_path=args.baseline,
        quality_check=args.quality_check,
        max_low_quality_rate=args.max_low_quality_rate,
        normalize_urls=args.normalize_urls,
        quantile_sketch=args.quantile_sketch,
    )
    res = run_validation(args.input, args.out, cfg, resume=not args.no_resume)
    vdf = res.verdicts.to_pandas()
    if len(vdf):
        print(vdf.to_string(index=False))
    passed = bool(res.all_passed()) if len(vdf) else True
    if res.referential is not None:
        passed = passed and res.referential.get("referential") == "pass"
        print(f"referential: {res.referential}")
    print(
        json.dumps(
            {
                "partitions_run": len(res.partitions_run),
                "partitions_skipped": len(res.partitions_skipped),
                "rows_scanned": res.rows_scanned,
                "all_passed": passed,
                "out_dir": res.out_dir,
            }
        )
    )
    ray.shutdown()
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
