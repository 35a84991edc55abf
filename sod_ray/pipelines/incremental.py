"""Continuous ingest → validate loop: the landing zone (S3 scrape
analog) feeding the flagship constraint suite run after run — the
batch engine's answer to the reference's long-running service mode
(/root/reference/internal/scrape/scrape.go:105-130 ticker +
dispatcher COLLECT path).

Each poll's new shards validate as ONE run into a deterministic
per-batch output directory (run id = content hash of the shard list,
so a crashed callback retries into the SAME directory and the
partition manifest skips whatever already committed — at-least-once
end to end, exactly-once effects). Every run's merged sketches fold
into a rolling ``baseline.parquet`` at the root, so run N+1 gets
drift verdicts (PSI/KS) against the history of runs 1..N without
recomputing anything.
"""

from __future__ import annotations

import hashlib
import os

from ..sources.landing import LandingZone
from .validate import ValidateConfig, run_validation, save_baseline


def _run_id(files: list[str]) -> str:
    h = hashlib.sha1("\n".join(sorted(files)).encode()).hexdigest()[:12]
    return f"run-{h}"


def run_incremental(
    landing_dir: str,
    out_root: str,
    cfg: ValidateConfig | None = None,
    interval_s: float = 0.2,
    max_polls: int | None = None,
    max_empty_polls: int | None = 1,
    quarantine_grace_s: float = 5.0,
    categorical_columns: tuple = (),
) -> dict:
    """Poll the landing zone until ``max_empty_polls`` consecutive
    empty polls (or ``max_polls``); validate each arrival batch;
    roll the drift baseline forward. Returns a summary with per-run
    results. Shards that are unreadable or missing flagship columns
    are quarantined by the landing zone (reported in the summary)
    rather than wedging the loop.

    ``categorical_columns`` (e.g. ``("lang",)``) additionally rolls a
    CATEGORICAL drift baseline: each run's string-column value mixes
    (Misra–Gries summaries, one scan) score against the accumulated
    ``categorical_baseline.parquet`` via categorical PSI — lang/host
    mix shift detection across arrival batches; per-run outcomes land
    in the summary's ``categorical_drift``."""
    from .validate import WEBPAGE_SCHEMA

    os.makedirs(out_root, exist_ok=True)
    lz = LandingZone(
        landing_dir,
        expected_columns=list(WEBPAGE_SCHEMA),
        quarantine_grace_s=quarantine_grace_s,
    )
    baseline_path = os.path.join(out_root, "baseline.parquet")
    cat_baseline_path = os.path.join(out_root, "categorical_baseline.parquet")
    runs: list[dict] = []

    def validate_batch(ds, files):
        # re-derive the file list as absolute paths; run_validation
        # re-reads them itself (resume-filtered) rather than consuming
        # the polled Dataset — the manifest needs the real input paths
        paths = [os.path.join(lz.landing_dir, f) for f in files]
        rid = _run_id(files)
        out_dir = os.path.join(out_root, rid)
        run_cfg = ValidateConfig(
            **{
                **(cfg.__dict__ if cfg else {}),
                "baseline_path": baseline_path
                if os.path.exists(baseline_path)
                else None,
            }
        )
        res = run_validation(paths, out_dir, run_cfg, resume=True)
        # fold this run's sketches into the rolling baseline (merge —
        # earlier runs' (key, column) rows survive)
        if res.stats is not None and res.stats.num_rows:
            save_baseline(res.stats.to_pandas(), baseline_path)
        cat_out = None
        if categorical_columns:
            import ray.data as rd

            from ..stages.drift import (
                categorical_drift_check,
                load_categorical_baseline,
                save_categorical_baseline,
            )

            cds = rd.read_parquet(paths, columns=list(categorical_columns))
            base = (
                load_categorical_baseline(cat_baseline_path)
                if os.path.exists(cat_baseline_path)
                else None
            )
            summaries, res_t = categorical_drift_check(
                cds, list(categorical_columns), base
            )
            save_categorical_baseline(summaries, cat_baseline_path)
            cat_out = {
                c: bool(d)
                for c, d in zip(
                    res_t["column"].to_pylist(), res_t["drifted"].to_pylist()
                )
            }
        runs.append(
            {
                "run_id": rid,
                "files": files,
                "rows": res.rows_scanned,
                "partitions": len(res.partitions_run) + len(res.partitions_skipped),
                "partitions_resumed": len(res.partitions_skipped),
                "all_passed": res.all_passed(),
                "categorical_drift": cat_out,
                "out_dir": out_dir,
            }
        )

    n = lz.run_loop(
        validate_batch,
        interval_s=interval_s,
        max_polls=max_polls,
        max_empty_polls=max_empty_polls,
    )
    return {
        "shards_processed": n,
        "runs": runs,
        "quarantined": lz.quarantined(),
        "baseline_path": baseline_path if os.path.exists(baseline_path) else None,
    }
