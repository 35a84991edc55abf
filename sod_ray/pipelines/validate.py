"""The flagship pipeline: a per-partition data-quality pass over a
Common-Crawl-style web table (BASELINE.json north_star, SURVEY.md §3.1
translated to one streaming Ray Data DAG).

    read_parquet (resume-filtered, columns pruned)
      → schema check (metadata only)
      → extraction-invariant check (html→text byte-identity) ─ violations
      → project html AWAY (wide payloads never reach a shuffle)
      → text features (actor pool)
      → per-batch sketch partials → groupby(part_key) merge  (stats)
      → null rates / uniqueness HLL (+ exact fallback)        (constraints)
      → windowed z-score peak scorer per partition            (outliers)
      → optional drift check vs baseline sketches (actor pool)
      → write violations sidecar parquet (one dir per partition)
      → per-partition verdicts + manifest commit (atomic rename)

The manifest (sod_ray.state.manifest) makes a killed run resume from
the last committed partition without rescanning: committed partitions
are filtered OUT of the parquet read via a pushed-down filter
expression, so their row groups never leave storage.

The reference analog of each step is cited in the stage modules; the
verdict/violation shapes map sod's Conclusion/Alert
(/root/reference/internal/predictor/predictor.go:36-38,
/root/reference/internal/alert/model/alert_model.go:19-24).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..state.manifest import Manifest, PartitionRecord
from ..stages.constraints import null_rates, schema_check, uniqueness_estimate
from ..stages.stats import column_stats
from ..stages.textstage import TextFeatures, extract_text_batch
from ..stages.window import windowed_zscore

WEBPAGE_SCHEMA = {
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "text": pa.string(),
    "lang": pa.string(),
}


@dataclass
class ValidateConfig:
    part_key: str = "lang"
    stat_columns: tuple = ("n_chars", "n_tokens")
    zscore_value: str = "n_chars"
    zscore_window: int = 64
    zscore_min_periods: int = 8
    zscore_threshold: float = 3.0
    max_null_rate: float = 0.01
    max_dup_rate: float = 0.005
    max_extract_mismatch_rate: float = 0.01
    max_peak_rate: float = 0.02
    batch_size: int = 4096
    feature_concurrency: tuple = (2, 8)
    baseline: dict | None = None  # (key, col) -> sketch bytes for drift


@dataclass
class ValidationResult:
    verdicts: "pa.Table"
    stats: "pa.Table"
    partitions_run: list = field(default_factory=list)
    partitions_skipped: list = field(default_factory=list)
    rows_scanned: int = 0
    out_dir: str = ""

    def all_passed(self) -> bool:
        return bool(pc.all(self.verdicts["passed"]).as_py())


def list_partitions(input_path: str, part_key: str) -> list[str]:
    """Distinct partition keys via a column-pruned pyarrow scan (reads
    only the key column's row groups — cheap relative to the run)."""
    dataset = pads.dataset(input_path, format="parquet")
    vals = set()
    for batch in dataset.to_batches(columns=[part_key]):
        vals.update(pc.unique(batch.column(0)).to_pylist())
    return sorted(v for v in vals if v is not None)


def run_validation(
    input_path: str,
    out_dir: str,
    cfg: ValidateConfig | None = None,
    resume: bool = True,
) -> ValidationResult:
    """Run the full constraint suite. Ray must already be initialised
    by the caller (driver contract)."""
    import ray.data as rd

    cfg = cfg or ValidateConfig()
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(os.path.join(out_dir, "manifest"))

    all_parts = list_partitions(input_path, cfg.part_key)
    done = manifest.committed_partitions() if resume else set()
    remaining = [p for p in all_parts if p not in done]
    result = ValidationResult(
        verdicts=None,
        stats=None,
        partitions_skipped=sorted(done),
        partitions_run=remaining,
        out_dir=out_dir,
    )
    if not remaining:
        result.verdicts = _load_verdicts(out_dir)
        result.stats = pa.table({})
        return result

    # wipe any partial output of uncommitted partitions (atomic resume)
    for p in remaining:
        shutil.rmtree(
            os.path.join(out_dir, "violations", f"{cfg.part_key}={p}"),
            ignore_errors=True,
        )

    # --- read: prune to the remaining partitions at the row-group level
    ds = rd.read_parquet(
        input_path,
        filter=pc.field(cfg.part_key).isin(remaining),
    )

    schema_verdict = schema_check(ds, WEBPAGE_SCHEMA)

    # --- extraction invariant; then html is DROPPED before anything wide
    extracted = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    slim = extracted.drop_columns(["html", "extracted_text"])
    featured = slim.map_batches(
        TextFeatures,
        batch_format="pandas",
        batch_size=cfg.batch_size,
        concurrency=cfg.feature_concurrency,
    )

    # --- stats + constraints (each consumes the shared featured stream;
    # Ray Data will recompute lineage per consumer — acceptable because
    # the scan is columnar and the stages are cheap; at true scale you'd
    # write `featured` to an intermediate parquet once instead)
    stats_tbl = (
        column_stats(featured, list(cfg.stat_columns), key=cfg.part_key)
        .to_pandas()
    )
    # html nulls need the pre-drop dataset:
    nulls_tbl = null_rates(
        extracted.drop_columns(["extracted_text"]),
        ["url", "warc_ts", "html", "text"],
        key=cfg.part_key,
    ).to_pandas()
    uniq_tbl = uniqueness_estimate(slim, "url", key=cfg.part_key).to_pandas()

    # extraction mismatches per partition (violation rows)
    mismatches = featured.map_batches(
        lambda t: t.filter(pc.invert(t["extract_match"])),
        batch_format="pyarrow",
    )

    # windowed peaks per partition (violation rows)
    peaks = windowed_zscore(
        featured,
        key=cfg.part_key,
        ts_col="warc_ts",
        value_col=cfg.zscore_value,
        id_cols=["url"],
        window=cfg.zscore_window,
        min_periods=cfg.zscore_min_periods,
        threshold=cfg.zscore_threshold,
    )

    # --- violations sidecar: one directory per partition (resumable)
    viol_dir = os.path.join(out_dir, "violations")
    mismatch_pdf = mismatches.select_columns(
        [cfg.part_key, "url", "warc_ts", "extract_match"]
    ).to_pandas()
    peaks_pdf = peaks.to_pandas()

    import pandas as pd

    mismatch_pdf["violation"] = "extract_mismatch"
    peaks_pdf["violation"] = "peak"
    viol_cols = [cfg.part_key, "url", "violation"]
    violations = pd.concat(
        [mismatch_pdf[viol_cols], peaks_pdf[viol_cols]], ignore_index=True
    )

    # --- drift (optional)
    drift_tbl = None
    if cfg.baseline:
        from ..stages.drift import drift_check

        drift_tbl = drift_check(
            column_stats(featured, list(cfg.stat_columns), key=cfg.part_key),
            cfg.baseline,
        ).to_pandas()

    # --- per-partition verdicts + manifest commit
    verdict_rows = []
    total_rows = 0
    for p in remaining:
        p_stats = stats_tbl[stats_tbl["part_key"] == p]
        p_nulls = nulls_tbl[nulls_tbl["part_key"] == p]
        p_uniq = uniq_tbl[uniq_tbl["part_key"] == p]
        p_viol = violations[violations[cfg.part_key] == p]
        rows = int(p_uniq["rows"].iloc[0]) if len(p_uniq) else 0
        total_rows += rows

        outcomes = {"schema": "pass" if schema_verdict["passed"] else "fail"}
        html_null_rate = float(
            p_nulls[p_nulls["column"] == "html"]["null_rate"].iloc[0]
        ) if len(p_nulls) else 0.0
        outcomes["null_rate"] = (
            "pass" if html_null_rate <= cfg.max_null_rate else "fail"
        )
        dup_est = float(p_uniq["dup_est"].iloc[0]) if len(p_uniq) else 0.0
        outcomes["uniqueness"] = (
            "pass" if dup_est <= cfg.max_dup_rate * max(rows, 1) else "fail"
        )
        n_mismatch = int((p_viol["violation"] == "extract_mismatch").sum())
        outcomes["extraction"] = (
            "pass"
            if n_mismatch <= cfg.max_extract_mismatch_rate * max(rows, 1)
            else "fail"
        )
        n_peaks = int((p_viol["violation"] == "peak").sum())
        outcomes["peaks"] = (
            "pass" if n_peaks <= cfg.max_peak_rate * max(rows, 1) else "fail"
        )
        if drift_tbl is not None:
            p_drift = drift_tbl[
                (drift_tbl["part_key"] == p) & drift_tbl["has_baseline"]
            ]
            outcomes["drift"] = (
                "fail" if len(p_drift) and p_drift["drifted"].any() else "pass"
            )

        # write this partition's violations (its own directory)
        pdir = os.path.join(viol_dir, f"{cfg.part_key}={p}")
        os.makedirs(pdir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(p_viol, preserve_index=False),
            os.path.join(pdir, "part-0.parquet"),
        )

        sketch_bytes = int(
            p_stats["sketch_bytes"].sum()
        ) if "sketch_bytes" in p_stats else 0
        rec = PartitionRecord(
            partition=p,
            rows_scanned=rows,
            rows_violating=len(p_viol),
            constraint_outcomes=outcomes,
            outputs=[pdir],
            sketch_bytes=sketch_bytes,
        )
        manifest.commit(rec)
        verdict_rows.append(
            {
                "partition": p,
                "rows": rows,
                "violations": len(p_viol),
                "passed": all(v == "pass" for v in outcomes.values()),
                **{f"c_{k}": v for k, v in outcomes.items()},
            }
        )

    verdicts = pa.Table.from_pylist(verdict_rows) if verdict_rows else pa.table({})
    import pyarrow.parquet as pq

    pq.write_table(verdicts, os.path.join(out_dir, f"verdicts-{len(done)}.parquet"))
    result.verdicts = verdicts
    result.stats = pa.Table.from_pandas(
        stats_tbl.drop(columns=["welford", "tdigest", "hll"]), preserve_index=False
    )
    result.rows_scanned = total_rows
    return result


def _load_verdicts(out_dir: str):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "verdicts-*.parquet")))
    if not files:
        return pa.table({})
    return pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
