"""The flagship pipeline: a per-partition data-quality pass over a
Common-Crawl-style web table (BASELINE.json north_star, SURVEY.md §3.1
translated to Ray Data).

    read_parquet (resume-filtered, row-group pruned)
      → ONE fused actor-pool stage: html→text extraction + byte-identity
        check + null flags + text features; html DROPPED on output
        (wide payloads never reach a shuffle or the object store twice)
      → materialize the slim feature table ONCE (numeric + keys only;
        ~1-2% of input bytes) — every downstream constraint consumes it
        without recomputing the scan
      → per-batch sketch partials → groupby(part_key) merge   (stats)
      → flag-sum aggregates (null rates), HLL uniqueness      (constraints)
      → windowed z-score peak scorer per partition            (outliers)
      → optional drift check vs baseline sketches (actor pool)
      → violations sidecar parquet (one dir per partition)
      → per-partition verdicts + manifest commit (atomic rename)

At 100 TB the materialize step becomes a write of the slim feature
table to intermediate parquet (same shape, spillable); everything else
is unchanged — the shuffles only ever carry sketch rows, flag counts
and violation rows.

Resume: committed partitions are filtered OUT of the parquet read via a
pushed-down filter expression (their row groups never leave storage);
see sod_ray.state.manifest.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..state.manifest import Manifest, PartitionRecord
from ..stages.constraints import schema_check, uniqueness_estimate
from ..stages.stats import column_stats
from ..stages.window import windowed_zscore

WEBPAGE_SCHEMA = {
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "text": pa.string(),
    "lang": pa.string(),
}


class FusedFeatures:
    """One actor-pool pass per batch: extraction invariant + null flags
    + text features. Regexes compiled once per actor. Output is the slim
    feature table — html and text are dropped here."""

    def __init__(self):
        import re

        from ..functions import text as T

        self._T = T
        self.token = re.compile(r"\S+")
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.punct = re.compile(r"[^\w\s]", re.UNICODE)
        self.stop_en = frozenset(T._STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        texts = batch["text"].to_pylist()
        extract = self._T.extract_text
        match = np.fromiter(
            (
                (h is not None and t is not None and extract(h) == t)
                for h, t in zip(htmls, texts)
            ),
            dtype=bool,
            count=len(htmls),
        )
        html_null = np.fromiter((h is None for h in htmls), dtype=bool, count=len(htmls))
        text_null = np.fromiter((t is None for t in texts), dtype=bool, count=len(texts))
        n_chars = np.fromiter(
            (len(t) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
        )
        tok = self.token
        n_tokens = np.fromiter(
            (len(tok.findall(t)) if t else 0 for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "extract_match": pa.array(match),
                "html_null": pa.array(html_null),
                "text_null": pa.array(text_null),
            }
        )


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
    feature_concurrency: tuple = (1, 16)
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
    only the key column — cheap relative to the run)."""
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

    for p in remaining:  # wipe partial output of uncommitted partitions
        shutil.rmtree(
            os.path.join(out_dir, "violations", f"{cfg.part_key}={p}"),
            ignore_errors=True,
        )

    ds = rd.read_parquet(
        input_path,
        filter=pc.field(cfg.part_key).isin(remaining),
    )
    schema_verdict = schema_check(ds, WEBPAGE_SCHEMA)

    # ONE scan: fused extraction + features; html dropped inside the stage.
    featured = ds.map_batches(
        FusedFeatures,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.feature_concurrency,
    ).materialize()  # slim table; at 100TB: write to intermediate parquet

    # --- consumers of the materialized feature table (no recompute) ---
    from ray.data.aggregate import Count, Sum

    stats_tbl = column_stats(
        featured, list(cfg.stat_columns), key=cfg.part_key
    ).to_pandas()

    flags = (
        featured.groupby(cfg.part_key)
        .aggregate(
            Count(alias_name="rows"),
            Sum("html_null", alias_name="html_nulls"),
            Sum("text_null", alias_name="text_nulls"),
            Sum("extract_match", alias_name="extract_matches"),
        )
        .to_pandas()
        .set_index(cfg.part_key)
    )

    uniq_tbl = uniqueness_estimate(featured, "url", key=cfg.part_key).to_pandas()

    mismatch_pdf = (
        featured.map_batches(
            lambda t: t.filter(pc.invert(t["extract_match"])).select(
                [cfg.part_key, "url"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    peaks_pdf = windowed_zscore(
        featured,
        key=cfg.part_key,
        ts_col="warc_ts",
        value_col=cfg.zscore_value,
        id_cols=["url"],
        window=cfg.zscore_window,
        min_periods=cfg.zscore_min_periods,
        threshold=cfg.zscore_threshold,
    ).to_pandas()

    mismatch_pdf["violation"] = "extract_mismatch"
    peaks_pdf["violation"] = "peak"
    viol_cols = [cfg.part_key, "url", "violation"]
    violations = pd.concat(
        [mismatch_pdf[viol_cols], peaks_pdf[viol_cols]], ignore_index=True
    )

    drift_tbl = None
    if cfg.baseline:
        from ..stages.drift import drift_check
        from ..stages.stats import merge_sketch_group  # noqa: F401

        import ray.data as rd2  # noqa: F401

        cur = column_stats(featured, list(cfg.stat_columns), key=cfg.part_key)
        drift_tbl = drift_check(cur, cfg.baseline).to_pandas()

    # --- per-partition verdicts + manifest commit ---
    import pyarrow.parquet as pq

    viol_dir = os.path.join(out_dir, "violations")
    verdict_rows = []
    total_rows = 0
    for p in remaining:
        p_stats = stats_tbl[stats_tbl["part_key"] == p]
        p_uniq = uniq_tbl[uniq_tbl["part_key"] == p]
        p_viol = violations[violations[cfg.part_key] == p]
        rows = int(flags.loc[p, "rows"]) if p in flags.index else 0
        total_rows += rows

        outcomes = {"schema": "pass" if schema_verdict["passed"] else "fail"}
        html_null_rate = (
            float(flags.loc[p, "html_nulls"]) / rows if rows else 0.0
        )
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

        pdir = os.path.join(viol_dir, f"{cfg.part_key}={p}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(p_viol, preserve_index=False),
            os.path.join(pdir, "part-0.parquet"),
        )

        sketch_bytes = (
            int(p_stats["sketch_bytes"].sum()) if "sketch_bytes" in p_stats else 0
        )
        manifest.commit(
            PartitionRecord(
                partition=p,
                rows_scanned=rows,
                rows_violating=len(p_viol),
                constraint_outcomes=outcomes,
                outputs=[pdir],
                sketch_bytes=sketch_bytes,
            )
        )
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
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
