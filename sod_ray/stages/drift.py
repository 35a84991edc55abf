"""Distribution-drift checks (PSI + KS) against baseline sketches held
by a stateful actor pool.

The actor-pool-with-baseline design is the Ray translation of the
reference's per-entity predictor registry
(/root/reference/internal/dispatcher/manager.go:270-295): state (the
baseline sketches) is loaded ONCE per actor in ``__init__`` from a
``ray.put`` broadcast, then every batch of current-run sketch rows is
scored against it. Baselines swap atomically between runs (the
green/blue kd-tree analog, gbkd.go:41-62 — SURVEY.md §2.4 K3: batch
re-runs replace the double-buffering).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..state.sketches import (
    KLL,
    Histogram,
    TDigest,
    ks_statistic,
    ks_statistic_kll,
    psi,
    quantile_sketch_from_bytes,
)

PSI_THRESHOLD = 0.2  # conventional "significant shift" cut
KS_THRESHOLD = 0.1


def build_baseline(stats_ds) -> dict:
    """Collect a merged stats Dataset (small: one row per key × column)
    into the baseline dict {(part_key, column): {"tdigest": bytes,
    "histogram": Histogram-bytes-or-None}}."""
    baseline = {}
    for row in stats_ds.take_all():
        baseline[(row["part_key"], row["column"])] = {
            "tdigest": row["tdigest"],
            "welford": row["welford"],
        }
    return baseline


class DriftScorer:
    """Actor: __init__ fetches the broadcast baseline once; __call__
    scores batches of current-run merged-stats rows (tiny tables)."""

    def __init__(
        self,
        baseline_ref,
        psi_threshold: float = PSI_THRESHOLD,
        ks_threshold: float = KS_THRESHOLD,
        bins: int = 20,
    ):
        self.baseline = ray.get(baseline_ref) if not isinstance(baseline_ref, dict) else baseline_ref
        self.psi_threshold = psi_threshold
        self.ks_threshold = ks_threshold
        self.bins = bins

    def _hist_from_digest(self, td: TDigest, lo: float, hi: float) -> Histogram:
        """Deterministic histogram reconstruction from a t-digest so PSI
        bins align between baseline and current."""
        h = Histogram(lo=lo, hi=hi, bins=self.bins)
        # approximate counts by CDF differences over the bin edges
        import numpy as np

        edges = np.linspace(lo, hi, self.bins + 1)
        qs = np.linspace(0, 1, 512)
        xs = td.quantiles(qs)
        cdf = np.interp(edges, xs, qs, left=0.0, right=1.0)
        counts = np.diff(cdf) * max(td.n, 1)
        h.counts[1:-1] = np.maximum(0, np.round(counts)).astype("int64")
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {
            "part_key": [],
            "column": [],
            "psi": [],
            "ks": [],
            "drifted": [],
            "has_baseline": [],
        }
        for row in rows:
            key = (row["part_key"], row["column"])
            base = self.baseline.get(key)
            out["part_key"].append(row["part_key"])
            out["column"].append(row["column"])
            if base is None:
                out["psi"].append(float("nan"))
                out["ks"].append(float("nan"))
                out["drifted"].append(False)
                out["has_baseline"].append(False)
                continue
            td_base = quantile_sketch_from_bytes(base["tdigest"])
            td_cur = quantile_sketch_from_bytes(row["tdigest"])
            if type(td_base) is not type(td_cur):
                raise ValueError(
                    "mixed quantile-sketch backends between baseline and "
                    "current run — rebuild the baseline with the same "
                    "ValidateConfig.quantile_sketch"
                )
            is_kll = isinstance(td_base, KLL)
            if is_kll:
                ks = ks_statistic_kll(td_base, td_cur)
            else:
                ks = ks_statistic(td_base, td_cur)
            # noise floor on the KS cut: the two-sample critical value
            # at alpha~0.001 (1.95*sqrt((n+m)/nm)) plus each digest's
            # mid-quantile centroid width (pi/delta — merged digests of
            # DISCRETE columns develop step-CDF interpolation spikes of
            # this size even for identical distributions; measured 3x
            # inflation on 1k-row same-distribution shards). Both terms
            # vanish as n grows, so the fixed threshold governs at the
            # 10^12-row design scale.
            import math

            na, nb = max(td_base.n, 1), max(td_cur.n, 1)
            if is_kll:
                # KLL's step CDFs have no interpolation spikes; the
                # summary term is each side's published rank error
                # (~3.3/k, i.e. 1.65% at k=200)
                sketch_term = 3.3 / td_base.k + 3.3 / td_cur.k
            else:
                sketch_term = (
                    math.pi / (2 * td_base.delta)
                    + math.pi / (2 * td_cur.delta)
                )
            noise = (
                1.95 * math.sqrt((na + nb) / (na * nb)) + sketch_term
            )
            ks_cut = max(self.ks_threshold, noise)
            # PSI's null expectation over B bins is ~(B-1)(1/na+1/nb)
            # (symmetrized-KL chi-square limit) — ~0.4 for identical
            # 90-row samples at 20 bins, far above the conventional 0.2
            # cut. Flag only well above the null mean; at design scale
            # the term vanishes and the fixed threshold governs. True
            # shifts still flag through KS (disjoint supports give
            # KS→1, above any floor at n≥~10).
            psi_cut = max(
                self.psi_threshold, 4.0 * (self.bins - 1) * (1 / na + 1 / nb)
            )
            lo = min(td_base.quantile(0.0), td_cur.quantile(0.0))
            hi = max(td_base.quantile(1.0), td_cur.quantile(1.0))
            if hi <= lo:
                hi = lo + 1.0
            p = psi(
                self._hist_from_digest(td_base, lo, hi),
                self._hist_from_digest(td_cur, lo, hi),
            )
            out["psi"].append(p)
            out["ks"].append(ks)
            out["drifted"].append(bool(p > psi_cut or ks > ks_cut))
            out["has_baseline"].append(True)
        return pa.table(
            {
                "part_key": pa.array(out["part_key"], pa.string()),
                "column": pa.array(out["column"], pa.string()),
                "psi": pa.array(out["psi"], pa.float64()),
                "ks": pa.array(out["ks"], pa.float64()),
                "drifted": pa.array(out["drifted"], pa.bool_()),
                "has_baseline": pa.array(out["has_baseline"], pa.bool_()),
            }
        )


def drift_check(current_stats_ds, baseline: dict, concurrency=(1, 4)):
    """Score current merged stats against a baseline dict. The baseline
    is broadcast once (ray.put) and read per actor, never per batch."""
    ref = ray.put(baseline)
    return current_stats_ds.map_batches(
        DriftScorer,
        fn_constructor_kwargs={"baseline_ref": ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Categorical drift (string columns: lang mix, host mix, event types)
# ---------------------------------------------------------------------------


def categorical_drift_check(
    ds,
    columns: list[str],
    baseline: dict | None,
    key: str | None = None,
    m: int = 512,
    psi_threshold: float = 0.2,
    top_k: int = 50,
):
    """Distribution drift for STRING columns — the categorical
    counterpart of the numeric PSI/KS scorer above: each column's
    value mix is summarized by a Misra–Gries sketch (one scan, no data
    shuffle — stages/stats.heavy_hitters), and
    ``state.sketches.categorical_psi`` scores the current summaries
    against the baseline's over the union of both top-k categories
    plus an "other" mass bucket.

    ``baseline`` maps (part_key, column) -> MG bytes (as produced by
    :func:`categorical_baseline` / :func:`save_categorical_baseline`);
    None scores nothing but still returns the fresh summaries for the
    next run's baseline roll. Returns ``(summaries, results_table)``
    where summaries is the {(part_key, column): MisraGries} of THIS
    run. Null-baseline rows carry has_baseline=False like the numeric
    scorer. The PSI cut follows the numeric scorer's convention: the
    fixed threshold governs at scale; MG undercount shifts mass to
    "other" symmetrically for frequencies above err_ub/n, which the
    eps-smoothed PSI tolerates."""
    from ..state.sketches import MisraGries, categorical_psi
    from .stats import GLOBAL_KEY, heavy_hitters

    summaries: dict = {}
    for col in columns:
        per = heavy_hitters(ds, col, key=key, m=m)
        if key is None:
            summaries[(GLOBAL_KEY, col)] = per
        else:
            for k, mg in per.items():
                summaries[(k, col)] = mg

    rows = {"part_key": [], "column": [], "cat_psi": [], "drifted": [],
            "has_baseline": []}
    for (k, col), mg in sorted(summaries.items()):
        rows["part_key"].append(k)
        rows["column"].append(col)
        base = (baseline or {}).get((k, col))
        if base is None:
            rows["cat_psi"].append(float("nan"))
            rows["drifted"].append(False)
            rows["has_baseline"].append(False)
            continue
        p = categorical_psi(
            MisraGries.from_bytes(base), mg, k=top_k
        )
        rows["cat_psi"].append(p)
        rows["drifted"].append(bool(p > psi_threshold))
        rows["has_baseline"].append(True)
    return summaries, pa.table(
        {
            "part_key": pa.array(rows["part_key"], pa.string()),
            "column": pa.array(rows["column"], pa.string()),
            "cat_psi": pa.array(rows["cat_psi"], pa.float64()),
            "drifted": pa.array(rows["drifted"], pa.bool_()),
            "has_baseline": pa.array(rows["has_baseline"], pa.bool_()),
        }
    )


def save_categorical_baseline(summaries: dict, path: str) -> None:
    """Persist {(part_key, column): MisraGries} — atomic tmp+rename,
    merging with an existing file (same contract as the numeric
    save_baseline: a partial run never clobbers other keys' rows)."""
    import os

    import pyarrow.parquet as pq

    rows = [
        {"part_key": k, "column": c, "mg": mg.to_bytes()}
        for (k, c), mg in sorted(summaries.items())
    ]
    new = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("part_key", pa.string()), ("column", pa.string()),
             ("mg", pa.binary())]
        ),
    )
    if os.path.exists(path):
        old = pq.read_table(path)
        seen = {(k, c) for k, c in zip(
            new["part_key"].to_pylist(), new["column"].to_pylist()
        )}
        keep = old.filter(
            pa.array(
                [
                    (k, c) not in seen
                    for k, c in zip(
                        old["part_key"].to_pylist(), old["column"].to_pylist()
                    )
                ]
            )
        )
        new = pa.concat_tables([keep, new])
    tmp = path + ".tmp"
    pq.write_table(new, tmp)
    os.replace(tmp, path)


def load_categorical_baseline(path: str) -> dict:
    """categorical_baseline.parquet → {(part_key, column): mg_bytes}."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    return {
        (r["part_key"], r["column"]): r["mg"] for r in t.to_pylist()
    }
