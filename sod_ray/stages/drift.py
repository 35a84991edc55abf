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
