"""Rolling z-score peak flagging — the engine's generalization of the
reference's windowed outlier scoring (SURVEY.md §2.4 K5 / FIXTURES.md G4).

Semantics (deterministic, data-time only):

- rows are pre-sorted by timestamp within a partition;
- over a trailing window of ``window`` rows INCLUDING the current row,
  compute the sample mean and sample standard deviation (ddof=1);
- a row is flagged when at least ``min_periods`` rows are in the window,
  the std is > 0, and ``|x - mean| / std > threshold``.

The identical computation is expressible in ANSI SQL with
``AVG(...) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN w-1 PRECEDING
AND CURRENT ROW)`` / ``STDDEV_SAMP(...)``, which is what the DuckDB
oracle in __ray_entry__.oracle_sql uses.
"""

from __future__ import annotations

import numpy as np

DEFAULT_WINDOW = 64
DEFAULT_MIN_PERIODS = 8
DEFAULT_THRESHOLD = 3.0


def rolling_zscore(
    values: np.ndarray,
    window: int = DEFAULT_WINDOW,
    min_periods: int = DEFAULT_MIN_PERIODS,
) -> np.ndarray:
    """Trailing-window z-score per element (NaN where undefined).

    Vectorized via cumulative sums — O(n), no Python loop.
    """
    x = np.asarray(values, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.float64)
    csum = np.concatenate(([0.0], np.cumsum(x)))
    csq = np.concatenate(([0.0], np.cumsum(x * x)))
    idx = np.arange(1, n + 1)
    lo = np.maximum(0, idx - window)
    cnt = (idx - lo).astype(np.float64)
    s = csum[idx] - csum[lo]
    ss = csq[idx] - csq[lo]
    mean = s / cnt
    with np.errstate(divide="ignore", invalid="ignore"):
        var = (ss - cnt * mean * mean) / (cnt - 1.0)
        var = np.maximum(var, 0.0)  # fp noise can go slightly negative
        std = np.sqrt(var)
        z = (x - mean) / std
    z[cnt < min_periods] = np.nan
    z[std == 0] = np.nan
    return z


def peak_flags(
    values: np.ndarray,
    window: int = DEFAULT_WINDOW,
    min_periods: int = DEFAULT_MIN_PERIODS,
    threshold: float = DEFAULT_THRESHOLD,
) -> np.ndarray:
    """Boolean peak mask: |z| > threshold (False where z undefined)."""
    z = rolling_zscore(values, window, min_periods)
    with np.errstate(invalid="ignore"):
        return np.abs(z) > threshold
