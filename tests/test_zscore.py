"""Rolling z-score peak detection (FIXTURES.md G4)."""

import numpy as np
import pandas as pd
import pytest

from sod_ray.functions.zscore import peak_flags, rolling_zscore


def test_matches_pandas_rolling():
    rng = np.random.default_rng(42)
    x = rng.normal(0, 1, size=500)
    z = rolling_zscore(x, window=64, min_periods=8)
    s = pd.Series(x)
    mean = s.rolling(64, min_periods=8).mean()
    std = s.rolling(64, min_periods=8).std(ddof=1)
    expected = (s - mean) / std
    np.testing.assert_allclose(z[8:], expected.to_numpy()[8:], rtol=1e-8, atol=1e-8)
    assert np.all(np.isnan(z[:7]))


def test_planted_peak_flagged():
    x = np.ones(100) * 10.0 + np.linspace(0, 0.1, 100)  # mild noise
    x[60] = 200.0  # 10x burst
    flags = peak_flags(x, window=64, min_periods=8, threshold=3.0)
    assert flags[60]
    assert flags.sum() <= 3  # the peak (and possibly its shadow) only


def test_constant_series_no_flags():
    x = np.full(50, 7.0)
    assert not peak_flags(x).any()


def test_empty():
    assert rolling_zscore(np.empty(0)).size == 0
