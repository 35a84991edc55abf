"""Golden distance vectors replayed from the reference's own tests
(/root/reference/internal/geom/distance_test.go) — FIXTURES.md G1."""

import numpy as np
import pytest

from sod_ray.functions.distance import (
    CHEBYSHEV,
    EUCLIDEAN,
    MANHATTAN,
    DimMismatchError,
    chebyshev,
    distance_fn,
    euclidean,
    manhattan,
    pairwise,
)

GOLDEN = [
    # (fn, p, q, expected) — distance_test.go:13-14,60-61,107-108
    (euclidean, (1.2, 2.0), (2.0, 3.0), 1.2806248474865698),
    (euclidean, (10.0, 2.0), (5.0, 3.0), 5.0990195135927845),
    (chebyshev, (1.2, 2.0), (2.0, 3.0), 1.0),
    (chebyshev, (10.0, 2.0), (5.0, 3.0), 5.0),
    (manhattan, (1.2, 2.0), (2.0, 3.0), 1.8),
    (manhattan, (10.0, 2.0), (5.0, 3.0), 6.0),
]


@pytest.mark.parametrize("fn,p,q,expected", GOLDEN)
def test_golden(fn, p, q, expected):
    assert fn(p, q) == pytest.approx(expected, abs=1e-12)


@pytest.mark.parametrize("fn", [euclidean, chebyshev, manhattan])
def test_dim_mismatch(fn):
    # distance_test.go:23-24,70-71,117-118
    with pytest.raises(DimMismatchError):
        fn((5.0, 2.0), (3.0,))
    with pytest.raises(DimMismatchError):
        fn((2.0,), (3.0, 4.0))


@pytest.mark.parametrize("metric", [EUCLIDEAN, CHEBYSHEV, MANHATTAN])
def test_pairwise_matches_scalar(metric):
    rng = np.random.default_rng(42)
    P = rng.normal(size=(7, 3))
    Q = rng.normal(size=(5, 3))
    D = pairwise(P, Q, metric)
    fn = distance_fn(metric)
    for i in range(7):
        for j in range(5):
            assert D[i, j] == pytest.approx(fn(P[i], Q[j]), abs=1e-9)


def test_pairwise_dim_mismatch():
    with pytest.raises(DimMismatchError):
        pairwise(np.zeros((2, 3)), np.zeros((2, 4)))


def test_dispatch():
    assert distance_fn("EUCLIDEAN") is euclidean  # lof/config.go:51-62
    with pytest.raises(ValueError):
        distance_fn("cosine")
