"""Per-vector aggregate library (the reference's ``geom.Point`` methods).

Maps /root/reference/internal/geom/point.go — Sum, Mean, Min, Max,
Median, GMean, HMean, Entropy, Magnitude — as vectorized numpy kernels.
In the engine these become the per-column streaming statistics (the
distributed versions live in sod_ray.state.sketches); this module is the
exact single-vector semantics pinned by the reference's tests.

Documented reference quirks (we implement CORRECT semantics; the quirky
variants exist only where noted so tests can demonstrate the divergence):

- ``Max`` (point.go:106-114) initialises the running max to 0, so it is
  wrong for all-negative vectors. The reference's own tests never cover
  that case; we use the correct max.
- ``Norm`` (point.go:18-22) divides each component by a *mutating*
  running sum (order-dependent). ``Entropy`` (point.go:169-179) calls
  it. We implement the correct normalize (divide by the total sum);
  ``entropy`` documents the divergence.
"""

from __future__ import annotations

import numpy as np


def _arr(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float64)


def vsum(v) -> float:
    """point.go:82-88."""
    return float(np.sum(_arr(v)))


def mean(v) -> float:
    """point.go:126-128."""
    return float(np.mean(_arr(v)))


def vmin(v) -> float:
    """point.go:116-124 (inits MaxFloat64 — correct)."""
    return float(np.min(_arr(v)))


def vmax(v) -> float:
    """Correct max. Reference point.go:106-114 inits 0 (buggy for
    all-negative vectors); engine uses the correct semantics."""
    return float(np.max(_arr(v)))


def median(v) -> float:
    """Copy, sort, middle element or mean of the two middles —
    point.go:153-167."""
    return float(np.median(_arr(v)))


def gmean(v) -> float:
    """Geometric mean — point.go:130-139 (product^(1/n))."""
    a = _arr(v)
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.exp(np.mean(np.log(a))))


def hmean(v) -> float:
    """Harmonic mean — point.go:141-151; NaN/Inf on components <= 0
    follows IEEE semantics like the Go original."""
    a = _arr(v)
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(len(a) / np.sum(1.0 / a))


def normalize(v) -> np.ndarray:
    """Correct L1 normalize (divide by total sum). The reference's
    Norm (point.go:18-22) divides by a mutating running sum — an
    order-dependent quirk its own tests do not pin."""
    a = _arr(v)
    s = np.sum(a)
    with np.errstate(divide="ignore", invalid="ignore"):
        return a / s


def entropy(v) -> float:
    """-sum(p_i * ln(p_i)) over the L1-normalized vector —
    point.go:169-179 (with the correct normalize; see module docstring)."""
    p = normalize(v)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, p * np.log(p), 0.0)
    return float(-np.sum(terms))


def magnitude(v) -> float:
    """L2 norm — point.go:46-52 and 74-80 (duplicate impls in the
    reference)."""
    a = _arr(v)
    return float(np.sqrt(np.dot(a, a)))


def equal(p, q) -> bool:
    """Exact vector equality — point.go:90-98."""
    p, q = _arr(p), _arr(q)
    return p.shape == q.shape and bool(np.all(p == q))


def size_equal(p, q) -> bool:
    """Dimension equality — point.go:100-104."""
    return _arr(p).shape == _arr(q).shape
