"""Distance functions over dense f64 vectors.

Semantics match the reference engine's distance library
(/root/reference/internal/geom/distance.go:10-46): Euclidean, Chebyshev
and Manhattan distances over equal-dimension vectors, raising a
dimension-mismatch error otherwise (distance.go:8 ``ErrDimNotEqual``).

Two surfaces:

- scalar ``euclidean(p, q)`` etc. — exact per-pair semantics, used by the
  LOF window scorer and by the golden-vector tests
  (/root/reference/internal/geom/distance_test.go).
- batched ``pairwise(P, Q, metric)`` — vectorized numpy kernels used
  inside ``map_batches`` stages (never a Python loop over rows).
"""

from __future__ import annotations

import numpy as np

EUCLIDEAN = "euclidean"
CHEBYSHEV = "chebyshev"
MANHATTAN = "manhattan"

METRICS = (EUCLIDEAN, CHEBYSHEV, MANHATTAN)


class DimMismatchError(ValueError):
    """Vector dimensions are not equal (reference: geom.ErrDimNotEqual)."""


def _check_dims(p: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    if p.shape[-1] != q.shape[-1]:
        raise DimMismatchError(
            f"point dimensions are not equal: {p.shape[-1]} != {q.shape[-1]}"
        )
    return p, q


def euclidean(p, q) -> float:
    """sqrt(sum((p_i - q_i)^2)) — distance.go:10-20."""
    p, q = _check_dims(p, q)
    d = p - q
    return float(np.sqrt(np.dot(d, d)))


def chebyshev(p, q) -> float:
    """max(|p_i - q_i|) — distance.go:22-34."""
    p, q = _check_dims(p, q)
    return float(np.max(np.abs(p - q)))


def manhattan(p, q) -> float:
    """sum(|p_i - q_i|) — distance.go:36-46."""
    p, q = _check_dims(p, q)
    return float(np.sum(np.abs(p - q)))


_SCALAR = {EUCLIDEAN: euclidean, CHEBYSHEV: chebyshev, MANHATTAN: manhattan}


def distance_fn(metric: str):
    """Dispatch by name — reference lof/config.go:51-62 DistanceFuncFor."""
    try:
        return _SCALAR[metric.lower()]
    except KeyError:
        raise ValueError(f"unknown distance metric {metric!r}; one of {METRICS}")


def pairwise(P: np.ndarray, Q: np.ndarray, metric: str = EUCLIDEAN) -> np.ndarray:
    """All-pairs distances between rows of P (n,d) and rows of Q (m,d).

    Vectorized: returns an (n, m) float64 matrix. This is the batch
    kernel behind the kNN/LOF scorer and the ANN brute-force stage.
    """
    P = np.atleast_2d(np.asarray(P, dtype=np.float64))
    Q = np.atleast_2d(np.asarray(Q, dtype=np.float64))
    if P.shape[1] != Q.shape[1]:
        raise DimMismatchError(
            f"point dimensions are not equal: {P.shape[1]} != {Q.shape[1]}"
        )
    m = metric.lower()
    if m == EUCLIDEAN:
        # (p-q)^2 = p.p + q.q - 2 p.q ; clamp tiny negatives from fp error
        p2 = np.einsum("ij,ij->i", P, P)[:, None]
        q2 = np.einsum("ij,ij->i", Q, Q)[None, :]
        d2 = p2 + q2 - 2.0 * (P @ Q.T)
        np.maximum(d2, 0.0, out=d2)
        return np.sqrt(d2)
    if m == CHEBYSHEV:
        return np.max(np.abs(P[:, None, :] - Q[None, :, :]), axis=2)
    if m == MANHATTAN:
        return np.sum(np.abs(P[:, None, :] - Q[None, :, :]), axis=2)
    raise ValueError(f"unknown distance metric {metric!r}; one of {METRICS}")
