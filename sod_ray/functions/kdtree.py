"""Pure-numpy k-d tree — the reference's second kNN backend (K2).

Replicates /root/reference/pkg/kdtree/tree.go semantics:

- ``build``: recursive median split — sort the slice on the level's
  dimension, root = ``points[len//2]``, halves recurse with the next
  dimension (tree.go:163-180 ``buildTreeRecursive``).
- ``insert``: standard unbalanced descent (node.go:53-59,65-84).
- ``balance``: rebuild from the stored points (tree.go:68-70).
- ``knn``: iterative descent recording the path, then backtrack; a
  candidate enters the ascending queue (capped at k) when its distance
  beats the current k-th-or-last distance; the off-path subtree is
  searched only when the single-dimension distance |q[dim] - node[dim]|
  beats that bound (tree.go:100-143, pqueue.go:81-94).
- ``range_search``: per-dim interval filter with subtree pruning
  (node.go:65-84 RangeSearch).

Distances go through sod_ray.functions.distance (Euclidean/Chebyshev/
Manhattan + dim-mismatch errors), selected exactly like the reference's
``NNFor``/``DistanceFuncFor`` (internal/predictor/lof/config.go:23-30,
51-62).

The tree is a per-window, in-worker structure (windows are ≤ max_items
rows); it never crosses a task boundary.
"""

from __future__ import annotations

import numpy as np

from .distance import EUCLIDEAN, distance_fn


class _Node:
    __slots__ = ("idx", "left", "right")

    def __init__(self, idx: int):
        self.idx = idx
        self.left: _Node | None = None
        self.right: _Node | None = None


class KDTree:
    """k-d tree over row indices of a (n, d) point matrix."""

    def __init__(self, metric: str = EUCLIDEAN):
        self.metric = metric
        self._dist = distance_fn(metric)
        self._root: _Node | None = None
        self._pts = np.empty((0, 0))
        self._n = 0

    def __len__(self) -> int:
        return self._n

    # -- construction ---------------------------------------------------

    def build(self, points: np.ndarray) -> "KDTree":
        """Median-split build (tree.go:51-54 Build)."""
        self._pts = np.asarray(points, dtype=np.float64)
        self._n = self._pts.shape[0]
        idx = np.arange(self._n)
        self._root = self._build(idx, 0)
        return self

    def _build(self, idx: np.ndarray, dim: int) -> _Node | None:
        if idx.size == 0:
            return None
        if idx.size == 1:
            return _Node(int(idx[0]))
        # stable sort on the level dimension, root at len//2 — matches
        # buildTreeRecursive's sort.Sort + mid split (tree.go:163-180)
        order = np.argsort(self._pts[idx, dim], kind="stable")
        idx = idx[order]
        mid = idx.size // 2
        d = self._pts.shape[1]
        node = _Node(int(idx[mid]))
        node.left = self._build(idx[:mid], (dim + 1) % d)
        node.right = self._build(idx[mid + 1 :], (dim + 1) % d)
        return node

    def insert(self, point: np.ndarray) -> int:
        """Unbalanced insert (tree.go:60-66); returns the new row idx."""
        p = np.asarray(point, dtype=np.float64)
        if self._n == 0:
            self._pts = p[None, :].copy()
            self._n = 1
            self._root = _Node(0)
            return 0
        self._pts = np.vstack([self._pts, p[None, :]])
        new_idx = self._n
        self._n += 1
        d = self._pts.shape[1]
        node, dim = self._root, 0
        while True:
            if p[dim] < self._pts[node.idx, dim]:
                if node.left is None:
                    node.left = _Node(new_idx)
                    return new_idx
                node = node.left
            else:
                if node.right is None:
                    node.right = _Node(new_idx)
                    return new_idx
                node = node.right
            dim = (dim + 1) % d

    def balance(self) -> None:
        """Rebuild from current points (tree.go:68-70)."""
        self.build(self._pts)

    # -- queries --------------------------------------------------------

    def knn(self, q: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """k nearest stored points of ``q``: (indices, distances),
        ascending by distance. Raises like the reference when the tree
        is empty or k == 0 (tree.go:80-82)."""
        if self._root is None or k == 0:
            raise ValueError("root is nil or K is 0")
        q = np.asarray(q, dtype=np.float64)
        heap: list[tuple[float, int]] = []  # ascending (dist, idx), cap k
        d = self._pts.shape[1]

        def kth_or_last(i: int) -> float:
            return heap[i][0] if len(heap) > i else np.finfo(np.float64).max

        def search(first: _Node | None, dim: int) -> None:
            if first is None:
                return
            path: list[tuple[_Node, int]] = []
            node = first
            while node is not None:
                path.append((node, dim))
                if q[dim] < self._pts[node.idx, dim]:
                    node = node.left
                else:
                    node = node.right
                dim = (dim + 1) % d
            for node, ndim in reversed(path):
                cur = self._dist(q, self._pts[node.idx])
                bound = kth_or_last(k - 1)
                if cur < bound:
                    # sorted insert + truncate — pqueue.go:81-94
                    import bisect

                    bisect.insort(heap, (cur, node.idx))
                    del heap[k:]
                    bound = kth_or_last(k - 1)
                if abs(q[ndim] - self._pts[node.idx, ndim]) < bound:
                    if q[ndim] < self._pts[node.idx, ndim]:
                        nxt = node.right
                    else:
                        nxt = node.left
                    search(nxt, (ndim + 1) % d)

        search(self._root, 0)
        if not heap:
            return np.empty(0, dtype=np.int64), np.empty(0)
        dist_arr = np.array([h[0] for h in heap])
        idx_arr = np.array([h[1] for h in heap], dtype=np.int64)
        return idx_arr, dist_arr

    def range_search(self, ranges: np.ndarray) -> list[int]:
        """Indices of points inside the per-dim [min, max] box
        (node.go RangeSearch)."""
        r = np.asarray(ranges, dtype=np.float64)  # (d, 2)
        out: list[int] = []

        def rec(node: _Node | None, axis: int) -> None:
            if node is None:
                return
            p = self._pts[node.idx]
            if np.all((r[:, 0] <= p) & (p <= r[:, 1])):
                out.append(node.idx)
            d = self._pts.shape[1]
            if node.left is not None and p[axis] >= r[axis, 0]:
                rec(node.left, (axis + 1) % d)
            if node.right is not None and p[axis] <= r[axis, 1]:
                rec(node.right, (axis + 1) % d)

        rec(self._root, 0)
        return out
