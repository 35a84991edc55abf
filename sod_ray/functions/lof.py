"""Bug-for-bug LOF window scorer replicating the reference engine.

Replicates /root/reference/internal/predictor/lof/lof.go +
internal/predictor/knn/brute/brute.go + the dispatcher's verdict-gated
append semantics (internal/dispatcher/manager.go:356-425) as a pure
Python/numpy module (no Ray). The Ray Data windowed-scorer stage
(sod_ray.stages.window) replays this per partition inside
``groupby().map_groups``.

Reference semantics replicated exactly:

- kNN = linear scan into an ascending-by-distance priority queue capped
  at k (pkg/pqueue/queue.go:81-94); errors when fewer than k stored
  points (brute.go:115-117).
- ``k_distance(p)`` = distance to the **nearest** of KNN(p, 3) — the
  reference uses ``vectors[0]`` with hardcoded 3 (lof.go:175-181), not
  the k-th neighbour of the textbook definition.
- ``lrd(p) = 1 / (sum(reach_dist(p, y) for y in KNN(p, k)) / k)`` with
  ``reach_dist(p, y) = max(k_distance(p), d(p, y))`` (lof.go:183-210).
  Stored points match themselves at distance 0, so degenerate windows
  produce lrd = 1/0 = +Inf; we follow IEEE float semantics like Go
  (Inf/Inf = NaN, and NaN > 1 is False → not an outlier).
- ``LOF(p) = (sum(lrd(y) for y in KNN(p, k)) / k) / lrd(p)``
  (lof.go:124-143); verdict outlier iff LOF > 1 (lof.go:14,161-164).
- ``predict`` guards: empty window → error "test vec size 0"
  (lof.go:107-108); window < skip_items → error (lof.go:110-112);
  k < 3 (MinKNum) → error (lof.go:168-173).
- Stream processing (manager.go:374-423): while window len <
  max(skip_items, 3) rows are appended unscored ("warmup"); scored
  outliers are appended to the window only when ``allow_append_outlier``;
  when ``allow_append_data`` is False nothing is ever appended after
  warmup (pure scoring).
- Retention (brute.go:153-179 translated to data-time): keep the newest
  ``max_items`` points (oldest-first eviction) and, when
  ``max_storage_time`` > 0, drop points older than the newest timestamp
  minus the window (deterministic: data time, never wall clock).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .distance import EUCLIDEAN, DimMismatchError, pairwise

MIN_K_NUM = 3  # lof/config.go:13
LOF_THRESHOLD = 1.0  # lof.go:14


class LofError(ValueError):
    """Prediction precondition failure (maps the reference's errors)."""


@dataclass
class Verdict:
    lof: float
    outlier: bool
    error: str | None = None


@dataclass
class LofWindow:
    """A per-entity sliding window + LOF scorer (one sod predictor)."""

    k: int = MIN_K_NUM  # lof/config.go:34 default KNum=3
    metric: str = EUCLIDEAN
    # kNN backend, NNFor parity (lof/config.go:23-30): "brute" |
    # "kd_tree". Identical verdicts (tested); kd_tree trades the O(w²)
    # cached distance matrix for O(log w) pruned searches — the right
    # backend for large windows.
    alg: str = "brute"
    skip_items: int = 0
    max_items: int = 0  # 0 = unbounded (dispatcher/config.go:13 default 1e6)
    max_storage_time_us: int = 0  # 0 = unbounded (dispatcher/config.go:15)
    allow_append_data: bool = True  # dispatcher/config.go:21
    allow_append_outlier: bool = True  # dispatcher/config.go:23
    _vecs: list[np.ndarray] = field(default_factory=list)
    _ts: list[int] = field(default_factory=list)
    # incremental stored-point distance cache: appending a point costs
    # O(w·d) instead of rebuilding the O(w²·d) matrix per scored row —
    # the streaming replay's hot path. Same numeric kernel per element,
    # so scores are identical to the rebuilt-matrix path (tested).
    _S: np.ndarray | None = field(default=None, repr=False)
    _DS: np.ndarray | None = field(default=None, repr=False)
    _tree: object = field(default=None, repr=False)  # kd_tree backend

    def __len__(self) -> int:
        return len(self._vecs)

    # -- window maintenance (brute.go Build/Append + eviction) ----------

    def append(self, vec, ts_us: int = 0) -> None:
        v = np.asarray(vec, dtype=np.float64)
        if self._S is not None and self._S.size:
            try:
                d = pairwise(v[None, :], self._S, self.metric)[0]
            except DimMismatchError:
                # reference semantics: Append stores anything; dimension
                # errors surface at distance time (geom.ErrDimNotEqual)
                self._S = None
                self._DS = None
            else:
                w = self._S.shape[0]
                new_DS = np.empty((w + 1, w + 1))
                new_DS[:w, :w] = self._DS
                new_DS[w, :w] = d
                new_DS[:w, w] = d
                new_DS[w, w] = 0.0
                self._DS = new_DS
                self._S = np.vstack([self._S, v[None, :]])
        else:
            self._S = None
            self._DS = None
        if self._tree is not None:
            try:
                self._tree.insert(v)  # gbkd-style incremental insert
            except Exception:
                self._tree = None
        self._vecs.append(v)
        self._ts.append(int(ts_us))
        self._evict()

    def build(self, vecs, ts_us=None) -> None:
        ts_us = ts_us if ts_us is not None else [0] * len(vecs)
        order = np.argsort(np.asarray(ts_us, dtype=np.int64), kind="stable")
        for i in order:
            self._vecs.append(np.asarray(vecs[i], dtype=np.float64))
            self._ts.append(int(ts_us[i]))
        self._S = None
        self._DS = None
        self._tree = None
        self._evict()

    def reset(self) -> None:
        self._vecs.clear()
        self._ts.clear()
        self._S = None
        self._DS = None
        self._tree = None

    def _evict(self) -> None:
        # size eviction: drop oldest beyond max_items (brute.go:168-179)
        if self.max_items > 0 and len(self._vecs) > self.max_items:
            drop = len(self._vecs) - self.max_items
            del self._vecs[:drop]
            del self._ts[:drop]
            self._tree = None  # gbkd rebuilds after removals (gbkd.go:165-205)
            if self._S is not None:
                self._S = self._S[drop:]
                self._DS = self._DS[drop:, drop:]
        # time eviction relative to data time, not wall clock
        # (brute.go:153-166 uses time.Since; deterministic translation)
        if self.max_storage_time_us > 0 and self._ts:
            cutoff = max(self._ts) - self.max_storage_time_us
            keep = [i for i, t in enumerate(self._ts) if t >= cutoff]
            if len(keep) != len(self._ts):
                self._vecs = [self._vecs[i] for i in keep]
                self._ts = [self._ts[i] for i in keep]
                self._tree = None
                if self._S is not None:
                    idx = np.asarray(keep, dtype=np.int64)
                    self._S = self._S[idx]
                    self._DS = self._DS[np.ix_(idx, idx)]

    # -- scoring --------------------------------------------------------

    def _stored(self) -> np.ndarray:
        return np.stack(self._vecs) if self._vecs else np.empty((0, 0))

    def _matrices(self):
        if self._S is None or not self._S.size:
            self._S = self._stored()
            self._DS = (
                pairwise(self._S, self._S, self.metric)
                if self._S.size
                else np.empty((0, 0))
            )
        return self._S, self._DS

    def _kdtree(self):
        if self._tree is None:
            from .kdtree import KDTree

            self._tree = KDTree(self.metric).build(self._stored())
        return self._tree

    def _lof_kdtree(self, q: np.ndarray) -> float:
        """kd_tree-backend LOF: same formulas as the brute path, kNN
        searches served by the pruned tree (KD_TREE arm of NNFor,
        lof/config.go:39-49). Stored points match themselves at
        distance 0, exactly like the brute linear scan."""
        if len(self) < self.k:
            raise LofError("knn less minimal value")
        tree = self._kdtree()

        def knn_t(p, k):
            idx, dist = tree.knn(p, k)
            if idx.shape[0] < k:
                raise LofError("knn less minimal value")
            return idx, dist

        def lrd_at(p) -> float:
            kd = float(knn_t(p, 3)[1][0])  # nearest-of-3 quirk
            _, d_nn = knn_t(p, self.k)
            with np.errstate(divide="ignore", invalid="ignore"):
                r_sum = np.float64(np.sum(np.maximum(kd, d_nn)))
                return float(np.float64(1.0) / (r_sum / np.float64(self.k)))

        nn_q, _ = knn_t(q, self.k)
        S = self._stored()
        with np.errstate(divide="ignore", invalid="ignore"):
            lrd_sum = 0.0
            for y in nn_q:
                lrd_sum += lrd_at(S[y])
            avg_lrd = np.float64(lrd_sum) / np.float64(self.k)
            lrd_q = np.float64(lrd_at(q))
            return float(avg_lrd / lrd_q)

    def lof(self, vec) -> float:
        """LOF score of `vec` against the stored window (lof.go:124-143)."""
        q = np.asarray(vec, dtype=np.float64)
        if self.alg == "kd_tree":
            return self._lof_kdtree(q)
        S, DS = self._matrices()
        if S.shape[0] < self.k:
            raise LofError("knn less minimal value")
        # query→stored distances; stored→stored from the incremental cache
        dq = pairwise(q[None, :], S, self.metric)[0]

        def knn_sorted(d: np.ndarray, k: int) -> np.ndarray:
            if d.shape[0] < k:
                raise LofError("knn less minimal value")
            idx = np.argpartition(d, k - 1)[:k]
            return idx[np.argsort(d[idx], kind="stable")]

        def k_distance(d: np.ndarray) -> float:
            # reference quirk: nearest of KNN(p, 3), hardcoded 3
            # (lof.go:175-181 uses vectors[0])
            nn3 = knn_sorted(d, 3)
            return float(d[nn3[0]])

        def lrd(d: np.ndarray) -> float:
            # lrd over KNN(p, k) with reach_dist = max(kDist(p), d(p,y))
            # (lof.go:195-210); kDist of the QUERY point per lof.go:183-193
            kd = k_distance(d)
            nn = knn_sorted(d, self.k)
            with np.errstate(divide="ignore", invalid="ignore"):
                r_sum = np.float64(np.sum(np.maximum(kd, d[nn])))
                # Go: 1/(rSum/k) — IEEE: 1/0 = +Inf (lof.go:208)
                return float(np.float64(1.0) / (r_sum / np.float64(self.k)))

        nn_q = knn_sorted(dq, self.k)
        with np.errstate(divide="ignore", invalid="ignore"):
            lrd_sum = 0.0
            for y in nn_q:
                lrd_sum += lrd(DS[y])
            # IEEE: Inf/Inf = NaN, x/Inf = 0 — matches Go (lof.go:142)
            avg_lrd = np.float64(lrd_sum) / np.float64(self.k)
            lrd_q = np.float64(lrd(dq))
            return float(avg_lrd / lrd_q)

    def _lrd_stored(self) -> np.ndarray:
        """lrd of every stored point, computed once per window state.

        Under the reference's quirky kDistance (= distance to the
        NEAREST of KNN(p,3), i.e. the minimum distance — lof.go:175-181
        uses vectors[0] of the ascending queue), reach_dist(p,y) =
        max(min_dist(p), d(p,y)) = d(p,y) for every y in KNN(p,k), so
        lrd(p) = k / Σ(top-k nearest distances) — identical numbers to
        the literal transcription (property-tested)."""
        S, DS = self._matrices()
        k = self.k
        part = np.partition(DS, k - 1, axis=1)[:, :k]
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.float64(k) / part.sum(axis=1)

    def predict_batch(self, Q) -> list[Verdict]:
        """Vectorized read-only scoring of a query matrix (the predict
        path, lof.go:106-118): one pairwise() call + numpy top-k for
        the whole batch, reusing the per-window stored-lrd cache."""
        n = np.atleast_2d(np.asarray(Q, dtype=np.float64)).shape[0]
        if len(self) == 0:
            return [
                Verdict(np.nan, False, "unable to predict, test vec size 0")
            ] * n
        if len(self) < self.skip_items:
            return [
                Verdict(np.nan, False, "unable to predict, test vec less skip items param")
            ] * n
        if self.k < MIN_K_NUM:
            return [
                Verdict(np.nan, False, "the k selected in the config is too small")
            ] * n
        S, _ = self._matrices()
        if S.shape[0] < self.k:
            return [Verdict(np.nan, False, "knn less minimal value")] * n
        Qm = np.atleast_2d(np.asarray(Q, dtype=np.float64))
        try:
            dq = pairwise(Qm, S, self.metric)
        except Exception as e:  # dim mismatch etc → per-row error verdicts
            return [Verdict(np.nan, False, str(e))] * n
        k = self.k
        lrd_stored = self._lrd_stored()
        nn = np.argpartition(dq, k - 1, axis=1)[:, :k]
        with np.errstate(divide="ignore", invalid="ignore"):
            d_nn = np.take_along_axis(dq, nn, axis=1)
            lrd_q = np.float64(k) / d_nn.sum(axis=1)
            avg_lrd = lrd_stored[nn].sum(axis=1) / np.float64(k)
            scores = avg_lrd / lrd_q
        return [
            Verdict(float(s), bool(s > LOF_THRESHOLD)) for s in scores
        ]

    def rank_boundary_tie(self, Q) -> np.ndarray:
        """True where KNN(q, k) membership is ambiguous: the k-th and
        (k+1)-th order statistics of the query→stored distances are
        equal, so which point makes the cut depends on scan/queue
        insertion order (reference pqueue, queue.go:81-94 — order-,
        not data-, determined). The oracle-checked predict query
        excludes those rows on both sides; tie-free verdicts are
        exactly reproducible in SQL. Pure read-only util — not part
        of the reference surface."""
        Qm = np.atleast_2d(np.asarray(Q, dtype=np.float64))
        S, _ = self._matrices()
        if S.shape[0] <= self.k:
            return np.zeros(Qm.shape[0], dtype=bool)
        dq = pairwise(Qm, S, self.metric)
        part = np.partition(dq, [self.k - 1, self.k], axis=1)
        return part[:, self.k - 1] == part[:, self.k]

    def predict(self, vec) -> Verdict:
        """Score without mutating the window (lof.go:106-118,153-166)."""
        if len(self) == 0:
            return Verdict(np.nan, False, "unable to predict, test vec size 0")
        if len(self) < self.skip_items:
            return Verdict(
                np.nan, False, "unable to predict, test vec less skip items param"
            )
        if self.k < MIN_K_NUM:
            return Verdict(np.nan, False, "the k selected in the config is too small")
        try:
            score = self.lof(vec)
        except LofError as e:
            return Verdict(np.nan, False, str(e))
        return Verdict(score, bool(score > LOF_THRESHOLD))

    # -- streaming collect semantics (manager.go:356-425) ---------------

    def process(self, vec, ts_us: int = 0) -> Verdict:
        """One COLLECT-path step: warmup-append or score, then
        verdict-gated append. Returns the verdict for this row
        (warmup rows get lof=nan, outlier=False, error='warmup')."""
        if len(self) < max(self.skip_items, MIN_K_NUM):  # manager.go:374
            self.append(vec, ts_us)
            return Verdict(np.nan, False, "warmup")
        v = self.predict(vec)
        if v.error is not None:
            return v  # predict error: row deleted, no append (manager.go:386-391)
        if not self.allow_append_data:  # manager.go:409-414
            return v
        if (v.outlier and self.allow_append_outlier) or not v.outlier:
            self.append(vec, ts_us)  # manager.go:416-418
        return v


def score_stream(
    vecs,
    ts_us=None,
    *,
    k: int = MIN_K_NUM,
    metric: str = EUCLIDEAN,
    alg: str = "brute",
    skip_items: int = 0,
    max_items: int = 0,
    max_storage_time_us: int = 0,
    allow_append_outlier: bool = True,
    allow_append_data: bool = True,
) -> list[Verdict]:
    """Replay a time-ordered stream through a fresh LofWindow; the batch
    kernel used by the Ray windowed-scorer stage (one call per
    partition/group, rows pre-sorted by timestamp)."""
    w = LofWindow(
        k=k,
        metric=metric,
        alg=alg,
        skip_items=skip_items,
        max_items=max_items,
        max_storage_time_us=max_storage_time_us,
        allow_append_outlier=allow_append_outlier,
        allow_append_data=allow_append_data,
    )
    ts_us = ts_us if ts_us is not None else range(len(vecs))
    return [w.process(v, t) for v, t in zip(vecs, ts_us)]
