"""LOF window scorer parity with the reference (FIXTURES.md G2).

Scenarios replay /root/reference/internal/predictor/lof/lof.go semantics
including the kDistance-nearest quirk (lof.go:175-181), IEEE Inf/NaN
verdict edges, warmup (manager.go:374-379), and verdict-gated append
(manager.go:416-418).
"""

import math

import numpy as np
import pandas as pd
import pytest

from sod_ray.functions.lof import LOF_THRESHOLD, LofWindow, score_stream


def window_of(vals):
    w = LofWindow()
    w.build([[v] for v in vals], list(range(len(vals))))
    return w


def test_readme_example_outlier():
    # README.md:62-86 — window [10],[10],[10]; query [100] → outlier
    w = window_of([10.0, 10.0, 10.0])
    v = w.predict([100.0])
    assert v.error is None
    assert math.isinf(v.lof) and v.lof > 0
    assert v.outlier is True


def test_degenerate_inlier_nan():
    # query [10] vs window of identical [10]s: LOF = Inf/Inf = NaN; NaN > 1
    # is False → not an outlier (Go float semantics)
    w = window_of([10.0, 10.0, 10.0])
    v = w.predict([10.0])
    assert v.error is None
    assert math.isnan(v.lof)
    assert v.outlier is False


def test_empty_window_error():
    w = LofWindow()
    v = w.predict([1.0])
    assert v.error == "unable to predict, test vec size 0"  # lof.go:107-108


def test_skip_items_guard():
    w = LofWindow(skip_items=5)
    w.build([[1.0], [2.0], [3.0]], [0, 1, 2])
    v = w.predict([1.0])
    assert "skip items" in v.error  # lof.go:110-112


def test_knn_less_than_k_error():
    w = LofWindow()
    w.build([[1.0], [2.0]], [0, 1])
    v = w.predict([1.0])
    assert v.error == "knn less minimal value"  # brute.go:115-117


def test_k_too_small():
    w = window_of([1.0, 2.0, 3.0])
    w.k = 2
    v = w.predict([1.0])
    assert "too small" in v.error  # lof.go:168-173


def _reference_lof_oracle(window_vals, query):
    """Literal transcription of lof.go for 1-D points — an independent
    oracle for the vectorized implementation."""
    pts = [np.array([v]) for v in window_vals]
    q = np.array([query])
    k = 3

    def dist(a, b):
        return abs(float(a[0]) - float(b[0]))

    def knn(p, kk):
        ds = sorted((dist(p, s), i) for i, s in enumerate(pts))
        assert len(ds) >= kk
        return [pts[i] for _, i in ds[:kk]]

    def k_distance(p):
        return dist(p, knn(p, 3)[0])  # quirk: nearest, hardcoded 3

    def lrd(p):
        r = sum(max(k_distance(p), dist(p, y)) for y in knn(p, k))
        with np.errstate(divide="ignore"):
            return float(np.float64(1.0) / np.float64(r / k))

    nn = knn(q, k)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = float(np.sum([np.float64(lrd(y)) for y in nn]) / k)
        return float(np.float64(avg) / np.float64(lrd(q)))


@pytest.mark.parametrize("query", [0.0, 1.0, 2.0, 3.0, 10.0, 5.5, -4.0])
def test_non_degenerate_matches_oracle(query):
    vals = [0.0, 1.0, 2.0, 3.0, 10.0]
    w = window_of(vals)
    got = w.predict([query])
    expected = _reference_lof_oracle(vals, query)
    if math.isnan(expected):
        assert math.isnan(got.lof)
    else:
        assert got.lof == pytest.approx(expected, rel=1e-12)
    assert got.outlier == (expected > LOF_THRESHOLD)


def test_warmup_then_scoring():
    # manager.go:374-379: first max(skip,3) rows appended unscored
    verdicts = score_stream([[0.0], [1.0], [2.0], [3.0]])
    assert [v.error for v in verdicts[:3]] == ["warmup"] * 3
    assert verdicts[3].error is None


def test_verdict_gated_append():
    # FIXTURES.md G2 stream [0],[1],[2],[3],[50],[4] with
    # allow_append_outlier=False. Hand-replayed reference semantics:
    # warmup appends [0],[1],[2]; then [3] scores LOF=7/3 > 1 → OUTLIER
    # (the reference's quirky kDistance flags early post-warmup rows) and
    # is excluded; [50] and [4] both score against the frozen [0,1,2]
    # window (LOF 17.33 and 3.5) → outliers, excluded.
    stream = [[0.0], [1.0], [2.0], [3.0], [50.0], [4.0]]
    gated = score_stream(stream, allow_append_outlier=False)
    assert [v.error for v in gated[:3]] == ["warmup"] * 3
    assert gated[3].outlier is True
    assert gated[3].lof == pytest.approx(7.0 / 3.0)
    assert gated[4].outlier is True
    assert gated[5].outlier is True
    assert gated[5].lof == pytest.approx(3.5)
    # gated: nothing after warmup was appended; open: everything appended
    w_gated = LofWindow(allow_append_outlier=False)
    w_open = LofWindow(allow_append_outlier=True)
    for i, v in enumerate(stream):
        w_gated.process(v, i)
        w_open.process(v, i)
    assert len(w_gated) == 3
    assert len(w_open) == 6
    # with append allowed, [4] sees [0,1,2,3,50]: lrd(4)=1/2 vs mean
    # neighbour lrd 4/3 → LOF = 8/3, still an outlier:
    open_verdicts = score_stream(stream, allow_append_outlier=True)
    assert open_verdicts[5].outlier is True
    assert open_verdicts[5].lof == pytest.approx(8.0 / 3.0)


def test_allow_append_data_false_pure_scoring():
    # manager.go:409-414: after warmup the window never grows
    w = LofWindow(allow_append_data=False)
    for i, v in enumerate([[0.0], [1.0], [2.0], [3.0], [4.0]]):
        w.process(v, i)
    assert len(w) == 3  # only the warmup rows


def test_size_eviction():
    # brute.go:168-179: keep newest max_items, drop oldest first
    w = LofWindow(max_items=3)
    for i in range(5):
        w.append([float(i)], i)
    assert len(w) == 3
    assert [int(t) for t in w._ts] == [2, 3, 4]


def test_time_eviction_data_time():
    # data-time translation of brute.go:153-166 (no wall clock)
    w = LofWindow(max_storage_time_us=10)
    for t in [0, 5, 20, 25]:
        w.append([1.0], t)
    assert [int(t) for t in w._ts] == [20, 25]


def test_predict_batch_matches_predict():
    """Vectorized predict_batch must equal per-row predict exactly
    (the quirky-kDistance simplification is mathematically identical)."""
    import numpy as np

    rng = np.random.default_rng(5)
    w = LofWindow()
    pts = rng.normal(0, 1, size=(40, 3))
    w.build(list(pts), list(range(40)))
    Q = np.vstack([rng.normal(0, 1, size=(25, 3)), pts[:5] * 10])
    singles = [w.predict(q) for q in Q]
    batch = w.predict_batch(Q)
    for s, b in zip(singles, batch):
        if math.isnan(s.lof):
            assert math.isnan(b.lof)
        else:
            assert b.lof == pytest.approx(s.lof, rel=1e-12)
        assert b.outlier == s.outlier
        assert (b.error or None) == (s.error or None)
    # degenerate window (all identical) → NaN / Inf edges must agree
    w2 = LofWindow()
    w2.build([[1.0]] * 4, [0, 1, 2, 3])
    for q in ([1.0], [9.0]):
        s = w2.predict(q)
        b = w2.predict_batch([q])[0]
        assert (math.isnan(s.lof) and math.isnan(b.lof)) or b.lof == s.lof
        assert b.outlier == s.outlier
    # error guards
    empty = LofWindow()
    assert empty.predict_batch([[1.0]])[0].error == "unable to predict, test vec size 0"
    small = LofWindow()
    small.build([[1.0], [2.0]], [0, 1])
    assert small.predict_batch([[1.0]])[0].error == "knn less minimal value"


# ---------------------------------------------------------------------------
# K2: kd-tree backend (pkg/kdtree/tree.go) — identical verdicts to brute
# ---------------------------------------------------------------------------


def test_kdtree_knn_matches_brute_scan():
    """Pruned kd-tree KNN returns the same neighbour distances as a
    linear scan for every metric."""
    from sod_ray.functions.distance import pairwise
    from sod_ray.functions.kdtree import KDTree

    rng = np.random.default_rng(11)
    P = rng.normal(size=(300, 4))
    for metric in ("euclidean", "chebyshev", "manhattan"):
        t = KDTree(metric).build(P)
        for _ in range(25):
            q = rng.normal(size=4)
            _, d = t.knn(q, 7)
            brute = np.sort(pairwise(q[None, :], P, metric)[0], kind="stable")[:7]
            # scalar vs vectorized kernels differ only in fp association
            np.testing.assert_allclose(np.sort(d), brute, rtol=1e-12)


def test_kdtree_insert_balance_range():
    from sod_ray.functions.kdtree import KDTree

    rng = np.random.default_rng(12)
    P = rng.normal(size=(120, 3))
    t = KDTree().build(P[:60])
    for p in P[60:]:
        t.insert(p)
    t.balance()
    assert len(t) == 120
    idx, d = t.knn(P[5], 1)
    assert d[0] == 0.0
    box = np.array([[-0.4, 0.4]] * 3)
    got = sorted(t.range_search(box))
    want = sorted(np.flatnonzero(np.all((P >= -0.4) & (P <= 0.4), axis=1)).tolist())
    assert got == want


def test_lof_kdtree_backend_identical_verdicts():
    """NNFor parity (lof/config.go:23-30): alg='kd_tree' produces the
    SAME lof scores / outlier verdicts / errors as brute on a streamed
    replay with warmup, eviction and verdict-gated append."""
    rng = np.random.default_rng(13)
    base = rng.normal(0, 1, size=(200, 2))
    spikes = rng.normal(8, 0.5, size=(10, 2))
    vecs = np.vstack([base[:100], spikes[:5], base[100:], spikes[5:]])
    ts = np.arange(len(vecs), dtype=np.int64)
    kw = dict(k=3, skip_items=5, max_items=64, allow_append_outlier=False)
    a = score_stream(list(vecs), ts, alg="brute", **kw)
    b = score_stream(list(vecs), ts, alg="kd_tree", **kw)
    assert len(a) == len(b)
    for va, vb in zip(a, b):
        assert va.outlier == vb.outlier
        assert va.error == vb.error
        if va.error is None:
            if np.isnan(va.lof):
                assert np.isnan(vb.lof)
            else:
                np.testing.assert_allclose(va.lof, vb.lof, rtol=1e-12)


def test_lof_kdtree_readme_fixture():
    """README predict example via the kd-tree backend: [100] is the
    outlier against the [10],[10],[10] window."""
    w = LofWindow(k=3, alg="kd_tree")
    for v in ([10.0], [10.0], [10.0]):
        w.append(v)
    out = w.predict([100.0])
    inl = w.predict([10.0])
    assert out.outlier and not inl.outlier


def test_rank_boundary_tie_mask():
    """Tie iff the k-th and (k+1)-th order stats of query->stored
    distances are equal — the only case where KNN membership (and so
    avg-lrd) depends on scan order rather than the data."""
    w = window_of([0.0, 2.0, 4.0, 6.0])
    # query 3: d = [3,1,1,3] -> sorted [1,1,3,3]: rank-3 == rank-4 tie
    # query 1.5: d = [1.5,.5,2.5,4.5]: distinct boundary -> no tie
    mask = w.rank_boundary_tie([[3.0], [1.5]])
    assert mask.tolist() == [True, False]
    # a window of exactly k points can never have a boundary tie
    assert window_of([0.0, 2.0, 4.0]).rank_boundary_tie([[3.0]]).tolist() == [False]


def test_lof_predict_checked_matches_sql_oracle(ray_session):
    """End-to-end pin of the oracle-checked predict query: the Ray
    engine path (build_entity_windows -> PredictScorer actor pool)
    reproduces the DuckDB LOF transcription bit-for-bit on the
    tie-free rows at sf0.001."""
    import duckdb

    from sod_ray.pipelines.queries import LOF_PREDICT_SQL, lof_predict_checked

    sf = "/root/testdata/sf0.001"
    mine = (
        lof_predict_checked(sf)
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle = (
        con.sql(LOF_PREDICT_SQL)
        .df()
        .astype({"event_id": "int64", "user_id": "int64"})
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, oracle)


def test_lof_stream_frozen_checked_matches_sql_oracle(ray_session):
    """COLLECT-path pin: windowed_lof in pure-scoring mode (frozen
    3-row warmup window) reproduces the DuckDB transcription exactly
    at sf0.001 — window == k means no rank ties can occur."""
    import duckdb

    from sod_ray.pipelines.queries import LOF_STREAM_SQL, lof_stream_frozen_checked

    sf = "/root/testdata/sf0.001"
    mine = (
        lof_stream_frozen_checked(sf)
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle = (
        con.sql(LOF_STREAM_SQL)
        .df()
        .astype({"event_id": "int64", "user_id": "int64"})
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, oracle)
