"""Predict-path parity (S2/K6), metric projection (M2/M3), plugin
registry (§2.7), and the K7 norm_vec cache."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_build_and_predict(ray_session):
    import ray.data as rd

    from sod_ray.stages.predictor import build_entity_windows, predict_against_windows

    build = pd.DataFrame(
        {
            "entity": ["a"] * 5 + ["b"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"]
                + ["2024-01-01", "2024-01-02"]
            ),
            "value": [0.0, 1.0, 2.0, 3.0, 10.0, 5.0, 6.0],
        }
    )
    windows = build_entity_windows(
        rd.from_pandas(build), key="entity", ts_col="ts", feature_cols=["value"]
    )
    assert set(windows) == {"a", "b"} and len(windows["a"]) == 5

    queries = pd.DataFrame(
        {
            "entity": ["a", "a", "b", "ghost"],
            "value": [1.0, 100.0, 5.0, 1.0],
        }
    )
    out = (
        predict_against_windows(
            rd.from_pandas(queries), windows, key="entity", feature_cols=["value"]
        )
        .to_pandas()
        .sort_index()
    )
    # [100] vs a's window is an outlier; [1] is not
    assert bool(out.iloc[1]["outlier"]) is True
    assert bool(out.iloc[0]["outlier"]) is False
    # entity b has only 2 stored points → KNN(k=3) error (brute.go:115-117)
    assert out.iloc[2]["verdict_error"] == "knn less minimal value"
    # unknown entity == empty predictor → reference error (lof.go:107-108)
    assert out.iloc[3]["verdict_error"] == "unable to predict, test vec size 0"
    # predict never mutates state (predict path is read-only)
    assert len(windows["a"]) == 5


def test_norm_vec_cache(ray_session):
    import ray.data as rd

    from sod_ray.stages.window import windowed_lof

    # [1] vs warmup window [1,1,1] scores NaN → scored INLIER (updates
    # the cache); [50] is then an outlier carrying norm_vec=[1].
    df = pd.DataFrame(
        {
            "k": ["x"] * 5,
            "ts": pd.to_datetime(["2024-01-0%d" % d for d in range(1, 6)]),
            "v": [1.0, 1.0, 1.0, 1.0, 50.0],
        }
    )
    out = windowed_lof(
        rd.from_pandas(df),
        key="k",
        ts_col="ts",
        feature_cols=["v"],
        flagged_only=True,
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["v"] == 50.0
    assert list(out.iloc[0]["norm_vec"]) == [1.0]
    # reference nil-quirk parity: an outlier BEFORE any scored inlier
    # carries norm_vec=None (manager.go:395-402 reads an empty cache)
    df2 = df.assign(v=[0.0, 1.0, 2.0, 3.0, 50.0])
    out2 = windowed_lof(
        rd.from_pandas(df2),
        key="k",
        ts_col="ts",
        feature_cols=["v"],
        flagged_only=True,
    ).to_pandas()
    first = out2.sort_values("ts").iloc[0]
    assert first["norm_vec"] is None


def test_metric_projection(ray_session):
    from sod_ray.stages.metric import (
        STATUS_NEW,
        add_metric_columns,
        is_new,
        is_processed,
        mark_processed,
    )

    t = pa.table(
        {
            "entity": ["a", "a", "b"],
            "ts": pa.array(
                pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
                pa.timestamp("us"),
            ),
        }
    )
    out = add_metric_columns(t, "entity", "ts")
    ids = out["row_id"].to_pylist()
    assert len(set(ids)) == 3  # distinct
    out2 = add_metric_columns(t, "entity", "ts")
    assert out2["row_id"].to_pylist() == ids  # deterministic (resume-safe)
    assert out["status"].to_pylist() == [STATUS_NEW] * 3
    assert is_new(out).to_pylist() == [True] * 3
    done = mark_processed(out)
    assert is_processed(done).to_pylist() == [True] * 3


def test_registry(ray_session):
    import ray.data as rd

    from sod_ray.stages.registry import available, get, register, run_constraint

    assert "null_rate" in available() and "uniqueness" in available()
    with pytest.raises(ValueError):
        get("nope")

    NullRate = get("null_rate")
    ds = rd.from_arrow(pa.table({"x": [1.0, None, 3.0, 4.0]}))
    ok, ev = run_constraint(ds, NullRate("x", max_rate=0.5))
    assert ok and ev["null_rate"] == 0.25
    ok2, _ = run_constraint(ds, NullRate("x", max_rate=0.1))
    assert not ok2

    Uniq = get("uniqueness")
    ds2 = rd.from_arrow(pa.table({"u": [f"u{i}" for i in range(100)] + ["u0"] * 10}))
    ok3, ev3 = run_constraint(ds2, Uniq("u", max_dup_rate=0.01))
    assert not ok3 and ev3["dup_est"] > 5

    @register(name="custom_rowcount")
    class RowCount:
        name = "custom_rowcount"

        def partial(self, batch):
            return {"n": len(batch)}

        def merge(self, a, b):
            return {"n": a["n"] + b["n"]}

        def verdict(self, state):
            return state["n"] > 0, state

    ok4, ev4 = run_constraint(ds2, get("custom_rowcount")())
    assert ok4 and ev4["n"] == 110


def test_window_snapshot_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from sod_ray.stages.predictor import (
        build_entity_windows,
        load_windows,
        predict_against_windows,
        save_windows,
    )

    build = pd.DataFrame(
        {
            "entity": ["a"] * 5 + ["b"] * 4,
            "ts": pd.date_range("2024-01-01", periods=5).tolist()
            + pd.date_range("2024-01-01", periods=4).tolist(),
            "value": [0.0, 1.0, 2.0, 3.0, 10.0, 5.0, 6.0, 7.0, 8.0],
        }
    )
    windows = build_entity_windows(
        rd.from_pandas(build), key="entity", ts_col="ts", feature_cols=["value"]
    )
    path = str(tmp_path / "windows.parquet")
    save_windows(windows, path)
    restored = load_windows(path)
    assert set(restored) == set(windows)
    q = pd.DataFrame({"entity": ["a", "b"], "value": [100.0, 6.5]})
    a = predict_against_windows(
        rd.from_pandas(q), windows, key="entity", feature_cols=["value"]
    ).to_pandas()
    b = predict_against_windows(
        rd.from_pandas(q), restored, key="entity", feature_cols=["value"]
    ).to_pandas()
    assert a["outlier"].tolist() == b["outlier"].tolist()
    assert a["lof"].tolist() == pytest.approx(b["lof"].tolist(), nan_ok=True)


def test_uniqueness_composite(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sod_ray.stages.constraints import uniqueness_check

    clean = rd.from_arrow(pa.table({"u": [f"u{i}" for i in range(5000)]}))
    verdict, viol = uniqueness_check(clean, "u")
    assert verdict["passed"] and verdict["path"] == "hll_estimate" and viol is None

    dirty = rd.from_arrow(
        pa.table({"u": [f"u{i}" for i in range(1000)] + ["u1"] * 200})
    )
    verdict2, viol2 = uniqueness_check(dirty, "u", max_dup_rate=0.01)
    assert verdict2["path"] == "exact_fallback"
    assert not verdict2["passed"]
    assert verdict2["dup_rows"] == 200
    assert set(viol2.to_pandas()["u"]) == {"u1"}
