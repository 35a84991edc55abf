"""Read-only scoring against per-entity stored models — the PREDICT
path of the reference (SURVEY.md §3.2; /root/reference/internal/predict/
handler.go:65-148 + dispatcher predictor registry manager.go:270-295).

Semantics replicated:

- models are built from previously COLLECTed data only; request rows
  never enter the model (predict/handler.go — scoring is pure),
- scoring an entity with no stored window yields the reference's
  error verdict "unable to predict, test vec size 0" (lof.go:107-108;
  the registry creates an empty predictor for unknown entities,
  manager.go:277-286, so unknown == empty),
- windows respect max_items retention (newest rows win),
- the reference caps predict requests at 10 points
  (predict/config.go:7 MaxDataItemsLen); in the batch engine that
  cap maps to ``batch_size`` — there is no semantic row limit.

Ray shape: the window dict is built once (bounded: entities ×
max_items × dim) and broadcast via ``ray.put``; the scorer is an actor
pool fetching it once per actor in ``__init__`` (the K6 registry
analog), scoring each batch vectorized."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.lof import LofWindow

MAX_DATA_ITEMS_LEN = 10  # reference predict/config.go:7 (documented cap)


def build_entity_windows(
    build_ds,
    key: str,
    ts_col: str,
    feature_cols: list[str],
    max_items: int = 0,
    k: int = 3,
    metric: str = "euclidean",
    skip_items: int = 0,
) -> dict:
    """Build {entity: LofWindow} from a collect dataset: per entity,
    ts-sorted, newest ``max_items`` retained (brute.go:168-179). Runs
    the per-entity fold distributed (map_groups), then collects the
    BOUNDED window state to the driver for broadcast."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        if max_items > 0:
            g = g.tail(max_items)
        vecs = g[feature_cols].to_numpy(dtype=np.float64)
        ts = g[ts_col].astype("int64").to_numpy()
        return pd.DataFrame(
            {
                "entity": [str(g[key].iloc[0])],
                "vecs": [vecs.tolist()],
                "ts": [ts.tolist()],
            }
        )

    rows = (
        build_ds.select_columns([key, ts_col] + feature_cols)
        .groupby(key)
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    windows = {}
    for _, r in rows.iterrows():
        w = LofWindow(
            k=k, metric=metric, skip_items=skip_items, max_items=max_items
        )
        w.build([np.asarray(v) for v in r["vecs"]], r["ts"])
        windows[r["entity"]] = w
    return windows


def save_windows(windows: dict, path: str) -> None:
    """Persist per-entity window state as parquet (the reference's
    metric store snapshot, metric/database/metric.go — rows keyed by
    entity, vectors + timestamps). Atomic write-then-rename."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    rows = {
        "entity": [],
        "vecs": [],
        "ts": [],
        "k": [],
        "metric": [],
        "max_items": [],
        "skip_items": [],
    }
    for entity, w in windows.items():
        rows["entity"].append(entity)
        rows["vecs"].append([v.tolist() for v in w._vecs])
        rows["ts"].append(list(w._ts))
        rows["k"].append(w.k)
        rows["metric"].append(w.metric)
        rows["max_items"].append(w.max_items)
        rows["skip_items"].append(w.skip_items)
    t = pa.table(
        {
            "entity": pa.array(rows["entity"], pa.string()),
            "vecs": pa.array(rows["vecs"], pa.list_(pa.list_(pa.float64()))),
            "ts": pa.array(rows["ts"], pa.list_(pa.int64())),
            "k": pa.array(rows["k"], pa.int32()),
            "metric": pa.array(rows["metric"], pa.string()),
            "max_items": pa.array(rows["max_items"], pa.int64()),
            "skip_items": pa.array(rows["skip_items"], pa.int64()),
        }
    )
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    os.close(fd)
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def load_windows(path: str) -> dict:
    """Restore windows from a snapshot (the bulkLoad recovery analog,
    dispatcher/manager.go:311-354 — but from columnar state, no replay)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    windows = {}
    for row in t.to_pylist():
        w = LofWindow(
            k=row["k"],
            metric=row["metric"],
            max_items=row["max_items"],
            skip_items=row["skip_items"],
        )
        w.build([np.asarray(v) for v in row["vecs"]], row["ts"])
        windows[row["entity"]] = w
    return windows


class PredictScorer:
    """Actor: fetch the broadcast window dict once; score batches
    read-only (no state mutation — predict path)."""

    def __init__(
        self,
        windows_ref,
        key: str,
        feature_cols: list[str],
        tie_mask: bool = False,
    ):
        self.windows = (
            ray.get(windows_ref) if not isinstance(windows_ref, dict) else windows_ref
        )
        self.key = key
        self.feature_cols = feature_cols
        # emit a `rank_tie` column marking rows whose kNN membership is
        # distance-tied at the k-th rank (order-dependent verdicts);
        # used by the oracle-checked predict query to exclude them.
        self.tie_mask = tie_mask
        self._empty = LofWindow()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-entity scoring: group the batch by entity,
        one ``predict_batch`` call per entity (pairwise + top-k across
        all that entity's rows at once)."""
        batch = batch.copy()
        lofs = np.full(len(batch), np.nan)
        outliers = np.zeros(len(batch), dtype=bool)
        errors = np.array([""] * len(batch), dtype=object)
        keys = batch[self.key].astype(str).to_numpy()
        feats = batch[self.feature_cols].to_numpy(dtype=np.float64)
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1]))
        )
        bounds = np.append(bounds, len(keys))
        ties = np.zeros(len(batch), dtype=bool) if self.tie_mask else None
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            idx = order[b0:b1]
            w = self.windows.get(sorted_keys[b0], self._empty)
            verdicts = w.predict_batch(feats[idx])
            lofs[idx] = [v.lof for v in verdicts]
            outliers[idx] = [v.outlier for v in verdicts]
            errors[idx] = [v.error or "" for v in verdicts]
            if ties is not None and len(w):
                ties[idx] = w.rank_boundary_tie(feats[idx])
        batch["lof"] = lofs
        batch["outlier"] = outliers
        batch["verdict_error"] = errors
        if ties is not None:
            batch["rank_tie"] = ties
        return batch


def predict_against_windows(
    query_ds,
    windows: dict,
    key: str,
    feature_cols: list[str],
    concurrency=(1, 8),
    batch_size: int = 4096,
    tie_mask: bool = False,
):
    """Score a query Dataset against prebuilt windows (broadcast once,
    read per actor — never re-shipped per batch)."""
    ref = ray.put(windows)
    return query_ds.map_batches(
        PredictScorer,
        fn_constructor_kwargs={
            "windows_ref": ref,
            "key": key,
            "feature_cols": feature_cols,
            "tie_mask": tie_mask,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
