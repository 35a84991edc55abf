"""Similarity search over an embedding column (list<float>).

Two paths per the brief:

- ``brute_force_topk``: the exact baseline — the query matrix is
  broadcast ONCE with ``ray.put``; every batch does one numpy matmul
  and keeps its per-batch top-k (a few rows per query per batch); the
  driver merges the tiny partials into the global top-k. No shuffle of
  the embedding table.
- ``ivf_topk``: the scale path — coarse centroids are trained once on a
  seeded sample (k-means, driver-side, deterministic); every batch
  assigns its vectors to centroids and only scores vectors whose
  centroid is among the query's ``nprobe`` closest. Same output schema;
  recall traded for compute.

The kNN kernel itself is the distributed twin of the reference's
brute-force index (/root/reference/internal/predictor/knn/brute/
brute.go:94-119 — linear scan + capacity-k priority queue): argpartition
over a batch replaces the insertion-sorted queue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _to_matrix(col, dtype=np.float32) -> np.ndarray:
    vals = col.to_pylist() if isinstance(col, (pa.Array, pa.ChunkedArray)) else list(col)
    return np.stack([np.asarray(v, dtype=dtype) for v in vals])


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def brute_force_topk(
    ds,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_ids: list | None = None,
    dtype=np.float32,
) -> pd.DataFrame:
    """Exact cosine top-k of each query against the whole dataset.

    Returns a DataFrame (query_id, id, cosine, rank) with deterministic
    tie-break by id. ``dtype=np.float64`` for oracle-grade precision."""
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=dtype)))
    q_ref = ray.put(Q)
    qids = query_ids if query_ids is not None else list(range(Q.shape[0]))

    def batch_topk(batch: pa.Table) -> pa.Table:
        # plain task, not an actor pool: ray.get of a numpy matrix from
        # the local object store is zero-copy, so there is no per-task
        # deserialization worth caching — and task pools skip the
        # actor-startup latency entirely
        Q = ray.get(q_ref)
        V = _normalize(_to_matrix(batch[vec_col], dtype))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        S = Q @ V.T  # (n_q, n_batch)
        kk = min(k, S.shape[1])
        # per-query top-k within the batch (argpartition = pqueue cap)
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        rows = {"query_idx": [], "cand_id": [], "cosine": []}
        for qi in range(S.shape[0]):
            sel = part[qi]
            rows["query_idx"].extend([qi] * kk)
            rows["cand_id"].extend(ids[sel])
            rows["cosine"].extend(S[qi, sel].astype(np.float64))
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int64()),
                "cand_id": pa.array(rows["cand_id"]),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    partials = ds.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "cand_id"], ascending=[False, True], kind="stable")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        top["query_id"] = qids[qi]
        out.append(top[["query_id", "cand_id", "cosine", "rank"]])
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "cand_id", "cosine", "rank"]
    )


def train_centroids(
    ds, vec_col: str, n_centroids: int = 64, sample_rows: int = 10_000, seed: int = 5
) -> np.ndarray:
    """Seeded k-means (few iterations) on a deterministic UNIFORM
    sample (seeded random_sample — a bare limit() takes the first
    blocks, which is biased when the corpus is ordered) — driver-side,
    tiny. The IVF coarse quantizer."""
    total = ds.count()  # parquet metadata / cached count
    if total > sample_rows:
        frac = min(1.0, (2.5 * sample_rows) / total)
        sample = ds.random_sample(frac, seed=seed).limit(sample_rows).to_pandas()
    else:
        sample = ds.to_pandas()
    X = _normalize(_to_matrix(sample[vec_col].tolist()))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, X.shape[0])
    C = X[rng.choice(X.shape[0], n_centroids, replace=False)].copy()
    for _ in range(10):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    C[c] = v / norm
    return C


def ivf_topk(
    ds,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    k: int = 10,
    centroids: np.ndarray | None = None,
    nprobe: int = 8,
    query_ids: list | None = None,
) -> pd.DataFrame:
    """IVF-style ANN: score only vectors whose centroid is among the
    query's nprobe nearest. centroids=None trains them on a sample."""
    if centroids is None:
        centroids = train_centroids(ds, vec_col)
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
    probe = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    q_ref = ray.put((Q, centroids, probe))
    qids = query_ids if query_ids is not None else list(range(Q.shape[0]))

    def ivf_batch_topk(batch: pa.Table) -> pa.Table:
        # plain task (see batch_topk): broadcast numpy payloads are
        # zero-copy reads from the local object store
        Q, C, probe = ray.get(q_ref)
        V = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(V @ C.T, axis=1)
        rows = {"query_idx": [], "cand_id": [], "cosine": []}
        for qi in range(Q.shape[0]):
            mask = np.isin(assign, probe[qi])
            if not mask.any():
                continue
            sub = V[mask]
            sub_ids = ids[mask]
            s = sub @ Q[qi]
            kk = min(k, s.shape[0])
            sel = np.argpartition(-s, kk - 1)[:kk]
            rows["query_idx"].extend([qi] * kk)
            rows["cand_id"].extend(sub_ids[sel])
            rows["cosine"].extend(s[sel].astype(np.float64))
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int64()),
                "cand_id": pa.array(rows["cand_id"]),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    partials = ds.map_batches(ivf_batch_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "cand_id"], ascending=[False, True], kind="stable")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        top["query_id"] = qids[qi]
        out.append(top[["query_id", "cand_id", "cosine", "rank"]])
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "cand_id", "cosine", "rank"]
    )
