"""IVF recall@k vs exact brute force on the fixture embeddings
(ROADMAP round-3 #4). Seeded queries drawn from the table itself;
recall@k = |ivf_topk ∩ brute_topk| / k averaged over queries, for a
sweep of nprobe values.

Usage: python tools/ann_recall.py [sf_dir] [k]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_clustered(n: int, dim: int = 64, n_clusters: int = 64, seed: int = 3):
    """Clustered corpus (the shape real doc embeddings have): unit
    cluster centers + Gaussian noise, renormalized."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, n_clusters, n)
    # noise VECTOR norm ≈ 0.65 vs unit centers (scale by 1/sqrt(dim)) —
    # overlapping-but-real clusters, the regime real embeddings live in
    X = centers[lab] + (0.65 / np.sqrt(dim)) * rng.normal(
        size=(n, dim)
    ).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


def main(sf_dir: str = "/root/testdata/sf0.1", k: int = 10):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from sod_ray.stages.similarity import (
        brute_force_topk,
        ivf_topk,
        train_centroids,
    )

    rng = np.random.default_rng(7)
    if sf_dir.startswith("synthetic:"):
        n_syn = int(sf_dir.split(":", 1)[1])
        X = synth_clustered(n_syn)
        import pyarrow as pa

        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n_syn, dtype=np.int64)),
                "embedding": pa.array(list(X), pa.list_(pa.float32())),
            }
        )
        ds = rd.from_arrow(t).repartition(32).materialize()
        n = n_syn
    else:
        path = os.path.join(sf_dir, "embeddings.parquet")
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"]).materialize()
        n = ds.count()
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vec_id", "embedding"])

    # seeded queries: 20 vectors spread across the table
    qidx = rng.choice(t.num_rows, 20, replace=False)
    Q = np.stack([np.asarray(t["embedding"][int(i)].as_py(), np.float32)
                  for i in qidx])
    qids = [int(t["vec_id"][int(i)].as_py()) for i in qidx]

    t0 = time.perf_counter()
    brute = brute_force_topk(ds, Q, "embedding", "vec_id", k=k,
                             query_ids=qids, dtype=np.float64)
    brute_s = time.perf_counter() - t0
    truth = {
        q: set(g["cand_id"]) for q, g in brute.groupby("query_id")
    }

    t0 = time.perf_counter()
    C = train_centroids(ds, "embedding", n_centroids=64)
    train_s = time.perf_counter() - t0

    sweep = {}
    for nprobe in (2, 4, 8, 16):
        t0 = time.perf_counter()
        ivf = ivf_topk(ds, Q, "embedding", "vec_id", k=k, centroids=C,
                       nprobe=nprobe, query_ids=qids)
        took = time.perf_counter() - t0
        recs = [
            len(set(g["cand_id"]) & truth[q]) / k
            for q, g in ivf.groupby("query_id")
        ]
        # queries with no ivf rows at all count as zero recall
        recs += [0.0] * (len(truth) - len(recs))
        sweep[nprobe] = {
            "recall_at_k": round(float(np.mean(recs)), 4),
            "sec": round(took, 2),
        }

    print(json.dumps({
        "sf_dir": sf_dir,
        "rows": n,
        "k": k,
        "n_queries": len(qids),
        "brute_sec": round(brute_s, 2),
        "train_sec": round(train_s, 2),
        "n_centroids": int(C.shape[0]),
        "nprobe_sweep": sweep,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
    )
