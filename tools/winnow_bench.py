"""Winnowing fingerprint scale bench (fast hash path) with a planted
ground-truth check: the dedup-bench corpus (planted near-dup families,
1-2 token edits) — every family pair shares long substrings, so each
must share winnow fingerprints; unrelated docs (random 80-token draws
from a 50k vocab) share only short n-grams.

Usage: python tools/winnow_bench.py [n_docs]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int = 1_000_000):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from bench import contention_probe
    from tools.dedup_bench import gen_corpus

    d = f"/tmp/sod_dedup/corpus-{n_docs}"
    if not os.path.exists(f"{d}/docs/shard={31:05d}.parquet"):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        _, truth = gen_corpus(f"{d}/docs", n_docs, 32)
        with open(f"{d}/truth.json", "w") as f:
            json.dump(sorted(truth), f)
    truth = {tuple(p) for p in json.load(open(f"{d}/truth.json"))}

    probe_pre = contention_probe()
    from sod_ray.functions.text import winnow_fingerprints_fast

    def fp_batch(t: pa.Table) -> pa.Table:
        ids_out, fp_out = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            _, fps = winnow_fingerprints_fast(txt)
            u = np.unique(fps)
            ids_out.append(np.full(u.shape[0], did, np.int64))
            fp_out.append(u)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out) if ids_out else []),
                "fp": pa.array(
                    np.concatenate(fp_out).view(np.int64) if fp_out else []
                ),
            }
        )

    ds = rd.read_parquet(f"{d}/docs")
    t0 = time.perf_counter()
    fp_rows = ds.map_batches(fp_batch, batch_format="pyarrow")
    n_fps = fp_rows.count()
    fp_s = time.perf_counter() - t0

    # ground truth: sample 2k planted family pairs + 2k random
    # non-pairs; family pairs must share fingerprints, random pairs
    # (distinct 80-token draws) must share ~none
    rng = np.random.default_rng(11)
    tp = sorted(truth)
    samp = [tp[i] for i in rng.choice(len(tp), min(2000, len(tp)), replace=False)]
    need = sorted({x for p in samp for x in p})
    neg = []
    while len(neg) < 2000:
        a, b = rng.integers(0, n_docs, 2)
        if a != b and (min(a, b), max(a, b)) not in truth:
            neg.append((int(min(a, b)), int(max(a, b))))
    need = sorted(set(need) | {x for p in neg for x in p})
    need_arr = np.array(need, dtype=np.int64)
    import ray as _ray

    need_ref = _ray.put(need_arr)

    def keep_needed(t: pa.Table) -> pa.Table:
        na = _ray.get(need_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(na, ids)
        m = (pos < na.shape[0]) & (na[np.minimum(pos, na.shape[0] - 1)] == ids)
        return t.filter(pa.array(m))

    sub = fp_rows.map_batches(keep_needed, batch_format="pyarrow").to_pandas()
    by_doc = {did: set(g["fp"]) for did, g in sub.groupby("doc_id")}

    def overlap(a, b):
        return len(by_doc.get(a, set()) & by_doc.get(b, set()))

    # a single shared fp is NOT discriminative (the winnow guarantee is
    # one-directional; frequent 5-grams collide) — the shared COUNT is:
    # family pairs (1-2 token edits of an 80-token doc) share most of
    # their ~115 fps, random draws share a handful of frequent grams
    fam_counts = np.array([overlap(a, b) for a, b in samp])
    neg_counts = np.array([overlap(a, b) for a, b in neg])
    thr = 40
    print(json.dumps({
        "n_docs": n_docs,
        "winnow_sec": round(fp_s, 1),
        "docs_per_sec": round(n_docs / fp_s, 1),
        "fingerprints": int(n_fps),
        "fps_per_doc": round(n_fps / n_docs, 1),
        "family_shared_median": int(np.median(fam_counts)),
        "random_shared_median": int(np.median(neg_counts)),
        "random_shared_p999": int(np.percentile(neg_counts, 99.9)),
        "family_rate_at_40": round(float((fam_counts >= thr).mean()), 5),
        "random_rate_at_40": round(float((neg_counts >= thr).mean()), 5),
        "probe_pre": probe_pre,
        "probe_post": contention_probe(),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)


def overlap_pairs_bench(n_docs: int = 5_000_000, min_shared: int = 20,
                        fp_sample: int = 8):
    """Distributed winnow-overlap pair mining on the planted-family
    corpus: family pairs (1-2 token edits, long shared substrings)
    must be recovered; random pairs (median 6 shared fps) must not.
    Measures the full fp-exchange -> capped pair expansion -> count
    threshold chain (stages/dedup.winnow_overlap_pairs_ds)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from bench import contention_probe
    from sod_ray.stages.dedup import winnow_overlap_pairs_ds
    from tools.dedup_bench import gen_corpus

    d = f"/tmp/sod_dedup/corpus-{n_docs}"
    if not os.path.exists(f"{d}/truth.json"):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        _, truth = gen_corpus(f"{d}/docs", n_docs, 64)
        with open(f"{d}/truth.json", "w") as f:
            json.dump(sorted(truth), f)
    truth = {tuple(p) for p in json.load(open(f"{d}/truth.json"))}

    probe_pre = contention_probe()
    ds = rd.read_parquet(f"{d}/docs")
    t0 = time.time()
    pairs = winnow_overlap_pairs_ds(
        ds, "text", "doc_id", k=16, w=16,
        min_shared=min_shared, max_df=256, fp_sample=fp_sample,
    ).to_pandas()
    wall = time.time() - t0
    probe_post = contention_probe()
    got = {
        (int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])
    }
    tp = len(got & truth)
    print(json.dumps({
        "mode": "overlap_pairs",
        "n_docs": n_docs,
        "min_shared": min_shared,
        "fp_sample": fp_sample,
        "wall_s": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "n_pairs": len(got),
        "n_truth": len(truth),
        "recall": round(tp / max(1, len(truth)), 4),
        "precision": round(tp / max(1, len(got)), 4),
        "probe_pre": probe_pre,
        "probe_post": probe_post,
    }))
    ray.shutdown()
