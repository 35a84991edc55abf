"""DSIR importance-resampling scale bench with a planted-truth gate.

Corpus: N docs of ~60 tokens. Background docs draw from a 50k-word
noise vocab; a `target_frac` fraction (lang='en') draw from a DISJOINT
2k-word target vocab, and a further `planted_frac` fraction
(lang='xx' — NOT in the target slice) also draw from the target vocab.
DSIR trained on target-vs-all must rank every planted doc above every
background doc: the gate checks that the global top-(n_planted) by
logw contains exactly the planted + target docs (modulo the few
weight ties at the boundary — measured exact on this generator).

Shape under test (the 10^12-doc story): two linear scans whose reduce
is a B-long int vector (no row shuffle), one broadcast, one scoring
scan, per-batch partial top-k. Nothing here is O(corpus) on the
driver.

Usage: python tools/dsir_bench.py [n_docs] [n_shards]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_VOCAB = 50_000
TARGET_VOCAB = 2_000
DOC_TOKENS = 60
TARGET_FRAC = 0.02  # lang='en' docs defining the target distribution
PLANTED_FRAC = 0.001  # lang='xx' docs drawn from the target vocab


def gen_corpus(out_dir: str, n_docs: int, n_shards: int, seed: int = 9):
    import ray

    @ray.remote(num_cpus=1)
    def gen_shard(s: int, per: int):
        import pyarrow.parquet as pq

        rng = np.random.default_rng(seed * 77_003 + s)
        base = s * per
        n_tgt = int(per * TARGET_FRAC)
        n_planted = int(per * PLANTED_FRAC)
        idx = rng.integers(0, NOISE_VOCAB, size=(per, DOC_TOKENS))
        # rows [0, n_tgt): target slice; rows [n_tgt, n_tgt+n_planted):
        # planted target-like docs outside the slice
        tgt_rows = n_tgt + n_planted
        idx[:tgt_rows] = rng.integers(
            0, TARGET_VOCAB, size=(tgt_rows, DOC_TOKENS)
        )
        texts = [" ".join(f"t{t}" for t in row) for row in idx[:tgt_rows]]
        texts += [
            " ".join(f"w{t}" for t in row) for row in idx[tgt_rows:]
        ]
        langs = ["en"] * n_tgt + ["xx"] * (per - n_tgt)
        # zstd-3: token text packs ~1.6x tighter than snappy — at 2e8
        # docs that is the difference between fitting this volume or not
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(base, base + per, dtype=np.int64)
                    ),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            ),
            f"{out_dir}/shard={s:05d}.parquet",
            compression="zstd",
            compression_level=3,
        )
        return (
            list(range(base, base + n_tgt)),  # target ids
            list(range(base + n_tgt, base + tgt_rows)),  # planted ids
        )

    os.makedirs(out_dir, exist_ok=True)
    per = n_docs // n_shards
    t0 = time.perf_counter()
    parts = ray.get([gen_shard.remote(s, per) for s in range(n_shards)])
    target_ids = {i for p in parts for i in p[0]}
    planted_ids = {i for p in parts for i in p[1]}
    return time.perf_counter() - t0, target_ids, planted_ids


def main(n_docs: int = 1_000_000, n_shards: int = 32):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=32,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from bench import contention_probe
    from sod_ray.stages.dsir import (
        dsir_log_ratio,
        dsir_log_weights,
        dsir_top_k,
        gram_bucket_counts,
    )

    d = f"/tmp/sod_dsir/corpus-{n_docs}"
    truth_f = f"{d}/truth.json"
    if not os.path.exists(truth_f):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(f"{d}/docs", exist_ok=True)
        gen_s, target_ids, planted_ids = gen_corpus(
            f"{d}/docs", n_docs, n_shards
        )
        with open(truth_f, "w") as f:
            json.dump(
                {
                    "gen_s": gen_s,
                    "target": sorted(target_ids),
                    "planted": sorted(planted_ids),
                },
                f,
            )
    tr = json.load(open(truth_f))
    target_ids = set(tr["target"])
    planted_ids = set(tr["planted"])

    probe_pre = contention_probe()
    B = 65_536
    ds = rd.read_parquet(f"{d}/docs", columns=["doc_id", "text", "lang"])

    t0 = time.perf_counter()
    raw = gram_bucket_counts(ds, n_buckets=B)
    t_raw = time.perf_counter() - t0
    t0 = time.perf_counter()
    tgt = gram_bucket_counts(ds.filter(expr="lang == 'en'"), n_buckets=B)
    t_tgt = time.perf_counter() - t0
    lr = dsir_log_ratio(raw, tgt)

    k = len(planted_ids) + len(target_ids)
    t0 = time.perf_counter()
    w = dsir_log_weights(ds, lr)
    top = dsir_top_k(w, k)
    t_score = time.perf_counter() - t0
    wall = t_raw + t_tgt + t_score
    probe_post = contention_probe()

    got = set(top["doc_id"].to_pylist())
    want = planted_ids | target_ids
    hit = len(got & want)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_buckets": B,
                "wall_s": round(wall, 1),
                "raw_counts_s": round(t_raw, 1),
                "target_counts_s": round(t_tgt, 1),
                "score_topk_s": round(t_score, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "topk": k,
                "topk_truth_overlap": hit,
                "truth_exact": hit == k,
                "probe_pre": probe_pre,
                "probe_post": probe_post,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
    )
