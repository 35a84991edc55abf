"""Bloom pre-filter A/B at the cross-batch-dedup primitive level:
an accumulated index of N md5 hashes vs an arrival batch of M rows
(dup_frac of them already indexed). Measures the large-index probe
path of run_export_incremental both ways:

  A: bucketed_anti_join(batch, index)            (every row ships)
  B: bloom probe (one scan) -> anti-join of HITS (dups + fp only)

plus the one-time bloom build cost, and checks both paths keep an
IDENTICAL row set (bloom misses are provably absent — exactness).

Usage: python tools/bloom_bench.py [index_rows] [batch_rows] [dup_frac]
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


def main(
    index_rows: int = 20_000_000,
    batch_rows: int = 2_000_000,
    dup_frac: float = 0.01,
):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from bench import contention_probe
    from sod_ray.stages.constraints import bucketed_anti_join
    from sod_ray.stages.stats import bloom_build_column
    from sod_ray.state.sketches import hash64

    d = "/tmp/sod_bloom_bench"
    shutil.rmtree(d, ignore_errors=True)

    # index: hex-encoded 64-bit hashes of ids [0, N) — md5 stand-ins
    def hex_block(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        h = hash64(pa.array(ids.astype(np.int64)))
        return pa.table(
            {"h": pa.array([f"{x:016x}" for x in h], pa.string())}
        )

    rd.range(index_rows, override_num_blocks=64).map_batches(
        hex_block, batch_format="pyarrow"
    ).write_parquet(f"{d}/index")

    # arrival batch: dup_frac rows reuse indexed ids, rest are fresh
    def batch_block(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = np.random.default_rng(int(ids[0]) if len(ids) else 0)
        dup = rng.random(len(ids)) < dup_frac
        src = np.where(dup, rng.integers(0, index_rows, len(ids)),
                       ids + index_rows)
        h = hash64(pa.array(src))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "__h": pa.array([f"{x:016x}" for x in h], pa.string()),
            }
        )

    rd.range(batch_rows, override_num_blocks=32).map_batches(
        batch_block, batch_format="pyarrow"
    ).write_parquet(f"{d}/batch")

    probe_pre = contention_probe()
    idx = rd.read_parquet(f"{d}/index")
    batch = rd.read_parquet(f"{d}/batch")

    # --- A: full anti-join ---
    t0 = time.perf_counter()
    a_rows = bucketed_anti_join(
        batch, idx, fk="__h", pk="h"
    ).count()
    t_anti = time.perf_counter() - t0

    # --- B: bloom build (one-time, amortized over every later batch)
    # + probe scan + anti-join of the hits ---
    t0 = time.perf_counter()
    bf = bloom_build_column(idx, "h", m_bits=1 << 28, k=7)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    bref = ray.put(bf)

    def add_hit(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        return t.append_column(
            "__bh", pa.array(b.contains_array(t["__h"]))
        )

    probed = rd.read_parquet(f"{d}/batch").map_batches(
        add_hit, batch_format="pyarrow"
    ).materialize()
    miss = probed.filter(expr="__bh == False").drop_columns(["__bh"])
    hits = probed.filter(expr="__bh == True").drop_columns(["__bh"])
    n_hits = hits.count()
    # the export loop's hit-resolution shape: broadcast sorted hit
    # hashes -> column-pruned index scan (NO shuffle) -> broadcast the
    # found set back
    hh_pd = hits.select_columns(["__h"]).to_pandas()["__h"]
    hh = np.unique(np.asarray(hh_pd, dtype="S32"))
    hh64 = np.sort(hash64(pa.array(hh_pd)).view(np.int64))
    href = ray.put((hh, hh64))

    def found_in_shard(t: pa.Table) -> pa.Table:
        s, s64 = ray.get(href)
        h64 = hash64(t["h"].combine_chunks()).view(np.int64)
        pos = np.minimum(np.searchsorted(s64, h64), s64.shape[0] - 1)
        cand = t.filter(pa.array(s64[pos] == h64))
        if cand.num_rows == 0:
            return cand
        hs = np.asarray(cand["h"].to_pylist(), dtype="S32")
        p2 = np.minimum(np.searchsorted(s, hs), s.shape[0] - 1)
        return cand.filter(pa.array(s[p2] == hs))

    found = np.unique(
        np.asarray(
            rd.read_parquet(f"{d}/index")
            .map_batches(found_in_shard, batch_format="pyarrow")
            .to_pandas()["h"],
            dtype="S32",
        )
    )
    fref = ray.put(found)

    def drop_found(t: pa.Table) -> pa.Table:
        f = ray.get(fref)
        if f.shape[0] == 0 or t.num_rows == 0:
            return t
        hs = np.asarray(t["__h"].to_pylist(), dtype="S32")
        pos = np.minimum(np.searchsorted(f, hs), f.shape[0] - 1)
        return t.filter(pa.array(f[pos] != hs))

    b_rows = miss.union(
        hits.map_batches(drop_found, batch_format="pyarrow")
    ).count()
    t_bloom = time.perf_counter() - t0
    probe_post = contention_probe()

    print(
        json.dumps(
            {
                "index_rows": index_rows,
                "batch_rows": batch_rows,
                "dup_frac": dup_frac,
                "anti_join_s": round(t_anti, 1),
                "bloom_build_s": round(t_build, 1),
                "bloom_path_s": round(t_bloom, 1),
                "speedup_steady_state": round(t_anti / t_bloom, 2),
                "bloom_hits": n_hits,
                "bloom_fp_rate_est": round(bf.fp_rate(), 6),
                "rows_identical": a_rows == b_rows,
                "rows_kept": a_rows,
                "probe_pre": probe_pre,
                "probe_post": probe_post,
            }
        )
    )
    shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000,
        float(sys.argv[3]) if len(sys.argv) > 3 else 0.01,
    )
