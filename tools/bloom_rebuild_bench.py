"""Sequential vs shard-parallel Bloom-sidecar REBUILD A/B.

The rebuild path (autogrow past 5% fp, canary mismatch, pre-bloom
index) re-reads EVERY hash-index shard and re-sets ~k bits per hash —
the one bloom-maintenance stretch that used to run in a single driver
process (`np.bitwise_or.at` is a single-threaded scatter: ~10^9
position writes per 10^8 hashes at k=7, minutes of one-core grind
while the rest of the node idles).

A (sequential): the pre-r5 shape — driver loop, one add_array per
    index shard into one sidecar object.
B (parallel):   pipelines/export.rebuild_bloom_sidecar_parallel —
    one hash-route task per index shard (column-pruned read, hash64
    once, split by bloom-shard prefix), one OR task per bloom shard;
    flat regime builds grouped full-size partials + driver word-OR.

Both paths must produce BIT-IDENTICAL sidecars (same hash64 ring) —
asserted, not assumed. Reported: both walls, speedup, index size.

Usage: python tools/bloom_rebuild_bench.py [n_hashes] [n_index_shards] [m_bits_log2]
       defaults: 2e8 hashes, 32 shards, 2^31 bits (flat regime);
       pass m_bits_log2 > 33 to exercise the sharded regime.
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
    n_hashes: int = 200_000_000,
    n_index_shards: int = 32,
    m_log2: int = 31,
):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    from bench import contention_probe
    from sod_ray.pipelines import export as ex

    probe_pre = contention_probe()
    idx_dir = "/tmp/bloom_rebuild_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    os.makedirs(idx_dir, exist_ok=True)
    per_shard_rows = n_hashes // n_index_shards

    @ray.remote
    def write_shard(s: int) -> str:
        # decimal-string ids stand in for md5 hex — the rebuild only
        # sees an opaque string column
        ids = np.arange(
            s * per_shard_rows, (s + 1) * per_shard_rows, dtype=np.int64
        )
        h = pc.cast(pa.array(ids), pa.string())
        p = os.path.join(idx_dir, f"i{s:04d}.parquet")
        pq.write_table(pa.table({"h": h}), p)
        return p

    t0 = time.perf_counter()
    paths = sorted(ray.get([write_shard.remote(s) for s in range(n_index_shards)]))
    t_gen = time.perf_counter() - t0

    bits = 1 << m_log2

    # --- A: sequential driver loop (the pre-r5 rebuild shape) ---
    t0 = time.perf_counter()
    seq = ex.new_bloom_sidecar(bits)
    for p in paths:
        seq.add_array(pq.read_table(p, columns=["h"])["h"])
    t_seq = time.perf_counter() - t0

    # --- B: shard-parallel rebuild ---
    t0 = time.perf_counter()
    par = ex.rebuild_bloom_sidecar_parallel(paths, bits)
    t_par = time.perf_counter() - t0

    identical = par.to_bytes() == seq.to_bytes()
    probe_post = contention_probe()
    print(
        json.dumps(
            {
                "n_hashes": n_hashes,
                "n_index_shards": n_index_shards,
                "m_bits": bits,
                "bloom_shards": par.n_shards,
                "gen_s": round(t_gen, 1),
                "seq_rebuild_s": round(t_seq, 1),
                "par_rebuild_s": round(t_par, 1),
                "speedup": round(t_seq / max(t_par, 1e-9), 2),
                "bit_identical": identical,
                "fp_rate": round(par.fp_rate(), 6),
                "probe_pre": probe_pre,
                "probe_post": probe_post,
            }
        )
    )
    assert identical, "parallel rebuild diverged from sequential!"
    shutil.rmtree(idx_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(float(sys.argv[1])) if len(sys.argv) > 1 else 200_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
        int(sys.argv[3]) if len(sys.argv) > 3 else 31,
    )
