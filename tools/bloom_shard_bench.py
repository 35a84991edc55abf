"""Sharded vs flat Bloom A/B at the ≥10^9-hash sidecar tier.

The flat BloomFilter is the right shape below ~10^9 hashes (one
object, one ray.put). Past that the bitset itself becomes the
artifact that has to move: at 1.2e9 hashes / 2^34 bits it is a 2 GB
object — every build partial is 2 GB, every merge reads 4 GB, every
node's probe tasks pull 2 GB, and the sidecar save rewrites 2 GB per
maintenance batch. ShardedBloom (hash-prefix shards, sketches.py)
keeps the TOTAL bits identical but bounds every unit of work at one
shard (2^30 bits = 128 MB here):

  A (flat):    per-chunk partial bitsets -> sequential OR-merge on
               one worker (the associative-reduce shape with a 2 GB
               accumulator); probes broadcast the whole bitset.
  B (sharded): per-chunk partials return ONE OBJECT PER SHARD; 16
               per-shard merge tasks OR their 128 MB slices in
               parallel; probes hash-partition the batch by the SAME
               prefix and each probe task holds exactly one shard.

Flat and sharded place bits on DIFFERENT rings (mod 2^34 vs per-shard
mod 2^30), so their false-positive sets differ; what they share is the
contract that matters — NO false negatives, fp rate in band. The A/B
asserts both paths hit every planted member and reports each path's
measured fp rate next to build/merge/probe walls and per-task resident
bytes.

At 10^10 hashes (12 GB bitset) path A stops being runnable at all on
a 16 GB-heap worker; path B is 100 shard files of 128 MB — the shape
run_export_incremental's sidecar auto-selects past 2^33 bits
(pipelines/export.new_bloom_sidecar).

Usage: python tools/bloom_shard_bench.py [n_hashes] [m_bits_log2] [n_shards]
       defaults: 1.2e9 hashes, 2^34 bits, 16 shards
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_hashes: int = 1_200_000_000, m_log2: int = 34, n_shards: int = 16):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    from bench import contention_probe
    from sod_ray.state.sketches import BloomFilter, ShardedBloom, _splitmix64

    m_bits = 1 << m_log2
    per_shard = m_bits // n_shards
    chunk = 100_000_000
    n_chunks = (n_hashes + chunk - 1) // chunk
    probe_pre = contention_probe()

    def chunk_hashes(c: int) -> np.ndarray:
        ids = np.arange(
            c * chunk, min((c + 1) * chunk, n_hashes), dtype=np.uint64
        )
        return _splitmix64(ids)  # the numeric hash64 path, vectorized

    # --- A: flat build (per-chunk full-size partials, sequential OR) ---
    sub = 10_000_000  # bound the k×n position matrix at ~560 MB

    @ray.remote(num_cpus=4)
    def flat_partial(c: int) -> bytes:
        bf = BloomFilter(m_bits, 7)
        h = chunk_hashes(c)
        for i in range(0, len(h), sub):
            bf.add_hashes(h[i : i + sub])
        return bf.words.tobytes()

    t0 = time.perf_counter()
    refs = [flat_partial.remote(c) for c in range(n_chunks)]
    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    while refs:
        done, refs = ray.wait(refs, num_returns=1)
        part = np.frombuffer(ray.get(done[0]), dtype=np.uint64)
        np.bitwise_or(acc, part, out=acc)
        del part
    flat = BloomFilter(m_bits, 7)
    flat.words = acc
    t_flat_build = time.perf_counter() - t0

    # --- B: sharded build (per-chunk partials return one blob PER
    # SHARD; per-shard merge tasks OR their slices in parallel) ---
    @ray.remote(num_cpus=4)
    def shard_partial(c: int) -> list:
        sb = ShardedBloom(n_shards, per_shard, 7)
        h = chunk_hashes(c)
        for i in range(0, len(h), sub):
            sb.add_hashes(h[i : i + sub])
        return [ray.put(s.words.tobytes()) for s in sb.shards]

    @ray.remote(num_cpus=1)
    def merge_shard(blobs: list) -> bytes:
        out = np.zeros(per_shard // 64, dtype=np.uint64)
        for b in blobs:
            np.bitwise_or(
                out, np.frombuffer(ray.get(b), dtype=np.uint64), out=out
            )
        return out.tobytes()

    t0 = time.perf_counter()
    chunk_refs = ray.get(
        [shard_partial.remote(c) for c in range(n_chunks)]
    )  # n_chunks lists of n_shards small ObjectRefs
    merged = ray.get(
        [
            merge_shard.remote([cr[s] for cr in chunk_refs])
            for s in range(n_shards)
        ]
    )
    sharded = ShardedBloom(n_shards, per_shard, 7)
    for s, b in enumerate(merged):
        sharded.shards[s].words = np.frombuffer(b, dtype=np.uint64).copy()
    del chunk_refs, merged
    t_shard_build = time.perf_counter() - t0

    # --- probe batch: 20M hashes, 10% members ---
    n_probe = 20_000_000
    rng = np.random.default_rng(5)
    member = rng.random(n_probe) < 0.10
    ids = np.where(
        member,
        rng.integers(0, n_hashes, n_probe),
        rng.integers(n_hashes, 2 * n_hashes, n_probe),
    ).astype(np.uint64)
    probe_h = _splitmix64(ids)

    # A: broadcast the whole bitset; tasks probe slices
    flat_ref = ray.put(flat)

    @ray.remote(num_cpus=1)
    def probe_flat(h: np.ndarray) -> np.ndarray:
        return ray.get(flat_ref).contains_hashes(h)

    t0 = time.perf_counter()
    slices = np.array_split(probe_h, 32)
    a_hits = np.concatenate(ray.get([probe_flat.remote(s) for s in slices]))
    t_flat_probe = time.perf_counter() - t0

    # B: route by the SAME prefix; each task holds exactly one shard
    shard_refs = [ray.put(s.words.tobytes()) for s in sharded.shards]

    @ray.remote(num_cpus=1)
    def probe_shard(blob: bytes, h: np.ndarray) -> np.ndarray:
        # blob arrives auto-dereferenced (top-level ObjectRef arg) —
        # a zero-copy view of the one shard this task needs
        bf = BloomFilter(per_shard, 7)
        bf.words = np.frombuffer(blob, dtype=np.uint64)
        return bf.contains_hashes(h)

    t0 = time.perf_counter()
    sid = sharded.route(probe_h)
    order = np.argsort(sid, kind="stable")
    hs = probe_h[order]
    bounds = np.searchsorted(sid[order], np.arange(n_shards + 1))
    parts = ray.get(
        [
            probe_shard.remote(shard_refs[s], hs[bounds[s] : bounds[s + 1]])
            for s in range(n_shards)
            if bounds[s + 1] > bounds[s]
        ]
    )
    b_hits = np.empty(n_probe, dtype=bool)
    b_hits[order] = np.concatenate(parts)
    t_shard_probe = time.perf_counter() - t0

    assert a_hits[member].all(), "flat path: false negative on a member!"
    assert b_hits[member].all(), "sharded path: false negative on a member!"
    fp_flat = float(a_hits[~member].mean())
    fp_shard = float(b_hits[~member].mean())
    probe_post = contention_probe()

    print(
        json.dumps(
            {
                "n_hashes": n_hashes,
                "m_bits": m_bits,
                "n_shards": n_shards,
                "flat_build_s": round(t_flat_build, 1),
                "sharded_build_s": round(t_shard_build, 1),
                "flat_probe_s": round(t_flat_probe, 2),
                "sharded_probe_s": round(t_shard_probe, 2),
                "false_negatives": 0,
                "fp_rate_flat": round(fp_flat, 6),
                "fp_rate_sharded": round(fp_shard, 6),
                "fp_rate_est": round(sharded.fp_rate(), 6),
                "flat_bytes_per_probe_task": m_bits // 8,
                "sharded_bytes_per_probe_task": per_shard // 8,
                "flat_bytes_per_merge": m_bits // 4,
                "sharded_bytes_per_merge": per_shard // 4,
                "probe_pre": probe_pre,
                "probe_post": probe_post,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_200_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 34,
        int(sys.argv[3]) if len(sys.argv) > 3 else 16,
    )
