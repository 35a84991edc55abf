"""Parallel synthetic web-table generator for large robustness runs.

`sources.webpages.write_webpages` is serial and (with refs) holds every
shard in driver memory — fine at bench scale, not at 40M rows. This tool
fans `synth_shard` out as Ray tasks (one per shard, each writes its own
parquet file) and ships only the url column back for the refs table.

Usage: python tools/gen_web.py OUT_DIR N_ROWS [N_SHARDS] [MEAN_TOKENS] [CODEC]

CODEC defaults to zstd (level 3): the shards are web TEXT, which zstd
packs ~1.6x tighter than snappy (measured 96.7 vs 154.4 MB on a 500k
shard) — at 300M rows that is the difference between fitting this
host's disk (≈56 GB input) and ENOSPC at ~88 GB. Reads stay
vectorized; the flagship is disk-bandwidth-bound, so the smaller
input also reads FASTER.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import ray


def main(out_dir: str, n_rows: int, n_shards: int = 128, mean_tokens: int = 40, codec: str = "zstd"):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    @ray.remote(num_cpus=1)
    def gen_shard(s: int, per: int, seed: int, mt: int):
        import pyarrow.parquet as pq

        from sod_ray.sources.webpages import synth_shard

        t, truth = synth_shard(per, shard=s, seed=seed, mean_tokens=mt)
        pq.write_table(
            t,
            f"{out_dir}/webpages/shard={s:05d}.parquet",
            compression=codec,
            compression_level=3 if codec == "zstd" else None,
        )
        return truth, t["url"].combine_chunks()

    os.makedirs(f"{out_dir}/webpages", exist_ok=True)
    per = n_rows // n_shards
    t0 = time.perf_counter()
    out = ray.get([gen_shard.remote(s, per, 42, mean_tokens) for s in range(n_shards)])
    truths = [o[0] for o in out]
    # chunked, NOT concat_arrays: >2 GiB of url bytes overflows a single
    # string array's int32 offsets (hit at 80M rows)
    urls = pa.table({"url": pa.chunked_array([o[1] for o in out])})
    combined = {"shards": truths, "n_rows": per * n_shards, "seed": 42}

    import pyarrow.parquet as pq

    from sod_ray.sources.webpages import synth_refs

    refs, rt = synth_refs(urls, n_refs=max(100, n_rows // 10), seed=43)
    os.makedirs(f"{out_dir}/webpage_refs", exist_ok=True)
    pq.write_table(
        refs, f"{out_dir}/webpage_refs/part-0.parquet",
        compression=codec,
        compression_level=3 if codec == "zstd" else None,
    )
    combined["refs"] = rt
    with open(f"{out_dir}/truth.json", "w") as f:
        json.dump(combined, f)
    print(f"generated {per * n_shards} rows / {n_shards} shards "
          f"in {time.perf_counter() - t0:.1f}s -> {out_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]) if len(sys.argv) > 3 else 128,
        int(sys.argv[4]) if len(sys.argv) > 4 else 40,
        sys.argv[5] if len(sys.argv) > 5 else "zstd",
    )
