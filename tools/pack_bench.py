"""Sequence-packing (`stages/budget.pack_chunks`) scale bench.

Synthesizes a slim (doc_id, lang, n_tokens) table IN MEMORY (rd.range →
map_batches, nothing lands on disk — packing consumes exactly these
three columns at any scale), runs the closed-form distributed prefix
sum, and verifies:

- output row count == input row count (every doc got a span);
- per key, max(chunk_end) over the OUTPUT == (T_k - 1) // chunk_tokens
  where T_k is that key's exact token total from an INDEPENDENT
  aggregation over a re-synthesized input (the closed form — a wrong
  carry/offset anywhere shifts every downstream chunk index);
- per-batch local invariants: 0 <= chunk_offset < chunk_tokens,
  chunk_start <= chunk_end.

Row-level exactness is pinned separately by the `docs_pack_chunks`
SQL oracle (integer window-cumsum twin) at gate scale.

Usage: python tools/pack_bench.py [n_docs] [chunk_tokens]
       defaults: 100M docs, 2048-token chunks (~20B tokens at the
       synthetic 150-350 token mix; 400M ≈ 80B tokens)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "ja", "other"])


def main(n_docs: int = 100_000_000, chunk_tokens: int = 2048):
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    rd.DataContext.get_current().enable_progress_bars = False
    from bench import contention_probe
    from sod_ray.stages.budget import pack_chunks
    from sod_ray.state.sketches import _splitmix64

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(ids)
        lang = LANGS[(h & np.uint64(7)).astype(np.int64)]
        toks = 50 + ((h >> np.uint64(3)) % np.uint64(301)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids.view(np.int64)),
                "lang": pa.array(lang),
                "n_tokens": pa.array(toks),
            }
        )

    n_blocks = max(64, n_docs // 200_000)
    probe_pre = contention_probe()

    t0 = time.perf_counter()
    sl = rd.range(n_docs, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow"
    )
    out = pack_chunks(sl, chunk_tokens)

    # single consuming pass: count rows, fold per-key max(chunk_end),
    # check local invariants
    key_max: dict = {}
    rows_out = 0
    bad_local = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        rows_out += b.num_rows
        off = b["chunk_offset"].to_numpy(zero_copy_only=False)
        cs = b["chunk_start"].to_numpy(zero_copy_only=False)
        ce = b["chunk_end"].to_numpy(zero_copy_only=False)
        bad_local += int(
            ((off < 0) | (off >= chunk_tokens) | (cs > ce)).sum()
        )
        ks = b["lang"].to_numpy(zero_copy_only=False)
        es = b["chunk_end"].to_numpy(zero_copy_only=False)
        order = np.argsort(ks, kind="stable")
        ks_s, es_s = ks[order], es[order]
        bnd = np.flatnonzero(
            np.concatenate([[True], ks_s[1:] != ks_s[:-1]])
        )
        for i, s in enumerate(bnd):
            e = bnd[i + 1] if i + 1 < bnd.shape[0] else ks_s.shape[0]
            k = ks_s[s]
            m = int(es_s[s:e].max())
            if m > key_max.get(k, -1):
                key_max[k] = m
    wall = time.perf_counter() - t0

    # independent exact token totals from a re-synthesized input
    t0 = time.perf_counter()
    totals: dict = {}
    tot_ds = rd.range(n_docs, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table(
            {
                "lang": pa.array(
                    np.unique(t["lang"].to_numpy(zero_copy_only=False))
                ),
                "tot": pa.array(
                    [
                        int(
                            t["n_tokens"]
                            .to_numpy(zero_copy_only=False)[
                                t["lang"].to_numpy(zero_copy_only=False)
                                == k
                            ]
                            .sum()
                        )
                        for k in np.unique(
                            t["lang"].to_numpy(zero_copy_only=False)
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    for b in tot_ds.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b["lang"].to_pylist(), b["tot"].to_pylist()):
            totals[k] = totals.get(k, 0) + v
    verify_s = time.perf_counter() - t0

    want_max = {
        k: (t - 1) // chunk_tokens for k, t in totals.items() if t > 0
    }
    exact = (
        rows_out == n_docs
        and bad_local == 0
        and {str(k): v for k, v in key_max.items()}
        == {str(k): v for k, v in want_max.items()}
    )
    probe_post = contention_probe()
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "chunk_tokens": chunk_tokens,
                "total_tokens": int(sum(totals.values())),
                "rows_out": rows_out,
                "bad_local_invariants": bad_local,
                "final_chunk_index_exact": bool(exact),
                "pack_wall_s": round(wall, 1),
                "verify_wall_s": round(verify_s, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "probe_pre": probe_pre,
                "probe_post": probe_post,
            }
        )
    )
    ray.shutdown()
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(
        main(
            int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000,
            int(sys.argv[2]) if len(sys.argv) > 2 else 2048,
        )
    )
