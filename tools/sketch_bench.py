"""Scale bench for the KLL and Misra-Gries sketches (r4 additions).

Two measurements, each with an IN-BAND truth check at full scale:

1. KLL: N lognormal float64 values synthesized deterministically per
   block (seeded by block id — no Date/now anywhere), folded by the
   partial+final ``kll_column_quantiles`` shape (global key). Truth:
   one extra vectorized count pass computes the EXACT rank of each
   estimated quantile; the run fails if any rank misses its target by
   more than the 3% checked band (observed ~0.2% at k=200).

2. Misra-Gries: whitespace tokens of the dedup bench corpus
   (/tmp/sod_dedup/corpus-<n>) — ~80 tokens/doc over a 50k vocab,
   zipf-free (uniform) so we ALSO plant a known heavy hitter by
   counting an existing common token exactly. Truth: the exact
   (token, n) groupby top-10 (the `top50_tokens` machinery); the MG
   summary must hold every top-10 token inside its deterministic
   est <= true <= est + err_ub band.

Usage: python tools/sketch_bench.py [kll_n] [mg_docs]
Defaults: 200_000_000 values, 10_000_000 docs (gen'd if absent).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_kll(n: int) -> dict:
    import ray.data as rd

    from sod_ray.stages.stats import kll_column_quantiles

    n_blocks = 512
    per = n // n_blocks

    def gen(batch: pa.Table) -> pa.Table:
        bid = int(batch["id"][0].as_py())
        rng = np.random.default_rng(1_000_003 * bid + 7)
        return pa.table({"v": rng.lognormal(3.0, 2.0, size=per)})

    base = rd.range(n_blocks).repartition(n_blocks)
    qs = (0.25, 0.5, 0.9, 0.99)
    t0 = time.perf_counter()
    out = (
        kll_column_quantiles(
            base.map_batches(gen, batch_format="pyarrow"), "v", qs=qs
        )
        .to_pandas()
        .iloc[0]
    )
    kll_s = time.perf_counter() - t0
    ests = [float(out[f"q_{int(round(q * 100)):02d}"]) for q in qs]
    assert int(out["n"]) == per * n_blocks

    # exact rank of each estimate: one vectorized count pass
    thresholds = np.asarray(ests)

    def count_le(batch: pa.Table) -> pa.Table:
        bid = int(batch["id"][0].as_py())
        rng = np.random.default_rng(1_000_003 * bid + 7)
        v = rng.lognormal(3.0, 2.0, size=per)
        le = np.array([(v <= t).sum() for t in thresholds], dtype=np.int64)
        return pa.table({"qi": np.arange(len(qs)), "le": le})

    import ray.data.aggregate as agg

    counts = (
        base.map_batches(count_le, batch_format="pyarrow")
        .groupby("qi")
        .aggregate(agg.Sum("le", alias_name="le"))
        .to_pandas()
        .sort_values("qi")
    )
    ranks = counts["le"].to_numpy() / (per * n_blocks)
    errs = np.abs(ranks - np.asarray(qs))
    return {
        "kll_n": per * n_blocks,
        "kll_sec": round(kll_s, 1),
        "kll_vals_per_sec": round(per * n_blocks / kll_s, 1),
        "kll_rank_errors": [round(float(e), 5) for e in errs],
        "kll_in_band": bool(np.all(errs <= 0.03)),
    }


DOC_TOKENS = 80
VOCAB = 50_000
TRACK = 1000  # gen-time exact counts for token ids 1..TRACK


def _gen_zipf_corpus(out_dir: str, n_docs: int, n_shards: int = 32):
    """Deterministic zipf(1.3) token corpus; returns the EXACT counts
    of token ids 1..TRACK (summed gen-time bincounts — ground truth at
    any scale with no groupby; id ranks are zipf so the true top-10 is
    inside the tracked set by a >13% per-rank margin)."""
    import ray

    @ray.remote(num_cpus=1)
    def gen_shard(s: int, per: int):
        import pyarrow.parquet as pq

        rng = np.random.default_rng(700_001 * s + 13)
        ids = rng.zipf(1.3, size=per * DOC_TOKENS) % VOCAB
        counts = np.bincount(ids[ids <= TRACK], minlength=TRACK + 1)
        toks = np.char.add("w", ids.astype("U6")).reshape(per, DOC_TOKENS)
        texts = [" ".join(row) for row in toks]
        pq.write_table(
            pa.table({"text": pa.array(texts, pa.string())}),
            f"{out_dir}/shard={s:05d}.parquet",
        )
        return counts

    os.makedirs(out_dir, exist_ok=True)
    per = n_docs // n_shards
    parts = ray.get([gen_shard.remote(s, per) for s in range(n_shards)])
    np.save(f"{out_dir}/../track_counts.npy", np.sum(parts, axis=0))


def bench_mg(n_docs: int) -> dict:
    import ray.data as rd

    from sod_ray.stages.stats import heavy_hitters

    d = f"/tmp/sod_sketch/zipf-{n_docs}/docs"
    t_gen = time.perf_counter()
    if not os.path.exists(f"{d}/shard=00031.parquet"):
        _gen_zipf_corpus(d, n_docs)
    gen_s = time.perf_counter() - t_gen
    track = np.load(f"{d}/../track_counts.npy")

    ds = rd.read_parquet(d, columns=["text"])
    t0 = time.perf_counter()
    mg = heavy_hitters(ds, "text", tokenize=True, m=2048)
    mg_s = time.perf_counter() - t0

    # exact top-10 from the gen-time tracked counts (ids 1..TRACK)
    order = np.argsort(-track[1:], kind="stable") + 1
    top_ids = order[:10]
    in_band = all(
        mg.estimate(f"w{i}") <= int(track[i])
        <= mg.estimate(f"w{i}") + mg.err_ub
        for i in top_ids
    )
    top_match = [f"w{i}" for i in top_ids[:5]] == [k for k, _ in mg.top(5)]
    return {
        "mg_docs": n_docs,
        "mg_tokens": int(mg.n),
        "mg_sec": round(mg_s, 1),
        "mg_tokens_per_sec": round(mg.n / mg_s, 1),
        "mg_err_ub": int(mg.err_ub),
        "mg_bound_n_over_m": int(mg.n // (2048 + 1)),
        "mg_top10_in_band": bool(in_band),
        "mg_top5_order_exact": bool(top_match),
        "mg_gen_sec": round(gen_s, 1),
    }


def main(kll_n: int, mg_docs: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from bench import contention_probe

    probe_pre = contention_probe()
    out = {}
    out.update(bench_kll(kll_n))
    out.update(bench_mg(mg_docs))
    out["probe_pre"] = probe_pre
    out["probe_post"] = contention_probe()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000,
    )
