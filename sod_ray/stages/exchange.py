"""Generic raw-task hash exchange for key-count ≈ row-count reductions.

Ray Data's ``groupby(...).map_groups(fn)`` pays one Python call per
group; when the number of groups approaches the number of rows (exact
dedup winners, line dedup, per-doc top-k), that is a Python call per
row of output — the dominant cost at corpus scale. The repo's measured
alternative (``tools/shuffle_backend_bench.py``: 47× vs the best
Dataset shuffle backend on 16M singleton-heavy keys) is a raw-task
hash-bucket exchange: every block splits its rows into P buckets by
``key % P``, one reduce task per bucket concatenates its pieces and
runs ONE vectorized callable over the whole bucket.

This module is the generic form of that pattern (the same shape as the
hand-rolled exchanges in ``stages/cc.py`` and
``stages/dedup._prune_singleton_buckets``).

Partitioning assumption (document per use): all rows of one bucket are
concatenated in a single reduce task, so the largest bucket must fit in
one worker's heap. Keys are hashed 64-bit values, so buckets are
uniform in *key* count; a single hot key still lands in one bucket —
callers with hot-key risk must pre-salt or pre-combine. Size
``num_buckets`` so total_bytes / P fits comfortably (default:
max(8, cluster CPUs))."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from .blocks import arrow_block_refs


def _default_buckets() -> int:
    try:
        if ray.is_initialized():
            return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 8


def broadcast_rows_budget(
    bytes_per_row: int = 16,
    fraction: float = 0.002,
    floor: int = 1_000_000,
    ceiling: int = 200_000_000,
) -> int:
    """Default row limit for one-``ray.put`` broadcast small sides,
    derived from the SMALLEST node's object-store size: every node
    materializes one copy of a broadcast, so the budget is a small
    fraction of the per-node store, not of the cluster total. With the
    defaults a 37.6 GiB store (this dev VM) yields ~5M 16-byte rows —
    the empirically tuned r2/r3 threshold — and the same code scales
    the knob up on fat cluster nodes and down under a capped store
    (where broadcasts compete with shuffles for spill budget). Callers
    with 8-byte payloads pass ``bytes_per_row=8`` (and the MinHash
    endpoint filters use ``fraction=0.004``, the tuned 20M-row point).
    """
    store = None
    try:
        if ray.is_initialized():
            sizes = [
                n["Resources"]["object_store_memory"]
                for n in ray.nodes()
                if n.get("Alive")
                and n.get("Resources", {}).get("object_store_memory")
            ]
            if sizes:
                store = min(sizes)
    except Exception:
        pass
    if store is None:
        store = 4 << 30  # no cluster yet: a conservative 4 GiB
    return int(min(ceiling, max(floor, fraction * store / bytes_per_row)))


@ray.remote
def _split_block(t: pa.Table, key_col: str, P: int):
    """One block → P row-slices by key % P (one sort, P zero-copy slices)."""
    if t.num_rows == 0 or key_col not in t.column_names:
        # Ray passes empty blocks through map_batches with an empty
        # schema — they carry no rows, route nothing
        e = t.slice(0, 0)
        return tuple(e for _ in range(P))
    k = t[key_col].to_numpy(zero_copy_only=False)
    b = (k.astype(np.int64, copy=False) % P + P) % P
    order = np.argsort(b, kind="stable")
    st = t.take(pa.array(order))
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(P + 1))
    return tuple(
        st.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
        for p in range(P)
    )


@ray.remote
def _reduce_bucket(fn, *pieces):
    parts = [p for p in pieces if p.num_rows]
    if parts:
        t = pa.concat_tables(parts).combine_chunks()
    else:
        # all-empty bucket: hand fn the widest available schema (empty
        # passthrough blocks have zero columns)
        t = max(pieces, key=lambda p: p.num_columns)
    return fn(t)


def exchange_reduce(ds, key_col: str, fn, num_buckets: int | None = None):
    """Hash-exchange ``ds`` by integer column ``key_col`` into P buckets
    and apply ``fn(bucket_table) -> pa.Table`` once per bucket.

    ``fn`` must be a pure vectorized callable (it sees EVERY row of its
    bucket in one Arrow table, including a possible 0-row table) and
    all rows sharing a key value land in the same bucket — so any
    per-key reduction computed inside ``fn`` is globally correct.
    String keys: add a ``hash64`` column first. Returns a Dataset built
    from the P reduce outputs.

    Fan-out sizes itself to the data when ``num_buckets`` is None: the
    cluster-CPU default, capped at one bucket per ~64k input rows (the
    row count comes free from the RefBundle metadata) — a 2k-row input
    runs ONE reduce task instead of paying 32 tasks of fixed overhead,
    while anything big enough to care still gets the full fan-out."""
    from .blocks import arrow_block_refs_with_rows

    refs, total_rows = arrow_block_refs_with_rows(ds)
    P = num_buckets or _default_buckets()
    if num_buckets is None and total_rows is not None:
        P = max(1, min(P, -(-total_rows // 65536)))
    if not refs:
        # zero executed blocks: materialize fn's typed empty output so
        # downstream consumers still see the reduce schema (a bare
        # map_batches over no blocks yields a schema-less Dataset)
        import ray.data as rd

        return rd.from_arrow(fn(pa.table({})))
    if P == 1:
        # one bucket == all rows: no split stage at all, one reduce
        # over the blocks themselves
        outs = [_reduce_bucket.remote(fn, *refs)]
    else:
        splits = [
            _split_block.options(num_returns=P).remote(r, key_col, P)
            for r in refs
        ]
        outs = [
            _reduce_bucket.remote(fn, *[s[p] for s in splits])
            for p in range(P)
        ]
    import ray.data as rd

    return rd.from_arrow_refs(outs)


def exchange_reduce_spill(
    ds,
    key_col: str,
    fn,
    spill_dir: str,
    num_buckets: int | None = None,
    reduce_num_cpus: float = 2,
    after_land=None,
    phases: int = 1,
):
    """Disk-backed :func:`exchange_reduce` for inputs comparable to (or
    larger than) the object store — e.g. 10^8 embedding rows, where the
    in-plasma exchange holds input blocks + sorted splits (~2× the
    data) and ENOSPCs the raylet spill on a disk-tight host.

    Shape: ONE streaming pass lands the rows as PARTITIONED parquet
    (``partition_cols=[__bkt]``, bucket = key % P) under a capped
    landing budget (the r4 ``sig_spill_dir`` backpressure pattern —
    25% of the smallest node's store), then one reduce task per bucket
    reads exactly its bucket's files straight from disk and runs
    ``fn`` over the concatenated bucket. Plasma never holds the
    shuffle; peak disk = input + one landed copy. This is also the
    10^12-row shape: at that scale every all-to-all goes through
    disk/DFS anyway, and the landed form is resumable.

    Same contract as ``exchange_reduce``: integer ``key_col``, all rows
    of a key in one bucket, ``fn`` vectorized per bucket. Size
    ``num_buckets`` so one bucket (~rows/P) fits a worker's heap.

    ``after_land``: optional callable invoked once the LAST landing
    write has fully committed (before its reduces run). The landing is
    the final read of ``ds``, so a caller on a disk-tight single
    volume can free the input here. On a real cluster the landed copy
    lives on DFS and this hook is a no-op.

    ``phases``: split-phase execution for volumes that cannot hold
    input + one full landed copy. Phase p lands ONLY buckets with
    ``bucket % phases == p`` (one extra streaming read of ``ds`` per
    phase), reduces them, then deletes that phase's landed files
    before the next phase starts — peak disk = input + landed/phases.
    Results are identical for any ``phases``: bucket membership is a
    pure function of the key, so each phase is a disjoint, complete
    set of buckets.
    """
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from ray.data._internal.execution.interfaces.execution_options import (
        ExecutionResources,
    )

    P = num_buckets or _default_buckets()
    phases = max(1, int(phases))
    store = None
    try:
        if ray.is_initialized():
            sizes = [
                n["Resources"]["object_store_memory"]
                for n in ray.nodes()
                if n.get("Alive")
                and n.get("Resources", {}).get("object_store_memory")
            ]
            if sizes:
                store = min(sizes)
    except Exception:
        pass

    @ray.remote(num_cpus=reduce_num_cpus)
    def reduce_dir(path: str):
        t = pq.read_table(path)
        if "__bkt" in t.column_names:
            t = t.drop_columns(["__bkt"])
        return fn(t.combine_chunks())

    all_outs = []
    for ph in range(phases):
        sub = os.path.join(spill_dir, f"_sod_exchange_p{ph}")
        shutil.rmtree(sub, ignore_errors=True)
        os.makedirs(sub, exist_ok=True)

        def add_bkt(t: pa.Table, _ph=ph) -> pa.Table:
            if t.num_rows == 0 or key_col not in t.column_names:
                return t
            k = t[key_col].to_numpy(zero_copy_only=False)
            b = (k.astype(np.int64, copy=False) % P + P) % P
            if phases > 1:
                m = (b % phases) == _ph
                t = t.filter(pa.array(m))
                b = b[m]
            return t.append_column("__bkt", pa.array(b, pa.int64()))

        routed = ds.map_batches(add_bkt, batch_format="pyarrow")
        opts = getattr(
            routed, "context", rd.DataContext.get_current()
        ).execution_options
        prev = opts.resource_limits
        try:
            if store:
                opts.resource_limits = ExecutionResources(
                    object_store_memory=int(store * 0.25)
                )
            routed.write_parquet(sub, partition_cols=["__bkt"])
        finally:
            opts.resource_limits = prev
        if after_land is not None and ph == phases - 1:
            after_land()  # last read of ds is done

        bucket_dirs = sorted(
            os.path.join(sub, d)
            for d in os.listdir(sub)
            if d.startswith("__bkt=")
        )
        outs = [reduce_dir.remote(p) for p in bucket_dirs]
        if outs and phases > 1:
            # the landed files must outlive their reduces; block, then
            # free this phase's landing before the next phase writes
            ray.wait(outs, num_returns=len(outs), fetch_local=False)
            shutil.rmtree(sub, ignore_errors=True)
        all_outs.extend(outs)
    if not all_outs:
        return rd.from_arrow(fn(pa.table({})))
    return rd.from_arrow_refs(all_outs)
