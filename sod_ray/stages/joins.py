"""Temporal / range join operators the Dataset API lacks, composed
from Ray Data primitives (the brief's custom-operator tier: as-of
join, range join — the reference has no relational joins at all, see
SURVEY.md §2.5 G6, so these extend the engine's join surface for
training-data pipelines).

Partitioning assumptions (documented per the brief):

- ``asof_join``: both sides are hash-partitioned by ``by`` via one
  ``groupby`` shuffle over a TAGGED UNION of the two inputs (one
  shuffle, not two); one key's rows from both sides must fit in one
  worker — same per-entity contract as the reference's window store
  (/root/reference/internal/dispatcher/manager.go:222-235). For a
  skewed ``by`` key, pre-salt by a coarse time bucket (each salt
  bucket needs only the previous bucket's last right-row, so the
  salted variant stays exact — not implemented until a fixture needs
  it).
- ``range_join_broadcast``: the ranges side is SMALL (≤ ~10^5 rows)
  and is shipped once via ``ray.put``; each batch task probes it
  vectorized. Overlapping ranges produce one output row per match
  (SQL inequality-join semantics).
- ``bucketed_equi_join``: both sides may be LARGE; each side's blocks
  split into B hash buckets that flow worker-to-worker (never the
  driver); one bucket's rows from BOTH sides must fit in one worker —
  a single hot key needs a pre-salt (asof_join_salted pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from .blocks import arrow_block_refs


def asof_join(
    left,
    right,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
    allow_exact_matches: bool = True,
):
    """As-of join: for each left row, the single right row with the
    largest ``on`` ≤ left's ``on`` (direction="backward"; "forward" =
    smallest ≥), matching on ``by``. LEFT-join semantics: unmatched
    left rows keep nulls in the right columns.

    Implementation: tag each side, align schemas (missing columns are
    null), union → ONE ``groupby(by)`` shuffle → per-group
    ``pd.merge_asof`` over the ts-sorted sides. The tagged-union trick
    makes the co-group a single Dataset groupby instead of a two-sided
    join the API doesn't have.

    Returns a Dataset with the left columns plus ``right_cols``
    (renamed with ``suffix`` when they collide with left names).
    """
    left_schema = left.schema()
    left_names = list(left_schema.names)
    right_keep = [by, on] + [c for c in right_cols if c not in (by, on)]
    right_slim = right.select_columns(right_keep)
    right_schema = right_slim.schema()

    out_names = {
        c: (c + suffix if c in left_names else c)
        for c in right_cols
        if c not in (by,)
    }
    rtypes = {
        n: t for n, t in zip(right_schema.names, right_schema.types)
    }
    ltypes = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_names}
        for c in right_cols:
            if c == by:
                continue
            cols["__r_" + c] = pa.nulls(len(t), rtypes[c])
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in left_names:
            if c == by:
                cols[c] = t[by]
            elif c == on:
                cols[c] = t[on]
            else:
                cols[c] = pa.nulls(len(t), ltypes[c])
        for c in right_cols:
            if c == by:
                continue
            cols["__r_" + c] = t[c]
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right_slim.map_batches(tag_right, batch_format="pyarrow")
    )

    final_cols = left_names + list(out_names.values())
    int_left = [
        n
        for n, t in zip(left_schema.names, left_schema.types)
        if pa.types.is_integer(t)
    ]

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 1]
        rg = g[g["__side"] == 0]
        lg = lg[left_names].sort_values(on, kind="stable")
        for c in int_left:
            # the null-padded union floats left int columns; left rows
            # themselves are never null there — restore the dtype
            lg[c] = lg[c].astype("int64")
        r_proj = [on] + ["__r_" + c for c in right_cols if c != by]
        rg = rg[r_proj].sort_values(on, kind="stable")
        merged = pd.merge_asof(
            lg,
            rg,
            on=on,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
            suffixes=("", "__rr"),
        )
        # the matched right `on` value rides along as __r_<on> (tag_right
        # duplicates it), so merge_asof consuming the join column is fine
        rename = {}
        for c in right_cols:
            if c == by:
                continue
            rename["__r_" + c] = out_names[c]
        merged = merged.rename(columns=rename)
        return merged[[c for c in final_cols if c in merged.columns]]

    return tagged.groupby(by).map_groups(per_group, batch_format="pandas")


def asof_join_salted(
    left,
    right,
    on: str,
    by: str,
    right_cols: list[str],
    bucket_us: int,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
):
    """Hot-key-parallel as-of join (backward direction): salt the
    group key with a coarse time bucket (``floor(on / bucket_us)``) so
    one hot ``by`` key spreads across many merge tasks instead of
    serializing on one.

    EXACT despite the salt: a left row in bucket t can only match
    right rows inside bucket t (merge_asof handles those) or the
    single latest right row from any earlier bucket — the "carry" row.
    Carries come from the per-(by, bucket) latest-right summary (one
    tiny row per group), cumulated per key on the driver and broadcast
    back via ``ray.put``; each salted group prepends its carry before
    the merge. Driver-side state is #(by, bucket) summary rows — fine
    for any realistic bucket count; for extreme key×bucket
    cardinality, pick a coarser bucket.

    Semantics and output match ``asof_join(direction="backward")``."""
    import ray

    left_schema = left.schema()
    left_names = list(left_schema.names)
    right_keep = [by, on] + [c for c in right_cols if c not in (by, on)]
    right_slim = right.select_columns(right_keep)
    right_schema = right_slim.schema()
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    ltypes = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    out_names = {
        c: (c + suffix if c in left_names else c)
        for c in right_cols
        if c not in (by,)
    }
    int_left = [
        n
        for n, t in zip(left_schema.names, left_schema.types)
        if pa.types.is_integer(t)
    ]
    r_payload = ["__r_" + c for c in right_cols if c != by]

    def bucket_of(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.array(us // bucket_us)

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_names}
        for c in right_cols:
            if c == by:
                continue
            cols["__r_" + c] = pa.nulls(len(t), rtypes[c])
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_of(t[on])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in left_names:
            if c == by:
                cols[c] = t[by]
            elif c == on:
                cols[c] = t[on]
            else:
                cols[c] = pa.nulls(len(t), ltypes[c])
        for c in right_cols:
            if c == by:
                continue
            cols["__r_" + c] = t[c]
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_of(t[on])
        return pa.table(cols)

    # --- carry rows: per (by, bucket) latest right row, cumulated ---
    def latest_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(on, kind="stable").tail(1)

    summaries = (
        right_slim.map_batches(
            lambda t: pa.table(
                {
                    by: t[by],
                    on: t[on],
                    **{"__r_" + c: t[c] for c in right_cols if c != by},
                    "__bucket": bucket_of(t[on]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby([by, "__bucket"])
        .map_groups(latest_per_bucket, batch_format="pandas")
        .to_pandas()
    )
    # carry for bucket t = latest summary from any bucket < t (per by);
    # iloc slices keep dtypes (dict round-trips would drop the us unit)
    carry_frames: dict = {}
    by_summaries: dict = {}
    if len(summaries):
        summaries = summaries.sort_values([by, "__bucket", on], kind="stable")
        for key_val, grp in summaries.groupby(by):
            grp = grp.reset_index(drop=True)
            by_summaries[key_val] = grp.drop(columns=["__bucket"])
            bkts = grp["__bucket"].tolist()
            for i in range(1, len(grp)):
                carry_frames[(key_val, bkts[i])] = grp.iloc[[i - 1]].drop(
                    columns=["__bucket"]
                )
        # carry_frames covers buckets PRESENT in right; left-only
        # buckets resolve at merge time via the key's summary scan
    carry_ref = ray.put((carry_frames, by_summaries))

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right_slim.map_batches(tag_right, batch_format="pyarrow")
    )
    final_cols = left_names + list(out_names.values())

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        carry_frames_l, by_summaries_l = ray.get(carry_ref)
        key_val = g[by].iloc[0]
        bkt = g["__bucket"].iloc[0]
        lg = g[g["__side"] == 1][left_names].sort_values(on, kind="stable")
        if lg.empty:
            return pd.DataFrame(columns=final_cols)
        for c in int_left:
            lg[c] = lg[c].astype("int64")
        rg = g[g["__side"] == 0][[on] + r_payload].sort_values(on, kind="stable")
        carry = carry_frames_l.get((key_val, bkt))
        if carry is None:
            # left-only bucket (no right rows in it): latest right row
            # of this key from any earlier bucket, via the summary scan
            summ = by_summaries_l.get(key_val)
            if summ is not None:
                lo = bkt * bucket_us
                earlier = summ[summ[on].astype("int64") < lo]
                if len(earlier):
                    carry = earlier.tail(1)
        if carry is not None:
            rg = pd.concat([carry[[on] + r_payload], rg], ignore_index=True)
            rg = rg.sort_values(on, kind="stable")
        merged = pd.merge_asof(
            lg,
            rg,
            on=on,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
            suffixes=("", "__rr"),
        )
        rename = {"__r_" + c: out_names[c] for c in right_cols if c != by}
        merged = merged.rename(columns=rename)
        return merged[[c for c in final_cols if c in merged.columns]]

    return tagged.groupby([by, "__bucket"]).map_groups(
        per_group, batch_format="pandas"
    )


def range_join_broadcast(ds, ranges: pd.DataFrame, value_col: str, lo_col: str = "lo", hi_col: str = "hi"):
    """Inequality (range) join of a big Dataset against a SMALL ranges
    table: output one row per (row, range) pair with
    ``lo <= value < hi``. The ranges frame is broadcast once via
    ``ray.put`` (never re-shipped per batch); each batch probes all
    ranges vectorized — O(n_rows × n_ranges) masks, fine for the
    small-side contract. Range attribute columns are appended to each
    matched row."""
    import ray

    # columnize ONCE driver-side so the broadcast payload is probe-ready
    # (numpy bounds + an arrow attrs table — both zero-copy reads from
    # the local object store); tasks then probe with no per-task prep
    # and no actor-pool startup
    r = ranges.reset_index(drop=True)
    attrs_tbl = pa.Table.from_pandas(r.drop(columns=[lo_col, hi_col]), preserve_index=False)
    ranges_ref = ray.put((r[lo_col].to_numpy(), r[hi_col].to_numpy(), attrs_tbl))

    def range_probe(t: pa.Table) -> pa.Table:
        lo, hi, attrs = ray.get(ranges_ref)
        v = t[value_col].to_numpy(zero_copy_only=False)
        row_idx = []
        rng_idx = []
        for j in range(len(lo)):
            hit = np.flatnonzero((v >= lo[j]) & (v < hi[j]))
            if hit.size:
                row_idx.append(hit)
                rng_idx.append(np.full(hit.size, j, dtype=np.int64))
        if not row_idx:
            base = t.slice(0, 0)
            for name in attrs.column_names:
                base = base.append_column(
                    name, pa.array([], attrs.schema.field(name).type)
                )
            return base
        rows = np.concatenate(row_idx)
        rngs = np.concatenate(rng_idx)
        out = t.take(pa.array(rows))
        take_idx = pa.array(rngs)
        for name in attrs.column_names:
            out = out.append_column(name, attrs[name].take(take_idx))
        return out

    return ds.map_batches(range_probe, batch_format="pyarrow")


def bucketed_equi_join(
    left_ds,
    right_ds,
    key: str,
    num_buckets: int = 64,
    join_type: str = "inner",
):
    """Both-sides-large hash equi-join: EXPLICIT hash-bucket exchange
    with raw Ray tasks — the same shape as
    ``constraints.bucketed_anti_join`` and for the same reason: Ray's
    native ``Dataset.join`` (alpha hash-shuffle) breaks on partitions
    that receive no blocks (schema-less empty tables fail the Acero
    join), and the union+groupby formulation funnels both sides through
    a global sort shuffle that stalls when the object store is smaller
    than the shuffle data.

    Each side's blocks split into B pieces by hash(key) % B
    (``num_returns`` fan-out — pieces flow worker-to-worker, never the
    driver); one task per bucket concatenates its pieces and runs a
    local Arrow hash join (actual values compared — collision-proof).
    ``join_type``: "inner" or "left outer". NULL keys never match
    (SQL semantics). One bucket's rows from both sides must fit in one
    worker — hot keys need a pre-salt, same contract as ``asof_join``.
    """
    import ray
    import ray.data as rd

    from ..state.sketches import hash64

    def _arrow_schema(ds):
        # pandas-block upstreams (e.g. map_groups) report a
        # PandasBlockSchema; normalize so empty-piece schemas are Arrow
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        return ds.map_batches(
            lambda t: t, batch_format="pyarrow"
        ).schema().base_schema

    left_schema = _arrow_schema(left_ds)
    right_schema = _arrow_schema(right_ds)
    P = num_buckets

    def _split(t, schema: pa.Schema):
        if isinstance(t, pd.DataFrame):  # defensive: arrow_block_refs converts these
            t = pa.Table.from_pandas(t, preserve_index=False)
        if key not in t.column_names:  # schema-less empty block upstream
            empty = schema.empty_table()
            return tuple(empty for _ in range(P))
        keys = t[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        import pyarrow.compute as pc

        h = (
            hash64(pc.fill_null(keys.cast(pa.string()), "\x00__null__"))
            % np.uint64(P)
        ).astype(np.int64)
        order = np.argsort(h, kind="stable")
        bounds = np.searchsorted(h[order], np.arange(P + 1))
        return tuple(
            t.take(pa.array(order[bounds[p] : bounds[p + 1]]))
            for p in range(P)
        )

    @ray.remote
    def split_left(t: pa.Table):
        return _split(t, left_schema)

    @ray.remote
    def split_right(t: pa.Table):
        return _split(t, right_schema)

    @ray.remote
    def join_bucket(n_left: int, *pieces) -> pa.Table:
        lp = [p for p in pieces[:n_left] if p.num_rows]
        rp = [p for p in pieces[n_left:] if p.num_rows]
        left = pa.concat_tables(lp) if lp else left_schema.empty_table()
        right = pa.concat_tables(rp) if rp else right_schema.empty_table()
        return left.join(right, keys=key, join_type=join_type)

    left_splits = [
        split_left.options(num_returns=P).remote(r)
        for r in arrow_block_refs(left_ds)
    ]
    right_splits = [
        split_right.options(num_returns=P).remote(r)
        for r in arrow_block_refs(right_ds)
    ]
    buckets = [
        join_bucket.remote(
            len(left_splits),
            *[s[p] for s in left_splits],
            *[s[p] for s in right_splits],
        )
        for p in range(P)
    ]
    return rd.from_arrow_refs(buckets)
