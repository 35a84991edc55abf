"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference has no dedup (SURVEY.md §2.5 G6) — this is the
training-data-pipeline surface the brief requires as first-class.
All paths follow the same scale shape:

1. per-batch vectorized signature computation (``map_batches``, numpy),
2. explode to (bucket, doc_id) candidate rows — the ONLY thing shuffled,
3. ``groupby(bucket)`` → candidate groups → verify inside ``map_groups``,
4. emit duplicate pairs / keep-set.

Connected components over the verified pairs use iterative min-label
propagation when asked to produce cluster ids; default output is the
pair list + a keep policy of "lowest id wins" which needs no global
state.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state.sketches import hash64
from .blocks import arrow_block_refs
from .exchange import broadcast_rows_budget

_MERSENNE = np.uint64((1 << 61) - 1)


def _smallest_store() -> int | None:
    """Object-store bytes of the smallest alive node (None when no
    cluster is up) — the per-node budget every pinning decision in
    this module sizes against."""
    try:
        if ray.is_initialized():
            sizes = [
                n["Resources"]["object_store_memory"]
                for n in ray.nodes()
                if n.get("Alive")
                and n.get("Resources", {}).get("object_store_memory")
            ]
            if sizes:
                return int(min(sizes))
    except Exception:
        pass
    return None


def _land_parquet(rows, spill_dir: str, subname: str):
    """Land ``rows`` as parquet under a function-owned subdirectory of
    ``spill_dir`` and return a streaming reader over it. Only that
    subdirectory is ever cleared between runs — pointing ``spill_dir``
    at a pre-existing directory can never delete caller data (the old
    behavior rmtree'd the caller-supplied path unconditionally).

    The landing write runs under a capped executor object-store budget
    (25% of the smallest node's store): a fast producer (e.g. the
    SimHash band expansion, a 28× tile of each input block) otherwise
    outruns the parquet writers until the store fills and raylet
    SPILLS the backlog to disk — the same bytes then hit disk twice
    (raylet spill + landed parquet) and a 50M-doc × 28-table landing
    ENOSPC'd this VM. Capping the budget turns that backlog into
    streaming backpressure. The cap is set on the DATASET's own
    context copy — a Dataset snapshots DataContext at creation, so
    mutating the global context here would be a silent no-op (the
    first version of this cap was exactly that: 31 GB of raylet
    spill sailed straight past it)."""
    import shutil

    import ray.data as rd

    sub = os.path.join(spill_dir, subname)
    shutil.rmtree(sub, ignore_errors=True)
    os.makedirs(sub, exist_ok=True)
    from ray.data._internal.execution.interfaces.execution_options import (
        ExecutionResources,
    )

    opts = getattr(
        rows, "context", rd.DataContext.get_current()
    ).execution_options
    prev = opts.resource_limits
    store = _smallest_store()
    try:
        if store:
            opts.resource_limits = ExecutionResources(
                object_store_memory=int(store * 0.25)
            )
        rows.write_parquet(sub)
    finally:
        opts.resource_limits = prev
    return rd.read_parquet(sub)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def group_min_count(
    slim,
    key_col: str,
    id_col: str,
    keep: str = "min",
    num_buckets: int | None = None,
):
    """(key, win_id, count) per distinct string key via ONE raw-task
    hash exchange (``stages.exchange``): blocks split by hash64(key),
    each bucket reduced with a single vectorized sort + shifted-compare
    (key strings compared only where the 64-bit hashes collide —
    collision-exact). This is the key-count≈row-count reduce where
    Ray's sort-based ``groupby(str_key)`` measured 78 s on 10M md5
    keys vs ~2 s for the exchange (tools/exact_dedup_bench.py).
    Serves exact dedup, dup-group stats and cluster roots."""
    from ..state.sketches import hash64
    from .exchange import exchange_reduce

    asc = keep == "min"

    def add_kh(t: pa.Table) -> pa.Table:
        kh = hash64(t[key_col].combine_chunks()).view(np.int64)
        return t.append_column("__kh", pa.array(kh, pa.int64()))

    keyed = slim.map_batches(add_kh, batch_format="pyarrow")

    def reduce_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.string()),
                "win_id": pa.array([], pa.int64()),
                "count": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        df = t.to_pandas()
        df.sort_values(
            ["__kh", key_col, id_col],
            ascending=[True, True, asc],
            kind="stable",
            inplace=True,
        )
        kh = df["__kh"].to_numpy()
        kv = df[key_col].to_numpy()
        first = np.empty(len(df), dtype=bool)
        first[0] = True
        first[1:] = kh[1:] != kh[:-1]
        same = np.flatnonzero(~first)
        if same.shape[0]:
            first[same] = kv[same] != kv[same - 1]
        bounds = np.flatnonzero(first)
        counts = np.diff(np.concatenate((bounds, [len(df)])))
        return pa.table(
            {
                key_col: pa.array(kv[bounds], pa.string()),
                "win_id": pa.array(
                    df[id_col].to_numpy().astype(np.int64)[bounds], pa.int64()
                ),
                "count": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return exchange_reduce(keyed, "__kh", reduce_bucket, num_buckets)


def md5_slim(ds, text_col: str, id_col: str):
    """One scan → slim (md5(text), id) rows; text never leaves the
    scan task. Null text gets "" (distinct from md5(""))."""
    import hashlib

    def slim_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        h = [
            hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
            for t in texts
        ]
        return pa.table(
            {
                "__md5": pa.array(h, pa.string()),
                id_col: batch[id_col].cast(pa.int64()),
            }
        )

    return ds.map_batches(slim_hash, batch_format="pyarrow")


def exact_dedup(
    ds,
    text_col: str,
    id_col: str,
    keep: str = "min",
    broadcast_limit: int | None = None,
    num_buckets: int | None = None,
):
    """Hash-partitioned exact dedup, vectorized end to end.

    Scale shape: (1) one scan emits slim (md5, id) rows — the text never
    shuffles; (2) winner ids come from ONE raw-task hash exchange over
    the 8-byte hash64(md5) key (``group_min_count``) — no per-group
    Python callable (the old ``map_groups(head(1))`` paid one pandas
    call per *distinct document*) and no sort-based string-key shuffle
    (measured 78 s vs ~2 s at 10M keys); (3) winner rows are fetched
    with a semi-join on the id column — a broadcast membership filter
    below ``broadcast_limit`` winners (one ``ray.put`` of a sorted
    int64 array + searchsorted per batch), a bucketed hash join above
    it. Assumes ``id_col`` is unique (it is the semi-join key)."""
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")

    winners = group_min_count(
        md5_slim(ds, text_col, id_col), "__md5", id_col, keep, num_buckets
    ).materialize()
    n_win = winners.count()

    if broadcast_limit is None:
        broadcast_limit = broadcast_rows_budget()
    if n_win <= broadcast_limit:
        win_np = np.sort(
            winners.select_columns(["win_id"]).to_pandas()["win_id"]
            .to_numpy()
            .astype(np.int64)
        )
        win_ref = ray.put(win_np)

        def keep_rows(t: pa.Table) -> pa.Table:
            w = ray.get(win_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            if w.shape[0] == 0:
                return t.slice(0, 0)
            pos = np.minimum(np.searchsorted(w, ids), w.shape[0] - 1)
            return t.filter(pa.array(w[pos] == ids))

        return ds.map_batches(keep_rows, batch_format="pyarrow")

    # winner set too large to broadcast: bucketed hash join on the id
    # column (winner ids are unique, so the inner join is a semi-join)
    from .joins import bucketed_equi_join

    win_ds = winners.map_batches(
        lambda t: pa.table({id_col: t["win_id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    return bucketed_equi_join(
        ds, win_ds, key=id_col, num_buckets=num_buckets or 32
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------


def _token_ids(texts: list[str | None]) -> list[np.ndarray]:
    """Whitespace tokens → stable 64-bit ids per doc, fully vectorized:
    Arrow ``utf8_split_whitespace`` → flatten → one ``hash64`` over the
    whole batch's flat token array → slice back per doc via offsets.
    Boundary whitespace yields empty tokens in Arrow (unlike
    ``str.split()``) — filtered to keep tokenization identical."""
    import pyarrow.compute as pc

    arr = pa.array(texts, pa.string())
    toks = pc.utf8_split_whitespace(arr)
    lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False
    )
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    nonempty = pc.not_equal(flat, pa.scalar("", pa.string()))
    nonempty_np = nonempty.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(texts)), lengths)[nonempty_np]
    ids = hash64(flat.filter(nonempty))
    counts = np.bincount(doc_idx, minlength=len(texts))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return [ids[offsets[i] : offsets[i + 1]] for i in range(len(texts))]


def _shingle_hashes(token_ids: np.ndarray, k: int) -> np.ndarray:
    """k-token shingle hashes via a polynomial combine over a sliding
    window (vectorized with stride tricks)."""
    n = token_ids.shape[0]
    if n < k:
        return token_ids[:1] if n else np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(token_ids, k)
    base = np.uint64(1099511628211)  # FNV prime
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(k):
        h = h * base + win[:, j]  # uint64 wraparound is the mixing
    return np.unique(h)


def _minhash_perms(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    texts: list[str | None],
    n_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 1337,
) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signature matrix for a batch.

    Per-permutation work is one vectorized pass over ALL shingles in the
    batch (np.minimum.reduceat over doc boundaries) — no per-doc Python
    loop in the permutation hot path."""
    token_ids = _token_ids(texts)
    shingles = [_shingle_hashes(t, shingle_k) for t in token_ids]
    lengths = np.array([s.shape[0] for s in shingles], dtype=np.int64)
    sig = np.full((len(texts), n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = lengths > 0
    if not nonempty.any():
        return sig
    allsh = np.concatenate([s for s in shingles if s.shape[0]])
    starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=starts[1:])
    a, b = _minhash_perms(n_perm, seed)
    masked = allsh & _MERSENNE
    for p in range(n_perm):
        hp = (a[p] * masked + b[p]) & _MERSENNE  # cheap universal hash
        sig[nonempty, p] = np.minimum.reduceat(hp, starts)
    return sig


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 — FNV fold of each band's signature rows."""
    n_perm = sig.shape[1]
    rows_per_band = n_perm // bands
    base = np.uint64(1099511628211)
    out = np.zeros((sig.shape[0], bands), dtype=np.uint64)
    for b_i in range(bands):
        seg = sig[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
        h = np.zeros(sig.shape[0], dtype=np.uint64)
        for j in range(rows_per_band):
            h = h * base + seg[:, j]
        out[:, b_i] = h
    return out


def minhash_lsh_dedup(
    ds,
    text_col: str,
    id_col: str,
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    seed: int = 1337,
    max_bucket_size: int = 256,
    small_corpus_rows: int = 100_000,
    as_dataset: bool = False,
    pair_emission: str = "pairs",
    sig_spill_dir: str | None = None,
    band_spill_dir: str | None = None,
    exchange_spill_dir: str | None = None,
    exchange_phases: int = 1,
):
    """MinHash+LSH near-dup pairs, fully distributed:

    1. ONE text scan: per-batch signatures → (id, sig) rows, landed
       once (object store; at 100 TB an intermediate parquet dir —
       512 B/doc, ~0.05% of corpus bytes);
    2. band hashes derived FROM the sig rows (cheap fold, no re-scan)
       → (band, band_hash, id) rows ONLY cross the banding shuffle —
       16 × 16 bytes per doc, never the signature, never the text;
    3. groupby band buckets → candidate id pairs (buckets larger than
       ``max_bucket_size`` — giant dup clusters — emit a consecutive-id
       CHAIN instead of the quadratic pair set; connected components
       still merge the cluster);
    4. verification is a distributed signature join, NEVER on the
       driver (web corpora are ~30% near-dup — the candidate list is
       not small): pairs explode to (key=endpoint) probe rows, union
       with the (key=id) sig rows, ``groupby(key)`` attaches each
       endpoint's signature, then ``groupby(pair)`` computes the
       signature-agreement Jaccard estimate. Only verified pairs
       reach the driver.

    For small corpora (< ``small_corpus_rows``) the join machinery
    costs more than it saves — there the signatures ride along in the
    band rows and verification happens inside the bucket groups (one
    execution total). Same results either way (tested).

    ``pair_emission``: "pairs" (default) emits every in-bucket pair —
    exhaustive PAIR recall; "star" emits only (bucket-min → member)
    edges, so candidate volume and verify work scale with bucket
    MEMBERS, not members² — the right mode when downstream is
    connected components / corpus dedup (connectivity is all CC
    needs; duplicate-heavy corpora with ~60-member families measured
    ~20× less verify volume). Applies to the large distributed path —
    below ``small_corpus_rows`` the in-bucket verify is already cheap
    and stays exhaustive. Star trades away direct verification of
    member↔member edges: a member whose similarity to the bucket min
    is below threshold only joins the cluster if SOME band gives it a
    passing hub — for homogeneous dup families (the web reality)
    cluster recall is unchanged (tested + measured); for marginal
    chain-shaped families prefer "pairs".

    Returns a pyarrow Table (id_a, id_b, jaccard_est), id_a < id_b —
    or, with ``as_dataset=True``, the verified pairs as a Dataset
    (unsorted, possibly with band-duplicate pairs already removed):
    the form downstream distributed consumers (connected components,
    corpus dedup) want, since a web corpus' pair list need not fit on
    the driver."""
    import ray.data as rd

    if pair_emission not in ("pairs", "star"):
        # a typo ('Star', 'stars') would otherwise silently fall
        # through to the exhaustive all-pairs path
        raise ValueError(
            f"pair_emission must be 'pairs' or 'star', got {pair_emission!r}"
        )

    if ds.count() < small_corpus_rows:
        small = _minhash_small(
            ds, text_col, id_col, n_perm, bands, shingle_k, jaccard_threshold, seed
        )
        return rd.from_arrow(small) if as_dataset else small

    def to_sig_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        # binary-encoded (n_perm × 8 B) — acero joins carry binary
        # payloads but not list columns
        return pa.table(
            {
                id_col: pa.array(ids),
                "sig": pa.array([row.tobytes() for row in sig], pa.binary()),
            }
        )

    # one text scan; landed once so banding and the verify join both
    # consume it without recomputing signatures. Default landing is the
    # object store (fine while n_docs × (n_perm × 8 B) fits the store +
    # spill budget); ``sig_spill_dir`` lands it as parquet instead — the
    # 100-TB shape: the sig table is ~0.05% of corpus bytes but at 10^8+
    # docs it exceeds a single node's store, and minhash bytes are
    # incompressible so spill is pure disk pressure. Parquet landing
    # frees the store for the banding/verify exchanges and both
    # consumers stream it back (measured: the 100M-doc chain on this
    # VM dies of store-spill ENOSPC without it).
    sig_rows = ds.map_batches(to_sig_rows, batch_format="pyarrow")
    if sig_spill_dir is not None:
        sig_rows = _land_parquet(sig_rows, sig_spill_dir, "_sod_sigs")
    else:
        sig_rows = sig_rows.materialize()

    def sig_to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = (
            np.frombuffer(
                b"".join(batch["sig"].to_pylist()), dtype=np.uint64
            ).reshape(-1, n_perm)
            if len(batch)
            else np.empty((0, n_perm), dtype=np.uint64)
        )
        bh = _band_hashes(sig, bands)
        n = len(ids)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands), n).astype(np.int32)),
                "band_hash": pa.array(bh.T.reshape(-1).view(np.int64)),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    # ``band_spill_dir``: the band table is bands × ~20 B/doc (32 GB
    # at 100M × 16 bands — nearly a whole 37.6 GB store); landing it
    # as parquet keeps the store free for the candidate exchanges,
    # same trade as sig_spill_dir.
    # ``exchange_spill_dir``: the 10⁹-doc knob — pruned rows land as
    # parquet (dup-heavy corpora make them store-sized) and the
    # candidate-emission exchange itself goes through the disk-backed
    # exchange_reduce_spill instead of in-plasma splits.
    band_rows = _prune_singleton_buckets(
        sig_rows.map_batches(sig_to_bands, batch_format="pyarrow"),
        spill_dir=band_spill_dir,
        out_spill_dir=exchange_spill_dir,
    )

    pairs = _candidate_pairs(
        band_rows, id_col, max_bucket_size, pair_emission,
        exchange_spill_dir, exchange_phases,
    )

    def _free_sigs():
        # the verify sides have landed: the sig landing's last read is
        # done (disk-tight volumes need the ~0.5 KB/doc back)
        if sig_spill_dir is not None:
            import shutil

            shutil.rmtree(
                os.path.join(sig_spill_dir, "_sod_sigs"),
                ignore_errors=True,
            )

    verified = _verify_pairs_distributed(
        pairs, sig_rows, id_col, jaccard_threshold,
        spill_dir=exchange_spill_dir,
        after_sides_landed=_free_sigs if exchange_spill_dir else None,
    )
    if as_dataset:
        return verified
    pdf = verified.to_pandas()
    if len(pdf) == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard_est": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pandas(
        pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        preserve_index=False,
    )


def _candidate_pairs(band_rows, id_col, max_bucket_size, pair_emission,
                     exchange_spill_dir=None, exchange_phases=1):
    """Candidate id pairs from pruned (band, band_hash, id) rows —
    candidate emission + pair dedup as two raw-task hash exchanges
    (stages/exchange). The former sort-based
    groupby(band,band_hash).map_groups + groupby(pair).aggregate pair
    was one Python call per dup bucket on top of two all-to-all
    Dataset sorts (679 s of a 1666 s 30M-doc run). Per bucket: one
    lexsort, run detection, and a single vectorized expansion that
    covers all three emission shapes (triangle = full per-row counts,
    star = counts only on run heads, oversize chain = count 1/row).
    Shared by the MinHash and embedding LSH chains. Returns the
    (small) distinct pair Dataset, materialized before the verify
    joins.

    ``exchange_spill_dir``: route the candidate-emission exchange
    through :func:`exchange.exchange_reduce_spill` (bucket-partitioned
    parquet landing, optional ``exchange_phases`` split-phase) instead
    of the in-plasma exchange — the 10⁹-doc tier, where the pruned
    band rows exceed the object store and the in-plasma exchange
    (input blocks + sorted splits ≈ 2× data) ENOSPCs the raylet spill.
    The pair-dedup exchange stays in-plasma: its input is
    candidate-pair-sized, orders of magnitude slimmer."""
    from .exchange import exchange_reduce, exchange_reduce_spill

    def add_bk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "band" not in t.column_names:
            return t
        return t.append_column("bk", _bucket_key64(t))

    keyed = band_rows.map_batches(add_bk, batch_format="pyarrow")
    pair_schema = pa.schema(
        [("pk", pa.int64()), ("id_a", pa.int64()), ("id_b", pa.int64())]
    )
    emission_star = pair_emission == "star"
    cap = max_bucket_size

    def emit_candidates(t: pa.Table) -> pa.Table:
        empty = pair_schema.empty_table()
        if t.num_rows == 0 or "bk" not in t.column_names:
            return empty
        bk = t["bk"].to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        # drop duplicate (bucket, id) rows — a doc appears once per band
        keep = np.concatenate(
            ([True], (bk[1:] != bk[:-1]) | (ids[1:] != ids[:-1]))
        )
        bk, ids = bk[keep], ids[keep]
        new = np.concatenate(([True], bk[1:] != bk[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [bk.shape[0]])))
        pos = np.arange(bk.shape[0]) - np.repeat(starts, sizes)
        gsz = np.repeat(sizes, sizes)
        if emission_star:
            cnt = np.where(pos == 0, gsz - 1, 0)
        else:
            cnt = gsz - 1 - pos  # upper triangle
        big = gsz > cap  # giant dup cluster: consecutive-id chain
        if big.any():
            cnt = np.where(big, (pos < gsz - 1).astype(np.int64), cnt)
        total = int(cnt.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(bk.shape[0]), cnt)
        cum = np.cumsum(cnt)
        offset = np.arange(total) - np.repeat(cum - cnt, cnt) + 1
        ia, ib = ids[left], ids[left + offset]
        pk = (
            ia.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ ib.astype(np.uint64)
        ).view(np.int64)  # routing key only; dedup compares real ids
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
            }
        )

    if exchange_spill_dir is not None:
        cand = exchange_reduce_spill(
            keyed, "bk", emit_candidates, exchange_spill_dir,
            phases=exchange_phases,
        )
    else:
        cand = exchange_reduce(keyed, "bk", emit_candidates)
    del keyed

    def distinct_pairs(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return empty
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
            }
        )

    # land the (small) distinct pair list before the verify joins
    out = exchange_reduce(cand, "pk", distinct_pairs).materialize()
    if exchange_spill_dir is not None:
        # the materialize above forced every upstream read: the pruned
        # landing and the candidate exchange's landed buckets are dead
        # weight on a disk-tight volume (measured: their ~4 GB plus the
        # 23 GB sig landing pushed a 60M-doc funnel past the raylet
        # disk monitor during the verify joins)
        import glob as _glob
        import shutil as _shutil

        _shutil.rmtree(
            os.path.join(exchange_spill_dir, "_sod_pruned"),
            ignore_errors=True,
        )
        for d in _glob.glob(
            os.path.join(exchange_spill_dir, "_sod_exchange_p*")
        ):
            _shutil.rmtree(d, ignore_errors=True)
    return out


def _bucket_key64(t: pa.Table):
    """Composite 8-byte bucket key: band<<56 | band_hash[:56].
    Truncation can only FALSELY KEEP a singleton (same-band 56-bit
    collision), which the verify step discards — never drops a real
    dup bucket."""
    import pyarrow.compute as pc

    k = pc.bit_wise_or(
        pc.shift_left(t["band"].cast(pa.int64()), pa.scalar(56, pa.int64())),
        pc.bit_wise_and(
            t["band_hash"].cast(pa.int64()),
            pa.scalar((1 << 56) - 1, pa.int64()),
        ),
    )
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


@ray.remote
def _bucket_keys_split(t: pa.Table, P: int, key_col: str | None = None):
    """Band-row block → P pieces of its composite keys (key % P)."""
    keys = t[key_col] if key_col else _bucket_key64(t)
    k = keys.to_numpy(zero_copy_only=False)
    b = k % P  # keys are non-negative by construction
    return tuple(k[b == p] for p in range(P))


@ray.remote
def _bucket_hot_keys(*pieces) -> np.ndarray:
    """Keys appearing ≥2 times in this bucket (sort + run compare)."""
    if not pieces:
        return np.empty(0, np.int64)
    k = np.concatenate(pieces)
    if k.shape[0] == 0:
        return k
    k.sort(kind="stable")
    dup = k[np.concatenate(([False], k[1:] == k[:-1]))]
    if dup.shape[0] == 0:
        return dup
    return dup[np.concatenate(([True], dup[1:] != dup[:-1]))]


def _broadcast_key_filter(band_rows, key64_of, hot_np: np.ndarray,
                          land_dir: str | None = None):
    """Keep only rows whose composite key is in ``hot_np``: broadcast
    the keys SORTED once and probe per batch with ``np.searchsorted``.

    Not ``pc.is_in``: is_in rebuilds its hash set from the value_set on
    EVERY call, and map_batches cuts blocks into ~131k-row batches — a
    16M-key set costs ~2.3 s to build, so a 1.4B-row filter pays
    ~10,600 rebuilds (~25 CPU-min/worker; measured grinding 32 CPUs for
    18+ min on the 50M-doc × 28-table SimHash corpus). The sorted-probe
    is O(batch · log keys) with zero per-batch setup, so plain tasks
    (zero-copy local ray.get) stay the right choice over an actor pool.

    ``land_dir``: land the filtered rows as parquet instead of
    materializing them in the object store — for DUP-HEAVY corpora at
    the 10^9-doc tier the surviving rows are themselves store-sized
    (30% near-dup web reality × 10^9 docs × 28 tables), and the
    downstream spill exchange streams them from disk anyway."""
    hot_np = np.sort(hot_np)
    key_ref = ray.put(hot_np)

    def hot_filter(t: pa.Table) -> pa.Table:
        hot = ray.get(key_ref)
        if hot.shape[0] == 0 or t.num_rows == 0:
            return t.slice(0, 0)
        ks = key64_of(t).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hot, ks)
        mask = hot[np.minimum(pos, hot.shape[0] - 1)] == ks
        return t.filter(pa.array(mask))

    filtered = band_rows.map_batches(hot_filter, batch_format="pyarrow")
    if land_dir is not None:
        return _land_parquet(filtered, land_dir, "_sod_pruned")
    return filtered.materialize()


def _prune_singleton_buckets(
    band_rows,
    num_partitions: int | None = None,
    key_col: str | None = None,
    spill_dir: str | None = None,
    out_spill_dir: str | None = None,
):
    """Drop band buckets holding a single doc BEFORE the per-bucket
    group pass: nearly every bucket is a singleton (no candidate pair
    can come out of it), and `groupby().map_groups` pays a Python call
    per group — pruning turns ~N·bands tiny groups into only the dup
    buckets. Hot keys come from per-batch value_counts (small inputs)
    or a raw-task key exchange (large), then one broadcast filter —
    all distributed. ``key_col``: use a precomputed int64 bucket-key
    column instead of deriving band<<56|band_hash. ``spill_dir``:
    land the band rows as parquet instead of pinning them in the
    object store — the ``sig_spill_dir`` idea for band rows; at 10⁸
    docs × 12-28 tables the band table is tens of GB, larger than a
    node's store, and both passes below stream it fine from disk.
    ``out_spill_dir``: land the FILTERED rows too (instead of a store
    materialize) — needed when the dup buckets themselves are
    store-sized (dup-heavy corpus × 10⁹ docs)."""
    import pyarrow.compute as pc

    # land the band rows once: the count pass, the filter pass and the
    # downstream groupby would otherwise each re-execute the signature
    # scan through lineage
    landed_bands_sub = None
    if spill_dir is not None:
        band_rows = _land_parquet(band_rows, spill_dir, "_sod_bands")
        landed_bands_sub = os.path.join(spill_dir, "_sod_bands")
    else:
        band_rows = band_rows.materialize()

    def _free_bands():
        # the pruned-output landing is the band landing's LAST read —
        # on a disk-tight volume the full band table (tens of GB at
        # 10⁸ docs × wide designs) can be freed the moment the pruned
        # copy has committed, before the candidate exchange lands its
        # own copy
        if landed_bands_sub is not None and out_spill_dir is not None:
            import shutil

            shutil.rmtree(landed_bands_sub, ignore_errors=True)
    n_rows = band_rows.count()
    if key_col is not None:
        def key64_of(t, _c=key_col):
            col = t[_c]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    else:
        key64_of = _bucket_key64

    if n_rows <= broadcast_rows_budget():
        # partial-counts shortcut: per-batch value_counts of the
        # composite key merge on the driver (≤5M 16-B rows) — skips
        # the sort-based count shuffle entirely
        def batch_counts(t: pa.Table) -> pa.Table:
            vc = pc.value_counts(key64_of(t))
            return pa.table(
                {"key": vc.field("values"), "c": vc.field("counts")}
            )

        pdf = (
            band_rows.map_batches(batch_counts, batch_format="pyarrow")
            .to_pandas()
            .groupby("key", as_index=False)["c"]
            .sum()
        )
        hot_np = pdf.loc[pdf["c"] >= 2, "key"].to_numpy()
        out = _broadcast_key_filter(band_rows, key64_of, hot_np,
                                    land_dir=out_spill_dir)
        _free_bands()
        return out

    # >5M band rows: sharded hot-key detection via a raw-task hash-
    # bucket exchange of ONLY the 8-byte composite keys (the
    # sort-based count groupby measured 80+ s on 16M rows; this moves
    # the same bytes in one O(n) pass — same pattern as stages/cc.py)
    P = 32
    # pin ONLY the 8-byte composite keys for the count exchange:
    # arrow_block_refs executes the plan and holds every block ref, so
    # pinning the full band rows would re-materialize the just-landed
    # table into the store (45 GB at 50M docs × 28 tables vs a 37.6 GB
    # store — measured: raylet spilled it straight back to disk until
    # ENOSPC). The key projection is 4× slimmer and is all this pass
    # needs; the filter pass below re-streams the full rows.
    def project_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__key64": pa.array([], pa.int64())})
        return pa.table({"__key64": key64_of(t)})

    slim_keys = band_rows.map_batches(project_keys, batch_format="pyarrow")
    refs = arrow_block_refs(slim_keys)
    splits = [
        _bucket_keys_split.options(num_returns=P).remote(r, P, "__key64")
        for r in refs
    ]
    if P == 1:  # options(num_returns=1) would unwrap the tuple
        splits = [[s] for s in splits]
    hot_parts = ray.get(
        [_bucket_hot_keys.remote(*[s[p] for s in splits]) for p in range(P)]
    )
    hot_np = (
        np.concatenate(hot_parts) if hot_parts else np.empty(0, np.int64)
    )
    if hot_np.shape[0] <= broadcast_rows_budget(bytes_per_row=8, fraction=0.004):
        # dup buckets are few (the common case — planted-dup corpora
        # measure <1% of docs in dup buckets): broadcast the composite
        # keys once. 8 B/key → ≤160 MB.
        out = _broadcast_key_filter(band_rows, key64_of, hot_np,
                                    land_dir=out_spill_dir)
        _free_bands()
        return out
    # dup-heavy corpus (>20M dup buckets): broadcast would pin too
    # much worker heap — distributed hash join against the hot-key
    # table instead
    import ray.data as _rd

    hot = _rd.from_numpy(hot_np).map_batches(
        lambda t: pa.table({"__key64": t["data"]}), batch_format="pyarrow"
    )
    keyed = band_rows.map_batches(
        lambda t: t.append_column("__key64", key64_of(t)),
        batch_format="pyarrow",
    )
    joined = keyed.join(
        hot, "inner", _join_partitions(num_partitions), on=("__key64",)
    ).drop_columns(["__key64"])
    if out_spill_dir is not None:
        out = _land_parquet(joined, out_spill_dir, "_sod_pruned")
        _free_bands()
        return out
    return joined.materialize()


def _join_partitions(requested: int | None) -> int:
    """Join aggregator-actor count sized to the cluster: each hash join
    spawns `num_partitions` aggregator actors, and oversubscribing CPUs
    (e.g. two chained 16-way joins on 4 cores) deadlocks the pool."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    auto = max(2, cpus // 2)
    return min(requested, auto) if requested else auto


@ray.remote
def _pair_endpoints(t: pa.Table) -> np.ndarray:
    """Distinct endpoint ids of one candidate-pair block."""
    if t.num_rows == 0 or "id_a" not in t.column_names:
        return np.empty(0, np.int64)
    return np.unique(
        np.concatenate(
            (
                t["id_a"].to_numpy(zero_copy_only=False),
                t["id_b"].to_numpy(zero_copy_only=False),
            )
        )
    )


def _sig_agreement(col_a, col_b) -> np.ndarray:
    """Default pair scorer: MinHash signature agreement fraction."""
    n = len(col_a)
    A = np.frombuffer(b"".join(col_a.to_pylist()), dtype=np.uint64).reshape(n, -1)
    B = np.frombuffer(b"".join(col_b.to_pylist()), dtype=np.uint64).reshape(n, -1)
    return (A == B).mean(axis=1)


def _verify_pairs_distributed(
    pairs,
    sig_rows,
    id_col: str,
    threshold: float,
    num_partitions: int | None = None,
    endpoint_broadcast_limit: int | None = None,
    payload_col: str = "sig",
    out_col: str = "jaccard_est",
    scorer=None,
    spill_dir: str | None = None,
    after_sides_landed=None,
):
    """Distributed pair verify: two native hash joins attach each
    endpoint's binary payload (MinHash signature by default; any
    per-doc bytes via ``payload_col``/``scorer`` — the embedding chain
    passes normalized float32 vectors and a dot-product scorer) to its
    candidate pairs, then one vectorized map computes the per-pair
    score and filters by threshold. The joins shuffle pair ids + one
    payload per row (KBs per partition), never text; nothing touches
    the driver. Returns a Dataset of (id_a, id_b, <out_col>).

    Endpoint pre-filter: the candidate list is usually orders of
    magnitude smaller than the corpus, yet a naive join re-shuffles the
    FULL signature table both times (~4.2 GB twice at 30M docs for
    ~300k pairs — measured 432 s of a 1666 s run). When the distinct
    endpoint count fits ``endpoint_broadcast_limit`` (8 B/id — 160 MB
    at the default), broadcast it once and filter sig_rows to only the
    referenced docs in one scan, so the joins shuffle candidate-sized
    tables. Dup-heavy corpora past the limit fall back to the full
    join, which is then the right shape anyway."""
    # num_partitions=None → bucketed_equi_join sizes the fan-out to the
    # candidate volume (RefBundle row metadata, no extra execution)
    n_pairs = pairs.count()
    if endpoint_broadcast_limit is None:
        endpoint_broadcast_limit = broadcast_rows_budget(
            bytes_per_row=8, fraction=0.004
        )
    # gate on the ACTUAL distinct endpoint count, not the 2·n_pairs
    # proxy: star emission makes endpoints ≈ n_pairs (each member pairs
    # with its bucket hub), so the proxy overcounts ~2× and a 60M-doc
    # funnel whose candidates sat just over the proxy skipped the
    # filter — the full-corpus-payload join then OOM-killed the native
    # aggregators (measured). Collecting the endpoint ids to decide
    # costs 16 B × 2·n_pairs transient driver memory; cap that at 8×
    # the budget (~2.6 GB at the 20M default) and assume over-budget
    # beyond it.
    eps = None
    if 0 < 2 * n_pairs <= 8 * endpoint_broadcast_limit:
        parts = ray.get(
            [_pair_endpoints.remote(r) for r in arrow_block_refs(pairs)]
        )
        eps = (
            np.unique(np.concatenate(parts))
            if parts
            else np.empty(0, np.int64)
        )
        if eps.shape[0] > endpoint_broadcast_limit:
            eps = None
    if eps is not None:
        ep_ref = ray.put(eps)  # already unique-sorted

        def sig_filter(t: pa.Table) -> pa.Table:
            # plain task: the broadcast id array is a zero-copy local
            # read. Sorted-probe, not pc.is_in — is_in rebuilds its
            # hash set per ~131k-row batch (~2.3 s at 16M ids; see
            # _broadcast_key_filter), searchsorted has no per-batch
            # setup.
            ep = ray.get(ep_ref)
            if ep.shape[0] == 0 or t.num_rows == 0:
                return t.slice(0, 0)
            ids = (
                t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            pos = np.searchsorted(ep, ids)
            mask = ep[np.minimum(pos, ep.shape[0] - 1)] == ids
            return t.filter(pa.array(mask))

        # land the (endpoint-sized) subset: sa and sb both branch off it,
        # so an unlanded filter would rescan the full sig table twice
        sig_rows = sig_rows.map_batches(
            sig_filter, batch_format="pyarrow"
        ).materialize()

    score = scorer or _sig_agreement

    def as_a(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id_a": t[id_col].cast(pa.int64()), "pl_a": t[payload_col]}
        )

    def as_b(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id_b": t[id_col].cast(pa.int64()), "pl_b": t[payload_col]}
        )

    sa = sig_rows.map_batches(as_a, batch_format="pyarrow")
    sb = sig_rows.map_batches(as_b, batch_format="pyarrow")
    # Join backend by SIDE SIZE. The raw-task bucket-exchange join
    # (stages.joins.bucketed_equi_join) skips the native join's
    # aggregator-pool startup (~1.4 s ×2 on a 2k-row corpus) and sizes
    # its fan-out to the candidates — but it PINS ~2 copies of each
    # side (block refs + split outputs) in the object store, which is
    # the right trade only for endpoint-filtered sides. When the
    # candidate set overflows the endpoint budget and the side is the
    # FULL corpus payload table, that pinning is catastrophic —
    # measured at 30M×64d with >10M candidates: ~35 GB of raylet spill
    # → OutOfDiskError. Big sides route to the native streaming hash
    # join, which aggregates incrementally instead of pinning.
    # Materialize between the two so the second join reads landed
    # blocks (and the two aggregator pools never run concurrently).
    from .joins import bucketed_equi_join, bucketed_equi_join_spill

    try:
        side_bytes = sig_rows.size_bytes() or 0
    except Exception:
        side_bytes = 0
    store = _smallest_store()
    if spill_dir is not None:
        # disk-backed joins: both sides land as bucket-partitioned
        # parquet, one join task per bucket — plasma never holds the
        # shuffle (a 60M-doc funnel's candidate-pair × payload join
        # spilled past the raylet disk monitor through the in-plasma
        # exchange, and the native-join fallback OOM-killed its
        # aggregators — measured). NOTHING payload-bearing
        # materializes: the second join's landing streams the first
        # join's bucket outputs straight back to disk, and only the
        # SCORED pairs (threshold-filtered, payload dropped — orders
        # of magnitude slimmer than pairs × 2 signatures) enter
        # plasma. Distinct subdirs per join: j1's landed buckets must
        # survive until the second landing has consumed them.
        import shutil

        vdir1 = os.path.join(spill_dir, "_sod_verify1")
        vdir2 = os.path.join(spill_dir, "_sod_verify2")
        j1 = bucketed_equi_join_spill(
            pairs, sa, "id_a", vdir1, num_buckets=num_partitions
        )
        j = bucketed_equi_join_spill(
            j1, sb, "id_b", vdir2, num_buckets=num_partitions
        )
        # the second landing consumed j1's bucket outputs AND the
        # payload table's last read: vdir1 and the caller's payload
        # landing (the 23-GB sig table at 60M docs) are both dead —
        # free them BEFORE the join outputs start landing in plasma
        shutil.rmtree(vdir1, ignore_errors=True)
        if after_sides_landed is not None:
            after_sides_landed()
        out = j.map_batches(
            _make_est_batch(score, threshold, out_col),
            batch_format="pyarrow",
        ).materialize()
        shutil.rmtree(vdir2, ignore_errors=True)
        return out
    if side_bytes and store and 8 * side_bytes > store:
        parts = _join_partitions(num_partitions)
        j1 = pairs.join(sa, "inner", parts, on=("id_a",)).materialize()
        j = j1.join(sb, "inner", parts, on=("id_b",))
    else:
        j1 = bucketed_equi_join(
            pairs, sa, "id_a", num_buckets=num_partitions
        ).materialize()
        j = bucketed_equi_join(j1, sb, "id_b", num_buckets=num_partitions)

    return j.map_batches(
        _make_est_batch(score, threshold, out_col), batch_format="pyarrow"
    )


def _make_est_batch(score, threshold, out_col):
    """Per-batch pair scorer shared by the in-plasma and disk-backed
    verify paths: score the two payload columns, keep >= threshold,
    drop payloads."""

    def est_batch(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    out_col: pa.array([], pa.float64()),
                }
            )
        e = score(t["pl_a"].combine_chunks(), t["pl_b"].combine_chunks())
        keep = e >= threshold
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                "id_a": sub["id_a"],
                "id_b": sub["id_b"],
                out_col: pa.array(e[keep], pa.float64()),
            }
        )

    return est_batch


def _minhash_small(
    ds, text_col, id_col, n_perm, bands, shingle_k, jaccard_threshold, seed
):
    """Small-corpus path: one pass — signatures computed on the driver
    over collected (id, text) batches would defeat the point; instead
    signatures ride in the band rows and buckets verify in-place."""

    def to_band_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        bh = _band_hashes(sig, bands)
        n = len(texts)
        sig_bytes = [row.tobytes() for row in sig]  # binary: join-compatible
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands), n).astype(np.int32)),
                "band_hash": pa.array(bh.T.reshape(-1).view(np.int64)),
                id_col: pa.array(np.tile(ids, bands)),
                "sig": pa.array(sig_bytes * bands, pa.binary()),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col, kind="stable")
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "jaccard_est": pd.Series(dtype="float64")}
            )
        ids = g[id_col].to_numpy()
        sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in g["sig"]])
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hits = np.flatnonzero(agree >= jaccard_threshold)
            for h in hits:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + h])
                out_j.append(float(agree[h]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard_est": out_j})

    pairs = (
        _prune_singleton_buckets(
            ds.map_batches(to_band_rows, batch_format="pyarrow")
        )
        .groupby(["band", "band_hash"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    if len(pairs) == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard_est": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pandas(pairs, preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via a byte lookup table
    (numpy < 2.0 has no ``bitwise_count``)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8)].reshape(-1, 8).sum(axis=1, dtype=np.int64)


def simhash_signatures(texts: list[str | None], seed: int = 7) -> np.ndarray:
    """64-bit SimHash per doc from token hashes (unit weights): sign of
    the per-bit sum of ±1 votes.

    Batch-vectorized: all docs' token ids are concatenated once; per
    bit position j, ONE shift/mask over the whole flat array and ONE
    ``np.add.reduceat`` over the doc boundaries give every doc's bit-j
    vote sum — 64 vectorized passes total, no per-doc Python loop
    (bit-identical to the per-doc formulation: bit set iff
    2·Σbits − n_tokens > 0)."""
    token_ids = _token_ids(texts)
    out = np.zeros(len(texts), dtype=np.uint64)
    counts = np.fromiter(
        (t.shape[0] for t in token_ids), dtype=np.int64, count=len(token_ids)
    )
    nz = np.flatnonzero(counts)
    if nz.shape[0] == 0:
        return out
    flat = np.concatenate([token_ids[i] for i in nz])
    offs = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
    out[nz] = _simhash_votes(flat, offs, counts[nz])
    return out


def _simhash_votes(
    flat: np.ndarray, offs: np.ndarray, cnz: np.ndarray
) -> np.ndarray:
    """One 64-bit signature word per doc from a flat token-hash stream:
    64 shift/mask + ``np.add.reduceat`` passes (see simhash_signatures)."""
    sig = np.zeros(offs.shape[0], dtype=np.uint64)
    for j in range(64):
        bit_j = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        sums = np.add.reduceat(bit_j, offs)
        sig |= ((2 * sums - cnz) > 0).astype(np.uint64) << np.uint64(j)
    return sig


def _remix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a decorrelated second 64-bit hash stream
    from the same token ids (the 128-bit signature's upper word)."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def simhash128_signatures(
    texts: list[str | None], seed: int = 7
) -> np.ndarray:
    """128-bit SimHash per doc as an (n, 2) uint64 array [lo, hi]: the
    low word votes on the raw token hashes (IDENTICAL to the 64-bit
    ``simhash_signatures``), the high word on a splitmix64 remix of the
    same ids — one extra pass over the flat stream, no re-tokenization.

    Why 128 bits: hamming ≤ 3 banding over a 64-bit signature forces
    16-bit bands (4 × 16), whose 65,536-bucket space saturates around
    10⁷ docs (measured r3: expected occupancy 10⁸/2¹⁶ ≈ 1,500 →
    occupancy² verify). 128 bits buy 32-bit bands (4 × 32 — pigeonhole
    still covers ≤ 3 flips... of the now-finer 128-bit distance) with a
    4.3-billion-bucket space per band: occupancy stays ≈ n/2³² « 1 at
    10⁸ docs. Note the distance SCALE changes: a one-edit doc pair
    lands at roughly 2× its 64-bit hamming distance — pick
    ``max_hamming`` per signature width."""
    token_ids = _token_ids(texts)
    out = np.zeros((len(texts), 2), dtype=np.uint64)
    counts = np.fromiter(
        (t.shape[0] for t in token_ids), dtype=np.int64, count=len(token_ids)
    )
    nz = np.flatnonzero(counts)
    if nz.shape[0] == 0:
        return out
    flat = np.concatenate([token_ids[i] for i in nz])
    offs = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
    cnz = counts[nz]
    out[nz, 0] = _simhash_votes(flat, offs, cnz)
    out[nz, 1] = _simhash_votes(_remix64(flat), offs, cnz)
    return out


def simhash_dedup(
    ds,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    sig_bits: int = 64,
    table_design: str = "all",
    band_spill_dir: str | None = None,
    exchange_spill_dir: str | None = None,
    exchange_phases: int = 1,
):
    """SimHash near-dup: banded bucket keys (any doc pair within the
    guaranteed hamming radius shares ≥1 exact key by pigeonhole) →
    verify hamming distance within buckets.

    Two signature widths:

    - ``sig_bits=64`` (default): 4×16-bit single-block bands —
      guarantee hamming ≤ n_bands−1 (3). The 2¹⁶ bucket space per band
      SATURATES around 10⁷ docs (measured r3: occupancy² verify) — use
      64-bit below that scale.
    - ``sig_bits=128``: the 10⁸-doc shape. The 128-bit signature
      (``simhash128_signatures``) splits into 8×16-bit blocks and every
      C(8,2)=28 block PAIR keys a table (Manku-style combination
      banding): ≤6 flipped bits touch ≤6 blocks, leaving ≥2 clean
      blocks whose pair-table both docs share — recall GUARANTEED to
      hamming ≤ 6 (≈ the 64-bit ≤3 semantic at the 2× finer distance
      scale) with 32-bit keys, so bucket occupancy stays ~n/2³² « 1
      at 10⁸ docs. 28 slim rows/doc instead of 4 is the price.
      ``table_design="matching"`` keys only the perfect matching
      {(0,1),(2,3),(4,5),(6,7)} — 4 tables, SAME row volume as the
      64-bit mode, 32-bit keys: ≤3 flipped bits leave ≥5 clean
      blocks, and 5 vertices over 4 disjoint edges must contain a
      full edge (pigeonhole), so recall is GUARANTEED
      to hamming ≤ 3 with flat occupancy at 10⁸ docs — the cheap
      high-capacity mode; beyond radius 3 it is probabilistic.
      ``table_design="cliques"`` (two disjoint K4s, 12 tables) is the
      middle point: ≤5 flips leave ≥3 clean blocks, two of which
      share a clique — hamming ≤ 5 guaranteed at 3× matching's row
      volume (provably minimal for h≤5: the uncovered pair graph
      must be triangle-free, Turán caps it at 16 of 28 edges).
      ``table_design="triples"`` (disjoint cliques of sizes 3/3/2,
      7 tables): ≤4 flips leave ≥4 clean blocks; any 4 vertices over
      three cliques put two in one clique (pigeonhole) — hamming ≤ 4
      guaranteed. Minimal too: independence number ≤ 3 forces the
      complement K4-free, Turán caps it at 21 of 28 edges → ≥7
      tables. The full guaranteed design space is 4/h≤3, 7/h≤4,
      12/h≤5, 28/h≤6 — each provably minimal by the same argument
      (h flips leave ≥ 8−h clean blocks; covering every (8−h)-subset
      with an edge ⇔ independence ≤ 7−h ⇔ complement K(8−h)-free ⇔
      Turán bound). ``n_bands`` is ignored in this mode.

    Scale shape (same exchange machinery as the MinHash chain, but
    with NO verify join — the whole verify payload is the 8/16-byte
    signature, so it rides the band rows): one scan emits slim
    (bk = table<<56|key, id, sig words) rows, singleton buckets are
    pruned, ONE raw-task hash exchange runs a fully vectorized
    per-bucket kernel (lexsort → run detection → sliced upper-triangle
    pair expansion → XOR + table popcount → threshold), and a second
    exchange dedupes pairs found in several tables. No per-bucket
    Python callable, no Dataset sort shuffles.

    ``band_spill_dir``: land the band-row table as parquet instead of
    pinning it in the object store (the ``sig_spill_dir`` idea) — at
    10⁸ docs the 128-bit band table is 12-28 rows × 32 B per doc
    (38-90 GB), larger than a node's store; landed, both prune passes
    and the verify exchange stream it from disk. Parity-tested
    byte-identical to the in-store path.

    ``exchange_spill_dir``: the 10⁹-doc knob — the PRUNED rows land as
    parquet (dup-heavy corpora make them store-sized) and the verify
    exchange runs through the disk-backed
    :func:`exchange.exchange_reduce_spill` (``exchange_phases``
    split-phase for volumes that cannot hold input + one landed copy)
    instead of in-plasma splits. Identical results (parity-tested)."""
    from .exchange import exchange_reduce, exchange_reduce_spill

    if sig_bits not in (64, 128):
        raise ValueError(f"sig_bits must be 64 or 128, got {sig_bits}")
    if table_design not in ("all", "matching", "triples", "cliques"):
        raise ValueError(
            "table_design must be 'all', 'matching', 'triples' or "
            f"'cliques', got {table_design!r}"
        )
    sig_cols = ["simhash"] if sig_bits == 64 else ["sh_lo", "sh_hi"]

    def add_simhash(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if sig_bits == 64:
            sh = simhash_signatures(batch[text_col].to_pylist())
            band_w = 64 // n_bands
            mask = np.uint64((1 << band_w) - 1)
            shifts = np.uint64(band_w) * np.arange(n_bands, dtype=np.uint64)
            bh = (sh[None, :] >> shifts[:, None]) & mask  # (n_bands, n)
            bands = np.repeat(np.arange(n_bands, dtype=np.int64), n)
            bk = (bands << 56) | bh.reshape(-1).astype(np.int64)
            return pa.table(
                {
                    "bk": pa.array(bk, pa.int64()),
                    id_col: pa.array(np.tile(ids, n_bands)),
                    "simhash": pa.array(np.tile(sh, n_bands)),
                }
            )
        from itertools import combinations

        sig = simhash128_signatures(batch[text_col].to_pylist())
        lo, hi = sig[:, 0], sig[:, 1]
        mask16 = np.uint64(0xFFFF)
        blocks = np.empty((8, n), np.uint64)
        for b in range(4):
            blocks[b] = (lo >> np.uint64(16 * b)) & mask16
            blocks[4 + b] = (hi >> np.uint64(16 * b)) & mask16
        if table_design == "matching":
            combos = [(0, 1), (2, 3), (4, 5), (6, 7)]  # h≤3, 4 tables
        elif table_design == "triples":
            # disjoint cliques 3/3/2: any 4 clean blocks put 2 in one
            # clique → h≤4 guaranteed with 7 tables (minimal: Turán)
            combos = [
                (0, 1), (0, 2), (1, 2),
                (3, 4), (3, 5), (4, 5),
                (6, 7),
            ]
        elif table_design == "cliques":
            # two disjoint K4s: any 3 clean blocks put 2 in one clique
            # (pigeonhole) whose pair-table both docs share → h≤5
            # guaranteed with 12 tables (provably minimal: the
            # complement must be triangle-free, Turán caps it at 16 of
            # the 28 edges)
            combos = [
                (i, j) for g in (range(4), range(4, 8))
                for i in g for j in g if i < j
            ]
        else:
            combos = list(combinations(range(8), 2))  # h≤6, 28 tables
        bks = [
            (np.int64(t) << 56)
            | ((blocks[i] << np.uint64(16)) | blocks[j]).astype(np.int64)
            for t, (i, j) in enumerate(combos)
        ]
        reps = len(combos)
        return pa.table(
            {
                "bk": pa.array(np.concatenate(bks), pa.int64()),
                id_col: pa.array(np.tile(ids, reps)),
                "sh_lo": pa.array(np.tile(lo, reps)),
                "sh_hi": pa.array(np.tile(hi, reps)),
            }
        )

    band_rows = _prune_singleton_buckets(
        ds.map_batches(add_simhash, batch_format="pyarrow"),
        key_col="bk",
        spill_dir=band_spill_dir,
        out_spill_dir=exchange_spill_dir,
    )

    pair_schema = pa.schema(
        [
            ("pk", pa.int64()),
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("hamming", pa.int64()),
        ]
    )

    def verify_bucket(t: pa.Table) -> pa.Table:
        empty = pair_schema.empty_table()
        if t.num_rows == 0 or "bk" not in t.column_names:
            return empty
        bk = t["bk"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        shs = [
            t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            for c in sig_cols
        ]
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        shs = [s[order] for s in shs]
        keep = np.concatenate(
            ([True], (bk[1:] != bk[:-1]) | (ids[1:] != ids[:-1]))
        )
        bk, ids = bk[keep], ids[keep]
        shs = [s[keep] for s in shs]
        new = np.concatenate(([True], bk[1:] != bk[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [bk.shape[0]])))
        pos = np.arange(bk.shape[0]) - np.repeat(starts, sizes)
        gsz = np.repeat(sizes, sizes)
        cnt = gsz - 1 - pos  # upper-triangle expansion per row
        cum = np.cumsum(cnt)
        total = int(cum[-1]) if cum.size else 0
        if total == 0:
            return empty
        outs = []
        # sliced expansion: a giant bucket emits its pairs in ~8M-pair
        # slices so candidate memory stays bounded regardless of
        # bucket size (only pairs that PASS the hamming check persist)
        slice_pairs = 8_000_000
        row_bounds = np.searchsorted(
            cum, np.arange(slice_pairs, total + slice_pairs, slice_pairs)
        )
        row_bounds = np.unique(
            np.concatenate(
                ([0], np.minimum(row_bounds + 1, cnt.shape[0]))
            )
        )
        base = np.concatenate(([0], cum))
        for s0, s1 in zip(row_bounds[:-1], row_bounds[1:]):
            c = cnt[s0:s1]
            tot = int(c.sum())
            if tot == 0:
                continue
            left = np.repeat(np.arange(s0, s1), c)
            ccum = base[s0:s1] + c - base[s0]
            offset = np.arange(tot) - np.repeat(ccum - c, c) + 1
            right = left + offset
            ham = _popcount64(shs[0][left] ^ shs[0][right])
            for s in shs[1:]:
                ham = ham + _popcount64(s[left] ^ s[right])
            m = ham <= max_hamming
            if m.any():
                outs.append((ids[left[m]], ids[right[m]], ham[m]))
        if not outs:
            return empty
        ia = np.concatenate([o[0] for o in outs]).astype(np.int64)
        ib = np.concatenate([o[1] for o in outs]).astype(np.int64)
        hm = np.concatenate([o[2] for o in outs]).astype(np.int64)
        pk = (
            ia.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ ib.astype(np.uint64)
        ).view(np.int64)
        return pa.table(
            {
                "pk": pa.array(pk),
                "id_a": pa.array(ia),
                "id_b": pa.array(ib),
                "hamming": pa.array(hm),
            }
        )

    if exchange_spill_dir is not None:
        cand = exchange_reduce_spill(
            band_rows, "bk", verify_bucket, exchange_spill_dir,
            phases=exchange_phases,
        )
    else:
        cand = exchange_reduce(band_rows, "bk", verify_bucket)
    del band_rows

    def distinct_pairs(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return empty
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        h = t["hamming"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, h = a[order], b[order], h[order]
        keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "hamming": pa.array(h[keep], pa.int64()),
            }
        )

    out = exchange_reduce(cand, "pk", distinct_pairs)
    if exchange_spill_dir is not None:
        # force the pair exchange, then free the dead landings (the
        # pruned rows and the verify exchange's landed buckets) — same
        # disk-lifecycle contract as the MinHash chain
        import glob as _glob
        import shutil as _shutil

        out = out.materialize()
        _shutil.rmtree(
            os.path.join(exchange_spill_dir, "_sod_pruned"),
            ignore_errors=True,
        )
        for d in _glob.glob(
            os.path.join(exchange_spill_dir, "_sod_exchange_p*")
        ):
            _shutil.rmtree(d, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, within candidate buckets)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    bucket_col: str | None = None,
):
    """Exact n-gram Jaccard similarity for pairs.

    ``bucket_col=None`` (global) routes straight to
    :func:`jaccard_all_pairs` — the three-exchange scale shape, no
    per-group Python (r4; same tokenization, hashed shingles). With a
    ``bucket_col`` (e.g. lang or an LSH band) the quadratic verify runs
    per bucket via ``map_groups`` — a small-bucket contract by
    definition (the caller chose buckets to keep the verify local)."""
    if bucket_col is None:
        return jaccard_all_pairs(ds, text_col, id_col, n=n, threshold=threshold)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        grams = []
        for t in g[text_col]:
            toks = t.split() if isinstance(t, str) else []
            grams.append(
                {tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}
            )
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                gi, gj = grams[i], grams[j]
                if not gi and not gj:
                    continue
                jac = len(gi & gj) / len(gi | gj)
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(jac)
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "id_a": np.asarray(out_a, dtype=np.int64),
                "id_b": np.asarray(out_b, dtype=np.int64),
                "jaccard": np.asarray(out_j, dtype=np.float64),
            }
        )

    return ds.groupby(bucket_col).map_groups(
        per_bucket, batch_format="pandas"
    )


def jaccard_all_pairs(
    ds,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_buckets: int | None = None,
    broadcast_limit: int | None = None,
    max_shingle_df: int | None = None,
):
    """Globally EXACT n-gram Jaccard pairs (id_a < id_b, jaccard >=
    threshold) — the exact ground truth the MinHash-LSH chain
    approximates. `tests/test_dedup.py` pins the LSH path's recall
    against this op, and the SQL twin (JACCARD_EXACT_SQL in
    pipelines/queries.py) checks it value-for-value against DuckDB.

    Shape (three slim raw-task exchanges; text never leaves the scan):
      1. one scan → distinct (shingle_hash, doc_id) rows per doc —
         same whitespace tokenization as the LSH chain, but docs with
         fewer than ``n`` tokens have NO shingles and never pair
         (clean set-Jaccard, which is what SQL can express; the LSH
         verify's first-token fallback for short docs is the one
         documented divergence),
      2. hash exchange on shingle → vectorized upper-triangle pair
         expansion per shingle group (no per-group Python callable),
      3. hash exchange on the pair key → run-length co-occurrence
         counts; |A∪B| = n_a + n_b − inter via a broadcast sizes
         lookup (≤ ``broadcast_limit`` docs) or two bucketed
         equi-joins above it.

    SCALE CAVEAT (inherent to exactness): a shingle shared by g docs
    emits g(g−1)/2 pair rows, so boilerplate-heavy corpora blow up
    step 2 quadratically — which is exactly why the LSH chain exists.
    ``max_shingle_df`` optionally drops shingles with document
    frequency above a cap (stopword-like n-grams); that UNDERCOUNTS
    intersections, so leave it None for exact semantics.
    """
    from .exchange import exchange_reduce

    def to_shingle_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        tids = _token_ids(texts)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        shs, docs = [], []
        for i, tid in enumerate(tids):
            if tid.shape[0] < n:
                continue  # no shingles — mirrors the SQL twin exactly
            s = _shingle_hashes(tid, n)  # already np.unique'd
            shs.append(s)
            docs.append(np.full(s.shape[0], ids[i], dtype=np.int64))
        if not shs:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "sh": pa.array(np.concatenate(shs).view(np.int64), pa.int64()),
                "doc": pa.array(np.concatenate(docs), pa.int64()),
            }
        )

    slim = ds.map_batches(to_shingle_rows, batch_format="pyarrow").materialize()

    def emit_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pk": pa.array([], pa.int64()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "sh" not in t.column_names:
            return empty
        sh = t["sh"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sh))
        sh, doc = sh[order], doc[order]
        new = np.concatenate(([True], sh[1:] != sh[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [sh.shape[0]])))
        # per row: how many later rows of its shingle group it pairs with
        pos = np.arange(sh.shape[0]) - np.repeat(starts, sizes)
        gsz = np.repeat(sizes, sizes)
        cnt = gsz - 1 - pos
        if max_shingle_df is not None:
            cnt[gsz > max_shingle_df] = 0
        total = int(cnt.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(sh.shape[0]), cnt)
        cum = np.cumsum(cnt)
        offset = np.arange(total) - np.repeat(cum - cnt, cnt) + 1
        right = left + offset
        # doc ascending within a shingle group and unique per (doc, sh)
        # → left index < right index implies id_a < id_b
        ia, ib = doc[left], doc[right]
        pk = (
            ia.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ ib.astype(np.uint64)
        ).view(np.int64)  # routing key only; reduce compares real ids
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
            }
        )

    pair_rows = exchange_reduce(slim, "sh", emit_pairs, num_buckets)

    def count_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return empty
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        starts = np.flatnonzero(new)
        cnts = np.diff(np.concatenate((starts, [a.shape[0]])))
        return pa.table(
            {
                "id_a": pa.array(a[starts], pa.int64()),
                "id_b": pa.array(b[starts], pa.int64()),
                "inter": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    inter = exchange_reduce(pair_rows, "pk", count_pairs, num_buckets)

    def count_docs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc": pa.array([], pa.int64()),
                "n_sh": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "doc" not in t.column_names:
            return empty
        d = np.sort(t["doc"].to_numpy(zero_copy_only=False))
        new = np.concatenate(([True], d[1:] != d[:-1]))
        starts = np.flatnonzero(new)
        cnts = np.diff(np.concatenate((starts, [d.shape[0]])))
        return pa.table(
            {
                "doc": pa.array(d[starts], pa.int64()),
                "n_sh": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    sizes = exchange_reduce(slim, "doc", count_docs, num_buckets)
    thr = float(threshold)

    if broadcast_limit is None:
        broadcast_limit = broadcast_rows_budget()
    if sizes.count() <= broadcast_limit:
        parts = [p for p in ray.get(arrow_block_refs(sizes)) if p.num_rows]
        if not parts:
            return inter.map_batches(
                lambda t: t.slice(0, 0).append_column(
                    "jaccard", pa.array([], pa.float64())
                ).drop_columns(["inter"]),
                batch_format="pyarrow",
            )
        st = pa.concat_tables(parts)
        dn = st["doc"].to_numpy(zero_copy_only=False)
        sn = st["n_sh"].to_numpy(zero_copy_only=False)
        order = np.argsort(dn)
        size_ref = ray.put((dn[order], sn[order]))

        def finish_bcast(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
            if t.num_rows == 0 or "id_a" not in t.column_names:
                return empty
            docs_sorted, ns = ray.get(size_ref)
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            c = t["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
            na = ns[np.searchsorted(docs_sorted, a)]
            nb = ns[np.searchsorted(docs_sorted, b)]
            jac = c / (na + nb - c)
            keep = jac >= thr
            if not keep.any():
                return empty
            return pa.table(
                {
                    "id_a": pa.array(a[keep], pa.int64()),
                    "id_b": pa.array(b[keep], pa.int64()),
                    "jaccard": pa.array(jac[keep], pa.float64()),
                }
            )

        return inter.map_batches(finish_bcast, batch_format="pyarrow")

    # sizes too large to broadcast: two bucketed hash equi-joins
    from .joins import bucketed_equi_join

    sa = sizes.map_batches(
        lambda t: pa.table({"id_a": t["doc"], "n_a": t["n_sh"]}),
        batch_format="pyarrow",
    )
    sb = sizes.map_batches(
        lambda t: pa.table({"id_b": t["doc"], "n_b": t["n_sh"]}),
        batch_format="pyarrow",
    )
    joined = bucketed_equi_join(
        bucketed_equi_join(inter, sa, key="id_a"), sb, key="id_b"
    )

    def finish_joined(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return empty
        c = t["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["n_a"].to_numpy(zero_copy_only=False)
        nb = t["n_b"].to_numpy(zero_copy_only=False)
        jac = c / (na + nb - c)
        keep = jac >= thr
        return pa.table(
            {
                "id_a": t["id_a"].cast(pa.int64()).filter(pa.array(keep)),
                "id_b": t["id_b"].cast(pa.int64()).filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return joined.map_batches(finish_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_lsh_params(
    n_docs: int,
    threshold: float,
    n_planes: int | None = None,
    n_bands: int | None = None,
    target_recall: float = 0.95,
) -> tuple[int, int]:
    """Hyperplane-LSH tuning. The plane count MUST grow with corpus
    size: random hyperplanes cut an isotropic corpus into at most
    2^n_planes cells, so a fixed 12-plane table over 1M docs leaves
    ~244 docs per bucket and candidate emission goes quadratic
    (measured: 71 GB of spilled candidate pairs at 1M×64d before this
    guard existed). Rule: n_planes ≈ log2(n_docs) + 8 keeps expected
    RANDOM-pair collisions per band near n_docs/256 under the uniform
    model — and hyperplane cells over gaussian corpora are SKEWED
    (unequal solid angles), so the real collision count runs well
    above the uniform estimate: the earlier log2+4 rule (n_docs/16
    uniform) measured 41.8 s at 10M×64d vs 25.3 s for log2+8 with
    IDENTICAL output pairs — the noise-candidate cut dwarfs the ~20%
    extra band rows from the recall-compensating bands. n_bands then
    solves the target recall given the per-band hit rate
    p_band = (1 − θ/π)^n_planes (capped at 64 — a low threshold with
    many planes can make the target unreachable; callers wanting
    exhaustive low-threshold pairs should use
    ``similarity.cosine_all_pairs`` instead)."""
    if n_planes is None:
        n_planes = max(12, int(np.ceil(np.log2(max(n_docs, 2)))) + 8)
    if n_bands is None:
        theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
        p_band = (1.0 - theta / np.pi) ** n_planes
        if p_band >= 1.0:
            n_bands = 1
        else:
            n_bands = int(
                np.clip(
                    np.ceil(np.log(1 - target_recall) / np.log(1 - p_band)),
                    1,
                    64,
                )
            )
    return n_planes, n_bands


def embedding_neardup(
    ds,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int | None = None,
    seed: int = 99,
    dim: int | None = None,
    n_bands: int | None = None,
    small_corpus_rows: int = 100_000,
    max_bucket_size: int = 256,
    pair_emission: str = "pairs",
    vec_spill_dir: str | None = None,
    band_spill_dir: str | None = None,
    exchange_spill_dir: str | None = None,
    exchange_phases: int = 1,
):
    """Near-dup by cosine similarity over an embedding column:
    ``n_bands`` independent random-hyperplane LSH tables (planes
    seeded per band, deterministic) → exact cosine verify → pair
    dedupe.

    ``n_planes``/``n_bands`` default to corpus-size- and
    threshold-aware auto-tuning (``embedding_lsh_params``): planes
    scale with log2(corpus) so buckets stay small and candidate
    volume linear; bands solve a 0.95 target recall. A SINGLE
    12-plane table catches a cos=0.95 pair with probability
    (1 − θ/π)^12 ≈ 0.28 — banding is what buys recall.
    Exact ground truth / recall measurement:
    ``stages.similarity.cosine_all_pairs``; verified pairs are always a
    subset of it (precision 1.0) because the verify recomputes the true
    cosine.

    One code path for every corpus size (the former in-row small path
    was removed in r4 so small and large share the exchange-verify
    kernel): one scan lands (id, vn) rows (4·d B/doc, once, NOT per
    band), only slim (band, bucket, id) rows cross the banding shuffle,
    singleton buckets are pruned, the shared ``_candidate_pairs``
    exchanges emit distinct candidate pairs (``pair_emission``/
    ``max_bucket_size`` as in ``minhash_lsh_dedup``), and verify is the
    distributed payload join with a dot-product scorer.
    ``small_corpus_rows`` is kept for API compatibility and ignored.
    """
    if pair_emission not in ("pairs", "star"):
        raise ValueError(
            f"pair_emission must be 'pairs' or 'star', got {pair_emission!r}"
        )
    n_docs = ds.count()
    n_planes, n_bands = embedding_lsh_params(
        n_docs, threshold, n_planes, n_bands
    )
    return _embedding_large(
        ds, vec_col, id_col, threshold, n_planes, seed, dim, n_bands,
        max_bucket_size, pair_emission, vec_spill_dir, band_spill_dir,
        exchange_spill_dir, exchange_phases,
    )


def _embedding_large(
    ds, vec_col, id_col, threshold, n_planes, seed, dim, n_bands,
    max_bucket_size, pair_emission, vec_spill_dir=None,
    band_spill_dir=None, exchange_spill_dir=None, exchange_phases=1,
):
    """Large-corpus embedding LSH (see embedding_neardup docstring):
    lands normalized float32 vectors ONCE, shuffles only slim
    (band, bucket, id) rows, reuses the MinHash chain's candidate
    exchanges and distributed payload-join verify.

    ``vec_spill_dir`` is the ``sig_spill_dir`` idea for vectors: the
    normalized table (4·d B/doc — 7.7 GB at 30M×64d, incompressible)
    is landed as parquet and STREAMED by both consumers instead of
    pinned in the object store, where it competes with the banding
    and verify shuffles for spill budget (a 30M×64d run without it
    died in raylet-spill ENOSPC on this VM's ~80 GB disk)."""
    from .similarity import _normalize, _to_matrix

    def to_vec_rows(batch: pa.Table) -> pa.Table:
        V = _to_matrix(batch[vec_col], np.float64)
        Vn = _normalize(V).astype(np.float32)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "vn": pa.array([row.tobytes() for row in Vn], pa.binary()),
            }
        )

    # one scan; banding and the verify join both consume the landed rows
    vec_rows = ds.map_batches(to_vec_rows, batch_format="pyarrow")
    if vec_spill_dir is not None:
        vec_rows = _land_parquet(vec_rows, vec_spill_dir, "_sod_vecs")
    else:
        vec_rows = vec_rows.materialize()

    state: dict = {"planes": None}
    empty_bands = pa.table(
        {
            "band": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
        }
    )

    def vn_to_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or "vn" not in batch.column_names:
            return empty_bands
        Vn = (
            np.frombuffer(b"".join(batch["vn"].to_pylist()), dtype=np.float32)
            .reshape(n, -1)
            .astype(np.float64)
        )
        if state["planes"] is None:
            d = dim or Vn.shape[1]
            state["planes"] = np.random.default_rng(seed).normal(
                size=(d, n_planes * n_bands)
            )
        proj = Vn @ state["planes"]
        bits = (proj > 0).reshape(n, n_bands, n_planes)
        pows = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))[::-1]
        bucket = (bits.astype(np.uint64) * pows).sum(axis=2)  # (n, n_bands)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int32), n)),
                "band_hash": pa.array(bucket.T.reshape(-1).view(np.int64)),
                id_col: pa.array(np.tile(ids, n_bands)),
            }
        )

    band_rows = _prune_singleton_buckets(
        vec_rows.map_batches(vn_to_bands, batch_format="pyarrow"),
        spill_dir=band_spill_dir,
        out_spill_dir=exchange_spill_dir,
    )
    pairs = _candidate_pairs(
        band_rows, id_col, max_bucket_size, pair_emission,
        exchange_spill_dir, exchange_phases,
    )

    def cos_score(col_a, col_b) -> np.ndarray:
        n = len(col_a)
        A = (
            np.frombuffer(b"".join(col_a.to_pylist()), dtype=np.float32)
            .reshape(n, -1)
            .astype(np.float64)
        )
        B = (
            np.frombuffer(b"".join(col_b.to_pylist()), dtype=np.float32)
            .reshape(n, -1)
            .astype(np.float64)
        )
        return np.einsum("ij,ij->i", A, B)

    def _free_vecs():
        if vec_spill_dir is not None:
            import shutil

            shutil.rmtree(
                os.path.join(vec_spill_dir, "_sod_vecs"),
                ignore_errors=True,
            )

    return _verify_pairs_distributed(
        pairs,
        vec_rows,
        id_col,
        threshold,
        payload_col="vn",
        out_col="cosine",
        scorer=cos_score,
        spill_dir=exchange_spill_dir,
        after_sides_landed=_free_vecs if exchange_spill_dir else None,
    )


# ---------------------------------------------------------------------------
# Connected components (cluster ids from pairs)
# ---------------------------------------------------------------------------


def connected_components(pairs_df: pd.DataFrame, id_a="id_a", id_b="id_b") -> dict:
    """Union-find over a SMALL pair list on the driver (test/driver
    convenience). For web-scale pair sets use
    ``connected_components_distributed`` — real corpora have many
    mid-size clusters and the pair list does not fit one process."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df[id_a], pairs_df[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in set(pairs_df[id_a]) | set(pairs_df[id_b])}


def connected_components_distributed(
    pairs_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 30,
    driver_finish_edges: int = 5_000_000,
):
    """Distributed connected components over a pair Dataset — thin
    wrapper over ``sod_ray.stages.cc.connected_components_bucketed``
    (contraction levels on explicit hash-bucket exchanges + a bounded
    driver union-find finish; see that module for the algorithm and
    its partitioning assumptions). Returns a Dataset of (node, label)
    with label = min node id of the component — the same contract as
    the driver ``connected_components`` oracle."""
    from .cc import connected_components_bucketed

    return connected_components_bucketed(
        pairs_ds,
        id_a=id_a,
        id_b=id_b,
        max_levels=max_rounds,
        driver_finish_edges=driver_finish_edges,
    )


# ---------------------------------------------------------------------------
# Line-level exact dedup (C4-style)
# ---------------------------------------------------------------------------


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    num_buckets: int | None = None,
):
    """C4-style global line-level dedup (Raffel et al. 2020): every
    distinct non-empty line is kept only at its FIRST occurrence ordered
    by (doc id, line position); documents are reassembled from their
    kept lines, preserving line order; docs whose every line lost
    vanish. EMPTY lines are structural (every ``\\n\\n`` paragraph
    separator splits to one) and are exempt — they pass through to
    reassembly unconditionally, so corpus-wide paragraph structure
    survives.

    Scale shape: two raw-task hash exchanges
    (``stages.exchange.exchange_reduce``), no join, no per-group Python.
    The first exchange buckets by ``hash64(line)`` — an 8-byte routing
    key instead of multi-KB line text as a sort key — and selects
    winners with one vectorized sort + shifted-compare per bucket (line
    text is compared only where the 64-bit hashes collide, so hash
    collisions cannot merge distinct lines). The second exchange buckets
    by doc id and reassembles every doc in the bucket with ONE Arrow
    ``binary_join`` over a list array built from numpy offsets. The
    line text crosses each exchange exactly once (it must: it is the
    output). Buckets must fit a worker's heap — size ``num_buckets``
    (default max(8, CPUs)) to the corpus."""
    from .exchange import exchange_reduce

    def explode(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col].combine_chunks(), "")
        lines = pc.split_pattern(txt, sep)
        flat = pc.list_flatten(lines)
        n_per = pc.list_value_length(lines).to_numpy().astype(np.int64)
        rid = np.repeat(t[id_col].to_numpy(zero_copy_only=False), n_per)
        starts = np.repeat(np.cumsum(n_per) - n_per, n_per)
        line_no = np.arange(len(flat), dtype=np.int64) - starts + 1
        lh = hash64(flat).view(np.int64)
        return pa.table(
            {
                "line": flat,
                id_col: pa.array(rid, pa.int64()),
                "line_no": pa.array(line_no, pa.int64()),
                "__lh": pa.array(lh, pa.int64()),
            }
        )

    lines = ds.map_batches(explode, batch_format="pyarrow")

    def winner_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "line": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "line_no": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas()
        df.sort_values(
            ["__lh", "line", id_col, "line_no"], kind="stable", inplace=True
        )
        lh = df["__lh"].to_numpy()
        ln = df["line"].to_numpy()
        first = np.empty(len(df), dtype=bool)
        first[0] = True
        first[1:] = lh[1:] != lh[:-1]
        # hash-equal neighbours: confirm with a string compare (exact)
        same = np.flatnonzero(~first)
        if same.shape[0]:
            first[same] = ln[same] != ln[same - 1]
        keep = first | (ln == "")  # empty lines always pass through
        out = df.loc[keep, ["line", id_col, "line_no"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    kept = exchange_reduce(lines, "__lh", winner_bucket, num_buckets)

    def assemble_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "text_deduped": pa.array([], pa.string()),
                }
            )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lno = t["line_no"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lno, ids))
        ids_s = ids[order]
        col = t["line"]
        arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        lines_s = arr.take(pa.array(order))
        bnd = np.flatnonzero(
            np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        )
        offsets = np.concatenate((bnd, [ids_s.shape[0]])).astype(np.int64)
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), lines_s
        )
        return pa.table(
            {
                id_col: pa.array(ids_s[bnd], pa.int64()),
                "text_deduped": pc.binary_join(la, sep),
            }
        )

    return exchange_reduce(kept, id_col, assemble_bucket, num_buckets)


# ---------------------------------------------------------------------------
# End-to-end near-dup corpus dedup
# ---------------------------------------------------------------------------


def neardup_drop_ids(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    pair_emission: str = "star",
    **lsh_kwargs,
):
    """Near-dup DECISION: the slim Dataset of doc ids to drop (one
    ``node`` int64 column — the non-canonical members of every near-dup
    cluster), or ``None`` when the corpus has no near-dups. MinHash+LSH
    verified pairs (kept as a Dataset — a web corpus' pair list need
    not fit on the driver) → distributed connected components → drop
    every member whose label != its own id (canonical = min member id).

    Split out from :func:`neardup_dedup_corpus` so curation pipelines
    can checkpoint the decision (8 B/doc parquet) separately from the
    apply scan — a resumed export reloads the ids instead of re-running
    the LSH chain.

    Defaults to STAR pair emission (see minhash_lsh_dedup): CC only
    needs connectivity, and on a heavy-family corpus (400k docs, ~60
    member one-edit families) star measured 48 s vs 535 s for
    all-pairs with byte-identical drop sets. Pass
    ``pair_emission="pairs"`` for exhaustive pair verification when
    families are marginal/chain-shaped."""
    pairs = minhash_lsh_dedup(
        ds,
        text_col,
        id_col,
        jaccard_threshold=jaccard_threshold,
        as_dataset=True,
        pair_emission=pair_emission,
        **lsh_kwargs,
    ).map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    ).materialize()
    if pairs.count() == 0:  # no near-dups anywhere
        return None
    labels = connected_components_distributed(pairs)

    def non_canonical(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["label"])
        return pa.table({"node": t.filter(keep)["node"].cast(pa.int64())})

    return labels.map_batches(non_canonical, batch_format="pyarrow")


def apply_drops(
    ds,
    drop_ds,
    id_col: str = "doc_id",
    broadcast_limit: int | None = None,
    n_drop: int | None = None,
):
    """Anti-join a corpus against a slim drop-id Dataset ({"node"}).

    The drop-set is dup-member-count-sized — ~30% of docs on raw web
    crawls. Below ``broadcast_limit`` ids it broadcasts once via
    ray.put (sorted int64 + per-batch searchsorted membership); above,
    it switches to the explicit hash-bucket exchange anti-join
    (both-sides-large, value-compared). ``n_drop`` skips the count
    pass when the caller already knows it."""
    from .constraints import bucketed_anti_join

    if drop_ds is None:
        return ds
    if n_drop is None:
        n_drop = drop_ds.count()
    if n_drop == 0:
        return ds
    if broadcast_limit is None:
        broadcast_limit = broadcast_rows_budget()
    if n_drop <= broadcast_limit:
        drop_ids = np.sort(
            np.concatenate(
                [
                    b["node"].to_numpy()
                    for b in drop_ds.iter_batches(batch_format="pyarrow")
                ]
            )
        )
        ref = ray.put(drop_ids)

        def keep_batch(t: pa.Table) -> pa.Table:
            d = ray.get(ref)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(d, ids)
            member = (pos < d.shape[0]) & (d[np.minimum(pos, d.shape[0] - 1)] == ids)
            return t.filter(pa.array(~member))

        return ds.map_batches(keep_batch, batch_format="pyarrow")
    return bucketed_anti_join(ds, drop_ds, fk=id_col, pk="node")


def neardup_dedup_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    broadcast_limit: int | None = None,
    **lsh_kwargs,
):
    """The LLM-training-data primitive: near-dup dedup of a whole
    corpus — :func:`neardup_drop_ids` (decision) composed with
    :func:`apply_drops` (anti-join apply). Returns the deduped corpus
    Dataset with all original columns."""
    drop = neardup_drop_ids(
        ds, text_col, id_col, jaccard_threshold=jaccard_threshold, **lsh_kwargs
    )
    return apply_drops(ds, drop, id_col, broadcast_limit=broadcast_limit)


# ---------------------------------------------------------------------------
# Cross-batch near-dup: an accumulated MinHash signature index
# ---------------------------------------------------------------------------
#
# The streaming sibling of minhash_lsh_dedup for the incremental
# landing-zone loop: previous batches' signatures persist as parquet
# shards (the same durable-landing idea as sig_spill_dir), and each
# new ARRIVAL BATCH probes them before curation. Scale contract:
# arrival batches are incremental (they fit one node's memory — that
# is what an arrival batch IS); the accumulated INDEX does not and is
# only ever STREAMED (two column-pruned scans per batch, no shuffle).

_BK_MIX = np.uint64(0x9E3779B97F4A7C15)


def _fold_bk(bh: np.ndarray) -> np.ndarray:
    """(n, bands) band hashes → (n*bands,) int64 keys with the band
    index folded in (a cross-band collision only costs a candidate the
    verify rejects, never a wrong drop)."""
    bands = bh.shape[1]
    mix = np.arange(bands, dtype=np.uint64) * _BK_MIX
    return (bh ^ mix[None, :]).reshape(-1).view(np.int64)


def collect_minhash_sigs(
    ds,
    text_col: str,
    id_col: str,
    n_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 1337,
):
    """(ids int64 (n,), sigs uint64 (n, n_perm)) of one arrival batch —
    signatures computed distributed (map_batches), gathered to the
    caller (batch-scale by the contract above)."""

    def sig_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "sig": pa.array([row.tobytes() for row in sig], pa.binary()),
            }
        )

    out = ds.map_batches(sig_rows, batch_format="pyarrow").take_all()
    if not out:
        return np.empty(0, np.int64), np.empty((0, n_perm), np.uint64)
    ids = np.asarray([r[id_col] for r in out], dtype=np.int64)
    sigs = np.frombuffer(
        b"".join(r["sig"] for r in out), dtype=np.uint64
    ).reshape(-1, n_perm)
    return ids, sigs


def _index_meta_guard(
    index_dir: str,
    n_perm: int,
    bands: int,
    shingle_k: int | None,
    seed: int | None,
    write: bool,
) -> None:
    """Pin the LSH params an index was built with. First append writes
    ``_meta.json``; every later append/probe asserts the caller's
    params match — a changed ``n_perm`` would otherwise reshape the
    persisted signatures silently and produce garbage agreement scores
    that can wrongly DROP new documents (silent data loss)."""
    import json

    meta_path = os.path.join(index_dir, "_meta.json")
    mine = {"n_perm": int(n_perm), "bands": int(bands),
            "shingle_k": shingle_k, "seed": seed}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            rec = json.load(f)
        for k, v in mine.items():
            if v is not None and rec.get(k) is not None and rec[k] != v:
                raise ValueError(
                    f"minhash index {index_dir} was built with {k}="
                    f"{rec[k]}; caller passed {v}. Refusing to mix "
                    "signature parameters within one index — rebuild "
                    "the index or match its recorded params."
                )
    elif write:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(mine, f)
        os.replace(tmp, meta_path)


def minhash_index_append(
    index_dir: str,
    rid: str,
    ids: np.ndarray,
    sigs: np.ndarray,
    bands: int = 16,
    shingle_k: int | None = None,
    seed: int | None = None,
) -> None:
    """Append one batch's signatures to the accumulated index —
    ``<rid>.sig.parquet`` (id, sig) and ``<rid>.band.parquet``
    (bk, id) — idempotent tmp+rename, mirroring the exact-dedup hash
    index's crash contract (re-append after a retry overwrites with
    identical bytes). The first append records the LSH params in
    ``_meta.json``; later appends fail loudly on mismatch."""
    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    _index_meta_guard(
        index_dir, sigs.shape[1] if sigs.ndim == 2 else 0, bands,
        shingle_k, seed, write=True,
    )
    sig_t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "sig": pa.array([row.tobytes() for row in sigs], pa.binary()),
        }
    )
    bk = _fold_bk(_band_hashes(sigs, bands))
    band_t = pa.table(
        {
            "bk": pa.array(bk, pa.int64()),
            "id": pa.array(np.repeat(ids, bands)),
        }
    )
    for name, t in ((f"{rid}.sig.parquet", sig_t), (f"{rid}.band.parquet", band_t)):
        tmp = os.path.join(index_dir, f".{name}.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(index_dir, name))


def minhash_index_probe(
    index_dir: str,
    ids: np.ndarray,
    sigs: np.ndarray,
    threshold: float = 0.7,
    bands: int = 16,
    exclude_rid: str | None = None,
    shingle_k: int | None = None,
    seed: int | None = None,
) -> np.ndarray:
    """ids (subset of ``ids``) having a near-twin in the ACCUMULATED
    index: band-key intersection proposes candidates, signature
    agreement (the same Jaccard estimate minhash_lsh_dedup verifies
    with) >= ``threshold`` confirms. The index is streamed twice
    (band keys, then only candidate ids' sigs), both scans
    column-pruned and filtered by a broadcast batch-side array —
    nothing index-sized ever reaches the caller. ``exclude_rid`` skips
    the probing batch's own shards so a crash retry never drops its
    own documents."""
    import ray
    import ray.data as rd

    if ids.shape[0] == 0 or not os.path.isdir(index_dir):
        return np.empty(0, np.int64)
    _index_meta_guard(
        index_dir, sigs.shape[1] if sigs.ndim == 2 else 0, bands,
        shingle_k, seed, write=False,
    )

    def shards(kind: str) -> list[str]:
        return [
            os.path.join(index_dir, f)
            for f in sorted(os.listdir(index_dir))
            if f.endswith(f".{kind}.parquet")
            and (exclude_rid is None or not f.startswith(f"{exclude_rid}."))
        ]

    band_files = shards("band")
    if not band_files:
        return np.empty(0, np.int64)

    bk_new = _fold_bk(_band_hashes(sigs, bands))
    order = np.argsort(bk_new, kind="stable")
    # reshape(-1) of (n, bands) is row-major: flat index i came from
    # doc row i // bands
    bk_sorted, row_of = bk_new[order], (order // bands)
    probe_ref = ray.put(np.unique(bk_new))

    def hits(t: pa.Table) -> pa.Table:
        probe = ray.get(probe_ref)
        bk = t["bk"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(probe, bk), probe.shape[0] - 1)
        m = probe[pos] == bk
        return pa.table({"bk": t["bk"].filter(pa.array(m)),
                         "id": t["id"].filter(pa.array(m))})

    hit_rows = rd.read_parquet(band_files).map_batches(
        hits, batch_format="pyarrow"
    ).take_all()
    if not hit_rows:
        return np.empty(0, np.int64)
    hit_bk = np.asarray([r["bk"] for r in hit_rows], dtype=np.int64)
    hit_old = np.asarray([r["id"] for r in hit_rows], dtype=np.int64)

    # expand shared band keys into (new_row, old_id) candidate pairs
    lo = np.searchsorted(bk_sorted, hit_bk, side="left")
    hi = np.searchsorted(bk_sorted, hit_bk, side="right")
    counts = hi - lo
    old_rep = np.repeat(hit_old, counts)
    total = int(counts.sum())
    if total:
        # vectorized concat of [lo_i, hi_i) ranges
        starts = np.repeat(lo, counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        take = starts + offs
    else:
        take = np.empty(0, np.int64)
    new_rows = row_of[take]
    pairs = np.unique(
        np.stack([new_rows, old_rep], axis=1), axis=0
    ) if new_rows.shape[0] else np.empty((0, 2), np.int64)
    if pairs.shape[0] == 0:
        return np.empty(0, np.int64)

    # fetch ONLY the candidate old ids' signatures
    need_ref = ray.put(np.unique(pairs[:, 1]))

    def sig_hits(t: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        tid = t["id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(need, tid), need.shape[0] - 1)
        return t.filter(pa.array(need[pos] == tid))

    old_rows = rd.read_parquet(shards("sig")).map_batches(
        sig_hits, batch_format="pyarrow"
    ).take_all()
    if not old_rows:
        return np.empty(0, np.int64)
    n_perm = sigs.shape[1]
    old_ids = np.asarray([r["id"] for r in old_rows], dtype=np.int64)
    old_sigs = np.frombuffer(
        b"".join(r["sig"] for r in old_rows), dtype=np.uint64
    ).reshape(-1, n_perm)
    o_order = np.argsort(old_ids, kind="stable")
    old_ids, old_sigs = old_ids[o_order], old_sigs[o_order]

    # clamp + equality-mask: a band shard whose .sig sibling is missing
    # (partial index deletion/corruption) would otherwise index past the
    # end or score against the WRONG document's signature
    opos = np.minimum(np.searchsorted(old_ids, pairs[:, 1]),
                      old_ids.shape[0] - 1)
    valid = old_ids[opos] == pairs[:, 1]
    agree = np.full(pairs.shape[0], -1.0)
    agree[valid] = (
        sigs[pairs[:, 0][valid]] == old_sigs[opos[valid]]
    ).mean(axis=1)
    return np.unique(ids[pairs[:, 0][agree >= threshold]])


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap removal)
# ---------------------------------------------------------------------------


def benchmark_ngram_hashes(
    texts: list[str], n: int = 13, lowercase: bool = True
) -> dict[int, np.ndarray]:
    """Gram-width → sorted unique hashes of a benchmark suite — the
    probe sets for :func:`decontaminate`. Benchmark texts SHORTER than
    n tokens contribute their full token sequence as one gram at its
    own width (eval questions are often <13 words; the GPT-3 appendix
    uses min(13, doc length) the same way) — the corpus side then
    probes at every width present, so short eval docs are never
    silently skipped. Benchmarks are small (test sets, eval suites),
    so this runs on the driver and is broadcast once."""
    if lowercase:
        texts = [t.lower() if t is not None else t for t in texts]
    tids = _token_ids(texts)
    by_width: dict[int, list[np.ndarray]] = {}
    for t in tids:
        w = min(n, t.shape[0])
        if w == 0:
            continue
        by_width.setdefault(w, []).append(_shingle_hashes(t, w))
    return {
        w: np.unique(np.concatenate(gs)) for w, gs in by_width.items()
    }


def decontaminate(
    ds,
    benchmark_texts: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    lowercase: bool = True,
):
    """Training-data decontamination (the GPT-3 appendix-C hygiene op,
    public): flag every corpus document sharing ANY word-level n-gram
    with a benchmark/eval suite, so train/test overlap can be dropped
    before training. Returns a slim Dataset of (node=doc id, n_matched
    = number of distinct colliding n-grams).

    Scale shape: the benchmark's per-width n-gram hash sets are
    driver-computed (benchmarks are small) and broadcast ONCE via
    ``ray.put``; the corpus side is one ``map_batches`` scan —
    tokenize (vectorized Arrow split + one hash64 per batch),
    polynomial sliding-window gram hashes per doc at each width the
    benchmark contains (one width, n, unless the suite has shorter
    docs — at most n widths total), sorted-array membership via
    searchsorted. Nothing shuffles; output is contaminated-doc-count
    sized. 64-bit hash collisions are the false-positive bound (~1e-7
    at a 1e8-gram corpus against a 1e5-gram benchmark)."""
    import pyarrow.compute as pc

    bench = benchmark_ngram_hashes(benchmark_texts, n, lowercase)
    ref = ray.put(bench)

    def flag(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "n_matched": pa.array([], pa.int64()),
            }
        )
        if not b or t.num_rows == 0:
            return empty
        txt = t[text_col].combine_chunks()
        if lowercase:
            txt = pc.utf8_lower(txt)
        tids = _token_ids(txt.to_pylist())
        hits = np.zeros(len(tids), dtype=np.int64)
        for w, bw in b.items():
            grams = [
                _shingle_hashes(x, w) if x.shape[0] >= w else
                np.empty(0, dtype=np.uint64)
                for x in tids
            ]
            lengths = np.array([g.shape[0] for g in grams], dtype=np.int64)
            if lengths.sum() == 0:
                continue
            allg = np.concatenate([g for g in grams if g.shape[0]])
            doc_idx = np.repeat(np.arange(len(grams)), lengths)
            pos = np.searchsorted(bw, allg)
            member = (pos < bw.shape[0]) & (
                bw[np.minimum(pos, bw.shape[0] - 1)] == allg
            )
            hits += np.bincount(doc_idx[member], minlength=len(grams))
        bad = hits > 0
        if not bad.any():
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)[bad]
        return pa.table(
            {
                "node": pa.array(ids, pa.int64()),
                "n_matched": pa.array(hits[bad], pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Winnowing overlap (containment) dedup
# ---------------------------------------------------------------------------


def winnow_overlap_pairs_ds(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
    min_shared: int = 40,
    max_df: int = 256,
    num_buckets: int | None = None,
    fp_sample: int = 1,
    exchange_spill_dir: str | None = None,
    exchange_phases: int = 1,
):
    """Distributed winnowing-overlap candidate pairs: docs sharing >=
    ``min_shared`` distinct selected fingerprints (MOSS / SIGMOD'03
    semantics — any shared substring of >= w+k-1 chars shares a
    fingerprint, so this catches CONTAINMENT overlap that set-Jaccard
    misses: doc B embedded inside a larger doc A barely moves Jaccard
    but shares nearly all of B's fingerprints). The distributed closure
    of the gate-scale `winnow_overlap_pairs` oracle query.

    Shape = the `jaccard_all_pairs` three-exchange composition with
    fingerprints instead of shingles: one scan -> distinct (fp, doc)
    rows (vectorized per-doc packed-uint64 winnowing,
    functions/text.winnow_fingerprints_fast) -> fp exchange with
    vectorized upper-triangle pair expansion -> pair-key exchange with
    run-length counts, thresholded at ``min_shared``.

    ``max_df`` (REQUIRED here, unlike jaccard's optional cap) drops
    fingerprints shared by more than that many docs before pairing:
    template boilerplate makes nearly every doc pair share SOME
    fingerprint (measured: family median 111 shared vs random median 6
    on the synthetic corpus), so ubiquitous fps carry no containment
    signal while costing g(g-1)/2 pair rows each — the MOSS paper
    drops them for the same reason. Counts are therefore "shared
    NON-UBIQUITOUS fps", and ``min_shared`` should sit well above the
    template background (see tools/winnow_bench.py separation data).

    GRAM-SIZE CONTRACT AT CORPUS SCALE: with the default ``k=5`` char
    grams, natural-language gram frequency is Zipfian — at 10^6+ docs
    even content grams exceed any df cap and the cap deletes ALL
    signal (measured: zero pairs at 1M docs, k=5, max_df=256). Pass
    ``k=8`` (the uint64 injective-pack limit) and ``w=16`` for corpus-
    scale mining: 8-char grams mostly span token boundaries, so their
    df tracks token-PAIR frequency, which stays under real caps; the
    winnowing guarantee weakens to shared-substring >= w+k-1 = 23
    chars, still far below a contained span. k=5/w=8 remains the
    gate-scale oracle-family config (md5 twin parity).

    SCALE CAVEAT (inherent, like `jaccard_all_pairs`): pair volume is
    O(Σ_fp df²), and winnow selection BIASES df high — local-minimum
    selection picks low-hash grams in EVERY doc containing them, so
    selected fps concentrate on a heavy head (measured: the exact
    k=8 pass at 1M docs emitted tens of GB of pair rows). For corpus
    scale set ``fp_sample=s`` (> 1): keeps a uniform 1/s of
    fingerprints by a second independent hash (decorrelated from the
    selection minimum), cutting pair volume ~s² per group; the shared
    count becomes an UNBIASED 1/s-scaled estimate, so ``min_shared``
    is divided by s internally (pass the same full-count threshold).
    Exact when fp_sample=1.

    Returns a Dataset of (id_a, id_b, n_shared), id_a < id_b —
    n_shared is the sampled count when fp_sample > 1.

    ``exchange_spill_dir``: the 10⁹-doc knob (same contract as the
    MinHash/SimHash chains) — the slim (fp, doc) table lands as
    parquet instead of a store materialize, and both exchanges (fp
    pairing + pk counting) run through
    :func:`exchange.exchange_reduce_spill` (bucket-partitioned
    landing, optional ``exchange_phases`` split-phase). Identical
    results (parity-tested); use when slim fp rows (~16 B × fps/doc ×
    corpus) or the O(Σ df²) pair rows rival the object store."""
    from ..functions.text import winnow_fingerprints_fast
    from .exchange import exchange_reduce, exchange_reduce_spill

    from ..state.sketches import _splitmix64

    def make_fp_rows(sample: int):
        samp_cut = np.uint64(2**64 - 1) // np.uint64(max(1, sample))

        def fp_rows(t: pa.Table) -> pa.Table:
            fps, docs = [], []
            ids = t[id_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            for i, txt in enumerate(t[text_col].to_pylist()):
                _, h = winnow_fingerprints_fast(txt, k=k, w=w)
                if h.shape[0] == 0:
                    continue
                u = np.unique(h)
                if sample > 1:
                    # second independent mix — decorrelated from the
                    # window-minimum that selected the fp in the first
                    # place (sampling on the fp value itself would
                    # re-bias toward the already-heavy low-hash head)
                    u = u[
                        _splitmix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5))
                        <= samp_cut
                    ]
                    if u.shape[0] == 0:
                        continue
                fps.append(u.view(np.int64))
                docs.append(
                    np.full(u.shape[0], ids[i], dtype=np.int64)
                )
            if not fps:
                return pa.table(
                    {
                        "fp": pa.array([], pa.int64()),
                        "doc": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "fp": pa.array(np.concatenate(fps), pa.int64()),
                    "doc": pa.array(np.concatenate(docs), pa.int64()),
                }
            )

        return fp_rows

    def make_emit_pairs(df_cap: int):
        def emit_pairs(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "pk": pa.array([], pa.int64()),
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                }
            )
            if t.num_rows == 0 or "fp" not in t.column_names:
                return empty
            fp = t["fp"].to_numpy(zero_copy_only=False)
            doc = t["doc"].to_numpy(zero_copy_only=False)
            order = np.lexsort((doc, fp))
            fp, doc = fp[order], doc[order]
            new = np.concatenate(([True], fp[1:] != fp[:-1]))
            starts = np.flatnonzero(new)
            sizes = np.diff(np.concatenate((starts, [fp.shape[0]])))
            pos = np.arange(fp.shape[0]) - np.repeat(starts, sizes)
            gsz = np.repeat(sizes, sizes)
            cnt = gsz - 1 - pos
            cnt[gsz > df_cap] = 0  # ubiquitous/template fingerprints
            total = int(cnt.sum())
            if total == 0:
                return empty
            left = np.repeat(np.arange(fp.shape[0]), cnt)
            cum = np.cumsum(cnt)
            offset = np.arange(total) - np.repeat(cum - cnt, cnt) + 1
            right = left + offset
            ia, ib = doc[left], doc[right]
            pk = (
                ia.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ ib.astype(np.uint64)
            ).view(np.int64)
            return pa.table(
                {
                    "pk": pa.array(pk, pa.int64()),
                    "id_a": pa.array(ia, pa.int64()),
                    "id_b": pa.array(ib, pa.int64()),
                }
            )

        return emit_pairs

    def make_count_pairs(min_count: int):
        def count_pairs(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
            if t.num_rows == 0 or "id_a" not in t.column_names:
                return empty
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            new = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
            )
            starts = np.flatnonzero(new)
            cnts = np.diff(np.concatenate((starts, [a.shape[0]])))
            keep = cnts >= min_count
            return pa.table(
                {
                    "id_a": pa.array(a[starts][keep], pa.int64()),
                    "id_b": pa.array(b[starts][keep], pa.int64()),
                    "n_shared": pa.array(
                        cnts[keep].astype(np.int64), pa.int64()
                    ),
                }
            )

        return count_pairs

    def chain(src_ds, sample: int, min_count: int, tag: str = ""):
        slim = src_ds.map_batches(
            make_fp_rows(sample), batch_format="pyarrow"
        )
        # the df cap must SCALE with the sample: a group whose true df
        # exceeds max_df has expected sampled df max_df/sample — an
        # unscaled cap would admit (and pay g² for) every group with
        # true df in (max_df, max_df*sample], which is exactly the
        # heavy head the cap exists to kill (measured: ENOSPC at 1M
        # docs with the unscaled cap)
        df_cap = max(2, max_df // sample)
        if exchange_spill_dir is not None:
            # distinct subdirs per exchange AND per pass (candidate vs
            # verify): exchange_reduce_spill owns+clears its subdir,
            # and a second call over the same path would clear files
            # the first call's lazy reduces still read
            slim = _land_parquet(
                slim, exchange_spill_dir, f"_sod_winnow_slim{tag}"
            )
            pair_rows = exchange_reduce_spill(
                slim, "fp", make_emit_pairs(df_cap),
                os.path.join(exchange_spill_dir, f"fp{tag}"),
                num_buckets, phases=exchange_phases,
            )
            return exchange_reduce_spill(
                pair_rows, "pk", make_count_pairs(min_count),
                os.path.join(exchange_spill_dir, f"pk{tag}"),
                num_buckets, phases=exchange_phases,
            )
        slim = slim.materialize()
        pair_rows = exchange_reduce(
            slim,
            "fp",
            make_emit_pairs(df_cap),
            num_buckets,
        )
        return exchange_reduce(
            pair_rows, "pk", make_count_pairs(min_count), num_buckets
        )

    if fp_sample <= 1:
        return chain(ds, 1, min_shared)

    # sampled candidate pass (low bar: half the scaled expectation,
    # floor 1 — high candidate recall), then an EXACT verify pass over
    # the candidate docs only: final counts/threshold are the full
    # min_shared semantics, so sampling costs candidate recall, never
    # precision. NOTE the verify pass caps max_df by df WITHIN the
    # candidate subset (<= global df), which can only keep more
    # fingerprints than the global cap — recall-safe vs the exact op.
    # ceil division: at min_shared=20, s=8 this gives 2, not 1 — a
    # floor of 1 admits every pair sharing a single sampled fp, which
    # at 10^7+ docs is millions of background candidate docs (measured:
    # 6.3M at 20M docs, over the broadcast budget); a true pair's
    # sampled count is Binomial(shared, 1/s) with mean >= min_shared/s,
    # so requiring half the mean costs ~0.5% candidacy recall
    cand_min = max(1, -(-min_shared // (2 * fp_sample)))
    cand = chain(ds, fp_sample, cand_min, tag="_cand").materialize()
    if cand.count() == 0:
        return cand

    cand_ids = np.unique(
        np.concatenate(
            [
                np.concatenate(
                    [
                        b["id_a"].to_numpy(zero_copy_only=False),
                        b["id_b"].to_numpy(zero_copy_only=False),
                    ]
                )
                for b in cand.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        )
    )
    budget = broadcast_rows_budget()
    if cand_ids.shape[0] > budget:
        raise ValueError(
            f"winnow_overlap_pairs_ds: {cand_ids.shape[0]} candidate "
            f"docs exceed the broadcast budget ({budget}); raise "
            "min_shared / fp_sample or max_df to tighten candidacy"
        )
    cref = ray.put(cand_ids)

    def member_only(t: pa.Table) -> pa.Table:
        cids = ray.get(cref)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(cids, ids), cids.shape[0] - 1)
        return t.filter(pa.array(cids[pos] == ids))

    subset = ds.map_batches(member_only, batch_format="pyarrow")
    return chain(subset, 1, min_shared, tag="_verify")


def winnow_overlap_drop_ids(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
    min_shared: int = 40,
    max_df: int = 256,
    num_buckets: int | None = None,
    fp_sample: int = 1,
    exchange_spill_dir: str | None = None,
    exchange_phases: int = 1,
):
    """Containment-dedup DECISION: the slim drop-id Dataset (one
    ``node`` int64 column — non-canonical members of every
    winnow-overlap cluster, canonical = min member id) or ``None``
    when no pair qualifies. Same contract as ``neardup_drop_ids`` /
    ``similarity.semdedup_drop_ids``, so ``apply_drops`` and the
    export funnel's checkpointed decisions compose unchanged. This is
    the dedup family that catches partial overlap / document
    containment, which the Jaccard-based MinHash chain structurally
    under-weights (|A∩B|/|A∪B| is small when |A| >> |B|)."""
    pairs = winnow_overlap_pairs_ds(
        ds, text_col, id_col, k=k, w=w,
        min_shared=min_shared, max_df=max_df, num_buckets=num_buckets,
        fp_sample=fp_sample, exchange_spill_dir=exchange_spill_dir,
        exchange_phases=exchange_phases,
    ).map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    ).materialize()
    if pairs.count() == 0:
        return None
    labels = connected_components_distributed(pairs)

    def non_canonical(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["label"])
        return pa.table({"node": t.filter(keep)["node"].cast(pa.int64())})

    return labels.map_batches(non_canonical, batch_format="pyarrow")
