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

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.sketches import hash64

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str, id_col: str, keep: str = "min"):
    """Hash-partitioned exact dedup: add md5(text), groupby hash, keep
    one row per group (lowest/highest id — deterministic)."""
    import hashlib

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        h = [
            hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
            for t in texts
        ]
        return batch.append_column("__md5", pa.array(h, pa.string()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, ascending=(keep == "min"), kind="stable")
        return g.head(1).drop(columns=["__md5"])

    return hashed.groupby("__md5").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------


def _token_ids(texts: list[str | None]) -> list[np.ndarray]:
    """Whitespace tokens → stable 64-bit ids per doc (blake2b via
    hash64 on the batch's unique tokens only — vocabulary is small
    relative to total token count, so hashing is amortized)."""
    docs_tokens = [t.split() if t else [] for t in texts]
    vocab: dict[str, int] = {}
    for toks in docs_tokens:
        for tok in toks:
            if tok not in vocab:
                vocab[tok] = 0
    if vocab:
        keys = list(vocab)
        ids = hash64(pa.array(keys, pa.string()))
        vocab = dict(zip(keys, ids))
    return [
        np.fromiter((vocab[t] for t in toks), dtype=np.uint64, count=len(toks))
        for toks in docs_tokens
    ]


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
):
    """MinHash+LSH near-dup pairs, shuffle-lean:

    1. per batch: signatures → (band, band_hash, id) rows ONLY — the
       shuffle carries 16 × 16 bytes per doc, never the 512-byte
       signature and never the text;
    2. groupby band buckets → candidate id pairs (buckets larger than
       ``max_bucket_size`` — giant dup clusters — emit a consecutive-id
       CHAIN instead of the quadratic pair set; connected components
       still merge the cluster);
    3. signatures are recomputed (deterministic seed) for CANDIDATE ids
       only and broadcast; pairs verified by signature-agreement
       Jaccard estimate on the driver (candidate set is banding-pruned,
       orders of magnitude smaller than the corpus).

    For small corpora (< ``small_corpus_rows``) the extra executions
    cost more than they save — there the signatures ride along in the
    band rows and verification happens inside the bucket groups (one
    execution total). Same results either way (tested).

    Returns a pyarrow Table (id_a, id_b, jaccard_est), id_a < id_b."""

    def to_band_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        bh = _band_hashes(sig, bands)
        n = len(texts)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands), n).astype(np.int32)),
                "band_hash": pa.array(bh.T.reshape(-1)),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    if ds.count() < small_corpus_rows:
        return _minhash_small(
            ds, text_col, id_col, n_perm, bands, shingle_k, jaccard_threshold, seed
        )

    band_rows = ds.map_batches(to_band_rows, batch_format="pyarrow")

    def candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype=ids.dtype if len(ids) else "int64"),
                                 "id_b": pd.Series(dtype=ids.dtype if len(ids) else "int64")})
        if len(ids) > max_bucket_size:
            return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})  # chain
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[iu], "id_b": ids[ju]})

    pairs_pdf = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(candidate_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["id_a", "id_b"])
    )
    if len(pairs_pdf) == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard_est": pa.array([], pa.float64()),
            }
        )

    # recompute signatures for candidate ids only (deterministic)
    cand_ids = np.unique(
        np.concatenate([pairs_pdf["id_a"].to_numpy(), pairs_pdf["id_b"].to_numpy()])
    )
    import ray

    cand_ref = ray.put(np.sort(cand_ids))

    def sig_for_candidates(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cand, ids)
        pos = np.minimum(pos, cand.size - 1)
        mask = cand[pos] == ids
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()), "sig": pa.array([], pa.list_(pa.uint64()))})
        sub_ids = ids[mask]
        texts = [t for t, m in zip(batch[text_col].to_pylist(), mask) if m]
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        return pa.table(
            {id_col: pa.array(sub_ids), "sig": pa.array(list(sig))}
        )

    sig_rows = ds.map_batches(sig_for_candidates, batch_format="pyarrow").to_pandas()
    sig_by_id = {
        i: np.asarray(s, dtype=np.uint64)
        for i, s in zip(sig_rows[id_col], sig_rows["sig"])
    }
    est = np.array(
        [
            (sig_by_id[a] == sig_by_id[b]).mean()
            if a in sig_by_id and b in sig_by_id
            else 0.0
            for a, b in zip(pairs_pdf["id_a"], pairs_pdf["id_b"])
        ]
    )
    keep = est >= jaccard_threshold
    out = pairs_pdf[keep].copy()
    out["jaccard_est"] = est[keep]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


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
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands), n).astype(np.int32)),
                "band_hash": pa.array(bh.T.reshape(-1)),
                id_col: pa.array(np.tile(ids, bands)),
                "sig": pa.array(list(np.tile(sig, (bands, 1)))),
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
        sigs = np.stack(g["sig"].to_numpy())
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
        ds.map_batches(to_band_rows, batch_format="pyarrow")
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


def simhash_signatures(texts: list[str | None], seed: int = 7) -> np.ndarray:
    """64-bit SimHash per doc from token hashes (unit weights):
    sign of the per-bit sum of ±1 votes."""
    token_ids = _token_ids(texts)
    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, tids in enumerate(token_ids):
        if tids.shape[0] == 0:
            continue
        votes = ((tids[:, None] >> bits) & np.uint64(1)).astype(np.int64)
        acc = (2 * votes - 1).sum(axis=0)
        out[i] = np.sum((acc > 0).astype(np.uint64) << bits)
    return out


def simhash_dedup(
    ds,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
):
    """SimHash near-dup: 4×16-bit band buckets (any doc pair within
    hamming distance 3 shares ≥1 exact band by pigeonhole) → verify
    hamming distance within buckets."""

    def add_simhash(batch: pa.Table) -> pa.Table:
        sh = simhash_signatures(batch[text_col].to_pylist())
        n = len(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        band_w = 64 // n_bands
        mask = np.uint64((1 << band_w) - 1)
        tables = []
        for b_i in range(n_bands):
            bh = (sh >> np.uint64(b_i * band_w)) & mask
            tables.append(
                pa.table(
                    {
                        "band": pa.array(np.full(n, b_i, dtype=np.int32)),
                        "band_hash": pa.array(bh),
                        id_col: pa.array(ids),
                        "simhash": pa.array(sh),
                    }
                )
            )
        return pa.concat_tables(tables)

    band_rows = ds.map_batches(add_simhash, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = group.sort_values(id_col, kind="stable").drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = sh[i + 1 :] ^ sh[i]
            # popcount via numpy bit tricks
            ham = np.zeros(x.shape, dtype=np.int64)
            v = x.copy()
            while v.any():
                ham += (v & np.uint64(1)).astype(np.int64)
                v >>= np.uint64(1)
            hits = np.flatnonzero(ham <= 3)
            for h in hits:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + h])
                out_h.append(int(ham[h]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        verify, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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
    """Exact n-gram Jaccard similarity for pairs, restricted to buckets
    (a provided grouping column, e.g. lang or an LSH band) so the
    quadratic verify never runs globally."""

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
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    key = bucket_col or "__no_bucket"
    src = ds
    if bucket_col is None:
        src = ds.map_batches(
            lambda t: t.append_column("__no_bucket", pa.array(np.zeros(len(t), dtype=np.int32))),
            batch_format="pyarrow",
        )
    return src.groupby(key).map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup(
    ds,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 99,
    dim: int | None = None,
):
    """Near-dup by cosine similarity over an embedding column:
    random-hyperplane LSH buckets (seeded, deterministic) → exact
    cosine verify within buckets. Pairs with cos ≥ threshold."""

    state = {"planes": None}

    def bucketize(batch: pa.Table) -> pa.Table:
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()]
        )
        if state["planes"] is None:
            d = dim or V.shape[1]
            state["planes"] = np.random.default_rng(seed).normal(size=(d, n_planes))
        proj = V @ state["planes"]
        bits = (proj > 0).astype(np.uint64)
        bucket = np.zeros(V.shape[0], dtype=np.uint64)
        for p in range(n_planes):
            bucket = (bucket << np.uint64(1)) | bits[:, p]
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Vn = V / norms
        return pa.table(
            {
                "bucket": pa.array(bucket),
                id_col: batch[id_col],
                "__vn": pa.array(list(Vn.astype(np.float32))),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = group.drop_duplicates(id_col).sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        V = np.stack(g["__vn"].to_numpy()).astype(np.float64)
        S = V @ V.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hits = S[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[hits]],
                "id_b": ids[ju[hits]],
                "cosine": S[iu, ju][hits],
            }
        )

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Connected components (cluster ids from pairs)
# ---------------------------------------------------------------------------


def connected_components(pairs_df: pd.DataFrame, id_a="id_a", id_b="id_b") -> dict:
    """Union-find over a (small, verified) pair list on the driver.
    Documented bound: the pair list is already candidate-filtered and
    threshold-verified; if it were huge the data is one giant dup
    cluster and dedup policy is trivial anyway."""
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
