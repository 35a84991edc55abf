"""Deterministic synthetic Common-Crawl-style web table (FIXTURES.md T1/T2).

Schema per BASELINE.json ``input_hint``:

    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Fully deterministic (seeded numpy Generator per shard, no wall clock).
Planted anomalies, with ground truth returned alongside, exercise every
constraint check:

- 0.1% duplicate urls                → uniqueness violations
- 0.5% NULL html, 0.2% truncated html → schema violations (extraction
  of truncated html no longer matches `text` byte-identically)
- 1% out-of-order warc_ts            → ordering repair exercised
- one contiguous 10× n_chars "peak" burst per lang per shard
                                      → windowed z-score/LOF positives
- skewed lang (Zipf-ish, en ≈ 62%)   → salting/skew handling exercised

Everything else about the rows is boring on purpose: `text` is a space
joined token sequence from a seeded per-lang vocab, and `html` is a
fixed template wrapping `text` such that
``sod_ray.functions.text.extract_text(html) == text`` byte-identically
(the per-row invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = ["en", "zh", "es", "de", "fr", "ru", "ja", "other"]
LANG_WEIGHTS = [0.62, 0.10, 0.08, 0.06, 0.05, 0.04, 0.03, 0.02]

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

HTML_PREFIX = (
    b"<html><head><title></title><style>body{margin:0}</style></head><body><p>"
)
HTML_SUFFIX = b"</p><script>var x=1;</script></body></html>"

DUP_FRAC = 0.001
NULL_HTML_FRAC = 0.005
TRUNC_HTML_FRAC = 0.002
OOO_TS_FRAC = 0.01
PEAK_LEN = 8
PEAK_MULT = 10


def _vocab(rng: np.random.Generator, lang: str, size: int = 200) -> list[str]:
    """Seeded pseudo-word vocab; latin langs get their stopwords mixed in
    so lang_id() has signal."""
    seeds = {
        "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
        "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "del"],
        "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "auf"],
        "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "du"],
        "ru": ["и", "в", "не", "на", "что", "с", "это", "как", "по", "но"],
        "zh": ["的", "是", "在", "了", "有", "和", "人", "这", "中", "大"],
        "ja": ["の", "に", "は", "を", "た", "が", "で", "て", "と", "し"],
        "other": ["lorem", "ipsum", "dolor", "sit", "amet", "zorb", "quux"],
    }
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = list(seeds[lang])
    while len(words) < size:
        n = int(rng.integers(3, 10))
        words.append("".join(letters[i] for i in rng.integers(0, 26, n)))
    return words


def synth_shard(
    n_rows: int,
    shard: int = 0,
    seed: int = 42,
    mean_tokens: int = 40,
) -> tuple[pa.Table, dict]:
    """One shard of the web table + its ground-truth violation record.

    Returns ``(table, truth)`` where truth maps violation kind →
    sorted list of row urls (or (row, url) info) planted in this shard.
    """
    rng = np.random.default_rng(seed * 1_000_003 + shard)
    host_ids = rng.zipf(1.2, size=n_rows) % 1000  # skewed hosts
    lang_idx = rng.choice(len(LANGS), size=n_rows, p=LANG_WEIGHTS)
    langs = [LANGS[i] for i in lang_idx]

    urls = [
        f"https://host{h}.example.com/s{shard}/p{i}"
        for i, h in enumerate(host_ids)
    ]
    # planted duplicate urls: overwrite with an earlier url
    n_dup = max(1, int(n_rows * DUP_FRAC))
    dup_rows = rng.choice(np.arange(1, n_rows), size=n_dup, replace=False)
    dup_urls = []
    for r in dup_rows:
        src = int(rng.integers(0, r))
        urls[r] = urls[src]
        dup_urls.append(urls[src])

    # timestamps: monotone with jitter, ~1% swapped out of order
    incr = rng.integers(1, 2_000_000, size=n_rows).astype(np.int64)
    ts = BASE_TS_US + shard * (1 << 40) + np.cumsum(incr)
    n_ooo = int(n_rows * OOO_TS_FRAC)
    if n_ooo:
        swap = rng.choice(np.arange(0, n_rows - 1), size=n_ooo, replace=False)
        ts[swap], ts[swap + 1] = ts[swap + 1].copy(), ts[swap].copy()

    # token counts per row; plant one contiguous 10x burst per lang
    n_tok = np.maximum(5, rng.poisson(mean_tokens, size=n_rows))
    peak_rows: list[int] = []
    for li in range(len(LANGS)):
        rows = np.flatnonzero(lang_idx == li)
        if rows.size >= PEAK_LEN * 4:
            start = int(rng.integers(rows.size // 2, rows.size - PEAK_LEN))
            burst = rows[start : start + PEAK_LEN]
            n_tok[burst] = n_tok[burst] * PEAK_MULT
            peak_rows.extend(int(r) for r in burst)

    vocabs = {lang: np.array(_vocab(rng, lang)) for lang in set(langs)}
    # vectorized text assembly: draw all token indices at once per lang,
    # then join per row over slices of the flat word array
    texts: list[str] = [""] * n_rows
    for lang, vocab in vocabs.items():
        rows = [i for i in range(n_rows) if langs[i] == lang]
        counts = n_tok[rows]
        flat = vocab[rng.integers(0, len(vocab), size=int(counts.sum()))]
        bounds = np.concatenate(([0], np.cumsum(counts)))
        for j, i in enumerate(rows):
            texts[i] = " ".join(flat[bounds[j] : bounds[j + 1]])

    htmls: list[bytes | None] = [
        HTML_PREFIX + t.encode("utf-8") + HTML_SUFFIX for t in texts
    ]
    n_null = int(n_rows * NULL_HTML_FRAC)
    null_rows = rng.choice(n_rows, size=n_null, replace=False)
    for r in null_rows:
        htmls[r] = None
    n_trunc = int(n_rows * TRUNC_HTML_FRAC)
    candidates = np.setdiff1d(np.arange(n_rows), null_rows)
    trunc_rows = rng.choice(candidates, size=n_trunc, replace=False)
    for r in trunc_rows:
        h = htmls[r]
        cut = len(h) // 2
        while cut > 0 and (h[cut] & 0xC0) == 0x80:
            cut -= 1  # back off to a UTF-8 boundary (still a violation)
        htmls[r] = h[:cut]

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = {
        "dup_urls": sorted(set(dup_urls)),
        "null_html_rows": sorted(int(r) for r in null_rows),
        "trunc_html_rows": sorted(int(r) for r in trunc_rows),
        "peak_rows": sorted(peak_rows),
        "n_rows": n_rows,
    }
    return table, truth


def synth_refs(
    webpages: pa.Table, n_refs: int, seed: int = 43
) -> tuple[pa.Table, dict]:
    """FIXTURES.md T2 — referential side table with 1% dangling dst_url."""
    rng = np.random.default_rng(seed)
    urls = webpages["url"].to_pylist()
    src = rng.integers(0, len(urls), size=n_refs)
    dst = rng.integers(0, len(urls), size=n_refs)
    dst_urls = [urls[i] for i in dst]
    n_dangling = max(1, int(n_refs * 0.01))
    dangle_rows = rng.choice(n_refs, size=n_dangling, replace=False)
    for r in dangle_rows:
        dst_urls[r] = f"https://dangling.example.com/missing/{r}"
    table = pa.table(
        {
            "src_url": pa.array([urls[i] for i in src], pa.string()),
            "dst_url": pa.array(dst_urls, pa.string()),
        }
    )
    truth = {"dangling": sorted(dst_urls[r] for r in dangle_rows)}
    return table, truth


def write_webpages(
    out_dir: str,
    n_rows: int,
    n_shards: int = 8,
    seed: int = 42,
    with_refs: bool = True,
    mean_tokens: int = 40,
) -> dict:
    """Write a sharded parquet web table (one file per shard — the unit
    of resumable work) + refs table. Returns combined ground truth."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(f"{out_dir}/webpages", exist_ok=True)
    per = n_rows // n_shards
    truths = []
    tables = []
    for s in range(n_shards):
        t, truth = synth_shard(per, shard=s, seed=seed, mean_tokens=mean_tokens)
        pq.write_table(t, f"{out_dir}/webpages/shard={s:05d}.parquet")
        truths.append(truth)
        if with_refs:
            tables.append(t)
    combined = {
        "shards": truths,
        "n_rows": per * n_shards,
        "seed": seed,
    }
    if with_refs:
        allpages = pa.concat_tables(tables)
        refs, rt = synth_refs(allpages, n_refs=max(100, n_rows // 10), seed=seed + 1)
        os.makedirs(f"{out_dir}/webpage_refs", exist_ok=True)
        pq.write_table(refs, f"{out_dir}/webpage_refs/part-0.parquet")
        combined["refs"] = rt
    with open(f"{out_dir}/truth.json", "w") as f:
        json.dump(combined, f)
    return combined
