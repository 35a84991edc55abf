"""Text-analysis Ray stages: extraction, features, language ID,
fingerprints — actor pools with setup in ``__init__`` (compiled
regexes / stopword tables once per actor, work per batch)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as T


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html(binary) → extracted_text(string) + match flag vs the `text`
    column (the byte-identical per-row invariant, BASELINE.json
    input_hint). Stateless task — pure function of the batch."""
    htmls = batch["html"].to_pylist()
    extracted = [T.extract_text(h) for h in htmls]
    match = [
        (e == t) if (e is not None and t is not None) else False
        for e, t in zip(extracted, batch["text"].to_pylist())
    ]
    out = batch.append_column("extracted_text", pa.array(extracted, pa.string()))
    return out.append_column("extract_match", pa.array(match, pa.bool_()))


class TextFeatures:
    """Actor-pool stage: per-doc quality features. Regexes compiled once
    per actor (__init__), vectorized-ish apply per batch."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.token = re.compile(r"\S+")
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.punct = re.compile(r"[^\w\s]", re.UNICODE)
        self.stop_en = frozenset(T._STOPWORDS["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        n_chars = texts.str.len().astype(np.int64)
        toks = texts.str.findall(self.token)
        n_tokens = toks.map(len).astype(np.int64)
        n_punct = texts.str.count(self.punct)
        batch["n_chars"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["punct_ratio"] = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        words = texts.str.lower().str.findall(self.word)
        stop = self.stop_en
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(w in stop for w in ws) / len(ws) if ws else 0.0
        )
        batch["quality"] = texts.map(T.quality_score)
        return batch


class LangId:
    """Actor-pool language-ID stage (heuristic n-gram/stopword)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = batch[self.text_col].map(T.lang_id)
        return batch


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 + rolling fingerprint per doc. Hashing is per-doc by nature;
    md5 over the already-encoded buffer keeps the loop tight."""
    texts = batch[text_col].to_pylist()
    md5s = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
        for t in texts
    ]
    fps = [T.rolling_fingerprint(t if t is None or len(t) <= 4096 else t[:4096]) for t in texts]
    out = batch.append_column("text_md5", pa.array(md5s, pa.string()))
    return out.append_column(
        "fingerprint", pa.array(np.asarray(fps, dtype=np.uint64), pa.uint64())
    )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish token counts (SQL-replicable; see
    __ray_entry__.oracle_sql)."""
    import re

    tok = re.compile(r"\S+")
    sub = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    texts = batch[text_col].to_pylist()
    n_ws = [len(tok.findall(t)) if t else 0 for t in texts]
    n_sub = [len(sub.findall(t)) if t else 0 for t in texts]
    out = batch.append_column("n_tokens_ws", pa.array(n_ws, pa.int64()))
    return out.append_column("n_tokens_bpe", pa.array(n_sub, pa.int64()))
