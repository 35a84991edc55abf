"""Byte-pair-encoding vocabulary training (Sennrich et al. 2016,
ACL, public) — the tokenizer-training step of a training-data
pipeline, split the way real BPE trainers work:

1. DISTRIBUTED: one corpus scan builds the (word, freq) TYPE
   histogram — a groupby-sum over slim partial counts (the
   `top50_tokens` combiner shape: token instances never cross the
   shuffle, only per-batch (type, n) partials). A web-scale corpus
   caps the table at the top `max_types` types by frequency (exact
   distributed sort+limit) — the standard practice, since the
   frequency tail (every typo and url) cannot affect early merges.
2. DRIVER: the merge loop runs over the compact type table (vocab-
   sized, not corpus-sized). Each round counts adjacent symbol pairs
   weighted by type frequency and merges the most frequent pair;
   ties break on the lexicographically smallest pair so the merge
   sequence is fully deterministic (resume/retrain reproduces it).

`bpe_train` is the pure driver kernel (tested against the paper's
worked example and an independent reimplementation);
`bpe_encode` applies a learned merge list to new words.
"""

from __future__ import annotations

from collections import Counter

__all__ = ["bpe_train", "bpe_encode"]


def _pair_counts(seqs: dict, freqs: dict) -> Counter:
    counts: Counter = Counter()
    for w, sym in seqs.items():
        f = freqs[w]
        for i in range(len(sym) - 1):
            counts[(sym[i], sym[i + 1])] += f
    return counts


def _merge_pair(sym: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if (
            i + 1 < len(sym)
            and sym[i] == pair[0]
            and sym[i + 1] == pair[1]
        ):
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) type table.
    Symbols start as characters + an end-of-word marker; each round
    merges the globally most frequent adjacent pair (count desc, then
    pair lexicographic asc — deterministic). Returns the ordered merge
    list; stops early when no pair repeats."""
    freqs = {w: int(f) for w, f in word_freqs}
    seqs = {
        w: tuple(w) + ((end_of_word,) if end_of_word else ())
        for w in freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(seqs, freqs)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break  # nothing repeats — further merges are arbitrary
        merges.append(best)
        seqs = {w: _merge_pair(s, best) for w, s in seqs.items()}
    return merges


def bpe_encode(
    word: str,
    merges: list[tuple[str, str]],
    end_of_word: str = "</w>",
) -> list[str]:
    """Tokenize one word with a learned merge list (merges applied in
    training order — the standard greedy BPE encoder)."""
    sym = tuple(word) + ((end_of_word,) if end_of_word else ())
    for pair in merges:
        if len(sym) < 2:
            break
        sym = _merge_pair(sym, pair)
    return list(sym)
