"""Text analysis for training-data pipelines: quality scoring, token
counting, language ID, document fingerprinting.

All stages are single vectorized ``map_batches`` passes (pandas str /
numpy kernels, regexes compiled at import); at 100 TB these run
map-only — no shuffle, no state — so they scale with read bandwidth.
Semantics are deliberately simple + deterministic so the DuckDB oracle
can reproduce them exactly (driver correctness gate).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
# (a simplified GPT-2-style pre-tokenizer split).
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "es", "por"},
    "de": {"der", "die", "das", "und", "zu", "ist", "ein", "eine", "nicht", "mit"},
    "fr": {"le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"},
}


def text_quality(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality-signal columns: lengths, punctuation/digit/upper ratios,
    stopword ratio, mean word length, and a boolean keep flag."""
    s = batch.column(col).to_pandas().fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    words = s.str.findall(r"\w+")
    n_words = words.str.len().to_numpy(dtype=np.int64)
    n_punct = s.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    n_digit = s.str.count(r"[0-9]").to_numpy(dtype=np.int64)
    n_upper = s.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    safe_chars = np.maximum(n_chars, 1)
    safe_words = np.maximum(n_words, 1)
    mean_word_len = np.where(
        n_words > 0,
        words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0).to_numpy(),
        0.0,
    )
    en = _STOPWORDS["en"]
    stop_ratio = words.map(
        lambda ws: sum(1 for w in ws if w.lower() in en) / max(1, len(ws))
    ).to_numpy()
    keep = (
        (n_words >= 5)
        & (n_chars >= 20)
        & (n_punct / safe_chars < 0.3)
        & (n_digit / safe_chars < 0.3)
    )
    out = batch
    for name, arr in [
        ("n_chars_q", n_chars),
        ("n_words", n_words),
        ("n_punct", n_punct),
        ("n_digit", n_digit),
        ("n_upper", n_upper),
        ("punct_ratio", n_punct / safe_chars),
        ("digit_ratio", n_digit / safe_chars),
        ("stopword_ratio", stop_ratio),
        ("mean_word_len", mean_word_len),
        ("quality_keep", keep),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


def token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace-token and BPE-ish-token counts (vectorized regex)."""
    s = batch.column(col).to_pandas().fillna("")
    ws = s.str.split().str.len().fillna(0).to_numpy(dtype=np.int64)
    bpe = s.str.count(BPE_ISH).to_numpy(dtype=np.int64)
    return batch.append_column("ws_tokens", pa.array(ws)).append_column(
        "bpe_tokens", pa.array(bpe)
    )


def lang_id(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stopword-profile language guess (n-gram heuristic class).

    Scores each language by marker-stopword hits; ties and zero-hit rows
    fall back to 'und'. The marker sets are tiny by design — this is the
    structure of a fasttext-style classifier with a stub model; swap the
    scorer for a real model via an actor pool when one is available.
    """
    s = batch.column(col).to_pandas().fillna("")
    words = s.str.lower().str.findall(r"\w+")
    langs = sorted(_STOPWORDS)
    scores = np.zeros((len(s), len(langs)), dtype=np.int64)
    for j, lg in enumerate(langs):
        vocab = _STOPWORDS[lg]
        scores[:, j] = words.map(lambda ws: sum(1 for w in ws if w in vocab)).to_numpy()
    best = scores.argmax(1)
    hit = scores.max(1) > 0
    # tie → first max index (deterministic, langs sorted)
    guess = np.where(hit, np.array(langs, dtype=object)[best], "und")
    return batch.append_column("lang_guess", pa.array(guess, pa.string()))


def fingerprint(batch: pa.Table, col: str = "text", window: int = 4) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint: min 64-bit hash over
    word-``window``-grams (robust to small edits; equal fingerprints ⇒
    near-dup candidates).

    Gram hash is md5-derived (first 8 bytes, big-endian) so a SQL oracle
    reproduces it exactly; docs shorter than ``window`` words contribute
    one all-words gram, empty docs fingerprint to 0. Hashing runs ONCE
    over the flattened gram array with a per-doc ``minimum.reduceat`` —
    no per-row Python reduction."""
    from ..functions.urls import md5_hash64_many

    s = batch.column(col).to_pandas().fillna("")
    words = s.str.lower().str.findall(r"\w+")
    gram_lists = words.map(
        lambda ws: [" ".join(ws[i : i + window]) for i in range(max(1, len(ws) - window + 1))]
        if ws
        else []
    )
    counts = gram_lists.str.len().to_numpy(dtype=np.int64)
    n = len(s)
    vals = np.zeros(n, dtype=np.uint64)
    flat = [g for lst in gram_lists for g in lst]
    if flat:
        h = md5_hash64_many(flat)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonempty = counts > 0
        vals[nonempty] = np.minimum.reduceat(h, starts[nonempty])
    return batch.append_column("fingerprint", pa.array(vals))
