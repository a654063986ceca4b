"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting).

Everything except the rolling-hash fingerprint is pure Catalyst column
algebra (split / filter / size / aggregate) — JVM-side, codegen'd, no
Python in the hot path.  The fingerprint is an Arrow-batched numpy kernel.

These run over the ``documents`` table (doc_id, text, lang, source,
n_chars) but take any DataFrame with a text column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny per-language stopword tables for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: word-piece-ish regex split —
    alternating letter runs / digit runs / single punctuation — the usual
    ~chars/4 estimator done properly as a regex."""
    pieces = F.filter(
        F.split(text, r"(?<=[a-zA-Z])(?=[^a-zA-Z\s])|(?<=[^a-zA-Z\s])(?=[a-zA-Z])|\s+"),
        lambda t: t != "",
    )
    return F.size(pieces)


def stopword_count(text: Column, lang: str) -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: F.lower(t).isin(*sw)))


def detect_language(text: Column) -> Column:
    """Stopword-voting language ID: the language whose stopword table
    matches the most tokens wins; ties and zero evidence → 'und'.
    Deterministic tie-break by language code order."""
    counts = {lang: stopword_count(text, lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed so the first language in sorted order wins ties
    for lang in sorted(counts, reverse=True):
        out = F.when(counts[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + stopword ratio + mean
    word length band + alpha ratio.  All column algebra."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    sw = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS["en"])))
    sw_ratio = sw / F.greatest(n_tok, F.lit(1))
    mean_wl = n_chars / F.greatest(n_tok, F.lit(1))
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z ]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    len_band = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(
        F.when(n_chars >= 20, 0.5).otherwise(0.0)
    )
    wl_band = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.3)
    sw_band = F.when(sw_ratio >= 0.05, 1.0).otherwise(sw_ratio / 0.05)
    return F.round(
        0.3 * len_band + 0.25 * wl_band + 0.25 * sw_band + 0.2 * alpha, 6
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row token statistics: whitespace tokens, distinct tokens,
    BPE-ish pieces."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(tokens(t)),
            "n_distinct_tokens": F.size(F.array_distinct(tokens(t))),
            "n_pieces": bpe_ish_token_count(t),
        }
    )


# ---------------------------------------------------------------------------
# document fingerprint: polynomial rolling hash (Rabin-Karp style)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1000003)
_FP_MOD_MASK = np.uint64((1 << 61) - 1)


def fingerprint_bytes(texts: "pd.Series") -> np.ndarray:
    """64-bit rolling-hash fingerprint per text, fully vectorized.

    The scalar recurrence h = (h*B + b) & (2^61-1) unrolls to
    Σ b_i · B^(L-1-i) mod 2^61, and because 2^61 divides 2^64 the
    low-61-bit mask commutes with uint64 wrap arithmetic — so a single
    power-weighted dot product over the flat byte stream (np.add.reduceat
    per doc) reproduces the per-byte loop bit for bit."""
    bs = [(s or "").encode("utf-8") for s in texts]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    out = np.zeros(len(bs), dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
    maxlen = int(lens.max())
    with np.errstate(over="ignore"):
        pw = np.empty(maxlen, dtype=np.uint64)
        pw[0] = np.uint64(1)
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, _FP_BASE, dtype=np.uint64), out=pw[1:]
            )
        # exponent of byte j (global) = doc_end - 1 - j
        ends = np.cumsum(lens)
        starts = ends - lens
        exp = np.repeat(ends - 1, lens) - np.arange(total)
        terms = flat * pw[exp]
        nz = np.flatnonzero(lens)
        h = np.add.reduceat(terms, starts[nz])
        out[nz] = (h & _FP_MOD_MASK).astype(np.int64)
    return out


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType())])

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = fingerprint_bytes(pdf[text_col])
            yield pdf

    return df.mapInPandas(gen, schema=schema)
