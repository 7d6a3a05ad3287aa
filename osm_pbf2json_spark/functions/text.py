"""Text-analysis functions for the training-data pipeline (graft ops).

All hot-path functions are pure Column expressions (JVM, whole-stage
codegen) — no Python per row:

- `token_count` / `regex_token_count`: whitespace + BPE-ish tokenization
- `quality_features` / `quality_score`: length / punctuation / stopword
  ratio heuristics
- `lang_id`: stopword-profile n-of-m voting over a fixed tiny lexicon
- `fingerprint`: normalized-text hash (exact-dup key)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
import pyspark.sql.functions as F

# tiny public stopword profiles (top function words per language)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "es"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "con", "del", "non"],
    "pt": ["o", "a", "os", "as", "de", "que", "e", "em", "um", "não"],
    "nl": ["de", "het", "een", "en", "van", "is", "dat", "op", "te", "met"],
    "pl": ["i", "w", "na", "z", "do", "się", "jest", "nie", "to", "że"],
}

_BPE_ISH = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]"


def words(text: Column) -> Column:
    """Lower-cased whitespace tokens (empty strings filtered)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), 0))


def quality_features(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    toks = words(text)
    n_tokens = F.size(toks)
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    sw = F.array(*[F.lit(w) for ws in _STOPWORDS.values() for w in ws])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0),
        "upper_ratio": F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(0.0),
        "digit_ratio": F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(
            0.0
        ),
    }


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: long-enough docs with natural punctuation/stopword
    profiles score high; shouty/numeric/fragmented text scores low."""
    f = quality_features(text)
    length_term = F.least(f["n_tokens"].cast("double") / 100.0, F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 5.0)
    upper_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["upper_ratio"] * 3.0)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["digit_ratio"] * 3.0)
    return (
        (length_term * 0.3 + stop_term * 0.3)
        + (punct_pen + upper_pen + digit_pen) / 3.0 * 0.4
    ).alias("quality")


def lang_id(text: Column) -> Column:
    """Stopword-vote language id over the profile table (pure Catalyst:
    one array_intersect per language, greatest-of wins, ties by language
    order). Unknown → 'und'."""
    toks = F.array_distinct(words(text))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))))
        for lang, ws in _STOPWORDS.items()
    ]
    best = None
    best_score = None
    # fold into a single struct-compare chain: (score, -index) max
    expr = F.struct(F.lit(-1).alias("s"), F.lit("und").alias("lang"))
    for lang, score in reversed(scores):
        cand = F.struct(score.alias("s"), F.lit(lang).alias("lang"))
        expr = F.when(cand["s"] > expr["s"], cand).otherwise(expr)
    return F.when(expr["s"] > 0, expr["lang"]).otherwise(F.lit("und"))


def repetition_stats(text: Column, max_tokens: int = 2048) -> dict[str, Column]:
    """Gopher-style intra-document repetition signals (quality filters
    drop docs dominated by repeated content) — pure Column expressions:

    - `dup_word_frac`: 1 − |distinct words| / |words| (0 when empty)
    - `top_bigram_frac`: occurrences of the most frequent word bigram
      over total bigrams (0 when < 2 words)

    The per-row bigram mode is O(distinct × total) in array ops —
    quadratic in document length, which an adversarial 200k-token crawl
    page would turn into a straggler task. `max_tokens` caps the window
    the signals are computed over (first N words — repetition signals on
    a 2k-token prefix are what filtering pipelines act on anyway); the
    bound makes worst-case row cost ~max_tokens², independent of input.
    Everything stays inside whole-stage codegen, map-side, no shuffle."""
    ws = F.slice(words(text), 1, max_tokens)
    n = F.size(ws)
    dup_word = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(ws)).cast("double") / n
    ).otherwise(0.0)
    bg = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(ws, i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nbg = F.size(bg)
    top = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda x: F.size(F.filter(bg, lambda y: y == x)),
        )
    )
    top_bigram = F.when(nbg > 0, top.cast("double") / nbg).otherwise(0.0)
    return {
        "n_words": n,
        "dup_word_frac": dup_word,
        "top_bigram_frac": top_bigram,
    }


def normalize(text: Column) -> Column:
    """Dedup normalization: lower, collapse whitespace, strip punctuation."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^\p{L}\p{N}\s]", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint over normalized text (exact-dup key)."""
    return F.xxhash64(normalize(text))


def winnowing_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al. 2003): a true
    rolling hash over every k-gram of the normalized character stream,
    then each sliding window of `w` hashes keeps its minimum. Any
    substring match of length ≥ k+w-1 shares a fingerprint.

    Implemented as an Arrow-batched kernel: a pure-Catalyst version
    (transform over sequence + array_min(slice)) is O(n²) because Spark
    does no common-subexpression elimination inside higher-order-function
    lambdas — the k-gram hash array would be re-evaluated per window. The
    NumPy kernel is O(n) per document with a polynomial rolling hash
    (base 257 mod 2^61-1) and a stride-tricks window minimum.

    Returns ARRAY<BIGINT> (sorted, deduped) per document.
    """
    mod = (1 << 61) - 1

    def kernel(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            # input is already normalized JVM-side (see call below)
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            n = len(codes)
            if n == 0:
                out.append([])
                continue
            hs = _kgram_hashes(codes, min(k, n))
            if len(hs) <= w:
                mins = np.array([hs.min()])
            else:
                view = np.lib.stride_tricks.sliding_window_view(hs, w)
                mins = view.min(axis=1)
            out.append(sorted(set(int(x) for x in mins)))
        return pd.Series(out)

    return F.pandas_udf(kernel, "array<long>")(normalize(text))


def _kgram_hashes(codes: "np.ndarray", k: int, base: int = 257) -> "np.ndarray":
    """Polynomial hash (base 257, mod M = 2^61-1) of every k-gram of a
    uint32 code-point array, fully vectorized: one O(n) NumPy pass per
    power-of-base term (k passes total), no per-character Python loop.

    All arithmetic stays in uint64 using Mersenne-prime folding
    (2^61 ≡ 1 mod M): a code point c < 2^21 times a constant B < M is
    split as B = hi·2^31 + lo, so c·hi < 2^51 and c·lo < 2^52 both fit,
    and the 2^31 shift is reduced via x·2^31 = (x>>30)·2^61 + (x&(2^30-1))·2^31
    ≡ (x>>30) + (x&(2^30-1))·2^31 (mod M). Intermediate values stay
    congruent mod M (bounded < 2^62); one final `% M` canonicalizes.
    """
    M = np.uint64((1 << 61) - 1)
    mq = (1 << 61) - 1
    u = codes.astype(np.uint64)
    npos = len(codes) - k + 1
    acc = np.zeros(npos, dtype=np.uint64)
    # batch the per-term multiply-adds BEFORE any mod-folding: with
    # c < 2^21, hi < 2^30, lo < 2^31, chunk sums stay < 2^64 for up to
    # 2^11 terms — one fold per chunk instead of per term
    for start in range(0, k, 2048):
        js = range(start, min(start + 2048, k))
        A = np.zeros(npos, dtype=np.uint64)  # sum c·hi_j  (< k_chunk·2^51)
        B = np.zeros(npos, dtype=np.uint64)  # sum c·lo_j  (< k_chunk·2^52)
        for j in js:
            bj = pow(base, k - 1 - j, mq)
            c = u[j : j + npos]
            A += c * np.uint64(bj >> 31)
            B += c * np.uint64(bj & 0x7FFFFFFF)
        # fold A·2^31 + B into acc: A = a1·2^30 + a0 → A·2^31 ≡ a1 + a0·2^31
        a0 = A & np.uint64((1 << 30) - 1)
        s = (A >> np.uint64(30)) + (a0 << np.uint64(31))
        s = (s >> np.uint64(61)) + (s & M)
        s += (B >> np.uint64(61)) + (B & M)
        acc += (s >> np.uint64(61)) + (s & M)
        acc = (acc >> np.uint64(61)) + (acc & M)
    return (acc % M).astype(np.int64)
