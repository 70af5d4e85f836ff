"""Text-analysis Column helpers — all ``pyspark.sql.functions`` built-ins.

Everything here stays JVM-side (whole-stage codegen); nothing drops to
Python. Each helper has a documented DuckDB-SQL equivalent used by the
oracle entries, and the formulas avoid cross-engine float hazards: ratios
are single IEEE divisions of exact integers (bit-identical in any engine),
and counts use replace-length arithmetic (pure integer math).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram/stopword language heuristic.
# The padded-space form makes ' the ' match whole words only; the text is
# pre-normalized with leading/trailing spaces added.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " of "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " die ", " und "],
    "zh": ["的", "是", "在"],
}

STOPWORDS = ["the", "a", "of", "and", "in"]


def norm_text(col: str | Column = "text") -> Column:
    """lower + collapse whitespace — the canonical form for fingerprints.

    DuckDB: ``lower(regexp_replace(text, '\\s+', ' ', 'g'))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, r"\s+", " "))


def occurrence_count(text: Column, marker: str) -> Column:
    """Occurrences of ``marker`` via replace-length arithmetic (integer-only;
    identical in any engine).

    DuckDB: ``(length(t) - length(replace(t, m, ''))) // length(m)``.
    """
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("int")


def token_count_ws(col: str | Column = "text") -> Column:
    """Whitespace token count. DuckDB: ``len(string_split_regex(trim(t), '\\s+'))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def token_count_bpe_ish(col: str | Column = "text") -> Column:
    """BPE-ish subword proxy: alnum runs + punctuation marks each count as a
    token. DuckDB: ``len(regexp_extract_all(t, '[a-z0-9]+|[^a-z0-9\\s]'))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)))


def lang_scores(col: str | Column = "text") -> dict[str, Column]:
    """Per-language marker-count scores over padded lowered text."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), norm_text(c), F.lit(" "))
    return {
        lang: sum((occurrence_count(padded, m) for m in markers), F.lit(0))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(col: str | Column = "text") -> Column:
    """Argmax language with deterministic tie-break (marker-count heuristic;
    ties resolve in LANG_MARKERS key order via strictly-greater chaining)."""
    scores = lang_scores(col)
    langs = list(scores)
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def stopword_ratio(col: str | Column = "text") -> Column:
    """(# stopword occurrences) / (# whitespace tokens) — one int/int division."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), norm_text(c), F.lit(" "))
    n_stop = sum((occurrence_count(padded, f" {w} ") for w in STOPWORDS), F.lit(0))
    return n_stop / token_count_ws(c)


def mean_token_len(col: str | Column = "text") -> Column:
    """(non-space chars) / (tokens) — one int/int division."""
    c = F.col(col) if isinstance(col, str) else col
    non_space = F.length(F.replace(norm_text(c), F.lit(" "), F.lit("")))
    return non_space / token_count_ws(c)


def distinct_token_ratio(col: str | Column = "text") -> Column:
    r"""(# distinct tokens) / (# tokens) — the repetition signal. Word-soup
    spam repeats tokens; natural prose mostly doesn't. One int/int division.

    DuckDB: ``len(list_distinct(string_split_regex(trim(t), '\s+')))
    / len(string_split_regex(trim(t), '\s+'))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    return F.size(F.array_distinct(toks)) / F.size(toks)


def quality_score(col: str | Column = "text") -> Column:
    """Composite document-quality heuristic in [0,1]:

    0.4 * min(1, tokens/50)            -- enough content
    + 0.3 * min(1, 5*stopword_ratio)   -- natural-language-ness
    + 0.3 * (3 <= mean_token_len <= 8) -- plausible word lengths

    Each term is a product/min of an exact ratio with exact constants; the
    identical expression tree is used in the DuckDB oracle, so the doubles
    are bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    t1 = F.least(F.lit(1.0), token_count_ws(c) / F.lit(50.0))
    t2 = F.least(F.lit(1.0), stopword_ratio(c) * F.lit(5.0))
    mtl = mean_token_len(c)
    t3 = F.when((mtl >= 3.0) & (mtl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return t1 * F.lit(0.4) + t2 * F.lit(0.3) + t3 * F.lit(0.3)


def fingerprint_md5(col: str | Column = "text") -> Column:
    """Exact content fingerprint: md5 of the normalized text.

    DuckDB: ``md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))``.
    """
    return F.md5(norm_text(col).cast("binary"))


ROLL_BASE = 257
ROLL_PRIME = 2_147_483_647  # 2^31 - 1; Horner steps stay < 2^63
ROLL_K = 8  # window length in characters


def codepoints(norm_col: str | Column) -> Column:
    """Array of unicode codepoints of a normalized-text column. Alias this
    into its own projection (same reason as :func:`tokens`: higher-order
    lambdas re-evaluate captured expression trees per element)."""
    c = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    idx = F.when(F.length(c) >= 1, F.sequence(F.lit(1), F.length(c))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.ascii(F.substring(c, i, 1)))


def rolling_hashes(cp_col: str | Column) -> Column:
    """Array of Rabin-Karp polynomial hashes of every ROLL_K-codepoint
    window of a *materialized codepoint-array column*.

    Horner's rule with a mod after every step keeps every intermediate
    below ROLL_PRIME * ROLL_BASE + codepoint < 2^63, so the arithmetic is
    exact BIGINT in any engine. DuckDB mirror:
    operators/text.py::SQL_ROLLING_HASHES.
    """
    cp = F.col(cp_col) if isinstance(cp_col, str) else cp_col
    n_win = F.greatest(F.size(cp) - F.lit(ROLL_K - 1), F.lit(0))
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )

    def window_hash(i: Column) -> Column:
        h: Column = F.lit(0).cast("long")
        for j in range(ROLL_K):
            h = F.pmod(
                h * F.lit(ROLL_BASE) + F.element_at(cp, i + F.lit(j)),
                F.lit(ROLL_PRIME),
            )
        return h

    return F.transform(idx, window_hash)


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens of the normalized text.

    Alias this into its own projection before any higher-order function
    consumes it: lambdas in Spark's interpreted higher-order functions
    re-evaluate captured *expressions* once per array element, so an
    inlined split+regexp tree turns O(tokens) work into O(tokens^2).
    An attribute reference is evaluated once per row.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(norm_text(c)), " ")


def word_ngrams(toks: str | Column, n: int = 3) -> Column:
    """Array of word n-gram shingles from a *token-array column* (JVM-side:
    shifted slices zipped with concat — each input array is touched once
    per row, never once per element). Used by minhash/jaccard dedup.

    DuckDB equivalent built in dedup._sql_shingles().
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    m = F.greatest(F.size(t) - F.lit(n - 1), F.lit(0))
    acc = F.slice(t, 1, m)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(t, k, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return acc
