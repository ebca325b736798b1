"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All native Column expressions —
whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword lists for the n-gram/stopword language heuristic (tiny on
# purpose: the point is the operator shape, the lists are swappable)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "un"],
    "fr": ["le", "la", "de", "et", "que", "en", "un"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist"],
}

# BPE-ish token pattern: words, numbers, or single non-space symbols
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def regex_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization (subword-style splitting of symbols)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0))


def token_count(text: Column | str, regex: bool = False) -> Column:
    return F.size(regex_tokens(text) if regex else ws_tokens(text))


def stopword_hits(tokens: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda t: t.isin(words)))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / token / stopword features for quality filtering."""
    toks = ws_tokens(text)
    c = F.col(text) if isinstance(text, str) else text
    n_toks = F.size(toks)
    return {
        "n_chars": F.length(c),
        "n_tokens": n_toks,
        "avg_token_len": (F.length(c) - (n_toks - F.lit(1))) / n_toks,
        "stopword_ratio": stopword_hits(toks, "en") / n_toks,
        "n_distinct_tokens": F.size(F.array_distinct(toks)),
        "distinct_ratio": F.size(F.array_distinct(toks)) / n_toks,
    }


def lang_scores(tokens: Column) -> dict[str, Column]:
    return {lang: stopword_hits(tokens, lang) for lang in LANG_STOPWORDS}


def predicted_lang(tokens: Column) -> Column:
    """argmax over stopword-hit scores, deterministic tie-break by the
    fixed language order; 'und' (undetermined) when no list hits."""
    scores = lang_scores(tokens)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def token_chunks(
    text: Column | str, chunk_size: int, stride: int | None = None
) -> Column:
    """Split a document into fixed-size token windows for training
    sequences: array of structs (chunk_idx, chunk_text, n_tokens).

    ``stride`` defaults to ``chunk_size`` (non-overlapping); a smaller
    stride yields overlapping context windows. The final chunk may be
    short. All native array ops — the explode that usually follows is the
    only row-count change, no Python and no shuffle."""
    if stride is None:
        stride = chunk_size
    toks = ws_tokens(text)
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice(toks, s, chunk_size), " ").alias("chunk_text"),
            F.size(F.slice(toks, s, chunk_size)).alias("n_tokens"),
        ),
    )


def bigrams(text: Column | str) -> Column:
    """Adjacent word pairs as 'w1 w2' strings (empty below 2 tokens).
    Native array ops: the explode that usually follows is the only
    row-count change — no Python, no shuffle until the count agg."""
    toks = ws_tokens(text)
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


FINGERPRINT_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)


def rolling_fingerprint(text: Column | str) -> Column:
    """Karp-Rabin rolling hash over whitespace tokens:
    h = fold(h * 31 + md5_7hex(token)) mod (2^31-1). Order-sensitive
    document fingerprint in pure integer arithmetic (portable to the
    DuckDB oracle via list_reduce)."""
    toks = ws_tokens(text)
    tok_h = lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + tok_h(w)) % F.lit(FINGERPRINT_MOD),
    )
