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


def repetition_features(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition signals per document: total tokens, the
    most-frequent token's share, and the most-frequent bigram's share —
    high values flag boilerplate/spam for corpus filtering.

    Distributed shape: explode to (doc, gram) and aggregate twice
    (gram-level count, then per-doc max/sum) — two shuffles keyed by
    doc_id-dominated composites, never a per-doc Python loop. Returns
    (id_col, n_tokens, top_token_share, top_bigram_share) with raw
    (unrounded) shares."""
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(ws_tokens(text_col)).alias("g"))
    tok_stats = (
        toks.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok"), F.sum("c").alias("n_tokens"))
    )
    bigr = df.select(F.col(id_col).alias("doc_id"), F.explode(bigrams(text_col)).alias("g"))
    big_stats = (
        bigr.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_big"), F.sum("c").alias("n_bigrams"))
    )
    return (
        tok_stats.join(big_stats, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            "n_tokens",
            (F.col("top_tok") / F.col("n_tokens")).alias("top_token_share"),
            F.coalesce(F.col("top_big") / F.col("n_bigrams"), F.lit(0.0)).alias(
                "top_bigram_share"
            ),
        )
    )


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
