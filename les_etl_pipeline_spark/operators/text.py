"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All native Column expressions —
whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    row-count change — no Python, no shuffle until the count agg.

    Shape matters (r14): zip_with over two shifted slices, where the
    split appears only as a HOF *argument* (one eval per row per slice).
    The previous ``transform(sequence(...), i -> element_at(split(text),
    i))`` form re-evaluated the split TWICE PER ELEMENT inside the
    lambda (HOF lambdas are re-run whole per element; codegen CSE does
    not hoist their subtrees), O(n_tokens^2) characters per doc —
    measured 13.9 s vs 0.06 s for one 8k-token doc."""
    toks = ws_tokens(text)
    m = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )


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


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    vocab_partitions: int = 4,
) -> list[tuple[str, str, int]]:
    """Train byte-pair-encoding merges on a corpus — the distributed
    face of tokenizer training. Returns the ordered merge list
    [(left_symbol, right_symbol, pair_count), ...].

    The scale structure is the point: BPE statistics live on the WORD
    VOCABULARY (unique word, count), not the corpus — one corpus-sized
    shuffle builds the weighted vocab, and every merge iteration then
    touches only vocab-sized data (explode adjacent symbol pairs →
    groupBy pair → arg-max). At 100 TB the corpus pass is unavoidable
    and linear; the n_merges iterations ride on data that is orders of
    magnitude smaller. Per iteration the driver receives exactly ONE
    row (the winning pair — a model parameter, like a k-means centroid),
    and the symbol-array rewrite is a pure higher-order-function fold
    (greedy left-to-right non-overlapping merge, the standard BPE
    application order) — no Python worker anywhere.

    Deterministic: ties break on (count desc, left, right); merge
    application is a left fold, so the result is a pure function of the
    corpus. Exactness vs a pure-Python reference implementation is
    pinned in tests/test_round5_ops.py."""
    # corpus pass: weighted word vocabulary, words as char-symbol arrays
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        # split(limit=-1) keeps the empty match at end-of-string — drop it
        .select(
            F.filter(F.split(F.col("w"), "(?!^)"), lambda x: x != "").alias("syms"),
            "wc",
        )
        # the vocab is orders of magnitude smaller than the corpus: shrink
        # its partitioning so each merge iteration schedules a handful of
        # tasks, not a corpus-sized task wave (size vocab_partitions to
        # vocab bytes / 128MB on a cluster). Lazy checkpoint: the first
        # iteration's best-pair collect materializes it, the rewrite
        # reuses it — no driver-blocking job up front (r14)
        .repartition(vocab_partitions)
        .localCheckpoint(eager=False)
    )

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice("syms", 1, F.size("syms") - 1),
                        F.slice("syms", 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("pc"))
        )
        best = pairs.orderBy(F.col("pc").desc(), "l", "r").limit(1).collect()
        if not best or best[0]["pc"] < 2:
            break
        a, b, pc = best[0]["l"], best[0]["r"], int(best[0]["pc"])
        merges.append((a, b, pc))

        vocab = vocab.select(
            _merge_pair(F.col("syms"), a, b).alias("syms"), "wc"
        ).localCheckpoint(eager=False)  # next iteration's collect materializes

    return merges


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping BPE merge of (a, b) as a pure
    fold: append x, unless (last == a and x == b) in which case the last
    element becomes a||b — a just-merged token can never match as ``a``
    again within the same pass unless it IS the same string, which is
    exactly BPE's symbols-are-strings semantics."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_partitions: int = 4,
    checkpoint_every: int = 16,
) -> DataFrame:
    """Encode documents with a trained BPE merge list — the apply side
    of ``bpe_train_merges``. Returns (id_col, tokens array<string>,
    n_tokens), token order preserving the document's word order.

    Scale structure mirrors training: merges are applied to the DISTINCT
    WORD VOCABULARY (vocab-sized work — orders of magnitude below the
    corpus), then words map to their token arrays through one join and
    the corpus pass is a pure reassembly. Encoding never re-runs the
    merge fold over corpus-sized data. All merge folds are JVM
    higher-order functions chained into one plan; every
    ``checkpoint_every`` merges the vocab is localCheckpoint()ed so
    expression depth stays bounded for production-sized merge lists
    (32k merges would otherwise build a 32k-deep expression tree).

    Deterministic: a pure function of (corpus, merges); exactness vs a
    pure-Python reference encoder is pinned in tests/test_round5_ops.py.
    """
    words = docs.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "w")
    ).where(F.col("w") != "")
    uniq = words.select("w").distinct().repartition(vocab_partitions)
    enc = uniq.select(
        "w", F.filter(F.split(F.col("w"), "(?!^)"), lambda x: x != "").alias("toks")
    )
    for i, m in enumerate(merges):
        enc = enc.select("w", _merge_pair(F.col("toks"), m[0], m[1]).alias("toks"))
        if (i + 1) % checkpoint_every == 0:
            enc = enc.localCheckpoint()
    # corpus-side reassembly: word -> tokens via ONE join (the encoded
    # vocab is small next to the corpus; AQE broadcasts it when it fits),
    # then per-doc ordered flatten.
    return (
        words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
        .select(id_col, "tokens", F.size("tokens").alias("n_tokens"))
    )


def winnowing_fingerprints(
    df,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-word gram (40-bit md5 prefix), slide a
    w-hash window, keep each window's minimum with RIGHTMOST tie-break,
    distinct per document. Returns (doc_id, fp_hash, fp_pos).

    The min and the tie-break ride in one 60-bit integer key
    (hash * 2^20 + (2^20 - 1 - pos)) so the window selection is a plain
    ``min`` over a per-doc ROWS frame — partition-parallel, no global
    order, identical integer in any engine. Guarantee: any shared word
    run of length >= w + k - 1 leaves a shared fingerprint (density
    ~2/(w+1)). Shared by the text_winnowing_fingerprints query and the
    aligned-span near-dup detector (dedup_substring_spans)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("gpos", "w"),
    )
    win = W.partitionBy("doc_id").orderBy("gpos")
    g = F.concat_ws(" ", F.col("w"), *[F.lead("w", i).over(win) for i in range(1, k)])
    grams = toks.select(
        "doc_id", "gpos", F.lead("w", k - 1).over(win).alias("_ok"), g.alias("g")
    ).where(F.col("_ok").isNotNull())
    hkey = (
        F.conv(F.substring(F.md5("g"), 1, 10), 16, 10).cast("long") * F.lit(1048576)
        + (F.lit(1048575) - F.col("gpos"))
    )
    frame = W.partitionBy("doc_id").orderBy("gpos").rowsBetween(W.currentRow, w - 1)
    mins = grams.select(
        "doc_id",
        F.min(hkey).over(frame).alias("sel"),
        F.count(F.lit(1)).over(frame).alias("wsize"),
    ).where(F.col("wsize") == w)
    return mins.select(
        "doc_id",
        # integer DIV, not `/`: keys exceed 2^53, double math would
        # corrupt the high bits
        F.expr("CAST(sel DIV 1048576 AS BIGINT)").alias("fp_hash"),
        (F.lit(1048575) - F.col("sel") % 1048576).cast("int").alias("fp_pos"),
    ).distinct()


def compression_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """gzip-ratio quality signal (the CCNet/RefinedWeb-family heuristic):
    ratio = deflate(text) / raw bytes. Very LOW ratios flag boilerplate /
    template spam (highly compressible), very HIGH ratios flag
    noise/binary-ish junk — both standard cut candidates before LM
    filtering. Returns (doc_id, raw_bytes, gz_bytes, ratio).

    zlib has no Spark/SQL native, so this is a sanctioned Python path:
    Arrow-batched mapInPandas (like the multimodal decoders), compression
    executor-side, partition-parallel — the driver never sees text.
    Deterministic for a fixed ``level`` (pinned against driver-side zlib
    in ``tests/test_llm_data12.py``). Not oracle-expressible (DuckDB has
    no deflate either) — pytest-verified, not registry-paired."""
    import pandas as _pd

    cols = (id_col, text_col)

    def op(batches):
        import zlib

        for pdf in batches:
            raws, gzs = [], []
            for t in pdf[cols[1]]:
                b = (t or "").encode("utf-8")
                raws.append(len(b))
                gzs.append(len(zlib.compress(b, level)))
            yield _pd.DataFrame(
                {"doc_id": pdf[cols[0]], "raw_bytes": raws, "gz_bytes": gzs}
            )

    out = docs.select(*cols).mapInPandas(
        op, schema="doc_id bigint, raw_bytes bigint, gz_bytes bigint"
    )
    return out.select(
        "doc_id",
        "raw_bytes",
        "gz_bytes",
        F.when(F.col("raw_bytes") > 0, F.col("gz_bytes") / F.col("raw_bytes"))
        .otherwise(F.lit(0.0))
        .alias("ratio"),
    )
