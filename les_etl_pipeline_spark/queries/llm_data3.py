"""Third LLM-data pack: repetition-quality signals, corpus vocabulary
with document frequency, deterministic bottom-k MinHash signatures, and
embedding centroids per label.

Plan notes (100 TB posture):
- repetition: two explode+agg passes keyed by (doc, gram) — grams hash
  small, text never shuffles; see operators/text.repetition_features.
- vocabulary: distinct (doc, token) then token-keyed agg; the corpus-size
  scalar broadcasts from a 1-row aggregate (no driver round-trip).
- minhash signature: pure per-row array expressions, zero shuffle — the
  oracle-checkable twin of the seeded LSH banding path.
- centroids: posexplode to (label, dim) — the agg domain is
  labels x dims (320 rows here), metadata-thin at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import dedup
from ..operators.text import repetition_features
from .registry import register


@register(
    "text_repetition_quality",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS g FROM documents
    ), tok_stats AS (
      SELECT doc_id, max(c) AS top_tok, sum(c) AS n_tokens FROM (
        SELECT doc_id, g, count(*) AS c FROM tok GROUP BY doc_id, g
      ) GROUP BY doc_id
    ), positions AS (
      SELECT doc_id,
             unnest(string_split_regex(text, '\\s+')) AS w,
             unnest(generate_series(1, len(string_split_regex(text, '\\s+')))) AS pos
      FROM documents
    ), bigr AS (
      SELECT doc_id, w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM positions QUALIFY g IS NOT NULL
    ), big_stats AS (
      SELECT doc_id, max(c) AS top_big, sum(c) AS n_bigrams FROM (
        SELECT doc_id, g, count(*) AS c FROM bigr GROUP BY doc_id, g
      ) GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           (floor((t.top_tok / t.n_tokens) * 1000000.0 + 0.5) / 1000000.0) AS top_token_share,
           (floor(coalesce(b.top_big / b.n_bigrams, 0) * 1000000.0 + 0.5) / 1000000.0) AS top_bigram_share
    FROM tok_stats t LEFT JOIN big_stats b ON t.doc_id = b.doc_id
    ORDER BY t.doc_id
    """,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (Gopher-style): most-frequent token and
    bigram shares per document — the standard boilerplate/spam filter
    inputs alongside corpus_quality_filter's length features."""
    out = repetition_features(table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_tokens",
        hround(F.col("top_token_share"), 6).alias("top_token_share"),
        hround(F.col("top_bigram_share"), 6).alias("top_bigram_share"),
    ).orderBy("doc_id")


@register(
    "vocab_doc_frequency",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w FROM documents
    ), vocab AS (
      SELECT w AS token,
             count(DISTINCT doc_id) AS df,
             count(*) AS tf
      FROM tok GROUP BY w
    )
    SELECT token, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
           (floor(ln((SELECT count(*) FROM documents) / df) * 1000000.0 + 0.5)
            / 1000000.0) AS idf
    FROM vocab
    ORDER BY df DESC, tf DESC, token LIMIT 30
    """,
)
def vocab_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: per-token document frequency, term
    frequency, and idf over the whole corpus. The corpus size joins in
    from a broadcast 1-row aggregate — no collect, no hardcoded N."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("token"))
    vocab = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        vocab.join(F.broadcast(n_docs))
        .select(
            "token", "df", "tf",
            hround(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"),
        )
        .orderBy(F.col("df").desc(), F.col("tf").desc(), "token")
        .limit(30)
    )


@register(
    "dedup_minhash_det_signature",
    oracle="""
    WITH positions AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
        FROM positions WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE s IS NOT NULL
    ), hashed AS (
      SELECT doc_id, md5(s) AS h,
             row_number() OVER (PARTITION BY doc_id ORDER BY md5(s)) AS rn
      FROM sh
    )
    SELECT doc_id, string_agg(h, ':' ORDER BY h) AS minhash_sig
    FROM hashed WHERE rn <= 4 GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_minhash_det_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k MinHash signatures (k=4 minima of
    md5(3-gram shingle)): the engine-portable MinHash face — DuckDB
    reproduces the identical sketch, so this one IS oracle-checked,
    complementing the seeded rows-only pyspark.ml banding
    (dedup_minhash_lsh)."""
    return dedup.minhash_det_signature(
        table(spark, sf_dir, "documents"), k=4, ngram=3
    ).orderBy("doc_id")


@register(
    "embedding_label_centroids",
    oracle="""
    SELECT label, CAST(t.i AS INT) AS dim,
           (floor(avg(CAST(embedding[t.i] AS DOUBLE)) * 1000000.0 + 0.5)
            / 1000000.0) AS centroid,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, 256)) AS i) t
    WHERE t.i <= len(embedding)
    GROUP BY label, t.i ORDER BY label, dim
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, one row per (label, dimension) —
    the class-prototype computation behind IVF coarse quantizers and
    embedding-space QA. posexplode keeps the aggregation domain at
    labels x dims regardless of corpus size."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            hround(F.avg("col"), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


@register(
    "multimodal_byte_chunks",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
      FROM documents WHERE doc_id <= 50
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_idx,
           CAST(k * 64 AS BIGINT) AS "offset",
           CAST(least(64, nb - k * 64) AS INT) AS n_bytes,
           lower(substring(hx, k * 128 + 1, 128)) AS chunk_hex
    FROM h CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS k) t
    WHERE k * 64 < nb
    ORDER BY doc_id, chunk_idx
    """,
)
def multimodal_byte_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal chunk plumbing (frame-sampling pattern): binary
    payloads fan out to fixed 64-byte windows inside an Arrow-batched
    mapInPandas (operators/multimodal.byte_chunks). The oracle rebuilds
    the identical byte windows by slicing the hex encoding at 2x byte
    offsets — DuckDB has no binary substring, hex strings are the
    engine-portable face of the bytes."""
    from ..operators import multimodal

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    chunks = multimodal.byte_chunks(multimodal.to_asset_table(docs), chunk_size=64)
    return chunks.orderBy("doc_id", "chunk_idx")


@register(
    "sample_weighted_topk",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000) + 1)
               / 10000.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           (floor(pow(u, 1.0 / n_chars) * 1000000.0 + 0.5) / 1000000.0) AS sample_key_r
    FROM t ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id LIMIT 50
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res,
    operators/sampling.weighted_sample_topk): quality-weighted corpus
    subsampling whose draw is a pure function of the content key — the
    reproducible twin of rand()-based weighted reservoirs. Longer docs
    (weight = n_chars) are favored but not guaranteed. One
    TakeOrderedAndProject, no full sort."""
    from ..operators.sampling import weighted_sample_topk

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = weighted_sample_topk(docs, "doc_id", "n_chars", k=50)
    return out.select(
        "doc_id", "n_chars", hround(F.col("sample_key"), 6).alias("sample_key_r")
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents
    ), counts AS (
      SELECT doc_id, c, count(*) AS n FROM ch WHERE c <> '' GROUP BY doc_id, c
    ), agg AS (
      SELECT doc_id, sum(n) AS total, sum(n * ln(n)) AS nln
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, CAST(total AS BIGINT) AS n_chars_counted,
           (floor((ln(total) - nln / total) * 1000000.0 + 0.5) / 1000000.0)
             AS char_entropy
    FROM agg ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution entropy per document (nats): the gibberish
    / mojibake filter signal — natural prose sits in a narrow entropy
    band, random bytes above it, repeated filler below. Computed as
    H = ln(N) - sum(n*ln n)/N from per-char counts, so the shuffle
    carries (doc, char) pairs, never text."""
    docs = table(spark, sf_dir, "documents")
    ch = docs.select("doc_id", F.explode(F.split("text", "")).alias("c")).where(
        F.col("c") != ""
    )
    counts = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    agg = counts.groupBy("doc_id").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.log("n")).alias("nln"),
    )
    return agg.select(
        "doc_id",
        F.col("total").alias("n_chars_counted"),
        hround(F.log("total") - F.col("nln") / F.col("total"), 6).alias("char_entropy"),
    ).orderBy("doc_id")


@register(
    "text_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id <= 200
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u ORDER BY doc_id
    """,
)
def text_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing for web-corpus processing (domain extraction is the
    first grouping key of every crawl pipeline): parse_url pulls HOST /
    PATH / a QUERY parameter from deterministic synthesized URLs; the
    oracle re-derives the same parts with regexes. Pure projections."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@register(
    "scalar_regexp_extract_all",
    oracle="""
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), '_') AS words_joined,
           regexp_extract_all(p_name || ' ' || p_brand, '[0-9]+')[-1] AS last_number
    FROM part WHERE p_partkey <= 800 ORDER BY p_partkey
    """,
)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every match as an array (count, join, last
    element) — the multi-match face the single-capture regexp pack
    doesn't cover. Array results are surfaced as scalars (count /
    joined / element) so both engines hash identical cells."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") <= 800)
    words = F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), F.lit(0))
    nums = F.regexp_extract_all(
        F.concat_ws(" ", "p_name", "p_brand"), F.lit("[0-9]+"), F.lit(0)
    )
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(words, "_").alias("words_joined"),
        F.element_at(nums, -1).alias("last_number"),
    ).orderBy("p_partkey")


@register(
    "multimodal_decode_stdlib",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS mime,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 8 + 1 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 5 + 1 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS DOUBLE) END AS mean_pixel,
           CASE WHEN doc_id % 2 = 1 THEN CAST(1 AS INT) END AS n_channels,
           CASE WHEN doc_id % 2 = 1 THEN CAST(8000 AS INT) END AS sample_rate,
           CASE WHEN doc_id % 2 = 1
                THEN CAST((160 + (doc_id % 40) * 8) / 8 AS BIGINT) END AS duration_ms,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(500 + (doc_id % 97) * 7 AS DOUBLE) END AS rms
    FROM documents WHERE doc_id <= 200 ORDER BY doc_id
    """,
)
def multimodal_decode_stdlib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image/audio decode, no external libraries: each doc becomes a
    genuine binary asset (even ids: uncompressed 24-bpp BMP with padded
    rows; odd ids: 16-bit PCM WAV square wave), then
    operators/multimodal.decode_features parses the bytes back inside an
    Arrow-batched mapInPandas — struct header walk for BMP (stride-aware
    mean pixel), stdlib `wave` + RMS for audio. Every decoded feature is
    a closed-form function of doc_id, so DuckDB can oracle-check the
    full encode→decode round trip (a square wave of amplitude A has RMS
    exactly A; a constant-v BMP has mean pixel exactly v — padding bytes
    would skew it, which is what the stride test catches)."""
    import pandas as pd  # local: only the Arrow batches touch pandas

    from ..operators import multimodal

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") <= 200).select("doc_id")

    def enc(batches):
        for pdf in batches:
            out = {"doc_id": [], "payload": [], "mime": [], "n_bytes": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    payload = multimodal.encode_bmp(d % 8 + 1, d % 5 + 1, d % 256)
                    mime = "image/bmp"
                else:
                    payload = multimodal.encode_wav(
                        160 + (d % 40) * 8, 500 + (d % 97) * 7
                    )
                    mime = "audio/wav"
                out["doc_id"].append(d)
                out["payload"].append(payload)
                out["mime"].append(mime)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    assets = docs.mapInPandas(enc, schema=multimodal.ASSET_SCHEMA)
    return multimodal.decode_features(assets).orderBy("doc_id")


@register(
    "dedup_minhash_banded",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
        FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE s IS NOT NULL
    ), hs AS (
      SELECT doc_id,
             ('0x' || substr(md5(s), 1, 8))::BIGINT AS h1,
             (('0x' || substr(md5(s), 9, 8))::BIGINT | 1) AS h2
      FROM sh
    ), sig AS (
      SELECT doc_id, i, min((h1 + (42 + i) * h2) % 4294967296) AS g
      FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
      GROUP BY doc_id, i
    ), bk AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(g AS VARCHAR), ':' ORDER BY i) AS key
      FROM sig GROUP BY doc_id, i // 4
    ), sized AS (
      SELECT band, key FROM bk GROUP BY band, key
      HAVING count(*) >= 2 AND count(*) <= 1000
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bk a
    JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    JOIN sized s ON s.band = a.band AND s.key = a.key
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-tuned MinHash banding (operators/dedup.minhash_banded_pairs):
    (b, r) derived from the Jaccard threshold via the S-curve chooser
    ((1/b)^(1/r) ≈ t — threshold 0.5 over 64 hashes lands exactly on
    b=16, r=4), band buckets keyed over r consecutive signature rows,
    pairs expanded from grouped posting lists in ONE exchange. Runs the
    md5 hash family (Kirsch-Mitzenmacher: ONE md5 per shingle, the 64
    permutations derived as (h1 + (42+i)*h2) mod 2^32 with h1/h2 the two
    hex halves, bucket key = ':'-joined elements) so the ENTIRE pipeline
    — shingles, 64 permutations, banding, bucket cap, pair expansion —
    replays bit-exactly in DuckDB; the xxhash64 family stays the faster
    100 TB default. Candidate recall vs true Jaccard pairs pinned by
    tests/test_round4_ops.py::test_minhash_banded_recall_beats_naive."""
    from ..operators import dedup as _dedup

    pairs = _dedup.minhash_banded_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5, hash_family="md5"
    )
    return pairs.orderBy("id_a", "id_b")


@register("dedup_minhash_banded_xxhash")  # engine-native hash — rows-only
def dedup_minhash_banded_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-default MinHash banding path: same self-tuned (b, r)
    banding pipeline as ``dedup_minhash_banded`` but with the xxhash64
    hash family (JVM-native codegen hash per (seed, shingle); band
    bucket keys fold to ONE 8-byte xxhash64 instead of the md5 twin's
    ':'-joined decimal string — a ~5x smaller bucket shuffle key).
    xxhash64 has no DuckDB counterpart, so this form is rows-only BY
    CONSTRUCTION (the md5 twin carries the bit-exact oracle for the
    shared banding logic; per-permutation independence and recall are
    pinned in tests/test_round6_ops.py and test_round4_ops.py).
    Registered (VERDICT r6 #4) so the documented scale default is
    benched and slope-probed every round instead of living only in a
    docstring claim."""
    from ..operators import dedup as _dedup

    pairs = _dedup.minhash_banded_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5, hash_family="xxhash64"
    )
    return pairs.orderBy("id_a", "id_b")


@register(
    "embedding_int8_quantization",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id <= 500
    ), s AS (
      SELECT vec_id, v,
             greatest(list_aggregate(list_apply(v, x -> abs(x)), 'max'), 1e-12) / 127.0
               AS scale
      FROM e
    ), q AS (
      SELECT vec_id, v, scale,
             list_apply(v, x -> CAST(floor(x / scale + 0.5) AS INT)) AS qv
      FROM s
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS n_dims,
           (floor(scale * 1000000000.0 + 0.5) / 1000000000.0) AS scale_r,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           (floor((list_aggregate(
                     list_apply(list_zip(v, qv), p -> pow(p[1] - p[2] * scale, 2)),
                     'sum') / len(v)) * 1e12 + 0.5) / 1e12) AS mse_r
    FROM q ORDER BY vec_id
    """,
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization with per-vector max-abs scale —
    the 4x compression step before ANN indexing at 100 TB (quantized
    vectors + scales are what an IVF/PQ index actually stores). Pure
    array lambdas end to end: scale from array_max, quantize via
    floor(x/scale + 0.5) (an explicitly defined rounding — bare round()
    half-point behavior is engine-arbitrary), reconstruction MSE via
    zip_with + aggregate. No UDF, no shuffle beyond the scan."""
    emb = table(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 500)
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    s = e.withColumn(
        "scale",
        F.greatest(
            F.array_max(F.expr("transform(v, x -> abs(x))")), F.lit(1e-12)
        )
        / F.lit(127.0),
    )
    q = s.withColumn(
        "qv", F.expr("transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))")
    )
    mse = (
        F.expr(
            "aggregate(zip_with(v, qv, (x, qq) -> pow(x - qq * scale, 2)), "
            "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        )
        / F.size("v")
    )
    return q.select(
        "vec_id",
        F.size("v").alias("n_dims"),
        hround(F.col("scale"), 9).alias("scale_r"),
        F.expr("CAST(aggregate(qv, 0L, (a, b) -> a + b) AS BIGINT)").alias("q_sum"),
        hround(mse, 12).alias("mse_r"),
    ).orderBy("vec_id")


@register(
    "sample_weighted_per_group",
    oracle="""
    WITH t AS (
      SELECT source, doc_id, n_chars,
             ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000) + 1)
               / 10000.0 AS u
      FROM documents WHERE n_chars > 0
    ), ranked AS (
      SELECT source, doc_id, n_chars,
             pow(u, 1.0 / n_chars) AS sk,
             CAST(row_number() OVER (
                 PARTITION BY source
                 ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id
             ) AS INT) AS rn
      FROM t
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rn,
           (floor(sk * 1000000.0 + 0.5) / 1000000.0) AS sample_key_r
    FROM ranked WHERE rn <= 10
    """,
)
def sample_weighted_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-quota stratified weighted reservoir: 10 docs PER SOURCE,
    drawn by deterministic Efraimidis-Spirakis keys (u^(1/w), u from
    md5(doc_id), weight = n_chars) — the per-group counterpart of
    sample_weighted_topk. Ranked via the two-phase hot-group top-k, so
    one dominant source never lands its whole stratum in a single sort
    task; the oracle is the single-window form."""
    from ..operators.sampling import weighted_sample_per_group

    docs = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    out = weighted_sample_per_group(docs, "doc_id", "n_chars", ["source"], k=10)
    return out.select(
        "source",
        "doc_id",
        "n_chars",
        "rn",
        hround(F.col("sample_key"), 6).alias("sample_key_r"),
    )
