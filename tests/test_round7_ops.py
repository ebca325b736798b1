"""Property tests for the round-7 curation pack (queries/llm_data10.py):
SemDeDup cluster-pruning invariants, Bloom-prefilter exactness (the
prefilter must not change the decontamination result), URL
canonicalization collapse, DSIR target-likeness ordering, and tokenizer
fertility bounds. Oracle parity for each registered query lives in
test_queries_contract via the registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators.dedup import shingles
from les_etl_pipeline_spark.queries import QUERIES


def test_semantic_prune_flags_are_intra_cluster_higher_ids(spark, sf_dir):
    """Every flagged member keeps a LOWER-id representative from its own
    cluster, and best_cos respects the tau threshold."""
    from les_etl_pipeline_spark.queries.llm_data10 import SEMDEDUP_TAU

    rows = QUERIES["dedup_semantic_prune"](spark, sf_dir).collect()
    assert rows, "fixture must produce at least one flagged member"
    for r in rows:
        assert r.keep_id < r.vec_id
        assert r.best_cos >= SEMDEDUP_TAU
        assert r.n_matches >= 1


def test_bloom_prefilter_equals_exact_overlap(spark, sf_dir):
    """The Bloom stage is a PREFILTER: zero false negatives means the
    registered query's output must equal the plain exact shingle-overlap
    computation with no bloom anywhere."""
    from les_etl_pipeline_spark.queries.llm_data10 import DECON_SHINGLE_K

    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles("text", DECON_SHINGLE_K)).alias("s")
    ).distinct()
    ev = sh.where(F.col("doc_id") % 41 == 0).select("s").distinct()
    tr = sh.where(F.col("doc_id") % 41 != 0)
    exact = {
        (r.doc_id, r.n_shared)
        for r in tr.join(ev, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .collect()
    }
    got = {
        (r.doc_id, r.n_shared)
        for r in QUERIES["decontaminate_bloom_prefilter"](spark, sf_dir).collect()
    }
    assert got == exact
    assert got, "fixture must contain contaminated docs"


def test_url_canonical_groups_collapse_variants(spark, sf_dir):
    """Variant raw URLs (case/port/fragment/tracking-params) collapse to
    one canonical form: every reported group has >= 2 docs, the keeper
    is the minimum id, and no canonical form retains noise."""
    rows = QUERIES["dedup_url_canonical"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 2
        u = r.canonical_url
        assert u == u.lower()
        assert ":443" not in u and "#" not in u and "utm_" not in u
        assert not u.endswith("/")


def test_dsir_weights_rank_target_language_higher(spark, sf_dir):
    """DSIR importance = log p_en - log p_raw, so English docs must
    average a higher weight than non-English docs."""
    w = QUERIES["corpus_dsir_importance"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = w.join(docs, "doc_id")
    avg = {
        r.is_en: r.m
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_weight").alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_tokenizer_fertility_bounds(spark, sf_dir):
    """The regex tokenizer only ever SPLITS whitespace words, so
    fertility >= 1 for every language; chars_per_token is positive and
    bounded by the longest word."""
    rows = QUERIES["text_tokenizer_fertility"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_token < 40


def test_leakage_safe_split_never_straddles_near_dups(spark, sf_dir):
    """The split's whole contract: every near-dup pair (and transitively
    every member of a component) lands in ONE split, and the 80/10/10
    bucketing covers all docs exactly once."""
    from les_etl_pipeline_spark.operators import dedup

    split = QUERIES["etl_leakage_safe_split"](spark, sf_dir)
    rows = split.collect()
    docs = table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    by_doc = {r.doc_id: r.split for r in rows}
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert by_doc[p.id_a] == by_doc[p.id_b], (p.id_a, p.id_b)
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_hard_negatives_labels_differ_and_ranked(spark, sf_dir):
    """Every mined negative carries a label different from its query's,
    ranks run 1..5 per query, and rank order follows cosine."""
    rows = QUERIES["similarity_hard_negatives"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.negative_label != r.query_label
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    assert len(by_q) == 20
    for pairs in by_q.values():
        pairs.sort()
        assert [p[0] for p in pairs] == [1, 2, 3, 4, 5]
        cos = [p[1] for p in pairs]
        assert cos == sorted(cos, reverse=True)
