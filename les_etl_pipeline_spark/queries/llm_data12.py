"""Twelfth LLM-data pack (round 8): corpus-quality operators that the
big training-data writeups treat as table stakes but nothing in the
repo covered yet —

- ``dedup_duplicated_spans``: EXACT duplicated-substring spans (the
  character-level dedup of Lee et al. 2022, "Deduplicating Training
  Data Makes Language Models Better"). A character position is
  duplicated when its 20-char gram occurs >= 2 times corpus-wide;
  overlapping/touching duplicated intervals merge into maximal runs
  per doc (lag/lead gaps-and-islands). The suffix-array formulation is
  linear in corpus chars; so is this plan: one explode (linear), one
  hash-keyed groupBy, one no-fan-out equi-join back, one per-doc
  window. Output: (doc_id, n_spans, dup_chars, dup_frac).
- ``embedding_random_projection_topk``: Johnson-Lindenstrauss sign
  projection 64 -> 16 dims (Achlioptas +-1 matrix, md5-parity seeded,
  computed driver-side and embedded as plan literals) followed by
  exact cosine top-k in the PROJECTED space. The projection itself is
  a narrow zero-shuffle map — at 100 TB it is the cheap first stage
  that shrinks every downstream distance shuffle 4x. The oracle embeds
  the identical literal matrix, so the whole pipeline replays
  bit-exactly in DuckDB; the coarse-recall floor (shortlist quality)
  and the JL 1/sqrt(d_out) error scaling are pinned by
  ``tests/test_llm_data12.py``, not assumed.

Reference parity: none (no corpus-quality surface in the reference —
SURVEY.md §2.12 gap surface; LLM-data operators from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import dedup, similarity
from .registry import register

SPAN_GRAM_LEN = 20

_SPANS_ORACLE = f"""
    WITH p0 AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text) - {SPAN_GRAM_LEN - 1})) AS i
      FROM documents WHERE length(text) >= {SPAN_GRAM_LEN}
    ), pos AS (
      SELECT doc_id, i,
             md5(substr(text, CAST(i AS INT), {SPAN_GRAM_LEN})) AS g
      FROM p0
    ), dup AS (
      SELECT g FROM pos GROUP BY g HAVING count(*) >= 2
    ), dpos AS (
      SELECT doc_id, i FROM pos WHERE g IN (SELECT g FROM dup)
    ), marked AS (
      SELECT doc_id, i,
             lag(i)  OVER (PARTITION BY doc_id ORDER BY i) AS prev,
             lead(i) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
      FROM dpos
    ), per_pos AS (
      SELECT doc_id,
             CASE WHEN prev IS NULL OR i - prev > {SPAN_GRAM_LEN}
                  THEN 1 ELSE 0 END AS new_span,
             least(coalesce(nxt - i, {SPAN_GRAM_LEN}), {SPAN_GRAM_LEN}) AS cov
      FROM marked
    ), stats AS (
      SELECT doc_id, CAST(sum(new_span) AS BIGINT) AS n_spans,
             CAST(sum(cov) AS BIGINT) AS dup_chars
      FROM per_pos GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_spans, s.dup_chars,
           (floor((s.dup_chars / length(d.text)) * 1000000.0 + 0.5)
            / 1000000.0) AS dup_frac
    FROM stats s JOIN documents d ON s.doc_id = d.doc_id
"""


@register("dedup_duplicated_spans", oracle=_SPANS_ORACLE)
def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.duplicated_spans(
        table(spark, sf_dir, "documents"), gram_len=SPAN_GRAM_LEN
    )
    return out.select(
        "doc_id", "n_spans", "dup_chars", hround(F.col("dup_frac"), 6).alias("dup_frac")
    )


RP_D_IN, RP_D_OUT = 64, 16


def _rp_oracle() -> str:
    """The projected-space brute-force top-k, with the SAME sign-matrix
    literals the Spark plan embeds (generated from one driver-side
    computation — no SQL re-derivation to drift)."""
    signs = similarity.rp_sign_matrix(RP_D_IN, RP_D_OUT)
    scale = repr(float(RP_D_OUT) ** 0.5)
    coords = ",\n         ".join(
        "list_aggregate(list_apply(list_zip(v, ["
        + ", ".join(repr(s) for s in signs[j])
        + f"]), x -> x[1] * x[2]), 'sum') / {scale}"
        for j in range(RP_D_OUT)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), p AS (
      SELECT vec_id,
         [{coords}] AS pv
      FROM e
    ), n AS (
      SELECT vec_id, pv,
             sqrt(list_aggregate(list_apply(pv, x -> x * x), 'sum')) AS nrm
      FROM p
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_aggregate(list_apply(list_zip(q.pv, c.pv), x -> x[1] * x[2]), 'sum')
               / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id,
           (floor(cos * 1000000.0 + 0.5) / 1000000.0) AS cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """


@register("embedding_random_projection_topk", oracle=_rp_oracle())
def embedding_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = similarity.random_project(
        table(spark, sf_dir, "embeddings"), d_in=RP_D_IN, d_out=RP_D_OUT
    )
    out = similarity.cosine_topk(proj, F.col("vec_id") < 10, k=5)
    return out.select(
        "query_id", "neighbor_id", hround(F.col("cos"), 6).alias("cosine"), "rank"
    )


MMR_K, MMR_N_CAND, MMR_LAM = 5, 20, 0.7
_DOT = "list_aggregate(list_apply(list_zip({a}, {b}), x -> x[1] * x[2]), 'sum')"


def _mmr_tail() -> str:
    """The k greedy MMR steps unrolled into k CTE stages (the BPE-merge
    idiom), continuing from CTEs ``short(query_id, cid, rel)`` and
    ``n(vec_id, v, nrm)`` — which is what makes the tail shareable
    between the exact-shortlist and IVF-shortlist registrations.
    ``mu`` is repr(1.0 - lam) — the exact IEEE double the Spark plan
    uses, NOT the decimal 0.3."""
    lam, mu = repr(MMR_LAM), repr(1.0 - MMR_LAM)
    dot_ab = _DOT.format(a="na.v", b="nb.v")
    sql = f"""
    , pair AS MATERIALIZED (
      SELECT s1.query_id, s1.cid AS a, s2.cid AS b,
             {dot_ab} / (na.nrm * nb.nrm) AS sim
      FROM short s1
      JOIN short s2 ON s1.query_id = s2.query_id AND s1.cid != s2.cid
      JOIN n na ON na.vec_id = s1.cid
      JOIN n nb ON nb.vec_id = s2.cid
    ), sel1 AS MATERIALIZED (
      SELECT query_id, cid, {lam} * rel AS score, 1 AS step FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cid) AS rn
        FROM short
      ) WHERE rn = 1
    ), selu1 AS MATERIALIZED (SELECT * FROM sel1)"""
    for step in range(2, MMR_K + 1):
        prev = step - 1
        sql += f""", sel{step} AS MATERIALIZED (
      SELECT query_id, cid, score, {step} AS step FROM (
        SELECT c.query_id, c.cid,
               {lam} * c.rel - {mu} * m.maxsim AS score,
               row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY ({lam} * c.rel - {mu} * m.maxsim) DESC,
                                           c.cid) AS rn
        FROM short c
        JOIN (SELECT p.query_id, p.a, max(p.sim) AS maxsim
              FROM pair p
              JOIN selu{prev} s ON p.query_id = s.query_id AND p.b = s.cid
              GROUP BY p.query_id, p.a) m
          ON c.query_id = m.query_id AND c.cid = m.a
        WHERE NOT EXISTS (SELECT 1 FROM selu{prev} s2
                          WHERE s2.query_id = c.query_id AND s2.cid = c.cid)
      ) WHERE rn = 1
    ), selu{step} AS MATERIALIZED (SELECT * FROM selu{prev} UNION ALL SELECT * FROM sel{step})"""
    sql += f"""
    SELECT query_id, cid AS selected_id, CAST(step AS INT) AS step,
           (floor(score * 1000000.0 + 0.5) / 1000000.0) AS score
    FROM selu{MMR_K}
    """
    return sql


def _mmr_oracle() -> str:
    """Exact-shortlist MMR oracle: brute-force top-n_cand CTEs + the
    shared greedy tail."""
    dot_qc = _DOT.format(a="q.v", b="c.v")
    return f"""
    WITH e AS (
      SELECT vec_id, list_apply(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_aggregate(list_apply(v, x -> x * x), 'sum')) AS nrm
      FROM e
    ), short AS MATERIALIZED (
      SELECT query_id, cid, rel FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cid) AS rn
        FROM (SELECT q.vec_id AS query_id, c.vec_id AS cid,
                     {dot_qc} / (q.nrm * c.nrm) AS rel
              FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
      ) WHERE rn <= {MMR_N_CAND}
    )""" + _mmr_tail()


def _mmr_ivf_oracle() -> str:
    """IVF-shortlist MMR oracle: splice the Lloyd-replayed IVF oracle's
    CTE chain (everything up to its final SELECT — it already defines
    ``n`` and ``scored``) with a shortlist QUALIFY and the shared greedy
    tail. The quantizer replay is bit-exact (r7), so the IVF shortlist
    the greedy steps see is identical on both engines."""
    from ._pq_oracle import ivf_topk_oracle

    full = ivf_topk_oracle(
        dim=64, n_cells=8, n_probe=2, k=MMR_N_CAND, query_sql="n.vec_id < 10"
    )
    marker = "\n    SELECT query_id, neighbor_id AS "
    prefix = full[: full.index(marker)]
    return prefix + f"""
    , short AS MATERIALIZED (
      SELECT query_id, neighbor_id AS cid, cos AS rel FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) <= {MMR_N_CAND}
    )""" + _mmr_tail()


@register("similarity_mmr_rerank", oracle=_mmr_oracle())
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = similarity.mmr_rerank(
        table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 10,
        k=MMR_K,
        n_cand=MMR_N_CAND,
        lam=MMR_LAM,
    )
    return out.select(
        "query_id", "selected_id", "step", hround(F.col("score"), 6).alias("score")
    )


_IMG_ORACLE = """
    WITH ids AS (SELECT doc_id FROM documents),
    bits AS (
      SELECT doc_id, j,
             CAST(floor(CAST(('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR)),
                                             (j // 4) + 1, 1)) AS INT)
                  / power(2, 3 - j % 4)) AS INT) % 2 AS bit0
      FROM ids, generate_series(0, 63) g(j)
    ), fbits AS (
      SELECT doc_id, j,
             CASE WHEN doc_id % 3 = 0 AND j = doc_id % 64
                  THEN 1 - bit0 ELSE bit0 END AS bit
      FROM bits
    ), ham AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             sum(CASE WHEN a.bit != b.bit THEN 1 ELSE 0 END) AS h
      FROM fbits a JOIN fbits b ON a.j = b.j AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(h AS INT) AS hamming FROM ham WHERE h <= 2
"""


@register("multimodal_image_near_dup", oracle=_IMG_ORACLE)
def multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BINARY near-dup, registry-graded: synthesize a real
    BMP per doc (32x32, 8x8 blocks = the 64 md5 bits of the doc's
    id-group, every 3rd doc one block inverted), then run the actual
    byte pipeline — stdlib BMP decode, block-average aHash, banded
    Hamming (`multimodal.image_near_dup_pairs`). Because uniform 0/255
    blocks recover their bits exactly through the decode->average->
    threshold chain, the closed-form oracle predicts the whole
    pipeline's output without touching a byte — the strongest check a
    binary operator can get from a SQL engine with no image stack."""
    from ..operators import multimodal

    assets = multimodal.synth_image_assets(
        table(spark, sf_dir, "documents"), group_size=10, flip_every=3
    )
    return multimodal.image_near_dup_pairs(assets, max_hamming=2)


@register("multimodal_png_near_dup", oracle=_IMG_ORACLE)
def multimodal_png_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG twin of ``multimodal_image_near_dup`` (round 14): the same
    32x32 ``_group_bits`` block pattern containerized as a REAL
    zlib-compressed PNG (scanline filters cycling through all five
    types), decoded by the stdlib zlib/unfilter path inside
    ``_pixel_sums``. The aHash is a property of the pixels, so the
    identical closed-form oracle predicts the banded-Hamming output —
    grading the whole PNG inflate -> unfilter -> block-average ->
    threshold -> banding chain with a driver hash."""
    from ..operators import multimodal

    assets = multimodal.synth_png_assets(
        table(spark, sf_dir, "documents"), group_size=10, flip_every=3
    )
    return multimodal.image_near_dup_pairs(assets, max_hamming=2)


@register("multimodal_audio_near_dup", oracle=_IMG_ORACLE)
def multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of ``multimodal_image_near_dup``, same oracle: the
    synth WAVs encode the identical ``_group_bits`` patterns through
    their energy envelope, so one closed form predicts the end-to-end
    output of BOTH binary pipelines (stdlib WAV decode, envelope hash,
    banded Hamming) — modality changes, contract doesn't."""
    from ..operators import multimodal

    assets = multimodal.synth_audio_assets(
        table(spark, sf_dir, "documents"), group_size=10, flip_every=3
    )
    return multimodal.audio_near_dup_pairs(assets, max_hamming=2)


@register("multimodal_video_near_dup", oracle=_IMG_ORACLE)
def multimodal_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video, same oracle as image/audio: each synth video is n_frames
    static renderings of its ``_group_bits`` pattern plus ONE fully
    inverted frame (scene cut), and the majority-vote temporal signature
    must absorb it — so the closed form that predicts the bit patterns
    also predicts the whole frame-sample -> per-frame aHash -> majority
    -> banded-Hamming pipeline. Fourth modality, one contract."""
    from ..operators import multimodal

    assets = multimodal.synth_video_assets(
        table(spark, sf_dir, "documents"), group_size=10, flip_every=3, n_frames=5
    )
    return multimodal.video_near_dup_pairs(assets, every_k=2, max_hamming=2)


@register("similarity_mmr_rerank_ivf", oracle=_mmr_ivf_oracle())
def similarity_mmr_rerank_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR over the IVF shortlist instead of the exact top-n_cand — the
    composition claimed in ``mmr_rerank``'s docstring, registered and
    oracle-graded: candidate generation scales sublinearly (probed
    cells only), the greedy diversity re-rank is unchanged."""
    out = similarity.mmr_rerank(
        table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 10,
        k=MMR_K,
        n_cand=MMR_N_CAND,
        lam=MMR_LAM,
        shortlist="ivf",
    )
    return out.select(
        "query_id", "selected_id", "step", hround(F.col("score"), 6).alias("score")
    )
