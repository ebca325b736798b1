"""Thirteenth LLM-data pack (round 9):

- ``dedup_jaccard_prefix_filter``: the LOSSLESS scale path for the
  shingle-Jaccard pair tier. ``max_shingle_freq`` (the r1-era default)
  bounds posting expansion by dropping stop-shingles — a recall trade.
  Prefix filtering (Chaudhuri et al. 2006 / PPJoin family) bounds it
  with NO recall loss: rank each doc's shingles rarest-first, index only
  the first ``|x| - ceil(t|x|) + 1`` against full postings, length-filter
  the candidates, verify exactly with one JVM ``array_intersect`` per
  candidate. Same results as the uncapped exact expansion, candidates
  cut by the (1-t) prefix saving times the rare-token posting saving —
  pinned lossless AND pinned cheaper in ``tests/test_llm_data13.py``.

Reference parity: none (no dedup surface in the reference — SURVEY.md
§2.12 gap family; LLM-data operators from the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import hround
from ..operators import dedup
from .registry import register

PF_THRESHOLD = 0.3

_PF_ORACLE = f"""
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
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           (floor((i / (sa.n + sb.n - i)) * 10000.0 + 0.5) / 10000.0) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE i / (sa.n + sb.n - i) >= {PF_THRESHOLD}
"""


@register("dedup_jaccard_prefix_filter", oracle=_PF_ORACLE)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle is the plain EXACT all-shared-shingle expansion — the
    whole point: prefix filtering must reproduce it bit-for-bit while
    generating a fraction of the candidates."""
    pairs = dedup.jaccard_prefix_filter_pairs(
        table(spark, sf_dir, "documents"), k=3, threshold=PF_THRESHOLD
    )
    return pairs.select(
        "id_a", "id_b", hround(F.col("jaccard_raw"), 4).alias("jaccard")
    )
