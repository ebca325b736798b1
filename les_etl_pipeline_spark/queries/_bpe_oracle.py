"""Unrolled DuckDB oracles for the distributed BPE queries (VERDICT r6
#7) — converts ``text_bpe_train_merges`` and ``text_bpe_encode`` from
rows-only to hash-matched.

The trick that makes greedy BPE SQL-expressible: a word's symbol array
is carried as a DOUBLE-separator-delimited string (``__a__b__c__`` — the
corpus alphabet is pure letters, FIXTURES.md, so ``_`` never collides),
and the greedy left-to-right non-overlapping merge of pair (a, b) is
exactly SQL's leftmost non-overlapping

    replace(s, '_a__b_', '_ab_')

Each match consumes the inner half of both flanking double boundaries
and the replacement restores them, so adjacent matches in a same-symbol
run (``a a a a`` with pair (a, a)) resolve to the alternating pattern
greedy BPE produces — verified against operators/text._merge_pair's
fold semantics by the bit-exact oracle comparison itself and by the
pure-Python BPE parity tests in tests/test_round5_ops.py.

Training unrolls ``n_merges`` CTE stages (pair count -> arg-max -> one
replace over the weighted word vocabulary); the merge list is cut at
the first pair_count < 2 with a prefix-min QUALIFY, replaying the
training loop's break. Encoding replays the merge chain over the
distinct words of the target slice, then reassembles documents with an
ordered list flatten. ``AS MATERIALIZED`` hints matter: DuckDB inlines
multiply-referenced CTEs by default, which makes the v_{i-1}-twice
reference pattern exponential.
"""

from __future__ import annotations


def _stage(i: int) -> str:
    """One training iteration: adjacent-pair counts from v{i-1}, the
    (count desc, l, r) arg-max, and the vocabulary rewrite."""
    return f"""
    p{i} AS (
      SELECT t.syms[u.i] AS l, t.syms[u.i + 1] AS r,
             CAST(sum(t.wc) AS BIGINT) AS pc
      FROM (SELECT list_filter(string_split(s, '__'), x -> x <> '') AS syms, wc
            FROM v{i - 1}) t,
           LATERAL (SELECT unnest(range(1, len(t.syms))) AS i) u
      GROUP BY 1, 2
    ), b{i} AS (SELECT l, r, pc FROM p{i} ORDER BY pc DESC, l, r LIMIT 1),
    v{i} AS MATERIALIZED (
      SELECT replace(v{i - 1}.s, '_' || b{i}.l || '__' || b{i}.r || '_',
                     '_' || b{i}.l || b{i}.r || '_') AS s, wc
      FROM v{i - 1}, b{i}
    )"""


def _vocab(where: str) -> str:
    """Weighted word vocabulary as delimited char-symbol strings —
    mirrors bpe_train_merges' corpus pass (split on \\s+, drop empties,
    weight by word count)."""
    return f"""
    v0 AS MATERIALIZED (
      SELECT '__' || regexp_replace(w, '(.)', '\\1__', 'g') AS s,
             CAST(count(*) AS BIGINT) AS wc
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents WHERE {where})
      WHERE w <> ''
      GROUP BY w
    )"""


def bpe_train_oracle(n_merges: int, where: str) -> str:
    """Oracle for text_bpe_train_merges: the ordered merge list
    (merge_rank, left, right, pair_count), cut at the first pc < 2."""
    stages = "".join("," + _stage(i) for i in range(1, n_merges + 1))
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l, r, pc FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_vocab(where)}{stages},
    merged AS (
      {union}
    )
    SELECT CAST(merge_rank AS INTEGER) AS merge_rank, l AS "left",
           r AS "right", pc AS pair_count
    FROM merged
    QUALIFY min(pc) OVER (ORDER BY merge_rank
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) >= 2
    ORDER BY merge_rank
    """


def bpe_encode_oracle(n_merges: int, train_where: str, target_where: str) -> str:
    """Oracle for text_bpe_encode: train ``n_merges`` on ``train_where``
    docs, apply the valid merge prefix to the distinct words of
    ``target_where`` docs, reassemble per document."""
    stages = "".join("," + _stage(i) for i in range(1, n_merges + 1))
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, l, r, pc FROM b{i}" for i in range(1, n_merges + 1)
    )
    apply_stages = ""
    for i in range(1, n_merges + 1):
        apply_stages += f""",
    e{i} AS (
      SELECT w, CASE WHEN EXISTS (SELECT 1 FROM valid WHERE rank = {i})
        THEN replace(s,
          (SELECT '_' || l || '__' || r || '_' FROM valid WHERE rank = {i}),
          (SELECT '_' || l || r || '_' FROM valid WHERE rank = {i}))
        ELSE s END AS s
      FROM e{i - 1}
    )"""
    return f"""
    WITH {_vocab(train_where)}{stages},
    merges AS (
      {union}
    ),
    valid AS MATERIALIZED (
      SELECT rank, l, r FROM (
        SELECT rank, l, r,
               min(pc) OVER (ORDER BY rank
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
        FROM merges)
      WHERE mp >= 2
    ),
    tw AS (
      SELECT d.doc_id, u.i AS pos, d.ws[u.i] AS w
      FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
            FROM documents WHERE {target_where}) d,
           LATERAL (SELECT unnest(range(1, len(d.ws) + 1)) AS i) u
      WHERE d.ws[u.i] <> ''
    ),
    e0 AS (
      SELECT w, '__' || regexp_replace(w, '(.)', '\\1__', 'g') AS s
      FROM (SELECT DISTINCT w FROM tw)
    ){apply_stages},
    etok AS (
      SELECT w, list_filter(string_split(s, '__'), x -> x <> '') AS toks
      FROM e{n_merges}
    ),
    doc AS (
      SELECT tw.doc_id, flatten(list(etok.toks ORDER BY tw.pos)) AS tokens
      FROM tw JOIN etok USING (w)
      GROUP BY tw.doc_id
    )
    SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
           array_to_string(tokens[1:12], '|') AS token_preview
    FROM doc ORDER BY doc_id
    """
