"""Contract tests: every registered query runs, returns a DataFrame with a
stable schema, and every oracle-paired query hash-matches DuckDB at
sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import math

import pytest

from les_etl_pipeline_spark.queries import ORACLES, QUERIES


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_rows_equal(a, b):
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (x, y) in enumerate(zip(ra, rb)):
            if x == y:
                continue
            if (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
            ):
                continue
            raise AssertionError(f"row {i} col {j}: {x!r} vs {y!r}")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_registry_complete():
    assert len(QUERIES) >= 40
    # every oracle has a query
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert isinstance(srows, list)  # rows-only contract: runs, stable
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    scols_s, srows_s = norm(list(sdf.columns), srows)
    dcols_s, drows_s = norm(dcols, drows)
    assert scols_s == dcols_s
    assert_rows_equal(srows_s, drows_s)


def test_oracle_sql_rounding_hygiene():
    """Oracle SQL must use the engine-portable floor formula, never bare
    round() (Spark's BigDecimal HALF_UP vs DuckDB's libm disagree at
    .xx5 boundaries — functions/rounding.py), and never nondeterministic
    functions. Exception: etl_cast_engine mirrors the REFERENCE's F9
    money rounding (PySpark F.round, silver_funcs.py:30-31), so its
    oracle uses DuckDB round() as the closest twin — exactness on the
    fixed fixtures is certified by tools/strict_check.py instead."""
    import re

    allowed_round = {"etl_cast_engine"}
    for name, sql in ORACLES.items():
        if name not in allowed_round:
            assert not re.search(r"(?<![_a-zA-Z])round\s*\(", sql), (
                f"{name}: bare round() in oracle — use the floor formula"
            )
        assert not re.search(r"(?<![_a-zA-Z])(random|now|current_date|current_timestamp)\s*\(", sql), (
            f"{name}: nondeterministic function in oracle"
        )


def test_scheduler_is_lru_and_rotation_bound_holds():
    """The registration order is the driver-grading schedule (first 50
    entries per round). Pin the two properties the staleness floor
    depends on (VERDICT r8 #6):

    1. LRU: the order is exactly (forced-regrade first, then ascending
       last-passed round, ties alphabetical) — no query can jump the
       queue ahead of a staler one.
    2. Rotation bound: with W=50 slots and N registered queries, the
       least-recently-passed queries fill positions 0..(count-1), so any
       query whose last pass is among the `k*W` oldest is graded within
       k rounds. Concretely for the current artifacts: every query's
       projected re-grade keeps max staleness <= ceil(N/W) windows.
    """
    from les_etl_pipeline_spark.queries import (
        _FORCE_REGRADE,
        _last_hash_round,
        _last_passed_round,
    )

    names = list(QUERIES)
    last = _last_passed_round()
    hashed = _last_hash_round()
    force = {n for n, since in _FORCE_REGRADE.items() if hashed.get(n, 0) < since}
    expected = sorted(
        names,
        key=lambda n: (
            n not in ORACLES,
            -1 if n in force else last.get(n, 0),
            n,
        ),
    )
    assert names == expected, "registration order is not least-recently-verified-first"

    w = 50
    # rows-only queries are pinned OUTSIDE the graded window (VERDICT
    # r13 #2): the driver can only record the weak no-oracle check for
    # them, so they yield the tail slots to oracle-paired queries; their
    # accuracy gates live in tests/test_approx_bounds.py and siblings
    rows_only = [n for n in names if n not in ORACLES]
    assert min(names.index(n) for n in rows_only) >= len(names) - len(rows_only)
    assert len(names) - len(rows_only) >= w, (
        "registry shrank below the graded window; rows-only tail would be graded"
    )
    # forced-regrade queries legitimately jump the queue (their oracle
    # changed); the staleness ordering applies to everything else
    # oracle-paired
    unforced = [n for n in names if n not in force and n in ORACLES]
    rounds = sorted({last.get(n, 0) for n in unforced})
    # positions are monotone in last-pass round: every query passed in
    # round r sits before every query passed in any later round, so the
    # k oldest rounds' queries occupy a contiguous prefix — the driver
    # window drains staleness strictly oldest-first
    pos = {n: i for i, n in enumerate(names)}
    for older, newer in zip(rounds, rounds[1:]):
        max_old = max(pos[n] for n in unforced if last.get(n, 0) == older)
        min_new = min(pos[n] for n in unforced if last.get(n, 0) == newer)
        assert max_old < min_new, (older, newer)
    # the concrete r9/r10 floor: everything last passed in the two oldest
    # grade rounds (plus whatever jumps ahead of it) fits inside the next
    # TWO windows
    if len(rounds) >= 2:
        two_oldest = [n for n in unforced if last.get(n, 0) <= rounds[1]]
        assert max(pos[n] for n in two_oldest) < 2 * w, (
            "two-window drain bound violated"
        )
    # and the general bound is achievable: N queries cycle in ceil(N/W)
    # windows, the documented staleness ceiling
    # documented ceiling (queries/__init__ docstring); update BOTH when
    # registry growth crosses a 50-multiple
    assert math.ceil(len(names) / w) <= 7
