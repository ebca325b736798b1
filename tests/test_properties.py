"""Property-based tests (hypothesis) — SURVEY.md §5.2: normalization
idempotence, validation partition, portable rounding consistency."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from les_etl_pipeline_spark.functions.rounding import hround
from les_etl_pipeline_spark.operators.normalize import clean_cell
from les_etl_pipeline_spark.operators.validation import profile_data

cells = st.one_of(
    st.none(),
    st.sampled_from(["", "  ", "ND1", "ND5", "No Collateral", "nd1"]),
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
        max_size=12,
    ),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(cells, min_size=1, max_size=8))
def test_clean_cell_idempotent(spark, values):
    """normalize(normalize(x)) == normalize(x)."""
    df = spark.createDataFrame([(v,) for v in values], "c string")
    once = [r["c"] for r in df.select(clean_cell("c").alias("c")).collect()]
    df2 = spark.createDataFrame([(v,) for v in once], "c string")
    twice = [r["c"] for r in df2.select(clean_cell("c").alias("c")).collect()]
    assert once == twice


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["2023-06-30", "1999-03", "bad"])),
            st.one_of(st.none(), st.sampled_from(["1", "7.25", "x", "250"])),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_validation_is_partition(spark, rows):
    """good ∪ bad == all, good ∩ bad == ∅ (mirrors silver_funcs.py:76-77)."""
    df = spark.createDataFrame(rows, "d string, n string")
    rules = {
        "d": {"type": "datetime", "nullable": False},
        "n": {"type": "number", "min": 0, "max": 100},
    }
    good, bad = profile_data(df, rules)
    assert good.count() + bad.count() == df.count()


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
def test_hround_matches_python_formula(spark_float_cache, x):
    """The Spark hround formula == the same IEEE ops in Python."""
    expected = math.floor(x * 100.0 + 0.5) / 100.0
    got = spark_float_cache(x)
    assert got == expected


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_float_cache(spark):
    """Evaluate hround through a real Spark plan, batched per example."""
    from pyspark.sql import functions as F

    def run(x: float) -> float:
        df = spark.createDataFrame([(x,)], "x double")
        return df.select(hround(F.col("x")).alias("r")).collect()[0]["r"]

    return run
