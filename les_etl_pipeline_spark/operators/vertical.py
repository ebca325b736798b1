"""Topic-based vertical partitioning (P9 + P6 + P5 + D1): split a wide
silver table into per-topic tables sharing the primary columns.

Re-expresses generate_asset_silver.py:22-45,99-116 and
generate_bond_info_silver.py:22-36,90-107 as one parameterized operator:
for each topic, keep rows with any non-null topic value (na.drop 'all'),
project primary+topic columns, dropDuplicates, hand to the writer.

The input is persisted by the caller before fan-out — the reference
recomputed the full validation pipeline once per topic write (SURVEY.md
§3.2 re-execution hazard); here the plan is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def range_columns(prefix: str, lo: int, hi: int, present: list[str]) -> list[str]:
    """Column-range planner: {prefix}{lo}..{prefix}{hi} intersected with
    the columns actually present (files may carry subsets,
    generate_asset_silver.py:31-44)."""
    return [f"{prefix}{i}" for i in range(lo, hi + 1) if f"{prefix}{i}" in present]


def topic_tables(
    df: DataFrame,
    primary_cols: list[str],
    topics: dict[str, list[str]],
) -> dict[str, DataFrame]:
    """Split df into {topic_name: DataFrame} per the topic column map."""
    out: dict[str, DataFrame] = {}
    for name, cols in topics.items():
        cols = [c for c in cols if c in df.columns]
        if not cols:
            continue
        out[name] = (
            df.na.drop(how="all", subset=cols)       # P6
            .select(*primary_cols, *cols)            # P5
            .dropDuplicates()                        # D1
        )
    return out
