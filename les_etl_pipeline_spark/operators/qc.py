"""In-flight data-quality metrics via ``Dataset.observe``.

The reference's pipelines count rows / failures with separate actions
(extra scans of the same data); Spark's observation API attaches
aggregate metrics to the SAME job — the counters ride the action that
materializes the DataFrame, costing zero additional scans at any data
size. This is the 100 TB way to emit run-ledger metrics: a 100 TB write
already touches every row once; counting nulls must not touch them
twice.

Reference parity: the silver jobs' profile step re-scans to learn
whether bad records exist (`bad_df.isEmpty()`,
`/root/reference/src/les_etl_pipeline/generate_asset_silver.py:85-87`)
— here the same signal rides the main write as observed counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns (instrumented_df, observation); after ANY action runs on the
    instrumented DataFrame (write, collect, count), ``observation.get``
    yields the metric values computed during that same job. Metrics must
    be aggregate expressions over the observed plan node (sums, counts,
    min/max — anything partially combinable)."""
    obs = Observation()
    names = list(metrics)
    cols = [metrics[n].alias(n) for n in names]
    return df.observe(obs, *cols), obs


def standard_qc_metrics(df: DataFrame, *, null_cols: list[str]) -> dict[str, Column]:
    """The run-ledger counter set: total rows plus a null count per
    watched column — the minimal QC block a bronze/silver write records."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_cols:
        out[f"n_null_{c}"] = F.count_if(F.col(c).isNull())
    return out
