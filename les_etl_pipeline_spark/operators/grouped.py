"""Grouped-map pandas operators (applyInPandas): per-group computations
that genuinely need a dataframe-at-a-time view — the §2.12 'grouped map'
UDF surface. Arrow moves each group as one pandas DataFrame.

For anything expressible with window functions, prefer the native form
(queries/relational3.grouped_zscore_native); the pandas twin here exists
for operators that are NOT expressible (model scoring, per-group curve
fitting) and is equivalence-tested against the native z-score.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def zscore_grouped_pandas(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via applyInPandas (ddof=1 to match stddev_samp)."""

    key_col = df.columns[0]  # captured as a plain string (not the DataFrame)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=1)
        out = pdf[[group_col]].copy()
        out["key"] = pdf[key_col]
        out["zscore"] = (pdf[value_col] - mu) / sd
        return out

    return df.groupBy(group_col).applyInPandas(
        per_group, schema=f"{group_col} string, key long, zscore double"
    )
