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
from pyspark.sql import functions as F


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


def cogroup_asof_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """As-of join via the COGROUP surface (groupBy().cogroup()
    .applyInPandas): both sides shuffle ONCE on the key and each key's
    (left, right) pair arrives as two pandas DataFrames. Semantics are
    pinned to asof_join_union_window: each left row matches the latest
    right row at-or-before it in (ts, id) order — implemented as a
    merged sort + forward-fill, the pandas rendering of the same
    running-max sweep (monotone ts makes ffill == running max, and the
    id tiebreak matches the window's ORDER BY ts, id).

    This is the grouped-map path for per-key logic that outgrows window
    functions (merge_asof tolerances per row, model-based matching);
    for the plain as-of the native union+window query is the 100 TB
    default — same single shuffle, no Python workers.

    Both sides are projected to (key, id, ts) under FRESH aliases before
    the cogroup: when left and right derive from the same source plan
    they share attribute ids, and FlatMapCoGroupsInPandas dedups shared
    attributes out of the right side (it arrives holding only the
    grouping key). Re-aliasing gives each side its own attribute ids —
    and projecting three columns before the shuffle is what you want at
    scale anyway."""

    def per_key(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame({"left_id": [], "left_ts": [], "match_ts": []})
        l = lpdf[["_id", "_ts"]].copy()
        l["_is_left"] = True
        r = rpdf[["_id", "_ts"]].copy()
        r["_is_left"] = False
        both = pd.concat([l, r]).sort_values(["_ts", "_id"], kind="mergesort")
        right_ts = both["_ts"].where(~both["_is_left"])
        both["match_ts"] = right_ts.ffill()
        out = both[both["_is_left"]]
        return pd.DataFrame(
            {
                "left_id": out["_id"],
                "left_ts": out["_ts"],
                "match_ts": out["match_ts"],
            }
        )

    def prep(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key).alias("_k"),
            F.col(id_col).alias("_id"),
            F.col(ts_col).alias("_ts"),
        )

    return (
        prep(left)
        .groupBy("_k")
        .cogroup(prep(right).groupBy("_k"))
        .applyInPandas(per_key, schema="left_id long, left_ts timestamp_ntz, match_ts timestamp_ntz")
    )
